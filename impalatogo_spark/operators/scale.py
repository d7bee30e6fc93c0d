"""Scale utilities: bucketed co-located joins, skew-salted joins.

These are the engine's answers to the two dominant costs at 100 TB:
  * repeated shuffle of a big fact table on the same join key
    -> bucketing (persisted co-partitioning; the Spark-native equivalent of
       the reference's partitioned-join fragment placement,
       fe/.../planner/DistributedPlanner.java:284-385)
  * skewed join keys serializing a handful of reducers
    -> key salting (explicit) and AQE skew-join splitting (enabled in
       session.py) — the reference had no answer to skew beyond memory limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 16, sort_col: str | None = None) -> None:
    """Persist df as a bucketed (and optionally sorted) table. Joins between
    tables bucketed on the same key with the same bucket count need NO
    exchange — the shuffle is paid once at write time and amortized over
    every subsequent join (asserted in tests/test_scale.py)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name, format="parquet")


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi join: the (skewed) left side gets a random salt in
    [0, n_salts); the (smaller) right side is replicated n_salts times; the
    join key becomes (key, salt), spreading each hot key over n_salts
    reducers. Semantically identical to left.join(right, key, how) for
    inner/left joins with unique-ish right keys.
    """
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def cluster_profile(total_cores: int, executor_mem_gb: int,
                    data_tb: float | None = None,
                    target_partition_mb: int = 128) -> dict[str, str]:
    """The SURVEY §9.8 'what changes first at 1000x' rules as executable
    configuration, so the 100 TB posture is code, not prose.

    Derivations (each is the standard published Spark sizing rule):
      * shuffle.partitions = 3x total cores, floored so a full-data shuffle
        stays under ~2x target_partition_mb per partition when data_tb is
        given (AQE coalesces the small case at runtime; the static number
        only needs to bound the LARGE case);
      * maxPartitionBytes = target_partition_mb (scan-side task sizing: a
        100 TB scan at 128 MB = ~800k tasks — bounded driver metadata,
        full pipeline parallelism);
      * autoBroadcastJoinThreshold = min(256 MB, executor_mem / 16) — the
        build side must fit next to the partial aggregates it shares the
        executor with;
      * AQE + skew-join splitting on (the runtime complement to the static
        numbers above).
    """
    parts = 3 * total_cores
    if data_tb is not None:
        # partitions needed so a full shuffle of data_tb lands under
        # 2 x target_partition_mb each
        need = int(data_tb * 1024 * 1024 / (2 * target_partition_mb))
        parts = max(parts, need)
    bcast_mb = min(256, max(8, executor_mem_gb * 1024 // 16))
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(bcast_mb * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }


def apply_cluster_profile(spark: SparkSession, profile: dict[str, str]) -> None:
    for k, v in profile.items():
        spark.conf.set(k, v)
