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
