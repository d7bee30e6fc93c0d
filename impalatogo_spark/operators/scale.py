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

from pyspark.sql import Column, DataFrame, SparkSession
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


def _with_range_pid(df: DataFrame, order_cols, num_partitions: int | None):
    """Range-partition df by the global order and stamp the partition id.
    The pid is monotone across the order (range partitioning invariant),
    so per-pid local scans + per-pid offsets compose to the exact global
    scan.

    The stamped frame is tracked_persist'd (plain persist(), tracked so
    harnesses release it): its two consumers (the local-rank branch and
    the per-pid counts branch) MUST see the identical pid assignment, and
    without pinning that only holds when Catalyst's ReuseExchange dedups
    the two range exchanges. Over some inputs (a checkpointed upstream,
    where DeduplicateRelations re-ids one branch) reuse does NOT fire,
    each exchange samples its own boundaries, and the composed ranks
    silently duplicate/skip values. The persist pins ONE pid assignment
    via the shared InMemoryRelation, so the invariant holds by
    construction (lineage truncation via localCheckpoint is NOT the
    mechanism — do not "simplify" the persist away); the cost is one
    materialization of the relation — the same price any MPP engine pays
    to pin a consistent global order."""
    from impalatogo_spark.session import tracked_persist

    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    d = df.repartitionByRange(int(n), *cols)
    return tracked_persist(d.withColumn("__pid", F.spark_partition_id()))


def global_row_number(
    df: DataFrame,
    order_cols,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number over a strict total order WITHOUT a
    single-partition window (the WindowExec all-to-one-reducer trap): the
    canonical two-level scan — range-partition on the order, rank locally
    within each partition, prefix the (tiny, <= num_partitions rows)
    per-partition counts, and add the offset back. Three skinny shuffles,
    each with full parallelism; the only serial step is over the
    partition-count table. order_cols MUST be a strict total order (add a
    unique id tie-break) or ranks are nondeterministic."""
    from pyspark.sql import Window as W

    d = _with_range_pid(df, order_cols, num_partitions)
    w_local = W.partitionBy("__pid").orderBy(*order_cols)
    local = d.withColumn("__lrn", F.row_number().over(w_local))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    # __pid % 1 == 0 always, but is non-foldable, so Catalyst keeps the
    # partition key and WindowExec skips its single-partition warning (a
    # bare lit(0) gets pruned); the input is <= num_partitions rows
    w_off = (
        W.partitionBy(F.col("__pid") % F.lit(1))
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols,
    value_col: str,
    out: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum (inclusive) over a strict total order —
    same two-level scan decomposition as global_row_number: local prefix
    within range partitions + broadcast per-partition offsets. Replaces
    `sum(...) OVER (ORDER BY ...)` with no partition key, which moves ALL
    rows to one reducer."""
    from pyspark.sql import Window as W

    d = _with_range_pid(df, order_cols, num_partitions)
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = d.withColumn("__lps", F.sum(value_col).over(w_local))
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__t"))
    w_off = (
        W.partitionBy(F.col("__pid") % F.lit(1))
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__lps") + F.col("__off"))
        .drop("__pid", "__lps", "__off")
    )


def grouped_percentiles(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    tie_col: str,
    ps: tuple = (0.25, 0.5, 0.9),
    disc: tuple = (0.5,),
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT grouped percentiles (continuous + discrete) that scale to few
    huge groups — the reusable form of the r07 agg_percentiles de-funnel.

    Spark's exact percentile is a buffering ObjectHashAggregate: with G
    groups each final-merge task holds ~N/G values (the r06 sf1 audit
    measured 122x wall on 10x data at G=3 — an executor OOM at 100 TB).
    Here the sort is operators/scale.global_row_number's range-partitioned
    two-level scan with full parallelism regardless of G; the per-group
    (start, n) table is G rows broadcast back, and each percentile is
    selected by its two bracketing ranks.

    percentile_cont mirrors DuckDB's quantile_cont lerp form exactly
    (rn = p*(n-1) in IEEE double; value = lo*(crn-rn) + hi*(rn-frn)), so
    `round(result, 4)` stays engine-identical over integer inputs.
    percentile_disc picks 1-based rank (n+1) div 2 at p=0.5 — both
    engines' lower-middle rule — and generally ceil(p*n) via the same
    integer form. value_col MUST be integer-typed (cents); tie_col must
    make (group, value, tie) a strict total order.

    Output: group_cols + round(p{100p}, 4) DOUBLE per ps +
    p{100p}_disc BIGINT per disc."""
    order = [*group_cols, value_col, tie_col]
    d = global_row_number(df, order, out="__grn",
                          num_partitions=num_partitions)
    stats = d.groupBy(*group_cols).agg(
        F.min("__grn").alias("__start"), F.count(F.lit(1)).alias("__n")
    )
    j = d.join(F.broadcast(stats), group_cols)

    def pos(p: float):
        return F.lit(p) * (F.col("__n") - 1).cast("double")

    def tag(p: float) -> str:
        t = f"{p * 100:g}".replace(".", "_")
        return t

    picks = []
    for p in ps:
        picks.append(
            F.max(
                F.when(F.col("__grn") == F.col("__start") + F.floor(pos(p)),
                       F.col(value_col))
            ).alias(f"__lo{tag(p)}")
        )
        picks.append(
            F.max(
                F.when(F.col("__grn") == F.col("__start") + F.ceil(pos(p)),
                       F.col(value_col))
            ).alias(f"__hi{tag(p)}")
        )
    for p in disc:
        # 1-based rank ceil(p*n) in exact integer arithmetic for the
        # rational p values used in practice (p = a/b); Fraction over the
        # DECIMAL string — float(0.9).as_integer_ratio() would give the
        # 2^53-denominator binary expansion
        from fractions import Fraction

        fr = Fraction(str(p))
        num, den = fr.numerator, fr.denominator
        picks.append(
            F.max(
                F.when(
                    F.col("__grn") == F.col("__start")
                    + F.expr(f"(__n * {num} + {den - 1}) DIV {den}") - 1,
                    F.col(value_col),
                )
            ).alias(f"__d{tag(p)}")
        )
    agg = j.groupBy(*group_cols).agg(F.max("__n").alias("__n"), *picks)

    def lerp(p: float):
        rn = pos(p)
        frn, crn = F.floor(rn).cast("double"), F.ceil(rn).cast("double")
        lo = F.col(f"__lo{tag(p)}").cast("double")
        hi = F.col(f"__hi{tag(p)}").cast("double")
        val = F.when(crn == frn, lo).otherwise(
            lo * (crn - rn) + hi * (rn - frn)
        )
        return F.round(val, 4).alias(f"p{tag(p)}")

    out_cols = [*group_cols]
    out_cols += [lerp(p) for p in ps]
    out_cols += [F.col(f"__d{tag(p)}").alias(f"p{tag(p)}_disc")
                 for p in disc]
    return agg.select(*out_cols)


def ntile_from_rank(rank_col, n_total_col, n: int):
    """ntile(n) bucket (1-based) computed arithmetically from an exact
    global rank and the total row count — SQL ntile semantics (first
    n_total % n buckets get one extra row). Lets ntile ride on
    global_row_number instead of a single-partition window."""
    def ceil_div(a, d):
        # exact integer ceil(a/d): decimal division + floor — double
        # division misrounds once rank * bucket-size nears 2^53
        num = (a + d - F.lit(1)).cast("decimal(38,0)")
        return F.floor(num / d.cast("decimal(38,0)")).cast("long")

    base = n_total_col.cast("long") - (n_total_col.cast("long") % n)
    b = (base / n).cast("long")  # floor(n_total / n), exact: base % n == 0
    rem = n_total_col.cast("long") % n
    head = rem * (b + 1)
    return (
        F.when(rank_col <= head, ceil_div(rank_col, b + F.lit(1)))
        .otherwise(rem + ceil_div(rank_col - head, F.when(b > 0, b)))
        .cast("int")
    )


def parallelize_small_scan(df: DataFrame, min_partitions: int | None = None
                           ) -> DataFrame:
    """Spread an under-split scan across the cluster before CPU-heavy
    per-row work (array-expression text kernels, Pandas UDF batches).

    A small corpus often arrives as ONE parquet split, which serializes
    compute-bound per-row operators onto a single core while the rest of
    the cluster idles. At real scale (100 TB -> thousands of input splits)
    the scan is already wider than the cluster and this is a NO-OP — the
    repartition only fires when the source has fewer splits than cores,
    and then it shuffles the input exactly once (1:1 bytes, the price of
    waking the other cores). getNumPartitions() reads the planned scan's
    split count without running a job."""
    spark = df.sparkSession
    target = int(min_partitions or spark.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
