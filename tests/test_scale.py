"""Scale-feature tests: bucketed joins eliminate exchanges; salted joins
preserve semantics while spreading hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impalatogo_spark import plans
from impalatogo_spark.operators.scale import salted_join, write_bucketed
from impalatogo_spark.session import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS i2s_buckets")
    spark.sql("USE i2s_buckets")
    write_bucketed(
        table(spark, sf_dir, "lineitem"), "li_b", "l_orderkey", 8, "l_orderkey"
    )
    write_bucketed(
        table(spark, sf_dir, "orders"), "ord_b", "o_orderkey", 8, "o_orderkey"
    )
    yield
    spark.sql("USE default")
    spark.sql("DROP DATABASE i2s_buckets CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Both sides bucketed on the join key with equal bucket counts: the join
    must plan with ZERO exchanges (the write-time shuffle is amortized)."""
    li = spark.table("i2s_buckets.li_b")
    o = spark.table("i2s_buckets.ord_b")
    # disable broadcast so the co-located shuffle-free path is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        n_ex = plans.count_shuffles(li.join(o, li.l_orderkey == o.o_orderkey))
        assert n_ex == 0, f"bucketed join still shuffles ({n_ex} exchanges)"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the same join over raw parquet shuffles both sides."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_ex = plans.count_shuffles(li.join(o, li.l_orderkey == o.o_orderkey))
        assert n_ex >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "okey")
    plain = (
        li.join(o, "okey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, o, "okey", n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    c = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "k")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp"))
        .withColumnRenamed("o_custkey", "k")
    )
    plain = c.join(o, "k", "left").groupBy("k").count()
    salted = salted_join(c, o, "k", n_salts=4, how="left").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_incremental_dedup_persisted_index_equivalence(spark, sf_dir, tmp_path):
    """The steady-state incremental-dedup path — corpus index WRITTEN ONCE
    (parquet round-trip) and joined per batch — must produce exactly the
    inline derivation's statuses. This is the O(corpus)->O(batch) pattern
    the 100 TB design relies on (operators/dedup.py::build_corpus_index)."""
    import os
    import pyspark.sql.functions as F
    from impalatogo_spark.operators.dedup import (
        build_corpus_index, incremental_dedup, incremental_dedup_indexed,
    )
    from impalatogo_spark.session import table

    docs = table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)

    inline = sorted(map(tuple, incremental_dedup(incoming, corpus).collect()))

    fp, buckets, shingles = build_corpus_index(corpus)
    base = str(tmp_path)
    for name, df in (("fp", fp), ("buckets", buckets), ("shingles", shingles)):
        df.write.parquet(os.path.join(base, name))
    indexed = incremental_dedup_indexed(
        incoming,
        spark.read.parquet(os.path.join(base, "fp")),
        spark.read.parquet(os.path.join(base, "buckets")),
        spark.read.parquet(os.path.join(base, "shingles")),
    )
    assert sorted(map(tuple, indexed.collect())) == inline
    assert len(inline) > 0


def test_no_persisted_rdds_after_release(spark, sf_dir):
    """Round-1 verdict #7 (unpersist audit): persist-using queries must
    leave ZERO cached RDDs behind once the harness releases them — a
    long-lived session otherwise accumulates a cache entry per query run."""
    from impalatogo_spark.queries.pipeline import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )
    from impalatogo_spark.session import release_persisted

    jsc = spark.sparkContext._jsc  # noqa: SLF001
    # other tests' localCheckpoint RDDs may linger until GC — assert no NET
    # growth from these queries, not a globally empty cache
    before = jsc.getPersistentRDDs().size()
    for fn in (dedup_ngram_jaccard, dedup_minhash_lsh):
        fn(spark, sf_dir).collect()
        assert release_persisted() >= 1
    assert jsc.getPersistentRDDs().size() <= before


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Joining a lang-partitioned fact with a filtered dim must inject a
    dynamicpruning expression into the fact scan's PartitionFilters — at
    100 TB this is the difference between scanning one partition and all of
    them, and it requires only that the layout is partitioned and the join
    is declarative (Catalyst inserts the runtime subquery itself)."""
    from impalatogo_spark import plans
    from impalatogo_spark.session import table

    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "pdocs")
    docs.write.partitionBy("lang").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame([("en", 1), ("fr", 0)], "lang string, flag int")
    j = fact.join(dim.filter(F.col("flag") == 1), "lang").groupBy("lang").count()
    plan = plans.formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan


def test_runtime_bloom_filter_reaches_probe_side(spark, sf_dir):
    """With a selective build side and a shuffle join, Spark's runtime bloom
    filter (might_contain) must be injected on the probe side — the
    row-level analogue of DPP for unpartitioned join keys; at 100 TB it
    drops most probe rows before the exchange."""
    from impalatogo_spark import plans
    from impalatogo_spark.session import table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        # confs BEFORE table(): ensure_session_confs (r07) pins the engine
        # join policy at most once per session and never overrides a
        # deliberately-set threshold, so the -1 shuffle-join override
        # survives the table() calls
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plans.formatted_plan(j)
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cluster_profile_sizing_rules(spark):
    """cluster_profile encodes the §9.8 sizing rules: partitions scale with
    cores AND with data volume, broadcast threshold with executor memory,
    AQE always armed."""
    from impalatogo_spark.operators.scale import (
        apply_cluster_profile,
        cluster_profile,
    )

    # local shape: 32 cores, 16 GB executors, no data bound
    p = cluster_profile(total_cores=32, executor_mem_gb=16)
    assert p["spark.sql.shuffle.partitions"] == str(3 * 32)
    assert p["spark.sql.files.maxPartitionBytes"] == str(128 * 1024 * 1024)

    # 1000-executor / 100 TB shape: the data bound dominates 3x cores
    big = cluster_profile(total_cores=8000, executor_mem_gb=32, data_tb=100)
    assert int(big["spark.sql.shuffle.partitions"]) >= 100 * 1024 * 1024 // 256
    assert big["spark.sql.adaptive.skewJoin.enabled"] == "true"
    # broadcast build side bounded by executor memory, capped at 256 MB
    assert int(big["spark.sql.autoBroadcastJoinThreshold"]) == 256 * 1024 * 1024
    small_mem = cluster_profile(total_cores=64, executor_mem_gb=2)
    assert int(small_mem["spark.sql.autoBroadcastJoinThreshold"]) == \
        128 * 1024 * 1024

    # applying and restoring round-trips on a live session; restore EVERY
    # touched conf (a leaked 256 MB broadcast threshold would flip
    # plan-shape assertions in tests that share this session)
    before = {}
    for c in p:
        try:
            before[c] = spark.conf.get(c)
        except Exception:
            before[c] = None
    try:
        apply_cluster_profile(spark, p)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(96)
    finally:
        for c, v in before.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_parquet_aggregate_pushdown_metadata_only(spark, sf_dir):
    """MIN/MAX/COUNT with no filter answer from parquet FOOTERS when
    aggregate pushdown is on (DSv2 scan shows PushedAggregation) — at
    100 TB this is the difference between reading footers and reading the
    table. Values must equal the normal scan's."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",  # v2 parquet scan
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_orderkey").alias("lo"),
            F.max("l_orderkey").alias("hi"),
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan and "MIN(l_orderkey)" in plan
        pushed = df.first()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    normal = spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_orderkey").alias("lo"),
        F.max("l_orderkey").alias("hi"),
    ).first()
    assert tuple(pushed) == tuple(normal)


def test_global_row_number_matches_window(spark, sf_dir):
    """Two-level range-partitioned rank == partition-less row_number window,
    row for row, on a strict total order."""
    from pyspark.sql import Window as W

    from impalatogo_spark.operators.scale import global_row_number

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    got = {
        r["c_custkey"]: r["rn"]
        for r in global_row_number(
            c, [F.desc("c_acctbal"), "c_custkey"], out="rn"
        ).collect()
    }
    w = W.orderBy(F.desc("c_acctbal"), "c_custkey")
    want = {
        r["c_custkey"]: r["rn"]
        for r in c.select(
            "c_custkey", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want


def test_global_running_sum_matches_window(spark, sf_dir):
    from pyspark.sql import Window as W

    from impalatogo_spark.operators.scale import global_running_sum

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    got = {
        r["o_orderkey"]: r["ps"]
        for r in global_running_sum(o, ["o_orderkey"], "cents", out="ps").collect()
    }
    w = (
        W.orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        r["o_orderkey"]: r["ps"]
        for r in o.select("o_orderkey", F.sum("cents").over(w).alias("ps")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_rows,n_buckets", [(15, 4), (3, 8), (40, 4), (41, 4)])
def test_ntile_from_rank_matches_ntile(spark, n_rows, n_buckets):
    """Arithmetic ntile from exact ranks == SQL ntile, including the
    n_rows < n_buckets and uneven-remainder edges."""
    from pyspark.sql import Window as W

    from impalatogo_spark.operators.scale import ntile_from_rank

    df = spark.range(1, n_rows + 1).select(F.col("id").alias("k"))
    w = W.orderBy("k")
    want = df.select("k", F.ntile(n_buckets).over(w).alias("b")).collect()
    got = df.crossJoin(
        F.broadcast(df.agg(F.count(F.lit(1)).alias("n_tot")))
    ).select(
        "k", ntile_from_rank(F.col("k"), F.col("n_tot"), n_buckets).alias("b")
    ).collect()
    assert {r["k"]: r["b"] for r in got} == {r["k"]: r["b"] for r in want}


def test_global_row_number_plan_has_no_partitionless_window(spark, sf_dir):
    """Every Window node in the rank plan must carry a partition spec.
    Physical plan format: keyed = `Window [exprs], [partSpec], [orderSpec]`
    (two `], [` separators); partition-less = `Window [exprs], [orderSpec]`
    (one). A partition-less window is the all-rows-to-one-reducer trap the
    helper exists to avoid."""
    from impalatogo_spark.operators.scale import global_row_number

    c = table(spark, sf_dir, "customer").select("c_custkey")
    plan = (
        global_row_number(c, ["c_custkey"], out="rn")
        ._jdf.queryExecution().executedPlan().toString()
    )
    window_lines = [
        ln for ln in plan.splitlines() if ln.strip().lstrip("+-: ").startswith("Window ")
    ]
    assert window_lines, "expected Window nodes in the plan"
    for ln in window_lines:
        assert ln.count("], [") == 2, f"partition-less window: {ln[:120]}"


def test_parallelize_small_scan(spark, sf_dir):
    """An under-split scan is spread to defaultParallelism before a
    CPU-bound kernel; an already-wide input passes through untouched."""
    from impalatogo_spark.operators.scale import parallelize_small_scan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.rdd.getNumPartitions() < 32
    wide = parallelize_small_scan(docs, min_partitions=8)
    assert wide.rdd.getNumPartitions() == 8
    assert wide.count() == docs.count()
    # already wide: no-op (same plan object, no extra exchange)
    again = parallelize_small_scan(wide.repartition(16), min_partitions=8)
    assert again.rdd.getNumPartitions() == 16


def test_global_row_number_permutation_over_checkpointed_input(spark, sf_dir):
    """Regression: global_row_number's local-rank and per-pid-counts
    branches consume the range-stamped frame twice. Over a checkpointed
    upstream (tracked_persist), DeduplicateRelations re-ids one branch,
    ReuseExchange does NOT dedup the two range exchanges, and each sampled
    its own boundaries — composed ranks silently duplicated/skipped values
    (observed: 9,945 distinct over 10,000 rows). _with_range_pid now
    tracked_persist's the stamped frame (the shared InMemoryRelation pins
    ONE pid assignment) so it is materialized once, by construction."""
    from pyspark.sql import functions as F

    from impalatogo_spark.operators.scale import global_row_number
    from impalatogo_spark.session import release_persisted, table, tracked_persist

    ev = table(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").alias("tt")
    )
    bounds = ev.agg(F.count(F.lit(1)).alias("n"))
    base = tracked_persist(ev.crossJoin(F.broadcast(bounds)))
    n = base.count()
    for _ in range(2):  # twice: boundary sampling is per-instantiation
        r = global_row_number(base, ["tt", "event_id"], out="rn")
        rns = [x["rn"] for x in r.select("rn").collect()]
        assert len(set(rns)) == n and max(rns) == n and min(rns) == 1
    release_persisted()


def test_part_substitution_rank_arithmetic_vs_brute_force(spark, tmp_path):
    """part_substitution_candidates (r07) computes pair counts / min gap /
    sample key by rank arithmetic with NO pair enumeration — this pins it
    against the naive quadratic oracle on adversarial data the TPC-H
    distribution never produces: equal cents across brands (gap 0, pk
    ties), pairs exactly AT the 10% boundary ((b-a)*10 == a) and one cent
    outside, single-brand blocks (no cross pairs -> excluded), singleton
    blocks, and same-brand runs that hide the nearest cross-brand
    neighbor several rows back."""
    import duckdb

    from impalatogo_spark.queries import all_queries
    from impalatogo_spark.session import release_persisted

    rows = []
    # block A: cross-brand equal cents + pk ties -> min gap 0
    rows += [(1, "B#1", "T1", 1, 500.00), (2, "B#2", "T1", 1, 500.00),
             (3, "B#1", "T1", 1, 505.00)]
    # block B: exactly at boundary: 1000 & 1100 cents -> (1100-1000)*10 == 1000
    rows += [(10, "B#1", "T2", 2, 10.00), (11, "B#2", "T2", 2, 11.00),
             (12, "B#3", "T2", 2, 11.01)]  # 12 vs 10 is just OUTSIDE
    # block C: single brand only -> no output row
    rows += [(20, "B#9", "T3", 3, 100.00), (21, "B#9", "T3", 3, 101.00)]
    # block D: singleton
    rows += [(30, "B#1", "T4", 4, 50.00)]
    # block E: same-brand run hides nearest cross neighbor 3 rows back
    rows += [(40, "B#2", "T5", 5, 200.00), (41, "B#1", "T5", 5, 201.00),
             (42, "B#1", "T5", 5, 202.00), (43, "B#1", "T5", 5, 203.00),
             (44, "B#2", "T5", 5, 219.00)]
    pdf = spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_type string, p_size int, p_retailprice double"
    )
    sf = str(tmp_path)
    pdf.coalesce(1).write.parquet(f"{sf}/part.parquet")

    q = all_queries()["part_substitution_candidates"]
    got = sorted(
        tuple(r) for r in q.spark_fn(spark, sf).collect()
    )
    release_persisted()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf}/part.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want, f"{got} != {want}"


def test_session_conf_set_survives_table_calls(spark, sf_dir):
    """Regression (r06 verdict #4 / ADVICE): ensure_session_confs used to
    re-pin its five confs on EVERY table() call, silently clobbering any
    value a client SET mid-session. It now pins once per session (sentinel
    conf) and never overrides a non-default broadcast threshold."""
    from impalatogo_spark.session import ensure_session_confs, table

    ensure_session_confs(spark)  # make sure the first-touch pin happened
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        table(spark, sf_dir, "nation").count()
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        # a fresh session with a PRE-first-touch deliberate SET keeps it too
        s2 = spark.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
        table(s2, sf_dir, "nation").count()
        assert s2.conf.get("spark.sql.autoBroadcastJoinThreshold") == "1MB"
        # ...while a vanilla fresh session gets the engine's 64 MB policy
        # (newSession inherits the builder spelling "64MB"; an externally
        # built vanilla session gets the pin's byte form)
        s3 = spark.newSession()
        table(s3, sf_dir, "nation").count()
        assert s3.conf.get("spark.sql.autoBroadcastJoinThreshold") in (
            "64MB", str(64 * 1024 * 1024)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
