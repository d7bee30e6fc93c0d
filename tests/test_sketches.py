"""Mergeable-sketch properties (operators/sketches.py): HLL register
mergeability + estimate error bounds, KMV exact-below-k mode and estimate
error, and determinism of both. The DuckDB value-parity of the registered
queries is covered by test_correctness.py; these tests pin the *algorithmic*
contracts a value-diff can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from impalatogo_spark.operators import sketches as K
from impalatogo_spark.session import table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def test_hll_registers_merge_equals_direct_build(spark, events):
    """max-merging per-shard registers == building one sketch over the whole
    set: the associativity that makes shard-local building correct."""
    sharded = K.hll_registers(events, "user_id", "event_type")
    merged = {
        (r["bucket"],): r["m"]
        for r in sharded.groupBy("bucket")
        .agg(F.max("m_rho").alias("m"))
        .collect()
    }
    direct = {
        (r["bucket"],): r["m_rho"]
        for r in K.hll_registers(
            events.withColumn("one", F.lit("x")), "user_id", "one"
        ).collect()
    }
    assert merged == direct


def test_hll_estimate_error_bound(spark, events):
    """Raw HLL with m=32 has sigma ~ 1.04/sqrt(32) ~ 18.4%; assert the
    merged estimate lands within 3.5 sigma of exact (works at sf0.001's
    n=15 too — small-n bias stays well inside this envelope for md5)."""
    regs = K.hll_registers(
        events.withColumn("one", F.lit("ALL")), "user_id", "one"
    )
    est = K.hll_estimate(regs, ["shard"]).collect()[0]["hll_est"]
    exact = events.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 3.5 * 1.04 / math.sqrt(K.HLL_M)


def test_kmv_exact_mode_below_k(spark):
    """A set smaller than k is carried exactly: the sketch IS the set."""
    df = spark.range(20).select(F.col("id").alias("u"))
    sk = K.kmv_sketch(df, "u", k=K.KMV_K)
    assert sk.count() == 20
    assert {r["k"] for r in sk.collect()} == set(range(20))


def test_kmv_union_estimate_error(spark):
    """(k-1)*2^48/h_(k) over 2000 md5-hashed keys: sigma ~ 1/sqrt(k-2);
    assert within 4 sigma."""
    n, k = 2000, K.KMV_K
    df = spark.range(n).select(F.col("id").alias("u"))
    sk = K.kmv_sketch(df, "u", k=k).orderBy("h")
    hk = sk.collect()[-1]["h"]
    est = (k - 1) * K.HASH_SPACE / hk
    assert abs(est - n) / n < 4.0 / math.sqrt(k - 2)


def test_sketches_deterministic_across_runs(spark, events):
    a = sorted(map(tuple, K.kmv_sketch(events, "user_id").collect()))
    b = sorted(map(tuple, K.kmv_sketch(events, "user_id").collect()))
    assert a == b
    ra = sorted(map(tuple, K.hll_registers(events, "user_id", "event_type").collect()))
    rb = sorted(map(tuple, K.hll_registers(events, "user_id", "event_type").collect()))
    assert ra == rb


def test_cms_merge_equals_direct_and_one_sided(spark, events):
    """Cell-wise summing per-shard CMS cells == building one sketch over
    all rows (merge associativity), and the min-over-rows estimate is a
    one-sided overestimate of every key's true frequency."""
    from impalatogo_spark.operators.sketches import CMS_D, CMS_W, cms_cells, hash48

    sharded = cms_cells(events, "user_id", "event_type")
    merged = {
        (r["j"], r["col"]): r["c"]
        for r in sharded.groupBy("j", "col")
        .agg(F.sum("cnt").alias("c")).collect()
    }
    direct = {
        (r["j"], r["col"]): r["cnt"]
        for r in cms_cells(
            events.withColumn("one", F.lit("x")), "user_id", "one"
        ).collect()
    }
    assert merged == direct

    exact = {r["user_id"]: r["c"] for r in
             events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    probes = events.select("user_id").distinct().select(
        "user_id",
        *[(hash48(F.concat_ws("|", F.lit(str(j)),
                              F.col("user_id").cast("string"))) % CMS_W)
          .alias(f"c{j}") for j in range(CMS_D)],
    ).collect()
    for p in probes:
        est = min(merged[(j, p[f"c{j}"])] for j in range(CMS_D))
        assert est >= exact[p["user_id"]]


def test_streaming_hll_multibatch_and_replay_idempotent(spark, sf_dir, tmp_path):
    """The streaming register maintenance contract: (a) two single-file
    micro-batches merge to the same registers as one batch build; (b) a
    REPLAYED batch (foreachBatch at-least-once) is absorbed by max-merge
    with zero drift — the idempotence that lets streaming_sketch_hll skip
    batch-id bookkeeping."""
    from impalatogo_spark.operators.sketches import hll_registers
    from impalatogo_spark.session import table

    ev = table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)

    def regmap(df):
        return {(r["shard"], r["bucket"]): r["m_rho"] for r in df.collect()}

    def merge(cur, batch):
        return (
            cur.unionByName(batch).groupBy("shard", "bucket")
            .agg(F.max("m_rho").alias("m_rho"))
        )

    ra = hll_registers(half_a, "user_id", "event_type")
    rb = hll_registers(half_b, "user_id", "event_type")
    merged = merge(ra, rb)
    direct = hll_registers(ev, "user_id", "event_type")
    assert regmap(merged) == regmap(direct)
    # replay batch b a second time: absorbed, no drift
    assert regmap(merge(merged, rb)) == regmap(direct)


def test_bloom_no_false_negatives_row(spark, sf_dir):
    """The registered bloom query's is_member=1 row must show
    positives == probes (Bloom filters have NO false negatives), and the
    non-member FPR must stay under 10% at the sized bits/key."""
    from impalatogo_spark.queries import all_queries

    rows = {r["is_member"]: r for r in
            all_queries()["sketch_bloom_membership"]
            .spark_fn(spark, sf_dir).collect()}
    assert rows[1]["positives"] == rows[1]["probes"]
    assert rows[0]["positive_bp"] <= 1000
