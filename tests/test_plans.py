"""Golden-plan assertions (reference: PlannerTest.java): pushdown reaches the
scan, broadcast is chosen for small dims, top-k compiles to
TakeOrderedAndProject, aggregations are 2-phase, projections prune columns."""

from __future__ import annotations

import pytest

from impalatogo_spark import plans
from impalatogo_spark.queries.tpch import tpch_q1, tpch_q3, tpch_q5, tpch_q6
from impalatogo_spark.session import table


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    df = tpch_q6(spark, sf_dir)
    # all four predicates must reach the parquet scan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert plans.has_pushed_filter(df, col), f"{col} not pushed"


def test_q1_column_pruning(spark, sf_dir):
    df = tpch_q1(spark, sf_dir)
    cols = plans.scan_read_schema(df)
    assert cols, "no ReadSchema found"
    # 11-column table, query needs 7 — the scan must not read the rest
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert "l_quantity" in cols and "l_shipdate" in cols


def test_q1_two_phase_aggregation(spark, sf_dir):
    assert plans.has_partial_aggregate(tpch_q1(spark, sf_dir))


def test_q3_take_ordered(spark, sf_dir):
    assert plans.uses_take_ordered(tpch_q3(spark, sf_dir))


def test_q5_broadcasts_dims(spark, sf_dir):
    assert plans.uses_broadcast_join(tpch_q5(spark, sf_dir))


def test_projection_prunes_to_two_columns(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    cols = plans.scan_read_schema(df)
    assert sorted(cols) == ["l_extendedprice", "l_orderkey"]


def test_whole_stage_codegen_active(spark, sf_dir):
    assert plans.codegen_operator_count(tpch_q1(spark, sf_dir)) >= 4


def test_q1_single_shuffle(spark, sf_dir):
    """Q1's ideal plan: scan -> partial agg -> ONE exchange -> final agg ->
    sort (the sort exchange is collapsed at this size by AQE or counted as
    the global-order exchange) — no join shuffles, no extra repartitions."""
    n = plans.count_shuffles(tpch_q1(spark, sf_dir))
    assert n <= 2, f"q1 has {n} exchanges"


def test_limit_zero_schema_stability(spark, sf_dir):
    # targeted-perf PERF_LIMIT-Q1 (limit.test): LIMIT 0 returns instantly
    # with the full stable schema — Catalyst folds it to an empty relation
    # (no scan), which is the metadata-performance point of the reference
    # query.
    from impalatogo_spark.session import table

    df = table(spark, sf_dir, "lineitem").limit(0)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields][:4] == [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    ]
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan or "Relation" in plan


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set must join map-side (broadcast) — the
    training-data side of a decontamination scan is the one that must never
    shuffle at 100 TB."""
    from impalatogo_spark.queries.pipeline import text_contamination

    assert plans.uses_broadcast_join(text_contamination(spark, sf_dir))


def test_repetition_partial_aggregation(spark, sf_dir):
    """Repetition quality's (doc_id, word) count must map-side combine: the
    shuffle carries one row per distinct word per doc, not one per token."""
    from impalatogo_spark.queries.pipeline import text_repetition_quality

    assert plans.has_partial_aggregate(text_repetition_quality(spark, sf_dir))


def test_repetition_scan_prunes_to_two_columns(spark, sf_dir):
    from impalatogo_spark.queries.pipeline import text_repetition_quality

    cols = plans.scan_read_schema(text_repetition_quality(spark, sf_dir))
    assert cols and "lang" not in cols and "source" not in cols


def test_curate_broadcasts_contamination_hits(spark, sf_dir):
    """The decontamination hit-list (tiny) must come back to the per-doc
    frame as a broadcast join — the full-corpus side never shuffles for it."""
    from impalatogo_spark.queries.pipeline import pipeline_curate

    assert plans.uses_broadcast_join(pipeline_curate(spark, sf_dir))


def test_shard_stats_scan_prunes_and_combines(spark, sf_dir):
    """Shard stats read only `text` (content-derived shard key) and the
    16-group aggregate must map-side combine before its single exchange."""
    from impalatogo_spark.queries.pipeline import corpus_shard_stats

    df = corpus_shard_stats(spark, sf_dir)
    cols = plans.scan_read_schema(df)
    assert cols and "lang" not in cols and "source" not in cols \
        and "doc_id" not in cols
    assert plans.has_partial_aggregate(df)


def test_asof_join_is_one_shuffle_no_join(spark, sf_dir):
    """The as-of join must compile to union + window — exactly one hash
    exchange on the key, and NO join operator anywhere (the reference's only
    non-equi path was a nested-loop cross join; this is the scale-correct
    replacement)."""
    from impalatogo_spark.queries.relational import join_asof

    df = join_asof(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    assert plans.count_shuffles(df) == 1


def test_range_join_never_nested_loop(spark, sf_dir):
    """The bucketed range join must be a hash join on (key, bucket) — a
    BroadcastNestedLoopJoin/CartesianProduct in this plan would be O(n*m)
    at 100 TB."""
    from impalatogo_spark.queries.relational import join_range_attribution

    plan = plans.formatted_plan(join_range_attribution(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    """Packing must be one hash exchange on shard + a partition-local
    window — a global-order window here would serialize the whole corpus
    through one task."""
    from impalatogo_spark.queries.pipeline import corpus_pack_sequences

    df = corpus_pack_sequences(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert plans.count_shuffles(df) == 1
    assert "Window" in plan


def test_vocab_topk_combines_and_takes_ordered(spark, sf_dir):
    """Vocab scan: (word, doc) pre-aggregate must map-side combine, and the
    global top-k must be TakeOrderedAndProject, not a full sort."""
    from impalatogo_spark.queries.pipeline import corpus_vocab_topk

    df = corpus_vocab_topk(spark, sf_dir)
    assert plans.has_partial_aggregate(df)
    assert plans.uses_take_ordered(df)


def test_quantize_broadcasts_ranges(spark, sf_dir):
    """The 64-row per-dimension range table must broadcast back onto the
    exploded vectors — shuffling the exploded corpus to join 64 rows would
    move O(vectors x dims) rows at 100 TB."""
    from impalatogo_spark.queries.pipeline import embedding_quantize

    assert plans.uses_broadcast_join(embedding_quantize(spark, sf_dir))


def test_centroids_partial_aggregate(spark, sf_dir):
    """Centroid aggregation must partial-aggregate: the shuffle carries
    (label, dim) partial sums, never raw vectors."""
    from impalatogo_spark.queries.pipeline import embedding_centroids

    assert plans.has_partial_aggregate(embedding_centroids(spark, sf_dir))


def test_rollup_single_expand_single_scan(spark, sf_dir):
    """ROLLUP/CUBE must execute as ONE Expand + one aggregation pipeline —
    not a per-level UNION that rescans the fact table once per grouping
    level (4 levels of cube = 4x the scan cost at 100 TB)."""
    from impalatogo_spark.queries.relational import agg_cube, agg_rollup

    import re

    for fn in (agg_rollup, agg_cube):
        plan = plans.formatted_plan(fn(spark, sf_dir))
        # formatted plans name each node once in the tree and once in the
        # details — count distinct "(n) Expand" node headers
        assert len(re.findall(r"\(\d+\) Expand", plan)) == 1, plan
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2
        assert "Union" not in plan


def test_embedding_neardup_is_bucketed_not_allpairs(spark, sf_dir):
    """The registered embedding near-dup path must be a (band, key) hash
    equijoin — no nested-loop / cartesian anywhere (the round-1 all-pairs
    form was O(n^2) by construction)."""
    from impalatogo_spark.queries.pipeline import dedup_embedding_cosine

    plan = plans.simple_plan(dedup_embedding_cosine(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_product_anywhere(spark, sf_dir):
    """Sweep every registered batch query: a CartesianProduct node (a
    non-broadcast cross join) is never acceptable — at 100 TB it is an
    O(n*m) shuffle explosion. (1-row-broadcast scalar subqueries compile to
    BroadcastNestedLoopJoin, which is fine — the broadcast side is one
    row by construction; this sweep targets the genuinely unbounded form.)"""
    from impalatogo_spark.queries import all_queries

    offenders = []
    for name, q in sorted(all_queries().items()):
        if "streaming" in name:  # streaming plans materialize via sinks
            continue
        try:
            plan = plans.simple_plan(q.spark_fn(spark, sf_dir))
        except Exception:
            continue  # rows-only queries that need special harnesses
        if "CartesianProduct" in plan:
            offenders.append(name)
    from impalatogo_spark.session import release_persisted

    release_persisted()
    assert not offenders, f"CartesianProduct in: {offenders}"


def test_pivot_single_aggregate_pass(spark, sf_dir):
    """PIVOT with explicit values must compile to ONE aggregation pipeline
    over one scan (PivotFirst) — never a per-value UNION or one scan per
    pivot column (5 event types = 5x the scan cost at 100 TB)."""
    import re

    from impalatogo_spark.queries.relational import agg_pivot

    plan = plans.formatted_plan(agg_pivot(spark, sf_dir))
    assert "Union" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_bloom_prefilter_broadcasts_bits_and_never_joins_corpus_text(spark, sf_dir):
    """The Bloom bit-set must reach the batch via a broadcast join (it is
    filter-sized by construction); the corpus side contributes only md5
    fingerprints/positions to any exchange — full text never shuffles."""
    from impalatogo_spark.queries.pipeline import dedup_bloom_prefilter

    plan = plans.formatted_plan(dedup_bloom_prefilter(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fim_transform_is_joinless_single_scan(spark, sf_dir):
    """FIM is a pure map pass: no join anywhere, scan pruned to
    (doc_id, text), and the only exchange is the presentation sort."""
    from impalatogo_spark.queries.pipeline import text_fim_transform

    df = text_fim_transform(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    cols = plans.scan_read_schema(df)
    assert "doc_id" in cols and "text" in cols
    assert "lang" not in cols and "source" not in cols
    # one range exchange for the orderBy, nothing else
    assert plans.count_shuffles(df) <= 1


def test_bm25_broadcasts_stats_and_takes_ordered(spark, sf_dir):
    """BM25's df/corpus-stat sides are tiny and must broadcast; the top-k
    must compile to TakeOrderedAndProject (no global single-partition
    window over the full matched set)."""
    from impalatogo_spark.queries.pipeline import text_bm25_topk

    df = text_bm25_topk(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_anomaly_broadcasts_type_stats(spark, sf_dir):
    """3-sigma gate: the per-type stats aggregate is tiny and must join
    map-side — the event fact scan never shuffles for the flagging pass."""
    from impalatogo_spark.queries.pipeline import events_anomaly_exact

    assert plans.uses_broadcast_join(events_anomaly_exact(spark, sf_dir))


def test_importance_weights_broadcasts_weight_table(spark, sf_dir):
    """DSIR resampling: the 64-bucket weight table and the 1-row corpus
    total both broadcast; the only O(corpus) shuffle carries per-doc
    partial sums."""
    from impalatogo_spark.queries.pipeline import corpus_importance_weights
    from impalatogo_spark.session import release_persisted

    try:
        assert plans.uses_broadcast_join(corpus_importance_weights(spark, sf_dir))
    finally:
        release_persisted()


def test_pagerank_no_cartesian_no_collect(spark, sf_dir):
    """The unrolled 3-round PageRank is a single declarative plan: hash
    joins only (no nested-loop fallback), all rounds in one job."""
    from impalatogo_spark.queries.pipeline import events_pagerank
    from impalatogo_spark.session import release_persisted

    try:
        df = events_pagerank(spark, sf_dir)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        assert df.count() > 0
    finally:
        release_persisted()


def test_pareto_frontier_prune_broadcasts(spark, sf_dir):
    """The skyline's bucket-cummax prune table must reach the data via a
    broadcast join (it is bucket-grain tiny); the corpus itself must
    never build a hash-join table against it."""
    from impalatogo_spark.queries.relational import part_pareto_frontier

    df = part_pareto_frontier(spark, sf_dir)
    assert plans.uses_broadcast_join(df)


def test_interval_overlap_is_bucket_equijoin(spark, sf_dir):
    """Interval x interval overlap must compile to a broadcast hash join
    on the epoch-hour bucket — never BroadcastNestedLoopJoin (the
    inequality-pair fallback that dies at scale)."""
    from impalatogo_spark.queries.relational import join_interval_overlap

    df = join_interval_overlap(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.uses_broadcast_join(df)


def test_table_profile_single_scan(spark, sf_dir):
    """The per-column profile must read the table ONCE: a single scan
    node feeding one Expand for the multi-column COUNT(DISTINCT), not
    one scan per column."""
    from impalatogo_spark.queries.relational import table_profile

    df = table_profile(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan


def test_table_profile_approx_no_expand(spark, sf_dir):
    """The 100 TB profile default: approx_count_distinct keeps the single
    scan AND drops the Expand row-multiplier; sketch NDVs stay within
    HLL++ bounds of the exact twin, everything else matches exactly."""
    from impalatogo_spark.queries.relational import (table_profile,
                                                     table_profile_approx)

    df = table_profile_approx(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" not in plan, "approx profile must not multiply scan rows"

    exact = {r["col_name"]: r for r in table_profile(spark, sf_dir).collect()}
    approx = {r["col_name"]: r for r in df.collect()}
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        for f in ("n_rows", "n_nulls", "min_v", "max_v"):
            assert a[f] == e[f], (col, f, a[f], e[f])
        # default rsd 0.05 -> generous 15% bound for tiny test SF
        assert abs(a["ndv"] - e["ndv"]) <= max(3, 0.15 * e["ndv"]), (
            col, a["ndv"], e["ndv"])


def test_er_blocking_no_cartesian(spark, sf_dir):
    """Blocked ER candidate generation must plan an equi hash/merge join
    on the block keys with the edit-distance predicate applied post-join
    — never a cartesian/nested-loop product. The equi-join key must
    include the content-derived deletion-variant column: a fixed
    (nation, segment)-only block key was the r02-verdict quadratic
    (per-block pair work grows as (n/125)^2 — 125 blocks regardless of
    data size)."""
    from impalatogo_spark.queries.relational import customers_er_blocking

    df = customers_er_blocking(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__hk" in plan, "pairing key lost the deletion-variant hash"


def test_hourly_seasonality_partial_agg(spark, sf_dir):
    """The seasonality rollup must be 2-phase (map-side partial
    aggregation before the exchange)."""
    from impalatogo_spark.queries.relational import events_hourly_seasonality

    assert plans.has_partial_aggregate(events_hourly_seasonality(spark, sf_dir))


def test_decontaminate_semantic_broadcasts_benchmark(spark, sf_dir):
    """Semantic decontamination must broadcast the (small by nature)
    benchmark side and score the corpus map-side — a broadcast
    nested-loop over the benchmark, never a CartesianProduct shuffle
    explosion, and no exchange on the corpus branch before the join."""
    from impalatogo_spark.queries.pipeline import decontaminate_semantic

    df = decontaminate_semantic(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # the corpus scan must feed the join directly (no shuffle before it):
    # the only Exchange allowed below the join is the broadcast one
    join_pos = plan.index("BroadcastNestedLoopJoin")
    below = plan[join_pos:]
    assert "Exchange hashpartitioning" not in below.split("Window")[0], plan


def test_hybrid_rrf_branches_are_topn(spark, sf_dir):
    """Both RRF branches must reach their 50-row rank lists via
    TakeOrderedAndProject (TopN), never a global sort or window over the
    full corpus, and the fused join is 50x50-row driver-trivial."""
    from impalatogo_spark.queries.pipeline import retrieval_hybrid_rrf

    plan = plans.simple_plan(retrieval_hybrid_rrf(spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    assert "CartesianProduct" not in plan
