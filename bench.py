#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology per BASELINE.md: warm session (one untimed warmup pass of q1),
median of 3 runs per query, session bootstrap excluded.

Interference robustness (r03 verdict #3): the 3 measurement runs of a query
are NOT consecutive — the whole suite runs 3x round-robin, so a transient
external load spike poisons at most one of a query's 3 samples instead of
all of them (three r03 bench artifacts on one box disagreed only in which
queries got ~20s stalls; per-query minima agreed). bench_results.json
records per-query median AND min plus os.getloadavg() around each pass so
contaminated passes are visible in the artifact.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impalatogo_spark.queries import all_queries
from impalatogo_spark.session import DEFAULT_SF_DIR, get_spark

# Headline set: full TPC-H suite + the pipeline-operator spine
# (dedup, similarity, text, sessionization, streaming).
HEADLINE = [f"tpch_q{i}" for i in range(1, 23)] + [
    # full reference TPC-DS workload list (testdata/workloads/tpcds/queries/)
    f"tpcds_q{i}"
    for i in (3, 6, 7, 8, 19, 27, 34, 42, 43, 46, 47, 52, 53, 55, 59,
              61, 63, 65, 68, 73, 79, 88, 89, 96, 98)
] + [
    "amplab_grep",
    "amplab_rankings",
    "amplab_uservisits_join",
    "window_rank",
    "window_running_sum",
    "agg_distinct_multi",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_paragraph",
    "ann_topk_bruteforce",
    "text_quality",
    "text_token_stats",
    "text_repetition_quality",
    "text_contamination",
    "text_pii_redact",
    "pipeline_curate",
    "corpus_shard_stats",
    "corpus_pack_sequences",
    "corpus_vocab_topk",
    "embedding_quantize",
    "join_asof",
    "join_range_attribution",
    "events_sessionize",
    "events_json_extract",
    "events_tumbling_window",
    "func_date_arith",
    # round 2: banded embedding near-dup, OLAP grouping, dist windows, setops
    "dedup_substring_spans",
    "dedup_embedding_cosine",
    "agg_rollup",
    "agg_cube",
    "window_ntile_dist",
    "set_intersect",
    # round 2 (cont.): model-scoring gate, Bloom prefilter, int8 ADC MIPS,
    # pivot reshaping
    "text_quality_classifier",
    "dedup_bloom_prefilter",
    "ann_topk_quantized",
    "agg_pivot",
    "events_variant_extract",
    "text_quality_percentile_gate",
    "corpus_contrastive_triplets",
    # round 2 (cont.): exact-integer clustering, bigram LM gate, governance
    # matrix, BPE vocabulary training
    "embedding_kmeans",
    "text_bigram_lm_score",
    "dedup_cross_source_matrix",
    "corpus_bpe_merges",
    # round 2 (cont.): SemDeDup, oracle-exact IVF, perceptual-hash dedup,
    # burst + path event analytics
    "dedup_semantic",
    "ann_topk_ivf_exact",
    "multimodal_phash_dedup",
    "events_burst_detection",
    "events_path_analysis",
    # round 2 (final): BPE encode, tolerance as-of, method agreement, VAD
    # segmentation, lang confusion
    "corpus_bpe_encode",
    "join_asof_tolerance",
    "dedup_method_agreement",
    "multimodal_vad_segments",
    "text_language_confusion",
    # round 2 (last batch): RFM, equi-depth histogram, LOCF, novelty,
    # curation funnel, calibration curve
    "events_rfm_segments",
    "agg_histogram_equidepth",
    "window_locf_impute",
    "text_ngram_novelty",
    "pipeline_curate_report",
    "dedup_minhash_calibration",
    # round 2 (closing): topic balance, LATERAL top-k, named WINDOW clause
    "corpus_topic_balance",
    "join_lateral_topk",
    "window_named_clause",
    # round 2 (session 2): tokenizer economics, exact anomaly gate, DSIR
    # importance resampling, integer PageRank, product quantization, CLIP gate
    "text_tokenizer_fertility",
    "events_anomaly_exact",
    "corpus_importance_weights",
    "events_pagerank",
    "embedding_pq_codes",
    "multimodal_clip_gate",
    "corpus_split_assign",
    "embedding_random_projection",
    "events_anomaly_mad",
    # round 2 (session 3): multiset set ops, recursive CTE spine, robust
    # trimmed/winsorized aggregates, date-spine gap fill, HHI concentration
    "set_intersect_all",
    "set_except_all",
    "with_recursive_spine",
    "agg_trimmed_mean",
    "window_gap_fill_days",
    "corpus_source_concentration",
    "agg_filter_clause",
    "func_array",
    "dedup_exact_normalized",
    "corpus_perplexity_buckets",
    "events_ab_lift_exact",
    "events_scd2_intervals",
    "market_basket_pairs",
    "events_sliding_distinct_users",
    # round 2 (session 4): skyline, ER blocking, interval-overlap join,
    # hour-of-day seasonality
    "part_pareto_frontier",
    "customers_er_blocking",
    "join_interval_overlap",
    "events_hourly_seasonality",
    # round 2 (session 4b): nearest as-of, MAP battery, CUSUM changepoint,
    # weighted hash sampling (events_triangle_count stays off the headline:
    # the synthetic co-activity graph is near-complete at sf0.1, so the
    # enumeration is ~5e8 triangles by construction — correctness-gated at
    # sf0.01 instead)
    "join_asof_nearest",
    "func_map",
    "events_changepoint_cusum",
    "sample_weighted_hash",
    # round 2 (session 4c): one-scan data profile, bitwise batteries,
    # DAU/WAU stickiness
    "table_profile",
    "func_bitwise",
    "agg_boolean_bitwise",
    "events_dau_wau_stickiness",
    # round 2 (session 4d): Gini/Lorenz concentration, integer lag-1
    # autocorrelation, nth_value, feature hashing
    "orders_gini_revenue",
    "events_autocorr_lag1",
    "window_nth_value",
    "text_hashing_trick",
    # round 2 (session 4e): PMI collocations, weighted moving average,
    # shuffle-key skew diagnostic
    "corpus_pmi_collocations",
    "events_weighted_moving_avg",
    "events_key_skew_report",
    # round 2 (session 4f): trigram paths, seasonality decomposition,
    # substitution candidates
    "events_trigram_paths",
    "orders_seasonality_decompose",
    "part_substitution_candidates",
    # round 2 (session 4g): deterministic mode, arg-min/max + count_if,
    # activity bitmaps
    "agg_mode_deterministic",
    "agg_argminmax_countif",
    "events_activity_bitmap",
    # round 2 (session 4h): longest streaks, readability bands, SRM gate
    "events_streak_longest",
    "documents_readability_scores",
    "events_ab_srm_check",
    # round 2 (session 4i): cohort LTV curve, return-rate trend,
    # null-safe join, exact covariance
    "events_cohort_ltv_curve",
    "lineitem_return_rate_trend",
    "join_null_safe_eq",
    "agg_covar_exact",
    "events_inter_arrival_stats",
    # round 3: soft dedup, semantic decontamination, hybrid RRF retrieval,
    # approx (no-Expand) table profile
    "dedup_soft_weights",
    "decontaminate_semantic",
    "retrieval_hybrid_rrf",
    "table_profile_approx",
    "select_kcenter_diversity",
    "text_span_corruption",
    "embedding_outlier_filter",
    # round 4: persisted IVF index lifecycle, IVF-PQ ADC
    "ann_topk_ivf_indexed",
    "ann_topk_ivf_pq_adc",
    "events_decayed_engagement",
    "split_leakage_report",
    "text_winnow_fingerprints",
    # round 5: the reference TPC-H workload's 23rd file — the write path
    # (insert_parquet.test: partitioned INSERT OVERWRITE + re-read verify)
    # + attribute-filtered exact vector search
    "insert_parquet_roundtrip",
    "ann_topk_filtered",
    "embedding_matryoshka_fidelity",
    # round 5 (session 2): mergeable sketches — per-shard HLL registers
    # merged associatively, KMV bottom-k set-operation estimates
    "sketch_hll_mergeable",
    "sketch_kmv_intersection",
    # round 5 (session 2, cont.): quantified Z-order layout pruning,
    # distributed PCA (integer-exact covariance + driver-eig projection)
    "layout_zorder_pruning",
    "embedding_covariance_topk",
    "embedding_pca_project",
    # round 5 (session 2, cont.): IR-quality eval harness, similarity-based
    # corpus reordering (compression-locality audit)
    "retrieval_eval_metrics",
    "corpus_similarity_ordering",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_quantiles",
    "ann_topk_binary_rerank",
    # round 5 (session 2, cont.): pre-publish validation report,
    # referentially-consistent dev-subset sampling
    "table_expectations",
    "sample_referential",
    "agg_incremental_rollup",
    "table_fingerprints",
    "table_storage_report",
    "dedup_jaccard_prefix_filter",
    # round 5 (session 2, cont.): release-governance + experimentation
    "privacy_k_anonymity",
    "events_ab_cuped",
    "corpus_packing_efficiency",
    "multimodal_audio_constellation",
    "events_attribution_shapley",
    "corpus_vocab_coverage_curve",
    "sketch_bloom_membership",
    # round 6: O(batch) cluster maintenance (incremental connected
    # components vs full-recompute oracle), Ed-Join edit-distance join,
    # DPO preference-pair mining, ingest unigram-drift gate
    "dedup_clusters_incremental",
    "dedup_edit_distance",
    "corpus_preference_pairs",
    "corpus_unigram_drift",
    # round 7: scalable exact grouped percentiles (grouped_percentiles
    # rank-selection operator — the SLO-tail readout)
    "events_value_percentiles",
    # round 7 (session 2): template-family k-core mining, classifier
    # calibration (ECE), per-source token caps, l-diversity release audit
    "dedup_template_kcore",
    "quality_calibration_ece",
    "corpus_source_caps",
    "privacy_l_diversity",
    "ann_topk_mmr",
    "privacy_t_closeness",
]
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("impalatogo-spark-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # warmup: pay codegen/JIT/session costs outside the measurement
    registry[names[0]].spark_fn(spark, sf_dir).collect()

    from impalatogo_spark.session import release_persisted

    # interleaved passes: suite x RUNS round-robin, so one external load
    # spike contaminates at most one of each query's samples
    passes: list[dict[str, float]] = []
    loadavg: list[dict] = []
    for _ in range(RUNS):
        load_start = os.getloadavg()
        pass_t: dict[str, float] = {}
        for name in names:
            fn = registry[name].spark_fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            pass_t[name] = time.perf_counter() - t0
            # keep one query's persisted intermediates from inflating the
            # next query's memory (and from surviving the whole suite)
            release_persisted()
        loadavg.append({
            "start_1m": round(load_start[0], 2),
            "end_1m": round(os.getloadavg()[0], 2),
            "total_sec": round(sum(pass_t.values()), 2),
        })
        passes.append(pass_t)

    timings = {n: round(statistics.median([p[n] for p in passes]), 4)
               for n in names}
    minimums = {n: round(min(p[n] for p in passes), 4) for n in names}

    total = round(sum(timings.values()), 4)
    min_total = round(sum(minimums.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query map goes to a file: the driver's stdout capture keeps
    # only the tail, and a 160+-entry "queries" map pushed the single JSON
    # line past that window (BENCH_r02.json came back `parsed: null`). The
    # LAST stdout line is a compact (<1 KB) summary that always survives
    # tail capture; per-query numbers live in bench_results.json.
    full = {
        "metric": "headline_suite_median_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": minimums,
        "min_total": min_total,
        "loadavg": loadavg,
        "sf": sf_val,
    }
    results_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results.json"
    )
    with open(results_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    slowest = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    # Driver per-query channel (r07 verdict items 3/4). Tail window
    # MEASURED from the driver's own artifacts: it parses the LAST 2000
    # chars of output (BENCH_r01: a 1905-char final line parsed;
    # BENCH_r02: a ~5.5 kB line came back `parsed: null` with the line's
    # front truncated out of the recorded 2000-char tail). The full
    # 218-entry map is ~5.5 kB and therefore can NEVER parse from the
    # tail, so three channels, most complete first:
    #  * bench_results.json — full medians + minima (committed artifact);
    #  * a dedicated full-map stdout line (below) for any consumer that
    #    keeps the whole stream — harmless in the tail, where its
    #    truncated front can't shadow the final line;
    #  * the final contract line inlines the largest SLOWEST-FIRST prefix
    #    of the per-query map that keeps the line inside the window —
    #    suite time concentrates in the slow tail, so these entries carry
    #    nearly all of the per-query round-over-round signal.
    print(json.dumps({"metric": "per_query_full", "unit": "sec",
                      "queries": timings, "queries_min": minimums}))
    base = {
        "metric": "headline_suite_median_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf_val,
        "min_total": min_total,
        "loadavg_1m": [l["start_1m"] for l in loadavg],
        "slowest5": {k: v for k, v in slowest},
        "queries_file": "bench_results.json",
        "queries_omitted": 0,
    }
    qmap: dict[str, float] = {}
    for k, v in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        qmap[k] = round(v, 2)
        base["queries_omitted"] = len(timings) - len(qmap)
        if len(json.dumps({**base, "queries": qmap},
                          separators=(",", ":"))) > 1900:
            del qmap[k]
            base["queries_omitted"] = len(timings) - len(qmap)
            break
    print(json.dumps({**base, "queries": qmap}, separators=(",", ":")))


if __name__ == "__main__":
    main()
