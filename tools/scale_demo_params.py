#!/usr/bin/env python
"""Scaled-parameter demonstrations for the fixed-parameter queries that
time out at sf1 (SCALE_AUDIT_r06.md companion).

Four registered queries are quadratic AT THEIR GATE PARAMETERS, not in
their operator shape: the oracle-exact gate forms pin small constants
(k=4 k-means cells, default sign-band width, benchmark = an entire
embedding label, a deliberately near-complete synthetic graph). The
operators themselves take the scale knob. This script runs the SAME
operators at sf1 with the knob set the way a 100 TB deployment would
(cells ∝ corpus, wider bands, fixed-size benchmark) and prints wall
seconds + result sizes — turning 'the parametrized form scales' from
prose into a measurement.

Usage: python tools/scale_demo_params.py [sf_dir]   (default .localdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"


def main() -> None:
    from pyspark.sql import functions as F

    from impalatogo_spark.operators import similarity as S
    from impalatogo_spark.session import get_spark, release_persisted, table

    spark = get_spark("scale-demo")
    out = {}

    emb = table(spark, SF_DIR, "embeddings")
    n = emb.count()

    # dedup_semantic gate form: k=4 cells -> |c| ~ n/4, per-cluster cosine
    # O(sum |c|^2) ~ n^2/4. Deployment form: k ∝ n so |c| stays ~125 (the
    # sf0.01 gate's cluster size), per-cluster work O(n * 125).
    k = max(4, n // 125)
    t0 = time.perf_counter()
    pairs = S.semantic_dedup_pairs(emb, k=k, iters=3, threshold=0.4)
    cnt = pairs.count()
    out["dedup_semantic_scaled"] = {
        "n_vectors": n, "k_cells": k, "pairs": cnt,
        "seconds": round(time.perf_counter() - t0, 1)}
    release_persisted()

    # corpus_contrastive_triplets gate form: default sign-band width; at
    # 10x vector density each band bucket grows ~10x and the O(bucket^2)
    # candidate join melts. Deployment form: +4 band bits (x16 buckets).
    e = S.with_double_embedding(emb)
    t0 = time.perf_counter()
    pos = S.sign_band_pairs(e, 0.45, band_bits=S.SIGN_BAND_BITS + 4)
    cnt = pos.count()
    out["sign_band_pairs_scaled"] = {
        "n_vectors": n, "band_bits": S.SIGN_BAND_BITS + 4, "pairs": cnt,
        "seconds": round(time.perf_counter() - t0, 1)}
    release_persisted()

    # decontaminate_semantic gate form: benchmark = label 0 = ~10% of the
    # table, which GROWS with sf (a testdata artifact). Real benchmarks
    # are fixed-size; cap at 500 vectors and score the whole corpus.
    bench = e.filter(F.col("label") == 0).orderBy("vec_id").limit(500)
    corpus = e.filter(F.col("label") != 0)
    t0 = time.perf_counter()
    b = bench.select(F.col("vec_id").alias("bench_id"),
                     F.col("embedding").alias("be"),
                     S._norm(F.col("embedding")).alias("bnrm"))
    c = corpus.select("vec_id", "embedding",
                      S._norm(F.col("embedding")).alias("nrm"))
    flagged = (
        c.crossJoin(F.broadcast(b))
        .withColumn("cos", S._dot(F.col("embedding"), F.col("be"))
                    / (F.col("nrm") * F.col("bnrm")))
        .filter(F.col("cos") >= 0.45)
        .groupBy("vec_id").agg(F.count(F.lit(1)).alias("hits"))
    )
    cnt = flagged.count()
    out["decontaminate_fixed_bench"] = {
        "n_corpus": corpus.count(), "n_bench": 500, "flagged": cnt,
        "seconds": round(time.perf_counter() - t0, 1)}
    release_persisted()

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
