#!/usr/bin/env python
"""Concurrent-streams throughput benchmark (the TPC-H throughput-test
shape against the shared engine).

Reference parity: the reference is benchmarked multi-tenant — N clients
each running the query set in a different permutation while admission
control arbitrates (admission-controller.cc). Here each stream is an
isolated `spark.newSession()` (the per-session contract the servers use)
pinned to its own FAIR scheduler pool, running its permuted TPC-H
sequence concurrently; per-query admission goes through the same
AdmissionController the daemons enforce. Prints ONE JSON line:

  {"metric": "tpch_throughput", "streams": N, "total_sec": ...,
   "queries_per_hour": ..., "per_stream_sec": [...], "sf": ...}

Usage:
  python tools/bench_throughput.py [--streams 4] [--sf-dir DIR]
                                   [--max-requests 0]

--max-requests > 0 caps concurrent admitted queries, so the tool doubles
as an admission-throughput probe (queueing shows up as longer per-stream
wall clocks in per_stream_sec).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impalatogo_spark.admission import AdmissionController  # noqa: E402
from impalatogo_spark.queries import all_queries  # noqa: E402
from impalatogo_spark.session import (DEFAULT_SF_DIR,  # noqa: E402
                                      ensure_session_confs, get_spark)


def run(streams: int, sf_dir: str, max_requests: int = 0,
        query_names: list[str] | None = None) -> dict:
    spark = get_spark("i2s-throughput")
    registry = all_queries()
    names = query_names or [f"tpch_q{i}" for i in range(1, 23)]
    names = [n for n in names if n in registry]

    admission = AdmissionController()
    if max_requests > 0:
        admission.configure_pool("default", max_requests=max_requests)

    # warmup outside the measurement (codegen/JIT/scan caches)
    registry[names[0]].spark_fn(spark, sf_dir).collect()

    per_stream: list[float] = [0.0] * streams
    rows_seen: list[int] = [0] * streams
    errors: list = []

    def stream(i: int) -> None:
        # TPC-H throughput-test style: each stream runs the full set in
        # its own deterministic permutation, in its own isolated session
        order = list(names)
        random.Random(1000 + i).shuffle(order)
        sess = spark.newSession()
        ensure_session_confs(sess)
        sess.sparkContext.setLocalProperty("spark.scheduler.pool",
                                           f"stream_{i}")
        try:
            t0 = time.perf_counter()
            for name in order:
                admission.admit("default", label=f"s{i}:{name}")
                try:
                    rows_seen[i] += len(
                        registry[name].spark_fn(sess, sf_dir).collect())
                finally:
                    admission.release("default")
            per_stream[i] = time.perf_counter() - t0
        except Exception as e:  # surfaces below
            errors.append((i, repr(e)))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=stream, args=(i,))
               for i in range(streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"stream failures: {errors}")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "tpch_throughput",
        "streams": streams,
        "n_queries": len(names),
        "total_sec": round(total, 2),
        "queries_per_hour": round(streams * len(names) * 3600 / total, 1),
        "per_stream_sec": [round(s, 2) for s in per_stream],
        "rows_per_stream": rows_seen,
        "admission": admission.stats("default")["default"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           DEFAULT_SF_DIR))
    ap.add_argument("--max-requests", type=int, default=0,
                    help="admission cap on the default pool (0 = unlimited)")
    args = ap.parse_args()
    print(json.dumps(run(args.streams, args.sf_dir, args.max_requests)))


if __name__ == "__main__":
    main()
