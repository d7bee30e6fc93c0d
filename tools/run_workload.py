#!/usr/bin/env python
"""run_workload — the reference's benchmark driver surface
(bin/run-workload.py) over this engine's registered query inventory.

Workloads map to the same names the reference harness takes:

  tpch           the 22 adapted TPC-H queries
  tpcds          the 25-query reference TPC-DS workload list
  hive-benchmark / amplab   the AMPLab big-data benchmark shapes
  targeted-perf  the micro-benchmark shapes
  pipeline       the training-data pipeline operators (beyond-reference)
  relational     window/join/agg/function/subquery/set-op batteries
  all            every registered query

Usage examples (flag names follow the reference):
  python tools/run_workload.py -w tpch
  python tools/run_workload.py -w tpch:0.01,tpcds:0.001 -i 3
  python tools/run_workload.py -w tpch --query_names tpch_q1,tpch_q6
  python tools/run_workload.py -w tpch --num_clients 4 --shuffle_query_exec_order
  python tools/run_workload.py -w tpch --exec_options "NUM_NODES=16;DISABLE_CODEGEN=0"
  python tools/run_workload.py -w tpch --results_json_file /tmp/results.json

Scale factors name testdata dirs: `tpch:0.01` runs at /root/testdata/sf0.01
(default 0.1, bench parity)."""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PREFIXES = {
    "tpch": ("tpch_",),
    "tpcds": ("tpcds_",),
    "hive-benchmark": ("amplab_",),
    "amplab": ("amplab_",),
    "targeted-perf": ("perf_",),
    "pipeline": ("dedup_", "ann_", "text_", "corpus_", "pipeline_",
                 "multimodal_", "embedding_", "events_", "sample_",
                 "topk_", "streaming_"),
    "relational": ("agg_", "func_", "join_", "window_", "subquery_",
                   "union_", "set_", "with_", "having_", "limit_",
                   "order_", "select_", "values_", "lateral_",
                   "inline_"),
}


def _select(registry, workload: str, query_names: set[str] | None):
    if workload == "all":
        names = list(registry)
    else:
        prefixes = _PREFIXES[workload]
        names = [n for n in registry if n.startswith(prefixes)]
    if query_names:
        names = [n for n in names if n in query_names]
    return names


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-w", "--workloads", default="tpch",
                    help="comma list of workload[:sf], e.g. tpch:0.01,tpcds")
    ap.add_argument("-i", "--query_iterations", type=int, default=1)
    ap.add_argument("--query_names", default="",
                    help="comma list restricting which queries run")
    ap.add_argument("--num_clients", type=int, default=1,
                    help="concurrent clients per query (threads)")
    ap.add_argument("--shuffle_query_exec_order", action="store_true")
    ap.add_argument("--exec_options", default="",
                    help="semicolon list of SET options, e.g. NUM_NODES=16")
    ap.add_argument("--results_json_file", default="")
    ap.add_argument("--continue_on_query_error", action="store_true")
    args = ap.parse_args()

    from impalatogo_spark.engine import Engine
    from impalatogo_spark.queries import all_queries
    from impalatogo_spark.session import get_spark, release_persisted

    spark = get_spark("i2s-run-workload")
    engine = Engine(spark)
    for kv in filter(None, args.exec_options.split(";")):
        k, _, v = kv.partition("=")
        engine.set(k.strip(), v.strip())

    registry = all_queries()
    wanted = set(filter(None, args.query_names.split(","))) or None
    results = []
    for spec in args.workloads.split(","):
        workload, _, sf = spec.partition(":")
        sf = sf or "0.1"
        sf_dir = f"/root/testdata/sf{sf}"
        names = _select(registry, workload.strip(), wanted)
        if args.shuffle_query_exec_order:
            random.Random(42).shuffle(names)
        print(f"=== workload {workload} sf={sf} ({len(names)} queries, "
              f"{args.query_iterations} iteration(s), "
              f"{args.num_clients} client(s))")
        for name in names:
            fn = registry[name].spark_fn
            samples, error = [], None
            for _ in range(args.query_iterations):
                t0 = time.perf_counter()
                try:
                    if args.num_clients == 1:
                        fn(spark, sf_dir).collect()
                    else:
                        with ThreadPoolExecutor(args.num_clients) as pool:
                            list(pool.map(
                                lambda _: fn(spark, sf_dir).collect(),
                                range(args.num_clients)))
                except Exception as e:  # noqa: BLE001
                    error = f"{type(e).__name__}: {e}"
                    if not args.continue_on_query_error:
                        raise
                    break
                else:
                    samples.append(time.perf_counter() - t0)
                finally:
                    # even a failed query may have registered persists —
                    # a leak here skews every later timing (CLAUDE.md rule)
                    release_persisted()
            med = round(statistics.median(samples), 4) if samples else None
            results.append({"workload": workload, "sf": sf, "query": name,
                            "median_sec": med, "error": error})
            print(f"  {name:<40} {med if med is not None else 'ERROR':>8}"
                  f"{'s' if med is not None else ''}")
        total = sum(r["median_sec"] for r in results
                    if r["workload"] == workload and r["sf"] == sf
                    and r["median_sec"])
        print(f"=== {workload} total (median per query): {total:.2f}s")
    if args.results_json_file:
        with open(args.results_json_file, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"results written to {args.results_json_file}")


if __name__ == "__main__":
    main()
