#!/usr/bin/env python
"""Dump `explain("formatted")` for registered queries to plan files, and
optionally count the Spark jobs the query's full execution submits (job-count
is the evidence for pass-removal optimizations whose plans look identical,
e.g. lazy-vs-eager per-round checkpoints).

Usage:
  python tools/dump_plan.py <out_path> <query> [--sf-dir DIR] [--jobs]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impalatogo_spark.queries import all_queries
from impalatogo_spark.session import get_spark, release_persisted


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_path")
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--jobs", action="store_true",
                    help="also execute the query under a job group and "
                    "append the submitted-job count to the dump")
    args = ap.parse_args()

    registry = all_queries()
    if args.query not in registry:
        raise SystemExit(f"unknown query: {args.query}")
    spark = get_spark("dump-plan")
    sc = spark.sparkContext

    job_note = ""
    if args.jobs:
        group = f"dump_plan_{args.query}"
        sc.setJobGroup(group, args.query)
        df = registry[args.query].spark_fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(None, None)
        job_note = f"\n-- jobs submitted (noop sink, {args.sf_dir}): {n_jobs}\n"
        release_persisted()

    df = registry[args.query].spark_fn(spark, args.sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    release_persisted()
    with open(args.out_path, "w") as fh:
        fh.write(plan)
        if job_note:
            fh.write(job_note)
    print(f"wrote {args.out_path} ({len(plan)} chars){job_note.strip()}")


if __name__ == "__main__":
    main()
