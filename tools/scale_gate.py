#!/usr/bin/env python
"""Run the full driver contract at an arbitrary (large) scale factor with
per-query wall budgets, and record a machine-readable scale report.

This is the sf1 "prove the 100x posture empirically" harness (VERDICT r05
item 1): for every registered query it records

  status        MATCH / ROWS_ONLY / FAIL / SPARK_TIMEOUT / ORACLE_TIMEOUT
  rows          spark result rows
  spark_s       spark wall seconds (collect included)
  oracle_s      duckdb wall seconds
  shuffle_bytes executed shuffle-write bytes (plans.shuffle_write_bytes)

into a JSON report keyed by query name. Oracle comparison reuses the exact
normalisation of tools/drive_contract.py. Timeouts cancel the offending side
(sc.cancelJobGroup / duckdb interrupt) and move on, so one quadratic
baseline oracle can't sink a 301-query run.

Usage:
  python tools/scale_gate.py --sf-dir /root/repo/.localdata/sf1 \
      --out SCALE_r06_sf1.json [--timeout 300] [--no-oracle] [--filter substr]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import json
import math
import os
import sys
import threading
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


class _Box:
    def __init__(self):
        self.value = None
        self.error = None


def _run_with_timeout(fn, seconds, on_timeout):
    box = _Box()

    def work():
        try:
            box.value = fn()
        except BaseException as e:  # noqa: BLE001 - report, don't die
            box.error = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        on_timeout()
        t.join(30)
        return None, TimeoutError(f"exceeded {seconds}s")
    return box.value, box.error


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.localdata/sf1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument("--no-oracle", action="store_true")
    ap.add_argument("--filter", default="")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from impalatogo_spark.plans import shuffle_write_bytes
    from impalatogo_spark.session import release_persisted

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')")

    qs, osql = m.queries(), m.oracle_sql()
    report: dict[str, dict] = {}
    fails = 0
    filters = [f for f in args.filter.split(",") if f] or [""]
    names = [n for n in sorted(qs) if any(f in n for f in filters)]
    for idx, name in enumerate(names):
        rec: dict = {}
        report[name] = rec
        group = f"scale-gate-{name}"
        t0 = time.perf_counter()

        def spark_side(name=name, group=group):
            sc.setJobGroup(group, name, interruptOnCancel=True)
            try:
                df = qs[name](spark, args.sf_dir)
                rows = df.collect()
                cols = [c.lower() for c in df.columns]
                sw = shuffle_write_bytes(df)
                return rows, cols, sw
            finally:
                sc.setJobGroup("", "")

        val, err = _run_with_timeout(
            spark_side, args.timeout, lambda g=group: sc.cancelJobGroup(g))
        rec["spark_s"] = round(time.perf_counter() - t0, 2)
        release_persisted()
        if err is not None:
            rec["status"] = ("SPARK_TIMEOUT" if isinstance(err, TimeoutError)
                             else "FAIL")
            rec["error"] = f"{type(err).__name__}: {str(err)[:200]}"
            fails += 1
            print(f"[{idx+1}/{len(names)}] {rec['status']:13s} {name} "
                  f"[{rec['spark_s']}s] {rec.get('error','')[:80]}", flush=True)
            continue
        srows, scols, sw = val
        rec["rows"] = len(srows)
        rec["shuffle_bytes"] = sw

        if args.no_oracle or name not in osql:
            rec["status"] = "ROWS_ONLY"
            print(f"[{idx+1}/{len(names)}] ROWS_ONLY     {name}: {len(srows)} rows "
                  f"[{rec['spark_s']}s, {sw:,}B shuffle]", flush=True)
            continue

        t1 = time.perf_counter()

        def oracle_side(name=name):
            d = con.execute(osql[name])
            return [x[0].lower() for x in d.description], d.fetchall()

        oval, oerr = _run_with_timeout(oracle_side, args.timeout, con.interrupt)
        rec["oracle_s"] = round(time.perf_counter() - t1, 2)
        if oerr is not None:
            rec["status"] = ("ORACLE_TIMEOUT" if isinstance(oerr, TimeoutError)
                             else "ORACLE_FAIL")
            rec["error"] = f"{type(oerr).__name__}: {str(oerr)[:200]}"
            fails += 1
            print(f"[{idx+1}/{len(names)}] {rec['status']:13s} {name} "
                  f"[spark {rec['spark_s']}s ok; oracle {rec['oracle_s']}s]", flush=True)
            continue
        dcols, drows = oval
        if sorted(scols) != sorted(dcols):
            rec["status"] = "FAIL"
            rec["error"] = f"cols {sorted(scols)} vs {sorted(dcols)}"
            fails += 1
        elif len(srows) != len(drows):
            rec["status"] = "FAIL"
            rec["error"] = f"rows {len(srows)} vs {len(drows)}"
            fails += 1
        else:
            i_s = sorted(range(len(scols)), key=lambda i: scols[i])
            i_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sm = Counter(tuple(norm(r[i]) for i in i_s) for r in srows)
            dm = Counter(tuple(norm(r[i]) for i in i_d) for r in drows)
            if sm != dm:
                rec["status"] = "FAIL"
                rec["error"] = (f"values differ; spark-only={list((sm - dm).items())[:1]} "
                                f"duck-only={list((dm - sm).items())[:1]}")[:300]
                fails += 1
            else:
                rec["status"] = "MATCH"
        print(f"[{idx+1}/{len(names)}] {rec['status']:13s} {name}: {len(srows)} rows "
              f"[spark {rec['spark_s']}s, oracle {rec['oracle_s']}s, {sw:,}B shuffle]"
              + (f" {rec.get('error','')[:100]}" if rec["status"] != "MATCH" else ""),
              flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": args.sf_dir, "timeout": args.timeout,
                       "results": report}, fh, indent=1, sort_keys=True)
            fh.write("\n")
    counts = Counter(r["status"] for r in report.values())
    print(f"\nsummary: {dict(counts)}")
    print("ALL OK" if fails == 0 else f"{fails} NON-MATCH")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
