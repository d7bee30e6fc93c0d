#!/usr/bin/env python
"""Drive the driver contract exactly as the grading driver does:
load __spark_entry__.py fresh, run entry() smoke, then every queries()[name]
at the given sf_dir compared to oracle_sql()[name] via DuckDB.

Usage: python tools/drive_contract.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math
import os
import sys
import time
from collections import Counter

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTER = sys.argv[2] if len(sys.argv) > 2 else ""

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = m.entry(spark)
print(f"entry(): {len(df.collect())} rows, {len(df.columns)} cols")

con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


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


qs, osql = m.queries(), m.oracle_sql()
assert set(osql) <= set(qs), "oracle keys must be a subset of queries keys"
fails = 0
for name in sorted(qs):
    if FILTER and FILTER not in name:
        continue
    t0 = time.perf_counter()
    try:
        sdf = qs[name](spark, SF_DIR)
        srows = sdf.collect()
        scols = [c.lower() for c in sdf.columns]
        from impalatogo_spark.session import release_persisted

        release_persisted()  # queries cache intermediates; don't accumulate
    except Exception as e:
        print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:140]}")
        fails += 1
        continue
    dt = time.perf_counter() - t0
    if name not in osql:
        print(f"ok    {name}: rows-only, {len(srows)} rows  [{dt:.1f}s]")
        continue
    try:
        d = con.execute(osql[name])
        dcols = [x[0].lower() for x in d.description]
        drows = d.fetchall()
    except Exception as e:
        print(f"FAIL  {name}: oracle error {str(e)[:140]}")
        fails += 1
        continue
    if sorted(scols) != sorted(dcols):
        print(f"FAIL  {name}: cols {sorted(scols)} vs {sorted(dcols)}")
        fails += 1
        continue
    if len(srows) != len(drows):
        print(f"FAIL  {name}: rows {len(srows)} vs {len(drows)}")
        fails += 1
        continue
    i_s = sorted(range(len(scols)), key=lambda i: scols[i])
    i_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sm = Counter(tuple(norm(r[i]) for i in i_s) for r in srows)
    dm = Counter(tuple(norm(r[i]) for i in i_d) for r in drows)
    if sm != dm:
        print(f"FAIL  {name}: values differ; spark-only={list((sm - dm).items())[:2]} duck-only={list((dm - sm).items())[:2]}")
        fails += 1
    else:
        print(f"MATCH {name}: {len(srows)} rows  [{dt:.1f}s]")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
