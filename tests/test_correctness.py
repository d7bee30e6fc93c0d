"""Differential correctness: run every registered query on Spark AND its
DuckDB oracle, compare row count + column names + order-insensitive values.
Mirrors the driver's CORRECTNESS gate (see __spark_entry__.py docstring).

Also enforces the executed-shuffle budgets (tests/shuffle_budgets.json):
each headline query's 'shuffle bytes written' must stay within 4x its
committed measurement at this SF — the quantitative scale gate that
catches a per-key blowup (the r02 ER-blocking cliff) numerically, at zero
extra run cost since every query executes here anyway.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
from collections import Counter

import pytest

from impalatogo_spark.queries import all_queries

with open(os.path.join(os.path.dirname(__file__),
                       "shuffle_budgets.json")) as _fh:
    SHUFFLE_BUDGETS = json.load(_fh)


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; this guards residual 1-ulp noise
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from impalatogo_spark.session import release_persisted

    q = QUERIES[name]
    sdf = q.spark_fn(spark, sf_dir)
    srows = sdf.collect()

    budget = SHUFFLE_BUDGETS.get(
        os.path.basename(sf_dir.rstrip("/")), {}).get(name)
    if budget is not None:
        from impalatogo_spark.plans import shuffle_write_bytes

        sw = shuffle_write_bytes(sdf)
        assert sw <= budget, (
            f"{name}: shuffle-write {sw:,} B exceeds its committed budget "
            f"{budget:,} B — a plan regressed toward a shuffle blowup "
            "(re-measure and update tests/shuffle_budgets.json only if the "
            "new plan is deliberate)")

    release_persisted()  # keep the 149-query session's cache flat
    scols = [c.lower() for c in sdf.columns]

    if q.oracle is None:
        assert len(srows) >= 0  # rows-only smoke: it ran and has a schema
        assert len(scols) > 0
        return

    dres = duck.execute(q.oracle)
    dcols = [d[0].lower() for d in dres.description]
    drows = dres.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sm, dm = _norm_rows(scols, [tuple(r) for r in srows]), _norm_rows(dcols, drows)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        pytest.fail(f"{name}: value mismatch.\n spark-only: {only_s}\n duck-only: {only_d}")


def test_no_hugeint_oracle_outputs(duck):
    """No registered oracle may emit a HUGEINT (int128) output column.

    DuckDB's sum(BIGINT) returns HUGEINT, and integer arithmetic on it
    stays HUGEINT. The local duckdb client materializes that as a Python
    int (so drive_contract passes), but the driver's oracle client
    materializes it as Decimal/float, whose normalizer formats '%.6g'
    ('8.62942e+06') while Spark's BIGINT goes through str() ('8629422') —
    every row hashes differently though counts and column names match
    (the r07 tpcds_q79/q98 red). CAST such columns to BIGINT in the
    oracle. Binding the query is enough to get output types; nothing
    executes here."""
    offenders = {}
    for name in sorted(QUERIES):
        q = QUERIES[name]
        if q.oracle is None:
            continue
        rel = duck.sql(q.oracle)
        bad = [c for c, t in zip(rel.columns, rel.types)
               if str(t).upper() in ("HUGEINT", "INT128", "UHUGEINT")]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT output columns (CAST them to BIGINT so "
        f"the driver's client normalizes them as integers): {offenders}")


def test_every_headline_query_has_shuffle_budget():
    """New headline queries must ship with a measured shuffle budget at
    both SFs (run tools-free: measure shuffle_write_bytes at sf0.001 and
    sf0.01, x4, into tests/shuffle_budgets.json)."""
    import bench

    for sf, table in SHUFFLE_BUDGETS.items():
        missing = [n for n in bench.HEADLINE
                   if n in QUERIES and n not in table]
        assert not missing, (
            f"{sf}: headline queries without a committed shuffle budget: "
            f"{missing}")
