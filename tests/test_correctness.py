"""Differential correctness: run every registered query on Spark AND its
DuckDB oracle, compare row count + column names + order-insensitive values.
Mirrors the driver's CORRECTNESS gate (see __spark_entry__.py docstring).
"""

from __future__ import annotations

import datetime
import decimal
import math
from collections import Counter

import pytest

from impalatogo_spark.queries import all_queries


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
