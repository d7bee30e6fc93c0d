"""Seeded differential grammar for the TIMESTAMP-arithmetic family through
the DIALECT path (engine.sql): Impala-dialect expressions (unit_add/sub,
add_months/date_add aliases, trunc codes, two-arg extract) vs hand-mirrored
DuckDB equivalents. This is the area with the most engine-to-engine
divergence surface (boundary clamps, unit naming, trunc semantics), so the
fixed pins in test_dialect.py get a randomized companion here.

Every template pair renders the SAME semantic expression:
  impala(col, k) -> goes through impalatogo_spark.engine.Engine.sql
  duck(col, k)   -> runs verbatim on DuckDB
Dates are projected as ISO strings on both sides (contract date rule)."""

from __future__ import annotations

import random

import pytest

# (impala_template, duckdb_template) — {c}=column, {k}=amount 1..11
_PAIRS = [
    ("years_add({c}, {k})", "{c} + INTERVAL ({k}) YEAR"),
    ("years_sub({c}, {k})", "{c} - INTERVAL ({k}) YEAR"),
    ("months_add({c}, {k})", "{c} + INTERVAL ({k}) MONTH"),
    ("months_sub({c}, {k})", "{c} - INTERVAL ({k}) MONTH"),
    ("add_months({c}, {k})", "{c} + INTERVAL ({k}) MONTH"),
    ("weeks_add({c}, {k})", "{c} + INTERVAL ({k} * 7) DAY"),
    ("weeks_sub({c}, {k})", "{c} - INTERVAL ({k} * 7) DAY"),
    ("days_add({c}, {k})", "{c} + INTERVAL ({k}) DAY"),
    ("days_sub({c}, {k})", "{c} - INTERVAL ({k}) DAY"),
    ("date_add({c}, {k})", "{c} + INTERVAL ({k}) DAY"),
    ("date_sub({c}, {k})", "{c} - INTERVAL ({k}) DAY"),
    ("adddate({c}, {k})", "{c} + INTERVAL ({k}) DAY"),
    ("subdate({c}, {k})", "{c} - INTERVAL ({k}) DAY"),
    ("hours_add({c}, {k})", "{c} + INTERVAL ({k}) HOUR"),
    ("minutes_sub({c}, {k})", "{c} - INTERVAL ({k}) MINUTE"),
    ("seconds_add({c}, {k})", "{c} + INTERVAL ({k}) SECOND"),
    ("trunc({c}, 'YYYY')", "date_trunc('year', {c})"),
    ("trunc({c}, 'Q')", "date_trunc('quarter', {c})"),
    ("trunc({c}, 'MM')", "date_trunc('month', {c})"),
    ("trunc({c}, 'DD')", "date_trunc('day', {c})"),
    ("trunc({c}, 'HH')", "date_trunc('hour', {c})"),
    ("trunc({c}, 'MI')", "date_trunc('minute', {c})"),
]

# integer-returning extract units (identical names both dialects)
_EXTRACT_UNITS = ["year", "month", "day", "hour", "minute"]


def _gen(seed: int) -> tuple[str, str]:
    rng = random.Random(90_000 + seed)
    imp_exprs, duck_exprs = [], []
    for i in range(3):
        imp_t, duck_t = rng.choice(_PAIRS)
        k = rng.randrange(1, 12)
        c = "CAST(o_orderdate AS TIMESTAMP)"
        imp_e = imp_t.format(c=c, k=k)
        duck_e = duck_t.format(c=c, k=k)
        # project as ISO strings (the contract's date rule)
        imp_exprs.append(
            f"CAST(date_format({imp_e}, 'yyyy-MM-dd HH:mm:ss') AS STRING) AS e{i}")
        duck_exprs.append(f"strftime({duck_e}, '%Y-%m-%d %H:%M:%S') AS e{i}")
    u = rng.choice(_EXTRACT_UNITS)
    imp_exprs.append(
        f"CAST(extract(CAST(o_orderdate AS TIMESTAMP), '{u}') AS BIGINT) AS ex")
    duck_exprs.append(
        f"CAST(extract({u} FROM CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ex")
    where = "o_orderkey % 97 = 1"
    imp = f"SELECT o_orderkey, {', '.join(imp_exprs)} FROM orders WHERE {where}"
    duck = f"SELECT o_orderkey, {', '.join(duck_exprs)} FROM orders WHERE {where}"
    return imp, duck


@pytest.mark.parametrize("seed", range(15))
def test_random_date_arith_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    imp_sql, duck_sql = _gen(seed)
    srows = Engine(spark).sql(imp_sql).collect()  # dialect path end-to-end
    drows = duck.execute(duck_sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, (
        f"seed {seed} diverged:\n{imp_sql}\n{duck_sql}\n{s_norm[:2]}\n{d_norm[:2]}")
