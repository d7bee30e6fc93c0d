"""Seeded differential grammar for the WINDOW-function family through the
DIALECT path (engine.sql): random (function x partition x order x frame)
combinations vs DuckDB on identical specs. Windows are the operator family
where subtle engine divergence hides (default frames, peer rows, frame
clamping at partition edges, lag/lead default typing), so the fixed pins in
test_correctness get a randomized companion here.

Determinism rules baked into the grammar itself:
  * every ORDER BY ends in the unique key (o_orderkey) — no peer rows, so
    RANGE-default vs ROWS-default frame semantics can't diverge;
  * all aggregated values are integer cents (money-sum rule);
  * averages are rounded at 4dp on both sides.
"""

from __future__ import annotations

import random

import pytest

_PARTS = ["o_custkey % 13", "o_orderstatus", "o_orderpriority"]

# ranking functions: no explicit frame
_RANKED = ["row_number()", "rank()", "dense_rank()", "ntile({n})"]

# frame-capable aggregates over integer cents
_AGGS = ["sum(cents)", "min(cents)", "max(cents)", "count(cents)"]

_FRAME_STARTS = ["UNBOUNDED PRECEDING", "{k} PRECEDING", "CURRENT ROW"]
_FRAME_ENDS = ["CURRENT ROW", "{k} FOLLOWING", "UNBOUNDED FOLLOWING"]


def _gen(seed: int) -> str:
    """One SQL text valid in BOTH dialects (windows are ANSI in each)."""
    rng = random.Random(77_000 + seed)
    p = rng.choice(_PARTS)
    over_rank = f"OVER (PARTITION BY {p} ORDER BY o_orderdate, o_orderkey)"
    exprs = []
    # two ranking-family picks
    for i in range(2):
        fn = rng.choice(_RANKED).format(n=rng.randrange(2, 8))
        exprs.append(f"CAST({fn} {over_rank} AS BIGINT) AS r{i}")
    # two framed aggregates
    for i in range(2):
        fn = rng.choice(_AGGS)
        fs = rng.choice(_FRAME_STARTS).format(k=rng.randrange(1, 6))
        fe = rng.choice(_FRAME_ENDS).format(k=rng.randrange(1, 6))
        if fs == "CURRENT ROW" and fe == "CURRENT ROW":
            fe = "UNBOUNDED FOLLOWING"
        frame = f"ROWS BETWEEN {fs} AND {fe}"
        exprs.append(
            f"CAST({fn} OVER (PARTITION BY {p} "
            f"ORDER BY o_orderdate, o_orderkey {frame}) AS BIGINT) AS a{i}"
        )
    # one lag/lead with explicit default (typed BIGINT on both sides)
    k = rng.randrange(1, 4)
    fn = rng.choice(["lag", "lead"])
    exprs.append(
        f"CAST({fn}(cents, {k}, CAST(-1 AS BIGINT)) {over_rank} AS BIGINT) AS l0"
    )
    # one windowed average, rounded (sum/count of ints -> one exact division)
    exprs.append(
        f"round(avg(cents) OVER (PARTITION BY {p} ORDER BY o_orderdate, "
        f"o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS m0"
    )
    return (
        "WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, "
        "o_orderpriority, o_orderdate, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
        "FROM orders WHERE o_orderkey % 17 = 3) "
        f"SELECT o_orderkey, {', '.join(exprs)} FROM t"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_window_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen(seed)
    srows = Engine(spark).sql(sql).collect()  # dialect path end-to-end
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert len(s_norm) > 0, f"seed {seed}: vacuous (0 rows)"
    assert s_norm == d_norm, (
        f"seed {seed} diverged:\n{sql}\n{s_norm[:2]}\n{d_norm[:2]}")


# ---------------------------------------------------------------------------
# Windows over OUTER-JOINED inputs: the null-interaction axis. Partition and
# order keys come from the null-generating side of a left/full outer join, so
# NULL partitions (one group per engine? all in one?) and NULL order keys
# (NULLS FIRST/LAST defaults) are exercised where engines genuinely differ.
# Determinism: every ORDER BY ends in the left side's unique key, and NULL
# order positioning is forced explicitly (NULLS LAST) because the engine
# defaults differ (Spark NULLS FIRST asc; DuckDB NULLS LAST) — the explicit
# spelling is identical SQL in both.
# ---------------------------------------------------------------------------

_J_FORMS = ["LEFT OUTER JOIN", "FULL OUTER JOIN"]


def _gen_joined(seed: int) -> str:
    rng = random.Random(78_500 + seed)
    form = rng.choice(_J_FORMS)
    thresh = rng.randrange(100_000, 350_000)
    part = rng.choice(["o.o_orderstatus", "c.c_mktsegment", "c.c_nationkey"])
    val = rng.choice([
        "CAST(coalesce(round(o.o_totalprice * 100), 0) AS BIGINT)",
        "CAST(coalesce(o.o_orderkey, -1) AS BIGINT)",
    ])
    k = rng.randrange(1, 4)
    frame = rng.choice([
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN CURRENT ROW AND {k} FOLLOWING",
    ])
    order = ("o.o_orderdate ASC NULLS LAST, o.o_orderkey ASC NULLS LAST, "
             "c.c_custkey ASC")
    return f"""
SELECT c.c_custkey AS g0, {part} AS g1,
       CAST(row_number() OVER (PARTITION BY {part} ORDER BY {order})
            AS BIGINT) AS a0,
       CAST(sum({val}) OVER (PARTITION BY {part} ORDER BY {order} {frame})
            AS BIGINT) AS a1,
       CAST(count(o.o_orderkey) OVER (PARTITION BY {part}) AS BIGINT) AS a2
FROM customer c {form} orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > {thresh}
"""


@pytest.mark.parametrize("seed", range(12))
def test_windows_over_outer_join_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_joined(seed)
    srows = Engine(spark).sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    assert len(srows) > 0, f"seed {seed} vacuous:\n{sql}"
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, (
        f"seed {seed} diverged:\n{sql}\n{s_norm[:3]}\n{d_norm[:3]}")
