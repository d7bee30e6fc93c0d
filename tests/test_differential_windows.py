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
