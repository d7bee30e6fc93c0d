"""Seeded differential grammar for SUBQUERY shapes (SURVEY §4.1 — the
reference rewrites subqueries into joins at analysis time,
StmtRewriter.java; Catalyst does the same rewrite family). The fixed
oracle queries pin one instance of each shape; this grammar randomizes
the combination space: correlated scalar aggregates (WHERE and SELECT
position, including the empty-group count()=0 'count bug' case),
[NOT] EXISTS with correlated conjuncts, and [NOT] IN subqueries —
identical ANSI text run on both engines through the DIALECT path.

Determinism rules: scalar aggregates are min/max/count only (order-exact;
avg/sum over doubles diverges in ulps), literal comparisons hit stored
doubles (bit-identical in both engines), and every generated query
projects integer or string columns."""

from __future__ import annotations

import random

import pytest

_AGGS = ["min", "max", "count"]


def _gen(seed: int) -> str:
    rng = random.Random(70_000 + seed)
    where = [f"c.c_custkey % 7 = {rng.randrange(7)}"]
    shape = rng.choice(["scalar", "exists", "not_exists", "in", "not_in"])
    if shape == "scalar":
        agg = rng.choice(_AGGS)
        col = "o.o_orderkey" if agg == "count" else "o.o_totalprice"
        cmp_lhs = ("CAST(c.c_custkey AS BIGINT)" if agg == "count"
                   else "c.c_acctbal")
        # acctbal (<= ~10k) never exceeds a max/min totalprice, so '>' is
        # vacuous for min/max; count vs custkey supports either direction
        op = rng.choice([">", "<", "<="] if agg == "count" else ["<", "<="])
        where.append(
            f"{cmp_lhs} {op} (SELECT {agg}({col}) FROM orders o "
            f"WHERE o.o_custkey = c.c_custkey)"
        )
    elif shape in ("exists", "not_exists"):
        neg = "NOT " if shape == "not_exists" else ""
        # thresholds chosen so neither branch is vacuous: most customers
        # have an order above 10-60k; few have one above 400k+
        v = (rng.randrange(400_000, 550_000) if shape == "not_exists"
             else rng.randrange(10_000, 60_000))
        where.append(
            f"{neg}EXISTS (SELECT 1 FROM orders o WHERE "
            f"o.o_custkey = c.c_custkey AND o.o_totalprice > {v})"
        )
    else:
        neg = "NOT " if shape == "not_in" else ""
        m = rng.choice([3, 5, 13])
        where.append(
            f"c.c_custkey {neg}IN (SELECT o.o_custkey FROM orders o "
            f"WHERE o.o_orderkey % {m} = {rng.randrange(m)})"
        )
    # SELECT-position correlated scalar count: empty groups MUST read 0,
    # not NULL (the classic count-bug rewrite hazard)
    lo = rng.randrange(50, 150)
    sel = (
        "c.c_custkey, "
        "(SELECT CAST(count(*) AS BIGINT) FROM orders o "
        f"WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % 2 = 0) AS n_even, "
        "(SELECT min(o.o_orderstatus) FROM orders o "
        f"WHERE o.o_custkey = c.c_custkey AND o.o_orderkey > {lo}) AS st"
    )
    return f"SELECT {sel} FROM customer c WHERE {' AND '.join(where)}"


@pytest.mark.parametrize("seed", range(30))
def test_random_subquery_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen(seed)
    srows = Engine(spark).sql(sql).collect()  # dialect path end-to-end
    drows = duck.execute(sql).fetchall()
    assert len(srows) > 0, f"seed {seed} vacuous: {sql}"
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, (
        f"seed {seed} diverged:\n{sql}\n{s_norm[:2]}\n{d_norm[:2]}")
