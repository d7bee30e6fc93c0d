"""Seeded differential grammar for JOIN + AGGREGATE shapes — the repo's
equivalent of the reference's randomized comparison harness
(`tests/comparison/query_generator.py`, which fuzzes multi-table joins with
aggregates against a reference DBMS; SURVEY §5.4).

Each seed builds a random 2-4 table join chain over the TPC-H foreign-key
graph using all NINE Impala join forms (sql-parser.y join_operator: INNER,
LEFT/RIGHT/FULL OUTER, CROSS, LEFT/RIGHT SEMI, LEFT/RIGHT ANTI), layers
GROUP BY / aggregate / HAVING on top, and runs the Impala-dialect text
through Engine.sql while DuckDB runs a semantically-paired ANSI text
(identical except where DuckDB's grammar differs: its semi/anti spelling
is `SEMI JOIN`/`ANTI JOIN`, and the RIGHT semi/anti forms — which the
dialect layer swap-rewrites for Spark — become EXISTS/NOT EXISTS).

Determinism rules (see tests/test_differential*.py): sums only over
integer columns, min/max anywhere (order-exact), count everywhere;
null-generating outer sides feed both grouping columns (NULL groups) and
count(col)-vs-count(*) gaps on purpose.
"""

from __future__ import annotations

import random

import pytest

ALIAS = {"customer": "c", "orders": "o", "nation": "n",
         "region": "r", "supplier": "s"}

# foreign-key edges (condition references both aliases)
EDGES = {
    ("customer", "nation"): "c.c_nationkey = n.n_nationkey",
    ("nation", "region"): "n.n_regionkey = r.r_regionkey",
    ("orders", "customer"): "o.o_custkey = c.c_custkey",
    ("supplier", "nation"): "s.s_nationkey = n.n_nationkey",
}

GROUP_COLS = {
    "customer": ["c.c_mktsegment", "c.c_nationkey"],
    "orders": ["o.o_orderstatus", "o.o_orderpriority"],
    "nation": ["n.n_regionkey", "n.n_name"],
    "region": ["r.r_name"],
    "supplier": ["s.s_nationkey"],
}

# (expression, needs-integer-only) — sum stays on integer keys for
# bit-exact cross-engine totals
AGG_COLS = {
    "customer": [("count(c.c_custkey)", None), ("min(c.c_name)", None),
                 ("sum(CAST(c.c_custkey AS BIGINT))", None),
                 ("max(c.c_acctbal)", None)],
    "orders": [("count(o.o_orderkey)", None), ("min(o.o_orderdate)", None),
               ("sum(CAST(o.o_orderkey AS BIGINT))", None),
               ("max(o.o_totalprice)", None)],
    "nation": [("count(n.n_nationkey)", None), ("min(n.n_name)", None),
               ("sum(CAST(n.n_nationkey AS BIGINT))", None)],
    "region": [("count(r.r_regionkey)", None), ("max(r.r_name)", None)],
    "supplier": [("count(s.s_suppkey)", None), ("min(s.s_acctbal)", None),
                 ("sum(CAST(s.s_suppkey AS BIGINT))", None)],
}


def _extra_pred(t: str, rng: random.Random) -> str:
    """A selective-but-never-emptying predicate on table t's columns."""
    return {
        "customer": f"c.c_acctbal > {rng.randrange(-500, 3000)}",
        "orders": f"o.o_totalprice > {rng.randrange(50_000, 200_000)}",
        "nation": f"n.n_regionkey <> {rng.randrange(5)}",
        "region": f"r.r_regionkey < {rng.randrange(2, 5)}",
        "supplier": f"s.s_suppkey % {rng.choice([2, 3])} = 0",
    }[t]


def _anti_pred(t: str, rng: random.Random) -> str:
    """A RARE-match predicate: an anti join keeps left rows with NO match,
    so the extra conjunct must make matches scarce or most seeds go
    vacuous (every nation has SOME customer above a mild acctbal bar)."""
    return {
        "customer": f"c.c_acctbal > {rng.randrange(9_000, 9_900)}",
        "orders": f"o.o_totalprice > {rng.randrange(400_000, 480_000)}",
        "nation": f"n.n_nationkey % 25 = {rng.randrange(25)}",
        "region": f"r.r_regionkey = {rng.randrange(5)}",
        "supplier": f"s.s_suppkey % 10 = {rng.randrange(10)}",
    }[t]


def _edge(t: str, tables: list) -> tuple[str, str]:
    for u in tables:
        if (t, u) in EDGES:
            return u, EDGES[(t, u)]
        if (u, t) in EDGES:
            return u, EDGES[(u, t)]
    raise AssertionError(f"no edge from {t} into {tables}")


def _gen(seed: int) -> tuple[str, str, str]:
    """Returns (impala_text, duckdb_text, form_signature)."""
    rng = random.Random(90_000 + seed)

    if rng.random() < 0.15:
        # CROSS shape: bounded product of the two fixed-size dims
        pred = (f"n.n_regionkey <> r.r_regionkey "
                f"AND r.r_regionkey < {rng.randrange(2, 5)}")
        grp = rng.choice(GROUP_COLS["region"] + GROUP_COLS["nation"])
        sql = (
            f"SELECT {grp} AS g1, CAST(count(*) AS BIGINT) AS a0, "
            f"sum(CAST(n.n_nationkey AS BIGINT)) AS a1 "
            f"FROM region r CROSS JOIN nation n WHERE {pred} GROUP BY {grp}"
        )
        return sql, sql, "CROSS"

    base = rng.choice(sorted(ALIAS))
    tables = [base]
    chain = f"{base} {ALIAS[base]}"
    forms = []
    for _ in range(rng.randint(1, 3)):
        cands = sorted(
            t for t in ALIAS if t not in tables
            and any((t, u) in EDGES or (u, t) in EDGES for u in tables)
        )
        if not cands:
            break
        t = rng.choice(cands)
        _, cond = _edge(t, tables)
        form = rng.choice(
            ["JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN", "FULL OUTER JOIN"]
        )
        extra = f" AND {_extra_pred(t, rng)}" if rng.random() < 0.5 else ""
        chain += f" {form} {t} {ALIAS[t]} ON {cond}{extra}"
        forms.append(form)
        tables.append(t)

    avail = list(tables)
    imp_from, duck_from = chain, chain
    # optional terminal semi/anti step over a not-yet-used adjacent table
    if rng.random() < 0.45:
        cands = sorted(
            t for t in ALIAS if t not in tables
            and any((t, u) in EDGES or (u, t) in EDGES for u in tables)
        )
        if cands:
            t = rng.choice(cands)
            _, cond = _edge(t, tables)
            # cycle the 4 semi/anti combos by seed so the 40-seed range is
            # guaranteed to exercise each (pure rng.choice left RIGHT SEMI
            # ungenerated across 40 seeds)
            side, kind = [("LEFT", "SEMI"), ("RIGHT", "SEMI"),
                          ("LEFT", "ANTI"), ("RIGHT", "ANTI")][seed % 4]
            # anti needs a RARE-match extra conjunct or most seeds go vacuous
            extra = (f" AND {_anti_pred(t, rng)}" if kind == "ANTI"
                     else f" AND {_extra_pred(t, rng)}"
                     if rng.random() < 0.4 else "")
            if side == "LEFT":
                imp_from = f"{chain} {side} {kind} JOIN {t} {ALIAS[t]} ON {cond}{extra}"
                duck_from = f"{chain} {kind} JOIN {t} {ALIAS[t]} ON {cond}{extra}"
            else:
                # RIGHT SEMI/ANTI returns t's rows; DuckDB spells it EXISTS
                imp_from = f"{chain} {side} {kind} JOIN {t} {ALIAS[t]} ON {cond}{extra}"
                neg = "NOT " if kind == "ANTI" else ""
                duck_from = (
                    f"{t} {ALIAS[t]} WHERE {neg}EXISTS "
                    f"(SELECT 1 FROM {chain} WHERE {cond}{extra})"
                )
                avail = [t]
            forms.append(f"{side} {kind}")

    grp_pool = [g for t in avail for g in GROUP_COLS[t]]
    agg_pool = [a for t in avail for a, _ in AGG_COLS[t]]
    grps = rng.sample(grp_pool, k=min(len(grp_pool), rng.randint(1, 2)))
    aggs = rng.sample(agg_pool, k=min(len(agg_pool), rng.randint(2, 3)))
    sel = ", ".join(
        [f"{g} AS g{i}" for i, g in enumerate(grps)]
        + ["CAST(count(*) AS BIGINT) AS a0"]
        + [f"{a} AS a{i + 1}" for i, a in enumerate(aggs)]
    )
    having = ""
    if rng.random() < 0.3:
        having = f" HAVING count(*) > {rng.choice([0, 1])}"
    tail = f" GROUP BY {', '.join(grps)}{having}"
    imp = f"SELECT {sel} FROM {imp_from}{tail}"
    duck = f"SELECT {sel} FROM {duck_from}{tail}"
    return imp, duck, " | ".join(forms) if forms else "single-table"


def _norm(rows):
    return sorted(tuple(str(c) for c in r) for r in rows)


@pytest.mark.parametrize("seed", range(40))
def test_random_join_agg_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    imp, dsql, _forms = _gen(seed)
    srows = Engine(spark).sql(imp).collect()  # full dialect path
    drows = duck.execute(dsql).fetchall()
    assert len(srows) > 0, f"seed {seed} vacuous:\n{imp}"
    s_norm, d_norm = _norm(srows), _norm(drows)
    assert s_norm == d_norm, (
        f"seed {seed} diverged:\nimpala: {imp}\nduckdb: {dsql}\n"
        f"spark:  {s_norm[:3]}\nduck:   {d_norm[:3]}"
    )


def test_grammar_covers_all_nine_join_forms():
    """The seed range must keep exercising every join form the reference
    parser accepts — guards against the grammar silently degenerating."""
    sig = " ; ".join(_gen(s)[2] for s in range(40))
    for form in ["JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
                 "FULL OUTER JOIN", "CROSS", "LEFT SEMI", "RIGHT SEMI",
                 "LEFT ANTI", "RIGHT ANTI"]:
        assert form in sig, f"form never generated in seed range: {form}"


def _gen_nested(seed: int) -> str:
    """Nesting axis (the reference generator joins derived tables): one
    side of the join is an aggregated subquery in FROM — group-key join,
    aggregate-on-aggregate, HAVING inside the derived table."""
    rng = random.Random(95_000 + seed)
    inner_grp, inner_key = rng.choice([
        ("o.o_custkey", "o_custkey"),
        ("o.o_orderstatus", "o_orderstatus"),
    ])
    inner_having = (f" HAVING count(*) > {rng.choice([1, 2])}"
                    if rng.random() < 0.5 else "")
    inner = (
        f"SELECT {inner_grp} AS k, CAST(count(*) AS BIGINT) AS n_ord, "
        f"CAST(sum(CAST(o.o_orderkey AS BIGINT)) AS BIGINT) AS sum_ok, "
        f"max(o.o_totalprice) AS max_tp "
        f"FROM orders o WHERE o.o_totalprice > {rng.randrange(20_000, 120_000)} "
        f"GROUP BY {inner_grp}{inner_having}"
    )
    if inner_key == "o_custkey":
        form = rng.choice(["JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
                           "FULL OUTER JOIN"])
        outer_grp = rng.choice(["c.c_mktsegment", "c.c_nationkey"])
        sel = (
            f"{outer_grp} AS g0, CAST(count(*) AS BIGINT) AS a0, "
            "CAST(count(t.n_ord) AS BIGINT) AS a1, "
            "CAST(sum(t.n_ord) AS BIGINT) AS a2, "
            "min(t.max_tp) AS a3"
        )
        return (f"SELECT {sel} FROM customer c {form} ({inner}) t "
                f"ON c.c_custkey = t.k GROUP BY {outer_grp}")
    # status-keyed derived table: join two independent aggregates on the
    # 3-value status key (aggregate-joined-to-aggregate)
    inner2 = (
        "SELECT l.l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n_li "
        f"FROM lineitem l WHERE l.l_quantity > {rng.randrange(10, 40)} "
        "GROUP BY l.l_returnflag"
    )
    return (
        "SELECT t.k AS g0, t.n_ord AS a0, t.sum_ok AS a1, "
        "CAST(u.n_li AS BIGINT) AS a2 "
        f"FROM ({inner}) t LEFT OUTER JOIN ({inner2}) u ON t.k = u.rf"
    )


@pytest.mark.parametrize("seed", range(15))
def test_nested_derived_table_join_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_nested(seed)
    srows = Engine(spark).sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    assert len(srows) > 0, f"seed {seed} vacuous:\n{sql}"
    assert _norm(srows) == _norm(drows), (
        f"seed {seed} diverged:\n{sql}\n{_norm(srows)[:3]}\n{_norm(drows)[:3]}")
