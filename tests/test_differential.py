"""Randomized differential testing — the engine's equivalent of the
reference's random-query comparison harness (tests/comparison/
query_generator.py + discrepancy_searcher.py, which diffed Impala vs
Postgres): seeded random scalar-expression trees rendered in the SQL subset
common to Spark and DuckDB, evaluated over the same parquet table, results
compared cell-by-cell.

The grammar deliberately avoids known divergence points (division — NULL vs
inf on zero; round-half at boundaries; regex dialects) — those are pinned by
the targeted batteries in queries/relational.py instead.
"""

from __future__ import annotations

import random

import pytest

_INT_COLS = ["n_nationkey", "n_regionkey"]
_STR_COLS = ["n_name"]


def _int_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(_INT_COLS + [str(rng.randint(0, 9))])
    kind = rng.randrange(6)
    if kind == 0:
        return f"({_int_expr(rng, depth - 1)} + {_int_expr(rng, depth - 1)})"
    if kind == 1:
        return f"({_int_expr(rng, depth - 1)} - {_int_expr(rng, depth - 1)})"
    if kind == 2:
        return f"({_int_expr(rng, depth - 1)} * {rng.randint(0, 5)})"
    if kind == 3:
        return (
            f"(CASE WHEN {_bool_expr(rng, depth - 1)} "
            f"THEN {_int_expr(rng, depth - 1)} ELSE {_int_expr(rng, depth - 1)} END)"
        )
    if kind == 4:
        return f"abs({_int_expr(rng, depth - 1)})"
    return f"length({_str_expr(rng, depth - 1)})"


def _bool_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return f"({_int_expr(rng, 0)} < {_int_expr(rng, 0)})"
    kind = rng.randrange(5)
    if kind == 0:
        return f"({_int_expr(rng, depth - 1)} <= {_int_expr(rng, depth - 1)})"
    if kind == 1:
        return f"({_int_expr(rng, depth - 1)} = {_int_expr(rng, depth - 1)})"
    if kind == 2:
        return f"({_bool_expr(rng, depth - 1)} AND {_bool_expr(rng, depth - 1)})"
    if kind == 3:
        return f"({_bool_expr(rng, depth - 1)} OR {_bool_expr(rng, depth - 1)})"
    return f"(NOT {_bool_expr(rng, depth - 1)})"


def _str_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(_STR_COLS + ["'xy'"])
    kind = rng.randrange(4)
    if kind == 0:
        return f"upper({_str_expr(rng, depth - 1)})"
    if kind == 1:
        return f"lower({_str_expr(rng, depth - 1)})"
    if kind == 2:
        return f"substr({_str_expr(rng, depth - 1)}, {rng.randint(1, 3)}, {rng.randint(1, 4)})"
    return f"({_str_expr(rng, depth - 1)} || {_str_expr(rng, depth - 1)})"


def _gen_select(seed: int) -> str:
    rng = random.Random(seed)
    exprs = []
    for i in range(4):
        g = rng.choice([_int_expr, _bool_expr, _str_expr])
        exprs.append(f"{g(rng, rng.randint(1, 3))} AS e{i}")
    return (
        "SELECT n_nationkey, "
        + ", ".join(exprs)
        + f" FROM nation WHERE {_bool_expr(rng, 2)}"
    )


@pytest.mark.parametrize("seed", range(40))
def test_random_expression_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_select(seed)
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}\n{s_norm[:3]}\n{d_norm[:3]}"


def _gen_agg_select(seed: int) -> str:
    """Random GROUP BY query: aggregates of random int expressions grouped by
    a random key expression."""
    rng = random.Random(10_000 + seed)
    key = rng.choice(["n_regionkey", "(n_nationkey % 4)", "length(n_name)"])
    aggs = []
    for i in range(3):
        inner = _int_expr(rng, rng.randint(1, 2))
        fn = rng.choice(["sum", "min", "max", "count"])
        aggs.append(f"{fn}({inner}) AS a{i}")
    return (
        f"SELECT {key} AS k, {', '.join(aggs)}, count(*) AS n "
        f"FROM nation GROUP BY {key}"
    )


@pytest.mark.parametrize("seed", range(20))
def test_random_aggregate_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_agg_select(seed)
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"


def _gen_window_select(seed: int) -> str:
    """Random window-function query; ORDER BY carries n_nationkey as a total
    tie-break so ranks are deterministic in both engines."""
    rng = random.Random(20_000 + seed)
    part = rng.choice(["n_regionkey", "(n_nationkey % 3)"])
    order = _int_expr(rng, rng.randint(0, 2))
    wfn = rng.choice(
        [
            "row_number()",
            "rank()",
            "dense_rank()",
            f"sum({_int_expr(rng, 1)})",
            f"min({_int_expr(rng, 1)})",
            f"lag({_int_expr(rng, 1)}, 1, -1)",
        ]
    )
    frame = ""
    if wfn.startswith(("sum", "min")) and rng.random() < 0.5:
        frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return (
        f"SELECT n_nationkey, {wfn} OVER (PARTITION BY {part} "
        f"ORDER BY {order}, n_nationkey{frame}) AS w FROM nation"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_window_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_window_select(seed)
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"


def _gen_join_shapes_select(seed: int) -> str:
    """Random join query over nation x region (+ customer for volume):
    inner/left/right/full equi joins with optional extra theta conjunct,
    cross join + filter, and EXISTS/NOT EXISTS (the portable spelling of
    semi/anti — identical syntax in Spark and DuckDB)."""
    rng = random.Random(30_000 + seed)
    kind = rng.randrange(7)
    proj_n = "n_nationkey, n_name"
    if kind == 0:  # inner equi, maybe extra theta conjunct
        extra = " AND n_nationkey > r_regionkey" if rng.random() < 0.5 else ""
        return (
            f"SELECT {proj_n}, r_name FROM nation JOIN region "
            f"ON n_regionkey = r_regionkey{extra}"
        )
    if kind == 1:  # left outer with nullable right side
        return (
            f"SELECT {proj_n}, coalesce(r_name, '-') AS rn FROM nation "
            f"LEFT JOIN region ON n_regionkey = r_regionkey "
            f"AND r_regionkey < {rng.randint(0, 4)}"
        )
    if kind == 2:  # right outer
        return (
            f"SELECT r_regionkey, r_name, coalesce(n_name, '-') AS nn "
            f"FROM nation RIGHT JOIN region ON n_regionkey = r_regionkey "
            f"AND n_nationkey < {rng.randint(0, 20)}"
        )
    if kind == 3:  # full outer
        return (
            f"SELECT coalesce(n_name, '-') AS nn, coalesce(r_name, '-') AS rn "
            f"FROM nation FULL JOIN region "
            f"ON n_regionkey = r_regionkey AND n_nationkey % {rng.randint(2, 4)} = 0"
        )
    if kind == 4:  # cross + theta filter
        return (
            f"SELECT {proj_n}, r_regionkey FROM nation CROSS JOIN region "
            f"WHERE n_nationkey % {rng.randint(2, 5)} = r_regionkey"
        )
    if kind == 5:  # EXISTS (left semi)
        return (
            f"SELECT {proj_n} FROM nation WHERE EXISTS "
            f"(SELECT 1 FROM region WHERE r_regionkey = n_regionkey "
            f"AND r_regionkey >= {rng.randint(0, 3)})"
        )
    # NOT EXISTS (left anti)
    return (
        f"SELECT {proj_n} FROM nation WHERE NOT EXISTS "
        f"(SELECT 1 FROM region WHERE r_regionkey = n_regionkey "
        f"AND r_regionkey > {rng.randint(0, 3)})"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_join_shapes_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_join_shapes_select(seed)
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"


def _gen_multijoin_agg_select(seed: int) -> str:
    """Random 3-way join + aggregate: customer x nation x region with a
    random filter and a grouped aggregate — the star-join shape the
    planner sees most, diffed value-for-value."""
    rng = random.Random(40_000 + seed)
    agg = rng.choice(["count(*)", "count(c_custkey)", "min(c_custkey)", "max(c_custkey)"])
    pred = rng.choice(
        [
            f"c_acctbal > {rng.randint(-500, 5000)}",
            f"n_nationkey % {rng.randint(2, 4)} = 0",
            f"c_mktsegment <> 'BUILDING'",
        ]
    )
    key = rng.choice(["r_name", "n_name"])
    return (
        f"SELECT {key} AS k, {agg} AS a FROM customer "
        f"JOIN nation ON c_nationkey = n_nationkey "
        f"JOIN region ON n_regionkey = r_regionkey "
        f"WHERE {pred} GROUP BY {key}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_random_multijoin_agg_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_multijoin_agg_select(seed)
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"


# -- randomized join grammar (joins.test / outer-joins.test / semi-joins.test
# shapes, generated): every outer-join flavor with random ON-clause extras
# (the predicate-placement cases — ON vs WHERE — that trip join planners),
# plus IN/NOT IN/EXISTS/NOT EXISTS subquery forms. nation x region keeps the
# result space small enough to diff cell-by-cell.

def _gen_join_select(seed: int) -> str:
    rng = random.Random(30_000 + seed)
    jt = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
    on = "n.n_regionkey = r.r_regionkey"
    if rng.random() < 0.6:
        op = rng.choice(["<", "<=", ">", "<>"])
        on += f" AND (n.n_nationkey {op} {rng.randint(0, 24)})"
    if rng.random() < 0.3:
        on += f" AND (r.r_regionkey {rng.choice(['<', '>='])} {rng.randint(0, 4)})"
    sql = (
        "SELECT n.n_nationkey, n.n_name, r.r_regionkey, r.r_name, "
        "coalesce(length(r.r_name), -1) AS lr "
        f"FROM nation n {jt} region r ON {on}"
    )
    if rng.random() < 0.4:
        # WHERE after an outer join filters post-join (NULL-extended rows
        # included) — coalesce keeps the predicate non-NULL in both engines
        sql += (
            f" WHERE coalesce(n.n_nationkey, -1) "
            f"{rng.choice(['<', '>='])} {rng.randint(0, 24)}"
        )
    return sql


@pytest.mark.parametrize("seed", range(20))
def test_random_join_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_join_select(seed)
    s_norm = sorted(
        tuple(str(c) for c in r) for r in spark.sql(sql).collect()
    )
    d_norm = sorted(tuple(str(c) for c in r) for r in duck.execute(sql).fetchall())
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"


def _gen_semi_select(seed: int) -> str:
    rng = random.Random(40_000 + seed)
    form = rng.choice(["IN", "NOT IN", "EXISTS", "NOT EXISTS"])
    sub_pred = f"r_regionkey {rng.choice(['<', '<=', '>'])} {rng.randint(0, 4)}"
    if form in ("IN", "NOT IN"):
        return (
            "SELECT n_nationkey, n_name FROM nation "
            f"WHERE n_regionkey {form} "
            f"(SELECT r_regionkey FROM region WHERE {sub_pred})"
        )
    return (
        "SELECT n_nationkey, n_name FROM nation "
        f"WHERE {form} (SELECT 1 FROM region "
        f"WHERE r_regionkey = n_regionkey AND {sub_pred})"
    )


@pytest.mark.parametrize("seed", range(16))
def test_random_semi_anti_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_semi_select(seed)
    s_norm = sorted(
        tuple(str(c) for c in r) for r in spark.sql(sql).collect()
    )
    d_norm = sorted(tuple(str(c) for c in r) for r in duck.execute(sql).fetchall())
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"


def _gen_grouping_select(seed: int) -> str:
    """Random multi-level grouping query: ROLLUP/CUBE/GROUPING SETS over
    random key pairs with integer aggregates + grouping() disambiguation —
    the round-2 Expand surface under the same seeded-differential harness
    as plain GROUP BY."""
    rng = random.Random(40_000 + seed)
    keys = rng.sample(
        ["n_regionkey", "(n_nationkey % 3)", "length(n_name)",
         "substr(n_name, 1, 1)"],
        2,
    )
    k1, k2 = keys
    shape = rng.choice(
        [f"ROLLUP ({k1}, {k2})", f"CUBE ({k1}, {k2})",
         f"GROUPING SETS (({k1}, {k2}), ({k1}), ())"]
    )
    inner = _int_expr(rng, rng.randint(1, 2))
    fn = rng.choice(["sum", "min", "max", "count"])
    # grouping_id() (multi-arg in BOTH engines; Spark's grouping() is
    # single-arg) disambiguates subtotal NULLs from genuine NULL keys;
    # CAST both sides' aggregate to BIGINT (DuckDB sums to HUGEINT)
    return (
        f"SELECT {k1} AS k1, {k2} AS k2, "
        f"CAST(grouping_id({k1}, {k2}) AS BIGINT) AS gid, "
        f"CAST({fn}({inner}) AS BIGINT) AS a0, count(*) AS n "
        f"FROM nation GROUP BY {shape}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_grouping_parity(seed, spark, duck, sf_dir):
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    sql = _gen_grouping_select(seed)
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    s_norm = sorted(tuple(str(c) for c in r) for r in srows)
    d_norm = sorted(tuple(str(c) for c in r) for r in drows)
    assert s_norm == d_norm, f"seed {seed} diverged:\n{sql}"
