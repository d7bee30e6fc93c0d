"""Seeded differential grammar for DDL + INSERT round-trips — the write-side
counterpart of the read-side fuzz grammars (the reference's comparison
harness also hammers CTAS/INSERT/partition-overwrite shapes:
`tests/comparison/query_generator.py`; golden files
`testdata/workloads/functional-query/queries/QueryTest/insert.test`,
`insert_permutation.test`).

Each seed builds a CTAS target (optionally partitioned), applies 1-3
random write operations — INSERT INTO ... SELECT with a permuted explicit
column list, INSERT ... VALUES with a partial column list (unmentioned
columns NULL), static-partition INSERT, full INSERT OVERWRITE, and
dynamic-partition INSERT OVERWRITE — through the Impala-dialect engine,
while DuckDB applies a semantically-paired script (dynamic partition
overwrite mirrors as DELETE-matching-partitions + INSERT, per
hdfs-table-sink.cc semantics). The final table contents must match as a
normalized multiset.

Determinism rules: integer/string/date columns only (no float writes), and
every source SELECT is a plain projection + filter (no aggregate typing
divergence).
"""

from __future__ import annotations

import random

import pytest

# (table, data cols (partition col excluded), partition col, filter pool)
SOURCES = {
    "nation": (["n_nationkey", "n_name"], "n_regionkey",
               ["n_nationkey % 2 = 0", "n_nationkey > 7",
                "n_name > 'G'", "n_regionkey <> 3"]),
    "customer": (["c_custkey", "c_mktsegment"], "c_nationkey",
                 ["c_custkey % 3 = 1", "c_custkey > 40",
                  "c_mktsegment > 'resource'", "c_nationkey < 20"]),
    "orders": (["o_orderkey", "o_orderstatus", "o_orderdate"], "o_custkey",
               ["o_orderkey % 5 = 2", "o_orderkey % 4 = 0",
                "o_orderdate > DATE '1998-06-01'",
                "o_orderdate < DATE '1996-01-01'"]),
}


def _src_select(tbl: str, cols: list[str], rng: random.Random) -> str:
    _, _, preds = SOURCES[tbl]
    where = f" WHERE {rng.choice(preds)}" if rng.random() < 0.8 else ""
    return f"SELECT {', '.join(cols)} FROM {tbl}{where}"


def _gen(seed: int) -> tuple[list[str], list[str], str]:
    """Returns (impala_script, duckdb_script, signature). The last statement
    slot is implicit: both sides read back SELECT * FROM the target."""
    rng = random.Random(170_000 + seed)
    tbl = rng.choice(sorted(SOURCES))
    data_cols, pcol, _ = SOURCES[tbl]
    partitioned = rng.random() < 0.6
    tgt = f"i2s_ddlf.t{seed}"
    all_cols = data_cols + [pcol]  # partition col LAST on both sides
    sig = []

    imp, duck = [], []
    ctas_sel = _src_select(tbl, all_cols, rng)
    if partitioned:
        imp.append(f"CREATE TABLE {tgt} USING PARQUET "
                   f"PARTITIONED BY ({pcol}) AS {ctas_sel}")
        sig.append("CTAS_PART")
    else:
        imp.append(f"CREATE TABLE {tgt} USING PARQUET AS {ctas_sel}")
        sig.append("CTAS")
    duck.append(f"CREATE TABLE {tgt.split('.')[1]} AS {ctas_sel}")
    dtgt = tgt.split(".")[1]

    ops = ["perm_select", "partial_values"]
    if partitioned:
        ops += ["static_part", "dyn_overwrite"]
    else:
        ops += ["full_overwrite"]
    for _ in range(rng.randint(1, 3)):
        op = rng.choice(ops)
        sig.append(op)
        if op == "perm_select":
            # permuted explicit column list fed by a matching projection
            perm = list(all_cols)
            rng.shuffle(perm)
            sel = _src_select(tbl, perm, rng)
            imp.append(f"INSERT INTO {tgt} ({', '.join(perm)}) {sel}")
            duck.append(f"INSERT INTO {dtgt} ({', '.join(perm)}) {sel}")
        elif op == "partial_values":
            # partial column list: unmentioned columns become NULL
            # (QueryTest/insert_permutation.test semantics)
            keep = [c for c in all_cols if rng.random() < 0.7] or [all_cols[0]]
            rng.shuffle(keep)
            vals = []
            for c in keep:
                if c in ("n_name", "c_mktsegment", "o_orderstatus"):
                    vals.append(f"'fuzz{seed}'")
                elif c == "o_orderdate":
                    vals.append("DATE '1999-12-31'")
                else:
                    vals.append(str(rng.randrange(1000, 2000)))
            stmt = (f"INSERT INTO {{}} ({', '.join(keep)}) "
                    f"VALUES ({', '.join(vals)})")
            imp.append(stmt.format(tgt))
            duck.append(stmt.format(dtgt))
        elif op == "static_part":
            pval = rng.randrange(5)
            sel = _src_select(tbl, data_cols, rng)
            imp.append(f"INSERT INTO {tgt} PARTITION ({pcol}={pval}) {sel}")
            duck.append(
                f"INSERT INTO {dtgt} ({', '.join(data_cols)}, {pcol}) "
                f"SELECT *, {pval} FROM ({sel}) _s")
        elif op == "full_overwrite":
            sel = _src_select(tbl, all_cols, rng)
            imp.append(f"INSERT OVERWRITE TABLE {tgt} {sel}")
            duck.append(f"DELETE FROM {dtgt}")
            duck.append(f"INSERT INTO {dtgt} {sel}")
        elif op == "dyn_overwrite":
            sel = _src_select(tbl, all_cols, rng)
            imp.append(f"INSERT OVERWRITE TABLE {tgt} {sel}")
            duck.append(
                f"DELETE FROM {dtgt} WHERE {pcol} IN "
                f"(SELECT DISTINCT {pcol} FROM ({sel}) _s)")
            duck.append(f"INSERT INTO {dtgt} {sel}")
    return imp, duck, "+".join(sig)


def _norm(rows):
    return sorted(tuple(str(c) for c in r) for r in rows)


@pytest.fixture(scope="module")
def ddl_env(spark, sf_dir, duck):
    from impalatogo_spark.engine import Engine
    from impalatogo_spark.session import register_tables

    register_tables(spark, sf_dir)
    eng = Engine(spark)
    eng.drop_database("i2s_ddlf")
    eng.create_database("i2s_ddlf")
    yield eng, duck
    eng.drop_database("i2s_ddlf")


@pytest.mark.parametrize("seed", range(18))
def test_ddl_insert_roundtrip_parity(seed, ddl_env):
    eng, duck = ddl_env
    imp, dsql, sig = _gen(seed)
    tgt = f"i2s_ddlf.t{seed}"
    dtgt = f"t{seed}"
    duck.execute(f"DROP TABLE IF EXISTS {dtgt}")
    for stmt in imp:
        eng.sql(stmt)
    for stmt in dsql:
        duck.execute(stmt)
    srows = eng.sql(f"SELECT * FROM {tgt}").collect()
    drows = duck.execute(f"SELECT * FROM {dtgt}").fetchall()
    assert len(srows) > 0, f"seed {seed} vacuous ({sig})"
    s_norm, d_norm = _norm(srows), _norm(drows)
    assert s_norm == d_norm, (
        f"seed {seed} diverged ({sig}):\n"
        f"script:\n  " + "\n  ".join(imp) + "\n"
        f"spark {len(s_norm)} rows: {s_norm[:3]}\n"
        f"duck  {len(d_norm)} rows: {d_norm[:3]}"
    )
    duck.execute(f"DROP TABLE {dtgt}")


def test_grammar_covers_all_write_forms():
    """Guard: the seed range keeps exercising every write shape."""
    sig = " ; ".join(_gen(s)[2] for s in range(18))
    for form in ["CTAS_PART", "CTAS", "perm_select", "partial_values",
                 "static_part", "dyn_overwrite", "full_overwrite"]:
        assert form in sig, f"write form never generated: {form}"
