"""Engine-semantics pins from the reference's functional-query suite:
overflow wrap-around (QueryTest/overflow.test), extreme typed values,
NULL-vs-empty-string text scanning (QueryTest/null_data.test), and typed
partition columns (QueryTest/partition-col-types.test). These are pytest
pins rather than oracle queries because DuckDB diverges on each (errors on
integer overflow, different CSV null conventions).
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def test_overflow_wraps_twos_complement(spark):
    """Impala arithmetic wraps silently (C++ semantics; the overflow.test
    table pins the type extremes). Spark with ansi=false wraps identically
    (Java two's complement) — the session default this engine sets."""
    row = spark.sql("""
        SELECT CAST(9223372036854775807 AS BIGINT) + CAST(1 AS BIGINT) AS big_add,
               CAST(127 AS TINYINT) + CAST(1 AS TINYINT)               AS tiny_add,
               CAST(-128 AS TINYINT) - CAST(1 AS TINYINT)              AS tiny_sub,
               CAST(2147483647 AS INT) * CAST(2 AS INT)                AS int_mul
    """).first()
    assert row.big_add == -9223372036854775808
    assert row.tiny_add == -128
    assert row.tiny_sub == 127
    assert row.int_mul == -2
    agg = spark.sql("""
        SELECT sum(x) AS s FROM (
            SELECT CAST(9223372036854775807 AS BIGINT) AS x
            UNION ALL SELECT CAST(1 AS BIGINT))
    """).first()
    assert agg.s == -9223372036854775808


def test_extreme_values_parquet_roundtrip(spark, tmp_path):
    """overflow.test scans a table holding every type's extremes including
    +/-Infinity — those values must survive a parquet write/scan cycle."""
    df = spark.sql("""
        SELECT CAST(-128 AS TINYINT) AS t, CAST(-32768 AS SMALLINT) AS s,
               CAST(-2147483648 AS INT) AS i,
               CAST(-9223372036854775807 - 1 AS BIGINT) AS b,
               CAST('-inf' AS FLOAT) AS f, CAST('-inf' AS DOUBLE) AS d
        UNION ALL
        SELECT CAST(127 AS TINYINT), CAST(32767 AS SMALLINT),
               CAST(2147483647 AS INT), CAST(9223372036854775807 AS BIGINT),
               CAST('inf' AS FLOAT), CAST('nan' AS DOUBLE)
    """)
    path = os.path.join(str(tmp_path), "extremes")
    df.write.parquet(path)
    rows = sorted(spark.read.parquet(path).collect(), key=lambda r: r.t)
    lo, hi = rows
    assert (lo.t, lo.s, lo.i, lo.b) == (-128, -32768, -2147483648, -(2**63))
    assert lo.f == float("-inf") and lo.d == float("-inf")
    assert (hi.t, hi.s, hi.i, hi.b) == (127, 32767, 2147483647, 2**63 - 1)
    assert hi.f == float("inf") and math.isnan(hi.d)


def test_text_scan_null_vs_empty(spark, tmp_path):
    """null_data.test row: a='a', b='' (empty), c=\\N (NULL), d/e empty
    numerics (NULL), f='a b', g=' '. With nullValue='\\N' + emptyValue='' and
    QUOTED empty fields, Spark reproduces Impala exactly. Divergence pin:
    Impala's text scanner keeps an UNQUOTED empty string field as '' for
    STRING columns; Spark's CSV parser reads it as NULL — documented, and
    the quoted form is the supported spelling."""
    d = str(tmp_path)
    with open(os.path.join(d, "null_data.csv"), "w") as f:
        f.write('a,"",\\N,,,a b, \n')
    df = spark.read.options(nullValue="\\N", emptyValue="").schema(
        "a string, b string, c string, d int, e double, f string, g string"
    ).csv(d)
    row = df.first()
    assert (row.a, row.b, row.c, row.d, row.e, row.f, row.g) == (
        "a", "", None, None, None, "a b", " "
    )
    counts = df.agg(*[F.count(c).alias(c) for c in df.columns]).first()
    assert tuple(counts) == (1, 1, 0, 0, 0, 1, 1)  # null_data.test count row
    lens = df.select(F.length("f").alias("lf"), F.length("g").alias("lg")).first()
    assert (lens.lf, lens.lg) == (3, 1)
    # unquoted-empty divergence (documented): Spark yields NULL, not ''
    with open(os.path.join(d, "unquoted.csv"), "w") as f:
        f.write("a,,x\n")
    u = spark.read.options(nullValue="\\N", emptyValue="").schema(
        "a string, b string, c string"
    ).csv(os.path.join(d, "unquoted.csv")).first()
    assert u.b is None


def test_partition_col_types_roundtrip_and_pruning(spark, tmp_path):
    """partition-col-types.test: non-string partition columns (int, date)
    keep their type and value through a partitioned write/scan, and an
    equality filter prunes to one partition directory."""
    src = spark.createDataFrame(
        [(1, 10, datetime.date(2024, 1, 1), "x"),
         (2, 10, datetime.date(2024, 2, 1), "y"),
         (3, 20, datetime.date(2024, 1, 1), "z")],
        "id long, pk int, pd date, payload string",
    )
    path = os.path.join(str(tmp_path), "ptab")
    src.write.partitionBy("pk", "pd").parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["pk"] == "int"
    assert dict(back.dtypes)["pd"] == "date"
    got = {(r.id, r.pk, r.pd) for r in back.collect()}
    assert got == {(1, 10, datetime.date(2024, 1, 1)),
                   (2, 10, datetime.date(2024, 2, 1)),
                   (3, 20, datetime.date(2024, 1, 1))}
    pruned = back.filter((F.col("pk") == 10) & (F.col("pd") == "2024-02-01"))
    assert [r.id for r in pruned.collect()] == [2]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters reach the scan (pruning, not post-filter)
    assert "PartitionFilters" in plan and "pk" in plan.split("PartitionFilters")[1][:200]


def test_wide_row_10mb_string(spark, tmp_path):
    """QueryTest/wide-row.test: a single 10 MB string value survives a
    parquet write/scan and length() sees every byte."""
    df = spark.sql("SELECT repeat('x', 10485760) AS string_col")
    path = os.path.join(str(tmp_path), "widerow")
    df.write.parquet(path)
    got = spark.read.parquet(path).select(F.length("string_col").alias("n")).first()
    assert got.n == 10485760


def test_wide_table_1000_columns(spark):
    """1000-column projection: above spark.sql.codegen.maxFields whole-stage
    codegen falls back to volcano iteration — the query must still answer
    correctly (the reference's widetable_1000_cols scan equivalent)."""
    cols = ", ".join(f"{i} AS c{i}" for i in range(1000))
    df = spark.sql(f"SELECT {cols}")
    row = df.select("c0", "c499", "c999").first()
    assert (row.c0, row.c499, row.c999) == (0, 499, 999)
    # summing 1000 columns as `c0 + c1 + ...` builds a 999-deep Add tree and
    # StackOverflows the analyzer — the repo-wide giant-expression-tree
    # gotcha. The scalable spelling is one wide array + aggregate (depth 2).
    total = df.select(
        F.aggregate(
            F.array(*[F.col(f"c{i}") for i in range(1000)]),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("s")
    ).first()
    assert total.s == 499500


def test_ragged_columns_text_scan(spark, tmp_path):
    """QueryTest/misc.test tblwithraggedcolumns: rows with MORE fields than
    the schema drop the extras; rows with FEWER null-fill the tail — the
    reference's text-scanner recovery behavior, reproduced by Spark CSV
    PERMISSIVE mode."""
    d = str(tmp_path)
    with open(os.path.join(d, "ragged.csv"), "w") as f:
        f.write("a,3\nhello,1\nfoo,2,EXTRA,MORE\nb\nc,\n")
    df = spark.read.options(mode="PERMISSIVE").schema(
        "s string, i int"
    ).csv(os.path.join(d, "ragged.csv"))
    got = {(r.s, r.i) for r in df.collect()}
    assert got == {("a", 3), ("hello", 1), ("foo", 2), ("b", None), ("c", None)}
