"""Function-library semantics: Impala-name shims, approximate-aggregate
accuracy bounds, SQL rewrite templates."""

from __future__ import annotations

from pyspark.sql import functions as F

from impalatogo_spark.functions import (
    IMPALA_SQL_FUNCTION_REWRITES,
    decode,
    group_concat,
    isnull,
    nullifzero,
    quotient,
    strleft,
    strright,
    zeroifnull,
)
from impalatogo_spark.functions.registry import appx_median, ndv
from impalatogo_spark.session import table


def test_string_shims(spark):
    df = spark.createDataFrame([("hello world",)], ["s"])
    row = df.select(
        strleft("s", 5).alias("l"),
        strright("s", 5).alias("r"),
    ).first()
    assert row.l == "hello"
    assert row.r == "world"


def test_conditional_shims(spark):
    df = spark.createDataFrame([(None, 0), (3, 4)], ["a", "b"])
    rows = df.select(
        zeroifnull("a").alias("z"),
        nullifzero("b").alias("nz"),
        isnull("a", F.lit(-1)).alias("nvl"),
    ).collect()
    assert [r.z for r in rows] == [0, 3]
    assert [r.nz for r in rows] == [None, 4]
    assert [r.nvl for r in rows] == [-1, 3]


def test_decode_rewrites_to_case(spark):
    df = spark.createDataFrame([(1,), (2,), (99,)], ["x"])
    rows = df.select(decode("x", 1, "one", 2, "two", default="other").alias("d")).collect()
    assert [r.d for r in rows] == ["one", "two", "other"]


def test_quotient_integer_div(spark):
    df = spark.createDataFrame([(7, 2), (-7, 2)], ["a", "b"])
    rows = df.select(quotient("a", "b").alias("q")).collect()
    # Impala quotient truncates toward zero (be/src/exprs/operators.cc)
    assert [r.q for r in rows] == [3, -3]


def test_group_concat_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], ["s"])
    row = df.agg(group_concat("s", ",").alias("g")).first()
    assert row.g == "a,b,c"


def test_ndv_error_bound(spark, sf_dir):
    """Impala ndv() ~ HLL with ~5% typical error (aggregate-functions.cc:994).
    Assert our approx_count_distinct lands within 10% of exact."""
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        ndv("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.10


def test_distinctpc_error_bound(spark, sf_dir):
    """Impala distinctpc/distinctpcsa (Flajolet-Martin PC,
    aggregate-functions.cc:860-992) -> approx_count_distinct. PC's typical
    error is worse than HLL's; our HLL++ mapping must land well within it."""
    from impalatogo_spark.functions import distinctpc, distinctpcsa

    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        distinctpc("l_partkey").alias("pc"),
        distinctpcsa("l_partkey").alias("pcsa"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.pc - row.exact) / row.exact < 0.10
    assert abs(row.pcsa - row.exact) / row.exact < 0.10


def test_avg_timestamp_exact_mean(spark):
    """avg(TIMESTAMP) shim == hand-computed truncated integer mean, and is
    insensitive to partitioning (decimal sum, no double accumulation)."""
    from impalatogo_spark.functions import avg_timestamp
    import datetime

    times = [
        datetime.datetime(2024, 1, 1, 0, 0, 0, 1),
        datetime.datetime(2024, 1, 2, 12, 30, 0, 500000),
        datetime.datetime(2024, 1, 30, 23, 59, 59, 999999),
    ]
    epoch = datetime.datetime(1970, 1, 1)
    # exact integer micros (no float round-trip)
    micros = [
        (t - epoch).days * 86_400_000_000 + (t - epoch).seconds * 1_000_000
        + (t - epoch).microseconds
        for t in times
    ]
    expect = epoch + datetime.timedelta(microseconds=sum(micros) // len(micros))
    for n_parts in (1, 3):
        df = spark.createDataFrame(
            [(t,) for t in times], "ts timestamp"
        ).repartition(n_parts)
        got = df.agg(avg_timestamp("ts").alias("a")).first().a
        assert got == expect, (n_parts, got, expect)


def test_appx_median_bound(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        appx_median("l_quantity").alias("approx"),
        F.percentile("l_quantity", 0.5).alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= 1.0  # quantities are 1..50


def test_sql_rewrite_templates_valid(spark):
    """Every SQL rewrite template must produce runnable Spark SQL."""
    numeric = {
        "zeroifnull", "nullifzero", "isnull", "ifnull", "nvl",
        "variance_pop", "variance_samp",
    }
    for name, tmpl in IMPALA_SQL_FUNCTION_REWRITES.items():
        n_args = 2 if "{1}" in tmpl else 1
        if name in numeric:
            args = ["1", "2"][:n_args]
        else:
            args = ["'abc'", "2"][:n_args]
        if name in ("ndv", "appx_count_distinct", "appx_median", "group_concat"):
            args = ["c", "','"]
            src = "(SELECT 1.0 AS c)" if name == "appx_median" else "(SELECT 'x' AS c)"
            sql = f"SELECT {tmpl.format(*args)} FROM {src}"
        elif name in ("quotient",):
            sql = f"SELECT {tmpl.format('7', '2')}"
        elif name in ("istrue", "isnottrue", "isfalse", "isnotfalse"):
            sql = f"SELECT {tmpl.format('CAST(NULL AS BOOLEAN)')}"
        elif name in ("is_inf", "is_nan"):
            sql = f"SELECT {tmpl.format('CAST(1.0 AS DOUBLE)')}"
        elif name == "fnv_hash":
            arg = "'abc'"
            sql = f"SELECT {tmpl.format(arg)}"
        elif name.endswith(("_add", "_sub")) or name in (
            "add_months", "date_add", "adddate", "date_sub", "subdate"
        ):
            ts = "TIMESTAMP '2024-01-15 10:00:00'"
            sql = "SELECT " + tmpl.format(ts, "2")
        elif name == "extract":
            ts = "TIMESTAMP '2024-01-15 10:00:00'"
            sql = "SELECT " + tmpl.format(ts, "'year'")
        elif name == "dayname":
            sql = "SELECT " + tmpl.format("TIMESTAMP '2024-01-15'")
        else:
            sql = f"SELECT {tmpl.format(*args)}"
        spark.sql(sql).collect()  # must not raise


def test_sample_deterministic_with_seed(spark, sf_dir):
    from impalatogo_spark.queries.relational import sample_reservoir

    a = sample_reservoir(spark, sf_dir).collect()
    b = sample_reservoir(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert 0 < len(a)


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from impalatogo_spark.queries.pipeline import sample_stratified
    from impalatogo_spark.session import table
    import pyspark.sql.functions as _F

    a = sample_stratified(spark, sf_dir).collect()
    b = sample_stratified(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    totals = {
        r.lang: r.n
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(_F.count("*").alias("n"))
        .collect()
    }
    from collections import Counter

    got = Counter(r.lang for r in a)
    # en sampled at 0.5 must exceed zh sampled at 0.1 (rate-proportional)
    assert got["en"] / totals["en"] > got["zh"] / totals["zh"]


def test_fmod_quotient_negative_semantics(spark):
    # Impala fmod/% carry the DIVIDEND's sign (C fmod); quotient/DIV
    # truncates toward zero. DuckDB's fmod is floor-signed, so these are
    # pinned here rather than oracle-checked (SURVEY §8 divergences).
    row = spark.sql(
        "SELECT mod(-7.5D, 2.0D) AS fm, CAST(-17 AS BIGINT) DIV 5 AS qt, "
        "       pmod(-7, 5) AS pm"
    ).first()
    assert row.fm == -1.5 and row.qt == -3 and row.pm == 3
