"""UDF/UDA surface (SURVEY §2.11): CREATE FUNCTION -> SQL-callable pandas
UDFs; CREATE AGGREGATE FUNCTION -> GROUPED_AGG UDA; SHOW FUNCTIONS."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from impalatogo_spark.engine import Engine
from impalatogo_spark.session import register_tables


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    e = Engine(spark)
    register_tables(spark, sf_dir)
    return e


def test_scalar_pandas_udf_in_sql(eng):
    def shout(s: pd.Series) -> pd.Series:
        return s.str.upper() + "!"

    eng.create_function("shout", shout, "string")
    rows = eng.sql(
        "SELECT shout(r_name) AS loud FROM region ORDER BY r_name"
    ).collect()
    assert rows[0].loud == "AFRICA!"
    assert all(r.loud.endswith("!") for r in rows)


def test_row_udf_in_sql(eng):
    eng.create_function("add7", lambda x: x + 7, "bigint", vectorized=False)
    assert eng.sql("SELECT add7(n_nationkey) AS v FROM nation WHERE n_nationkey = 3").first().v == 10


def test_grouped_agg_uda_in_sql(eng, spark):
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    eng.create_aggregate_function("geomean", geomean, "double")
    rows = eng.sql(
        """
        SELECT c_mktsegment, geomean(c_acctbal) AS g
        FROM customer WHERE c_acctbal > 0
        GROUP BY c_mktsegment
        """
    ).collect()
    assert len(rows) == 5
    # cross-check one group against a driver-side computation
    seg = rows[0].c_mktsegment
    vals = [
        r.c_acctbal
        for r in spark.table("customer")
        .where(f"c_mktsegment = '{seg}' AND c_acctbal > 0")
        .collect()
    ]
    expected = math.exp(sum(math.log(v) for v in vals) / len(vals))
    assert abs(rows[0].g - expected) / expected < 1e-9


def test_show_functions_lists_registered(eng):
    eng.create_function("my_marker_fn", lambda s: s, "string", vectorized=False)
    names = {r.function.split(".")[-1] for r in eng.show_functions().collect()}
    assert "my_marker_fn" in names
