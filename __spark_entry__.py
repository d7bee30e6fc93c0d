"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over impalatogo_spark: the driver runs ``entry(spark)`` as a smoke
check, then compares each ``queries()[name]`` against ``oracle_sql()[name]``
via DuckDB at sf=0.01 (row-count + schema + order-insensitive value hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impalatogo_spark.queries import oracle_map, spark_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001."""
    from impalatogo_spark.queries.tpch import tpch_q1

    return tpch_q1(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    return oracle_map()
