"""Query registry: every implemented operator from SURVEY.md §2 gets a named
entry pairing a Spark implementation with a DuckDB-runnable ANSI-SQL oracle.

The driver (and tests/test_correctness.py) run both sides at the same scale
factor and compare row count + schema + order-insensitive value hash, so:
  * every computed column is aliased identically on both sides;
  * doubles are rounded explicitly on both sides;
  * timestamps/dates in output are formatted to 'yyyy-MM-dd' strings;
  * LIMIT queries carry a full deterministic tie-break in ORDER BY.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQueryFn
    oracle: Optional[str]  # None -> non-SQL-expressible; driver does rows-only check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "", tags: tuple = ()):
    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules once, on first access.
    from impalatogo_spark.queries import tpch, relational, pipeline  # noqa: F401
    from impalatogo_spark import streaming  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQueryFn]:
    return {k: q.spark_fn for k, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {k: q.oracle for k, q in all_queries().items() if q.oracle is not None}
