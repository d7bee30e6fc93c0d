"""Concurrent query execution — the engine-side analogue of the reference's
multi-tenant serving path (admission control / request pools,
be/src/scheduling/admission-controller.cc). Spark's unit of admission is the
scheduler pool: queries submitted from different threads land in their
thread's pool (spark.scheduler.pool local property, set via the Impala
REQUEST_POOL query option), and a SparkSession is thread-safe by contract —
so N clients sharing one engine must each get exactly the answer they would
have gotten serially.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from impalatogo_spark.engine import Engine
from impalatogo_spark.queries import all_queries
from impalatogo_spark.session import register_tables

_QUERIES = [
    "tpch_q1",
    "tpch_q6",
    "window_rank",
    "agg_distinct_multi",
    "dedup_exact",
    "text_quality",
    "limit_offset",
    "union_all",
]


def _norm(rows):
    return sorted(tuple(str(c) for c in r) for r in rows)


def test_concurrent_queries_match_serial(spark, sf_dir):
    reg = all_queries()
    serial = {n: _norm(reg[n].spark_fn(spark, sf_dir).collect()) for n in _QUERIES}

    def run(name):
        # each worker pins its own scheduler pool, like a per-session
        # REQUEST_POOL assignment
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"pool_{name}")
        try:
            return name, _norm(reg[name].spark_fn(spark, sf_dir).collect())
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=len(_QUERIES)) as ex:
        concurrent = dict(ex.map(run, _QUERIES))
    for n in _QUERIES:
        assert concurrent[n] == serial[n], f"{n} diverged under concurrency"


def test_request_pool_option_sets_scheduler_pool(spark, sf_dir):
    """SET REQUEST_POOL=<pool> (query-options.cc) must land on the Spark
    scheduler-pool local property and clear on unset."""
    register_tables(spark, sf_dir)
    eng = Engine(spark)
    eng.set("REQUEST_POOL", "etl")
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "etl"
    assert eng.sql("SELECT count(*) AS c FROM region").first().c == 5
    eng.set("REQUEST_POOL", "")
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None
