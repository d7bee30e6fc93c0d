"""TPC-H query suite, adapted to the driver's simplified TPC-H-ish schema.

Reference parity: the reference ships the full 22-query TPC-H workload
(`testdata/workloads/tpch/queries/` in /root/reference). The driver's testdata
omits `partsupp` and several columns (l_commitdate, l_receiptdate, l_shipmode,
c_phone, ...), so queries that need them are adapted to equivalent *plan
shapes* (same joins/aggregates/subquery structure) over available columns; each
docstring says what changed.

Scale design (100 TB / 1000 executors):
  * nation/region are fixed-cardinality -> always broadcast.
  * supplier/part/customer grow with SF but stay orders of magnitude under
    lineitem -> leave to AQE dynamic broadcast; explicit broadcast() only for
    the fixed tables so plans stay valid when dims outgrow driver memory.
  * All aggregations are expressed via groupBy().agg() -> Spark plans
    partial (map-side) + final HashAggregate automatically, the equivalent of
    the reference's 2-phase agg (`fe/.../planner/DistributedPlanner.java:676-810`).
  * Filters are plain column predicates -> Catalyst pushes them into the
    parquet scan (PushedFilters), equivalent of HdfsScanNode conjunct pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impalatogo_spark.queries import register
from impalatogo_spark.session import register_tables, table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def _fmt_date(col):
    return F.date_format(col, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# Q1: pricing summary report — scan + filter + 2-phase agg + sort.
# Reference workload: testdata/workloads/tpch/queries/tpch-q1.test
# ---------------------------------------------------------------------------
@register(
    "tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("tpch", "aggregation"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary. Scan->filter->agg->sort; the flagship slice.

    Plan shape parity: HdfsScanNode + PartitionedAggregationNode + SortNode
    (`be/src/exec/partitioned-aggregation-node.cc`, `sort-node.cc`).
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3: shipping priority — 3-way join + agg + top-k.
# ---------------------------------------------------------------------------
@register(
    "tpch_q3",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    tags=("tpch", "join", "topn"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: customer⋈orders⋈lineitem, revenue top-10.

    Adapted: no o_shippriority column -> o_orderpriority. Top-k carries a full
    tie-break (l_orderkey) so the LIMIT row-set is deterministic for the
    oracle compare. Plan shape: HashJoinNode x2 + agg + TopNNode
    (`be/src/exec/topn-node.cc`).
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            _fmt_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5: local supplier volume — 6-way join incl. broadcast dims.
# ---------------------------------------------------------------------------
@register(
    "tpch_q5",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
""",
    tags=("tpch", "join", "aggregation"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join; nation/region broadcast explicitly
    (fixed cardinality at any SF); supplier left to AQE.

    Adapted: no region-name filter (keeps all 5 regions) since data volume is
    tiny per region; join graph identical to the reference workload's q5.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan + pushed filter + agg.
# ---------------------------------------------------------------------------
@register(
    "tpch_q6",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
    tags=("tpch", "scan", "aggregation"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue: every predicate is scan-pushable; the physical plan
    must show PushedFilters on all four columns (tests/test_plans.py asserts).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )
