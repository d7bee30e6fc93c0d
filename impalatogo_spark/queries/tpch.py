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


# ---------------------------------------------------------------------------
# Q2 (adapted): min-price supplier per part — correlated-scalar-subquery shape.
# No partsupp table -> lineitem is the part↔supplier bridge; "cost" = avg sale
# price. Same plan shape as the reference workload's q2 (agg + rejoin on min).
# ---------------------------------------------------------------------------
@register(
    "tpch_q2",
    oracle="""
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         round(avg(l_extendedprice), 2) AS avg_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_name, s_name, ps.avg_price
FROM ps
JOIN (SELECT partkey, min(avg_price) AS min_price FROM ps GROUP BY partkey) m
  ON ps.partkey = m.partkey AND ps.avg_price = m.min_price
JOIN part     ON p_partkey = ps.partkey
JOIN supplier ON s_suppkey = ps.suppkey
WHERE p_type = 'LARGE'
ORDER BY p_partkey, s_name
""",
    tags=("tpch", "join", "subquery"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-price supplier per LARGE part. avg is rounded to 2dp on both sides
    before the min-equality so float noise cannot flip the argmin.

    Scale note: the per-part min is a window over the ALREADY-AGGREGATED
    (part, supplier) frame — one small shuffle — instead of a second groupBy
    + self-join, which would rescan and reshuffle the aggregate twice. The
    selective p_type filter is pushed THROUGH the fact aggregation as a
    broadcast semi-join on the filtered part keys, so only LARGE-part
    lineitems (~1/6 of the table) are ever aggregated — at 100 TB that is
    the difference between shuffling the whole fact table's groups and
    one-sixth of them."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    supp = _t(spark, sf_dir, "supplier")
    li = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.round(F.avg("l_extendedprice"), 2).alias("avg_price"))
    w = W.partitionBy("partkey")
    return (
        ps.withColumn("min_price", F.min("avg_price").over(w))
        .filter(F.col("avg_price") == F.col("min_price"))
        .join(part, F.col("partkey") == F.col("p_partkey"))
        .join(supp, F.col("suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "avg_price")
        .orderBy("p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q4: order priority checking — EXISTS correlated subquery -> left-semi join.
# Adapted: no l_commitdate/l_receiptdate -> "late" = shipped after order date.
# ---------------------------------------------------------------------------
@register(
    "tpch_q4",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("tpch", "subquery", "semi-join"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS -> left_semi join (the Spark-native equivalent of the
    reference's StmtRewriter subquery-to-join rewrite,
    fe/.../analysis/StmtRewriter.java:110-301)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations — self-joined dims, disjunctive
# pair predicate, group by derived year.
# ---------------------------------------------------------------------------
@register(
    "tpch_q7",
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade volume; both nation copies broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8: national market share — conditional aggregation ratio per year.
# ---------------------------------------------------------------------------
@register(
    "tpch_q8",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    tags=("tpch", "join", "aggregation"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of NATION_3 suppliers in AMERICA for PROMO parts."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 (adapted): product-type profit. No ps_supplycost -> cost proxy =
# 0.5 * p_retailprice * l_quantity. Same join graph + group by (nation, year).
# ---------------------------------------------------------------------------
@register(
    "tpch_q9",
    oracle="""
SELECT nation, o_year,
       round(sum(CAST(round(amount * 100) AS BIGINT)) / 100.0, 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    tags=("tpch", "join", "aggregation"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for '%gear%' parts."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            # cents-summing, see tpcds_q89 for rationale: round(sum(double), 2)
            # sits on half-boundaries and varies with partition order.
            F.round(F.sum(F.round(F.col("amount") * 100, 0)) / 100.0, 2).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — join + agg + top-20 with tie-break.
# ---------------------------------------------------------------------------
@register(
    "tpch_q10",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "join", "topn"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned revenue in 1996Q4."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 (adapted): important-stock — HAVING against a scalar subquery of the
# global total. partsupp -> lineitem revenue per part.
# ---------------------------------------------------------------------------
@register(
    "tpch_q11",
    oracle="""
SELECT l_partkey AS partkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
FROM lineitem
GROUP BY l_partkey
HAVING sum(l_extendedprice * (1 - l_discount)) >
       (SELECT sum(l_extendedprice * (1 - l_discount)) * 0.0006 FROM lineitem)
ORDER BY value DESC, partkey
""",
    tags=("tpch", "subquery", "aggregation"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 0.06% of global revenue. The scalar total is
    a 1-row broadcast cross join — Spark's native shape for uncorrelated
    scalar subqueries; at 100 TB the total is one shuffle-free reduce."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(rev).alias("raw_value")
    )
    total = li.agg((F.sum(rev) * 0.0006).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("partkey", F.round("raw_value", 2).alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


# ---------------------------------------------------------------------------
# Q12 (adapted): late-shipment priority counting. No l_shipmode/receiptdate ->
# "late" = shipped >60 days after order date; groups by l_linestatus.
# ---------------------------------------------------------------------------
@register(
    "tpch_q12",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    tags=("tpch", "join", "conditional"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation counts of high/low priority late shipments."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — LEFT OUTER join + double agg.
# ---------------------------------------------------------------------------
@register(
    "tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("tpch", "outer-join", "aggregation"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of order counts per customer (zeros included via left
    outer join; the join-side filter stays in the ON clause)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14: promotion effect — conditional-agg ratio over one month.
# ---------------------------------------------------------------------------
@register(
    "tpch_q14",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
""",
    tags=("tpch", "join", "conditional"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of September-1997 revenue from PROMO parts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — derived revenue view + max-equality (scalar subquery).
# ---------------------------------------------------------------------------
@register(
    "tpch_q15",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    tags=("tpch", "subquery", "aggregation"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max quarterly revenue; revenue rounded before the
    max-equality so both engines agree on ties."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 (adapted): supplier count per part attribute — NOT IN subquery
# (null-aware anti join) + count distinct. lineitem bridges part↔supplier.
# ---------------------------------------------------------------------------
@register(
    "tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=("tpch", "anti-join", "distinct"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN -> null-aware anti join (reference: NULL_AWARE_LEFT_ANTI_JOIN,
    common/thrift/PlanNodes.thrift:156-169). s_suppkey is non-null here so
    left_anti is semantically identical; the SQL-string path through
    spark.sql would plan the null-aware variant."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated scalar subquery (per-part avg).
# ---------------------------------------------------------------------------
@register(
    "tpch_q17",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    tags=("tpch", "subquery", "aggregation"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery as groupBy+rejoin. Quantities are integral
    doubles, so avg = exact_sum/exact_count is bit-identical on both engines —
    no rounding needed at the comparison boundary."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_threshold")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers — HAVING on grouped sum, 3-way join, top-k.
# ---------------------------------------------------------------------------
@register(
    "tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch", "subquery", "topn"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with HAVING -> semi join against the grouped keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"),
                    F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _fmt_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19: discounted revenue — disjunction of conjunct bundles (OR'd predicates
# across the join), the reference's theta-join stress shape.
# ---------------------------------------------------------------------------
@register(
    "tpch_q19",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 15
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 20 AND 40)
""",
    tags=("tpch", "join", "predicate"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjunct-bundles post-join predicate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")

    def bundle(brand, smin, smax, qmin, qmax):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )

    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            bundle("Brand#1", 1, 10, 1, 20)
            | bundle("Brand#2", 5, 15, 10, 30)
            | bundle("Brand#3", 10, 25, 20, 40)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q20 (adapted): potential part promotion — nested IN subqueries -> chained
# semi joins. lineitem substitutes for partsupp availability.
# ---------------------------------------------------------------------------
@register(
    "tpch_q20",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50
)
ORDER BY s_suppkey
""",
    tags=("tpch", "subquery", "semi-join"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries as chained semi joins."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red_parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    heavy = (
        li.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting. No commit/receipt dates ->
# "waiting" = supplier shipped last in a multi-supplier order, strictly after
# the earliest shipment. Same exists/not-exists correlated shape.
# ---------------------------------------------------------------------------
@register(
    "tpch_q21",
    oracle="""
WITH order_stats AS (
  SELECT l_orderkey AS okey,
         max(l_shipdate) AS max_ship,
         min(l_shipdate) AS min_ship,
         count(DISTINCT l_suppkey) AS nsupp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s_name, count(DISTINCT l_orderkey) AS numwait
FROM lineitem
JOIN order_stats ON l_orderkey = okey
JOIN supplier    ON s_suppkey = l_suppkey
WHERE nsupp >= 2
  AND l_shipdate = max_ship
  AND l_shipdate > min_ship
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
    tags=("tpch", "join", "window-shape"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-to-ship supplier per multi-supplier order; per-order stats as
    WINDOW functions over the l_orderkey partition — ONE lineitem shuffle —
    replacing the reference's correlated EXISTS/NOT EXISTS pair (which would
    plan as a groupBy + rejoin, shuffling lineitem twice)."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("l_orderkey")
    return (
        li.select(
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            F.max("l_shipdate").over(w).alias("max_ship"),
            F.min("l_shipdate").over(w).alias("min_ship"),
            F.size(F.collect_set("l_suppkey").over(w)).alias("nsupp"),
        )
        .filter(
            (F.col("nsupp") >= 2)
            & (F.col("l_shipdate") == F.col("max_ship"))
            & (F.col("l_shipdate") > F.col("min_ship"))
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q22 (adapted): global sales opportunity — scalar subquery + NOT EXISTS.
# No c_phone -> country code proxy = c_custkey % 7.
# ---------------------------------------------------------------------------
@register(
    "tpch_q22",
    oracle="""
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM (
  SELECT c_custkey % 7 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
    tags=("tpch", "anti-join", "subquery"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent orders: scalar-subquery
    threshold broadcast + anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select((F.col("c_custkey") % 7).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ===========================================================================
# TPC-DS subset (reference workload: testdata/workloads/tpcds/queries/,
# ~20 star-join queries — BASELINE.md §1). The driver schema has no
# store_sales/date_dim; the queries keep the exact PLAN SHAPES (fact x dim
# star joins + date-range filter + grouped topk) over orders/lineitem dims.
# ===========================================================================

@register(
    "tpcds_q3",
    oracle="""
SELECT year(o_orderdate) AS d_year, p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_agg
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE p_type = 'STANDARD' AND month(o_orderdate) = 12
GROUP BY 1, 2
ORDER BY d_year, sum_agg DESC, p_brand
LIMIT 100
""",
    tags=("tpcds", "join", "topn"),
)
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 shape: fact x date x item, brand revenue per year (December)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.month("o_orderdate") == 12)
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_agg"
            )
        )
        .orderBy("d_year", F.desc("sum_agg"), "p_brand")
        .limit(100)
    )


@register(
    "tpcds_q7",
    oracle="""
SELECT p_name,
       round(avg(l_quantity), 4)      AS agg1,
       round(avg(l_extendedprice), 4) AS agg2,
       round(avg(l_discount), 4)      AS agg3,
       round(sum(l_extendedprice), 2) AS agg4
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'AUTOMOBILE' AND o_orderpriority = '3-MEDIUM'
GROUP BY p_name
ORDER BY p_name
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7 shape: 4-way star with demographic-style dim filters, four
    averages per item."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "3-MEDIUM")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("p_name")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("agg1"),
            F.round(F.avg("l_extendedprice"), 4).alias("agg2"),
            F.round(F.avg("l_discount"), 4).alias("agg3"),
            F.round(F.sum("l_extendedprice"), 2).alias("agg4"),
        )
        .orderBy("p_name")
        .limit(100)
    )


@register(
    "tpcds_q19",
    oracle="""
SELECT n_name, p_brand, p_partkey,
       round(sum(l_extendedprice), 2) AS ext_price
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE p_size >= 20 AND month(o_orderdate) = 6
GROUP BY n_name, p_brand, p_partkey
ORDER BY ext_price DESC, n_name, p_brand, p_partkey
LIMIT 100
""",
    tags=("tpcds", "join", "topn"),
)
def tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 shape: 5-way star incl. geography dim, brand revenue topk."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    o = _t(spark, sf_dir, "orders").filter(F.month("o_orderdate") == 6)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "p_brand", "p_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("ext_price"))
        .orderBy(F.desc("ext_price"), "n_name", "p_brand", "p_partkey")
        .limit(100)
    )


@register(
    "tpcds_q42",
    oracle="""
SELECT year(o_orderdate) AS d_year, p_type,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_sales
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE year(o_orderdate) = 1998
GROUP BY 1, 2
ORDER BY total_sales DESC, p_type
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42 shape: category revenue for one year, ordered by revenue."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1998)
    p = _t(spark, sf_dir, "part")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_type")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_sales"
            )
        )
        .orderBy(F.desc("total_sales"), "p_type")
        .limit(100)
    )


@register(
    "tpcds_q52",
    oracle="""
SELECT year(o_orderdate) AS d_year, p_brand,
       round(sum(l_extendedprice), 2) AS ext_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE month(o_orderdate) = 11
GROUP BY 1, 2
ORDER BY d_year, ext_price DESC, p_brand
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q52 shape: brand revenue for one month across years."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.month("o_orderdate") == 11)
    p = _t(spark, sf_dir, "part")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_brand")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("ext_price"))
        .orderBy("d_year", F.desc("ext_price"), "p_brand")
        .limit(100)
    )


@register(
    "tpcds_q68",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       round(sum(l_extendedprice * (1 + l_tax)), 2)  AS price_with_tax,
       round(sum(l_extendedprice * l_discount), 2)   AS total_discount
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE n_regionkey IN (1, 3) AND o_orderstatus = 'F'
GROUP BY c_name, c_custkey, o_orderkey
HAVING sum(l_extendedprice * (1 + l_tax)) > 200000
ORDER BY c_name, o_orderkey
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68 shape: per-(customer, order) extended-price rollups with a
    HAVING threshold and geography filter."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey").isin(1, 3))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 + F.col("l_tax"))), 2).alias(
                "price_with_tax"
            ),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "total_discount"
            ),
        )
        .filter(F.col("price_with_tax") > 200000)
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


@register(
    "tpcds_q34",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, cnt
FROM (
  SELECT o_orderkey, o_custkey, count(*) AS cnt
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderstatus IN ('O', 'F')
  GROUP BY o_orderkey, o_custkey
  HAVING count(*) BETWEEN 6 AND 13
) dn
JOIN customer ON o_custkey = c_custkey
ORDER BY c_name, o_orderkey
""",
    tags=("tpcds", "join"),
)
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: per-ticket item-count bands (HAVING BETWEEN on a
    grouped count), rejoined to customer."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus").isin("O", "F"))
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    dn = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt").between(6, 13))
    )
    return (
        dn.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "cnt")
        .orderBy("c_name", "o_orderkey")
    )


@register(
    "tpcds_q59",
    oracle="""
WITH weekly AS (
  SELECT year(o_orderdate) AS y, weekofyear(o_orderdate) AS w,
         round(sum(o_totalprice), 2) AS sales
  FROM orders GROUP BY 1, 2
)
SELECT a.w AS wk,
       round(a.sales, 2) AS sales_1997,
       round(b.sales, 2) AS sales_1998,
       round(a.sales / b.sales, 4) AS ratio
FROM weekly a JOIN weekly b ON a.w = b.w AND a.y = 1997 AND b.y = 1998
ORDER BY wk
""",
    tags=("tpcds", "self-join"),
)
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 shape: week-over-week self-join of weekly sales across two
    years. The weekly CTE aggregates once; the year slices self-join on week."""
    o = _t(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.year("o_orderdate").alias("y"), F.weekofyear("o_orderdate").alias("w")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("sales"))
    a = weekly.filter(F.col("y") == 1997).select(
        F.col("w").alias("wk"), F.col("sales").alias("sales_1997")
    )
    b = weekly.filter(F.col("y") == 1998).select(
        F.col("w").alias("wk"), F.col("sales").alias("sales_1998")
    )
    return (
        a.join(b, "wk")
        .select(
            "wk",
            F.round("sales_1997", 2).alias("sales_1997"),
            F.round("sales_1998", 2).alias("sales_1998"),
            F.round(F.col("sales_1997") / F.col("sales_1998"), 4).alias("ratio"),
        )
        .orderBy("wk")
    )


@register(
    "tpcds_q65",
    oracle="""
WITH part_rev AS (
  SELECT l_partkey AS pk,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
thr AS (
  SELECT CAST(sum(rev_cents) AS DOUBLE) * 0.85 / count(*) AS thr_cents
  FROM part_rev
)
SELECT p_partkey, p_name, round(rev_cents / 100.0, 2) AS revenue
FROM part_rev
JOIN part ON pk = p_partkey
CROSS JOIN thr
WHERE rev_cents <= thr_cents
ORDER BY p_partkey
""",
    tags=("tpcds", "subquery"),
)
def tpcds_q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: items whose revenue is below 0.85x the average item
    revenue — the scalar threshold is a 1-row broadcast, not a rescan.

    Determinism: revenue is summed as integer cents (exact in the 2^53 integer
    domain regardless of partition order), and the 0.85x-average threshold is
    computed as one IEEE multiply + divide over those exact integers, so the
    borderline membership test is bit-identical between Spark and the oracle.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    part_rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        ).alias("rev_cents")
    )
    threshold = part_rev.agg(
        (F.sum("rev_cents") * 0.85 / F.count(F.lit(1))).alias("thr_cents")
    )
    return (
        part_rev.join(F.broadcast(threshold))
        .filter(F.col("rev_cents") <= F.col("thr_cents"))
        .join(part, F.col("pk") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", F.round(F.col("rev_cents") / 100.0, 2).alias("revenue")
        )
        .orderBy("p_partkey")
    )


@register(
    "tpcds_q46",
    oracle="""
SELECT c_name, o_orderkey,
       round(sum(l_extendedprice * l_discount), 2) AS amt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND n_regionkey = 2
GROUP BY c_name, o_orderkey
ORDER BY c_name, o_orderkey
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46 shape: per-(customer, ticket) amounts for a demographic +
    geography slice."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("amt"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "profit"
            ),
        )
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


# ===========================================================================
# TPC-DS subset, batch 3 — completes the reference workload list
# (testdata/workloads/tpcds/queries/: q6 q8 q27 q43 q47 q53 q55 q61 q63 q73
#  q79 q88 q89 q96 q98). Same adaptation rule as batch 1/2: keep the PLAN
# SHAPE (star joins, correlated scalar subqueries, pivoted CASE aggs,
# window-over-aggregate, cross-joined scalar blocks) on the driver schema.
# ===========================================================================


@register(
    "tpcds_q6",
    oracle="""
SELECT n_name AS state, count(*) AS cnt
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE p.p_retailprice > 1.005 * (
    SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
GROUP BY n_name
HAVING count(*) >= 10
ORDER BY cnt, state
LIMIT 100
""",
    tags=("tpcds", "subquery", "correlated"),
)
def tpcds_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q6 shape (tpcds-q6.test): customers-by-state buying items priced
    >0.5% above their category average — the correlated per-category scalar subquery
    becomes a tiny grouped aggregate broadcast back onto the item dim."""
    p = _t(spark, sf_dir, "part")
    type_avg = p.groupBy(F.col("p_type").alias("ta_type")).agg(
        F.avg("p_retailprice").alias("type_avg_price")
    )
    pricey = (
        p.join(F.broadcast(type_avg), F.col("p_type") == F.col("ta_type"))
        .filter(F.col("p_retailprice") > 1.005 * F.col("type_avg_price"))
        .select("p_partkey")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(pricey, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("state"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 10)
        .orderBy("cnt", "state")
        .limit(100)
    )


@register(
    "tpcds_q8",
    oracle="""
WITH a AS (
  SELECT substr(c_name, 17, 1) AS pref, count(*) AS cnt
  FROM customer JOIN orders ON c_custkey = o_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY pref
  HAVING count(*) > 10
),
b AS (
  SELECT DISTINCT substr(c_name, 17, 1) AS pref
  FROM customer
  WHERE substr(c_name, 17, 1) IN ('0', '1', '2', '3', '6', '8', '9')
)
SELECT n_name, round(sum(o_totalprice), 2) AS net_profit
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE substr(c_name, 17, 1) IN (SELECT a.pref FROM a WHERE a.pref IN (SELECT pref FROM b))
GROUP BY n_name
ORDER BY n_name
""",
    tags=("tpcds", "semi-join", "having"),
)
def tpcds_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q8 shape (tpcds-q8.test): zip-prefix cohorts over a HAVING
    count threshold, left-semi-joined against a literal prefix list, then the
    surviving prefixes gate the fact-side rollup per store (nation here)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    pref = F.substring(F.col("c_name"), 17, 1)
    a = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(pref.alias("pref"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 10)
    )
    b = (
        c.select(pref.alias("pref"))
        .filter(F.col("pref").isin("0", "1", "2", "3", "6", "8", "9"))
        .distinct()
    )
    good = a.join(b, "pref", "left_semi").select("pref")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(good), pref == F.col("pref"), "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("net_profit"))
        .orderBy("n_name")
    )


@register(
    "tpcds_q27",
    oracle="""
SELECT p_brand, n_name,
       round(avg(l_quantity), 4)      AS agg1,
       round(avg(l_extendedprice), 4) AS agg2,
       round(avg(l_discount), 4)      AS agg3,
       round(avg(l_tax), 4)           AS agg4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE c_mktsegment = 'AUTOMOBILE'
  AND o_orderpriority = '2-HIGH'
  AND year(o_orderdate) = 1997
GROUP BY p_brand, n_name
ORDER BY p_brand, n_name
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q27 shape (tpcds-q27.test): 5-way star with three dim filters
    (demographics/date/state analogs), four averages per (item, state)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "2-HIGH") & (F.year("o_orderdate") == 1997)
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "n_name")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("agg1"),
            F.round(F.avg("l_extendedprice"), 4).alias("agg2"),
            F.round(F.avg("l_discount"), 4).alias("agg3"),
            F.round(F.avg("l_tax"), 4).alias("agg4"),
        )
        .orderBy("p_brand", "n_name")
        .limit(100)
    )


@register(
    "tpcds_q43",
    oracle="""
SELECT n_name,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 1 THEN o_totalprice END), 2) AS sun_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 2 THEN o_totalprice END), 2) AS mon_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 3 THEN o_totalprice END), 2) AS tue_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 4 THEN o_totalprice END), 2) AS wed_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 5 THEN o_totalprice END), 2) AS thu_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 6 THEN o_totalprice END), 2) AS fri_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 7 THEN o_totalprice END), 2) AS sat_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE year(o_orderdate) = 1997 AND n_regionkey IN (0, 2, 4)
GROUP BY n_name
ORDER BY n_name
LIMIT 100
""",
    tags=("tpcds", "pivot"),
)
def tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43 shape (tpcds-q43.test): day-of-week pivot (7 conditional
    sums) per store. Spark dayofweek is 1=Sunday; DuckDB is 0=Sunday, hence
    the +1 on the oracle side only."""
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey").isin(0, 2, 4))
    dow = F.dayofweek("o_orderdate")
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        F.round(F.sum(F.when(dow == i + 1, F.col("o_totalprice"))), 2).alias(
            f"{names[i]}_sales"
        )
        for i in range(7)
    ]
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*aggs)
        .orderBy("n_name")
        .limit(100)
    )


@register(
    "tpcds_q47",
    oracle="""
WITH v1 AS (
  SELECT p_brand, year(o_orderdate) AS y, month(o_orderdate) AS moy,
         round(sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0, 2) AS sum_sales
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
), v2 AS (
  SELECT p_brand, y, moy, sum_sales,
         avg(sum_sales) OVER (PARTITION BY p_brand, y) AS avg_monthly,
         lag(sum_sales)  OVER (PARTITION BY p_brand ORDER BY y, moy) AS psum,
         lead(sum_sales) OVER (PARTITION BY p_brand ORDER BY y, moy) AS nsum
  FROM v1
)
SELECT p_brand, y, moy, sum_sales,
       round(avg_monthly, 6) AS avg_monthly_sales,
       psum, nsum
FROM v2
WHERE y = 1998 AND avg_monthly > 0
  AND abs(sum_sales - avg_monthly) / avg_monthly > 0.1
  AND psum IS NOT NULL AND nsum IS NOT NULL
ORDER BY round(sum_sales - round(avg_monthly, 6), 6), p_brand, moy
LIMIT 100
""",
    tags=("tpcds", "window"),
)
def tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape (tpcds-q47.test): monthly brand sales vs the yearly
    average, with prior/next month via lag/lead. The reference expresses
    psum/nsum as two extra self-joins on rank(); lag/lead over the already
    aggregated (tiny) frame is the single-shuffle Spark form of the same
    relation."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    v1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("moy"),
        )
        .agg(
            # cents-summing, see tpcds_q89 for rationale
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
                )
                / 100.0,
                2,
            ).alias("sum_sales")
        )
    )
    w_avg = Window.partitionBy("p_brand", "y")
    w_seq = Window.partitionBy("p_brand").orderBy("y", "moy")
    v2 = v1.select(
        "p_brand",
        "y",
        "moy",
        "sum_sales",
        F.avg("sum_sales").over(w_avg).alias("avg_monthly"),
        F.lag("sum_sales").over(w_seq).alias("psum"),
        F.lead("sum_sales").over(w_seq).alias("nsum"),
    )
    return (
        v2.filter(
            (F.col("y") == 1998)
            & (F.col("avg_monthly") > 0)
            & (F.abs(F.col("sum_sales") - F.col("avg_monthly")) / F.col("avg_monthly") > 0.1)
            & F.col("psum").isNotNull()
            & F.col("nsum").isNotNull()
        )
        .select(
            "p_brand",
            "y",
            "moy",
            "sum_sales",
            F.round("avg_monthly", 6).alias("avg_monthly_sales"),
            "psum",
            "nsum",
        )
        .orderBy(
            F.round(F.col("sum_sales") - F.col("avg_monthly_sales"), 6), "p_brand", "moy"
        )
        .limit(100)
    )


@register(
    "tpcds_q53",
    oracle="""
SELECT p_brand AS manufact, quarter(o_orderdate) AS qoy,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_sales
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE ((p_type IN ('ECONOMY', 'MEDIUM') AND p_size BETWEEN 1 AND 20)
    OR (p_type IN ('STANDARD', 'PROMO') AND p_size BETWEEN 21 AND 40))
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY 1, 2
ORDER BY sum_sales, manufact, qoy
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53 shape (tpcds-q53.test): quarterly manufacturer sales over a
    12-month window with an OR-of-category/class/brand item filter."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type").isin("ECONOMY", "MEDIUM") & F.col("p_size").between(1, 20))
        | (F.col("p_type").isin("STANDARD", "PROMO") & F.col("p_size").between(21, 40))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("manufact"), F.quarter("o_orderdate").alias("qoy")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_sales"
            )
        )
        .orderBy("sum_sales", "manufact", "qoy")
        .limit(100)
    )


@register(
    "tpcds_q55",
    oracle="""
SELECT p_brand AS brand, round(sum(l_extendedprice), 2) AS ext_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE p_size BETWEEN 30 AND 40
  AND month(o_orderdate) = 12 AND year(o_orderdate) = 1997
GROUP BY p_brand
ORDER BY ext_price DESC, brand
LIMIT 100
""",
    tags=("tpcds", "join", "topn"),
)
def tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q55 shape (tpcds-q55.test): single-month brand revenue under a
    manager-id analog filter (p_size band), ordered by revenue."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.month("o_orderdate") == 12) & (F.year("o_orderdate") == 1997)
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").between(30, 40))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("ext_price"))
        .orderBy(F.desc("ext_price"), "brand")
        .limit(100)
    )


@register(
    "tpcds_q61",
    oracle="""
SELECT promotions, total,
       round(promotions / total * 100, 4) AS promo_pct
FROM (
  SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS promotions
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE n_regionkey = 1 AND p_type = 'PROMO'
    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
) promotional_sales
CROSS JOIN (
  SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS total
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE n_regionkey = 1 AND p_type = 'PROMO'
) all_sales
""",
    tags=("tpcds", "scalar"),
)
def tpcds_q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 shape (tpcds-q61.test): promotional-sales share — two
    scalar star-join aggregates (one with the promo-channel filter, one
    without) cross-joined into a single ratio row."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
    )
    rev = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    promo = base.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).agg(
        rev.alias("promotions")
    )
    total = base.agg(rev.alias("total"))
    return promo.crossJoin(total).select(
        "promotions",
        "total",
        F.round(F.col("promotions") / F.col("total") * 100, 4).alias("promo_pct"),
    )


@register(
    "tpcds_q63",
    oracle="""
SELECT * FROM (
  SELECT p_brand AS manager, month(o_orderdate) AS moy,
         round(sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0, 2) AS sum_sales,
         round(avg(round(sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0, 2))
               OVER (PARTITION BY p_brand), 6) AS avg_monthly_sales
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1998
  GROUP BY 1, 2
) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
           THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY manager, avg_monthly_sales, sum_sales, moy
LIMIT 100
""",
    tags=("tpcds", "window"),
)
def tpcds_q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q63 shape (tpcds-q63.test): monthly manager sales vs the
    manager's average month (window over aggregate), keeping months deviating
    >10% — the CASE-guarded deviation predicate from the reference."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1998)
    p = _t(spark, sf_dir, "part")
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("manager"), F.month("o_orderdate").alias("moy"))
        .agg(
            # cents-summing, see tpcds_q89 for rationale
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
                )
                / 100.0,
                2,
            ).alias("sum_sales")
        )
    )
    w = Window.partitionBy("manager")
    tmp1 = agg.select(
        "manager",
        "moy",
        "sum_sales",
        F.round(F.avg("sum_sales").over(w), 6).alias("avg_monthly_sales"),
    )
    dev = F.when(
        F.col("avg_monthly_sales") > 0,
        F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
        / F.col("avg_monthly_sales"),
    )
    return (
        tmp1.filter(dev > 0.1)
        .orderBy("manager", "avg_monthly_sales", "sum_sales", "moy")
        .limit(100)
    )


@register(
    "tpcds_q73",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, cnt
FROM (
  SELECT o_orderkey, o_custkey, count(*) AS cnt
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    AND CASE WHEN o_totalprice > 0 THEN o_totalprice / 50000 ELSE NULL END > 1
  GROUP BY o_orderkey, o_custkey
) dj
JOIN customer ON o_custkey = c_custkey
WHERE cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_name, o_orderkey
LIMIT 1000
""",
    tags=("tpcds", "join", "having"),
)
def tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q73 shape (tpcds-q73.test): small-basket tickets (grouped count
    banded 1..5) for a CASE-guarded-ratio demographic slice, rejoined to
    customer and ranked by basket size."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (
            F.when(F.col("o_totalprice") > 0, F.col("o_totalprice") / 50000)
            > 1
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    dj = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt").between(1, 5))
    )
    return (
        dj.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "cnt")
        .orderBy(F.desc("cnt"), "c_name", "o_orderkey")
        .limit(1000)
    )


@register(
    "tpcds_q79",
    oracle="""
SELECT c_name, substr(n_name, 1, 8) AS city, o_orderkey,
       CAST((amt_c4 + 50) // 100 AS BIGINT) AS amt_cents,
       CAST((profit_c4 + 50) // 100 AS BIGINT) AS profit_cents
FROM (
  SELECT o_orderkey, o_custkey, n_name,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT))         AS amt_c4,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS profit_c4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE o_orderstatus = 'F' AND n_regionkey BETWEEN 0 AND 2
  GROUP BY o_orderkey, o_custkey, n_name
) ms
JOIN customer ON o_custkey = c_custkey
ORDER BY c_name, o_orderkey, city, amt_cents, profit_cents
LIMIT 100
""",
    tags=("tpcds", "join"),
)
def tpcds_q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q79 shape (tpcds-q79.test): per-(ticket, customer, store-city)
    coupon/profit rollup with store-dim filters, customer joined after the
    aggregate (the reference's ms-subquery-then-customer plan).

    Money sums are exact integer ten-thousandths (cents x discount-cents)
    rounded to cents in INTEGER arithmetic ((x + 50) div 100) and EMITTED
    as BIGINT cents — r07 closed the money-double class structurally: no
    binary double ever reaches the driver's %.6g hash formatter (the sf1
    gate had caught an order-dependent double sum flipping a .005
    boundary, and round(x_c4/10000.0, 2) hit exact decimal ties where
    Spark HALF_UP and DuckDB binary rounding disagree — see tpcds_q98).
    ORDER BY carries a full row tie-break:
    substr(n_name, 1, 8) collides NATION_2/NATION_20, so (c_name,
    o_orderkey, city) alone under-determines the LIMIT edge."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey").between(0, 2))
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    ms = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("o_orderkey", "o_custkey", "n_name")
        .agg(
            F.sum(cents * disc_c).alias("amt_c4"),
            F.sum(cents * (100 - disc_c)).alias("profit_c4"),
        )
    )
    return (
        ms.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.substring("n_name", 1, 8).alias("city"),
            "o_orderkey",
            F.expr("(amt_c4 + 50) div 100").alias("amt_cents"),
            F.expr("(profit_c4 + 50) div 100").alias("profit_cents"),
        )
        .orderBy("c_name", "o_orderkey", "city", "amt_cents", "profit_cents")
        .limit(100)
    )


@register(
    "tpcds_q88",
    oracle="""
SELECT * FROM
 (SELECT count(*) AS h8_30_to_9   FROM events WHERE hour(ts) = 8  AND minute(ts) >= 30 AND event_type IN ('click','view','purchase') AND value > 0) s1
CROSS JOIN
 (SELECT count(*) AS h9_to_9_30   FROM events WHERE hour(ts) = 9  AND minute(ts) <  30 AND event_type IN ('click','view','purchase') AND value > 0) s2
CROSS JOIN
 (SELECT count(*) AS h9_30_to_10  FROM events WHERE hour(ts) = 9  AND minute(ts) >= 30 AND event_type IN ('click','view','purchase') AND value > 0) s3
CROSS JOIN
 (SELECT count(*) AS h10_to_10_30 FROM events WHERE hour(ts) = 10 AND minute(ts) <  30 AND event_type IN ('click','view','purchase') AND value > 0) s4
CROSS JOIN
 (SELECT count(*) AS h10_30_to_11 FROM events WHERE hour(ts) = 10 AND minute(ts) >= 30 AND event_type IN ('click','view','purchase') AND value > 0) s5
CROSS JOIN
 (SELECT count(*) AS h11_to_11_30 FROM events WHERE hour(ts) = 11 AND minute(ts) <  30 AND event_type IN ('click','view','purchase') AND value > 0) s6
CROSS JOIN
 (SELECT count(*) AS h11_30_to_12 FROM events WHERE hour(ts) = 11 AND minute(ts) >= 30 AND event_type IN ('click','view','purchase') AND value > 0) s7
CROSS JOIN
 (SELECT count(*) AS h12_to_12_30 FROM events WHERE hour(ts) = 12 AND minute(ts) <  30 AND event_type IN ('click','view','purchase') AND value > 0) s8
""",
    tags=("tpcds", "scalar"),
)
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape (tpcds-q88.test): eight half-hour store-traffic
    counts, each its own filtered scalar aggregate, cross-joined into a
    single row. One scan per bucket mirrors the reference's eight subquery
    blocks; each count is a 1-row frame so the cross joins are free."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase") & (F.col("value") > 0)
    )
    buckets = [
        ("h8_30_to_9", 8, True), ("h9_to_9_30", 9, False),
        ("h9_30_to_10", 9, True), ("h10_to_10_30", 10, False),
        ("h10_30_to_11", 10, True), ("h11_to_11_30", 11, False),
        ("h11_30_to_12", 11, True), ("h12_to_12_30", 12, False),
    ]
    out = None
    for name, hr, late_half in buckets:
        half = F.minute("ts") >= 30 if late_half else F.minute("ts") < 30
        cnt = ev.filter((F.hour("ts") == hr) & half).agg(F.count("*").alias(name))
        out = cnt if out is None else out.crossJoin(cnt)
    return out


@register(
    "tpcds_q89",
    oracle="""
SELECT * FROM (
  SELECT p_type, p_brand, n_name, month(o_orderdate) AS moy,
         round(sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0, 2) AS sum_sales,
         round(avg(round(sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0, 2))
               OVER (PARTITION BY p_type, p_brand, n_name), 6) AS avg_monthly_sales
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE year(o_orderdate) = 1998
    AND ((p_type IN ('ECONOMY', 'MEDIUM', 'LARGE') AND p_size BETWEEN 1 AND 25)
      OR (p_type IN ('STANDARD', 'PROMO') AND p_size BETWEEN 26 AND 50))
  GROUP BY 1, 2, 3, 4
) tmp1
WHERE CASE WHEN avg_monthly_sales <> 0
           THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY round(sum_sales - avg_monthly_sales, 6), n_name, p_brand, p_type, moy
LIMIT 100
""",
    tags=("tpcds", "window"),
)
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89 shape (tpcds-q89.test): monthly (category, brand, store)
    sales vs their all-months average; keep months deviating >10%, ranked by
    shortfall."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1998)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type").isin("ECONOMY", "MEDIUM", "LARGE") & F.col("p_size").between(1, 25))
        | (F.col("p_type").isin("STANDARD", "PROMO") & F.col("p_size").between(26, 50))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_type", "p_brand", "n_name", F.month("o_orderdate").alias("moy"))
        .agg(
            # cents-summing: round each line to integer cents, sum exactly in
            # the 2^53 integer domain, then scale back — immune to the
            # half-boundary divergence of round(sum(double), 2) between
            # engines (see driver-contract rounding rules).
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
                )
                / 100.0,
                2,
            ).alias("sum_sales")
        )
    )
    w = Window.partitionBy("p_type", "p_brand", "n_name")
    # avg of exact-2dp values is a small rational — 6dp rounding is
    # boundary-free where 2dp would sit exactly on .xx5 halves.
    tmp1 = agg.select(
        "p_type", "p_brand", "n_name", "moy", "sum_sales",
        F.round(F.avg("sum_sales").over(w), 6).alias("avg_monthly_sales"),
    )
    dev = F.when(
        F.col("avg_monthly_sales") != 0,
        F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
        / F.col("avg_monthly_sales"),
    )
    return (
        tmp1.filter(dev > 0.1)
        .orderBy(
            F.round(F.col("sum_sales") - F.col("avg_monthly_sales"), 6),
            "n_name", "p_brand", "p_type", "moy",
        )
        .limit(100)
    )


@register(
    "tpcds_q96",
    oracle="""
SELECT count(*) AS total
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_type = 'ECONOMY' AND o_orderstatus = 'F' AND s_acctbal > 0
""",
    tags=("tpcds", "scalar", "join"),
)
def tpcds_q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q96 shape (tpcds-q96.test): plain COUNT(*) over a 4-way star
    with one filter per dimension."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .agg(F.count("*").alias("total"))
    )


@register(
    "tpcds_q98",
    oracle="""
SELECT p_partkey, p_name, p_type,
       CAST((ir_c4 + 50) // 100 AS BIGINT) AS itemrevenue_cents,
       CAST(ir_c4 * 10000 // sum(ir_c4) OVER (PARTITION BY p_type)
            AS BIGINT) AS revenueratio_bp
FROM (
  SELECT p_partkey, p_name, p_type,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS ir_c4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
    AND year(o_orderdate) = 1998 AND month(o_orderdate) = 1
  GROUP BY 1, 2, 3
) t
ORDER BY p_type, p_partkey
""",
    tags=("tpcds", "window"),
)
def tpcds_q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98 shape (tpcds-q98.test): per-item revenue plus its share of
    the item-class total (sum-over-aggregate window), one month of sales in
    three categories. Revenue accumulates as exact integer
    ten-thousandths and every rounding happens in INTEGER arithmetic
    before the single final division: the sf1 gate caught BOTH float
    forms — the double sum flipped a .005 boundary, and the
    integer-sum-then-round(x/10000.0, 2) form hit exact decimal ties
    (9342.425) where Spark's HALF_UP-on-shortest-repr rounds UP while
    DuckDB rounds the binary value DOWN. r07 closed the class structurally
    (driver red r06): itemrevenue_cents is half-up integer cents emitted
    as BIGINT — no double ever crosses the driver's %.6g hash boundary;
    the class share is integer basis points (floor div on both engines).
    The window sums BIGINTs, exact on both sides."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1998) & (F.month("o_orderdate") == 1)
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    t = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "p_type")
        .agg(F.sum(cents * (100 - disc_c)).alias("ir_c4"))
    )
    w = Window.partitionBy("p_type")
    return (
        t.select(
            "p_partkey", "p_name", "p_type", "ir_c4",
            F.sum("ir_c4").over(w).alias("__den"),
        )
        .select(
            "p_partkey", "p_name", "p_type",
            F.expr("(ir_c4 + 50) div 100").alias("itemrevenue_cents"),
            F.expr("(ir_c4 * 10000) div __den").alias("revenueratio_bp"),
        )
        .orderBy("p_type", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Write path: the reference TPC-H workload's 23rd file is a parquet-insert
# test (testdata/workloads/tpch/queries/insert_parquet.test: CREATE TABLE
# LIKE + INSERT OVERWRITE + verification SELECTs over the written table).
# ---------------------------------------------------------------------------
@register(
    "insert_parquet_roundtrip",
    oracle="""
SELECT CAST(count(*) AS BIGINT)                                  AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT)                AS n_orders,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            AS BIGINT)                                           AS sum_price_cents,
       CAST(count(DISTINCT l_returnflag) AS BIGINT)              AS n_flags,
       strftime(min(l_shipdate), '%Y-%m-%d')                     AS min_ship,
       strftime(max(l_shipdate), '%Y-%m-%d')                     AS max_ship
FROM lineitem
""",
    tags=("tpch", "write"),
)
def insert_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path benchmark (insert_parquet.test shape): INSERT OVERWRITE
    the full lineitem into a parquet table partitioned by l_returnflag
    (dynamic-partition overwrite — the Impala INSERT OVERWRITE semantics
    pinned in session confs), then verify by RE-READING the written files
    and aggregating: row count, distinct orders, exact money sum in
    integer cents, partition count, date range. The oracle computes the
    same aggregates from the source table — overwrite is an exact copy,
    so any write-path row loss/duplication/corruption breaks the hash
    match. Money stays integer cents on both sides; dates format to
    strings on both sides (driver-contract rules).

    Scale shape: partitionBy on a 3-value flag adds no shuffle (the
    writer sorts within tasks); the verification pass is one scan of the
    written files with a multi-distinct aggregate (Expand x2) — at 100 TB
    the write parallelism is the scan parallelism, the reference's
    HdfsTableSink per-node writer model (hdfs-table-sink.cc)."""
    import os
    import shutil
    import tempfile
    import time

    li = _t(spark, sf_dir, "lineitem")
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    # fixed path per (sf, pid): mode=overwrite makes re-runs idempotent
    # without accumulating lineitem copies across bench passes; stale
    # sibling dirs from dead processes are swept (same recipe as the IVF
    # snapshot dirs)
    prefix = "i2s_insert_parquet_"
    tmp = tempfile.gettempdir()
    for d in os.listdir(tmp):
        p = os.path.join(tmp, d)
        try:
            if (d.startswith(prefix) and os.path.isdir(p)
                    and time.time() - os.path.getmtime(p) > 3600):
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    out = os.path.join(tmp, f"{prefix}{sf_tag}_{os.getpid()}")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .alias("sum_price_cents"),
        F.countDistinct("l_returnflag").alias("n_flags"),
        _fmt_date(F.min("l_shipdate")).alias("min_ship"),
        _fmt_date(F.max("l_shipdate")).alias("max_ship"),
    )
