"""Relational operator coverage queries (SURVEY.md §2.4-§2.10): every join
flavor, window functions with ROWS/RANGE frames, set ops, subquery shapes,
and scalar-function batteries. Each has a DuckDB oracle unless inherently
approximate (then rows-only, noted in the docstring).

SQL-surface queries go through spark.sql() over registered temp views —
exercising the engine's SQL entry path (the reference's main entry,
SURVEY.md §3.1); DataFrame-API queries exercise the programmatic path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from impalatogo_spark.functions import group_concat, ndv, zeroifnull
from impalatogo_spark.queries import register
from impalatogo_spark.session import register_tables, table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(text)


# ===========================================================================
# Window / analytic functions (§2.6, AnalyticEvalNode be/src/exec/analytic-eval-node.cc)
# ===========================================================================

@register(
    "window_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER w AS rn
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number (BuiltinsDb.java:796-812). Order carries a
    unique tie-break so row_number is deterministic."""
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_orderkey, o_custkey,
       strftime(lag(o_orderdate)  OVER w, '%Y-%m-%d')    AS prev_date,
       strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d') AS next_date,
       round(lag(o_totalprice, 2, -1.0) OVER w, 2)       AS prev2_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offset and default (BuiltinsDb.java:847-867)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format(F.lag("o_orderdate").over(w), "yyyy-MM-dd").alias("prev_date"),
        F.date_format(F.lead("o_orderdate", 1).over(w), "yyyy-MM-dd").alias("next_date"),
        F.round(F.lag("o_totalprice", 2, -1.0).over(w), 2).alias("prev2_price"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey)  OVER w AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an explicit full frame (BuiltinsDb.java:822-840;
    frame semantics fe/.../analysis/AnalyticWindow.java:35-94)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
    )


@register(
    "window_running_sum",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total,
       count(*) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
FROM orders
""",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-window with ROWS frame (any agg OVER(...),
    fe/.../analysis/AnalyticExpr.java)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count("*").over(w).alias("running_cnt"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT p_partkey, p_brand, p_size,
       round(sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_size
                                      RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
           AS nearby_price
FROM part
""",
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with numeric offsets (AnalyticWindow.java RANGE support)."""
    w = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, W.currentRow)
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.sum("p_retailprice").over(w), 2).alias("nearby_price"),
    )


@register(
    "window_moving_avg",
    oracle="""
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING), 4) AS mov_avg
FROM events
""",
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (n PRECEDING / m FOLLOWING)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 1)
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    )


# ===========================================================================
# Joins (§2.4) — full/right outer, cross/theta, null-aware anti via SQL
# ===========================================================================

@register(
    "join_full_outer",
    oracle="""
SELECT c.c_custkey, o.o_orderkey
FROM (SELECT * FROM customer WHERE c_acctbal < -500) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01') o
  ON c.c_custkey = o.o_custkey
""",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN with unmatched rows on both sides (grammar
    sql-parser.y:1888-1905)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -500)
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_right_outer",
    oracle="""
SELECT s_suppkey, s_name, n_nationkey
FROM (SELECT * FROM supplier WHERE s_acctbal > 5000) supplier
RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
""",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER JOIN preserving all nations."""
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    n = _t(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right_outer").select(
        "s_suppkey", "s_name", "n_nationkey"
    )


@register(
    "join_cross_theta",
    oracle="""
SELECT a.n_nationkey AS nk1, b.n_nationkey AS nk2
FROM nation a, nation b
WHERE a.n_nationkey < b.n_nationkey AND a.n_regionkey = b.n_regionkey
""",
    tags=("join",),
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join = cross join + non-equi conjunct — the reference's ONLY
    non-equi join strategy (CrossJoinNode + SelectNode,
    be/src/exec/cross-join-node.cc:169). Spark plans BroadcastNestedLoopJoin
    for the pure inequality; the equi conjunct upgrades it to a hash join."""
    a = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")
    )
    b = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    return (
        a.join(b, (F.col("nk1") < F.col("nk2")) & (F.col("rk1") == F.col("rk2")))
        .select("nk1", "nk2")
    )


@register(
    "join_null_aware_anti",
    oracle="""
SELECT c_custkey, c_nationkey
FROM customer
WHERE nullif(c_nationkey, 3) NOT IN
      (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
""",
    tags=("join", "subquery"),
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a nullable expression -> Spark plans a null-aware anti
    join, the reference's NULL_AWARE_LEFT_ANTI_JOIN
    (common/thrift/PlanNodes.thrift:156-169). Rows where the outer expression
    is NULL are excluded — the semantics legacy engines get wrong with a
    plain anti join. Routed through spark.sql() to exercise the SQL rewrite
    path (StmtRewriter.java:110-301 equivalent)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_nationkey
        FROM customer
        WHERE nullif(c_nationkey, 3) NOT IN
              (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        """,
    )


@register(
    "join_left_semi_sql",
    oracle="""
SELECT n_nationkey, n_name FROM nation
WHERE n_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
""",
    tags=("join", "subquery"),
)
def join_left_semi_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery -> LEFT SEMI JOIN via the SQL path."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
        """,
    )


# ===========================================================================
# Set operations (§2.8 — UNION [ALL|DISTINCT] only; no INTERSECT/EXCEPT)
# ===========================================================================

@register(
    "union_all",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier WHERE s_acctbal > 9000
""",
    tags=("setop",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (UnionNode, be/src/exec/union-node.cc)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionAll(s)


@register(
    "union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — planned as union-all + aggregation, exactly the
    reference's rewrite (fe/.../analysis/UnionStmt.java)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "values_inline",
    oracle="""
SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, NULL)) AS t(id, name)
""",
    tags=("setop", "scan"),
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES literal rows (grammar sql-parser.y:1597-1612) -> LocalRelation."""
    return _sql(
        spark, sf_dir, "SELECT * FROM VALUES (1, 'one'), (2, 'two'), (3, CAST(NULL AS STRING)) AS t(id, name)"
    )


# ===========================================================================
# Aggregates (§2.5): distinct, stats family, group_concat, median, ndv
# ===========================================================================

@register(
    "agg_distinct_multi",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey)  AS n_supp,
       count(DISTINCT l_partkey)  AS n_part,
       count(*)                   AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregation", "distinct"),
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one agg — the reference's 2-phase distinct
    plan (DistributedPlanner.java:754-787); Spark's RewriteDistinctAggregates
    handles the multi-distinct expansion."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_stats_family",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_samp,
       round(stddev_pop(l_quantity), 4)  AS sd_pop,
       round(var_samp(l_quantity), 4)    AS v_samp,
       round(var_pop(l_quantity), 4)     AS v_pop
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("aggregation",),
)
def agg_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance family (Knuth online variance,
    aggregate-functions.cc:1075-1097; BuiltinsDb.java:636-692)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_samp"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sd_pop"),
            F.round(F.var_samp("l_quantity"), 4).alias("v_samp"),
            F.round(F.var_pop("l_quantity"), 4).alias("v_pop"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_variance_aliases",
    oracle="""
SELECT l_returnflag,
       round(var_pop(l_quantity), 4)  AS v_pop,
       round(var_samp(l_quantity), 4) AS v_samp,
       round(var_samp(l_tax), 4)      AS v_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("aggregation", "dialect"),
)
def agg_variance_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala's long-form variance aliases variance_pop/variance_samp
    (BuiltinsDb.java:650-692), entered as IMPALA-DIALECT SQL — Spark only
    spells var_pop/var_samp, so the translator must rewrite
    (functions/registry.py IMPALA_SQL_FUNCTION_REWRITES)."""
    from impalatogo_spark.dialect import translate

    register_tables(spark, sf_dir)
    return spark.sql(translate("""
SELECT l_returnflag,
       round(variance_pop(l_quantity), 4)  AS v_pop,
       round(variance_samp(l_quantity), 4) AS v_samp,
       round(variance_samp(l_tax), 4)      AS v_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""))


@register(
    "agg_avg_timestamp",
    oracle="""
SELECT event_type,
       strftime(make_timestamp(CAST(sum(epoch_us(ts)) // count(ts) AS BIGINT)),
                '%Y-%m-%d %H:%M:%S.%f') AS avg_ts,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("aggregation", "date"),
)
def agg_avg_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala avg(TIMESTAMP) (BuiltinsDb.java:759-768) via the
    avg_timestamp registry shim: exact integer mean of epoch-microseconds
    (decimal sum — overflow-proof and partition-order-deterministic, unlike
    the reference's double accumulation; see registry docstring). Formatted
    to a string on both sides per the driver-compare rules."""
    from impalatogo_spark.functions.registry import avg_timestamp

    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.date_format(
                avg_timestamp("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("avg_ts"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_group_concat",
    oracle="""
SELECT n_regionkey, string_agg(n_name, ', ' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    tags=("aggregation",),
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_concat (BuiltinsDb.java:771-782) as sorted collect_list —
    deterministic variant (the reference's order is nondeterministic)."""
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(group_concat("n_name", ", ").alias("nations"))
        .orderBy("n_regionkey")
    )


@register(
    "agg_median_exact",
    oracle="""
SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("aggregation",),
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (Spark `percentile` == DuckDB quantile_cont).
    The reference's appx_median (reservoir sample) is the approximate cousin —
    see agg_ndv_appx for the approximate-family policy."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_ndv_appx",
    oracle=None,  # HLL++ constants differ between Spark and DuckDB; bounded-error test in tests/test_functions.py
    tags=("aggregation", "approx"),
)
def agg_ndv_appx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala ndv()/appx_count_distinct (HLL, aggregate-functions.cc:994-1013)
    -> approx_count_distinct. Rows-only here; the accuracy bound (<=5% rsd vs
    exact) is asserted in tests/test_functions.py::test_ndv_error_bound."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        ndv("l_partkey").alias("ndv_partkey"),
        F.countDistinct("l_partkey").alias("exact_partkey"),
    ).orderBy("l_returnflag")


@register(
    "select_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2",
    tags=("distinct",),
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT = group-by-all sugar (fe/.../analysis/SelectStmt.java)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# ===========================================================================
# Sorts / limits (§2.7)
# ===========================================================================

@register(
    "order_nulls_last",
    oracle="""
SELECT c_custkey, nullif(c_nationkey, 5) AS nk
FROM customer
ORDER BY nk ASC NULLS LAST, c_custkey
LIMIT 40
""",
    tags=("sort",),
)
def order_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala ORDER BY default: ASC -> NULLS LAST (OrderByElement.java), which
    differs from Spark's ASC NULLS FIRST default — the shim is explicit
    asc_nulls_last. LIMIT makes the ordering observable to the oracle."""
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", F.nullif(F.col("c_nationkey"), F.lit(5)).alias("nk"))
        .orderBy(F.asc_nulls_last("nk"), F.asc("c_custkey"))
        .limit(40)
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 10
""",
    tags=("sort",),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET with deterministic order (grammar sql-parser.y:2042-2060)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .offset(10)
        .limit(15)
    )


@register(
    "agg_empty_input",
    oracle="""
SELECT count(*) AS n, count(l_quantity) AS n_q,
       sum(l_quantity) AS s, min(l_shipdate) AS mn, max(l_shipdate) AS mx,
       avg(l_extendedprice) AS a
FROM lineitem WHERE l_orderkey < 0
""",
    tags=("aggregation",),
)
def agg_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over empty input (QueryTest/empty.test): ungrouped agg
    yields exactly one row — count 0, everything else NULL. The planner path
    matters: the filter folds to an empty relation and the aggregate must
    still emit its initial values."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 0)
        .agg(
            F.count("*").alias("n"),
            F.count("l_quantity").alias("n_q"),
            F.sum("l_quantity").alias("s"),
            F.min("l_shipdate").alias("mn"),
            F.max("l_shipdate").alias("mx"),
            F.avg("l_extendedprice").alias("a"),
        )
    )


@register(
    "inline_view_limit",
    oracle="""
SELECT v.o_custkey, count(*) AS n,
       CAST(sum(CAST(round(v.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS tp_cents
FROM (SELECT o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100) v
GROUP BY v.o_custkey
ORDER BY tp_cents DESC, v.o_custkey
LIMIT 20
""",
    tags=("sort", "subquery"),
)
def inline_view_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT inside an inline view (QueryTest/inline-view-limit.test): the
    inner TopN must execute before the outer aggregation — the limit is a
    semantic boundary Catalyst cannot push through, and the inner ORDER BY
    carries a full tie-break so the surviving row set is deterministic.
    Money summed as integer cents (repo rounding policy)."""
    inner = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
    return (
        inner.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "tp_cents"
            ),
        )
        .orderBy(F.desc("tp_cents"), "o_custkey")
        .limit(20)
    )


@register(
    "join_skew_salted",
    oracle="""
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= 45
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("join", "scale"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-salting utility under the full correctness gate: salting is
    semantics-preserving, so the oracle is the PLAIN join — any salt-key
    leakage, dropped row, or duplicate from the replicate-and-spread
    machinery (operators/scale.py::salted_join) breaks value equality."""
    from impalatogo_spark.operators.scale import salted_join

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45).select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "k", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "having_filter",
    oracle="""
SELECT l_suppkey, count(*) AS cnt
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 550
ORDER BY cnt DESC, l_suppkey
""",
    tags=("aggregation",),
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 550)
        .orderBy(F.desc("cnt"), "l_suppkey")
    )


# ===========================================================================
# Subquery shapes (§4.1 StmtRewriter coverage) via the SQL path
# ===========================================================================

@register(
    "subquery_scalar_where",
    oracle="""
SELECT p_partkey, round(p_retailprice, 2) AS price
FROM part
WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.005 FROM part)
ORDER BY p_partkey
""",
    tags=("subquery",),
)
def subquery_scalar_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, round(p_retailprice, 2) AS price
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.005 FROM part)
        ORDER BY p_partkey
        """,
    )


@register(
    "subquery_correlated_exists",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_quantity >= 50)
ORDER BY s_suppkey
""",
    tags=("subquery",),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS -> semi join (StmtRewriter.java:110-301 equivalent)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 50)
        ORDER BY s_suppkey
        """,
    )


@register(
    "subquery_not_exists",
    oracle="""
SELECT p.p_partkey, p.p_name
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p.p_partkey AND l_quantity > 48)
ORDER BY p.p_partkey
""",
    tags=("subquery",),
)
def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS -> anti join."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p.p_partkey, p.p_name
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p.p_partkey AND l_quantity > 48)
        ORDER BY p.p_partkey
        """,
    )


@register(
    "with_cte",
    oracle="""
WITH big_orders AS (
  SELECT o_custkey, count(*) AS n FROM orders
  WHERE o_totalprice > 50000 GROUP BY o_custkey
)
SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS big_order_cnt
FROM customer JOIN big_orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    tags=("subquery",),
)
def with_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH clause / inline view (grammar sql-parser.y WITH support)."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH big_orders AS (
          SELECT o_custkey, count(*) AS n FROM orders
          WHERE o_totalprice > 50000 GROUP BY o_custkey
        )
        SELECT c_mktsegment, sum(n) AS big_order_cnt
        FROM customer JOIN big_orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
    )


# ===========================================================================
# Scalar-function batteries (§2.10, common/function-registry/impala_functions.py)
# Each battery pairs Spark built-ins with DuckDB equivalents; semantic
# mismatches (dayofweek origin, cast truncation, fmod) are normalized in the
# ORACLE so the Spark side stays the Impala-faithful form.
# ===========================================================================

@register(
    "func_string",
    oracle="""
SELECT p_partkey,
       substr(p_name, 1, 4)                                  AS sub4,
       upper(p_name)                                         AS up,
       lower(p_brand)                                        AS lo,
       length(p_name)                                        AS len,
       lpad(p_brand, 12, '*')                                AS lp,
       rpad(p_brand, 12, '#')                                AS rp,
       reverse(p_name)                                       AS rev,
       translate(p_name, 'aeiou', 'AEIOU')                   AS tr,
       strpos(p_name, 'a')                                   AS pos_a,
       concat_ws('-', p_brand, p_type)                       AS cw,
       repeat('x', p_size % 3)                               AS rep,
       ascii(substr(p_name, 1, 1))                           AS asc1,
       upper(substr(lower(p_brand), 1, 1)) || substr(lower(p_brand), 2) AS icap,
       trim(concat('  ', p_type, '  '))                      AS trm,
       substr(p_name, 1, 3)                                  AS sleft,
       substr(p_name, -3, 3)                                 AS sright
FROM part
""",
    tags=("functions", "string"),
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery (impala_functions.py:371-417): substr/upper/lower/
    length/lpad/rpad/reverse/translate/instr/concat_ws/repeat/ascii/initcap/
    trim + strleft/strright shims. Impala 1-indexed substr preserved."""
    from impalatogo_spark.functions import strleft, strright

    p = _t(spark, sf_dir, "part")
    name, brand = F.col("p_name"), F.col("p_brand")
    return p.select(
        "p_partkey",
        F.substring(name, 1, 4).alias("sub4"),
        F.upper(name).alias("up"),
        F.lower(brand).alias("lo"),
        F.length(name).alias("len"),
        F.lpad(brand, 12, "*").alias("lp"),
        F.rpad(brand, 12, "#").alias("rp"),
        F.reverse(name).alias("rev"),
        F.translate(name, "aeiou", "AEIOU").alias("tr"),
        F.instr(name, "a").alias("pos_a"),
        F.concat_ws("-", brand, F.col("p_type")).alias("cw"),
        F.repeat(F.lit("x"), (F.col("p_size") % 3)).alias("rep"),
        F.ascii(F.substring(name, 1, 1)).alias("asc1"),
        F.initcap(F.lower(brand)).alias("icap"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("trm"),
        strleft(name, 3).alias("sleft"),
        strright(name, 3).alias("sright"),
    )


@register(
    "func_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                    AS ab,
       sign(l_discount - 0.05)                   AS sg,
       ceil(l_extendedprice / 1000)              AS ce,
       floor(l_extendedprice / 1000)             AS fl,
       floor(l_extendedprice / 7 * 10) / 10      AS rnd,
       round(exp(l_discount), 6)                 AS ex,
       round(ln(l_extendedprice), 6)             AS lnv,
       round(log10(l_extendedprice), 6)          AS lg10,
       round(log2(l_quantity), 6)                AS lg2,
       round(sqrt(l_quantity), 6)                AS sq,
       round(pow(l_tax, 2), 6)                   AS pw,
       ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS pm,
       greatest(l_quantity, 25.0)                AS gr,
       least(l_quantity, 25.0)                   AS le,
       round(sin(l_discount), 6)                 AS sn,
       round(degrees(l_discount), 6)             AS dg
FROM lineitem
WHERE l_orderkey <= 500
""",
    tags=("functions", "math"),
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (impala_functions.py:227-344). pmod expressed natively in
    Spark; the oracle normalizes DuckDB's sign-of-dividend % to positive-mod."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        F.ceil(price / 1000).alias("ce"),
        F.floor(price / 1000).alias("fl"),
        (F.floor(price / 7 * 10) / 10).alias("rnd"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log(price), 6).alias("lnv"),
        F.round(F.log10(price), 6).alias("lg10"),
        F.round(F.log2("l_quantity"), 6).alias("lg2"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.pow("l_tax", F.lit(2)), 6).alias("pw"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("pm"),
        F.greatest("l_quantity", F.lit(25.0)).alias("gr"),
        F.least("l_quantity", F.lit(25.0)).alias("le"),
        F.round(F.sin("l_discount"), 6).alias("sn"),
        F.round(F.degrees("l_discount"), 6).alias("dg"),
    )


@register(
    "func_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                                         AS yr,
       month(o_orderdate)                                        AS mo,
       day(o_orderdate)                                          AS dy,
       dayofweek(o_orderdate) + 1                                AS dw,
       dayofyear(o_orderdate)                                    AS doy,
       weekofyear(o_orderdate)                                   AS woy,
       quarter(o_orderdate)                                      AS qt,
       CAST(epoch(o_orderdate) AS BIGINT)                        AS ep,
       date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')     AS dd,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')       AS plus30,
       strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d')      AS plus2m,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')    AS mstart,
       strftime(last_day(o_orderdate), '%Y-%m-%d')               AS mend,
       extract(month FROM o_orderdate)                           AS exm
FROM orders
WHERE o_orderkey <= 500
""",
    tags=("functions", "date"),
)
def func_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp/date battery (impala_functions.py:110-223): extract family,
    INTERVAL arithmetic (TimestampArithmeticExpr, sql-parser.y:2262-2297),
    trunc, datediff, unix_timestamp. Oracle normalizes DuckDB's 0-based
    dayofweek to Impala/Spark's 1-based (Sunday=1)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.dayofweek(d).alias("dw"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("woy"),
        F.quarter(d).alias("qt"),
        F.unix_timestamp(d).alias("ep"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), d).alias("dd"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2m"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("mstart"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("mend"),
        F.month(d).alias("exm"),
    )


@register(
    "func_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END                                    AS tier,
       CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2
            ELSE 0 END                                         AS seg_code,
       CASE WHEN c_acctbal > 0 THEN round(c_acctbal, 2) ELSE 0.0 END AS pos_bal,
       nullif(c_nationkey, 0)                                  AS nk_nz,
       coalesce(nullif(c_nationkey, 0), -1)                    AS nk_co,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT')   AS seg_nvl,
       (c_acctbal IS NULL)                                     AS is_n,
       (c_acctbal IS NOT NULL)                                 AS is_nn
FROM customer
""",
    tags=("functions", "conditional"),
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional battery (impala_functions.py:422-485, conditional-functions.cc):
    searched+simple CASE, if(), nullif, coalesce/nvl/isnull, zeroifnull-style,
    IS [NOT] NULL."""
    from impalatogo_spark.functions import isnull

    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("tier"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "MACHINERY", 2)
        .otherwise(0)
        .alias("seg_code"),
        F.when(bal > 0, F.round(bal, 2)).otherwise(0.0).alias("pos_bal"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nz"),
        isnull(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias("nk_co"),
        isnull(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_nvl"
        ),
        bal.isNull().alias("is_n"),
        bal.isNotNull().alias("is_nn"),
    )


@register(
    "func_cast",
    oracle="""
SELECT l_orderkey,
       CAST(trunc(l_extendedprice) AS BIGINT)     AS d2l,
       CAST(trunc(l_quantity) AS INTEGER)         AS d2i,
       CAST(l_linenumber AS DOUBLE)               AS i2d,
       CAST(l_orderkey AS VARCHAR)                AS l2s,
       try_cast(l_returnflag AS INTEGER)          AS bad_cast,
       CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) AS q2s,
       CAST('123' AS BIGINT)                      AS s2l,
       CAST(strftime(l_shipdate, '%Y-%m-%d') AS VARCHAR) AS ts2s
FROM lineitem
WHERE l_orderkey <= 300
""",
    tags=("functions", "cast"),
)
def func_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast battery (be/src/exprs/cast-functions.cc; lattice TypesUtil.java).
    Impala semantics pinned: double->int TRUNCATES (oracle mirrors with
    trunc(); DuckDB's bare cast would round), garbage string->int -> NULL
    (ANSI off; oracle mirrors with try_cast)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        F.col("l_extendedprice").cast("long").alias("d2l"),
        F.col("l_quantity").cast("int").alias("d2i"),
        F.col("l_linenumber").cast("double").alias("i2d"),
        F.col("l_orderkey").cast("string").alias("l2s"),
        F.col("l_returnflag").cast("int").alias("bad_cast"),
        F.col("l_quantity").cast("int").cast("string").alias("q2s"),
        F.lit("123").cast("long").alias("s2l"),
        F.date_format("l_shipdate", "yyyy-MM-dd").cast("string").alias("ts2s"),
    )


@register(
    "func_regexp",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, 'Customer#(\\d+)', 1)      AS cust_num,
       regexp_replace(c_name, '\\d', '', 'g')             AS no_digits,
       regexp_matches(c_name, '^Customer#0*1')            AS starts_1,
       (c_name LIKE 'Customer#%')                         AS like_pre,
       (c_name LIKE '%42%')                               AS like_in
FROM customer
WHERE c_custkey <= 300
""",
    tags=("functions", "regexp"),
)
def func_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE/RLIKE/regexp battery (be/src/exprs/like-predicate.h:20-74).
    Patterns restricted to the RE2-and-Java-common subset (SURVEY.md §7 risk:
    dialect divergence) — \\d classes, anchors, literal alternation only."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.regexp_extract(name, r"Customer#(\d+)", 1).alias("cust_num"),
        F.regexp_replace(name, r"\d", "").alias("no_digits"),
        name.rlike(r"^Customer#0*1").alias("starts_1"),
        name.like("Customer#%").alias("like_pre"),
        name.like("%42%").alias("like_in"),
    )


# ===========================================================================
# AMPLab big-data benchmark shapes (reference workload:
# testdata/workloads/hive-benchmark/queries/hive-benchmark.test — GREP scan,
# rankings scan+topk, uservisits join+agg) adapted to documents/events.
# ===========================================================================

@register(
    "amplab_grep",
    oracle="""
SELECT doc_id, n_chars FROM documents
WHERE text LIKE '%batch batch%'
ORDER BY doc_id
""",
    tags=("amplab", "scan"),
)
def amplab_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREP: full-scan LIKE filter (hive-benchmark.test GREP1GB Q1)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").like("%batch batch%"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "amplab_rankings",
    oracle="""
SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n
FROM events
WHERE event_type = 'view'
GROUP BY user_id
HAVING sum(value) > 0
ORDER BY total_value DESC, user_id
LIMIT 25
""",
    tags=("amplab", "topn"),
)
def amplab_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rankings: scan+agg+top-k (hive-benchmark WEB_Q1 shape)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total_value"), F.count("*").alias("n"))
        .filter(F.col("total_value") > 0)
        .orderBy(F.desc("total_value"), "user_id")
        .limit(25)
    )


@register(
    "amplab_uservisits_join",
    oracle="""
SELECT c_mktsegment,
       round(sum(e.value), 2)        AS revenue,
       count(DISTINCT e.user_id)     AS buyers
FROM events e
JOIN customer ON e.user_id = c_custkey
WHERE e.event_type = 'purchase'
GROUP BY c_mktsegment
ORDER BY revenue DESC, c_mktsegment
""",
    tags=("amplab", "join"),
)
def amplab_uservisits_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UserVisits x Rankings join+agg (hive-benchmark WEB_Q3 shape):
    fact-events joined to the customer dim on user key."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer")
    return (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("value"), 2).alias("revenue"),
            F.countDistinct("user_id").alias("buyers"),
        )
        .orderBy(F.desc("revenue"), "c_mktsegment")
    )


# ===========================================================================
# DECIMAL semantics (§1.2: DECIMAL(p,s) storage tiers, decimal-value.h:33-40;
# arithmetic result types decimal-operators.cc)
# ===========================================================================

@register(
    "func_decimal",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DECIMAL(12,2))                          AS dec_price,
       CAST(l_extendedprice AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(6,3)) AS dec_add,
       CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,3)) AS dec_mul,
       round(CAST(l_extendedprice AS DECIMAL(12,2)) / 7, 4)            AS dec_div,
       CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) OVER (PARTITION BY l_orderkey) AS DECIMAL(14,2)) AS dec_sum
FROM lineitem
WHERE l_orderkey <= 200
""",
    tags=("functions", "decimal"),
)
def func_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL battery: cast tiers, +, *, /, windowed sum. Result p/s rules
    differ between engines (Spark vs DuckDB widening) but VALUES are equal —
    the compare normalizes Decimal->float. Impala's own rules
    (fe/.../analysis/TypesUtil.java) match neither engine exactly; SURVEY §7
    documents this as an accepted divergence pinned here by value."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price.alias("dec_price"),
        (price + F.col("l_tax").cast("decimal(6,3)")).alias("dec_add"),
        (price * F.col("l_discount").cast("decimal(6,3)")).alias("dec_mul"),
        F.round(price / 7, 4).alias("dec_div"),
        F.sum(F.col("l_quantity").cast("decimal(10,2)"))
        .over(W.partitionBy("l_orderkey"))
        .cast("decimal(14,2)")
        .alias("dec_sum"),
    )


@register(
    "agg_histogram",
    oracle="""
SELECT CAST(least(floor((l_extendedprice - 900) / 5000), 19) AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM lineitem
GROUP BY 1
ORDER BY bucket
""",
    tags=("aggregation",),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram — the deterministic equivalent of Impala's
    `histogram()` reservoir aggregate (aggregate-functions.cc:723-858, which
    is sampling-based and nondeterministic; the reference's own tests use
    tolerance predicates). Fixed bucket arithmetic is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - 900) / 5000), F.lit(19)
    ).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "sample_reservoir",
    oracle=None,  # sampling is engine-specific; determinism asserted in tests
    tags=("aggregation", "approx"),
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala `sample()` reservoir aggregate equivalent: seeded TABLESAMPLE.
    Engine-specific sample selection -> rows-only at the driver; determinism
    (same seed => same rows) asserted in tests/test_functions.py."""
    li = _t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.01, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "join_null_aware_anti_subnull",
    oracle="""
SELECT count(*) AS n
FROM customer
WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 5) FROM nation WHERE n_regionkey <= 1)
""",
    tags=("join", "subquery"),
)
def join_null_aware_anti_subnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULL in the SUBQUERY side: per three-valued logic the
    whole result is empty (x NOT IN (..., NULL) is never TRUE). The
    null-aware anti join must honor this; a naive anti join would not.
    Reference: NULL_AWARE_LEFT_ANTI_JOIN (PlanNodes.thrift:156-169)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT count(*) AS n
        FROM customer
        WHERE c_nationkey NOT IN
              (SELECT nullif(n_nationkey, 5) FROM nation WHERE n_regionkey <= 1)
        """,
    )


@register(
    "func_url",
    oracle="""
SELECT p_partkey,
       regexp_extract(url, '^([a-z]+):', 1)                 AS proto,
       regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)       AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1)                 AS query,
       regexp_extract(url, '[?&]brand=([^&#]*)', 1)         AS brand_param,
       coalesce(list_position(string_split('ECONOMY,MEDIUM,STANDARD,PROMO', ','),
                              p_type), 0)                   AS type_pos
FROM (
  SELECT p_partkey, p_type,
         concat('https://', lower(p_type), '.example.com/parts/',
                CAST(p_partkey AS VARCHAR),
                '?brand=', replace(p_brand, '#', '-'),
                '&size=', CAST(p_size AS VARCHAR)) AS url
  FROM part
) t
ORDER BY p_partkey
LIMIT 200
""",
    tags=("functions", "string"),
)
def func_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url + find_in_set battery (impala_functions.py:414-417 parse_url,
    :390 find_in_set; be/src/exprs/string-functions.cc ParseUrl/FindInSet).
    Spark has both natively; the DuckDB oracle emulates parse_url with
    regexp_extract and find_in_set with list_position (0 when absent, as
    Impala/Spark return 0)."""
    p = _t(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://"), F.lower("p_type"), F.lit(".example.com/parts/"),
        F.col("p_partkey").cast("string"),
        F.lit("?brand="), F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")),
        F.lit("&size="), F.col("p_size").cast("string"),
    )
    t = p.select("p_partkey", "p_type", url.alias("url"))
    return (
        t.select(
            "p_partkey",
            F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("brand")).alias("brand_param"),
            F.expr("find_in_set(p_type, 'ECONOMY,MEDIUM,STANDARD,PROMO')").alias(
                "type_pos"
            ),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@register(
    "amplab_web_range_count",
    oracle="""
SELECT count(*) AS n
FROM events
WHERE value > 10 AND value < 25
""",
    tags=("amplab", "scan"),
)
def amplab_web_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab WEB_Q4 (hive-benchmark.test): COUNT(*) under a numeric range
    predicate. The reference spells the conjunction with the Impala-ism
    `&&` (rewritten to AND by the dialect translator, tests/test_dialect.py)."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("value") > 10) & (F.col("value") < 25))
        .agg(F.count("*").alias("n"))
    )


@register(
    "amplab_web_avg",
    oracle="""
SELECT round(avg(value), 4) AS avg_all,
       round(avg(CASE WHEN ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
                      THEN value END), 4) AS avg_window
FROM events
""",
    tags=("amplab", "agg"),
)
def amplab_web_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab WEB_Q5/WEB_Q6 (hive-benchmark.test): global scalar AVG and the
    same AVG restricted to a date window, both in one scan via conditional
    aggregation (two scans in the reference)."""
    ev = _t(spark, sf_dir, "events")
    in_win = (F.col("ts") >= F.lit("2024-01-08").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-22").cast("timestamp")
    )
    return ev.agg(
        F.round(F.avg("value"), 4).alias("avg_all"),
        F.round(F.avg(F.when(in_win, F.col("value"))), 4).alias("avg_window"),
    )


@register(
    "func_date_arith",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 2 YEAR,     '%Y-%m-%d %H:%M:%S') AS y2,
       strftime(o_orderdate - INTERVAL 3 MONTH,    '%Y-%m-%d %H:%M:%S') AS m3,
       strftime(o_orderdate + INTERVAL 5 WEEK,     '%Y-%m-%d %H:%M:%S') AS w5,
       strftime(o_orderdate + INTERVAL 45 DAY,     '%Y-%m-%d %H:%M:%S') AS d45,
       strftime(o_orderdate - INTERVAL 7 HOUR,     '%Y-%m-%d %H:%M:%S') AS h7,
       strftime(o_orderdate + INTERVAL 90 MINUTE,  '%Y-%m-%d %H:%M:%S') AS mi90,
       strftime(o_orderdate + INTERVAL 3605 SECOND,'%Y-%m-%d %H:%M:%S') AS s3605,
       strftime(o_orderdate + INTERVAL 1500 MILLISECOND,
                '%Y-%m-%d %H:%M:%S.%f') AS ms1500,
       dayname(o_orderdate) AS dn,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS tq,
       strftime(date_trunc('week', o_orderdate),    '%Y-%m-%d') AS twk,
       strftime(CAST(date_trunc('year', o_orderdate) AS DATE)
                + INTERVAL (7 * ((CAST(o_orderdate AS DATE)
                   - CAST(date_trunc('year', o_orderdate) AS DATE)) // 7)) DAY,
                '%Y-%m-%d') AS tww,
       strftime(CAST(date_trunc('month', o_orderdate) AS DATE)
                + INTERVAL (7 * ((CAST(o_orderdate AS DATE)
                   - CAST(date_trunc('month', o_orderdate) AS DATE)) // 7)) DAY,
                '%Y-%m-%d') AS tw
FROM orders WHERE o_orderkey <= 400
""",
    tags=("functions", "date"),
)
def func_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala timestamp-arithmetic family (impala_functions.py:122-215):
    years/months/weeks/days/hours/minutes/seconds/milliseconds _add/_sub +
    dayname (:121), entered as IMPALA-DIALECT SQL through the translator
    (functions/registry.py interval rewrites) — proving the SQL surface
    end-to-end, not just the Column API. All forms return TIMESTAMP in
    Impala (unlike Spark's own DATE-returning date_add; dialect wins)."""
    from impalatogo_spark.dialect import translate

    register_tables(spark, sf_dir)
    return spark.sql(translate("""
SELECT o_orderkey,
       date_format(years_add(o_orderdate, 2),      'yyyy-MM-dd HH:mm:ss') AS y2,
       date_format(months_sub(o_orderdate, 3),     'yyyy-MM-dd HH:mm:ss') AS m3,
       date_format(weeks_add(o_orderdate, 5),      'yyyy-MM-dd HH:mm:ss') AS w5,
       date_format(date_add(o_orderdate, 45),      'yyyy-MM-dd HH:mm:ss') AS d45,
       date_format(hours_sub(o_orderdate, 7),      'yyyy-MM-dd HH:mm:ss') AS h7,
       date_format(minutes_add(o_orderdate, 90),   'yyyy-MM-dd HH:mm:ss') AS mi90,
       date_format(seconds_add(o_orderdate, 3605), 'yyyy-MM-dd HH:mm:ss') AS s3605,
       date_format(milliseconds_add(o_orderdate, 1500),
                   'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ms1500,
       dayname(o_orderdate) AS dn,
       date_format(trunc(o_orderdate, 'Q'),   'yyyy-MM-dd') AS tq,
       date_format(trunc(o_orderdate, 'DAY'), 'yyyy-MM-dd') AS twk,
       date_format(trunc(o_orderdate, 'WW'),  'yyyy-MM-dd') AS tww,
       date_format(trunc(o_orderdate, 'W'),   'yyyy-MM-dd') AS tw
FROM orders WHERE o_orderkey <= 400
"""))


@register(
    "func_base_conv",
    oracle="""
SELECT l_orderkey, l_linenumber,
       bin(CAST(l_orderkey AS BIGINT))                      AS bn,
       hex(CAST(l_orderkey AS BIGINT))                      AS hx,
       hex(l_returnflag)                                    AS hxs,
       decode(unhex(hex(l_returnflag)))                     AS uh,
       CAST(l_orderkey AS VARCHAR)                          AS cv,
       CAST(round(l_extendedprice * 100) AS BIGINT) % 730   AS fm_cents,
       l_orderkey // 7                                      AS qt
FROM lineitem WHERE l_orderkey <= 500
""",
    tags=("functions", "math"),
)
def func_base_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base-conversion + modulus subfamily (impala_functions.py:227-344):
    bin, hex (bigint + string), unhex roundtrip, conv (16->10 roundtrip,
    oracle side is the decimal string itself — DuckDB has no conv()),
    fmod over exact integer cents (for 2-decimal data, price mod 7.3 ==
    (cents mod 730)/100 exactly; the DOUBLE form diverges between
    engines at near-multiple boundaries — DuckDB's fmod(34594.7, 7.3)
    returns 0.0 where Spark's % returns 7.29999..., found by the sf1
    gate — and double fmod sign semantics stay pinned in pytest),
    quotient (truncating integer DIV)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    key = F.col("l_orderkey").cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.bin(key).alias("bn"),
        F.hex(key).alias("hx"),
        F.hex(F.col("l_returnflag")).alias("hxs"),
        F.decode(F.unhex(F.hex(F.col("l_returnflag"))), "UTF-8").alias("uh"),
        F.conv(F.hex(key), 16, 10).alias("cv"),
        (F.round(F.col("l_extendedprice") * 100).cast("long") % 730)
        .alias("fm_cents"),
        F.expr("CAST(l_orderkey AS BIGINT) DIV 7").alias("qt"),
    )


@register(
    "perf_agg_highcard",
    oracle="""
SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, count(*) AS n,
       min(l_linenumber) AS mn, max(l_quantity) AS mx,
       round(sum(l_tax), 4) AS st
FROM lineitem GROUP BY 1
""",
    tags=("perf", "agg"),
)
def perf_agg_highcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """targeted-perf PERF_AGG-Q1/Q3 (aggregation.test): mixed-type
    aggregates over a HIGH-cardinality group key (~2400 date groups vs
    tpch_q1's 4) — the hash-agg sizing shape. Partial (map-side) agg makes
    this one shuffle of pre-combined groups; 2-phase plan asserted for the
    low-card twin in tests/test_plans.py."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d")).agg(
        F.count("*").alias("n"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_quantity").alias("mx"),
        F.round(F.sum("l_tax"), 4).alias("st"),
    )


@register(
    "perf_string_like",
    oracle="""
SELECT CAST(sum(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END)
            AS BIGINT) AS pre,
       CAST(sum(CASE WHEN p_name LIKE '%widget' THEN 1 ELSE 0 END)
            AS BIGINT) AS suf,
       CAST(sum(CASE WHEN p_name LIKE '%ol%' THEN 1 ELSE 0 END)
            AS BIGINT) AS infix,
       CAST(sum(CASE WHEN p_name LIKE 's%t' THEN 1 ELSE 0 END)
            AS BIGINT) AS bound,
       CAST(sum(CASE WHEN p_name = 'blue rod' THEN 1 ELSE 0 END)
            AS BIGINT) AS eq,
       CAST(sum(CASE WHEN upper(p_name) = 'BLUE ROD' THEN 1 ELSE 0 END)
            AS BIGINT) AS ueq
FROM part
""",
    tags=("perf", "string"),
)
def perf_string_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """targeted-perf PERF_STRING-Q1..Q7 (string.test): the LIKE-pattern
    battery (prefix/suffix/infix/bounded/equality/case-normalized equality)
    as ONE conditional-aggregation scan instead of the reference's six
    separate scans. Prefix LIKE compiles to StartsWith (no regex) in
    Spark's codegen; all six predicates evaluate in a single pass."""
    p = _t(spark, sf_dir, "part")

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    nm = F.col("p_name")
    return p.agg(
        cnt(nm.like("small%"), "pre"),
        cnt(nm.like("%widget"), "suf"),
        cnt(nm.like("%ol%"), "infix"),
        cnt(nm.like("s%t"), "bound"),
        cnt(nm == "blue rod", "eq"),
        cnt(F.upper(nm) == "BLUE ROD", "ueq"),
    )


# ===========================================================================
# Temporal joins (beyond the reference: its only non-equi path is
# CrossJoinNode + conjuncts, be/src/exec/cross-join-node.cc — O(n*m)).
# Scale-correct compositions in operators/temporal.py.
# ===========================================================================

@register(
    "join_asof",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT p.event_id AS purchase_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       v.event_id AS view_id,
       epoch_us(v.ts) AS view_ts_us,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    tags=("join", "temporal"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks the same user's most recent
    prior-or-equal view event (NULL when none). Spark side is the
    union+window form (operators/temporal.py::asof_join — one shuffle, zero
    join operators); the oracle is DuckDB's native ASOF LEFT JOIN, so the
    composition is verified against a first-class implementation.

    Determinism under (user_id, ts) view duplicates: the Spark side passes
    right_tiebreak='event_id' (max event_id wins inside the single window
    pass — still one shuffle); the oracle pre-reduces the view side to one
    row per (user_id, ts) keeping max(event_id), which selects the same
    winner. Without this, each engine makes its own arbitrary pick and the
    gate is red only on unlucky testdata."""
    from impalatogo_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(
        p, v, by=["user_id"], right_cols=["event_id", "ts"],
        right_tiebreak="event_id",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("event_id_r").alias("view_id"),
        F.unix_micros("ts_r").alias("view_ts_us"),
        (F.unix_micros("ts") - F.unix_micros("ts_r")).alias("gap_us"),
    )


_ATTR_WINDOW_US = 30 * 60 * 1_000_000  # 30-minute attribution window


@register(
    "join_range_attribution",
    oracle=f"""
WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS c_us
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, p.p_us AS purchase_ts_us,
       count(c.event_id) AS n_clicks,
       min(c.c_us) AS first_click_us,
       max(c.c_us) AS last_click_us
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.c_us > p.p_us - {_ATTR_WINDOW_US}
 AND c.c_us <= p.p_us
GROUP BY 1, 2, 3
""",
    tags=("join", "temporal"),
)
def join_range_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks attributed to every purchase whose trailing
    30-minute window contains them, with per-purchase click counts. Spark
    side buckets time at the window width so the match is a plain hash join
    on (user, bucket) + exact range filter (operators/temporal.py::
    range_join_buckets) — never a nested-loop; the oracle is DuckDB's
    inequality join."""
    from impalatogo_spark.operators.temporal import range_join_buckets

    ev = _t(spark, sf_dir, "events")
    wus = F.lit(_ATTR_WINDOW_US)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("c_us")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    intervals = purch.withColumn("start_us", F.col("p_us") - wus)
    matches = range_join_buckets(
        clicks,
        intervals,
        by=["user_id"],
        point_ts="c_us",
        start="start_us",
        end="p_us",
        bucket=F.floor(F.col("c_us") / wus),
        n_buckets_expr=F.sequence(
            F.floor(F.col("start_us") / wus), F.floor(F.col("p_us") / wus)
        ),
    )
    agg = matches.groupBy("purchase_id").agg(
        F.count("*").alias("n_clicks"),
        F.min("c_us").alias("first_click_us"),
        F.max("c_us").alias("last_click_us"),
    )
    return (
        purch.join(agg, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.col("p_us").alias("purchase_ts_us"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long").alias("n_clicks"),
            "first_click_us",
            "last_click_us",
        )
    )


# ===========================================================================
# Multi-level aggregation: ROLLUP / CUBE / GROUPING SETS (round 2).
# The reference's grammar stops at plain GROUP BY (sql-parser.y) — these are
# the OLAP grouping shapes its TPC-DS workload files (q18/q22/q36/q67) need,
# expressed through Catalyst's native Expand-based grouping-set execution:
# ONE scan + one shuffle for ALL grouping levels, not a UNION of per-level
# aggregates (the naive form rescans the fact table once per level).
# ===========================================================================

@register(
    "agg_rollup",
    oracle="""
SELECT p_type, p_brand,
       CAST(grouping(p_type, p_brand) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
GROUP BY ROLLUP (p_type, p_brand)
""",
    tags=("aggregation", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q22 shape: hierarchy subtotals via ROLLUP — (type, container),
    (type), () levels in one Expand pass. grouping_id distinguishes the
    subtotal rows from genuine NULL group values (Spark's grouping_id bit
    order matches DuckDB's multi-arg grouping())."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select("p_type", "p_brand", "gid", "n", "sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("aggregation", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping levels from one
    Expand — money summed as integer cents (repo rounding policy)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "rev_cents"
            ),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "rev_cents")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
""",
    tags=("aggregation", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL entry (Catalyst Expand):
    the (priority, status) detail, per-priority subtotal, and grand total in
    one pass."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping_id() AS gid, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        """,
    )


@register(
    "window_ntile_dist",
    oracle="""
SELECT o_orderkey,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM orders
WHERE o_orderpriority = '1-URGENT'
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
""",
    tags=("window",),
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist battery. The window orders by
    integer cents + key tie-break so ranks are engine-exact; the dist
    outputs are ratios of exact integers rounded at 6dp on both sides."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.round(F.col("o_totalprice") * 100, 0).cast("long"), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "set_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers ordering in both years.
    Compiles to a left-semi hash join after per-side aggregation — no sort."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.year("o_orderdate") == 1998).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
""",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): 1997 customers who did not return in 1998 —
    left-anti join shape."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.year("o_orderdate") == 1998).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)  # subtract == EXCEPT DISTINCT


@register(
    "agg_percentiles",
    oracle="""
WITH t AS (SELECT o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderstatus,
       round(quantile_cont(cents, 0.25), 4) AS p25,
       round(quantile_cont(cents, 0.5),  4) AS p50,
       round(quantile_cont(cents, 0.9),  4) AS p90,
       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_disc
FROM t GROUP BY 1
""",
    tags=("aggregation", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile battery (continuous interpolation + discrete) over
    integer cents, computed by PER-GROUP RANK SELECTION over the two-level
    global-row-number scan (operators/scale.py) instead of Spark's
    buffering percentile_cont ObjectHashAggregate: with only 3 groups the
    builtin's final merge holds ~N/3 values per task — the r06 sf1 audit
    measured 257 s at sf1 vs 2.1 s at sf0.1 (buffer pressure, an executor
    OOM at 100 TB). Here the sort is a range-partitioned scan with full
    parallelism; the per-group (start, n) table is 3 rows broadcast back,
    and the percentile is linear interpolation between the two bracketing
    ranks. Interpolation mirrors DuckDB's quantile_cont lerp form
    (lo*(crn-rn) + hi*(rn-frn), rn = p*(n-1) in IEEE double) so the
    rounded values stay engine-identical. percentile_disc(0.5) is the
    element at 1-based rank (n+1) div 2 — both engines' lower-middle
    tie rule. (SQL entry still serves percentile_cont/percentile_disc
    WITHIN GROUP via Spark builtins for tiny inputs.)"""
    from impalatogo_spark.operators.scale import grouped_percentiles

    t = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    return grouped_percentiles(
        t, ["o_orderstatus"], "cents", "o_orderkey",
        ps=(0.25, 0.5, 0.9), disc=(0.5,),
    )


@register(
    "events_value_percentiles",
    oracle="""
WITH t AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT event_type,
       round(quantile_cont(cents, 0.5),  4) AS p50,
       round(quantile_cont(cents, 0.95), 4) AS p95,
       round(quantile_cont(cents, 0.99), 4) AS p99,
       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_disc
FROM t GROUP BY 1
""",
    tags=("aggregation", "percentile", "events"),
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type latency/value tail percentiles (p50/p95/p99 + the
    discrete median) — the SLO readout an event pipeline tails — via the
    scalable operators/scale.grouped_percentiles rank-selection form:
    few-huge-groups exact percentiles with NO buffering aggregate (the
    builtin form is an executor OOM at 100 TB; see agg_percentiles).
    Integer cents in, DuckDB-lerp-form interpolation, full-parallelism
    range-partitioned sort."""
    from impalatogo_spark.operators.scale import grouped_percentiles

    t = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    return grouped_percentiles(
        t, ["event_type"], "cents", "event_id",
        ps=(0.5, 0.95, 0.99), disc=(0.5,),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "agg_pivot",
    oracle="""
SELECT user_id % 20 AS bucket,
""" + ",\n".join(
        f"       CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN"
        f" CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS {t}_cents"
        for t in _EVENT_TYPES
    ) + """
FROM events GROUP BY 1 ORDER BY 1
""",
    tags=("aggregation", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per user-bucket revenue cents by event type as columns.
    Explicit pivot values compile to ONE aggregate pass (pivot-first
    aggregation), not a per-value UNION — the Spark-native relational
    pivot the reference lacks (documented beyond-reference extension).
    Money summed as integer cents (repo rounding policy)."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 20).alias("bucket"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    p = ev.groupBy("bucket").pivot("event_type", list(_EVENT_TYPES)).agg(
        F.sum("cents")
    )
    return p.select(
        "bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_cents") for t in _EVENT_TYPES],
    ).orderBy("bucket")


@register(
    "agg_unpivot",
    oracle="""
WITH p AS (
  SELECT user_id % 20 AS bucket,
""" + ",\n".join(
        f"         CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN"
        f" CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS {t}"
        for t in _EVENT_TYPES
    ) + """
  FROM events GROUP BY 1)
SELECT bucket, event_type, cents FROM p
UNPIVOT (cents FOR event_type IN (click, error, purchase, signup, view))
ORDER BY bucket, event_type
""",
    tags=("aggregation", "pivot"),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): widen then unpivot back to (bucket, event_type,
    cents) — the wide-to-long reshaping primitive, exercised as a
    round-trip so the oracle pins both directions. Zero-filled cells
    survive the round-trip (UNPIVOT keeps non-NULL measures)."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 20).alias("bucket"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    p = ev.groupBy("bucket").pivot("event_type", list(_EVENT_TYPES)).agg(
        F.sum("cents")
    )
    wide = p.select(
        "bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )
    return wide.unpivot(
        "bucket", list(_EVENT_TYPES), "event_type", "cents"
    ).orderBy("bucket", "event_type")


@register(
    "lateral_explode_tokens",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 50 = 0)
SELECT doc_id, tok, count(*) AS n
FROM w WHERE length(tok) >= 8
GROUP BY doc_id, tok ORDER BY doc_id, tok
""",
    tags=("sql", "complex-types"),
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode through the SQL entry — the Hive/Spark SQL
    surface for array flattening (complex-type queries the reference's
    1.x-era grammar lacks; documented beyond-reference extension). The
    Generate node runs inside the scan stage — no shuffle until the
    groupBy."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT doc_id, tok, count(*) AS n
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS tok
        WHERE doc_id % 50 = 0 AND length(tok) >= 8
        GROUP BY doc_id, tok ORDER BY doc_id, tok
        """,
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
j AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         epoch_us(p.ts) AS purchase_ts_us,
         v.event_id AS view_id,
         epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT purchase_id, user_id, purchase_ts_us,
       CASE WHEN gap_us <= 1800000000 THEN view_id END AS view_id,
       CASE WHEN gap_us <= 1800000000 THEN gap_us END AS gap_us
FROM j
""",
    tags=("join", "temporal"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (the pandas merge_asof `tolerance` /
    telemetry-alignment semantics): the most recent prior view counts only
    if it happened within 30 minutes of the purchase; staler matches are
    NULLed exactly like no-match. Same one-shuffle union+window plan as
    join_asof — tolerance is a post-pick projection, not a different join.
    The oracle applies the identical cutoff over DuckDB's native ASOF
    LEFT JOIN."""
    from impalatogo_spark.operators.temporal import asof_join

    tol_us = 30 * 60 * 1_000_000
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(
        p, v, by=["user_id"], right_cols=["event_id", "ts"],
        right_tiebreak="event_id",
    )
    gap = F.unix_micros("ts") - F.unix_micros("ts_r")
    within = gap <= F.lit(tol_us)
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.when(within, F.col("event_id_r")).alias("view_id"),
        F.when(within, gap).alias("gap_us"),
    )


@register(
    "agg_histogram_equidepth",
    oracle="""
WITH c AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
b AS (
  SELECT cents,
         ntile(8) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS bucket
  FROM c
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(cents) AS lo_cents, max(cents) AS hi_cents
FROM b GROUP BY 1
""",
    tags=("agg", "histogram"),
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 quantile buckets over extendedprice) — the
    planner-statistics histogram form next to the existing equi-width
    `agg_histogram`. Distributed exact form: ntile over N rows needs a
    single-reducer sort, but the histogram's OUTPUT (per-bucket count /
    lo / hi) only depends on which rank range each distinct VALUE spans —
    so aggregate to (cents, cnt) with a map-side combine, take one
    cumulative-count window over the distinct values (cardinality of
    prices, not rows), derive each bucket's exact ntile rank range
    [s_k, e_k] arithmetically from the total, and broadcast-join the
    8-row range table against the value ranks. Equal-cents rows that
    ntile splits across a boundary surface as the same value being both
    hi of bucket k and lo of k+1 — identical to the oracle's ntile with
    full (cents, orderkey, linenumber) tie-break, because tie order only
    moves ROWS between buckets, never the value boundaries or counts."""
    li = _t(spark, sf_dir, "lineitem")
    vc = (
        li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wv = (
        W.partitionBy(F.col("cents") % F.lit(1))
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    vcum = vc.select("cents", "cnt", F.sum("cnt").over(wv).alias("cum"))
    tot = vc.agg(F.sum("cnt").alias("n_total"))
    bounds = (
        spark.range(1, 9)
        .select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (F.col("bucket") - 1) * (F.col("n_total") / 8).cast("long")
                + F.least(F.col("bucket") - 1, F.col("n_total") % 8)
                + 1
            ).alias("s"),
            (
                F.col("bucket") * (F.col("n_total") / 8).cast("long")
                + F.least(F.col("bucket"), F.col("n_total") % 8)
            ).alias("e"),
        )
    )
    return (
        vcum.join(
            F.broadcast(bounds),
            (F.col("cum") >= F.col("s"))
            & ((F.col("cum") - F.col("cnt")) < F.col("e")),
        )
        .groupBy("bucket")
        .agg(
            (F.max("e") - F.max("s") + 1).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


@register(
    "window_locf_impute",
    oracle="""
SELECT event_id, user_id,
       round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS last_purchase_value,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS purchases_so_far
FROM events
""",
    tags=("window", "timeseries"),
)
def window_locf_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation (the time-series gap-fill
    operator): every event carries the user's most recent purchase value so
    far — last_value(... IGNORE NULLS) over a running frame, with
    (ts, event_id) ordering so timestamp ties can't flip the carried value.
    One window shuffle on user_id; both engines support IGNORE NULLS
    natively."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pval = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id", "user_id",
        F.round(F.last(pval, ignorenulls=True).over(w), 4)
        .alias("last_purchase_value"),
        F.count(pval).over(w).alias("purchases_so_far"),
    )


@register(
    "join_lateral_topk",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.total_cents
FROM customer c,
     LATERAL (SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
              FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY total_cents DESC, o_orderkey LIMIT 3) o
WHERE c.c_custkey % 10 = 1
""",
    tags=("join", "lateral", "topk"),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join — per-customer top-3 orders by
    price, the top-k-per-key shape expressed as LATERAL (identical ANSI
    text on both engines; Catalyst decorrelates it into a ranked window,
    not a per-row re-execution). Integer-cents ordering with an o_orderkey
    tie-break keeps the LIMIT deterministic."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c.c_custkey, o.o_orderkey, o.total_cents
        FROM customer c,
             LATERAL (SELECT o_orderkey,
                             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
                      FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY total_cents DESC, o_orderkey LIMIT 3) o
        WHERE c.c_custkey % 10 = 1
        """,
    )


@register(
    "window_named_clause",
    oracle="""
SELECT o_orderkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT) AS run_cents
FROM orders
WHERE o_custkey % 50 = 7
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window",),
)
def window_named_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause: one window definition shared by several
    analytic functions (ANSI WINDOW syntax both engines parse identically;
    Spark plans ONE Window operator for the shared spec)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS run_cents
        FROM orders
        WHERE o_custkey % 50 = 7
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        """,
    )


# ===========================================================================
# Round-2 session-3 additions: multiset set ops, recursive CTE, robust
# aggregates, date-spine gap fill.
# ===========================================================================

@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
INTERSECT ALL
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
""",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset: min of per-side multiplicities). Distinct
    from `set_intersect`: a customer with 3 orders in 1997 and 2 in 1998
    appears twice. Plans as a single hash aggregate per side + join on the
    count pair — no sort, shuffle carries only the key column."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.year("o_orderdate") == 1998).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
EXCEPT ALL
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
""",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference: count_a - count_b surviving copies).
    Complements `set_except` (EXCEPT DISTINCT == DataFrame.subtract)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.year("o_orderdate") == 1998).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@register(
    "with_recursive_spine",
    oracle="""
WITH RECURSIVE spine(m) AS (
  SELECT 1 UNION ALL SELECT m + 1 FROM spine WHERE m < 12
),
mo AS (
  SELECT month(o_orderdate) AS m,
         count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
)
SELECT s.m AS month,
       CAST(coalesce(mo.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(mo.cents, 0) AS BIGINT) AS revenue_cents
FROM spine s LEFT JOIN mo ON s.m = mo.m
ORDER BY s.m
""",
    tags=("sql", "recursive"),
)
def with_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL entry (Spark 4 recursive CTE): a
    12-row month spine generated by recursion, LEFT JOINed to monthly 1997
    order counts so months with no orders still appear (gap-fill shape).
    The recursion is driver-bounded (12 iterations over 1-row frames); the
    data side is one aggregated scan — recursion never touches fact rows,
    which is the only recursive-CTE shape that survives 100 TB."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH RECURSIVE spine(m) AS (
          SELECT 1 UNION ALL SELECT m + 1 FROM spine WHERE m < 12
        ),
        mo AS (
          SELECT month(o_orderdate) AS m,
                 count(*) AS n_orders,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
        )
        SELECT s.m AS month,
               coalesce(mo.n_orders, 0) AS n_orders,
               coalesce(mo.cents, CAST(0 AS BIGINT)) AS revenue_cents
        FROM spine s LEFT JOIN mo ON s.m = mo.m
        ORDER BY s.m
        """,
    )


@register(
    "agg_trimmed_mean",
    oracle="""
WITH t AS (
  SELECT o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                                     o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT status,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(n) // 10 AS BIGINT) AS k,
       CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10 THEN cents END)
            AS BIGINT) AS trimmed_sum_cents,
       CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10 THEN cents END)
            + (max(n) // 10)
              * (min(CASE WHEN rn > n // 10 THEN cents END)
                 + max(CASE WHEN rn <= n - n // 10 THEN cents END))
            AS BIGINT) AS winsorized_sum_cents,
       CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10 THEN cents END)
            * 1000 // (max(n) - 2 * (max(n) // 10))
            AS BIGINT) AS trimmed_avg_millicents
FROM t GROUP BY status ORDER BY status
""",
    tags=("aggregation", "robust"),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimators in exact integer arithmetic: 10% trimmed
    sum/mean and winsorized sum of order totals (cents) per status. The
    winsorized sum is derived algebraically (trimmed + k*(lo+hi), where
    lo/hi are the clamp values at ranks k+1 and n-k) so no second pass over
    the data is needed; the mean is an integer floor division in milli-cents
    — zero float boundaries anywhere. One window shuffle + one aggregate."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = W.partitionBy("status").orderBy("cents", "o_orderkey")
    t = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("status"),
            cents.alias("cents"),
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("status")))
    )
    k = F.expr("n div 10")
    in_trim = (F.col("rn") > k) & (F.col("rn") <= F.col("n") - k)
    g = t.groupBy("status").agg(
        F.max("n").alias("n"),
        F.sum(F.when(in_trim, F.col("cents"))).alias("trimmed_sum_cents"),
        F.min(F.when(F.col("rn") > k, F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rn") <= F.col("n") - k, F.col("cents"))).alias("hi"),
    )
    return (
        g.select(
            "status",
            "n",
            F.expr("n div 10").alias("k"),
            "trimmed_sum_cents",
            F.expr("trimmed_sum_cents + (n div 10) * (lo + hi)").alias(
                "winsorized_sum_cents"
            ),
            F.expr(
                "trimmed_sum_cents * 1000 div (n - 2 * (n div 10))"
            ).alias("trimmed_avg_millicents"),
        )
        .orderBy("status")
    )


@register(
    "window_gap_fill_days",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
)
SELECT s.user_id,
       strftime(s.d, '%Y-%m-%d') AS day,
       CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
""",
    tags=("window", "timeseries"),
)
def window_gap_fill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: per-user daily event counts with zero rows for
    missing days across each user's own [first, last] activity span — the
    canonical time-series densification before trend/forecast passes (pairs
    with window_locf_impute). The spine is generated from the aggregated
    per-user span (sequence + explode), never from raw events, so generated
    rows are bounded by users x days regardless of event volume; the final
    join is on the same (user_id, d) key the daily aggregate shuffled on."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    daily = e.groupBy("user_id", "d").agg(F.count(F.lit(1)).alias("n"))
    span = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    return spine.join(daily, ["user_id", "d"], "left").select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
    )


@register(
    "agg_filter_clause",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     FILTER (WHERE year(o_orderdate) = 1997), 0) AS BIGINT)
           AS cents_1997
FROM orders GROUP BY 1 ORDER BY 1
""",
    tags=("aggregation", "sql"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI aggregate FILTER (WHERE ...) clause through the SQL entry —
    per-aggregate predicates without CASE wrapping (both engines plan it as
    a conditional partial aggregate; one pass, no extra shuffle)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus AS status,
               count(*) AS n_all,
               count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        FILTER (WHERE year(o_orderdate) = 1997),
                        CAST(0 AS BIGINT)) AS cents_1997
        FROM orders GROUP BY 1 ORDER BY 1
        """,
    )


@register(
    "func_array",
    oracle="""
WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS wa FROM part)
SELECT p_partkey,
       CAST(len(wa) AS BIGINT) AS n_words,
       array_to_string(list_sort(wa), ',') AS sorted_words,
       wa[1] AS first_w,
       wa[-1] AS last_w,
       CAST(CASE WHEN list_contains(wa, 'green') THEN 1 ELSE 0 END AS BIGINT)
           AS has_green,
       array_to_string(list_reverse(wa), ',') AS rev_words,
       CAST(len(list_distinct(wa)) AS BIGINT) AS n_uniq,
       array_to_string(wa[1:2], ',') AS first_two,
       CAST(coalesce(list_position(wa, 'green'), 0) AS BIGINT) AS pos_green
FROM t
""",
    tags=("functions", "complex-types"),
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/complex-type function battery (size, sort, element access from
    both ends, membership, reverse, distinct, slice, position) over the
    split part-name words — the collection-function surface Spark exposes
    for nested data, differentially checked against DuckDB's list_*
    equivalents (array_position's 0-on-absent matches coalesced
    list_position). Pure codegen expressions, zero shuffle."""
    t = _t(spark, sf_dir, "part").select(
        "p_partkey", F.split(F.col("p_name"), " ").alias("wa")
    )
    return t.select(
        "p_partkey",
        F.size("wa").cast("long").alias("n_words"),
        F.array_join(F.array_sort("wa"), ",").alias("sorted_words"),
        F.element_at("wa", 1).alias("first_w"),
        F.element_at("wa", -1).alias("last_w"),
        F.array_contains("wa", "green").cast("long").alias("has_green"),
        F.array_join(F.reverse("wa"), ",").alias("rev_words"),
        F.size(F.array_distinct("wa")).cast("long").alias("n_uniq"),
        F.array_join(F.slice("wa", 1, 2), ",").alias("first_two"),
        F.array_position("wa", "green").cast("long").alias("pos_green"),
    )


@register(
    "events_scd2_intervals",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ch AS (
  SELECT user_id, event_type, ts, event_id
  FROM o WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       coalesce(strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S.%f'), '')
           AS valid_to,
       CAST(CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_current
FROM ch
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "scd"),
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream: collapse
    each user's event-type runs into validity intervals [valid_from,
    valid_to) with an is_current flag — the dimension-table construction
    pattern warehouses run nightly. Two windows over the same (user_id,
    ts, event_id) sort order, so Spark plans ONE sort + exchange reused by
    both (change detection via lag, interval close via lead)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return ch.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("")
        ).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )


@register(
    "market_basket_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, support FROM pairs
ORDER BY support DESC, part_a, part_b LIMIT 20
""",
    tags=("join", "analytics"),
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often bought in
    the same order (pair support counted once per order via the DISTINCT
    item relation). The self-join is keyed on l_orderkey, so pair work is
    sum over orders of |basket|^2 — bounded by the max basket size (7 in
    TPC-H), the same per-group-quadratic bound SemDeDup uses; it never
    degenerates to a global cross product. Full ORDER BY tie-break under
    LIMIT."""
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "events_sliding_distinct_users",
    oracle="""
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
mx AS (SELECT max(day) AS max_day FROM d),
rep AS (
  SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day + INTERVAL 6 DAY AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS win_end,
         user_id
  FROM d
)
SELECT strftime(win_end, '%Y-%m-%d') AS window_end,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM rep, mx WHERE win_end <= mx.max_day
GROUP BY 1 ORDER BY 1
""",
    tags=("window", "timeseries"),
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day — EXACT sliding-window distinct
    (the rolling-DAU metric): each (day, user) pair is replicated into the
    7 windows it belongs to, then distinct-counted per window end. The
    pre-distinct on (day, user) caps replication at 7x distinct pairs (not
    7x raw events), and the distinct count is Spark's 2-phase partial
    aggregation — the exact-twin of an approx_count_distinct rollup at
    100 TB. Window ends past the last observed day are clipped by a
    broadcast 1-row max."""
    d = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    mx = d.agg(F.max("day").alias("max_day"))
    rep = d.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_end"),
        "user_id",
    )
    return (
        rep.crossJoin(F.broadcast(mx))
        .filter(F.col("win_end") <= F.col("max_day"))
        .groupBy(F.date_format("win_end", "yyyy-MM-dd").alias("window_end"))
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("window_end")
    )


@register(
    "part_pareto_frontier",
    oracle="""
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
)
SELECT a.p_partkey, a.size, a.price_cents
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE (b.price_cents < a.price_cents AND b.size >= a.size)
     OR (b.price_cents <= a.price_cents AND b.size > a.size)
)
""",
    tags=("analytics", "window"),
)
def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on (cheaper price,
    larger size). Scale plan is the classic two-phase skyline: (1) a
    bucket-grain prune — per price-bucket max size, running max over
    strictly-cheaper buckets (tiny, broadcast back) eliminates every row
    beaten by a strictly-cheaper bucket, so the surviving set is ~frontier-
    sized, not table-sized; (2) the exact sweep runs two windows on the
    survivors only (strictly-cheaper-price running max via a RANGE frame,
    same-price max via a partition), never a single-reducer pass over the
    full table. Prices compared as integer cents — no float boundaries.
    Frontier rows are never pruned (they are dominated by nothing), and
    every dominated survivor is still dominated by a surviving frontier
    row, so the two phases compose exactly."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("size"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    b = p.withColumn("bucket", (F.col("price_cents") / F.lit(10000)).cast("long"))
    # constant-but-non-foldable partition key (bucket % 1 == 0): the
    # window input is bucket-grain (tiny by construction) and the key
    # keeps WindowExec from logging the single-partition warning while
    # executing identically (a bare lit gets pruned by Catalyst)
    wb = (
        W.partitionBy(F.col("bucket") % F.lit(1))
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cheaper = (
        b.groupBy("bucket")
        .agg(F.max("size").alias("bmax"))
        .select("bucket", F.max("bmax").over(wb).alias("cheaper_max"))
    )
    pruned = b.join(F.broadcast(cheaper), "bucket").where(
        F.col("cheaper_max").isNull() | (F.col("size") > F.col("cheaper_max"))
    )
    m1 = F.max("size").over(
        W.partitionBy(F.col("price_cents") % F.lit(1))
        .orderBy("price_cents")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    m2 = F.max("size").over(W.partitionBy("price_cents"))
    return (
        pruned.select("p_partkey", "size", "price_cents", m1.alias("m1"), m2.alias("m2"))
        .where((F.col("m1").isNull() | (F.col("m1") < F.col("size"))) & (F.col("m2") == F.col("size")))
        .select("p_partkey", "size", "price_cents")
    )


@register(
    "customers_er_blocking",
    oracle="""
SELECT a.c_nationkey, a.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_close_pairs,
       CAST(sum(CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_d1,
       CAST(min(a.c_custkey) AS BIGINT) AS first_custkey
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE a.c_mktsegment = b.c_mktsegment
  AND levenshtein(a.c_name, b.c_name) <= 2
GROUP BY a.c_nationkey, a.c_mktsegment
""",
    tags=("join", "analytics"),
)
def customers_er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation with blocking: within
    (nation, segment) blocks, count customer pairs whose names are within
    edit distance 2 (and the <=1 subset).

    Candidate generation is the EXACT deletion-neighborhood scheme
    (Mor & Fraenkel 1982; SymSpell): lev(a, b) <= 2 guarantees a string
    reachable from BOTH names by <= 2 single-character deletions (take an
    optimal edit script — each side needs at most s+d resp. s+i deletions
    to reach the matched common subsequence, both <= 2). Each name emits
    its <= 2-deletion variants (1 + L + C(L,2), ~172 for L=18) and
    candidates meet on the key xxhash64(nation, segment, variant): the
    key's cardinality GROWS with the corpus (distinct name variants), so
    per-key work no longer scales as (block_size)^2 the way the previous
    fixed-125-block plan did — 100x the rows means ~100x candidate rows,
    not 10,000x pair evaluations. A fixed (nation, segment)-only block
    key was the r02-verdict scale cliff; naive length-band or first-token
    second keys are vacuous here (every c_name is the fixed-length
    'Customer#%09d'), which is exactly why the variant key must come from
    name CONTENT. Verification runs Spark's BOUNDED levenshtein
    (threshold arg, banded DP) over the distinct candidate pairs only.
    Hashing the (nation, segment, variant) triple to ONE long keeps the
    wide fan-out stream narrow (16 bytes/row through the shuffle); a hash
    collision can only ADD a candidate pair, which the exact verify (plus
    the re-joined block-equality filter) rejects, so exactness holds.
    The oracle keeps the plain blocked all-pairs formulation: candidate
    generation is a provable superset + exact verify, so the final
    aggregate is bit-identical by construction (the mirror-the-banding
    rule applies to approximate candidate semantics, not exact pruning).
    """
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    # <=2-deletion neighborhood via two chained explodes over deletion
    # POSITIONS with the variant built scalar-side afterwards — building
    # the ~172-string array per row and array_distinct-ing it runs
    # interpreted (higher-order functions skip codegen) and was the
    # dominant cost. Positions are canonicalized to run-heads (deleting
    # any char of an equal-char run yields the same string, so only the
    # leftmost is emitted; for two deletions inside one run, the leftmost
    # pair): names full of zero-runs would otherwise emit the same
    # variant up to 7x per side and square that in the join. Encoding:
    # i=0,j=0 -> identity; i=0,j>0 -> single deletion at j; 0<i<j ->
    # double deletion.
    runhead = (
        "(p = 1 OR substring(c_name, p, 1) != substring(c_name, p - 1, 1))"
    )
    i_positions = F.expr(
        "filter(sequence(0, length(c_name)), p -> p = 0 OR "
        + runhead
        + ")"
    )
    # The fan-out happens in the MAP stage before the join exchange, so it
    # inherits the scan's partitioning — a single small parquet file would
    # run the whole neighborhood generation on one thread. Spread the
    # (tiny) base rows first; at 100 TB the scan has thousands of splits
    # and this is a no-op-sized shuffle either way.
    par = max(spark.sparkContext.defaultParallelism,
              int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    keyed = (
        c.repartition(par)
        .select("*", F.explode(i_positions).alias("__i"))
        .select(
            "*",
            F.explode(
                F.expr(
                    "filter(sequence(0, length(c_name)), p -> CASE"
                    " WHEN __i = 0 THEN p = 0 OR " + runhead +
                    " ELSE p > __i AND (p = __i + 1 OR " + runhead + ")"
                    " END)"
                )
            ).alias("__j"),
        )
        .select(
            "c_custkey",
            F.xxhash64(
                F.col("c_nationkey"),
                F.col("c_mktsegment"),
                F.expr(
                    "CASE WHEN __i = 0 AND __j = 0 THEN c_name"
                    " WHEN __i = 0 THEN concat("
                    "   substring(c_name, 1, __j - 1),"
                    "   substring(c_name, __j + 1, length(c_name)))"
                    " ELSE concat("
                    "   substring(c_name, 1, __i - 1),"
                    "   substring(c_name, __i + 1, __j - __i - 1),"
                    "   substring(c_name, __j + 1, length(c_name))) END"
                ),
            ).alias("__hk"),
        )
    )
    # Pairs come from ONE hash-agg per key (collect_set + in-group
    # expansion) instead of a variant self-join: a sort-merge self-join
    # needs exchange + sort + join + a pair-distinct exchange, while this
    # is exchange + agg + distinct — measurably fewer stages, identical
    # per-key work (groups are near-duplicate clusters, tiny by nature;
    # a degenerate all-identical-names corpus is quadratic under EITHER
    # formulation because the answer itself is quadratic).
    groups = (
        keyed.groupBy("__hk")
        .agg(F.sort_array(F.collect_set("c_custkey")).alias("ks"))
        .where(F.size("ks") >= 2)
    )
    pairs = (
        groups.select(
            F.explode(
                F.expr(
                    "flatten(transform(ks, (x, xi) -> transform("
                    "slice(ks, xi + 2, size(ks) - xi - 1),"
                    " y -> struct(x AS k_a, y AS k_b))))"
                )
            ).alias("p")
        )
        .select("p.k_a", "p.k_b")
        .distinct()  # a true pair shares many variants; verify each once
    )
    ca = c.select(
        F.col("c_custkey").alias("k_a"),
        F.col("c_name").alias("n_a"),
        "c_nationkey",
        "c_mktsegment",
    )
    cb = c.select(
        F.col("c_custkey").alias("k_b"),
        F.col("c_name").alias("n_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("c_mktsegment").alias("ms_b"),
    )
    cand = (
        pairs.join(ca, "k_a")
        .join(cb, "k_b")
        .where(
            (F.col("c_nationkey") == F.col("nk_b"))
            & (F.col("c_mktsegment") == F.col("ms_b"))
        )
    )
    d2 = F.levenshtein(F.col("n_a"), F.col("n_b"), 2)
    d1 = F.levenshtein(F.col("n_a"), F.col("n_b"), 1)
    return (
        cand.where(d2 >= 0)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_close_pairs"),
            F.sum(F.when(d1 >= 0, 1).otherwise(0)).alias("n_pairs_d1"),
            F.min(F.col("k_a")).alias("first_custkey"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id,
         ts
  FROM marked
),
iv AS (
  SELECT user_id, session_id,
         CAST(floor(min(epoch_us(ts)) / 3600000000.0) AS BIGINT) AS hs,
         CAST(floor(max(epoch_us(ts)) / 3600000000.0) AS BIGINT) AS he
  FROM sess GROUP BY user_id, session_id
),
wins AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hb,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
  ORDER BY n_events DESC, hb LIMIT 20
)
SELECT w.hb AS window_hour, w.n_events,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM wins w JOIN iv ON iv.hs <= w.hb AND iv.he >= w.hb
GROUP BY w.hb, w.n_events
""",
    tags=("join", "temporal"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — intervals on BOTH sides (vs. the point-in-
    interval join of join_range_attribution): per-user activity sessions
    against the 20 busiest clock hours; count sessions overlapping each.
    Scale plan: sessions explode to the epoch-hour buckets they span (a
    session covers hour h iff it overlaps [h, h+1)), and the overlap join
    becomes a bucket EQUIJOIN against the broadcast hour list — never an
    inequality-pair scan. Fan-out equals true coverage (bounded by session
    length / bucket width), the standard interval-bucketing trick
    published for Spark range joins. Hours travel as integer epoch-hours;
    no float or timestamp hashes cross the compare boundary."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap_us > 1_800_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    hour_of = lambda c: F.floor(F.unix_micros(c) / F.lit(3600000000.0)).cast("long")
    iv = (
        marked.withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "session_id")
        .agg(hour_of(F.min("ts")).alias("hs"), hour_of(F.max("ts")).alias("he"))
    )
    wins = (
        ev.groupBy(hour_of(F.col("ts")).alias("hb"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), "hb")
        .limit(20)
    )
    covered = iv.select(
        "user_id", "session_id", F.explode(F.sequence("hs", "he")).alias("hb")
    )
    return (
        covered.join(F.broadcast(wins), "hb")
        .groupBy(F.col("hb").alias("window_hour"), "n_events")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@register(
    "events_hourly_seasonality",
    oracle="""
WITH h AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, sum(cnt) AS total FROM h GROUP BY 1)
SELECT h.event_type, h.hour_of_day, h.cnt,
       CAST(h.cnt * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(rank() OVER (PARTITION BY h.event_type
                         ORDER BY h.cnt DESC, h.hour_of_day) AS BIGINT) AS hour_rank
FROM h JOIN t ON h.event_type = t.event_type
""",
    tags=("timeseries", "agg"),
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: each hour's share of
    the type's traffic (integer ppm — no float division crosses the
    compare boundary) and its rank within the type. Two-phase aggregation
    to 24 x n_types rows, then a per-type total joined back; at 100 TB the
    heavy input collapses in the first map-side combine and everything
    after is KB-sized."""
    h = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.hour("ts").cast("long").alias("hour_of_day")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t = h.groupBy("event_type").agg(F.sum("cnt").alias("total"))
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hour_of_day",
        "cnt",
        F.expr("CAST(cnt * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
        F.rank()
        .over(W.partitionBy("event_type").orderBy(F.desc("cnt"), "hour_of_day"))
        .cast("long")
        .alias("hour_rank"),
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
b AS (SELECT p.event_id AS pid, v.event_id AS vid, v.ts AS vts
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts),
f AS (SELECT p.event_id AS pid, v.event_id AS vid, v.ts AS vts
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts)
SELECT p.event_id AS purchase_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       CASE WHEN f.vid IS NULL OR (b.vid IS NOT NULL AND
                 epoch_us(p.ts) - epoch_us(b.vts) <= epoch_us(f.vts) - epoch_us(p.ts))
            THEN b.vid ELSE f.vid END AS view_id,
       CASE WHEN f.vid IS NULL OR (b.vid IS NOT NULL AND
                 epoch_us(p.ts) - epoch_us(b.vts) <= epoch_us(f.vts) - epoch_us(p.ts))
            THEN epoch_us(p.ts) - epoch_us(b.vts)
            ELSE epoch_us(p.ts) - epoch_us(f.vts) END AS gap_us
FROM p
LEFT JOIN b ON b.pid = p.event_id
LEFT JOIN f ON f.pid = p.event_id
""",
    tags=("join", "temporal"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each purchase picks the same user's
    CLOSEST view event in either direction (tie -> the earlier view);
    gap_us is signed (negative when the view came after). Spark side is
    operators/temporal.py::asof_join_nearest — both direction candidates
    read off ONE window sort, so it costs the same single shuffle as the
    backward join. Oracle: two native DuckDB ASOF joins (>= and <=)
    branch-merged. Both sides pre-reduce views to max(event_id) per
    (user_id, ts) so duplicate-timestamp picks can't diverge."""
    from impalatogo_spark.operators.temporal import asof_join_nearest

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    j = asof_join_nearest(p, v, by=["user_id"], right_cols=["event_id", "ts"])
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("event_id_r").alias("view_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_r")).alias("gap_us"),
    )


@register(
    "func_map",
    oracle="""
SELECT p_partkey,
       m['brand'][1] AS brand_v,
       m['missing'][1] AS missing_v,
       CAST(cardinality(m2) AS BIGINT) AS n_keys,
       array_to_string(list_sort(map_keys(m2)), ',') AS keys_sorted,
       array_to_string(map_values(m2), ',') AS vals_in_order
FROM (
  SELECT p_partkey,
         map(['brand', 'type'], [p_brand, p_type]) AS m,
         map(['brand', 'type', 'size'],
             [p_brand, p_type, CAST(p_size AS VARCHAR)]) AS m2
  FROM part
)
""",
    tags=("functions", "complex-types"),
)
def func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP complex-type battery (the reference reads Parquet MAP columns
    and projects map lookups, SURVEY.md §2.2): build, lookup (present and
    missing key -> NULL under ansi=false), concat, cardinality, key/value
    extraction. Scalar projections only — everything stays in codegen;
    map values never cross the compare boundary as maps (engines disagree
    on map hashing), only as extracted scalars."""
    p = _t(spark, sf_dir, "part")
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    m2 = F.map_concat(
        m, F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_v"),
        F.element_at(m, "missing").alias("missing_v"),
        F.size(m2).cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_sorted"),
        F.array_join(F.map_values(m2), ",").alias("vals_in_order"),
    )


@register(
    "events_triangle_count",
    oracle="""
WITH cells AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, event_type, user_id FROM events
),
edges AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM cells a JOIN cells b
    ON a.d = b.d AND a.event_type = b.event_type AND a.user_id < b.user_id
)
SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_vertices,
       CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT count(*)
             FROM edges e1 JOIN edges e2 ON e1.v = e2.u
                  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT)
           AS n_triangles
""",
    tags=("graph", "analytics"),
)
def events_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the user co-activity graph (edge = two users
    active in the same (day, event_type) cell). Spark side uses DEGREE
    orientation — every edge points from its (degree, id)-smaller endpoint,
    wedges join on the shared source, and the closing edge is probed in the
    oriented set — the standard bound of sum(min-degree) per edge instead
    of sum(degree^2), which is what keeps enumeration alive on skewed
    100 TB graphs (hub vertices stop generating wedges). The oracle counts
    the same triangles with the id-ordered 3-way self-join: the count is
    orientation-invariant, so the two different enumeration orders must
    agree exactly. Edge generation is bounded per (day,type) cell, never
    an all-pairs across the corpus."""
    from impalatogo_spark.session import tracked_persist

    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        F.to_date("ts").alias("d"), "event_type", "user_id"
    ).distinct()
    a, b = cells.alias("a"), cells.alias("b")
    # edges feeds the degree union (x2), the orientation join and the edge
    # count — 4 consumers; without a persist the quadratic per-cell edge
    # self-join recomputes per consumer (multi-consumer persist rule).
    edges = tracked_persist(
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
    )
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    # oriented feeds the o1/o2 wedge join plus the o3 closing probe — 3
    # consumers of the edges+degree join.
    oriented = tracked_persist(
        ed.select(
            F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(ku < kv, kv).otherwise(ku).alias("dst_key"),
            F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.dst_key") < F.col("o2.dst_key")),
    ).select(F.col("o1.dst").alias("x"), F.col("o2.dst").alias("y"))
    tri = wedges.join(
        o3, (F.col("x") == F.col("o3.src")) & (F.col("y") == F.col("o3.dst"))
    )
    nv = ev.agg(F.countDistinct("user_id").cast("long").alias("n_vertices"))
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    nt = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return nv.crossJoin(ne).crossJoin(nt)


@register(
    "events_changepoint_cusum",
    oracle="""
WITH s AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_u,
         row_number() OVER w AS i,
         sum(CAST(round(value * 1000000) AS BIGINT)) OVER
             (PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS s_n
      FROM events
      GROUP BY 1),
d AS (
  SELECT s.event_type, s.ts, s.i, t.n,
         abs(t.n * s.s_i - s.i * t.s_n) AS d_abs,
         row_number() OVER (PARTITION BY s.event_type
                            ORDER BY abs(t.n * s.s_i - s.i * t.s_n) DESC, s.i)
             AS rk
  FROM s JOIN t ON s.event_type = t.event_type
)
SELECT event_type, n, CAST(i AS BIGINT) AS cp_index,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS cp_ts,
       CAST(d_abs AS BIGINT) AS d_abs
FROM d WHERE rk = 1
""",
    tags=("timeseries", "analytics"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the index i maximizing
    |n*S_i - i*S_n| (the integer-scaled deviation of the prefix mean from
    the global mean — the classic single-changepoint statistic, no float
    ever computed: values are micro-units, the statistic is a BIGINT
    cross-multiplication; ties go to the earliest index). One prefix-sum
    window per type + a broadcast per-type total. The per-type prefix scan
    is serial within a type by construction of the statistic — at 100 TB
    partition count = type count, the same shape as any per-series scan;
    shard the series (per-day partial CUSUMs merged by offset) when one
    series outgrows an executor. BIGINT headroom: |D| <= n * |S_n| — fine
    to ~1e12 micro-unit-rows; use DECIMAL(38,0) beyond."""
    ev = _t(spark, sf_dir, "events")
    v_u = F.round(F.col("value") * 1000000).cast("long")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "ts",
        v_u.alias("v_u"),
        F.row_number().over(w).alias("i"),
        F.sum(v_u).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("s_i"),
    )
    t = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(v_u).alias("s_n")
    )
    d_abs = F.abs(F.col("n") * F.col("s_i") - F.col("i") * F.col("s_n"))
    rk = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc("d_abs"), "i")
    )
    return (
        s.join(F.broadcast(t), "event_type")
        .withColumn("d_abs", d_abs)
        .withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            "n",
            F.col("i").cast("long").alias("cp_index"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("cp_ts"),
            F.col("d_abs").cast("long").alias("d_abs"),
        )
    )


@register(
    "table_profile",
    oracle="""
SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT event_id) AS BIGINT) AS ndv,
       CAST(min(event_id) AS VARCHAR) AS min_v,
       CAST(max(event_id) AS VARCHAR) AS max_v
FROM events
UNION ALL
SELECT 'ts', CAST(count(*) AS BIGINT), CAST(count(*) - count(ts) AS BIGINT),
       CAST(count(DISTINCT ts) AS BIGINT),
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f'),
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f')
FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) AS BIGINT), CAST(count(*) - count(user_id) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
FROM events
UNION ALL
SELECT 'event_type', CAST(count(*) AS BIGINT), CAST(count(*) - count(event_type) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT),
       min(event_type), max(event_type)
FROM events
UNION ALL
SELECT 'value', CAST(count(*) AS BIGINT), CAST(count(*) - count(value) AS BIGINT),
       CAST(count(DISTINCT value) AS BIGINT),
       CAST(CAST(round(min(value) * 1000000) AS BIGINT) AS VARCHAR),
       CAST(CAST(round(max(value) * 1000000) AS BIGINT) AS VARCHAR)
FROM events
UNION ALL
SELECT 'props', CAST(count(*) AS BIGINT), CAST(count(*) - count(props) AS BIGINT),
       CAST(count(DISTINCT props) AS BIGINT),
       min(props), max(props)
FROM events
""",
    tags=("profiling", "stats"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated per-column data profile (the COMPUTE STATS / SHOW COLUMN
    STATS readout, computed live): rows, nulls, exact NDV, min/max per
    column, all from ONE scan — a single wide aggregate (Catalyst plans
    the multi-column COUNT(DISTINCT) via one Expand, so the table is read
    once, not once per column) followed by a 6-row stack unpivot. Doubles
    surface as integer micro-units and timestamps as formatted strings so
    nothing float-ish crosses the compare boundary. At 100 TB swap the
    exact NDVs for approx_count_distinct (the agg_ndv_appx sketch path) —
    the Expand multiplies scan rows by the distinct-column count."""
    ev = _t(spark, sf_dir, "events")
    fmt_ts = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    micros = lambda c: F.round(c * 1000000).cast("long").cast("string")
    a = ev.agg(
        F.count(F.lit(1)).alias("nr"),
        *[
            x
            for col, mn, mx in [
                ("event_id", F.min("event_id").cast("string"), F.max("event_id").cast("string")),
                ("ts", fmt_ts(F.min("ts")), fmt_ts(F.max("ts"))),
                ("user_id", F.min("user_id").cast("string"), F.max("user_id").cast("string")),
                ("event_type", F.min("event_type"), F.max("event_type")),
                ("value", micros(F.min("value")), micros(F.max("value"))),
                ("props", F.min("props"), F.max("props")),
            ]
            for x in (
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"nn_{col}"),
                F.countDistinct(col).alias(f"nd_{col}"),
                mn.alias(f"mn_{col}"),
                mx.alias(f"mx_{col}"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}"
        for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    return a.select(
        F.expr(f"stack(6, {stack})").alias("col_name", "n_nulls", "ndv", "min_v", "max_v"),
        F.col("nr").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("ndv").cast("long").alias("ndv"),
        "min_v",
        "max_v",
    )


@register(
    "table_profile_approx",
    oracle=None,  # sketch NDVs are engine-specific; bounded-error pytest
    # (tests/test_plans.py) pins error vs the exact twin + no-Expand plan
    tags=("profiling", "stats", "approx"),
)
def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB default form of `table_profile`: identical per-column
    readout (rows / nulls / NDV / min / max from ONE scan) but NDV comes
    from approx_count_distinct (HLL++, rsd 2.5%) instead of exact
    COUNT(DISTINCT) — so Catalyst plans a single flat aggregate with NO
    Expand node. The exact twin's Expand multiplies every scanned row by
    the number of distinct-counted columns (6x here): fine for a readout
    at test SF, wrong as the default against 100 TB. This is the ndv()
    path the reference itself uses for COMPUTE STATS
    (be/src/exprs/aggregate-functions.cc NDV, a fixed-size HLL) — stats
    collection there is sketch-first for exactly this reason."""
    ev = _t(spark, sf_dir, "events")
    fmt_ts = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    micros = lambda c: F.round(c * 1000000).cast("long").cast("string")
    a = ev.agg(
        F.count(F.lit(1)).alias("nr"),
        *[
            x
            for col, mn, mx in [
                ("event_id", F.min("event_id").cast("string"), F.max("event_id").cast("string")),
                ("ts", fmt_ts(F.min("ts")), fmt_ts(F.max("ts"))),
                ("user_id", F.min("user_id").cast("string"), F.max("user_id").cast("string")),
                ("event_type", F.min("event_type"), F.max("event_type")),
                ("value", micros(F.min("value")), micros(F.max("value"))),
                ("props", F.min("props"), F.max("props")),
            ]
            for x in (
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"nn_{col}"),
                F.approx_count_distinct(col).alias(f"nd_{col}"),
                mn.alias(f"mn_{col}"),
                mx.alias(f"mx_{col}"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}"
        for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    return a.select(
        F.expr(f"stack(6, {stack})").alias("col_name", "n_nulls", "ndv", "min_v", "max_v"),
        F.col("nr").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("ndv").cast("long").alias("ndv"),
        "min_v",
        "max_v",
    )


@register(
    "func_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_orderkey & l_partkey AS BIGINT) AS band,
       CAST(l_orderkey | l_partkey AS BIGINT) AS bor,
       CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS bxor,
       CAST(l_partkey << 3 AS BIGINT) AS shl,
       CAST(l_orderkey >> 2 AS BIGINT) AS shr,
       CAST(bit_count(CAST(l_partkey AS BIGINT)) AS INT) AS popcnt
FROM lineitem WHERE l_orderkey <= 640
""",
    tags=("functions",),
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery (Impala's bitand/bitor/bitxor/shiftleft/
    shiftright/countset surface, BuiltinsDb bit functions): &, |, xor,
    shifts, popcount — pure codegen integer ops, differentially pinned
    against DuckDB's operators."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 640)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(l_orderkey & l_partkey AS BIGINT)").alias("band"),
        F.expr("CAST(l_orderkey | l_partkey AS BIGINT)").alias("bor"),
        F.expr("CAST(l_orderkey ^ l_partkey AS BIGINT)").alias("bxor"),
        F.shiftleft(F.col("l_partkey"), 3).cast("long").alias("shl"),
        F.shiftright(F.col("l_orderkey"), 2).cast("long").alias("shr"),
        F.bit_count(F.col("l_partkey").cast("long")).alias("popcnt"),
    )


@register(
    "agg_boolean_bitwise",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 1)  AS all_multi,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       CAST(bit_and(l_partkey) AS BIGINT) AS keys_and,
       CAST(bit_or(l_partkey) AS BIGINT)  AS keys_or,
       CAST(bit_xor(l_partkey) AS BIGINT) AS keys_xor
FROM lineitem GROUP BY 1
""",
    tags=("agg", "functions"),
)
def agg_boolean_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (bool_and/bool_or) and bitwise (bit_and/or/xor) aggregate
    battery — both families are commutative/associative, so Spark plans
    them 2-phase with map-side partial combine like any sum; bit_xor over
    keys is the classic O(1)-state set-difference checksum (the trick
    dedup ledgers use to verify survivor sets without a join)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 1).alias("all_multi"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bit_and("l_partkey").cast("long").alias("keys_and"),
        F.bit_or("l_partkey").cast("long").alias("keys_or"),
        F.bit_xor("l_partkey").cast("long").alias("keys_xor"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
mx AS (SELECT max(day) AS max_day FROM d),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY 1),
rep AS (
  SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day + INTERVAL 6 DAY AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS win_end,
         user_id
  FROM d
),
wau AS (
  SELECT win_end, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM rep, mx WHERE win_end <= mx.max_day GROUP BY 1
)
SELECT strftime(w.win_end, '%Y-%m-%d') AS day,
       coalesce(a.dau, 0) AS dau, w.wau,
       CAST(coalesce(a.dau, 0) * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
FROM wau w LEFT JOIN dau a ON a.day = w.win_end
""",
    tags=("events", "timeseries"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day (the engagement ratio product teams
    track): exact trailing-7-day WAU via the bounded (day,user) window
    replication (see events_sliding_distinct_users), daily DAU from the
    same pre-distinct pairs, ratio in integer ppm. Replication factor is
    a hard 7x on distinct pairs, both aggregates 2-phase."""
    d = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    mx = d.agg(F.max("day").alias("max_day"))
    dau = d.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        d.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
                "win_end"
            ),
            "user_id",
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("win_end") <= F.col("max_day"))
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        wau.join(dau, wau.win_end == dau.day, "left")
        .select(
            F.date_format("win_end", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "wau",
            F.expr(
                "CAST(coalesce(dau, 0) * 1000000 DIV wau AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
    )


@register(
    "orders_gini_revenue",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i FROM per_cust
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS total,
         CAST(sum(i * cents) AS BIGINT) AS weighted
  FROM ranked
),
bh AS (
  SELECT CAST(sum(r.cents) AS BIGINT) AS bottom_half
  FROM ranked r, s WHERE r.i <= s.n // 2
)
SELECT n AS n_customers, total AS total_cents,
       CAST(CAST(2 * weighted - (n + 1) * total AS HUGEINT) * 1000000
            // (CAST(n AS HUGEINT) * total) AS BIGINT) AS gini_ppm,
       CAST(CAST(bottom_half AS HUGEINT) * 1000000 // total AS BIGINT)
           AS bottom_half_share_ppm
FROM s, bh
""",
    tags=("analytics", "agg"),
)
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration readout: exact Gini coefficient over
    per-customer revenue plus the bottom-half Lorenz share, in integer ppm
    — G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending ranks,
    a pure BIGINT cross-multiplication (the final ppm division runs in
    decimal(38) because the numerator can pass 2^63). Ranks come from
    operators/scale.py::global_row_number — the two-level range-
    partitioned scan — so the concentration metric computes with full
    parallelism; revenue is integer cents per the repo's money rule."""
    from impalatogo_spark.operators.scale import global_row_number
    from impalatogo_spark.session import tracked_persist

    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    # the ranked relation feeds two aggregate passes plus a broadcast
    # subplan — persist once (session-tracked; harnesses release between
    # queries) so the 3-stage rank pipeline doesn't recompute per consumer
    ranked = tracked_persist(
        global_row_number(per_cust, ["cents", "o_custkey"], out="i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total"),
        F.sum(F.col("i") * F.col("cents")).alias("weighted"),
    )
    half = ranked.crossJoin(F.broadcast(s.select("n"))).where(
        F.col("i") <= F.expr("n DIV 2")
    ).agg(F.sum("cents").alias("bottom_half"))
    d38 = lambda c: c.cast("decimal(38,0)")
    return (
        s.crossJoin(F.broadcast(half))
        .select(
            F.col("n").alias("n_customers"),
            F.col("total").alias("total_cents"),
            F.floor(
                d38(2 * F.col("weighted") - (F.col("n") + 1) * F.col("total"))
                * 1000000
                / d38(F.col("n") * F.col("total"))
            ).cast("long").alias("gini_ppm"),
            F.floor(d38(F.col("bottom_half")) * 1000000 / d38(F.col("total")))
            .cast("long")
            .alias("bottom_half_share_ppm"),
        )
    )


@register(
    "events_autocorr_lag1",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
pairs AS (
  SELECT c AS x, lead(c) OVER (ORDER BY day) AS y FROM daily
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs WHERE y IS NOT NULL
)
SELECT m, (m * sxy - sx * sy) AS cov_num,
       (m * sxx - sx * sx) AS var_x_num,
       (m * syy - sy * sy) AS var_y_num,
       CAST(CASE WHEN m * sxy - sx * sy < 0 THEN -1
                 WHEN m * sxy - sx * sy > 0 THEN 1 ELSE 0 END AS INT) AS r_sign,
       CAST(CAST(m * sxy - sx * sy AS HUGEINT)
            * CAST(m * sxy - sx * sy AS HUGEINT) * 1000000
            // (CAST(m * sxx - sx * sx AS HUGEINT)
                * CAST(m * syy - sy * sy AS HUGEINT)) AS BIGINT) AS r2_ppm
FROM s
""",
    tags=("timeseries", "analytics"),
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — burstiness /
    trend persistence readout. Exact integer statistics: the Pearson
    cross-multiplication numerators (m*Sxy - Sx*Sy etc.) are BIGINTs and
    r^2 lands as signed ppm via decimal(38) — no sqrt, no float summation,
    so the hash can never wobble. The series is days-sized (the heavy
    input collapses in the first map-side combine); the lead() pairing
    runs on that tiny series with a constant non-foldable partition key."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy(F.dayofmonth("day") % F.lit(1)).orderBy("day")
    pairs = daily.select(
        F.col("c").alias("x"), F.lead("c").over(w).alias("y")
    ).where(F.col("y").isNotNull())
    s = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    d38 = lambda c: c.cast("decimal(38,0)")
    return s.select(
        "m",
        num.alias("cov_num"),
        dx.alias("var_x_num"),
        dy.alias("var_y_num"),
        F.when(num < 0, -1).when(num > 0, 1).otherwise(0).cast("int").alias("r_sign"),
        F.floor(d38(num) * d38(num) * 1000000 / (d38(dx) * d38(dy)))
        .cast("long")
        .alias("r2_ppm"),
    )


@register(
    "window_nth_value",
    oracle="""
WITH r AS (
  SELECT c_nationkey, c_name, c_acctbal, c_custkey,
         nth_value(c_name, 2) OVER w AS second_name,
         nth_value(c_name, 3) OVER w AS third_name,
         row_number() OVER w AS rn
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT c_nationkey, second_name, third_name FROM r WHERE rn = 1
""",
    tags=("window",),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-partition frame: per nation, the 2nd- and
    3rd-richest customers' names (fully tie-broken ordering) — the
    window-function surface beyond first/last_value. One row per nation
    via the same window's row_number."""
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_rn = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.nth_value("c_name", 2).over(w).alias("second_name"),
            F.nth_value("c_name", 3).over(w).alias("third_name"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("c_nationkey", "second_name", "third_name")
    )


@register(
    "events_trigram_paths",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
""",
    tags=("events", "analytics"),
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the 20 most common 3-step event-type
    paths across all users (the Sankey-diagram feed). ONE window sort per
    user yields both lookaheads (Spark reuses the exchange+sort for the
    two lead() calls), then a map-side-combined count over the ~|types|^3
    path space. Full tie-break under LIMIT."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = _t(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        o.where(F.col("t3").isNotNull())
        .groupBy(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@register(
    "orders_seasonality_decompose",
    oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
  FROM orders GROUP BY 1
),
w AS (
  SELECT month, total_cents,
         CAST(sum(total_cents) OVER win AS BIGINT) AS ma12_total,
         CAST(count(*) OVER win AS BIGINT) AS n_in_window
  FROM m
  WINDOW win AS (ORDER BY month ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
)
SELECT month, total_cents, ma12_total,
       CAST(total_cents * 12 * 1000000 // ma12_total AS BIGINT)
           AS seasonal_ppm
FROM w WHERE n_in_window = 12
""",
    tags=("timeseries", "analytics"),
)
def orders_seasonality_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonality decomposition readout over monthly revenue:
    trailing-12-month moving total as the trend and each month's seasonal
    index as its share of trend (x12, integer ppm — no float division).
    Months with fewer than 12 trailing observations are excluded rather
    than emitting a partial-window trend. The heavy scan collapses to the
    months-sized series in the first map-side combine; the tiny series
    window uses a constant non-foldable partition key."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            )
        )
    )
    win = (
        W.partitionBy(F.length("month") % F.lit(1))
        .orderBy("month")
        .rowsBetween(-11, W.currentRow)
    )
    return (
        m.select(
            "month",
            "total_cents",
            F.sum("total_cents").over(win).alias("ma12_total"),
            F.count(F.lit(1)).over(win).alias("n_in_window"),
        )
        .where(F.col("n_in_window") == 12)
        .select(
            "month",
            "total_cents",
            "ma12_total",
            F.expr(
                "CAST(total_cents * 12 * 1000000 DIV ma12_total AS BIGINT)"
            ).alias("seasonal_ppm"),
        )
    )


@register(
    "part_substitution_candidates",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_brand, p_type, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
)
SELECT a.p_type, CAST(a.p_size AS INT) AS p_size,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(abs(a.cents - b.cents) * 1000
                // least(a.cents, b.cents)) AS BIGINT) AS min_gap_milli,
       CAST(min(a.p_partkey) AS BIGINT) AS sample_partkey
FROM p a JOIN p b
  ON a.p_type = b.p_type AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE a.p_brand <> b.p_brand
  AND abs(a.cents - b.cents) * 10 <= least(a.cents, b.cents)
GROUP BY 1, 2
""",
    tags=("join", "analytics"),
)
def part_substitution_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substitute-product discovery: per (type, size) block, count
    cross-brand part pairs priced within 10% of each other (candidate
    substitutions for assortment/pricing analysis).

    Scale shape (rewritten r07): the sf1 audit measured the bare block
    self-join at 22x wall on 10x data, and banding CANNOT fix it — at sf1
    95% of all block pairs qualify (63.4M of 66.6M), so any enumeration is
    Theta(N^2) because the ANSWER is. This form never materializes a pair:
    every output is computed by RANK ARITHMETIC in O(N log N):

    - n_pairs: for each part x (rank r by (cents, pk) in its block), the
      qualifying partners ordered after x are those with cents <=
      floor(1.1*cents_x) — a searchsorted count. Data rows and probe rows
      (val = (cents*11) div 10) are unioned and a per-block running count
      of data rows gives cnt_le(probe); after(x) = cnt_le - r. The same
      pass partitioned by (block, brand) gives same-brand counts;
      n_pairs = sum(after_block - after_brand).
    - min_gap_milli: the minimizing cross-brand pair is always a part and
      the LAST element of the previous brand-run in (cents, pk) order
      (exchange argument: any closer middle element yields a <= gap pair
      nearer in order), so runs + one lag over the run table enumerate a
      linear candidate superset; the exact integer predicate filters it.
    - sample_partkey = min(a.pk) over pairs = min pk among PARTICIPANTS
      (parts with any qualifying cross-brand partner): the min-pk
      participant's partner necessarily has a larger pk. Participation =
      after-count + before-count > 0, before via the lo-side probe
      val = ceil(10*cents/11) - 1.

    All price math is integer cents; the milli gap is trunc division on
    positives (matches DuckDB's integer `/` after CAST). The oracle stays
    the naive quadratic ground truth, so the gate proves the rank
    arithmetic exact."""
    from impalatogo_spark.session import tracked_persist

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    wb = W.partitionBy("p_type", "p_size").orderBy("cents", "p_partkey")
    wbr = W.partitionBy("p_type", "p_size", "p_brand").orderBy("cents", "p_partkey")
    d = tracked_persist(
        p.withColumn("r", F.row_number().over(wb))
        .withColumn("rb", F.row_number().over(wbr))
        .withColumn("hi", F.expr("(cents * 11) DIV 10"))
        .withColumn("lo1", F.expr("(cents * 10 + 10) DIV 11 - 1"))
    )

    def cnt_pass(keys: list) -> DataFrame:
        """Per-part searchsorted counts within the `keys` partitions:
        cnth = #elements with cents <= floor(1.1*cents_x),
        cntl = #elements with cents <  ceil(10*cents_x/11)."""
        data = d.select(
            *keys,
            F.col("cents").alias("val"),
            F.lit(0).alias("isp"),
            F.lit(None).cast("long").alias("pk"),
            F.lit(None).cast("string").alias("kind"),
        )
        probes = d.select(
            *keys,
            F.col("p_partkey").alias("pk"),
            F.explode(
                F.array(
                    F.struct(F.col("hi").alias("val"), F.lit("h").alias("kind")),
                    F.struct(F.col("lo1").alias("val"), F.lit("l").alias("kind")),
                )
            ).alias("pr"),
        ).select(
            *keys,
            F.col("pr.val").alias("val"),
            F.lit(1).alias("isp"),
            "pk",
            F.col("pr.kind").alias("kind"),
        )
        wv = (
            W.partitionBy(*keys)
            .orderBy("val", "isp")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        c = data.unionByName(probes).withColumn(
            "cum", F.sum(1 - F.col("isp")).over(wv)
        )
        return (
            c.where(F.col("isp") == 1)
            .groupBy("pk")
            .agg(
                F.max(F.when(F.col("kind") == "h", F.col("cum"))).alias("cnth"),
                F.max(F.when(F.col("kind") == "l", F.col("cum"))).alias("cntl"),
            )
        )

    blk = cnt_pass(["p_type", "p_size"]).withColumnsRenamed(
        {"cnth": "cnth_k", "cntl": "cntl_k"}
    )
    br = cnt_pass(["p_type", "p_size", "p_brand"]).withColumnsRenamed(
        {"cnth": "cnth_b", "cntl": "cntl_b"}
    )
    stats = (
        d.join(blk, d.p_partkey == blk.pk)
        .drop("pk")
        .join(br, d.p_partkey == br.pk)
        .drop("pk")
        .withColumn(
            "after_cross",
            (F.col("cnth_k") - F.col("r")) - (F.col("cnth_b") - F.col("rb")),
        )
        .withColumn(
            "before_cross",
            (F.col("r") - F.col("cntl_k")) - (F.col("rb") - F.col("cntl_b")),
        )
    )
    agg = stats.groupBy("p_type", "p_size").agg(
        F.sum("after_cross").cast("long").alias("n_pairs"),
        F.min(
            F.when(
                F.col("after_cross") + F.col("before_cross") > 0,
                F.col("p_partkey"),
            )
        ).alias("sample_partkey"),
    )

    # min-gap candidates: each part vs the last element of the previous
    # same-brand run in (cents, pk) order within its block
    wcum = wb.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev_brand = F.lag("p_brand").over(wb)
    runs_rows = d.withColumn(
        "run",
        F.sum(
            F.when(
                prev_brand.isNull() | (prev_brand != F.col("p_brand")), 1
            ).otherwise(0)
        ).over(wcum),
    )
    run_tbl = runs_rows.groupBy("p_type", "p_size", "run").agg(
        F.max("cents").alias("run_last")
    )
    wrun = W.partitionBy("p_type", "p_size").orderBy("run")
    run_tbl = run_tbl.withColumn("prev_last", F.lag("run_last").over(wrun))
    gaps = (
        runs_rows.join(run_tbl, ["p_type", "p_size", "run"])
        .where(
            F.col("prev_last").isNotNull()
            & ((F.col("cents") - F.col("prev_last")) * 10 <= F.col("prev_last"))
        )
        .groupBy("p_type", "p_size")
        .agg(
            F.min(
                F.expr("(cents - prev_last) * 1000 DIV prev_last")
            ).alias("min_gap_milli")
        )
    )
    return (
        agg.where(F.col("n_pairs") > 0)
        .join(gaps, ["p_type", "p_size"])
        .select(
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            "n_pairs",
            F.col("min_gap_milli").cast("long").alias("min_gap_milli"),
            F.col("sample_partkey").cast("long").alias("sample_partkey"),
        )
    )


@register(
    "agg_mode_deterministic",
    oracle="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
mx AS (SELECT o_orderstatus, max(n) AS mn FROM c GROUP BY 1)
SELECT c.o_orderstatus, min(c.o_orderpriority) AS modal_priority,
       CAST(max(c.n) AS BIGINT) AS modal_count
FROM c JOIN mx ON c.o_orderstatus = mx.o_orderstatus AND c.n = mx.mn
GROUP BY 1
""",
    tags=("agg",),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the builtin mode() in BOTH engines
    picks an arbitrary winner under ties, which can never pass a hash
    gate — so the engine computes it as two map-side-combined aggregates
    (value counts, per-group max) with a min-value tie-break, the exact
    same rule the oracle states. The count relation is |group x value|-
    sized; its max join-back broadcasts."""
    c = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mx = c.groupBy("o_orderstatus").agg(F.max("n").alias("mn"))
    return (
        c.join(F.broadcast(mx), "o_orderstatus")
        .where(F.col("n") == F.col("mn"))
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_orderpriority").alias("modal_priority"),
            F.max("n").alias("modal_count"),
        )
    )


@register(
    "agg_argminmax_countif",
    oracle="""
WITH t AS (
  SELECT o_orderstatus, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey
             AS v
  FROM orders
)
SELECT o_orderstatus,
       CAST(count_if(v % 2 = 1) AS BIGINT) AS n_odd,
       CAST(arg_max(o_orderkey, v) AS BIGINT) AS biggest_order,
       CAST(arg_min(o_orderkey, v) AS BIGINT) AS smallest_order
FROM t GROUP BY 1
""",
    tags=("agg", "functions"),
)
def agg_argminmax_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / max_by / min_by (DuckDB arg_max/arg_min) aggregate
    battery. The by-value is made STRICTLY unique (cents scaled plus the
    key) because argmin/argmax under ties is engine-arbitrary — the same
    determinism rule as the mode query. All three are ordinary 2-phase
    aggregates."""
    t = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        (
            F.round(F.col("o_totalprice") * 100).cast("long") * 10000000
            + F.col("o_orderkey")
        ).alias("v"),
    )
    return t.groupBy("o_orderstatus").agg(
        F.count_if(F.col("v") % 2 == 1).alias("n_odd"),
        F.max_by("o_orderkey", "v").alias("biggest_order"),
        F.min_by("o_orderkey", "v").alias("smallest_order"),
    )


@register(
    "events_activity_bitmap",
    oracle="""
WITH mn AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
b AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << (CAST(ts AS DATE) - mn.d0)) AS bitmap
  FROM events, mn GROUP BY 1
)
SELECT user_id, bitmap,
       CAST(bit_count(bitmap) AS INT) AS n_active_days,
       CAST(CASE WHEN bitmap & 127 = 127 THEN 1 ELSE 0 END AS INT)
           AS active_first_week
FROM b
""",
    tags=("events", "analytics"),
)
def events_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily-activity bitmap: one BIGINT with bit i set iff the
    user was active on day i of the observation window (<= 63 days by
    construction of the testdata's 30-day span) — the roaring-bitmap-lite
    encoding behind streak/retention queries: n_active_days is a
    popcount, 'active every day of week 1' is a mask test, and the whole
    reduction is a 2-phase bit_or (commutative, O(1) state — the cheapest
    possible distinct-day aggregate). Day indexes are anchored to a
    broadcast 1-row corpus min date."""
    mn = _t(spark, sf_dir, "events").agg(F.min(F.to_date("ts")).alias("d0"))
    b = (
        _t(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mn))
        .select(
            "user_id",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), datediff(CAST(ts AS DATE), d0))"
            ).alias("day_bit"),
        )
        .groupBy("user_id")
        .agg(F.bit_or("day_bit").alias("bitmap"))
    )
    return b.select(
        "user_id",
        "bitmap",
        F.bit_count("bitmap").cast("int").alias("n_active_days"),
        F.when((F.col("bitmap").bitwiseAND(127)) == 127, 1)
        .otherwise(0)
        .cast("int")
        .alias("active_first_week"),
    )


@register(
    "events_streak_longest",
    oracle="""
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INT) AS anchor
  FROM d
),
runs AS (
  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len,
         strftime(min(day), '%Y-%m-%d') AS streak_start
  FROM r GROUP BY 1, 2
),
best AS (
  SELECT user_id, max(len) AS longest FROM runs GROUP BY 1
)
SELECT b.user_id, b.longest,
       min(r2.streak_start) AS first_longest_start,
       CAST(count(*) AS BIGINT) AS n_longest_streaks
FROM best b JOIN runs r2 ON r2.user_id = b.user_id AND r2.len = b.longest
GROUP BY 1, 2
""",
    tags=("events", "window"),
)
def events_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the canonical
    gaps-and-islands reduction: day minus per-user row_number is constant
    exactly within a consecutive run, so streaks fall out of ONE keyed
    window + two map-side-combined aggregates (no self-join, no
    iteration). Deterministic tie handling: earliest start and the count
    of equal-length longest streaks are both reported."""
    d = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    runs = r.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
    )
    best = runs.groupBy("user_id").agg(F.max("len").alias("longest"))
    return (
        runs.join(best, "user_id")
        .where(F.col("len") == F.col("longest"))
        .groupBy("user_id", "longest")
        .agg(
            F.min("streak_start").alias("first_longest_start"),
            F.count(F.lit(1)).alias("n_longest_streaks"),
        )
    )


@register(
    "documents_readability_scores",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
             AS n_words,
         CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
              AS BIGINT) AS n_vowels
  FROM documents
)
SELECT doc_id, n_words, n_vowels,
       CAST(n_vowels * 1000 // n_words AS BIGINT) AS vowels_per_word_milli,
       CASE WHEN n_vowels * 1000 // n_words >= 2200 THEN 'dense'
            WHEN n_vowels * 1000 // n_words >= 1800 THEN 'medium'
            ELSE 'light' END AS reading_band
FROM t
""",
    tags=("text", "quality"),
)
def documents_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability proxy per document: vowel density as the syllable
    stand-in (the Flesch-style complexity axis that survives punctuation-
    free corpora), in exact integer milli with banded levels. Pure
    codegen string arithmetic — the regexp vowel strip and word count
    never leave the JVM, zero shuffle."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("long").alias("n_words"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
        ).cast("long").alias("n_vowels"),
    )
    vpw = F.expr("CAST(n_vowels * 1000 DIV n_words AS BIGINT)")
    return t.select(
        "doc_id",
        "n_words",
        "n_vowels",
        vpw.alias("vowels_per_word_milli"),
        F.when(vpw >= 2200, "dense")
        .when(vpw >= 1800, "medium")
        .otherwise("light")
        .alias("reading_band"),
    )


@register(
    "events_ab_srm_check",
    oracle="""
WITH a AS (
  SELECT user_id,
         CAST(strpos('0123456789abcdef',
                     substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 1))
              - 1 AS BIGINT) % 2 AS arm
  FROM (SELECT DISTINCT user_id FROM events)
),
c AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM a
)
SELECT n_a, n_b,
       CAST((n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) AS BIGINT)
           AS chi2_milli,
       CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) > 3841
                 THEN 1 ELSE 0 END AS INT) AS srm_flag
FROM c
""",
    tags=("events", "analytics"),
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the md5-parity A/B split (the
    experimentation-QA gate run before trusting any lift readout, see
    events_ab_lift_exact): chi-square for a 50/50 split reduces to
    (n_a - n_b)^2 / n, computed in exact integer milli; the flag trips at
    the 3.841 critical value (chi^2_1, p=0.05). One distinct + one
    2-phase conditional count — no floats anywhere."""
    a = (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))),
                        1, 1,
                    ),
                    16, 10,
                ).cast("long")
                % 2
            ).alias("arm")
        )
    )
    c = a.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    chi = F.expr("CAST((n_a - n_b) * (n_a - n_b) * 1000 DIV (n_a + n_b) AS BIGINT)")
    return c.select(
        "n_a",
        "n_b",
        chi.alias("chi2_milli"),
        F.when(chi > 3841, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


@register(
    "events_cohort_ltv_curve",
    oracle="""
WITH firstw AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
  FROM events GROUP BY 1
),
wk AS (
  SELECT f.cohort,
         CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort) // 7
              AS BIGINT) AS widx,
         CAST(round(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN firstw f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
g AS (
  SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, widx,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM wk GROUP BY 1, 2
)
SELECT cohort_week, widx, revenue_cents,
       CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week ORDER BY widx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
FROM g
""",
    tags=("events", "analytics"),
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: purchase revenue by signup-week cohort and weeks-
    since-signup, with the cumulative curve per cohort — the
    lifetime-value readout growth teams plot. Revenue is integer cents;
    week arithmetic is Monday-anchored date_trunc in both engines; the
    cumulative window is PARTITIONED by cohort (weeks-sized partitions).
    Two keyed shuffles: the per-user first-week reduce and the
    (cohort, week) rollup."""
    ev = _t(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    wk = (
        ev.where(F.col("event_type") == "purchase")
        .join(firstw, "user_id")
        .select(
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort"))
                / 7
            ).cast("long").alias("widx"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    g = wk.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"), "widx"
    ).agg(F.sum("cents").alias("revenue_cents"))
    w = (
        W.partitionBy("cohort_week")
        .orderBy("widx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        "cohort_week",
        "widx",
        "revenue_cents",
        F.sum("revenue_cents").over(w).alias("cum_cents"),
    )


@register(
    "lineitem_return_rate_trend",
    oracle="""
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS return_ppm
FROM lineitem GROUP BY 1
""",
    tags=("agg", "timeseries"),
)
def lineitem_return_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return-rate trend (share of lineitems flagged 'R', integer
    ppm) — the operational quality metric over the biggest fact table.
    Single scan, 2-phase conditional aggregate; everything after the
    map-side combine is months-sized."""
    li = _t(spark, sf_dir, "lineitem")
    ret = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    return (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            ret.alias("n_returned"),
        )
        .select(
            "month",
            "n_lines",
            "n_returned",
            F.expr("CAST(n_returned * 1000000 DIV n_lines AS BIGINT)").alias(
                "return_ppm"
            ),
        )
    )


@register(
    "join_null_safe_eq",
    oracle="""
WITH a AS (
  SELECT nullif(o_custkey % 7, 0) AS k,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
b AS (
  SELECT nullif(c_custkey % 7, 0) AS k,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1
)
SELECT coalesce(CAST(a.k AS VARCHAR), '<null>') AS k,
       a.n_orders, b.n_customers
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    tags=("join", "semantics"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Impala's <=> operator as a JOIN key,
    sql-parser.y NULLSAFE_EQ): NULL keys MATCH each other instead of
    silently dropping — Spark's eqNullSafe against DuckDB's IS NOT
    DISTINCT FROM. Both sides pre-aggregate so the null-safe comparison
    runs on grouped relations (Spark plans a hash join with the null-safe
    key wrapped in coalesce-style knownfloatingpointnormalized equality;
    no nested-loop fallback). NULL keys are derived deterministically via
    nullif so the match path is actually exercised."""
    a = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_custkey") % 7, F.lit(0)).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        F.coalesce(a["k"].cast("string"), F.lit("<null>")).alias("k"),
        "n_orders",
        "n_customers",
    )


@register(
    "agg_covar_exact",
    oracle="""
WITH t AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
           AS covar_num,
       CAST(sign(count(*) * sum(x * y) - sum(x) * sum(y)) AS INT)
           AS covar_sign
FROM t GROUP BY 1
""",
    tags=("agg", "stats"),
)
def agg_covar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance numerator per group (n*Sxy - Sx*Sy over integer
    quantity x price-cents) — the deterministic twin of the engines'
    covar_pop builtin, whose float accumulation order makes a rounded
    result hash-unstable across partitionings (the tpch_q9 lesson). The
    sign and scaled numerator carry the full analytical content; dividing
    by n^2 is presentation. Single 2-phase aggregate."""
    t = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    num = (
        F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
        - F.sum("x") * F.sum("y")
    )
    return t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        num.alias("covar_num"),
        F.signum(num).cast("int").alias("covar_sign"),
    )


@register(
    "events_inter_arrival_stats",
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us,
         event_id
  FROM events
),
r AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY gap_us, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS BIGINT)
           AS p50_gap_us,
       CAST(max(CASE WHEN rn = (n * 9 + 9) // 10 THEN gap_us END) AS BIGINT)
           AS p90_gap_us
FROM r GROUP BY 1
""",
    tags=("events", "timeseries"),
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type (the event-stream
    SLA/latency readout): exact p50/p90 of the microsecond gaps, defined
    by EXPLICIT rank selection — element at rank floor((n+1)/2) resp.
    ceil(0.9*n) under a fully tie-broken sort — because the engines'
    quantile builtins disagree on discrete-percentile tie rules. Two
    keyed windows (gap via lag, rank) over event_type partitions; all
    integers, no interpolation."""
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    g = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        "event_id",
    ).where(F.col("gap_us").isNotNull())
    wr = W.partitionBy("event_type").orderBy("gap_us", "event_id")
    wn = W.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("gap_us"))
        ).alias("p50_gap_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 9 + 9) DIV 10"), F.col("gap_us"))
        ).alias("p90_gap_us"),
    )
