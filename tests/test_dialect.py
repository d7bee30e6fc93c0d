"""Dialect-translation golden tests: each Impala-ism rewrites to runnable
Spark SQL (and actually runs where a fixture exists)."""

from __future__ import annotations

import pytest
import re

from impalatogo_spark.dialect import translate
from impalatogo_spark.engine import Engine
from impalatogo_spark.session import register_tables


def test_broadcast_hint():
    out = translate("SELECT * FROM a JOIN [broadcast] b ON a.x = b.x")
    assert "/*+ BROADCAST(b) */" in out and "[" not in out


def test_broadcast_hint_alias():
    out = translate("SELECT * FROM a JOIN [broadcast] big_table bt ON a.x = bt.x")
    assert "/*+ BROADCAST(bt) */" in out and "JOIN big_table bt ON" in out


def test_shuffle_hint():
    out = translate("SELECT * FROM a JOIN [shuffle] b ON a.x = b.x")
    assert "/*+ SHUFFLE_HASH(b) */" in out


def test_straight_join_stripped():
    out = translate("SELECT STRAIGHT_JOIN a.x FROM a, b")
    assert "STRAIGHT_JOIN" not in out.upper()


def test_invalidate_metadata():
    assert translate("INVALIDATE METADATA mytable") == "REFRESH TABLE mytable"


def test_refresh():
    assert translate("REFRESH mytable") == "REFRESH TABLE mytable"


def test_compute_stats():
    out = translate("COMPUTE STATS lineitem")
    assert out == "ANALYZE TABLE lineitem COMPUTE STATISTICS FOR ALL COLUMNS"


def test_function_rewrites():
    out = translate("SELECT strleft(name, 3), zeroifnull(x) FROM t")
    assert "substring(name, 1, 3)" in out
    assert "coalesce(x, 0)" in out


def test_aggregate_alias_rewrites():
    out = translate(
        "SELECT variance_pop(x), variance_samp(y), distinctpc(z), distinctpcsa(w) FROM t"
    )
    assert "var_pop(x)" in out
    assert "var_samp(y)" in out
    assert out.count("approx_count_distinct") == 2


def test_nested_function_rewrite():
    out = translate("SELECT strleft(strright(name, 5), 2) FROM t")
    assert "substring(substring(name, -(5), 5), 1, 2)" in out


def test_string_literals_protected():
    out = translate("SELECT 'strleft(x, 1)' AS s, \"zeroifnull(y)\" FROM t")
    assert "'strleft(x, 1)'" in out


def test_group_concat_two_args():
    out = translate("SELECT group_concat(name, '|') FROM t")
    assert "array_join(array_sort(collect_list(name)), '|')" in out


def test_engine_runs_translated_sql(spark, sf_dir):
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    df = eng.sql(
        """
        SELECT n_regionkey, ndv(n_nationkey) AS apx, group_concat(n_name, ',') AS gc
        FROM nation JOIN [broadcast] region ON n_regionkey = r_regionkey
        GROUP BY n_regionkey
        """
    )
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.apx > 0 and "," in r.gc or r.apx > 0 for r in rows)


def test_engine_appx_count_distinct_option(spark, sf_dir):
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    eng.set("APPX_COUNT_DISTINCT", 1)
    plan = eng.sql("SELECT count(distinct l_partkey) AS c FROM lineitem")
    val = plan.first().c
    eng.unset("APPX_COUNT_DISTINCT")
    exact = eng.sql("SELECT count(distinct l_partkey) AS c FROM lineitem").first().c
    assert abs(val - exact) / exact < 0.1


def test_engine_explain_levels(spark, sf_dir):
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    for level in (0, 1, 2, 3):
        try:
            text = eng.explain("SELECT count(*) FROM lineitem", level)
        except Exception:
            pytest.skip("explainString JVM helper unavailable")
        assert "Scan" in text or "Aggregate" in text.lower() or len(text) > 0


def test_engine_set_options(spark):
    eng = Engine(spark)
    eng.set("NUM_NODES", 16)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    eng.set("COMPRESSION_CODEC", "zstd")
    assert spark.conf.get("spark.sql.parquet.compression.codec") == "zstd"
    eng.set("NUM_NODES", 8)


def test_and_operator_alias():
    # Impala lexer accepts && for AND (used verbatim in the AMPLab
    # hive-benchmark workload: "pageRank > 10 && pageRank < 25").
    out = translate("SELECT count(*) FROM rankings WHERE pageRank > 10 && pageRank < 25")
    assert "&&" not in out
    assert re.search(r"\bAND\b", out)
    # string literals stay untouched
    out = translate("SELECT * FROM t WHERE s = 'a&&b' && x = 1")
    assert "'a&&b'" in out and out.count("AND") == 1


def test_engine_runs_amplab_and_alias(spark, sf_dir):
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    n = eng.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > 1000 && o_orderstatus = 'F'"
    ).first().n
    ref = eng.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > 1000 AND o_orderstatus = 'F'"
    ).first().n
    assert n == ref and n > 0


def test_timestamp_arith_family_rewrites():
    # impala_functions.py:122-215 *_add/*_sub -> make_interval arithmetic
    out = translate("SELECT years_add(ts, 2) FROM t")
    assert "make_interval((2))" in out and "+" in out
    out = translate("SELECT months_sub(ts, n + 1) FROM t")
    assert "make_interval(0, (n + 1))" in out and "-" in out
    out = translate("SELECT milliseconds_add(ts, 1500) FROM t")
    assert "(1500) / 1000" in out
    # Impala aliases: date_add/adddate/subdate are TIMESTAMP-returning
    out = translate("SELECT date_add(ts, 30) FROM t")
    assert "make_interval(0, 0, 0, (30))" in out
    out = translate("SELECT subdate(ts, 30) FROM t")
    assert "make_interval(0, 0, 0, (30))" in out and "-" in out
    out = translate("SELECT dayname(ts) FROM t")
    assert "date_format(ts, 'EEEE')" in out


def test_timestamp_arith_values(spark):
    eng = Engine(spark)
    row = eng.sql(
        "SELECT CAST(years_add(TIMESTAMP '2020-02-29 10:00:00', 1) AS STRING) AS y,"
        "       CAST(hours_sub(TIMESTAMP '2020-01-01 00:30:00', 1) AS STRING) AS h,"
        "       dayname(TIMESTAMP '2024-01-08') AS dn"
    ).first()
    assert row.y.startswith("2021-02-28")  # boost gregorian clamps leap day
    assert row.h.startswith("2019-12-31 23:30:00")
    assert row.dn == "Monday"


def test_zero_arg_utility_rewrites(spark):
    out = translate("SELECT user(), typeof(1), version()")
    assert "current_user()" in out and "typeof(1)" in out
    eng = Engine(spark)
    row = eng.sql("SELECT user() AS u, typeof(CAST(1 AS INT)) AS t").first()
    assert row.u and row.t == "int"


def test_two_arg_extract_rewrite(spark):
    # Impala extract(ts, 'year') (impala_functions.py:89) vs the standard
    # extract(YEAR FROM ts) — both must work after translation.
    out = translate("SELECT extract(ts, 'year') FROM t")
    assert "date_part('year', ts)" in out
    out = translate("SELECT extract(YEAR FROM ts) FROM t")
    assert "extract(YEAR FROM ts)" in out  # untouched, Spark-native
    eng = Engine(spark)
    row = eng.sql(
        "SELECT extract(TIMESTAMP '2024-03-05 10:11:12', 'month') AS m1, "
        "       extract(MONTH FROM TIMESTAMP '2024-03-05 10:11:12') AS m2"
    ).first()
    assert row.m1 == 3 and row.m2 == 3


def test_trunc_format_mapping(spark):
    # Impala trunc(ts, 'FMT') Oracle-style codes (timestamp-functions.cc
    # TruncUnit) -> date_trunc. Numeric trunc stays untouched.
    assert "date_trunc('QUARTER', ts)" in translate("SELECT trunc(ts, 'Q') FROM t")
    assert "date_trunc('MONTH', ts)" in translate("SELECT trunc(ts, 'MM') FROM t")
    assert "date_trunc('HOUR', ts)" in translate("SELECT trunc(ts, 'HH24') FROM t")
    assert "date_trunc('YEAR', cast(x AS timestamp))" in translate(
        "SELECT trunc(cast(x AS timestamp), 'YYYY') FROM t"
    )
    # numeric trunc -> truncate-toward-zero arithmetic (Spark has no
    # numeric trunc builtin; Impala truncates toward zero, floor would not)
    out = translate("SELECT trunc(price, 2), trunc(price) FROM t")
    assert "date_trunc" not in out and "CAST" in out
    eng = Engine(spark)
    row = eng.sql(
        "SELECT trunc(-1.15, 1) AS a, trunc(3.79) AS b, trunc(1234.5678, -2) AS c"
    ).first()
    assert row.a == -1.1 and row.b == 3.0 and row.c == 1200.0
    row = eng.sql(
        "SELECT CAST(trunc(TIMESTAMP '2024-03-05 10:11:12', 'Q') AS STRING) AS q,"
        "       CAST(trunc(TIMESTAMP '2024-03-05 10:11:12', 'DAY') AS STRING) AS wk,"
        "       CAST(trunc(TIMESTAMP '2024-03-05 10:11:12', 'MI') AS STRING) AS mi"
    ).first()
    assert row.q == "2024-01-01 00:00:00"
    assert row.wk == "2024-03-04 00:00:00"  # Monday
    assert row.mi == "2024-03-05 10:11:00"


def test_truncate_decimal_values(spark):
    eng = Engine(spark)
    row = eng.sql(
        "SELECT truncate(-1.15, 1) AS a, truncate(3.79) AS b, dtrunc(9.99, 1) AS c"
    ).first()
    assert row.a == -1.1 and row.b == 3.0 and row.c == 9.9


def test_null_test_predicates(spark):
    # nullvalue/nonnullvalue (impala_functions.py:530-545): boolean twins
    # of IS [NOT] NULL, any input type.
    eng = Engine(spark)
    row = eng.sql(
        "SELECT nullvalue(CAST(NULL AS INT)) AS a, nullvalue(0) AS b,"
        "       nonnullvalue('') AS c, nonnullvalue(CAST(NULL AS STRING)) AS d"
    ).first()
    assert row.a is True and row.b is False
    assert row.c is True and row.d is False


def test_type_limit_constants(spark):
    # max_int family (impala_functions.py:55-70, UdfBuiltins): typed
    # zero-arg constants; result TYPE matters (tinyint, not int).
    eng = Engine(spark)
    df = eng.sql(
        "SELECT max_tinyint() AS a, min_tinyint() AS b, max_smallint() AS c,"
        "       min_smallint() AS d, max_int() AS e, min_int() AS f,"
        "       max_bigint() AS g, min_bigint() AS h"
    )
    row = df.first()
    assert (row.a, row.b) == (127, -128)
    assert (row.c, row.d) == (32767, -32768)
    assert (row.e, row.f) == (2147483647, -2147483648)
    assert (row.g, row.h) == (9223372036854775807, -9223372036854775808)
    types = [f.dataType.simpleString() for f in df.schema.fields]
    assert types == ["tinyint"] * 2 + ["smallint"] * 2 + ["int"] * 2 + ["bigint"] * 2


def test_decimal_precision_scale(spark):
    # precision/scale (impala_functions.py:350-351, decimal-functions.h:
    # 31-32): DECIMAL-only in the reference; non-decimal input yields NULL
    # here (typeof probe misses the regex).
    eng = Engine(spark)
    row = eng.sql(
        "SELECT precision(CAST(1.5 AS DECIMAL(9,2))) AS p,"
        "       scale(CAST(1.5 AS DECIMAL(9,2))) AS s,"
        "       precision(CAST(NULL AS DECIMAL(38,0))) AS p38,"
        "       precision(1) AS pnd, scale(1.0E0) AS snd"
    ).first()
    assert (row.p, row.s) == (9, 2)
    assert row.p38 == 38  # typeof is a TYPE probe: NULL value still types
    assert row.pnd is None and row.snd is None


def test_full_query_option_table(spark):
    """Every TImpalaQueryOptions case from query-options.cc is accepted by
    SET (mapped or advisory) — the complete 31-option switch."""
    from impalatogo_spark.engine import _SPARK_CONF_OPTIONS

    eng = Engine(spark)
    reference_options = [
        "ABORT_ON_DEFAULT_LIMIT_EXCEEDED", "ABORT_ON_ERROR",
        "ALLOW_UNSUPPORTED_FORMATS", "APPX_COUNT_DISTINCT", "BATCH_SIZE",
        "COMPRESSION_CODEC", "DEBUG_ACTION", "DEFAULT_ORDER_BY_LIMIT",
        "DISABLE_CACHED_READS", "DISABLE_CODEGEN", "DISABLE_OUTERMOST_TOPN",
        "DISABLE_UNSAFE_SPILLS", "EXEC_SINGLE_NODE_ROWS_THRESHOLD",
        "EXPLAIN_LEVEL", "HBASE_CACHE_BLOCKS", "HBASE_CACHING",
        "MAX_BLOCK_MGR_MEMORY", "MAX_ERRORS", "MAX_IO_BUFFERS",
        "MAX_SCAN_RANGE_LENGTH", "MEM_LIMIT", "NUM_NODES",
        "NUM_SCANNER_THREADS", "PARQUET_FILE_SIZE", "QUERY_TIMEOUT_S",
        "REQUEST_POOL", "RESERVATION_REQUEST_TIMEOUT", "RM_INITIAL_MEM",
        "SEQ_COMPRESSION_MODE", "SYNC_DDL", "V_CPU_CORES",
    ]
    assert set(reference_options) == set(_SPARK_CONF_OPTIONS)
    before = {
        c: spark.conf.get(c)
        for c in ("spark.sql.shuffle.partitions",
                  "spark.sql.files.maxPartitionBytes",
                  "spark.sql.codegen.wholeStage")
    }
    for opt in reference_options:
        if opt in ("REQUEST_POOL", "COMPRESSION_CODEC", "DEBUG_ACTION"):
            eng.set(opt, "snappy" if opt == "COMPRESSION_CODEC" else "")
        else:
            eng.set(opt, 0)
        assert opt in eng.options
        eng.unset(opt)
    # UNSET restored every touched Spark conf (0 = default per Impala)
    for c, v in before.items():
        assert spark.conf.get(c) == v, c


def test_disable_outermost_topn_changes_plan(spark, sf_dir):
    """DISABLE_OUTERMOST_TOPN=1 -> ORDER BY + LIMIT plans as full sort +
    limit instead of TakeOrderedAndProject (query-options.cc; the
    reference uses it when the limit is huge)."""
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    q = "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5"

    def plan() -> str:
        df = eng.sql(q)
        return df._jdf.queryExecution().executedPlan().toString()

    assert "TakeOrderedAndProject" in plan()
    eng.set("DISABLE_OUTERMOST_TOPN", 1)
    try:
        assert "TakeOrderedAndProject" not in plan()
    finally:
        eng.set("DISABLE_OUTERMOST_TOPN", 0)
    assert "TakeOrderedAndProject" in plan()


def test_default_order_by_limit(spark, sf_dir):
    """DEFAULT_ORDER_BY_LIMIT appends a LIMIT to a top-level ORDER BY that
    lacks one (legacy Impala safety); bare and already-limited queries are
    untouched."""
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    eng.set("DEFAULT_ORDER_BY_LIMIT", 7)
    try:
        assert eng.sql(
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey").count() == 7
        assert eng.sql(
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3"
        ).count() == 3
        assert eng.sql("SELECT count(*) AS c FROM orders").count() == 1
    finally:
        eng.unset("DEFAULT_ORDER_BY_LIMIT")


def test_abort_on_error_and_explain_level_options(spark, sf_dir):
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    eng.set("ABORT_ON_ERROR", 0)  # keep going -> skip corrupt files
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "true"
    eng.set("ABORT_ON_ERROR", 1)
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false"
    eng.set("EXPLAIN_LEVEL", 0)
    try:
        text = eng.explain("SELECT count(*) FROM lineitem")
    except Exception:
        pytest.skip("explainString JVM helper unavailable")
    finally:
        eng.unset("EXPLAIN_LEVEL")
    assert len(text) > 0


def test_abort_on_error_skips_corrupt_files(spark, tmp_path):
    """ABORT_ON_ERROR=0 (keep going) really skips a corrupt data file;
    =1 (the Impala default) fails the query — the reference's per-scanner
    abort_on_error branch (hdfs-scan-node.cc error handling)."""
    d = str(tmp_path / "t")
    spark.range(0, 10).toDF("x").coalesce(1).write.parquet(d)
    with open(f"{d}/part-corrupt.parquet", "wb") as fh:
        fh.write(b"PAR1 this is not a parquet file")

    eng = Engine(spark)
    eng.set("ABORT_ON_ERROR", 0)
    try:
        assert spark.read.parquet(d).count() == 10
    finally:
        eng.set("ABORT_ON_ERROR", 1)
    with pytest.raises(Exception):
        spark.read.parquet(d).count()
    eng.unset("ABORT_ON_ERROR")


def test_default_order_by_limit_never_truncates_ctas(spark, sf_dir):
    """The DEFAULT_ORDER_BY_LIMIT rewrite applies to plain SELECTs only —
    a CTAS tail ORDER BY must not silently truncate the written table.
    Non-numeric values are rejected at SET time."""
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    eng.set("DEFAULT_ORDER_BY_LIMIT", 3)
    try:
        spark.sql("DROP TABLE IF EXISTS dobl_ctas")
        eng.sql("CREATE TABLE dobl_ctas USING parquet AS "
                "SELECT r_regionkey FROM region ORDER BY r_regionkey")
        assert spark.table("dobl_ctas").count() == 5  # NOT limited to 3
        spark.sql("DROP TABLE dobl_ctas")
    finally:
        eng.unset("DEFAULT_ORDER_BY_LIMIT")
    with pytest.raises(ValueError):
        eng.set("DEFAULT_ORDER_BY_LIMIT", "abc")


def test_explain_level_names_and_clamp(spark, sf_dir):
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    eng.set("EXPLAIN_LEVEL", "verbose")
    try:
        assert len(eng.explain("SELECT count(*) FROM region")) > 0
        assert len(eng.explain("SELECT count(*) FROM region", 7)) > 0
    finally:
        eng.unset("EXPLAIN_LEVEL")


def test_insert_and_scan_bracket_hints_stripped(spark, sf_dir):
    """opt_plan_hints bracket forms outside JOIN position: INSERT-level
    [shuffle|noshuffle|clustered] and scan-level [schedule_*] are advisory
    here (AQE owns the pre-write exchange; no HDFS replicas) — stripped,
    and the statement still runs."""
    assert "[" not in translate("INSERT INTO t [noshuffle] SELECT 1")
    assert "[" not in translate(
        "INSERT OVERWRITE t PARTITION (p) [shuffle, clustered] SELECT 1, 2")
    out = translate("SELECT c1 FROM t [schedule_random_replica]")
    assert "[" not in out
    # join hints still lift, untouched by the strip pass
    out = translate("SELECT * FROM a JOIN [broadcast] b ON a.x = b.x")
    assert "/*+ BROADCAST(b) */" in out
    eng = Engine(spark)
    register_tables(spark, sf_dir)
    n = eng.sql("SELECT count(*) AS n FROM region [schedule_random_replica]").first().n
    assert n == 5


def test_right_semi_anti_join_translation(spark, sf_dir):
    """RIGHT SEMI / RIGHT ANTI JOIN (sql-parser.y join_operator): Spark
    only parses the LEFT forms, so the dialect swaps sides — including a
    parenthesized join-chain left side. Values pinned against the
    equivalent LEFT-form queries."""
    out = translate(
        "SELECT * FROM customer c RIGHT SEMI JOIN nation n "
        "ON c.c_nationkey = n.n_nationkey")
    assert "LEFT SEMI JOIN" in out and "RIGHT SEMI" not in out
    assert out.index("nation n") < out.index("customer c")
    out = translate(
        "SELECT * FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "RIGHT ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE n.n_regionkey = 1")
    assert "LEFT ANTI JOIN (customer c JOIN orders o" in out
    assert out.rstrip().endswith("WHERE n.n_regionkey = 1")

    register_tables(spark, sf_dir)
    eng = Engine(spark)
    semi = eng.sql(
        "SELECT count(*) AS c FROM customer RIGHT SEMI JOIN nation "
        "ON c_nationkey = n_nationkey").first().c
    ref = eng.sql(
        "SELECT count(*) AS c FROM nation LEFT SEMI JOIN customer "
        "ON c_nationkey = n_nationkey").first().c
    assert semi == ref > 0
    anti = eng.sql(
        "SELECT count(*) AS c FROM customer RIGHT ANTI JOIN nation "
        "ON c_nationkey = n_nationkey AND c_acctbal > 9950").first().c
    ref = eng.sql(
        "SELECT count(*) AS c FROM nation LEFT ANTI JOIN customer "
        "ON c_nationkey = n_nationkey AND c_acctbal > 9950").first().c
    assert anti == ref


def test_trunc_week_codes(spark):
    """trunc(ts,'WW'/'W') (timestamp-functions.cc TruncUnit WEEK_OF_YEAR /
    WEEK_OF_MONTH): most recent day <= x whose weekday matches Jan-1 (WW)
    resp. the 1st of x's month (W). Pinned: 2019-01-01 is a Tuesday,
    2019-02-01 a Friday."""
    cases = [
        ("2019-02-08", "WW", "2019-02-05 00:00:00"),
        ("2019-02-08", "W", "2019-02-08 00:00:00"),
        ("2019-01-01", "WW", "2019-01-01 00:00:00"),
        ("2019-01-07", "WW", "2019-01-01 00:00:00"),
        ("2019-01-08", "WW", "2019-01-08 00:00:00"),
        ("2019-02-07", "W", "2019-02-01 00:00:00"),
        ("2019-12-31", "WW", "2019-12-31 00:00:00"),
    ]
    for d, fmt, want in cases:
        sql = translate(
            f"SELECT cast(trunc(cast('{d} 12:34:56' as timestamp), '{fmt}') "
            f"as string) AS v")
        assert "trunc(" not in sql.lower() or "date_trunc" in sql.lower()
        got = spark.sql(sql).first().v
        assert got == want, (d, fmt, got, want)


def test_right_semi_anti_in_subquery_and_comma_join(spark, sf_dir):
    """r03 advice: the RIGHT SEMI/ANTI swap anchored on the leftmost FROM and
    mangled derived tables / EXISTS subqueries / comma-join left sides. The
    balanced-paren scan now skips outer FROMs (the inner one rewrites), the
    ON condition stops at the subquery's closing paren, and a comma join
    swaps only its last relation (comma binds looser than JOIN)."""
    # derived table: the swap happens INSIDE the parens
    out = translate(
        "SELECT * FROM (SELECT n.n_name FROM customer c RIGHT SEMI JOIN "
        "nation n ON c.c_nationkey = n.n_nationkey) t WHERE t.n_name > 'A'")
    assert "RIGHT SEMI" not in out and "LEFT SEMI JOIN" in out
    assert out.index("nation n") < out.index("customer c")
    assert out.count("(") == out.count(")")

    register_tables(spark, sf_dir)
    eng = Engine(spark)
    n = eng.sql(
        "SELECT count(*) AS c FROM (SELECT n.n_name FROM customer c "
        "RIGHT SEMI JOIN nation n ON c.c_nationkey = n.n_nationkey) t"
    ).first().c
    ref = eng.sql(
        "SELECT count(*) AS c FROM (SELECT n.n_name FROM nation n "
        "LEFT SEMI JOIN customer c ON c.c_nationkey = n.n_nationkey) t"
    ).first().c
    assert n == ref > 0

    # EXISTS subquery holding the RIGHT SEMI JOIN
    ex = eng.sql(
        "SELECT count(*) AS c FROM region WHERE EXISTS (SELECT 1 FROM "
        "customer c RIGHT SEMI JOIN nation n ON c.c_nationkey = "
        "n.n_nationkey AND n.n_regionkey = region.r_regionkey)"
    ).first().c
    ex_ref = eng.sql(
        "SELECT count(*) AS c FROM region WHERE EXISTS (SELECT 1 FROM "
        "nation n LEFT SEMI JOIN customer c ON c.c_nationkey = "
        "n.n_nationkey AND n.n_regionkey = region.r_regionkey)"
    ).first().c
    assert ex == ex_ref > 0

    # comma join: FROM a, b RIGHT SEMI JOIN c == a CROSS (b RSJ c)
    cj = eng.sql(
        "SELECT count(*) AS c FROM region r, customer c RIGHT SEMI JOIN "
        "nation n ON c.c_nationkey = n.n_nationkey").first().c
    assert cj == 5 * ref


def test_create_table_stored_as_translation():
    """Impala's Hive-style CREATE TABLE ... STORED AS <fmt> translates to
    Spark's USING form; typed partition columns merge into the schema and
    PARTITIONED BY keeps names only; formats without native Spark writers
    fall through untranslated (their dedicated readers own them)."""
    from impalatogo_spark.dialect import translate

    out = translate("CREATE TABLE t1 (a INT, b STRING) STORED AS PARQUET")
    assert out == "CREATE TABLE t1 (a INT, b STRING) USING parquet"

    out = translate("CREATE EXTERNAL TABLE IF NOT EXISTS db.t2 "
                    "(a DECIMAL(10,2), b STRING) STORED AS ORC "
                    "LOCATION '/tmp/t2'")
    assert out == ("CREATE TABLE IF NOT EXISTS db.t2 "
                   "(a DECIMAL(10,2), b STRING) USING orc "
                   "LOCATION '/tmp/t2'")

    # Hive-style typed partition columns merge into the column list
    out = translate("CREATE TABLE t3 (a INT) PARTITIONED BY (p STRING, "
                    "q INT) STORED AS PARQUET")
    assert out == ("CREATE TABLE t3 (a INT, p STRING, q INT) "
                   "USING parquet PARTITIONED BY (p, q)")

    # TEXTFILE -> csv (the engine's text-format alias)
    out = translate("CREATE TABLE t4 (a INT) STORED AS TEXTFILE")
    assert out == "CREATE TABLE t4 (a INT) USING csv"

    # no native Spark writer: untouched (sources/rcfile.py owns reads)
    src = "CREATE TABLE t5 (a INT) STORED AS RCFILE"
    assert translate(src) == src


def test_create_table_stored_as_executes(spark):
    """The translated DDL executes end-to-end: typed partition columns
    land in the schema, inserts route rows to partitions, reads agree."""
    from impalatogo_spark.engine import Engine

    eng = Engine(spark)
    spark.sql("DROP TABLE IF EXISTS dlt_sa")
    import shutil
    shutil.rmtree("spark-warehouse/dlt_sa", ignore_errors=True)
    try:
        eng.sql("CREATE TABLE dlt_sa (k INT, v STRING) "
                "PARTITIONED BY (p STRING) STORED AS PARQUET")
        eng.sql("INSERT INTO dlt_sa VALUES (1, 'a', 'x'), (2, 'b', 'y')")
        got = sorted(tuple(r) for r in spark.table("dlt_sa").collect())
        assert got == [(1, "a", "x"), (2, "b", "y")]
        parts = {r[0] for r in spark.sql(
            "SHOW PARTITIONS dlt_sa").collect()}
        assert parts == {"p=x", "p=y"}
    finally:
        spark.sql("DROP TABLE IF EXISTS dlt_sa")
