"""DDL & catalog surface (SURVEY.md §2.12): CREATE/DROP TABLE & VIEW, CTAS,
INSERT INTO/OVERWRITE with dynamic partitions, ANALYZE/COMPUTE STATS,
SHOW/DESCRIBE, and the NESTED PATH JSON feature. All writes go to a temp
warehouse dir."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from impalatogo_spark.engine import Engine
from impalatogo_spark.session import register_tables, table


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    e = Engine(spark)
    register_tables(spark, sf_dir)
    e.drop_database("i2s_test")
    e.create_database("i2s_test")
    yield e
    e.drop_database("i2s_test")


def test_ctas_and_select(eng):
    eng.ctas(
        "i2s_test.nation_copy",
        "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    )
    assert eng.sql("SELECT count(*) AS c FROM i2s_test.nation_copy").first().c == 25


def test_partitioned_ctas_prunes(eng, spark):
    eng.ctas(
        "i2s_test.nation_part",
        "SELECT n_nationkey, n_name, n_regionkey FROM nation",
        partition_by=("n_regionkey",),
    )
    df = spark.sql("SELECT * FROM i2s_test.nation_part WHERE n_regionkey = 2")
    assert df.count() == 5
    # partition pruning: only one partition directory scanned
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan


def test_insert_into_and_overwrite(eng, spark, sf_dir):
    eng.ctas("i2s_test.region_copy", "SELECT * FROM region WHERE 1=0")
    eng.insert_into("i2s_test.region_copy", table(spark, sf_dir, "region"))
    assert spark.table("i2s_test.region_copy").count() == 5
    eng.insert_into(
        "i2s_test.region_copy",
        table(spark, sf_dir, "region").limit(2),
        overwrite=True,
    )
    assert spark.table("i2s_test.region_copy").count() == 2


def test_dynamic_partition_overwrite(eng, spark, sf_dir):
    """INSERT OVERWRITE with dynamic partitions replaces only the partitions
    present in the input (the reference's per-partition overwrite,
    be/src/exec/hdfs-table-sink.cc)."""
    eng.ctas(
        "i2s_test.nation_dyn",
        "SELECT n_nationkey, n_name, n_regionkey FROM nation",
        partition_by=("n_regionkey",),
    )
    n = table(spark, sf_dir, "nation")
    replacement = (
        n.filter(F.col("n_regionkey") == 0)
        .withColumn("n_name", F.lit("REPLACED"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    eng.insert_into("i2s_test.nation_dyn", replacement, overwrite=True)
    t = spark.table("i2s_test.nation_dyn")
    assert t.filter("n_regionkey = 0").filter("n_name = 'REPLACED'").count() == 5
    # other partitions untouched
    assert t.filter("n_regionkey <> 0").count() == 20


def test_views(eng, spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW big_cust AS "
        "SELECT * FROM customer WHERE c_acctbal > 9000"
    )
    assert spark.table("big_cust").count() > 0
    spark.sql("DROP VIEW big_cust")


def test_compute_stats_feeds_cbo(eng, spark):
    eng.ctas("i2s_test.stats_t", "SELECT * FROM supplier")
    eng.compute_stats("i2s_test.stats_t")
    desc = spark.sql("DESCRIBE EXTENDED i2s_test.stats_t").collect()
    stats_rows = [r for r in desc if r.col_name == "Statistics"]
    assert stats_rows and "rows" in stats_rows[0].data_type


def test_show_and_describe(eng):
    tables = {r.tableName for r in eng.sql("SHOW TABLES IN i2s_test").collect()}
    assert "nation_copy" in tables
    cols = {r.col_name for r in eng.describe("i2s_test.nation_copy").collect()}
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols


def test_show_files(eng, spark):
    """SHOW FILES IN <table> (sql-parser.y SHOW FILES): one row per data
    file with size and partition-relative path, including partitioned
    layouts."""
    rows = eng.show_files("i2s_test.nation_copy").collect()
    assert rows and all(r.size > 0 for r in rows)
    assert all(not r.path.startswith("_") for r in rows)
    prows = eng.show_files("i2s_test.nation_part").collect()
    assert prows and any("n_regionkey=" in r.partition for r in prows)
    # SQL-statement surface: SHOW FILES IN <table> through Engine.sql
    srows = eng.sql("SHOW FILES IN i2s_test.nation_copy").collect()
    assert {r.path for r in srows} == {r.path for r in rows}


def test_show_create_table(eng):
    """SHOW CREATE TABLE round-trips the table's DDL (show-create-table.test;
    fe ToSqlUtils.getCreateTableSql)."""
    ddl = eng.show_create_table("i2s_test.nation_copy")
    assert "CREATE TABLE" in ddl
    assert "nation_copy" in ddl
    assert "n_nationkey" in ddl and "n_regionkey" in ddl


def test_unmatched_schema_null_fills_old_files(eng, spark):
    """Scanner behavior when table metadata has MORE columns than a data file
    (test-unmatched-schema.test): rows from pre-ALTER files read NULL for the
    added column; post-ALTER inserts carry real values."""
    eng.ctas("i2s_test.unmatched", "SELECT n_nationkey, n_name FROM nation")
    spark.sql("ALTER TABLE i2s_test.unmatched ADD COLUMN (new_col STRING)")
    spark.sql(
        "INSERT INTO i2s_test.unmatched VALUES (99, 'NEWLAND', 'fresh')"
    )
    rows = spark.table("i2s_test.unmatched").collect()
    assert len(rows) == 26
    old = [r for r in rows if r.n_nationkey != 99]
    assert all(r.new_col is None for r in old)
    assert [r.new_col for r in rows if r.n_nationkey == 99] == ["fresh"]


def test_wide_row_10mb_string(eng, spark):
    """wide-row.test: a 10 MB string value survives write+scan+length()."""
    spark.sql(
        "SELECT repeat('x', 10485760) AS string_col"
    ).write.mode("overwrite").saveAsTable("i2s_test.widerow")
    got = eng.sql("SELECT length(string_col) AS l FROM i2s_test.widerow").first().l
    assert got == 10485760


def test_alter_table_add_drop_column(eng, spark):
    """ALTER TABLE ADD/DROP COLUMN (AlterTableAddReplaceColsStmt.java)."""
    eng.ctas("i2s_test.alter_t", "SELECT n_nationkey FROM nation")
    spark.sql("ALTER TABLE i2s_test.alter_t ADD COLUMN (extra STRING)")
    assert "extra" in spark.table("i2s_test.alter_t").columns
    # parquet tables don't support DROP COLUMN in place; RENAME is metadata-only
    spark.sql("ALTER TABLE i2s_test.alter_t RENAME TO i2s_test.alter_t2")
    assert spark.table("i2s_test.alter_t2").count() == 25


def test_nested_path_json_table(eng, spark):
    """ImpalaToGo NESTED PATH: scalar columns bound to dotted JSON paths
    (fe/.../analysis/ColumnDef.java:41-54; delimited-text-parser-json.cc)."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "docs.json")
        with open(path, "w") as f:
            for i in range(3):
                f.write(
                    json.dumps(
                        {"id": i, "user": {"name": f"u{i}", "score": i * 1.5},
                         "tags": {"primary": "x"}}
                    )
                    + "\n"
                )
        flat = eng.create_json_table(
            "json_flat",
            path,
            {
                "id": ("bigint", "id"),
                "user_name": ("string", "user.name"),
                "user_score": ("double", "user.score"),
                "primary_tag": ("string", "tags.primary"),
            },
        )
        rows = {r.id: r for r in flat.collect()}
        assert rows[2].user_name == "u2" and rows[2].user_score == 3.0
        assert spark.table("json_flat").count() == 3


def test_csv_and_json_round_trip(eng, spark, sf_dir):
    """Text-format scan/sink parity (hdfs-text-scanner.cc / text writer):
    csv with custom delimiter + json lines, written and read back."""
    n = table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as d:
        csv_dir = os.path.join(d, "csv")
        n.write.options(sep="|", header=True).csv(csv_dir)
        back = spark.read.options(sep="|", header=True, inferSchema=True).csv(csv_dir)
        assert back.count() == 25 and set(back.columns) == set(n.columns)
        json_dir = os.path.join(d, "json")
        n.write.json(json_dir)
        jback = spark.read.json(json_dir)
        assert jback.count() == 25


def test_load_data_files_into_table(eng, spark, sf_dir):
    """LOAD DATA (fe/.../analysis/LoadDataStmt.java): move files into the
    table location + refresh — here file copy into the table dir followed by
    REFRESH TABLE, the documented Spark mapping (SURVEY.md §2.2)."""
    import shutil

    eng.ctas("i2s_test.load_t", "SELECT * FROM region WHERE 1=0")
    desc = spark.sql("DESCRIBE EXTENDED i2s_test.load_t").collect()
    loc = next(r.data_type for r in desc if r.col_name == "Location")
    loc_path = loc.replace("file:", "")
    src = table(spark, sf_dir, "region")
    src.write.mode("overwrite").parquet("/tmp/i2s_load_stage")
    n_copied = 0
    for f in os.listdir("/tmp/i2s_load_stage"):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join("/tmp/i2s_load_stage", f), loc_path)
            n_copied += 1
    assert n_copied > 0
    eng.refresh("i2s_test.load_t")
    assert spark.table("i2s_test.load_t").count() == 5


def test_avro_gated(spark, sf_dir):
    """Native spark-avro module detection: when absent (this container),
    the write fails with a clean error naming avro — and the REAL executed
    Avro coverage lives in tests/test_avro.py via the pure-Python container
    reader (impalatogo_spark/sources/avro.py) incl. schema resolution."""
    n = table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as d:
        try:
            n.write.format("avro").save(os.path.join(d, "av"))
        except Exception as e:
            assert "avro" in str(e).lower()
            return
        back = spark.read.format("avro").load(os.path.join(d, "av"))
        assert back.count() == 25


def test_char_varchar_semantics(eng, spark):
    """CHAR(n)/VARCHAR(n) semantics (§1.2, be/src/runtime/types.h:63-64):
    CHAR pads reads to n; VARCHAR truncates on write is an error in Spark
    (like Impala analysis error) but fitting values round-trip."""
    spark.sql("DROP TABLE IF EXISTS i2s_test.chars_t")
    spark.sql(
        "CREATE TABLE i2s_test.chars_t (c CHAR(6), v VARCHAR(8)) USING parquet"
    )
    spark.sql("INSERT INTO i2s_test.chars_t VALUES ('ab', 'hello')")
    row = spark.table("i2s_test.chars_t").first()
    assert row.c == "ab    "  # CHAR(6) right-pads
    assert row.v == "hello"
    assert spark.sql(
        "SELECT length(c) AS lc FROM i2s_test.chars_t"
    ).first().lc == 6
    # overflow: value longer than VARCHAR(8) must be rejected (Impala:
    # analysis error; Spark: runtime error on write)
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.sql("INSERT INTO i2s_test.chars_t VALUES ('x', 'waytoolongvalue')")


def test_insert_column_permutation(eng, spark):
    """QueryTest/insert_permutation.test: INSERT INTO t (cols...) in a
    different order than the schema maps by NAME; unmentioned columns
    null-fill. Spark SQL handles the by-name mapping natively through the
    engine's SQL path."""
    eng.sql("CREATE TABLE i2s_test.perm (a INT, b STRING, c DOUBLE)")
    eng.sql("INSERT INTO i2s_test.perm (b, a) VALUES ('x', 1)")
    eng.sql("INSERT INTO i2s_test.perm (c, b, a) VALUES (2.5, 'y', 2)")
    rows = sorted(spark.table("i2s_test.perm").collect(), key=lambda r: r.a)
    assert [(r.a, r.b, r.c) for r in rows] == [(1, "x", None), (2, "y", 2.5)]


def test_mixed_format_partitions(eng, spark, tmp_path):
    """QueryTest/mixed-format.test: partitions in DIFFERENT file formats read
    transparently as one table (per-partition scanner dispatch,
    hdfs-scan-node.cc:237-260), with partition pruning across formats."""
    mt = eng.create_mixed_format_table("mixedfmt", "month", str(tmp_path))
    rows = lambda m: spark.range(1, 11).select(  # noqa: E731
        F.col("id").cast("int").alias("int_col"),
        (F.col("id") * m).cast("bigint").alias("val"),
    )
    mt.insert_partition(1, rows(1), "text")      # delimited text (csv)
    mt.insert_partition(2, rows(2), "parquet")
    mt.insert_partition(3, rows(3), "orc")

    # read all partitions transparently (count + sum forces deserialization)
    r = eng.sql("SELECT count(*) AS c, sum(int_col) AS s, sum(val) AS v FROM mixedfmt").first()
    assert (r.c, r.s, r.v) == (30, 165, 55 * (1 + 2 + 3))

    # restrict to a multi-format subset
    r = eng.sql(
        "SELECT count(*) AS c, sum(val) AS v FROM mixedfmt WHERE month = 1 OR month = 3"
    ).first()
    assert (r.c, r.v) == (20, 55 * 4)

    # single partition
    r = eng.sql("SELECT count(*) AS c, sum(val) AS v FROM mixedfmt WHERE month = 2").first()
    assert (r.c, r.v) == (10, 110)

    # partition pruning ACROSS formats: month=2 constant-folds the csv/orc
    # branches to empty relations — only the parquet scan survives the plan
    plan = spark.sql("SELECT sum(val) AS v FROM mixedfmt WHERE month = 2") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Scan csv" not in plan and "Scan orc" not in plan
    assert "Scan parquet" in plan

    # ALTER ... SET FILEFORMAT is metadata-only reinterpretation
    mt.set_fileformat(3, "orc")  # no-op change keeps the table readable
    assert eng.sql("SELECT count(*) AS c FROM mixedfmt").first().c == 30


def test_incremental_stats_and_partition_listing(eng, spark):
    """COMPUTE INCREMENTAL STATS PARTITION + SHOW PARTITIONS / TABLE STATS
    (round-2 parity: the reference's per-partition stats accumulation and
    shell listing surface)."""
    spark.sql("DROP TABLE IF EXISTS i2s_test.part_stats_t")
    spark.sql(
        "CREATE TABLE i2s_test.part_stats_t (x INT, p STRING) "
        "USING parquet PARTITIONED BY (p)"
    )
    spark.sql(
        "INSERT INTO i2s_test.part_stats_t PARTITION (p='a') VALUES (1), (2)"
    )
    spark.sql(
        "INSERT INTO i2s_test.part_stats_t PARTITION (p='b') VALUES (3)"
    )
    parts = {r[0] for r in eng.show_partitions("i2s_test.part_stats_t").collect()}
    assert parts == {"p=a", "p=b"}
    eng.compute_incremental_stats("i2s_test.part_stats_t", {"p": "a"})
    eng.compute_incremental_stats("i2s_test.part_stats_t")
    stats = eng.show_table_stats("i2s_test.part_stats_t").collect()
    assert any("Statistics" in r[0] for r in stats)
    cols = {r[0] for r in eng.show_column_stats("i2s_test.part_stats_t").collect()}
    assert "x" in cols and "p" in cols
    spark.sql("DROP TABLE i2s_test.part_stats_t")


def test_create_table_like_parquet(eng, spark, sf_dir):
    """CREATE TABLE ... LIKE PARQUET '<file>' infers columns from the parquet
    footer (sql-parser.y:831 create_tbl_like_file_stmt /
    CreateTableLikeFileStmt.java footer walk)."""
    spark.sql("DROP TABLE IF EXISTS i2s_test.like_nation")
    eng.sql(
        "CREATE TABLE i2s_test.like_nation LIKE PARQUET "
        f"'{sf_dir}/nation.parquet' STORED AS PARQUET"
    )
    got = spark.table("i2s_test.like_nation").schema
    want = spark.read.parquet(f"{sf_dir}/nation.parquet").schema
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in want.fields
    ]
    assert spark.table("i2s_test.like_nation").count() == 0
    # IF NOT EXISTS is honored
    eng.sql(
        "CREATE TABLE IF NOT EXISTS i2s_test.like_nation LIKE PARQUET "
        f"'{sf_dir}/nation.parquet'"
    )
    spark.sql("DROP TABLE i2s_test.like_nation")


def test_drop_stats(eng, spark):
    """DROP STATS clears ANALYZE results from the catalog (DropStatsStmt —
    the reference nulls table/column stats in the metastore)."""
    spark.sql("DROP TABLE IF EXISTS i2s_test.stats_t")
    spark.sql("CREATE TABLE i2s_test.stats_t (x INT) USING parquet")
    spark.sql("INSERT INTO i2s_test.stats_t VALUES (1), (2), (3)")
    spark.sql("ANALYZE TABLE i2s_test.stats_t COMPUTE STATISTICS")

    def stats_line() -> str:
        rows = spark.sql("DESCRIBE TABLE EXTENDED i2s_test.stats_t").collect()
        return next((r.data_type for r in rows if r.col_name == "Statistics"), "")

    assert "3 rows" in stats_line()
    eng.sql("DROP STATS i2s_test.stats_t")
    assert "rows" not in stats_line()
    spark.sql("DROP TABLE i2s_test.stats_t")


def test_with_cte_insert(eng, spark):
    """WITH ... INSERT (sql-parser.y:611-624 insert_stmt with w:with):
    a CTE feeding INSERT through the SQL entry."""
    spark.sql("DROP TABLE IF EXISTS i2s_test.cte_ins")
    spark.sql("CREATE TABLE i2s_test.cte_ins (k INT, n BIGINT) USING parquet")
    eng.sql(
        "WITH big AS (SELECT n_regionkey AS k, count(*) AS n FROM nation "
        "GROUP BY n_regionkey) "
        "INSERT INTO i2s_test.cte_ins SELECT k, n FROM big"
    )
    assert spark.table("i2s_test.cte_ins").count() == 5
    spark.sql("DROP TABLE i2s_test.cte_ins")
