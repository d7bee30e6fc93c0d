"""Custom external source (Python DataSource V2): partitioned reads,
deterministic content, and the filter-pushdown contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impalatogo_spark.sources import SyntheticDocsDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticDocsDataSource)


def test_reads_all_docs(spark):
    df = spark.read.format("synthetic_docs").option("n_docs", 200).load()
    assert df.count() == 200
    assert df.columns == ["doc_id", "text", "n_chars"]


def test_deterministic_content(spark):
    a = spark.read.format("synthetic_docs").option("n_docs", 50).load().collect()
    b = spark.read.format("synthetic_docs").option("n_docs", 50).load().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    row = {r.doc_id: r for r in a}[7]
    assert row.n_chars == len(row.text)


def test_partitioned_read(spark):
    df = spark.read.format("synthetic_docs").option("n_docs", 100).option(
        "n_shards", 5
    ).load()
    assert df.rdd.getNumPartitions() == 5


def test_filter_pushdown_range(spark):
    """Range predicate on doc_id is consumed by the source: only the pruned
    shards are generated (the equivalent of the reference's accepted
    conjuncts, data-source-scan-node.cc)."""
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 100000)
        .load()
        .filter((F.col("doc_id") >= 500) & (F.col("doc_id") < 520))
    )
    rows = df.collect()
    assert len(rows) == 20
    assert {r.doc_id for r in rows} == set(range(500, 520))


def test_residual_filter_still_applied(spark):
    """Filters the source can't consume (on text) are re-applied by Spark."""
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 300)
        .load()
        .filter((F.col("doc_id") < 100) & F.col("text").like("%spark%"))
    )
    assert all("spark" in r.text and r.doc_id < 100 for r in df.collect())


def test_data_source_ddl_lifecycle(spark):
    """CREATE/SHOW/DROP DATA SOURCE + CREATE TABLE ... PRODUCED BY DATA
    SOURCE (sql-parser.y:897, CreateDataSrcStmt/CreateTableDataSrcStmt):
    CLASS carries a Python DataSource class path — the Spark-native
    analogue of the reference's ExternalDataSource jar class."""
    from impalatogo_spark.engine import Engine

    eng = Engine(spark)
    eng.sql(
        "CREATE DATA SOURCE synth LOCATION '/tmp/none' CLASS "
        "'impalatogo_spark.sources.external.SyntheticDocsDataSource' "
        "API_VERSION 'V1'"
    )
    # duplicate without IF NOT EXISTS raises; with it, no-op
    with pytest.raises(ValueError):
        eng.create_data_source("synth", "/x", "y.z", "V1")
    eng.sql(
        "CREATE DATA SOURCE IF NOT EXISTS synth LOCATION '/x' CLASS "
        "'impalatogo_spark.sources.external.SyntheticDocsDataSource' "
        "API_VERSION 'V1'"
    )

    shown = eng.sql("SHOW DATA SOURCES").collect()
    assert [r.name for r in shown] == ["synth"]
    assert shown[0]["api version"] == "V1"
    assert eng.sql("SHOW DATA SOURCES LIKE 'sy*'").count() == 1
    assert eng.sql("SHOW DATA SOURCES LIKE 'nope|zz*'").count() == 0

    eng.sql("CREATE TABLE sdocs PRODUCED BY DATA SOURCE synth('n_docs=25')")
    assert spark.table("sdocs").count() == 25
    assert spark.table("sdocs").columns == ["doc_id", "text", "n_chars"]

    eng.sql("DROP DATA SOURCE synth")
    with pytest.raises(ValueError):
        eng.sql("DROP DATA SOURCE synth")
    eng.sql("DROP DATA SOURCE IF EXISTS synth")
    spark.catalog.dropTempView("sdocs")


def test_streaming_read_from_python_datasource(spark, tmp_path):
    """The same Python DataSource serves readStream (DataSource V2 streaming
    API): positional offsets advance docs_per_batch per micro-batch; the
    full bounded corpus arrives exactly once, content identical to the
    batch read."""
    import time

    df = (
        spark.readStream.format("synthetic_docs")
        .option("n_docs", 30)
        .option("docs_per_batch", 10)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("synth_stream").count() >= 30:
                break
            time.sleep(1)
        got = spark.table("synth_stream").collect()
    finally:
        q.stop()
    assert len(got) == 30  # exactly once, no duplicates past the bound
    batch = spark.read.format("synthetic_docs").option("n_docs", 30).load().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_streaming_datasource_restart_no_reemit(spark, tmp_path):
    """Restart from the checkpoint resumes at the committed offset — no
    regression, no re-emitted docs (the SimpleDataSourceStreamReader is
    stateless: position lives only in Spark's offset log)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(n_docs: int):
        df = (
            spark.readStream.format("synthetic_docs")
            .option("n_docs", n_docs)
            .option("docs_per_batch", 10)
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # availableNow + the simple reader drains one prefetched increment per
    # run, so EVERY run() below is a fresh restart from the offset log
    for _ in range(3):
        run(30)
    assert spark.read.parquet(out).count() == 30
    for _ in range(2):
        run(50)  # restarts must deliver ONLY docs 30..49, once
    got = spark.read.parquet(out).collect()
    assert len(got) == 50
    assert sorted(r.doc_id for r in got) == list(range(50))  # no duplicates
