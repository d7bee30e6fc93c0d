"""HBase-equivalent KV table (sources/kvstore.py): region-pruned row-key
range scans (hbase-scan-node.cc SetScanRanges), versioned puts/deletes with
newest-wins reads (hbase-table-sink.cc), and compaction."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from impalatogo_spark.sources import kvstore as kv


@pytest.fixture(scope="module")
def tbl(spark):
    path = tempfile.mkdtemp(prefix="i2s_kv_")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 100).alias("v"),
        F.concat(F.lit("row"), F.col("id")).alias("payload"),
    )
    kv.create_table(spark, path, df, key="k", n_regions=4)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_full_scan_round_trip(spark, tbl):
    got = kv.scan(spark, tbl)
    assert got.count() == 1000
    assert set(got.columns) == {"k", "v", "payload"}
    row = got.filter(F.col("k") == 123).first()
    assert (row.v, row.payload) == (123 * 7 % 100, "row123")


def test_range_scan_prunes_regions(spark, tbl):
    """A row-key range covering one region reads ONLY that region's files
    (the SetScanRanges region-pruning contract)."""
    meta = kv._read_meta(tbl)
    assert len(meta["regions"]) == 4
    r0_stop = meta["regions"][0]["stop_key"]
    pruned = kv._prune_regions(meta, start_key=0, stop_key=r0_stop)
    assert [r["region"] for r in pruned] == [0]

    df = kv.scan(spark, tbl, start_key=100, stop_key=200)
    rows = df.collect()
    assert {r.k for r in rows} == set(range(100, 200))
    # start inclusive / stop exclusive, the HBase convention
    assert kv.scan(spark, tbl, start_key=100, stop_key=101).count() == 1


def test_point_get(spark, tbl):
    row = kv.get(spark, tbl, 777)
    assert row is not None and row.payload == "row777"
    assert kv.get(spark, tbl, 10_000) is None


def test_versioned_put_and_delete(spark, tbl):
    """Newest version per key wins; tombstones hide rows (HBase
    latest-timestamp-wins Put / versioned Delete)."""
    updates = spark.createDataFrame(
        [(5, 999, "updated5"), (1005, 1, "new1005")],
        "k long, v long, payload string",
    )
    assert kv.put_batch(spark, tbl, updates) == 2
    got = kv.scan(spark, tbl)
    assert got.count() == 1001
    assert got.filter(F.col("k") == 5).first().payload == "updated5"
    assert got.filter(F.col("k") == 1005).first().payload == "new1005"

    dels = spark.createDataFrame([(7, 0, "x")], "k long, v long, payload string")
    kv.put_batch(spark, tbl, dels, delete=True)
    assert kv.scan(spark, tbl).filter(F.col("k") == 7).count() == 0
    # a later put resurrects the key (version ordering, not set logic)
    kv.put_batch(spark, tbl, dels)
    assert kv.scan(spark, tbl).filter(F.col("k") == 7).count() == 1


def test_compact_preserves_scan(spark, tbl):
    before = {(r.k, r.v, r.payload) for r in kv.scan(spark, tbl).collect()}
    report = kv.compact(spark, tbl)
    assert report["files_before"] > report["files_after"]
    after_files = [
        f
        for rdir in os.listdir(tbl)
        if rdir.startswith("region-")
        for f in os.listdir(os.path.join(tbl, rdir))
        if f.endswith(".parquet")
    ]
    assert len(after_files) == 4  # one file per region
    after = {(r.k, r.v, r.payload) for r in kv.scan(spark, tbl).collect()}
    assert before == after


def test_projection_reaches_parquet_scan(spark, tbl):
    """Column projection prunes the parquet ReadSchema and the key range
    reaches PushedFilters — the scan does less work per region file, the
    reference's qualifier-projection + filter-offer behavior."""
    df = kv.scan(spark, tbl, start_key=10, stop_key=20, columns=["k", "v"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "payload" not in plan.split("PushedFilters")[0].split("ReadSchema")[-1]
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,10)" in plan


def test_streaming_sink_versioned_puts(spark, tmp_path):
    """writeStream into the KV table via the DataSource V2 stream writer:
    per-batch versioned puts become visible atomically at commit, newest
    version wins, and region metadata widens to cover new keys."""
    from impalatogo_spark.sources.kvstore import KVStoreSinkDataSource

    spark.dataSource.register(KVStoreSinkDataSource)
    path = str(tmp_path / "kvt")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v"),
        F.concat(F.lit("base"), F.col("id")).alias("payload"),
    )
    kv.create_table(spark, path, base, key="k", n_regions=3)

    src = str(tmp_path / "updates")
    for lo, hi, tag in ((50, 60, "u1"), (95, 130, "u2")):
        spark.range(lo, hi).select(
            F.col("id").alias("k"), F.lit(1).cast("long").alias("v"),
            F.concat(F.lit(tag), F.col("id")).alias("payload"),
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k long, v long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("kvstore_sink")
        .option("path", path)
        .option("key", "k")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = kv.scan(spark, path)
    assert got.count() == 130  # 100 base + 30 new keys (100..129)
    assert got.filter(F.col("k") == 55).first().payload == "u155"
    assert got.filter(F.col("k") == 120).first().payload == "u2120"
    assert got.filter(F.col("k") == 10).first().payload == "base10"
    # region metadata widened to the new key range -> range scans find them
    assert kv.scan(spark, path, start_key=125).count() == 5


def test_pending_files_invisible_until_commit(spark, tmp_path):
    """A staged pending-*.tmp file (crashed pre-commit write) must be
    invisible to scan() and survive compact() untouched — the sink's
    exactly-once-by-visibility contract."""
    path = str(tmp_path / "kvp")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    kv.create_table(spark, path, base, key="k", n_regions=2)

    import pyarrow as pa
    import pyarrow.parquet as pq

    rdir = os.path.join(path, "region-00000")
    pending = os.path.join(rdir, "pending-deadbeef.tmp")
    pq.write_table(
        pa.table({"k": [999], "v": [999], "__kv_version": [9],
                  "__kv_tombstone": [False]}),
        pending,
    )
    assert kv.scan(spark, path).count() == 40  # orphan not visible
    kv.put_batch(spark, path, spark.range(40, 45).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    kv.compact(spark, path)
    assert os.path.exists(pending)  # compaction never folds/deletes it
    got = kv.scan(spark, path)
    assert got.count() == 45 and got.filter(F.col("k") == 999).count() == 0


def test_streaming_sink_string_keys(spark, tmp_path):
    """String row keys (the normal HBase case) through the streaming
    sink."""
    from impalatogo_spark.sources.kvstore import KVStoreSinkDataSource

    spark.dataSource.register(KVStoreSinkDataSource)
    path = str(tmp_path / "kvs")
    base = spark.range(0, 20).select(
        F.format_string("row%03d", F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    kv.create_table(spark, path, base, key="k", n_regions=2)

    src = str(tmp_path / "upd")
    spark.createDataFrame([("row005", 500), ("row099", 990)],
                          "k string, v long").coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("k string, v long")
        .parquet(src)
        .writeStream.format("kvstore_sink")
        .option("path", path)
        .option("key", "k")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = kv.scan(spark, path)
    assert got.count() == 21
    assert got.filter(F.col("k") == "row005").first().v == 500
    assert got.filter(F.col("k") == "row099").first().v == 990


def test_empty_table_then_put(spark, tmp_path):
    """create_table on an EMPTY frame leaves one open-range region; a later
    put stores rows instead of silently dropping them."""
    path = str(tmp_path / "kvempty")
    schema_df = spark.createDataFrame([], "k long, v long")
    kv.create_table(spark, path, schema_df, key="k", n_regions=4)
    assert kv.scan(spark, path).count() == 0
    n = kv.put_batch(spark, path, spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"))
    assert n == 2
    assert kv.scan(spark, path).count() == 2
    assert kv.get(spark, path, 2).v == 20


def test_put_schema_mismatch_rejected(spark, tbl):
    with pytest.raises(ValueError, match="do not match table schema"):
        kv.put_batch(spark, tbl, spark.createDataFrame(
            [(1, 2)], "k long, wrong long"))
