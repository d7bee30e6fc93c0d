"""Table-maintenance operators (operators/maintenance.py): small-file
compaction and Z-order layout + footer-stats pruning."""

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from impalatogo_spark.operators import maintenance as Mnt
from impalatogo_spark.session import table


@pytest.fixture()
def tmp_table_dir():
    d = f"/tmp/i2s_maint_{uuid.uuid4().hex[:8]}"
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _checksum(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*df.columns)).alias("h"),
    ).collect()[0]


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_table_dir):
    src = table(spark, sf_dir, "lineitem")
    # simulate streaming-ingest fragmentation: 64 tiny files
    src.repartition(64).write.parquet(tmp_table_dir)
    before = _checksum(spark.read.parquet(tmp_table_dir))

    report = Mnt.compact_table(spark, tmp_table_dir, target_file_mb=16)

    assert report["files_before"] == 64
    assert report["files_after"] < report["files_before"]
    after = _checksum(spark.read.parquet(tmp_table_dir))
    assert (after["n"], after["h"]) == (before["n"], before["h"])
    assert report["rows"] == before["n"]


def test_compact_swap_leaves_no_temp_dirs(spark, sf_dir, tmp_table_dir):
    table(spark, sf_dir, "region").write.parquet(tmp_table_dir)
    Mnt.compact_table(spark, tmp_table_dir, target_file_mb=16)
    parent = os.path.dirname(tmp_table_dir)
    base = os.path.basename(tmp_table_dir)
    leftovers = [
        d for d in os.listdir(parent)
        if d.startswith(base + ".") and ("compact_" in d or "old_" in d)
    ]
    assert leftovers == []


def test_morton_code_interleaves_exactly(spark):
    df = spark.createDataFrame([(3, 5)], "a int, b int")
    [row] = df.select(Mnt.morton_code(F.col("a"), F.col("b"), bits=4).alias("z")).collect()
    # a=0b0011 -> even bit positions, b=0b0101 -> odd bit positions:
    # a0<<0 + b0<<1 + a1<<2 + b1<<3 + a2<<4 + b2<<5 = 1+2+4+0+0+32 = 39
    assert row["z"] == 39


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_table_dir):
    """Z-ordered layout must let footer min/max stats prune files for range
    predicates on EITHER interleaved key; a round-robin layout prunes
    neither. This is the multi-dimensional analogue of partition pruning —
    at 100 TB the difference between scanning ~1/8 of files and all of
    them."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = tmp_table_dir + "_z"
    rpath = tmp_table_dir + "_r"
    try:
        Mnt.zorder_write(li, zpath, "l_partkey", "l_suppkey", n_files=8)
        li.repartition(8).write.parquet(rpath)

        lo_a = li.agg(F.min("l_partkey")).collect()[0][0]
        hi_a = lo_a + 2
        pred_a = f"l_partkey BETWEEN {lo_a} AND {hi_a}"
        lo_b = li.agg(F.min("l_suppkey")).collect()[0][0]
        pred_b = f"l_suppkey BETWEEN {lo_b} AND {lo_b}"

        z_a = Mnt.file_pruning_stats(spark, zpath, pred_a)
        z_b = Mnt.file_pruning_stats(spark, zpath, pred_b)
        r_a = Mnt.file_pruning_stats(spark, rpath, pred_a)

        # round-robin: every file spans the whole key range -> zero pruning
        assert r_a["needed"] == r_a["files"]
        # z-order: narrow ranges on either key touch a strict subset
        assert z_a["needed"] < z_a["files"]
        assert z_b["needed"] < z_b["files"]
        # correctness: the z-ordered table still returns identical data
        zs = _checksum(spark.read.parquet(zpath))
        ls = _checksum(li)
        assert (zs["n"], zs["h"]) == (ls["n"], ls["h"])
    finally:
        shutil.rmtree(zpath, ignore_errors=True)
        shutil.rmtree(rpath, ignore_errors=True)


def test_upsert_updates_and_inserts(spark, tmp_table_dir):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )
    base.write.parquet(tmp_table_dir)
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, score double"
    )
    report = Mnt.upsert_table(spark, tmp_table_dir, updates, key="id")
    assert report == {"rows_before": 3, "rows_after": 4, "updates": 2}
    rows = {r["id"]: (r["name"], r["score"])
            for r in spark.read.parquet(tmp_table_dir).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0),
                    4: ("d", 40.0)}


def test_upsert_rejects_duplicate_update_keys(spark, tmp_table_dir):
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        tmp_table_dir
    )
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, name string"
    )
    with pytest.raises(ValueError, match="distinct"):
        Mnt.upsert_table(spark, tmp_table_dir, dup, key="id")


def test_upsert_from_self_derived_updates(spark, tmp_table_dir):
    """`updates` computed FROM the target table must be counted before the
    swap — the report reflects pre-swap frames, not re-evaluated lineage."""
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, score double"
    ).write.parquet(tmp_table_dir)
    updates = (
        spark.read.parquet(tmp_table_dir)
        .filter(F.col("id") == 1)
        .withColumn("score", F.col("score") + 1)
    )
    report = Mnt.upsert_table(spark, tmp_table_dir, updates, key="id")
    assert report == {"rows_before": 2, "rows_after": 2, "updates": 1}
    rows = {r["id"]: r["score"]
            for r in spark.read.parquet(tmp_table_dir).collect()}
    assert rows == {1: 11.0, 2: 20.0}


def test_file_pruning_rejects_malformed_predicate(spark, tmp_table_dir):
    spark.createDataFrame([(1,)], "x long").write.parquet(tmp_table_dir)
    with pytest.raises(ValueError, match="BETWEEN"):
        Mnt.file_pruning_stats(spark, tmp_table_dir, "x > 3")
