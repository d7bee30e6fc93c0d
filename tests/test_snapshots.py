"""Corpus snapshots (operators/snapshots.py): time travel, incremental
diff scans, and snapshot expiry — the manifest-planned read path an
append-only training corpus needs."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from impalatogo_spark.operators import snapshots as snap


@pytest.fixture()
def path():
    p = tempfile.mkdtemp(prefix="i2s_snap_")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _batch(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit(tag).alias("batch")
    )


def test_time_travel_reads_exact_versions(spark, path):
    v0 = snap.snapshot_write(spark, path, _batch(spark, 0, 100, "a"))
    v1 = snap.snapshot_write(spark, path, _batch(spark, 100, 150, "b"))
    v2 = snap.snapshot_write(spark, path, _batch(spark, 150, 160, "c"))
    assert (v0, v1, v2) == (0, 1, 2)
    assert snap.head_version(path) == 2

    assert snap.snapshot_read(spark, path, 0).count() == 100
    assert snap.snapshot_read(spark, path, 1).count() == 150
    assert snap.snapshot_read(spark, path).count() == 160
    # a version's content is frozen: later writes are invisible to it
    tags = {r.batch for r in snap.snapshot_read(spark, path, 1).collect()}
    assert tags == {"a", "b"}


def test_diff_is_only_the_new_rows(spark, path):
    snap.snapshot_write(spark, path, _batch(spark, 0, 100, "a"))
    snap.snapshot_write(spark, path, _batch(spark, 100, 150, "b"))
    snap.snapshot_write(spark, path, _batch(spark, 150, 160, "c"))

    d01 = snap.snapshot_diff(spark, path, 0, 1)
    assert {r.doc_id for r in d01.collect()} == set(range(100, 150))
    d02 = snap.snapshot_diff(spark, path, 0)  # to head
    assert d02.count() == 60
    assert snap.snapshot_diff(spark, path, None, 0).count() == 100
    assert snap.snapshot_diff(spark, path, 2, 2).count() == 0


def test_diff_feeds_incremental_processing(spark, path):
    """The O(batch) incremental shape: dedup the DIFF against itself, never
    rescanning the accumulated corpus."""
    snap.snapshot_write(spark, path, _batch(spark, 0, 1000, "a"))
    dup = _batch(spark, 990, 1010, "b")  # 10 dups vs snapshot 0, 10 new
    snap.snapshot_write(spark, path, dup)
    new_only = snap.snapshot_diff(spark, path, 0).join(
        snap.snapshot_read(spark, path, 0), "doc_id", "left_anti"
    )
    assert new_only.count() == 10


def test_expire_keeps_head_readable(spark, path):
    snap.snapshot_write(spark, path, _batch(spark, 0, 100, "a"))
    snap.snapshot_write(spark, path, _batch(spark, 100, 150, "b"))
    snap.snapshot_write(spark, path, _batch(spark, 150, 160, "c"))
    before_files = len(glob.glob(os.path.join(path, "data", "*", "*.parquet")))

    report = snap.snapshot_expire(path, keep_last=2)
    assert report["expired"] == 1
    # snapshot 0's files are still referenced by snapshots 1 and 2 -> kept
    assert report["deleted_files"] == 0
    assert snap.snapshot_read(spark, path, 1).count() == 150
    assert snap.snapshot_read(spark, path).count() == 160
    with pytest.raises(FileNotFoundError):
        snap.snapshot_read(spark, path, 0)
    assert len(glob.glob(os.path.join(path, "data", "*", "*.parquet"))) \
        == before_files


def test_streaming_ingest_commits_snapshot_per_batch(spark, path, tmp_path):
    """streaming/ingest.py::streaming_snapshot_ingest: one snapshot per
    micro-batch; time travel reproduces the corpus after every drop and
    snapshot_diff returns exactly one batch."""
    from impalatogo_spark.streaming.ingest import (
        documents_stream,
        streaming_snapshot_ingest,
    )

    src = str(tmp_path / "drops")
    for i in range(3):
        _batch(spark, i * 10, i * 10 + 10, f"drop{i}").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    q = streaming_snapshot_ingest(
        documents_stream(spark, src, max_files_per_trigger=1),
        path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    assert snap.head_version(path) == 2
    assert snap.snapshot_read(spark, path, 0).count() == 10
    assert snap.snapshot_read(spark, path).count() == 30
    per_batch = snap.snapshot_diff(spark, path, 0, 1)
    assert per_batch.count() == 10
    assert len({r.batch for r in per_batch.collect()}) == 1


def test_snapshot_drift_report(spark, path):
    """snapshot_drift: per-group doc/mass counts at two versions + deltas
    (the mixture-shift readout between corpus versions)."""
    base = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 7 + 10).alias("n_chars"),
    )
    snap.snapshot_write(spark, path, base)
    snap.snapshot_write(
        spark,
        path,
        spark.range(100, 140).select(
            F.col("id").alias("doc_id"), F.lit("fr").alias("lang"),
            F.lit(5).cast("long").alias("n_chars"),
        ),
    )
    drift = snap.snapshot_drift(spark, path, ["lang"], 0, 1,
                                mass_col="n_chars").collect()
    by_lang = {r.lang: r for r in drift}
    assert by_lang["en"].docs_delta == 0 and by_lang["de"].docs_delta == 0
    assert by_lang["fr"].docs_old == 0
    assert by_lang["fr"].docs_new == 40 and by_lang["fr"].mass_delta == 200
    assert by_lang["en"].docs_old == 50


def test_schema_evolution_merge_read(spark, path):
    """A later batch ADDS a column; merge_schema=True reads the union
    schema with NULLs for pre-existing rows (additive evolution)."""
    snap.snapshot_write(spark, path, _batch(spark, 0, 20, "a"))
    snap.snapshot_write(
        spark,
        path,
        _batch(spark, 20, 30, "b").withColumn("quality", F.lit(7).cast("long")),
    )
    df = snap.snapshot_read(spark, path, merge_schema=True)
    assert "quality" in df.columns and df.count() == 30
    assert df.filter(F.col("quality").isNull()).count() == 20
    # time travel to v0 never sees the new column
    assert "quality" not in snap.snapshot_read(spark, path, 0).columns


def test_diff_after_expire_fails_cleanly_and_full_read_works(spark, path):
    snap.snapshot_write(spark, path, _batch(spark, 0, 10, "a"))
    snap.snapshot_write(spark, path, _batch(spark, 10, 20, "b"))
    snap.snapshot_write(spark, path, _batch(spark, 20, 30, "c"))
    snap.snapshot_expire(path, keep_last=1)
    # 'everything' mode never walks expired parents
    assert snap.snapshot_diff(spark, path, None).count() == 30
    with pytest.raises(ValueError, match="expired"):
        snap.snapshot_diff(spark, path, 0)


def test_expire_twice_and_tmp_leftovers(spark, path):
    """A second expire after a smaller-keep_last expire must not crash on
    already-deleted manifests, and crashed writers' .tmp files are
    ignored."""
    for i in range(4):
        snap.snapshot_write(spark, path, _batch(spark, i * 10, i * 10 + 10, "x"))
    snap.snapshot_expire(path, keep_last=1)
    open(os.path.join(path, "snapshots", "snap-0000000002.json.tmp"),
         "w").write("{}")
    report = snap.snapshot_expire(path, keep_last=2)  # must not crash
    assert report["expired"] == 0  # only one manifest survives already
    assert snap.snapshot_read(spark, path).count() == 40


def test_orphan_manifest_recovery(spark, path):
    """A manifest committed without its HEAD update (crash window) is
    adopted as head — the next write builds on it instead of overwriting
    its version (no silent data loss)."""
    import json as _json

    snap.snapshot_write(spark, path, _batch(spark, 0, 10, "a"), note="batch-0")
    v1 = snap.snapshot_write(spark, path, _batch(spark, 10, 20, "b"),
                             note="batch-1")
    # simulate the crash: regress HEAD to v0 while snap-1 exists
    with open(os.path.join(path, "snapshots", "HEAD"), "w") as fh:
        fh.write("0")
    assert snap.head_version(path) == v1  # newest manifest wins
    assert snap.find_note(path, "batch-1") == v1  # replay would be skipped
    v2 = snap.snapshot_write(spark, path, _batch(spark, 20, 30, "c"),
                             note="batch-2")
    assert v2 == v1 + 1
    assert snap.snapshot_read(spark, path).count() == 30  # nothing lost
