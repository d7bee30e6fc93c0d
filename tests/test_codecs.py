"""Text-scan compression codec matrix (reference:
common/thrift/CatalogObjects.thrift THdfsCompression enum +
be/src/exec/hdfs-text-scanner.cc codec dispatch — the reference scans
gzip/bzip2/deflate/snappy/LZO-compressed text files).

Spark-native mapping: Hadoop's codec registry handles gzip/bzip2/deflate/
lz4/snappy text transparently on read (extension-dispatched, like the
scanner) and as write-side `compression` options — snappy included, via
the pure-JVM snappy-java codec (no native libhadoop needed). LZO has the
repo's own pure-Python reader (sources/lzo.py, tests/test_lzo.py).

Scale note: gzip/snappy text is NOT splittable (one task per file — the
reference has the same constraint, hdfs-text-scanner.cc only splits
uncompressed/LZO-indexed text); bzip2 IS splittable. The round-trips here
pin correctness; split behavior is Hadoop's.
"""

from __future__ import annotations

import glob
import os

import pytest

CODECS_SPLITTABLE = {"none": True, "gzip": False, "bzip2": True,
                     "deflate": False, "lz4": False, "snappy": False}

_EXT = {"none": ".csv", "gzip": ".csv.gz", "bzip2": ".csv.bz2",
        "deflate": ".csv.deflate", "lz4": ".csv.lz4",
        "snappy": ".csv.snappy"}


def _sample_df(spark, sf_dir):
    return (spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
            .select("n_nationkey", "n_name", "n_regionkey"))


@pytest.mark.parametrize("codec", sorted(CODECS_SPLITTABLE))
def test_text_codec_round_trip(codec, spark, sf_dir, tmp_path):
    """CSV write+read round-trip per codec, extension-dispatched on read
    exactly like the reference's scanner (THdfsCompression)."""
    df = _sample_df(spark, sf_dir)
    out = str(tmp_path / f"nation_{codec}")
    df.write.option("compression", codec).option("header", "true").csv(out)
    files = [f for f in glob.glob(os.path.join(out, "part-*"))
             if not f.endswith(".crc")]
    assert files, "no data files written"
    assert all(f.endswith(_EXT[codec]) for f in files), (codec, files)
    back = (spark.read.option("header", "true").option("inferSchema", "true")
            .csv(out))
    want = sorted(tuple(r) for r in df.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want, f"{codec} round-trip diverged"


def test_mixed_codec_directory_scan(spark, sf_dir, tmp_path):
    """One table directory with DIFFERENT codecs per file reads as a
    single scan — the reference explicitly supports mixed compression
    within a table (hdfs-text-scanner.cc dispatches per file)."""
    df = _sample_df(spark, sf_dir)
    out = tmp_path / "mixed"
    out.mkdir()
    for codec in ("none", "gzip", "bzip2"):
        tmp = str(tmp_path / f"stage_{codec}")
        df.write.option("compression", codec).csv(tmp)
        for i, f in enumerate(f for f in glob.glob(f"{tmp}/part-*")
                              if not f.endswith(".crc")):
            os.rename(f, str(out / f"{codec}_{i}{_EXT[codec]}"))
    back = spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT").csv(str(out))
    assert back.count() == 3 * df.count()
    assert back.select("n_nationkey").distinct().count() == df.count()


def test_snappy_parquet_round_trip(spark, sf_dir, tmp_path):
    """Parquet-side snappy (the reference's default parquet codec,
    COMPRESSION_CODEC=snappy) — separate from the text matrix above
    because the codec lives inside the parquet page path."""
    df = _sample_df(spark, sf_dir)
    pq = str(tmp_path / "snappy_parquet")
    df.write.option("compression", "snappy").parquet(pq)
    assert any(f.endswith(".snappy.parquet")
               for f in os.listdir(pq) if f.startswith("part-"))
    assert sorted(tuple(r) for r in spark.read.parquet(pq).collect()) == \
        sorted(tuple(r) for r in df.collect())
