"""dfs_cache parity: local LRU file cache feeding Spark scans
(be/src/dfs_cache/dfs-cache.h cacheEstimate/cachePrepareData,
filesystem-lru-cache.hpp eviction, managed-file pinning, restart rescan)."""

import os
import time

from impalatogo_spark.sources.dfscache import FileCache


def _mk(tmp_path, name, size):
    p = tmp_path / "remote" / name
    p.parent.mkdir(exist_ok=True)
    p.write_bytes(os.urandom(size))
    return f"file://{p}"


def test_estimate_then_prepare_then_zero_estimate(tmp_path):
    uris = [_mk(tmp_path, f"f{i}.bin", 1000) for i in range(3)]
    c = FileCache(str(tmp_path / "cache"), capacity_bytes=10_000)
    assert c.estimate(uris) == 3000
    events = []
    paths = c.prepare(uris, progress=lambda u, d, t: events.append((u, d, t)))
    assert all(os.path.getsize(p) == 1000 for p in paths)
    assert {e[0] for e in events} == set(uris)
    assert all(d <= t for _, d, t in events)
    # second pass: fully cached -> nothing to pull
    assert c.estimate(uris) == 0
    assert c.prepare(uris) == paths
    assert c.weight == 3000


def test_lru_eviction_order_and_touch_promotion(tmp_path):
    uris = [_mk(tmp_path, f"f{i}.bin", 1000) for i in range(4)]
    c = FileCache(str(tmp_path / "cache"), capacity_bytes=2500)  # fits 2
    c.prepare(uris[:2])  # cache f0, f1
    c.prepare([uris[0]])  # touch f0 -> f1 is now coldest
    c.prepare([uris[2]])  # forces eviction of f1, not f0
    assert uris[1] not in c.cached_uris()
    assert uris[0] in c.cached_uris() and uris[2] in c.cached_uris()
    assert c.weight <= 2500


def test_pinned_files_survive_eviction(tmp_path):
    uris = [_mk(tmp_path, f"f{i}.bin", 1000) for i in range(3)]
    c = FileCache(str(tmp_path / "cache"), capacity_bytes=2500)
    c.prepare(uris[:2])
    c.pin(uris[0])
    c.prepare([uris[2]])  # must evict f1 (f0 pinned despite being coldest)
    assert uris[0] in c.cached_uris()
    assert uris[1] not in c.cached_uris()


def test_restart_rescan_rebuilds_index(tmp_path):
    uris = [_mk(tmp_path, f"f{i}.bin", 500) for i in range(3)]
    root = str(tmp_path / "cache")
    c1 = FileCache(root, capacity_bytes=10_000)
    c1.prepare(uris)
    # "daemon restart": a fresh cache over the same root re-registers files
    c2 = FileCache(root, capacity_bytes=10_000)
    assert set(c2.cached_uris()) == set(uris)
    assert c2.estimate(uris) == 0
    assert c2.weight == 1500


def test_read_parquet_through_cache_matches_direct(spark, tmp_path, sf_dir):
    src = os.path.join(sf_dir, "nation.parquet")
    uri = f"file://{src}"
    c = FileCache(str(tmp_path / "cache"), capacity_bytes=1 << 30)
    df = c.read(spark, [uri])
    direct = spark.read.parquet(src)
    assert sorted(df.collect()) == sorted(direct.collect())
    assert c.estimate([uri]) == 0  # resident after the scan
