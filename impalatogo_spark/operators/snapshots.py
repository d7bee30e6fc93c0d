"""Corpus snapshots: append-only manifests with time travel and diff scans.

A continuously-ingesting 100 TB training corpus needs three reads the plain
directory layout cannot give:

  * read AS OF a snapshot (reproduce the exact corpus a model was trained
    on, months later);
  * read only what CHANGED between two snapshots (incremental dedup /
    feature extraction — O(batch), never O(corpus));
  * expire old snapshots without breaking the current one.

This is the Iceberg/Delta manifest pattern reduced to its load-bearing
core: data files are immutable parquet, a snapshot is a JSON manifest
listing exactly the files visible at that version (parent files + the new
batch), and readers plan FROM THE MANIFEST — never from directory listing.
At scale that swap matters twice over: object-store LIST calls disappear
from the read path, and a manifest read is O(files-in-snapshot) metadata,
not O(all-files-ever-written).

Complements operators/maintenance.py (upsert/compaction rewrite files;
here files are immutable and versions are the unit of change) and
streaming/ingest.py (whose per-batch keeps can be committed as one
snapshot per micro-batch)."""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "snapshots"
_DATA_DIR = "data"


def _snap_path(path: str, version: int) -> str:
    return os.path.join(path, _SNAP_DIR, f"snap-{version:010d}.json")


def _head_path(path: str) -> str:
    return os.path.join(path, _SNAP_DIR, "HEAD")


def _manifest_versions(path: str) -> list[int]:
    snap_dir = os.path.join(path, _SNAP_DIR)
    if not os.path.isdir(snap_dir):
        return []
    return sorted(
        int(f.split("-")[1].split(".")[0])
        for f in os.listdir(snap_dir)
        if f.startswith("snap-") and f.endswith(".json")
    )


def head_version(path: str) -> int | None:
    """Current snapshot version, or None for an empty table.

    Crash recovery: the manifest rename (atomic, complete) commits a
    snapshot; the HEAD file is a cache of the max manifest version. If a
    writer died between the two renames, the newest MANIFEST wins — so a
    fully-written snapshot is never orphaned and the next commit can't
    overwrite its version."""
    versions = _manifest_versions(path)
    newest = versions[-1] if versions else None
    try:
        with open(_head_path(path)) as fh:
            head = int(fh.read().strip())
    except FileNotFoundError:
        head = None
    if newest is None:
        return head
    return newest if head is None else max(head, newest)


def _read_snapshot(path: str, version: int) -> dict:
    with open(_snap_path(path, version)) as fh:
        return json.load(fh)


def find_note(path: str, note: str) -> int | None:
    """Version of the newest surviving snapshot committed with `note`, or
    None. Used for idempotent commits: a writer that stamps each commit
    with a unique note (e.g. a micro-batch id) can detect a replay."""
    snap_dir = os.path.join(path, _SNAP_DIR)
    if not os.path.isdir(snap_dir):
        return None
    best = None
    for f in os.listdir(snap_dir):
        if f.startswith("snap-") and f.endswith(".json"):
            v = int(f.split("-")[1].split(".")[0])
            if _read_snapshot(path, v)["note"] == note:
                best = v if best is None else max(best, v)
    return best


def snapshot_write(spark: SparkSession, path: str, df: DataFrame,
                   note: str = "", stamp=None) -> int:
    """Commit `df` as a new snapshot: write immutable data files, then a
    manifest = parent's files + the new ones. Returns the new version.

    `stamp` (optional, (df, version) -> df) lets a caller embed the
    version snapshot_write is ABOUT to commit into the row payload —
    atomically, from the same head read (r06 ADVICE: callers that
    recomputed head+1 themselves could stamp a __v that diverged from the
    committed manifest version under a concurrent writer, corrupting
    last-writer-wins resolution).

    The data write is a normal distributed parquet write (parallelism =
    df's partitioning); only the manifest append is driver-side, and it is
    O(files), not O(rows)."""
    os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
    parent = head_version(path)
    files = list(_read_snapshot(path, parent)["files"]) if parent is not None else []
    version = 0 if parent is None else parent + 1
    if stamp is not None:
        df = stamp(df, version)

    batch_dir = os.path.join(path, _DATA_DIR, uuid.uuid4().hex[:12])
    df.write.parquet(batch_dir)
    new_files = sorted(
        os.path.join(batch_dir, f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )
    manifest = {
        "version": version,
        "parent": parent,
        "note": note,
        "files": files + new_files,
        "added": new_files,
    }
    tmp = _snap_path(path, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _snap_path(path, version))
    with open(_head_path(path) + ".tmp", "w") as fh:
        fh.write(str(version))
    os.replace(_head_path(path) + ".tmp", _head_path(path))
    return version


def snapshot_read(spark: SparkSession, path: str,
                  version: int | None = None,
                  merge_schema: bool = False) -> DataFrame:
    """Read the corpus AS OF `version` (default: head). Plans from the
    manifest's file list — no directory listing, and files added by later
    snapshots are invisible even though they share the data directory.

    merge_schema=True unions the batch schemas (parquet mergeSchema) so a
    corpus whose later batches ADDED columns still reads as one relation —
    older rows carry NULL in the new columns (additive schema evolution;
    renames/retypes are a rewrite, not a read option)."""
    v = head_version(path) if version is None else version
    if v is None:
        raise ValueError(f"No snapshots at {path}")
    manifest = _read_snapshot(path, v)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*manifest["files"])


def snapshot_diff(spark: SparkSession, path: str, from_version: int | None,
                  to_version: int | None = None) -> DataFrame:
    """Rows added AFTER `from_version` up to `to_version` (default head):
    the union of the intermediate snapshots' `added` file lists. This is
    the incremental-processing entry — a dedup or feature pass over the
    diff touches O(new data), never the accumulated corpus.

    from_version=None means 'everything' (diff from before the first
    snapshot)."""
    to_v = head_version(path) if to_version is None else to_version
    if to_v is None:
        raise ValueError(f"No snapshots at {path}")
    if from_version is None:
        # 'everything before the first snapshot' — the target's full file
        # list, no parent walk (expired ancestors are irrelevant)
        return snapshot_read(spark, path, to_v)
    added: list[str] = []
    v: int | None = to_v
    while v is not None and v > from_version:
        try:
            manifest = _read_snapshot(path, v)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot {v} was expired; diff below version {v + 1} "
                f"is unavailable at {path}"
            ) from None
        added = manifest["added"] + added
        v = manifest["parent"]
    if not added:
        return snapshot_read(spark, path, to_v).limit(0)
    return spark.read.parquet(*added)


def snapshot_expire(path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest `keep_last` snapshots and delete data files
    no surviving snapshot references (Iceberg expire_snapshots). Time
    travel to expired versions is gone; the surviving reads are untouched."""
    versions = _manifest_versions(path)
    if not versions:
        return {"expired": 0, "deleted_files": 0}
    # keep the newest keep_last EXISTING manifests (a prior expire with a
    # smaller keep_last may have removed older versions already)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    live: set[str] = set()
    for v in keep:
        live.update(_read_snapshot(path, v)["files"])
    expired = 0
    deleted = 0
    for f in os.listdir(os.path.join(path, _SNAP_DIR)):
        if not (f.startswith("snap-") and f.endswith(".json")):
            continue  # skips crashed writers' .tmp leftovers
        v = int(f.split("-")[1].split(".")[0])
        if v in keep:
            continue
        for df_path in _read_snapshot(path, v)["files"]:
            if df_path not in live and os.path.exists(df_path):
                os.remove(df_path)
                deleted += 1
        os.remove(_snap_path(path, v))
        expired += 1
    # prune emptied batch directories
    data_root = os.path.join(path, _DATA_DIR)
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if os.path.isdir(full) and not any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                shutil.rmtree(full)
    return {"expired": expired, "deleted_files": deleted}


def snapshot_drift(spark: SparkSession, path: str, group_cols: list[str],
                   from_version: int, to_version: int | None = None,
                   mass_col: str | None = None) -> DataFrame:
    """Corpus-composition drift between two snapshots: per `group_cols`
    combination (e.g. [lang, source]), doc counts (and optional `mass_col`
    sums, e.g. chars or tokens) at each version plus their delta — the
    governance readout run before training on a newer corpus version
    ("did the mixture shift?").

    Both sides are manifest-planned scans feeding ONE aggregate each —
    at 100 TB the old side can instead aggregate [old + diff] incrementally,
    but the straightforward two-aggregate form is already a single pass
    over each snapshot with map-side combine."""
    from pyspark.sql import functions as F

    def _agg(df: DataFrame, suffix: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(f"docs{suffix}")]
        if mass_col is not None:
            aggs.append(F.sum(mass_col).alias(f"mass{suffix}"))
        return df.groupBy(*group_cols).agg(*aggs)

    old = _agg(snapshot_read(spark, path, from_version), "_old")
    new = _agg(snapshot_read(spark, path, to_version), "_new")
    out = old.join(new, group_cols, "full_outer")
    zero = F.lit(0).cast("long")
    out = out.select(
        *group_cols,
        F.coalesce("docs_old", zero).alias("docs_old"),
        F.coalesce("docs_new", zero).alias("docs_new"),
        (F.coalesce("docs_new", zero) - F.coalesce("docs_old", zero)
         ).alias("docs_delta"),
        *([
            F.coalesce("mass_old", zero).alias("mass_old"),
            F.coalesce("mass_new", zero).alias("mass_new"),
            (F.coalesce("mass_new", zero) - F.coalesce("mass_old", zero)
             ).alias("mass_delta"),
        ] if mass_col is not None else []),
    )
    return out
