"""HBase-equivalent key-value table over range-partitioned parquet regions.

The reference scans and writes HBase tables through two operators:

  * HBaseScanNode — row-key range scan (`SetScanRanges` start/stop keys picked
    from row-key conjuncts), per-(family:qualifier) column projection, value
    filters offered to the region server
    (be/src/exec/hbase-scan-node.cc:102-212).
  * HBaseTableSink — one versioned Put per row
    (be/src/exec/hbase-table-sink.cc).

A live HBase server is an external-system dependency this container cannot
provide, so this module reproduces the TABLE SEMANTICS the two operators rely
on with a Spark-native layout — the same design HBase itself uses:

  * a table is a set of REGIONS, each owning a contiguous row-key range,
    holding its rows sorted by key (here: one parquet file per region,
    `repartitionByRange` + `sortWithinPartitions` — the HFile invariant);
  * writes are LSM-style versioned puts: each `put_batch` appends per-region
    delta files stamped with a monotonically increasing batch version; reads
    resolve the NEWEST version per key (`max_by` over the version stamp,
    HBase's latest-timestamp-wins) and drop tombstones (versioned deletes);
  * scans prune by row-key range against region metadata BEFORE touching any
    file (the SetScanRanges equivalent) and then push the residual key range
    into the parquet scan (row-group stats prune within the region, the way
    HBase seeks inside an HFile via its block index);
  * `compact` folds deltas back into one file per region (minor compaction).

Everything else (column projection, value-predicate pushdown) rides on the
native parquet reader, which is strictly stronger than the reference's
region-server filter offers.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_kv_meta.json"


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def _write_meta(path: str, meta: dict) -> None:
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, _META))


def _region_dir(path: str, i: int) -> str:
    return os.path.join(path, f"region-{i:05d}")


def create_table(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    key: str,
    n_regions: int = 4,
) -> dict:
    """Create a KV table from `df`: range-partition on the row key into
    `n_regions` regions (HBase pre-split), one sorted parquet file each.

    Region boundaries are recorded in table metadata so scans can prune
    whole regions from the key range alone, before listing a single row —
    the HBaseScanNode SetScanRanges contract."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)
    parted = (
        df.repartitionByRange(n_regions, F.col(key))
        .sortWithinPartitions(key)
        .withColumn("__kv_version", F.lit(0).cast("long"))
        .withColumn("__kv_tombstone", F.lit(False))
    )
    # one pass: write each range partition to its region dir. partitionId is
    # range-ordered under repartitionByRange, so it IS the region ordinal.
    staged = os.path.join(path, "_stage")
    parted.withColumn("__kv_region", F.spark_partition_id()).write.partitionBy(
        "__kv_region"
    ).parquet(staged)
    bounds: list[dict] = []
    n_written = 0
    entries = sorted(
        (int(e.split("=", 1)[1]), e)
        for e in os.listdir(staged)
        if e.startswith("__kv_region=")
    )
    for rid, entry in entries:
        src = os.path.join(staged, entry)
        dst = _region_dir(path, n_written)
        os.makedirs(dst)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(src, f),
                            os.path.join(dst, f"base-{f}"))
        stats = (
            spark.read.parquet(dst)
            .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
            .first()
        )
        bounds.append({"region": n_written, "start_key": stats.lo,
                       "stop_key": stats.hi, "_rid": rid})
        n_written += 1
    shutil.rmtree(staged)
    if not bounds:
        # empty initial table: ONE open-range region so later puts have an
        # owner (HBase's single initial region before any split)
        os.makedirs(_region_dir(path, 0), exist_ok=True)
        bounds = [{"region": 0, "start_key": None, "stop_key": None}]
    meta = {
        "key": key,
        "regions": [
            {k: v for k, v in b.items() if k != "_rid"} for b in bounds
        ],
        "next_version": 1,
        "schema": df.schema.jsonValue(),
    }
    _write_meta(path, meta)
    return meta


def _check_columns(meta: dict, columns) -> None:
    """A delta with missing/extra columns would silently corrupt reads
    (base+delta union is read without mergeSchema) — reject at put time."""
    want = {f["name"] for f in meta["schema"]["fields"]}
    got = {c for c in columns if not c.startswith("__kv_")}
    if got != want:
        raise ValueError(
            f"put columns {sorted(got)} do not match table schema "
            f"{sorted(want)}")


def _prune_regions(meta: dict, start_key=None, stop_key=None) -> list[dict]:
    """Region pruning from the key range — start inclusive, stop exclusive
    (the HBase scan-range convention hbase-scan-node.cc:108-112)."""
    out = []
    for r in meta["regions"]:
        if start_key is not None and r["stop_key"] is not None \
                and r["stop_key"] < start_key:
            continue
        if stop_key is not None and r["start_key"] is not None \
                and r["start_key"] >= stop_key:
            continue
        out.append(r)
    return out


def scan(
    spark: SparkSession,
    path: str,
    start_key=None,
    stop_key=None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Row-key range scan: prune regions from metadata, read only surviving
    region files, resolve newest version per key, drop tombstones. The
    residual key-range filter is applied ON TOP of the parquet scan so it
    reaches PushedFilters (row-group pruning inside each region)."""
    meta = _read_meta(path)
    key = meta["key"]
    regions = _prune_regions(meta, start_key, stop_key)
    regions = [
        r for r in regions
        if any(f.endswith(".parquet")
               for f in os.listdir(_region_dir(path, r["region"])))
    ]
    if not regions:
        from pyspark.sql.types import StructType

        empty = spark.createDataFrame(
            [], schema=StructType.fromJson(meta["schema"]))
        return empty.select(*(columns or empty.columns))
    # pathGlobFilter: only COMMITTED files — the streaming sink stages
    # pending-*.tmp files in region dirs that must stay invisible until
    # its commit() renames them (exactly-once by visibility)
    df = spark.read.option("pathGlobFilter", "*.parquet").parquet(
        *[_region_dir(path, r["region"]) for r in regions])
    if start_key is not None:
        df = df.filter(F.col(key) >= F.lit(start_key))
    if stop_key is not None:
        df = df.filter(F.col(key) < F.lit(stop_key))
    data_cols = [c for c in df.columns
                 if c not in ("__kv_version", "__kv_tombstone")]
    if columns:
        # project BEFORE the version resolve so unrequested qualifiers never
        # enter the max_by struct — the pruning reaches the parquet ReadSchema
        data_cols = [c for c in data_cols if c == key or c in columns]
    latest = (
        df.groupBy(key)
        .agg(
            F.max_by(
                F.struct(*[c for c in data_cols if c != key],
                         "__kv_tombstone"),
                F.col("__kv_version"),
            ).alias("__row")
        )
        .filter(~F.col("__row.__kv_tombstone"))
        .select(key, *[F.col(f"__row.{c}").alias(c)
                       for c in data_cols if c != key])
    )
    return latest.select(*(columns or data_cols))


def get(spark: SparkSession, path: str, key_value):
    """Point lookup (HBase Get): read ONLY the owning region — the one
    whose [start, stop] covers the key (start_key alone would keep every
    region above the owner too)."""
    meta = _read_meta(path)
    key = meta["key"]
    owners = [
        r for r in meta["regions"]
        if (r["start_key"] is None or r["start_key"] <= key_value)
        and (r["stop_key"] is None or key_value <= r["stop_key"])
    ]
    owners = [
        r for r in owners
        if any(f.endswith(".parquet")
               for f in os.listdir(_region_dir(path, r["region"])))
    ]
    if not owners:
        return None
    df = spark.read.option("pathGlobFilter", "*.parquet").parquet(
        *[_region_dir(path, r["region"]) for r in owners])
    data_cols = [c for c in df.columns
                 if c not in ("__kv_version", "__kv_tombstone")]
    rows = (
        df.filter(F.col(key) == F.lit(key_value))
        .orderBy(F.col("__kv_version").desc())
        .limit(1)
        .filter(~F.col("__kv_tombstone"))
        .select(*data_cols)
        .collect()
    )
    return rows[0] if rows else None


def put_batch(spark: SparkSession, path: str, updates: DataFrame,
              delete: bool = False) -> int:
    """Versioned Put (HBaseTableSink): append per-region delta files stamped
    with the next version; the newest version of a key wins at scan time.
    With delete=True the rows are tombstones (versioned Delete)."""
    meta = _read_meta(path)
    key = meta["key"]
    version = meta["next_version"]
    _check_columns(meta, updates.columns)
    # persist once: each region's filter+write+bounds otherwise re-evaluates
    # the full updates lineage (~3 jobs x n_regions over the same input)
    stamped = updates.withColumn(
        "__kv_version", F.lit(version).cast("long")
    ).withColumn("__kv_tombstone", F.lit(bool(delete))).persist()
    n = 0
    try:
        # route each row to its owning region (last region whose start <=
        # key; keys past the last stop extend the last region, like HBase's
        # open-ended terminal region)
        for i, r in enumerate(meta["regions"]):
            cond = F.lit(True)
            if r["start_key"] is not None and i > 0:
                cond = cond & (F.col(key) >= F.lit(r["start_key"]))
            nxt = meta["regions"][i + 1] if i + 1 < len(meta["regions"]) else None
            if nxt is not None and nxt["start_key"] is not None:
                cond = cond & (F.col(key) < F.lit(nxt["start_key"]))
            part = stamped.filter(cond)
            stats = part.agg(
                F.count(F.lit(1)).alias("rows"),
                F.min(key).alias("lo"), F.max(key).alias("hi"),
            ).first()
            if stats.rows == 0:
                continue
            n += stats.rows
            fname = f"delta-{version:010d}-{uuid.uuid4().hex[:8]}"
            tmp = os.path.join(path, "_delta_stage")
            part.coalesce(1).sortWithinPartitions(key).write.mode(
                "overwrite").parquet(tmp)
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(tmp, f),
                                os.path.join(_region_dir(path, r["region"]),
                                             f"{fname}.parquet"))
            shutil.rmtree(tmp)
            # widen region bounds if the batch extends them
            if r["start_key"] is None or stats.lo < r["start_key"]:
                r["start_key"] = stats.lo
            if r["stop_key"] is None or stats.hi > r["stop_key"]:
                r["stop_key"] = stats.hi
    finally:
        stamped.unpersist()
    meta["next_version"] = version + 1
    _write_meta(path, meta)
    return n


def compact(spark: SparkSession, path: str) -> dict:
    """Minor compaction: fold each region's base+delta files into one file
    holding only the newest surviving version per key (tombstones purged —
    HBase major-compaction semantics for the delete case)."""
    meta = _read_meta(path)
    key = meta["key"]
    report = {"regions": 0, "files_before": 0, "files_after": 0}
    for r in meta["regions"]:
        rdir = _region_dir(path, r["region"])
        files = [f for f in os.listdir(rdir) if f.endswith(".parquet")]
        report["files_before"] += len(files)
        if len(files) <= 1:
            report["files_after"] += len(files)
            continue
        # committed files only — a concurrently staged pending-*.tmp must
        # neither be folded in nor deleted (see KVStoreStreamWriter)
        df = spark.read.option("pathGlobFilter", "*.parquet").parquet(rdir)
        data_cols = [c for c in df.columns
                     if c not in ("__kv_version", "__kv_tombstone")]
        folded = (
            df.groupBy(key)
            .agg(
                F.max(F.col("__kv_version")).alias("__kv_version"),
                F.max_by(
                    F.struct(*[c for c in data_cols if c != key],
                             "__kv_tombstone"),
                    F.col("__kv_version"),
                ).alias("__row"),
            )
            .filter(~F.col("__row.__kv_tombstone"))
            .select(
                key,
                *[F.col(f"__row.{c}").alias(c)
                  for c in data_cols if c != key],
                "__kv_version",
                F.col("__row.__kv_tombstone").alias("__kv_tombstone"),
            )
        )
        tmp = rdir + ".compact"
        folded.coalesce(1).sortWithinPartitions(key).write.mode(
            "overwrite").parquet(tmp)
        for f in files:  # delete exactly what was folded; pending files stay
            os.remove(os.path.join(rdir, f))
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f),
                            os.path.join(rdir, f"base-{f}"))
        shutil.rmtree(tmp)
        report["files_after"] += 1
        report["regions"] += 1
    _write_meta(path, meta)
    return report


# -- streaming sink (DataSource V2 stream writer) ---------------------------

from dataclasses import dataclass, field  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class _KVCommit(WriterCommitMessage):
    # (staged_tmp_path, region, lo_key, hi_key) per file
    files: list = field(default_factory=list)
    # version the rows were stamped with at write() time; commit() must
    # name the delta files with THIS version (a concurrent put_batch may
    # have advanced next_version in between)
    version: int = 0


class KVStoreStreamWriter(DataSourceStreamWriter):
    """Streaming Put sink into a KV table (the streaming half of the
    HBaseTableSink equivalence). Exactly-once by visibility: executors
    write per-region PENDING files (never read — scan() only lists
    *.parquet); the driver's commit() renames them into versioned delta
    files and bumps the version in one manifest write. abort() deletes the
    pending files. A replayed batch re-puts the same keys under a newer
    version, which the newest-wins read collapses — the upsert-idempotence
    HBase gets from timestamped Puts.

    Single-writer per table, like an HBase region's single region server:
    version stamps are read at write() time, so two writers committing
    concurrently could share a version and make newest-wins ambiguous for
    keys they both touch (the file/rename protocol itself stays safe)."""

    def __init__(self, options):
        self.path = options["path"]
        self.key = options.get("key")  # default: the table's own key

    def write(self, iterator):
        import uuid as _uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [r.asDict() for r in iterator]
        meta = _read_meta(self.path)
        if self.key is None:
            self.key = meta["key"]
        version = meta["next_version"]
        if not rows:
            return _KVCommit([], version)
        _check_columns(meta, rows[0].keys())
        pdf = pd.DataFrame(rows)
        pdf["__kv_version"] = pd.array([version] * len(pdf), dtype="int64")
        pdf["__kv_tombstone"] = False
        staged = []
        regions = meta["regions"]
        for i, r in enumerate(regions):
            m = pdf
            if i > 0 and r["start_key"] is not None:
                m = m[m[self.key] >= r["start_key"]]
            nxt = regions[i + 1]["start_key"] if i + 1 < len(regions) else None
            if nxt is not None:
                m = m[m[self.key] < nxt]
            if len(m) == 0:
                continue
            fname = os.path.join(
                _region_dir(self.path, r["region"]),
                f"pending-{_uuid.uuid4().hex}.tmp",
            )
            pq.write_table(
                pa.Table.from_pandas(m.sort_values(self.key),
                                     preserve_index=False),
                fname,
            )
            lo, hi = m[self.key].min(), m[self.key].max()
            # keys are any orderable type (string row keys are the normal
            # HBase case); unwrap numpy scalars for JSON-safe metadata
            lo = lo.item() if hasattr(lo, "item") else lo
            hi = hi.item() if hasattr(hi, "item") else hi
            staged.append((fname, r["region"], lo, hi))
        return _KVCommit(staged, version)

    def commit(self, messages, batchId: int) -> None:
        meta = _read_meta(self.path)
        # rows carry the version stamped at write() time; name the files
        # with THAT version so file name and row stamps agree even if a
        # concurrent writer advanced next_version in between
        version = max((msg.version for msg in messages if msg),
                      default=meta["next_version"])
        by_region = {r["region"]: r for r in meta["regions"]}
        for msg in messages:
            for fname, region, lo, hi in (msg.files if msg else []):
                final = os.path.join(
                    os.path.dirname(fname),
                    f"delta-{version:010d}-{os.path.basename(fname)[8:-4]}"
                    ".parquet",
                )
                os.replace(fname, final)
                r = by_region[region]
                if r["start_key"] is None or lo < r["start_key"]:
                    r["start_key"] = lo
                if r["stop_key"] is None or hi > r["stop_key"]:
                    r["stop_key"] = hi
        meta["next_version"] = max(meta["next_version"], version + 1)
        _write_meta(self.path, meta)

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            for fname, *_ in (msg.files if msg else []):
                try:
                    os.remove(fname)
                except FileNotFoundError:
                    pass


class KVStoreSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kvstore_sink"

    def schema(self) -> str:  # the sink takes the stream's schema
        return "k long"

    def streamWriter(self, schema, overwrite):
        return KVStoreStreamWriter(self.options)
