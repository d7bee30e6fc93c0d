"""Table-maintenance operators for a 100 TB parquet warehouse: small-file
compaction and multi-column Z-order layout.

The reference engine leaves file layout to external loaders (`LOAD DATA` +
`PARQUET_FILE_SIZE` query option, `be/src/service/query-options.cc`); at
Spark scale layout is an in-engine maintenance pass:

  * compact_table — the OPTIMIZE/small-files pass. A 100 TB table that
    accumulated millions of KB-scale files from streaming ingest scans at
    open()-per-file cost; compaction rewrites partitions of
    `target_file_mb`-sized files. Write-to-temp + atomic-ish swap keeps the
    readable table consistent (single-process semantics here; a real
    lakehouse uses a transactional table format for the swap step).
  * zorder_by — interleaved-bit (Morton) ordering over 2 integer keys so
    range predicates on EITHER key cluster into few files: sort by the
    Morton code, write with one file per range. Min/max footer stats then
    prune files for both `a BETWEEN ...` and `b BETWEEN ...` predicates —
    the multi-dimensional analogue of partition pruning. The bit
    interleave is exact integer arithmetic (shifts via multiply/divide by
    powers of two), portable to any engine.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def estimate_row_bytes(df: DataFrame, sample_rows: int = 10_000) -> float:
    """Rough bytes/row from a bounded sample written to parquet once —
    the sizing probe for compaction (bounded cost at any table size)."""
    spark = df.sparkSession
    tmp = os.path.join("/tmp", f"i2s_size_probe_{uuid.uuid4().hex[:8]}")
    try:
        df.limit(sample_rows).write.mode("overwrite").parquet(tmp)
        n = spark.read.parquet(tmp).count()
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(tmp)
            for f in fs
            if f.endswith(".parquet")
        )
        return size / max(n, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def compact_table(spark: SparkSession, path: str, target_file_mb: int = 128) -> dict:
    """Rewrite the parquet table at `path` into ~target_file_mb files.

    Returns {'files_before', 'files_after', 'rows'} for assertion/reporting.
    Uses bytes/row estimation + a round-robin repartition (no shuffle key
    needed — compaction preserves no ordering contract). The rewrite goes to
    a temp dir first, then swaps, so a crash mid-write never leaves a
    half-table at `path`.
    """

    def _count_files(p: str) -> int:
        return sum(
            1
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    df = spark.read.parquet(path)
    rows = df.count()
    files_before = _count_files(path)
    bpr = estimate_row_bytes(df)
    target_rows_per_file = max(int(target_file_mb * 1024 * 1024 / max(bpr, 1.0)), 1)
    n_files = max((rows + target_rows_per_file - 1) // target_rows_per_file, 1)

    tmp = path.rstrip("/") + f".compact_{uuid.uuid4().hex[:8]}"
    df.repartition(int(n_files)).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + f".old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": _count_files(path),
        "rows": rows,
    }


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a Morton
    (Z-order) code. Pure integer Column arithmetic — codegen'd, portable."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = (a.cast("long") / F.lit(1 << i)).cast("long") % 2
        bbit = (b.cast("long") / F.lit(1 << i)).cast("long") % 2
        code = code + abit * F.lit(1 << (2 * i)) + bbit * F.lit(1 << (2 * i + 1))
    return code


def morton_code_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton interleave as portable SQL text (for DuckDB
    oracles): for non-negative ints, ((x >> i) & 1) << k == ((x div 2^i)
    mod 2) * 2^k, so this mirrors morton_code() bit-for-bit."""
    terms = []
    for i in range(bits):
        # each term fully parenthesized: SQL gives << LOWER precedence
        # than +, so an unwrapped chain accumulates the shifts
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(df: DataFrame, path: str, col_a: str, col_b: str,
                 n_files: int = 8, bits: int = 8) -> None:
    """Write `df` Z-ordered on (col_a, col_b): normalize each key to the
    same `bits`-bit range, range-partition by the Morton interleave into
    n_files, sort within each, drop the helper column. Footer min/max stats
    on col_a AND col_b then both prune well.

    Normalization is the load-bearing step: interleaving RAW values lets
    the wider-range key dominate the high Morton bits and the narrow key
    gets no clustering at all (this is why engine Z-order implementations
    interleave per-column range-bucket ids, not values). Min/max per key is
    one scalar aggregate — bounded cost at any table size.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    top = (1 << bits) - 1

    def _norm(c: str, lo, hi) -> Column:
        if hi == lo:
            return F.lit(0).cast("long")
        return F.floor(
            (F.col(c).cast("double") - float(lo)) * top / (float(hi) - float(lo))
        ).cast("long")

    (
        df.withColumn(
            "__z",
            morton_code(_norm(col_a, lo_a, hi_a), _norm(col_b, lo_b, hi_b), bits),
        )
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_pruning_stats(spark: SparkSession, path: str, predicate: str) -> dict:
    """How many parquet files of `path` could a reader skip for `predicate`,
    judged by per-file min/max of the predicate column — the footer-stats
    pruning a parquet reader performs. Returns {'files', 'needed'}."""
    import pyarrow.parquet as pq

    # predicate format: "col BETWEEN lo AND hi"
    parts = predicate.split()
    if (
        len(parts) != 5
        or parts[1].upper() != "BETWEEN"
        or parts[3].upper() != "AND"
    ):
        raise ValueError(
            f"file_pruning_stats expects 'col BETWEEN lo AND hi', got {predicate!r}"
        )
    col = parts[0]
    lo_s, hi_s = float(parts[2]), float(parts[4])
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    needed = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = md.schema.names.index(col)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            # a statistics object with unset min/max is as opaque as no
            # statistics at all — the file cannot be pruned
            if st is None or not st.has_min_max:
                fmin, fmax = float("-inf"), float("inf")
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or not (fmax < lo_s or fmin > hi_s):
            needed += 1
    return {"files": len(files), "needed": needed}


def upsert_table(spark: SparkSession, path: str, updates: DataFrame,
                 key: str) -> dict:
    """MERGE-style upsert into a parquet table: rows of `updates` replace
    current rows with the same `key`; new keys append. The reference's only
    mutation verbs are INSERT INTO/OVERWRITE (`fe/.../analysis/InsertStmt.java`)
    — full-partition granularity; this is the row-granular maintenance pass a
    continuously-corrected corpus needs.

    Scale shape: one left-anti join on the key (broadcast when `updates` is
    small — AQE decides) + unionByName + rewrite. No driver-side row
    handling. Same temp-write + swap as compact_table, so readers never see
    a half-merged table. On a real lakehouse this maps onto a transactional
    MERGE; on plain parquet the rewrite IS the transaction.

    MERGE semantics require one update row per key: duplicate keys in
    `updates` would ALL survive the anti-join+union, so they are rejected up
    front. All counts over `updates` run BEFORE the directory swap — an
    `updates` frame derived from `path` itself must never be re-evaluated
    against post-swap data.
    """
    n_updates = updates.count()
    n_update_keys = updates.select(key).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"upsert_table: updates has {n_updates} rows but only "
            f"{n_update_keys} distinct {key!r} keys — dedup before upserting"
        )
    cur = spark.read.parquet(path)
    n_before = cur.count()
    kept = cur.join(updates.select(key).distinct(), key, "left_anti")
    merged = kept.unionByName(updates.select(*cur.columns))
    tmp = path.rstrip("/") + f".upsert_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + f".old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    n_after = spark.read.parquet(path).count()
    return {"rows_before": n_before, "rows_after": n_after,
            "updates": n_updates}
