"""Mergeable distinct-count sketches: HyperLogLog registers and KMV
(k-minimum-values / bottom-k theta) sketches, built as plain DataFrames so
they compose with groupBy/join like any other column.

This is the 100 TB pattern the exact operators can't give you: per-shard
sketch state is tiny (m registers / k hashes), shards build independently
with one map-side-combined groupBy, and merging is an associative max/min —
re-counting exact DISTINCTs across 1000 executors shuffles every key, while
merging sketches shuffles O(m) rows per shard.

Determinism contract (same as operators/dedup.py): the only hash is md5,
which DuckDB shares, so every register value / sketch member — and therefore
every estimate — is bit-identical between the Spark implementation and its
SQL oracle. Estimates are the raw Flajolet et al. / Beyer et al. forms: the
HLL harmonic sum adds exact dyadic rationals 2^-M (register values span
< 53 bits, so every partial sum is exact in any order) and each estimate is
then ONE float division — no summation-order nondeterminism exists anywhere.

References (public): Flajolet/Fusy/Gandouet/Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA 2007);
Beyer et al., "On synopses for distinct-value estimation under multiset
operations" (SIGMOD 2007). Reference-parity context: the reference's
ndv()/distinctpc estimators (be/src/exprs/aggregate-functions.cc) are
single-pass sketches of the same family; this module adds the
*mergeable-state-as-data* form a sharded corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 48-bit hash from the first 12 hex chars of md5 — fits BIGINT exactly and
# is reproducible in DuckDB via the strpos hex polynomial (no conv() there).
HASH_BITS = 48
HASH_SPACE = 1 << HASH_BITS

# HLL geometry: m = 32 registers (5 index bits), alpha_32 = 0.697 (Flajolet
# et al., Fig. 3). The hash suffix h div m is 43 bits wide, so rho caps at
# 44 (the all-zero suffix).
HLL_M = 32
HLL_ALPHA = 0.697
_SUFFIX_BITS = HASH_BITS - 5

# KMV sketch size. A sketch holding fewer than k members IS the full set:
# both estimators switch to exact mode below k (Beyer et al. §3).
KMV_K = 64


def _hex_poly_sql(hx: str, n: int = 12) -> str:
    """DuckDB-side hex->BIGINT polynomial over the first n md5 chars
    (DuckDB has no conv(); same digit decode as operators/dedup.py)."""
    return " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    )


def hash48(col: Column) -> Column:
    """48-bit md5-derived hash of a column (stringified), Spark side."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def hash48_sql(expr: str) -> str:
    """The identical 48-bit hash in DuckDB SQL."""
    return f"({_hex_poly_sql(f'md5(CAST({expr} AS VARCHAR))')})"


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

def hll_registers(df: DataFrame, key_col: str, shard_col: str) -> DataFrame:
    """Per-shard HLL register table: (shard, bucket, m_rho).

    bucket = h mod m; rho = 1 + trailing-zero count of v = h div m (the
    first-one position scanned from the LSB — any fixed scan direction is a
    valid HLL as long as the oracle mirrors it, and trailing zeros has the
    branch-free form 1 + bit_count((v & -v) - 1); v = 0 caps at 44).

    The md5 hash is materialized ONCE per row behind a Generate barrier
    (explode(array(..)) — the split_words pattern): bucket and rho together
    reference h four times, and a plain projection would get
    CollapseProject-inlined into four md5 evaluations per row.

    One groupBy with map-side combine: shuffle is O(shards * m) rows no
    matter how many input rows.
    """
    hashed = df.select(
        F.col(shard_col).alias("shard"),
        F.explode(F.array(hash48(F.col(key_col)))).alias("h"),
    )
    v = (F.col("h") / HLL_M).cast("long")  # h >= 0: double-div floor == div
    rho = F.least(
        F.lit(1) + F.bit_count((v.bitwiseAND(-v)) - F.lit(1)),
        F.lit(_SUFFIX_BITS + 1),
    )
    return hashed.groupBy(
        "shard", (F.col("h") % HLL_M).alias("bucket")
    ).agg(F.max(rho).alias("m_rho"))


def hll_estimate_case_sql() -> str:
    """The full Flajolet et al. estimator as ONE SQL expression over the
    per-group aggregates `s_inv` (sum of 1/2^M over present registers,
    double) and `cnt` (registers present, bigint) — evaluated by BOTH
    engines from the identical text, so the floats cannot diverge.

    raw = alpha_m * m^2 / (s_inv + (m - cnt))   [empties contribute 2^0]
    small-range (raw <= 2.5m, empties V > 0): linear counting m*ln(m/V),
    looked up from a literal table (V has only m values — precomputing the
    logs driver-side keeps ln() out of both engines, whose libm last-ulp
    behavior is not pinned). Large-range correction is unreachable at 48
    hash bits and is intentionally omitted.
    """
    import math

    raw = (
        f"({HLL_ALPHA}e0 * {HLL_M * HLL_M}"
        f" / (s_inv + ({HLL_M} - cnt)))"
    )
    lc = " ".join(
        f"WHEN {v} THEN CAST('{HLL_M * math.log(HLL_M / v)!r}' AS DOUBLE)"
        for v in range(1, HLL_M + 1)
    )
    return (
        f"round(CASE WHEN {raw} <= {2.5 * HLL_M} AND cnt < {HLL_M} "
        f"THEN (CASE {HLL_M} - cnt {lc} END) ELSE {raw} END, 4)"
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """HLL estimate (with linear-counting small-range correction) from a
    register table.

    Empty buckets contribute 2^0 = 1 each: S = sum(1/2^M) + (m - present).
    1/2^M is computed as 1.0 / (1 << M) — an exact dyadic double (never
    pow(), whose exp/ln round-trip is not guaranteed exact), so the sum is
    order-independent and the single division mirrors bit-for-bit.
    """
    inv = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), m_rho)")
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.sum(inv).alias("s_inv"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            *group_cols, F.expr(hll_estimate_case_sql()).alias("hll_est")
        )
    )


def hll_estimate_sql(regs: str, group_col: str) -> str:
    """DuckDB twin of hll_estimate over a register relation — same
    estimator text via hll_estimate_case_sql()."""
    return f"""
SELECT {group_col}, {hll_estimate_case_sql()} AS hll_est
FROM (
  SELECT {group_col}, sum(1.0 / (1::BIGINT << m_rho)) AS s_inv,
         count(*) AS cnt
  FROM {regs} GROUP BY {group_col}
)"""


# ---------------------------------------------------------------------------
# KMV (bottom-k) sketches
# ---------------------------------------------------------------------------

def kmv_sketch(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """Bottom-k sketch: the k smallest 48-bit hashes of the DISTINCT keys.

    orderBy().limit() is a TopN (TakeOrderedAndProject) — per-partition
    heaps then a k-row merge, never a global sort. Hash ties (48-bit
    collisions) are broken by the key itself so the sketch is a function of
    the SET, not of partitioning.
    """
    return (
        df.select(F.col(key_col).alias("k"))
        .distinct()
        .select(F.explode(F.array(hash48(F.col("k")))).alias("h"), "k")
        .orderBy("h", "k")
        .limit(k)
    )


def kmv_sketch_sql(key_expr: str, from_clause: str, k: int = KMV_K) -> str:
    """DuckDB twin of kmv_sketch."""
    h = hash48_sql("k")
    return f"""
SELECT {h} AS h, k
FROM (SELECT DISTINCT {key_expr} AS k FROM {from_clause})
ORDER BY 1, 2 LIMIT {k}"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency state
# ---------------------------------------------------------------------------

CMS_D = 4   # hash rows
CMS_W = 64  # counters per row


def cms_cells(df: DataFrame, key_col: str, shard_col: str) -> DataFrame:
    """Per-shard Count-Min cells (shard, j, col, cnt): every input row
    increments d counters, one per salted hash row j. The explode emits d
    rows per input, but the map-side-combined groupBy collapses them to at
    most shards * d * w cells on the wire — mergeable frequency state the
    way hll_registers is mergeable distinct state (merge = cell-wise SUM).
    """
    cells = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            (hash48(F.concat_ws("|", F.lit(str(j)), F.col(key_col).cast("string")))
             % CMS_W).alias("col"),
        )
        for j in range(CMS_D)
    ])
    return (
        df.select(F.col(shard_col).alias("shard"), F.explode(cells).alias("c"))
        .groupBy("shard", F.col("c.j").alias("j"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_hash_sql(j: int, key_expr: str) -> str:
    """DuckDB twin of one salted CMS hash column index."""
    h = hash48_sql(f"'{j}' || '|' || CAST({key_expr} AS VARCHAR)")
    return f"({h} % {CMS_W})"


def cms_cells_sql(key_expr: str, shard_expr: str, from_clause: str) -> str:
    """DuckDB twin of cms_cells (a UNION ALL over the d hash rows)."""
    parts = " UNION ALL ".join(
        f"SELECT {shard_expr} AS shard, {j} AS j, "
        f"{cms_hash_sql(j, key_expr)} AS col FROM {from_clause}"
        for j in range(CMS_D)
    )
    return (f"SELECT shard, j, col, count(*) AS cnt FROM ({parts}) "
            f"GROUP BY shard, j, col")
