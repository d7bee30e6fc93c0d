"""Temporal join operators the reference engine lacks: as-of join and
point-in-interval range join.

The reference's only non-equi join is CrossJoinNode + SelectNode conjuncts
(`be/src/exec/cross-join-node.cc:169` — nested-loop, SURVEY.md §2.4), which
is O(n*m) and unusable at scale. These operators express the same semantics
as compositions of shuffle-friendly Spark primitives:

  * asof_join — ONE hash exchange on the equality keys and ZERO joins: both
    sides union into a single relation and a last(ignorenulls) window over
    (keys, ts, side) picks each probe row's most recent reference row. This
    is the canonical scale form: cost is a sort within each key partition,
    state is one row of carried reference struct, and skew follows the key
    distribution exactly like any keyed shuffle (salt keys if needed).
  * range_join_buckets — point-in-interval join via time-bucketing: each
    interval explodes into the (few) fixed-width buckets it overlaps, each
    point maps to exactly one bucket, and the join runs on
    (keys, bucket) equality followed by the exact range filter. The plan is
    a plain hash join — never BroadcastNestedLoopJoin — and the candidate
    set per point is bounded by intervals overlapping one bucket.

Both return exact results (verified against DuckDB's native ASOF JOIN and
inequality-join at the query layer, queries/relational.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_r",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, attach the
    right row with the greatest right_ts <= left_ts within the same `by`
    keys; NULLs when no prior right row exists (left-join semantics).

    Implementation: tag both inputs, union, and take
    last(right-struct, ignorenulls=True) over a window ordered by
    (ts, side) with side ordering reference-before-probe so an equal
    timestamp matches (inclusive bound). One shuffle, no join operator.

    Determinism contract: if `right` holds multiple rows per (by, right_ts),
    which one wins is partition-order-dependent (and any other engine's ASOF
    would make its own arbitrary pick). Pass `right_tiebreak` (a right-side
    column name) to make the max-tiebreak row win deterministically — it
    becomes a third window sort key, so the fix costs nothing: still ONE
    shuffle, no pre-reduce. The oracle twin is a right side pre-reduced to
    one row per (by, ts) keeping max(tiebreak) (queries/relational.py::
    join_asof).
    """
    rcols = list(right_cols) or [c for c in right.columns if c not in by]
    r_struct = F.struct(*[F.col(c) for c in rcols])
    # null literal of the same struct type for the probe-side rows
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType

    tb = (
        F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    )
    l_tagged = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        F.lit(None)
        .cast(left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
              .schema["s"].dataType)
        .alias("__l"),
        r_struct.alias("__r"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*by)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rcols
    ]
    return matched.select(*out_cols)


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    point_ts: str,
    start: str,
    end: str,
    bucket: Column,
    n_buckets_expr: Column,
) -> DataFrame:
    """Inner point-in-interval join (start < point_ts <= end, plus `by`
    equality) as a bucketed hash join. Caller supplies the bucket width via
    `bucket` (points' bucket id Column) and `n_buckets_expr` (per-interval
    bucket span Column); each interval is exploded into its covered buckets
    with sequence() — keep the bucket width >= typical interval length so
    the explosion factor stays ~2.

    Both sides are explicitly aliased before the join: when points and
    intervals descend from the same source DataFrame (the common
    events-vs-events case), unqualified `p[k] == iv[k]` hits Spark's
    same-lineage ambiguity ("trivially true equals" warning) and survives
    only via a version-fragile self-join heuristic. Qualified references
    make the by-key equality unambiguous in every Spark version.
    """
    p = points.withColumn("__b", bucket).alias("__rjb_p")
    iv = (
        intervals.withColumn("__b", F.explode(n_buckets_expr)).alias("__rjb_iv")
    )
    cond = [F.col("__rjb_p.__b") == F.col("__rjb_iv.__b")] + [
        F.col(f"__rjb_p.{k}") == F.col(f"__rjb_iv.{k}") for k in by
    ]
    joined = p.join(iv, cond, "inner").filter(
        (F.col(f"__rjb_p.{point_ts}") > F.col(f"__rjb_iv.{start}"))
        & (F.col(f"__rjb_p.{point_ts}") <= F.col(f"__rjb_iv.{end}"))
    )
    return joined
