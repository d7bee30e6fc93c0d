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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_r",
) -> DataFrame:
    """Nearest-direction as-of join: for every left row, attach the right
    row with the smallest |right_ts - left_ts| within the same `by` keys
    (ties between an earlier and a later candidate go to the earlier one);
    NULLs when the key has no right rows at all (left-join semantics).

    Same single-shuffle union+window shape as asof_join — both directions
    come from ONE window sort: the backward candidate is
    last(right-struct, ignorenulls) over (unbounded preceding, current)
    and the forward candidate is first(right-struct, ignorenulls) over
    (current, unbounded following), then a branch-free comparison picks
    the closer. No join operator, no second exchange.

    Determinism contract: callers must pass a `right` side unique per
    (by, right_ts) — pre-reduce duplicates with a deterministic rule
    (e.g. max of an id column) first; the forward frame would otherwise
    pick the first duplicate and the backward frame the last.
    """
    # The gap arithmetic below picks its conversion (unix_micros vs
    # cast-long) from ONE rule applied to both __ts and the matched row's
    # __prev_ts/__next_ts — those come from opposite sides of the union, so
    # mixed-type inputs (timestamp left vs numeric right, or NTZ vs LTZ)
    # would silently convert one side with the wrong rule and pick the
    # wrong nearest row. Refuse them at entry.
    def _ts_kind(dt):
        name = dt.typeName()
        if name.startswith("timestamp"):
            return name  # 'timestamp' (LTZ) vs 'timestamp_ntz' are distinct
        return "numeric"

    l_kind = _ts_kind(left.schema[left_ts].dataType)
    r_kind = _ts_kind(right.schema[right_ts].dataType)
    if l_kind != r_kind:
        raise TypeError(
            f"asof_join_nearest: left ts {left_ts!r} is "
            f"{left.schema[left_ts].dataType.simpleString()} but right ts "
            f"{right_ts!r} is {right.schema[right_ts].dataType.simpleString()};"
            " cast both sides to one timestamp/numeric type first"
        )
    rcols = list(right_cols) or [c for c in right.columns if c not in by]
    r_struct = F.struct(*[F.col(c) for c in rcols])
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType

    l_tagged = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    u = l_tagged.unionByName(r_tagged)
    order = W.partitionBy(*by).orderBy("__ts", "__side")
    wb = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = order.rowsBetween(W.currentRow, W.unboundedFollowing)
    # __r carries right_ts inside when the caller includes it in right_cols;
    # the gap compare needs the matched row's timestamp regardless, so tag it.
    u = u.withColumn("__rts", F.when(F.col("__side") == 0, F.col("__ts")))
    matched = (
        u.withColumn("__prev", F.last("__r", ignorenulls=True).over(wb))
        .withColumn("__prev_ts", F.last("__rts", ignorenulls=True).over(wb))
        .withColumn("__next", F.first("__r", ignorenulls=True).over(wf))
        .withColumn("__next_ts", F.first("__rts", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )
    # gap arithmetic works for TIMESTAMP (micros) and plain numeric ts
    # columns alike; cast-to-long on a timestamp would truncate to seconds.
    # NTZ goes through an explicit cast to TIMESTAMP first — unix_micros is
    # only defined on LTZ, and both sides are the same kind (asserted
    # above) so the session-zone shift cancels out of every gap.
    if l_kind == "numeric":
        ts_num = lambda c: c.cast("long")  # noqa: E731
    elif l_kind == "timestamp_ntz":
        ts_num = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    else:
        ts_num = lambda c: F.unix_micros(c)  # noqa: E731
    prev_gap = ts_num(F.col("__ts")) - ts_num(F.col("__prev_ts"))
    next_gap = ts_num(F.col("__next_ts")) - ts_num(F.col("__ts"))
    take_prev = F.col("__next").isNull() | (
        F.col("__prev").isNotNull() & (prev_gap <= next_gap)
    )
    pick = F.when(take_prev, F.col("__prev")).otherwise(F.col("__next"))
    matched = matched.withColumn("__m", pick)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rcols
    ]
    return matched.select(*out_cols)
