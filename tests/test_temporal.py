"""Edge-case semantics for the temporal join operators
(impalatogo_spark/operators/temporal.py). The full-table differential gates
live in the driver contract (join_asof / join_range_attribution oracles);
these pin the boundary behaviors a corpus-level diff can miss."""

from pyspark.sql import functions as F

from impalatogo_spark.operators.temporal import asof_join, range_join_buckets


def test_asof_inclusive_equal_ts_and_null_when_no_prior(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p0"), (2, 10, "p2")],
        "k int, ts long, lid string",
    )
    right = spark.createDataFrame(
        [(1, 100, "r_eq"), (1, 60, "r_mid"), (1, 200, "r_late"), (2, 11, "r_after")],
        "k int, ts long, rid string",
    )
    out = {
        r["lid"]: r["rid_r"]
        for r in asof_join(
            left, right, by=["k"], right_cols=["rid"]
        ).collect()
    }
    # equal timestamp matches (inclusive backward bound)
    assert out["p1"] == "r_eq"
    # most recent prior, not any prior
    assert out["p0"] is None or out["p0"] != "r_late"
    # no reference row at-or-before -> NULL (left-join semantics)
    assert out["p2"] is None


def test_asof_picks_most_recent_prior(spark):
    left = spark.createDataFrame([(1, 100, "p")], "k int, ts long, lid string")
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 90, "recent"), (1, 101, "future")],
        "k int, ts long, rid string",
    )
    [row] = asof_join(left, right, by=["k"], right_cols=["rid", "ts"]).collect()
    assert row["rid_r"] == "recent" and row["ts_r"] == 90


def test_range_join_strict_open_start_closed_end(spark):
    points = spark.createDataFrame(
        [(1, 100, "at_start"), (1, 101, "inside"), (1, 200, "at_end"),
         (1, 201, "after"), (2, 150, "wrong_key")],
        "k int, ts long, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, 100, 200, "iv")], "k int, s long, e long, ivid string"
    )
    width = 100
    got = sorted(
        r["pid"]
        for r in range_join_buckets(
            points,
            intervals,
            by=["k"],
            point_ts="ts",
            start="s",
            end="e",
            bucket=F.floor(F.col("ts") / width),
            n_buckets_expr=F.sequence(
                F.floor(F.col("s") / width), F.floor(F.col("e") / width)
            ),
        ).collect()
    )
    # (start, end]: start excluded, end included, other keys excluded
    assert got == ["at_end", "inside"]


def test_asof_right_tiebreak_deterministic(spark):
    """With duplicate (key, ts) right rows, right_tiebreak must make the
    max-tiebreak row win — on any partitioning (ADVICE r1: without this the
    winner is partition-order-dependent and the oracle diverges)."""
    left = spark.createDataFrame([(1, 100, "p")], "k int, ts long, lid string")
    right = spark.createDataFrame(
        [(1, 90, 7, "a"), (1, 90, 9, "b"), (1, 90, 8, "c")],
        "k int, ts long, rid int, tag string",
    ).repartition(8)
    for _ in range(3):
        [row] = asof_join(
            left, right, by=["k"], right_cols=["rid", "tag"],
            right_tiebreak="rid",
        ).collect()
        assert row["rid_r"] == 9 and row["tag_r"] == "b"


def test_range_join_same_lineage_no_trivial_equals(spark):
    """Points and intervals derived from the SAME DataFrame must join on the
    real by-key equality (qualified aliases), not a trivially-true self
    predicate: wrong-key pairs must never match."""
    ev = spark.createDataFrame(
        [(1, 100, "click"), (2, 150, "click"), (1, 160, "buy"), (2, 400, "buy")],
        "k int, ts long, kind string",
    )
    points = ev.filter(F.col("kind") == "click").select("k", "ts")
    intervals = (
        ev.filter(F.col("kind") == "buy")
        .select("k", (F.col("ts") - 100).alias("s"), F.col("ts").alias("e"))
    )
    width = 100
    got = range_join_buckets(
        points,
        intervals,
        by=["k"],
        point_ts="ts",
        start="s",
        end="e",
        bucket=F.floor(F.col("ts") / width),
        n_buckets_expr=F.sequence(
            F.floor(F.col("s") / width), F.floor(F.col("e") / width)
        ),
    ).select(F.col("__rjb_p.k").alias("pk"), F.col("__rjb_p.ts").alias("pts"))
    rows = {(r["pk"], r["pts"]) for r in got.collect()}
    # k=1 click@100 is in (60,160]; k=2 click@150 is NOT in (300,400]
    assert rows == {(1, 100)}


def test_asof_nearest_tie_goes_backward(spark):
    """Equidistant candidates: the EARLIER right row wins (documented
    tie rule), and an exact-timestamp match is gap 0 via the backward
    frame's inclusive bound."""
    from impalatogo_spark.operators.temporal import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 100, 50), (2, 100, 200)], "id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(10, 100, 40), (11, 100, 60), (12, 100, 200)],
        "rid long, k long, ts long",
    )
    out = {
        r["id"]: r["rid_r"]
        for r in asof_join_nearest(
            left, right, by=["k"], left_ts="ts", right_ts="ts",
            right_cols=["rid", "ts"],
        ).collect()
    }
    # id=1 at 50: candidates 40 (gap 10) and 60 (gap 10) -> earlier (40)
    assert out[1] == 10
    # id=2 at 200: exact match
    assert out[2] == 12


def test_asof_nearest_one_sided_and_empty(spark):
    from impalatogo_spark.operators.temporal import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 2, 10)], "id long, k long, ts long"
    )
    # key 1 has only a LATER right row (forward-only match); key 2 has none
    right = spark.createDataFrame([(99, 1, 500)], "rid long, k long, ts long")
    rows = {
        r["id"]: (r["rid_r"], r["ts_r"])
        for r in asof_join_nearest(
            left, right, by=["k"], right_cols=["rid", "ts"]
        ).collect()
    }
    assert rows[1] == (99, 500)
    assert rows[2] == (None, None)
