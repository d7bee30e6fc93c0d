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
