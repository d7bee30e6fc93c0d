"""Streaming correctness: availableNow replay of the windowed aggregation
must equal the batch twin; the stateful operator produces per-user state."""

from __future__ import annotations

from pyspark.sql import functions as F

from impalatogo_spark.queries.pipeline import events_tumbling_window
from impalatogo_spark.session import table
from impalatogo_spark.streaming.events import (
    events_stream,
    run_available_now,
    stateful_session_counts,
    tumbling_window_counts,
)


def test_streaming_equals_batch(spark, sf_dir):
    stream_result = run_available_now(
        spark, tumbling_window_counts(events_stream(spark, sf_dir)), "complete"
    )
    batch_result = events_tumbling_window(spark, sf_dir)
    s = {tuple(r) for r in stream_result.collect()}
    b = {tuple(r) for r in batch_result.collect()}
    assert s == b


def test_stateful_session_counts(spark, sf_dir):
    out = run_available_now(
        spark,
        stateful_session_counts(events_stream(spark, sf_dir)),
        output_mode="update",
    )
    rows = out.collect()
    assert len(rows) > 0
    ev = table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert {r.user_id for r in rows} <= set(
        r.user_id for r in ev.select("user_id").distinct().collect()
    )
    # each user's final count is positive and bounded by their event count
    per_user = {r.user_id: r.n_events for r in rows}
    totals = {
        r.user_id: r.cnt
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert all(0 < per_user[u] <= totals[u] for u in per_user)
    assert len(per_user) == n_users
