"""Structured Streaming operators over the events table. The reference is a
pure batch engine (SURVEY.md §1.1) — streaming extends it with the pipeline
capabilities a training-data system needs. See events.py for the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from impalatogo_spark.queries import register


@register(
    "streaming_tumbling_window",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution: readStream(parquet) -> watermark
    -> tumbling-window agg -> memory sink, Trigger.AvailableNow, complete
    mode. The oracle is the batch twin — availableNow replay must produce
    exactly the batch answer (exactly-once semantics)."""
    from impalatogo_spark.streaming.events import (
        events_stream,
        run_available_now,
        tumbling_window_counts,
    )

    stream = events_stream(spark, sf_dir)
    return run_available_now(spark, tumbling_window_counts(stream), output_mode="complete")


@register(
    "streaming_stateful_sessions",
    oracle=None,  # custom stateful operator; batch-equivalence in tests/test_streaming.py
    tags=("streaming", "stateful"),
)
def streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    session rollups with 30-min gap reset. Non-SQL-expressible (arbitrary
    state machine) -> rows-only at the driver; invariants (count bounds,
    user coverage) asserted in tests/test_streaming.py."""
    from impalatogo_spark.streaming.events import (
        events_stream,
        run_available_now,
        stateful_session_counts,
    )

    return run_available_now(
        spark, stateful_session_counts(events_stream(spark, sf_dir)), "update"
    )
