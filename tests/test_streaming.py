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


def test_sliding_window_stream(spark, sf_dir):
    """Sliding (overlapping) windows: each event lands in window_len/slide
    windows; total weighted count must equal n_events * 2 for 2h/1h."""
    from pyspark.sql import functions as F
    from impalatogo_spark.streaming.events import events_stream, run_available_now

    stream = events_stream(spark, sf_dir)
    slid = (
        stream.withWatermark("ts", "3 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    out = run_available_now(spark, slid, "complete")
    total = sum(r.n for r in out.collect())
    n_events = table(spark, sf_dir, "events").count()
    assert total == 2 * n_events


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """Late-data semantics: with a watermark, an event older than
    (max_seen - watermark) is dropped in append mode across micro-batches."""
    import os
    import shutil

    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    early = ev.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
    late = ev.filter(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
    n_late = late.count()
    assert n_late > 0
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # batch 1: recent events advance the watermark far past the late events
    early.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # batch 2: append the LATE file; its windows are behind the watermark
    late.coalesce(1).write.mode("append").parquet(src)
    run_once()
    result = spark.read.parquet(out_dir)
    emitted = result.agg(F.sum("n").alias("s")).first().s or 0
    # none of the late rows may appear in finalized windows
    assert emitted <= early.count()
    total_late_windows = result.filter(
        F.col("w.start") < F.lit("2024-01-05").cast("timestamp")
    ).count()
    assert total_late_windows == 0


def test_native_session_window_matches_manual_sessionize(spark, sf_dir):
    """Spark's native session_window (30-min gap) must produce the same
    per-user session event-count multiset as the manual lag+cumsum
    sessionizer (queries/pipeline.py::events_sessionize) — two independent
    implementations of the same semantics cross-validate each other."""
    from collections import Counter

    from pyspark.sql import functions as F

    from impalatogo_spark.queries.pipeline import events_sessionize

    ev = table(spark, sf_dir, "events")
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    manual = events_sessionize(spark, sf_dir).select("user_id", "n_events")
    a = Counter((r.user_id, r.n_events) for r in native.collect())
    b = Counter((r.user_id, r.n_events) for r in manual.collect())
    assert a == b


def test_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with watermarks + time-range condition:
    purchases joined to clicks by the same user within the preceding hour.
    availableNow result must equal the equivalent batch join."""
    from pyspark.sql import functions as F

    from impalatogo_spark.streaming.events import events_stream, run_available_now

    def split(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        return purchases, clicks

    sp, sc = split(events_stream(spark, sf_dir))
    joined = sp.withWatermark("p_ts", "2 hours").join(
        sc.withWatermark("c_ts", "2 hours"),
        F.expr(
            "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"
        ),
    )
    stream_rows = {
        (r.p_id, r.c_id) for r in run_available_now(spark, joined, "append").collect()
    }
    bp, bc = split(table(spark, sf_dir, "events"))
    batch_rows = {
        (r.p_id, r.c_id)
        for r in bp.join(
            bc,
            F.expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"),
        ).collect()
    }
    assert len(batch_rows) > 0
    assert stream_rows == batch_rows


def test_streaming_dedup_across_batches(spark, sf_dir, tmp_path):
    """Duplicate rows arriving in later micro-batches are dropped: feed the
    same events file twice through a file stream with dropDuplicates on
    event_id; output must equal one copy."""
    import os

    from pyspark.sql import functions as F

    from impalatogo_spark.streaming.events import streaming_dedup

    ev = table(spark, sf_dir, "events").limit(500)
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev.coalesce(1).write.mode("append").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # exact duplicates
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    deduped = streaming_dedup(stream, ["event_id"])
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out_dir)
    assert result.count() == 500
    assert result.select("event_id").distinct().count() == 500


def test_streaming_ingest_dedup_static_index_equals_batch(spark, sf_dir, tmp_path):
    """Streaming ingest dedup with a STATIC persisted index must equal the
    batch incremental_dedup over the same corpus/incoming split — ties the
    foreachBatch pipeline to the oracle-gated batch op."""
    import os
    from impalatogo_spark.operators.dedup import incremental_dedup
    from impalatogo_spark.streaming.ingest import (
        documents_stream, streaming_incremental_dedup, write_corpus_index,
    )

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)

    base = str(tmp_path)
    in_dir = os.path.join(base, "in")
    # three ingest drops = three micro-batches
    incoming.withColumn("b", F.col("doc_id") % 3).repartition(3, "b") \
        .drop("b").write.parquet(in_dir)
    write_corpus_index(corpus, os.path.join(base, "idx"))

    q = streaming_incremental_dedup(
        documents_stream(spark, in_dir),
        os.path.join(base, "idx"), os.path.join(base, "out"),
        os.path.join(base, "ckpt"), update_index=False,
    )
    q.awaitTermination()

    got = {
        (r.doc_id, r.status)
        for r in spark.read.parquet(os.path.join(base, "out")).collect()
    }
    want = {(r.doc_id, r.status) for r in incremental_dedup(incoming, corpus).collect()}
    assert got == want and len(got) > 0


def test_streaming_ingest_dedup_index_update_folds_batches(spark, sf_dir, tmp_path):
    """With index updates ON, a later batch's exact copy of an earlier
    batch's kept doc must be flagged exact_dup — the cross-batch fold."""
    import os
    import time
    from impalatogo_spark.streaming.ingest import (
        documents_stream, streaming_incremental_dedup, write_corpus_index,
    )

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0).limit(50)
    first = docs.filter(F.col("doc_id") % 2 == 1).limit(40).cache()

    base = str(tmp_path)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    # batch 1: 40 fresh docs; batch 2: the SAME texts under shifted doc_ids
    first.coalesce(1).write.parquet(os.path.join(in_dir, "b1"))
    time.sleep(1.1)  # file-source batch order follows modification time
    first.withColumn("doc_id", F.col("doc_id") + 1_000_000) \
        .coalesce(1).write.parquet(os.path.join(in_dir, "b2"))
    write_corpus_index(corpus, os.path.join(base, "idx"))

    schema = spark.read.parquet(os.path.join(in_dir, "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = streaming_incremental_dedup(
        stream, os.path.join(base, "idx"), os.path.join(base, "out"),
        os.path.join(base, "ckpt"), update_index=True,
    )
    q.awaitTermination()

    out = spark.read.parquet(os.path.join(base, "out"))
    b1 = {r.doc_id: r.status for r in out.filter("doc_id < 1000000").collect()}
    b2 = {r.doc_id - 1_000_000: r.status
          for r in out.filter("doc_id >= 1000000").collect()}
    assert set(b1) == set(b2) and len(b1) == 40
    # every doc kept in batch 1 is an exact duplicate by batch 2
    kept_b1 = {d for d, s in b1.items() if s == "kept"}
    assert len(kept_b1) > 0
    assert all(b2[d] == "exact_dup" for d in kept_b1)


def test_streaming_upsert_ingest(spark, tmp_path):
    """foreachBatch upsert ingest: later micro-batches REPLACE rows with the
    same key and append new keys — the corrected-corpus shape. Batches
    arrive in file order (maxFilesPerTrigger=1)."""
    import os

    from impalatogo_spark.streaming.ingest import streaming_upsert_ingest

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    schema = "doc_id long, rev long, text string"
    b1 = spark.createDataFrame(
        [(1, 1, "one v1"), (2, 1, "two v1")], schema)
    b2 = spark.createDataFrame(
        [(2, 2, "two v2"), (2, 1, "two dup-key older"), (3, 1, "three v1")],
        schema)
    b1.coalesce(1).write.parquet(os.path.join(in_dir, "f0"))
    b2.coalesce(1).write.parquet(os.path.join(in_dir, "f1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    q = streaming_upsert_ingest(
        stream, str(tmp_path / "tbl"), key="doc_id",
        checkpoint_dir=str(tmp_path / "ckpt"), order_col="rev",
    )
    q.awaitTermination()
    rows = {r.doc_id: (r.rev, r.text)
            for r in spark.read.parquet(str(tmp_path / "tbl")).collect()}
    assert rows == {1: (1, "one v1"), 2: (2, "two v2"), 3: (1, "three v1")}


def test_streaming_resume_from_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Restart semantics: run the ingest-dedup stream to completion over a
    partial input directory, then ADD more files and rerun with the SAME
    checkpoint. The file-source offset log must skip everything already
    processed — each doc statused exactly once, union of both runs equal to
    a single full run. This is the exactly-once-across-restarts contract a
    production ingest relies on (checkpoint = source offsets + sink commits).
    """
    import os

    from pyspark.sql import functions as F

    from impalatogo_spark.session import table
    from impalatogo_spark.streaming.ingest import (
        documents_stream,
        streaming_incremental_dedup,
        write_corpus_index,
    )

    docs = table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    base = str(tmp_path)
    in_dir = os.path.join(base, "in")
    idx = os.path.join(base, "idx")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    write_corpus_index(corpus, idx)

    # phase 1: only bucket-0 files exist
    first = incoming.filter(F.col("doc_id") % 4 == 1)
    rest = incoming.filter(F.col("doc_id") % 4 == 3)
    first.coalesce(1).write.mode("append").parquet(in_dir)
    q1 = streaming_incremental_dedup(
        documents_stream(spark, in_dir), idx, out, ckpt, update_index=False)
    q1.awaitTermination()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 == first.count()

    # phase 2: more files arrive; SAME checkpoint -> only new files process
    rest.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = streaming_incremental_dedup(
        documents_stream(spark, in_dir), idx, out, ckpt, update_index=False)
    q2.awaitTermination()
    result = spark.read.parquet(out)
    assert result.count() == incoming.count()  # no reprocessing, no loss
    assert result.groupBy("doc_id").count().filter("count > 1").count() == 0
    # and the union equals a single-shot run over the full input (same
    # statuses as the batch twin used by streaming_ingest_dedup's oracle)
    single = os.path.join(base, "single")
    q3 = streaming_incremental_dedup(
        documents_stream(spark, in_dir), idx, single,
        os.path.join(base, "ckpt2"), update_index=False)
    q3.awaitTermination()
    a = {(r.doc_id, r.status) for r in result.select("doc_id", "status").collect()}
    b = {(r.doc_id, r.status)
         for r in spark.read.parquet(single).select("doc_id", "status").collect()}
    assert a == b


def test_source_quota_prefix_admission_and_conf_restore(spark, sf_dir):
    """Per source, admission must be a PREFIX of the (batch, doc_id) arrival
    order (once a source's quota fills nothing later is admitted), the
    running totals must be consistent, and the query must restore the
    session's shuffle-partition conf (it scopes a lower value for the
    state store)."""
    from impalatogo_spark.queries import all_queries

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    rows = all_queries()["streaming_source_quota"].spark_fn(
        spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) >= 2
    admitted_everywhere = rejected_somewhere = False
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.doc_id % 3, r.doc_id))
        run = 0
        flags = []
        for r in rs:
            run += r.n_tokens
            assert r.cum_tokens == run, (src, r.doc_id)
            assert r.admitted == (run <= 700)
            flags.append(r.admitted)
        # prefix property: no True after the first False
        assert flags == sorted(flags, reverse=True), src
        admitted_everywhere |= flags[0]
        rejected_somewhere |= not flags[-1]
    assert admitted_everywhere and rejected_somewhere
