"""Structured Streaming operators over the events table. The reference is a
pure batch engine (SURVEY.md §1.1) — streaming extends it with the pipeline
capabilities a training-data system needs. See events.py for the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impalatogo_spark.queries import register


def _materialize_for_teardown(df: DataFrame) -> DataFrame:
    """TEST/HARNESS-ONLY: pin a result whose backing files are about to be
    deleted (temp-dir streaming sinks) by collecting it into a local-relation
    DataFrame. Never import this into a pipeline path — it pulls every row
    through the driver by design; a real pipeline leaves the sink directory
    in place and reads it lazily."""
    spark = df.sparkSession
    return spark.createDataFrame(df.collect(), df.schema)


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


from impalatogo_spark.operators.dedup import incremental_oracle as _incremental_oracle  # noqa: E402


@register(
    "streaming_ingest_dedup",
    oracle=_incremental_oracle(threshold=0.5),  # identical to the batch twin
    tags=("streaming", "dedup"),
)
def streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming ingest dedup: the odd-doc_id half of
    `documents` arrives as THREE micro-batches (file-source,
    maxFilesPerTrigger=1) and each batch is deduplicated inside
    foreachBatch against the persisted corpus index of the even-doc_id
    half (streaming/ingest.py). With a static index the union of the
    per-batch statuses must equal the batch twin `dedup_incremental` —
    so it shares that query's exact DuckDB oracle. Cross-batch index
    folding is covered separately in tests/test_streaming.py."""
    import os
    import shutil
    import tempfile

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

    base = tempfile.mkdtemp(prefix="i2s_stream_ingest_")
    try:
        in_dir = os.path.join(base, "in")
        incoming.withColumn("b", F.col("doc_id") % 3).repartition(3, "b") \
            .drop("b").write.parquet(in_dir)
        write_corpus_index(corpus, os.path.join(base, "idx"))
        q = streaming_incremental_dedup(
            documents_stream(spark, in_dir),
            os.path.join(base, "idx"), os.path.join(base, "out"),
            os.path.join(base, "ckpt"), update_index=False,
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("doc_id", "status").orderBy("doc_id")
        )
        # the tmp-dir sink disappears in the finally below
        return _materialize_for_teardown(out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "streaming_stream_join",
    oracle=f"""
WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p JOIN c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL 30 MINUTE
""",
    tags=("streaming", "join"),
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (clicks attributed to purchases
    within a trailing 30-minute window), run to completion with
    Trigger.AvailableNow — oracle-exact against DuckDB's batch inequality
    join, proving the streaming state machinery loses nothing on replay."""
    from impalatogo_spark.streaming.events import (
        events_stream,
        run_available_now,
        stream_stream_attribution,
    )

    ev = events_stream(spark, sf_dir)
    out = stream_stream_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        window_minutes=30,
    )
    return run_available_now(spark, out)


@register(
    "streaming_dedup_watermark",
    oracle="""
SELECT event_type, count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("streaming", "dedup"),
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via dropDuplicatesWithinWatermark (the
    state-bounded streaming dedup operator: per-key state expires with the
    event-time watermark instead of growing forever as plain
    dropDuplicates would). The source is deliberately DOUBLED (union of
    two identical streams), so every event_id arrives twice; the deduped
    per-type counts must equal the batch counts over the single corpus —
    an exact oracle for a genuinely streaming execution."""
    from impalatogo_spark.streaming.events import events_stream, run_available_now
    from pyspark.sql import functions as F

    doubled = events_stream(spark, sf_dir).unionByName(events_stream(spark, sf_dir))
    deduped = (
        doubled.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
    return run_available_now(spark, agg, output_mode="complete").orderBy("event_type")


@register(
    "streaming_stream_join_outer",
    oracle="""
WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL 30 MINUTE
""",
    tags=("streaming", "join"),
)
def streaming_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join, oracle-exact against the
    batch left join: unmatched purchases must be NULL-emitted, which only
    happens when the event-time watermark passes their join window — the
    state-EVICTION contract. The harness appends a far-future sentinel row
    in a LATER file (mtime-ordered, maxFilesPerTrigger splits the batches)
    so the final watermark sweeps every real purchase out of the state
    store; the sentinel itself is filtered from the output. Without the
    sentinel, purchases within (watermark + window) of stream end would
    stay buffered forever — the exact tail-flush problem a production
    pipeline solves with watermark heartbeats."""
    import datetime
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from impalatogo_spark.session import table
    from impalatogo_spark.streaming.events import (
        run_available_now,
        stream_stream_attribution_outer,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    base = _tempfile.mkdtemp(prefix="i2s_ssjoin_outer_")
    try:
        in_dir = _os.path.join(base, "in")
        # ONE data file: the whole event range must enter in the first
        # batch, before any watermark exists — a second data batch would
        # see a watermark derived from the first file's max ts and DROP
        # its older rows at the join input
        ev.coalesce(1).write.parquet(in_dir)
        mx = ev.agg(F.max("ts").alias("m")).first().m
        # TWO sentinel batches: batch N carries sentinel-1, which advances
        # the watermark past every real purchase's join window; batch N+1
        # (sentinel-2) is the batch DURING which that watermark is applied
        # and the remaining unmatched purchases NULL-emit. Relying on a
        # trailing no-data batch instead is trigger-dependent (measured: 3
        # tail purchases stayed buffered under AvailableNow).
        seen = set(_os.listdir(in_dir))
        bumps: dict[str, int] = {f: 0 for f in seen}
        for i, hours in enumerate((4, 8), start=1):
            # one sentinel PER SIDE: each side's withWatermark node only
            # sees its own filtered rows, and the query watermark is the
            # MIN across nodes — a purchase-only sentinel leaves the click
            # watermark (and therefore the join eviction) stuck
            # parallelize(rows, 1): one slice up front — a 2-row
            # createDataFrame().coalesce(1) makes the single write task
            # drain all 32 (mostly empty) pickled python slices
            # SEQUENTIALLY, one worker round-trip each (~4 s measured
            # for the same shape in build_ivf_index)
            spark.createDataFrame(
                spark.sparkContext.parallelize(
                    [(int(1 << 60) + 2 * i,
                      mx + datetime.timedelta(hours=hours), -1, "purchase"),
                     (int(1 << 60) + 2 * i + 1,
                      mx + datetime.timedelta(hours=hours), -1, "click")],
                    1,
                ),
                "event_id long, ts timestamp, user_id long, event_type string",
            ).write.mode("append").parquet(in_dir)
            for f in set(_os.listdir(in_dir)) - seen:
                bumps[f] = 30 * i
            seen = set(_os.listdir(in_dir))
        now = _time.time()
        for f, bump in bumps.items():
            if f.endswith(".parquet"):
                _os.utime(_os.path.join(in_dir, f), (now + bump, now + bump))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out = stream_stream_attribution_outer(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
            window_minutes=30,
        )
        res = run_available_now(spark, out).filter(F.col("user_id") >= 0)
        return _materialize_for_teardown(res)
    finally:
        _shutil.rmtree(base, ignore_errors=True)


@register(
    "streaming_topk_trending",
    oracle="""
WITH wins AS (
  SELECT date_trunc('hour', ts) - to_hours(gs.i) AS w_start, event_type
  FROM events, (SELECT unnest(range(2)) AS i) gs
),
cnt AS (
  SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
  FROM wins GROUP BY 1, 2
),
rk AS (
  SELECT w_start, event_type, n,
         row_number() OVER (PARTITION BY w_start
                            ORDER BY n DESC, event_type) AS rnk
  FROM cnt
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, n, CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= 3
ORDER BY window_start, rnk
""",
    tags=("streaming",),
)
def streaming_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-k: REAL Structured Streaming sliding-window counts
    (2h window / 1h slide, every event in 2 windows) via availableNow into
    a memory sink, then a batch row_number() picks the top 3 event types
    per window — the standard split, since ranking isn't incrementalizable
    inside a streaming agg. The oracle is the batch twin: each event
    replicated into its 2 sliding windows with identical hour alignment.
    Deterministic: (n DESC, event_type) is a total order per window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from impalatogo_spark.streaming.events import (
        events_stream,
        run_available_now,
        sliding_window_counts,
    )

    counts = run_available_now(
        spark, sliding_window_counts(events_stream(spark, sf_dir)),
        output_mode="complete",
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    )


from impalatogo_spark.operators import sketches as _K  # noqa: E402

_S_HLL_ORACLE = f"""
WITH hashed AS (
  SELECT event_type AS shard, {_K.hash48_sql('user_id')} AS h FROM events
),
regs AS (
  SELECT shard, h % {_K.HLL_M} AS bucket,
         max(least(1 + bit_count(((h // {_K.HLL_M}) & -(h // {_K.HLL_M})) - 1),
                   {_K.HASH_BITS - 5 + 1})) AS m_rho
  FROM hashed GROUP BY shard, h % {_K.HLL_M}
),
aggd AS (
  SELECT shard, sum(1.0 / (1::BIGINT << m_rho)) AS s_inv, count(*) AS cnt
  FROM regs GROUP BY shard
)
SELECT shard, {_K.hll_estimate_case_sql()} AS hll_est
FROM aggd ORDER BY shard
"""


@register(
    "streaming_sketch_hll",
    oracle=_S_HLL_ORACLE,
    tags=("streaming", "sketch"),
)
def streaming_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained HLL registers over a stream: each
    foreachBatch merges the batch's per-shard registers into a versioned
    register snapshot (max per bucket). The payoff vs the batch sketch:
    foreachBatch is at-least-once, and register max-merge is IDEMPOTENT —
    a replayed batch is absorbed with no overcount, so this needs no
    batch-id bookkeeping at all (contrast streaming_ingest_dedup's id
    note). The oracle is the batch HLL over all events: availableNow
    replay must land on the identical registers. Snapshot dirs are
    per-invocation unique (no cross-session path races)."""
    import os
    import tempfile
    import uuid

    from impalatogo_spark.operators.sketches import hll_estimate, hll_registers
    from impalatogo_spark.streaming.events import events_stream

    root = os.path.join(
        tempfile.gettempdir(), f"i2s_stream_hll_{uuid.uuid4().hex[:12]}"
    )
    os.makedirs(root, exist_ok=True)
    latest: list[str] = []

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, "user_id", "event_type")
        if latest:
            cur = spark.read.parquet(latest[-1])
            regs = (
                cur.unionByName(regs)
                .groupBy("shard", "bucket")
                .agg(F.max("m_rho").alias("m_rho"))
            )
        out = os.path.join(root, f"v{batch_id:06d}_{uuid.uuid4().hex[:6]}")
        regs.write.mode("overwrite").parquet(out)
        latest.append(out)

    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .start()
    )
    q.awaitTermination()
    regs = spark.read.parquet(latest[-1])
    return _materialize_for_teardown(
        hll_estimate(regs, ["shard"]).orderBy("shard")
    )


@register(
    "streaming_static_enrichment",
    oracle="""
SELECT c.c_mktsegment AS segment, e.event_type,
       count(*) AS n,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1
GROUP BY c.c_mktsegment, e.event_type
ORDER BY segment, event_type
""",
    tags=("streaming",),
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the streaming side joins a STATIC
    dimension (customer) that Spark broadcasts per micro-batch — the
    standard dimension-lookup shape (no watermark needed on the static
    side, unlike stream-stream joins). availableNow replay + complete-mode
    rollup must reproduce the batch join exactly. user_id maps to
    c_custkey via +1 (the synthetic keys are 0- vs 1-based)."""
    from impalatogo_spark.session import table
    from impalatogo_spark.streaming.events import (
        events_stream,
        run_available_now,
    )

    stream = events_stream(spark, sf_dir)
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = (
        stream.join(F.broadcast(cust),
                    cust.c_custkey == stream.user_id + 1)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .alias("value_cents"),
        )
    )
    out = run_available_now(spark, enriched, output_mode="complete")
    return _materialize_for_teardown(
        out.orderBy("segment", "event_type")
    )


from impalatogo_spark.operators import dedup as _D  # noqa: E402


@register(
    "streaming_incremental_clusters",
    # identical oracle to dedup_clusters_incremental / dedup_clusters:
    # the streamed, snapshot-versioned maintenance must land on the exact
    # full-recompute clustering
    oracle=_D.clusters_oracle(_D.minhash_lsh_oracle(threshold=0.5)),
    tags=("streaming", "dedup", "graph", "incremental"),
)
def streaming_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup CLUSTER maintenance: the corpus's last two
    quarters (doc_id % 4 in {2, 3}) arrive as two file-source
    micro-batches; each foreachBatch generates only the batch-INCIDENT
    verified pairs (vs the cumulative corpus so far) and folds them into
    the snapshot-versioned components state via the O(batch) contracted
    merge (operators/dedup.py incremental_components_update
    return_delta=True -> components_state_write). The final state must
    equal the one-shot clustering of the WHOLE corpus — the same
    full-recompute oracle dedup_clusters gates against.

    At-least-once note (foreachBatch): a REPLAYED batch is absorbed with
    no bookkeeping — its edges land entirely inside already-merged
    components, so the contracted graph is empty and the delta written is
    zero rows; duplicate rows in the cumulative store are likewise
    harmless (signatures are per-doc mins, verification is per-distinct
    (id, gram)). Contrast streaming_ingest_dedup's batch-id note: this
    state merge is naturally idempotent, like the HLL register max."""
    import os
    import shutil
    import tempfile

    from impalatogo_spark.session import table, tracked_persist
    from impalatogo_spark.streaming.ingest import documents_stream

    docs = table(spark, sf_dir, "documents")
    corpus0 = docs.filter(F.col("doc_id") % 4 <= 1)

    base = tempfile.mkdtemp(prefix="i2s_stream_cc_")
    try:
        in_dir = os.path.join(base, "in")
        # one parquet file per ingest drop -> one micro-batch each
        docs.filter(F.col("doc_id") % 4 == 2).coalesce(1) \
            .write.parquet(in_dir)
        docs.filter(F.col("doc_id") % 4 == 3).coalesce(1) \
            .write.mode("append").parquet(in_dir)

        state = os.path.join(base, "state")
        cum_dir = os.path.join(base, "cum")
        # one persisted shingle frame for signatures AND verify (min() is
        # duplicate-insensitive, so the distinct set yields identical sigs)
        sh0 = tracked_persist(_D.word_shingles(corpus0))
        cand0 = _D.lsh_candidate_pairs(_D.lsh_band_buckets(
            _D.minhash_signatures(sh0)))
        pairs0 = _D.verify_jaccard(
            cand0, sh0, 0.5).select("id_a", "id_b")
        _D.components_state_write(
            spark, state, _D.connected_components(pairs0), note="corpus")
        corpus0.write.parquet(cum_dir)

        def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            cum = spark.read.parquet(cum_dir)
            state_df = _D.components_state_read(spark, state)
            pairs = _D.batch_incident_pairs(cum, batch_df)
            delta = _D.incremental_components_update(
                state_df, pairs, return_delta=True)
            _D.components_state_write(
                spark, state, delta, note=f"batch {batch_id}")
            batch_df.write.mode("append").parquet(cum_dir)

        q = (
            documents_stream(spark, in_dir)
            .writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(base, "_ckpt"))
            .start()
        )
        q.awaitTermination()
        out = _D.components_state_read(spark, state).orderBy("doc_id")
        return _materialize_for_teardown(out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_QUOTA_CAP_TOKENS = 700


@register(
    "streaming_source_quota",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source
              ORDER BY doc_id % 3, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens,
       cum_tokens <= {_QUOTA_CAP_TOKENS} AS admitted
FROM c ORDER BY doc_id
""",
    tags=("streaming", "stateful", "sampling"),
)
def streaming_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-source ingest quota, run as REAL Structured Streaming:
    the corpus arrives as three micro-batches (doc_id % 3, one file per
    trigger in mtime order) and source_quota_admission keeps one running
    BIGINT of tokens per source across batches, admitting documents until
    the source's {cap}-token quota fills — ingest-time admission control,
    the streaming twin of corpus_source_caps (arrival order replaces
    quality order). The deterministic batch split + in-batch doc_id order
    make this custom stateful operator fully ORACLE-CHECKED (a windowed
    cumulative sum over (doc_id % 3, doc_id)), not rows-only — the
    exactly-once/state contract is what the gate proves."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from impalatogo_spark.session import table
    from impalatogo_spark.streaming.events import run_available_now
    from impalatogo_spark.streaming.ingest import (
        documents_stream,
        source_quota_admission,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    base = _tempfile.mkdtemp(prefix="i2s_stream_quota_")
    # State-store partition count is frozen from spark.sql.shuffle.partitions
    # at stream start — a vanilla session's 200 means 200 state store
    # instances PER MICRO-BATCH for a one-BIGINT-per-source state (measured
    # 2.2x the whole query's wall). Scope the conf to this stream (each run
    # uses a fresh checkpoint, so the count may differ run to run) and
    # restore the session's value — an explicit client SET survives.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(max(8, spark.sparkContext.defaultParallelism)))
        in_dir = _os.path.join(base, "in")
        seen: set[str] = set()
        bumps: dict[str, int] = {}
        for b in range(3):
            docs.filter(F.col("doc_id") % 3 == b).coalesce(1) \
                .write.mode("append").parquet(in_dir)
            for f in set(_os.listdir(in_dir)) - seen:
                bumps[f] = 30 * b
            seen = set(_os.listdir(in_dir))
        now = _time.time()
        for f, bump in bumps.items():
            if f.endswith(".parquet"):
                _os.utime(_os.path.join(in_dir, f), (now + bump, now + bump))
        out = run_available_now(
            spark,
            source_quota_admission(documents_stream(spark, in_dir),
                                   _QUOTA_CAP_TOKENS),
            "append",
        )
        # memory sink: rows already live off the tmp dir; safe to delete it
        return _materialize_for_teardown(out.orderBy("doc_id"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        _shutil.rmtree(base, ignore_errors=True)
