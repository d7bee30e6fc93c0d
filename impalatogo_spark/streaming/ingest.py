"""Streaming ingest dedup: the production shape of a continuously-ingesting
training-data pipeline — micro-batches of new documents deduped against a
PERSISTED corpus index (operators/dedup.py::build_corpus_index) inside
foreachBatch, optionally folding each batch's kept docs back into the index
so later batches dedup against earlier ones.

The reference is batch-only (SURVEY.md §1.1); this is the engine extension a
100 TB pipeline actually runs: the corpus index (fingerprints, LSH band
buckets, shingles) lives as parquet tables, each micro-batch pays
O(batch + matching buckets), and the index grows append-only — no
recomputation over the corpus, ever. Exactly-once comes from Structured
Streaming's checkpointed file source + idempotent per-batch appends.

tests/test_streaming.py asserts (a) static-index streaming output equals the
batch incremental_dedup over the same split, and (b) with index updates on,
a later batch's exact copy of an earlier batch's kept doc is flagged
exact_dup — the cross-batch fold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impalatogo_spark.operators.dedup import (
    build_corpus_index,
    incremental_dedup_indexed,
)

_INDEX_PARTS = ("fp", "buckets", "shingles")


def write_corpus_index(corpus: DataFrame, index_dir: str) -> None:
    """Materialize the dedup index of an existing corpus (the one-time
    bootstrap; steady state only appends via _fold_into_index)."""
    for name, df in zip(_INDEX_PARTS, build_corpus_index(corpus)):
        df.write.mode("overwrite").parquet(os.path.join(index_dir, name))


def read_corpus_index(spark: SparkSession, index_dir: str):
    return tuple(
        spark.read.parquet(os.path.join(index_dir, name)) for name in _INDEX_PARTS
    )


def documents_stream(spark: SparkSession, docs_dir: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over a directory of document parquet files; one file per
    micro-batch by default (the per-ingest-drop granularity)."""
    schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
    )


def streaming_incremental_dedup(stream: DataFrame, index_dir: str,
                                out_dir: str, checkpoint_dir: str,
                                threshold: float = 0.5,
                                update_index: bool = True):
    """Run the ingest-dedup stream: per micro-batch, status every incoming
    doc (exact_dup / near_dup / kept) against the persisted index, append
    the statuses to `out_dir`, and (if update_index) fold the batch's kept
    docs into the index so subsequent batches dedup against them.

    foreachBatch rather than a stateful operator because the dedup state
    (the corpus index) is relational and unbounded-but-disk-resident —
    exactly what parquet tables are for; per-key in-memory state would
    need the whole corpus fingerprint set in executor memory."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from impalatogo_spark.session import scoped_persists

        spark = batch_df.sparkSession
        # scope the dedup pass's tracked persists (the batch shingle frame)
        # to this micro-batch: a long-running stream never sees a harness's
        # release_persisted(), so without the scope each batch leaks one
        # cached frame for the stream's lifetime (r07 ADVICE)
        with scoped_persists():
            res = incremental_dedup_indexed(
                batch_df, *read_corpus_index(spark, index_dir), threshold
            ).withColumn("batch_id", F.lit(batch_id))
            res.write.mode("append").parquet(out_dir)
        if update_index:
            kept = batch_df.join(
                spark.read.parquet(out_dir)
                .filter(F.col("status") == "kept")
                .filter(F.col("batch_id") == batch_id),
                "doc_id",
                "left_semi",
            )
            for name, df in zip(_INDEX_PARTS, build_corpus_index(kept)):
                df.write.mode("append").parquet(os.path.join(index_dir, name))

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_upsert_ingest(stream: DataFrame, table_path: str,
                            key: str, checkpoint_dir: str,
                            order_col: str | None = None):
    """Continuously-corrected corpus: each micro-batch MERGEs into the
    parquet table via operators/maintenance.py::upsert_table — existing keys
    are replaced, new keys appended, so re-delivered/corrected documents
    supersede their previous versions (the upsert twin of
    streaming_incremental_dedup's insert-only index fold).

    Within a batch, duplicate keys are pre-reduced to the max-`order_col`
    row (deterministic; upsert_table rejects duplicate keys by contract).
    State lives entirely in the target table — the stream itself is
    stateless, so a restart resumes from the checkpoint with no rebuild.
    """
    from pyspark.sql import Window as W

    from impalatogo_spark.operators.maintenance import upsert_table

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if order_col is not None:
            w = W.partitionBy(key).orderBy(
                F.desc(order_col), F.desc(F.xxhash64(*batch_df.columns))
            )
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch_df = batch_df.dropDuplicates([key])
        if not os.path.isdir(table_path) or not os.listdir(table_path):
            batch_df.write.mode("overwrite").parquet(table_path)
        else:
            upsert_table(spark, table_path, batch_df, key=key)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_snapshot_ingest(stream: DataFrame, table_path: str,
                              checkpoint_dir: str):
    """Snapshot-committed ingest: each micro-batch commits ONE corpus
    snapshot (operators/snapshots.py), so the table gains a version per
    ingest drop — time travel reproduces the exact corpus any downstream
    run trained on, and snapshot_diff hands later passes just that batch.

    The data write is the batch's own parallelism; only the O(files)
    manifest append is driver-side. Restarts are safe: the checkpointed
    file source replays no batch, and each replayed-batch id would commit
    at most one snapshot."""
    from impalatogo_spark.operators.snapshots import snapshot_write

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from impalatogo_spark.operators.snapshots import find_note

        note = f"batch-{batch_id}"
        # foreachBatch is at-least-once: a crash between snapshot_write and
        # Spark's offset-log commit replays this batch_id — the note check
        # makes the commit idempotent (at most one snapshot per batch id)
        if find_note(table_path, note) is not None:
            return
        snapshot_write(batch_df.sparkSession, table_path, batch_df, note=note)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Per-source ingest quota (stateful admission control for a data pipeline)
# ---------------------------------------------------------------------------

def _quota_schemas():
    from pyspark.sql import types as T

    out = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("cum_tokens", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ])
    state = T.StructType([T.StructField("cum", T.LongType())])
    return out, state


def source_quota_admission(stream: DataFrame, cap_tokens: int) -> DataFrame:
    """Stateful per-source token-quota admission (applyInPandasWithState):
    every source carries a running token total across micro-batches; a
    document is admitted iff its source's cumulative total (including the
    doc) is still within the cap. The ingest-time twin of the batch
    corpus_source_caps curation — arrival order replaces quality order,
    because a stream cannot rank against documents it has not seen.

    Deterministic contract (what the oracle mirrors): within a batch the
    group's rows are processed in doc_id order (the Arrow chunks arrive in
    arbitrary order — concat + sort first), across batches in file/mtime
    order. State is ONE BIGINT per source — bounded by the source
    cardinality, the cheapest stateful operator a pipeline runs."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema, state_schema = _quota_schemas()

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (source,) = key
        cum = state.get[0] if state.exists else 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values("doc_id")
        toks = pdf["text"].map(lambda t: len(t.split(" "))).astype("int64")
        cums = toks.cumsum() + cum
        state.update((int(cums.iloc[-1]),))
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
            "source": source,
            "n_tokens": toks.to_numpy(),
            "cum_tokens": cums.astype("int64").to_numpy(),
            "admitted": (cums <= cap_tokens).to_numpy(),
        })

    return (
        stream.select("doc_id", "source", "text")
        .groupBy("source")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
