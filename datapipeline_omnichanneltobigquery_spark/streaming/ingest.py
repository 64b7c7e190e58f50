"""Streaming corpus ingestion: continuous training-data prep against the
persisted dedup index.

The nightly-batch shape (operators/corpus_prep.py::prepare_corpus_incremental)
run CONTINUOUSLY: each micro-batch of incoming documents dedupes against the
maintained index (exact fingerprints, LSH band buckets, hashed shingle
sets), decontaminates, quality-filters and split-labels — then the kept rows
land in the corpus table and their artifacts append to the index, so the
NEXT micro-batch dedupes against them too.  One code path with the batch
engine (the streaming/sink.py discipline): ``foreachBatch`` hands every
micro-batch to :func:`apply_ingest_batch`.

Ordering contract: micro-batches run serially (Structured Streaming's
foreachBatch guarantee), and the index append happens synchronously inside
the batch function — batch N+1 always sees batch N's documents.

Crash-replay contract (foreachBatch re-runs a batch whose checkpoint commit
did not land):

1. a fully-applied batch leaves a ``_applied_batches/<batch_id>`` marker
   (written LAST); a replay that finds the marker is a no-op;
2. the corpus write is an OVERWRITE of the batch-scoped hive partition
   ``ingest_batch=<batch_id>`` — a replay that crashed between the corpus
   write and the index append recomputes the identical keep-set (the index
   is unchanged) and overwrites the same directory, so no duplicate corpus
   rows are possible;
3. a replay that finds the keep-set empty because the batch's fingerprints
   already reached the index (crash mid-index-append) skips the corpus
   write rather than overwriting the partition with nothing — the already-
   written rows survive.  The one degradation in that window: index tables
   appended before the crash have the batch's artifacts, later ones don't,
   so those documents screen exact-dup but may miss near-dup candidacy.
   That is a bounded recall loss on one batch, never corpus duplication or
   loss — the same document-level idempotency class as the reference's
   MERGE-by-id loop (omnichannel_to_bq.py:176-182).

The streamed corpus is therefore hive-partitioned by ``ingest_batch``;
plain ``spark.read.parquet(corpus_path)`` reads it (the batch id surfaces
as one extra partition column), and partition-wise compaction
(sinks/layout.py::compact_partitioned) applies directly.

Scale: every stage is the incremental operator's — linear in the micro-batch,
index-table probes only, corpus text never rescanned.  The decontamination
eval set is read ONCE per stream (first non-empty batch) and
localCheckpointed, not re-listed and re-read per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from datapipeline_omnichanneltobigquery_spark.operators.corpus_prep import (
    append_to_dedup_index,
    prepare_corpus_incremental,
)


def apply_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    corpus_path: str,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_quality: float = 0.5,
) -> None:
    """Apply ONE micro-batch: incremental prep → batch-partition corpus
    write → index append → applied marker.  Safe to re-run with the same
    ``batch_id`` (crash replay): see the module docstring's contract."""
    marker = os.path.join(corpus_path, "_applied_batches", str(batch_id))
    if os.path.exists(marker):
        return  # fully-applied batch replayed after a crash: no-op
    spark = batch_df.sparkSession
    if not batch_df.isEmpty():
        kept = prepare_corpus_incremental(
            spark, index_path, batch_df, bench, id_col, text_col,
            min_quality=min_quality,
        ).localCheckpoint()  # one computation feeds both appends
        if not kept.isEmpty():
            kept.write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"ingest_batch={batch_id}")
            )
            append_to_dedup_index(kept, id_col, text_col, index_path)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w"):
        pass


def streaming_corpus_ingest(
    new_docs: DataFrame,
    index_path: str,
    corpus_path: str,
    bench_path: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str,
    *,
    min_quality: float = 0.5,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the ingestion stream: ``new_docs`` (a streaming DataFrame) →
    per-micro-batch incremental prep → kept rows to ``corpus_path``
    (one hive partition per micro-batch) and dedup artifacts to
    ``index_path``.

    ``bench_path`` is the decontamination eval set as parquet — read once
    on the first non-empty batch and localCheckpointed for the stream's
    lifetime.  The index must already exist (build_dedup_index over the
    current corpus, or over an empty frame for a cold start)."""
    bench_holder: dict[str, DataFrame] = {}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if "df" not in bench_holder:
            bench_holder["df"] = (
                batch_df.sparkSession.read.parquet(bench_path).localCheckpoint()
            )
        apply_ingest_batch(
            batch_df, batch_id, index_path, corpus_path, bench_holder["df"],
            id_col, text_col, min_quality=min_quality,
        )

    writer = new_docs.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
