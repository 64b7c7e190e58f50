"""Streaming corpus ingestion: continuous training-data prep against the
persisted dedup index.

The nightly-batch shape (operators/corpus_prep.py::prepare_corpus_incremental)
run CONTINUOUSLY: each micro-batch of incoming documents dedupes against the
maintained index (exact fingerprints, LSH band buckets, hashed shingle
sets), decontaminates, quality-filters and split-labels — then the kept rows
append to the corpus table and their artifacts append to the index, so the
NEXT micro-batch dedupes against them too.  One code path with the batch
engine (the streaming/sink.py discipline): ``foreachBatch`` hands every
micro-batch to the same incremental-prep operator.

Ordering contract: micro-batches run serially (Structured Streaming's
foreachBatch guarantee), and the index append happens synchronously inside
the batch function — batch N+1 always sees batch N's documents.  Exactly-
once: foreachBatch can re-run a batch after a crash; the exact-fingerprint
anti-join makes re-ingesting the same documents a no-op (their fingerprints
are already in the index), so the pipeline is idempotent at the document
level — the same property the reference's MERGE-by-id loop relies on
(omnichannel_to_bq.py:176-182).

Scale: every stage is the incremental operator's — linear in the micro-batch,
index-table probes only, corpus text never rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from datapipeline_omnichanneltobigquery_spark.operators.corpus_prep import (
    append_to_dedup_index,
    prepare_corpus_incremental,
)


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
    per-micro-batch incremental prep → append kept rows to
    ``corpus_path`` and their dedup artifacts to ``index_path``.

    ``bench_path`` is the decontamination eval set as parquet (read inside
    the batch function — foreachBatch runs in a cloned session).  The
    index must already exist (build_dedup_index over the current corpus,
    or over an empty frame for a cold start)."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bench = spark.read.parquet(bench_path)
        kept = prepare_corpus_incremental(
            spark, index_path, batch_df, bench, id_col, text_col,
            min_quality=min_quality,
        ).localCheckpoint()  # one computation feeds both appends
        kept.write.mode("append").parquet(corpus_path)
        append_to_dedup_index(kept, id_col, text_col, index_path)

    writer = new_docs.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
