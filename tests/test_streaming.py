"""Structured Streaming equivalence: the tumbling-window operator must
produce the same result under readStream + availableNow as in batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
from datapipeline_omnichanneltobigquery_spark.streaming.windows import (
    sessionize,
    stream_tumbling_counts,
    tumbling_counts,
    write_stream_to_memory,
)

from tests.conftest import SF_DIR


def test_stream_matches_batch(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)  # re-write so the stream source has µs timestamps

    batch = {tuple(r) for r in tumbling_counts(spark.read.parquet(src), "1 hour").collect()}

    sdf = stream_tumbling_counts(spark, src, spark.read.parquet(src).schema, "1 hour")
    q = write_stream_to_memory(sdf, "t_stream").start()
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.table("t_stream").collect()}
    assert streamed == batch
    assert len(streamed) > 0


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: two events 10s apart (one session), then 1h gap (new session)
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:00:10"),
        (3, 1, "2024-01-01 01:30:00"),
        # user 2: single event
        (4, 2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s string").select(
        "event_id", "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = {(r.event_id, r.session_seq) for r in sessionize(df).collect()}
    assert out == {(1, 1), (2, 1), (3, 2), (4, 1)}


def test_streaming_upsert_foreachbatch(spark, tmp_path):
    """The reference's staging->MERGE->drop loop as a continuous stream:
    micro-batches of changes merge into the main table by key."""
    import pyspark.sql.functions as F
    from datapipeline_omnichanneltobigquery_spark.sinks.catalog import drop_table, overwrite_table
    from datapipeline_omnichanneltobigquery_spark.streaming.sink import streaming_upsert

    main = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "id long, v string, seq long"
    )
    overwrite_table(main, "t_stream_main")

    changes = spark.createDataFrame(
        [(2, "b-new", 1), (2, "b-newer", 2), (3, "c", 1)], "id long, v string, seq long"
    )
    src = str(tmp_path / "changes_src")
    changes.write.parquet(src)
    stream = spark.readStream.schema(changes.schema).parquet(src)
    q = streaming_upsert(
        stream, "t_stream_main", key="id", order_col="seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {r.id: r.v for r in spark.table("t_stream_main").collect()}
    assert got == {1: "a", 2: "b-newer", 3: "c"}  # within-batch keep-latest
    drop_table(spark, "t_stream_main")
