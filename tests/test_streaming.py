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
