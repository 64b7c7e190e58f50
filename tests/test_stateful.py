"""applyInPandasWithState: the streaming running totals must drain (with
availableNow) to the same final state as the batch aggregation."""

from __future__ import annotations

import pytest

from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
from datapipeline_omnichanneltobigquery_spark.streaming.stateful import (
    batch_user_stats,
    running_user_stats,
)

from tests.conftest import SF_DIR


def test_stateful_stream_matches_batch(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events").select("user_id", "value")
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)

    batch = {
        (r.user_id, r.n_events, round(r.sum_value, 6))
        for r in batch_user_stats(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per batch; the LAST row per user is
    # the final state — with availableNow and one source batch there is one
    rows = spark.table("t_state").collect()
    final = {}
    for r in rows:
        final[r.user_id] = (r.user_id, r.n_events, round(r.sum_value, 6))
    assert set(final.values()) == batch
    assert len(batch) > 0
