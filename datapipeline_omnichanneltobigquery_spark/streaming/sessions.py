"""Streaming gap-based sessionization — the canonical custom stateful
operator (SURVEY.md §2.2 streaming/stateful row): assign each event the
running session sequence number of its user, where a new session starts
after ``gap_seconds`` of inactivity, maintained EXACTLY across
micro-batches with two integers of GroupState.

Batch twin: :func:`streaming.windows.sessionize` — when the stream
delivers in event-time order (the replay case, pinned in tests) the
streaming session_seq values are EXACTLY the batch ones: both implement
``seq += 1 iff first-ever event OR gap > gap_seconds`` over the same
(ts, event_id) total order.  (Spark's built-in ``session_window`` gives
windowed AGGREGATES; this operator labels the EVENTS, which the
aggregate form cannot express.)

State: (session_seq, last_ts_us) — two bigints per user, constant size
regardless of stream length or session count.  All Arrow chunks of a
group are CONCATENATED before the single (ts, event_id) sort — the
throttle lesson: applyInPandasWithState splits large groups at
arrow.maxRecordsPerBatch, and per-chunk ordering would corrupt the gap
recurrence at chunk boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id string, event_id bigint, ts timestamp, session_seq bigint"
STATE_SCHEMA = "seq bigint, last_us bigint"


def _sessionizer(gap_us: int):
    def _run(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        seq, last_us = state.get if state.exists else (0, None)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return  # no rows for this key: leave state exactly as-is
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        whole = whole.sort_values(["ts", "event_id"], ignore_index=True)
        # The gap recurrence has no feedback into the timestamps — the
        # session starts are just `gap > gap_us` over consecutive sorted
        # timestamps (plus the state seed at position 0), so the whole
        # chunk vectorizes as diff-then-cumsum seeded by (seq, last_us);
        # contrast cusum.py, whose max(0, ·) clamp is genuinely sequential.
        us = whole["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1_000
        starts = np.empty(len(us), dtype=bool)
        starts[0] = last_us is None or (us[0] - last_us) > gap_us
        starts[1:] = (us[1:] - us[:-1]) > gap_us
        seqs = seq + np.cumsum(starts)
        state.update((int(seqs[-1]), int(us[-1])))
        res = pd.DataFrame(
            {
                "user_id": str(key[0]),
                "event_id": whole["event_id"].astype("int64"),
                "ts": whole["ts"],
                "session_seq": seqs.astype("int64"),
            }
        )
        yield res

    return _run


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user streaming sessionization over (user, ts, event_id) rows:
    every event is emitted with its session sequence number; the
    (seq, last_ts) integers carry EXACTLY across micro-batches
    (GroupState), so a session straddling a batch boundary is NOT split
    and an inactivity gap spanning batches still opens a new session."""
    keyed = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(id_col).cast("bigint").alias("event_id"),
        F.col(ts_col).alias("ts"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sessionizer(int(gap_seconds) * 1_000_000),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
