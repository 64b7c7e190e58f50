"""Stream-stream interval join (Structured Streaming's watermarked join).

The reference has no streaming at all (Kafka is listed as future work,
README.md:102-104); this is the engine's streaming-native form of the batch
range join (operators/temporal.py::range_join): match right-side events that
occurred within a bounded interval before each left-side event, per key.

Scale notes: a stream-stream inner join keeps BOTH sides' unmatched rows in
state until the watermark plus the interval bound passes — the time-bound ON
condition is what lets Spark evict state, so it is mandatory, not an
optimization.  State store at scale: RocksDB provider.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join ``right`` rows with ``right_ts`` in the half-open interval
    ``[left_ts - lower_seconds, left_ts)`` of the same ``key`` — identical
    semantics to the batch ``range_join``, but expressed as the inequality
    join Structured Streaming requires (the event-time bound + watermarks
    bound the join state; Catalyst cannot use the bucketized rewrite on a
    stream because bucket assignment needs no state, but matching does).

    Works unchanged on batch DataFrames (watermarks are skipped) — the
    batch run IS the correctness oracle for the streaming run
    (tests/test_streaming.py pins stream ≡ batch).

    Column contract: ``left`` and ``right`` must not share column names
    besides ``key`` (alias upstream); the join key survives once.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lhs, rhs = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}"))
    )
    joined = lhs.join(rhs, cond, "inner")
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return joined.select(*keep)
