"""Streaming CUSUM drift detection (SURVEY.md §2.2 streaming/stateful row
— the process-control complement of the data-contract gate): per-key
two-sided CUSUM against a FIXED reference level, maintained EXACTLY
across micro-batches with two integers of GroupState.

Batch twin: :func:`operators.timeseries.cusum_fixed_ref` — when the
stream delivers in event-time order (the replay case, pinned in tests)
the streaming scores and flags are EXACTLY the batch ones: both compute
the same integer micro-unit recurrence ``s+ = max(0, s+ + x - mu0 - k)``
/ ``s- = min(0, s- + x - mu0 + k)``, the batch side via the prefix-sum
closed form, this side literally.

State: (s_pos, s_neg) — two bigints per key, constant size regardless
of stream length; the recurrence clamps toward 0 so the magnitudes are
bounded by the worst excursion, not by time.  All Arrow chunks of a
group are CONCATENATED before the single (ts, unique) sort — the
throttle lesson: applyInPandasWithState splits large groups at
arrow.maxRecordsPerBatch and per-chunk ordering would corrupt the
recurrence order.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key string, event_id bigint, ts timestamp, value double, "
    "cusum_pos double, cusum_neg double, is_change boolean"
)
STATE_SCHEMA = "s_pos bigint, s_neg bigint"


def _detector(ref_micro: int, k_micro: int, h_micro: int):
    def _run(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        s_pos, s_neg = state.get if state.exists else (0, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((s_pos, s_neg))
            return
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        whole = whole.sort_values(["ts", "event_id"])
        out = {k: [] for k in ("event_id", "ts", "value", "cusum_pos", "cusum_neg", "is_change")}
        for _, row in whole.iterrows():
            xm = math.floor(float(row["value"]) * 1_000_000.0)
            s_pos = max(0, s_pos + xm - ref_micro - k_micro)
            s_neg = min(0, s_neg + xm - ref_micro + k_micro)
            out["event_id"].append(int(row["event_id"]))
            out["ts"].append(row["ts"])
            out["value"].append(float(row["value"]))
            out["cusum_pos"].append(round(s_pos / 1e6, 6))
            out["cusum_neg"].append(round(s_neg / 1e6, 6))
            out["is_change"].append(s_pos > h_micro or s_neg < -h_micro)
        state.update((int(s_pos), int(s_neg)))
        res = pd.DataFrame(out)
        res.insert(0, "key", [str(key[0])] * len(res))
        yield res

    return _run


def streaming_cusum(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    ref: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Per-key streaming CUSUM over (key, ts, value, unique) rows: every
    row is emitted with its running two-sided scores and change flag;
    the (s_pos, s_neg) integers carry EXACTLY across micro-batches
    (GroupState), so a drift that builds up over many batches still
    fires."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(unique_col).cast("bigint").alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(val_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _detector(
            int(round(float(ref) * 1_000_000)),
            int(round(float(slack) * 1_000_000)),
            int(round(float(threshold) * 1_000_000)),
        ),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
