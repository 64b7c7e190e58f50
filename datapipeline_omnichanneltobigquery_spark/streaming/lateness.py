"""Streaming lateness maintenance — the incremental face of
operators/lateness.py::lateness_audit: per-key GroupState carries
(has, max_ts_us) and each micro-batch emits a DELTA row
(key, n_rows, n_late, max_lag_us), so a monitoring consumer keeps the
running per-key lateness report without rescanning history —
sum(n_rows), sum(n_late), max(max_lag_us) over the deltas equal the
batch audit over the same arrival-ordered rows (pinned in
tests/test_streaming.py, including cross-batch prefixes and Arrow
chunk splits).

State is TWO BIGINTS per key whatever the stream length.  The per-batch
math is fully vectorized (numpy running max — the sessions.py lesson:
no iterrows); all Arrow chunks of a group CONCAT before the single
arrival sort, because applyInPandasWithState splits hot groups at
arrow.maxRecordsPerBatch and per-chunk prefixes would corrupt the
running max at chunk boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, n_rows bigint, n_late bigint, max_lag_us bigint"
STATE_SCHEMA = "has bigint, max_ts bigint"


def _auditor(delay_us: int):
    def _run(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        has, max_ts = state.get if state.exists else (0, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        whole = whole.sort_values("arrival", ignore_index=True)
        # Pure int64 path with an INT64_MIN sentinel for NULL event times
        # (a nullable Arrow column): the batch face scores a NULL row lag 0
        # and its m never advances the prefix max (Spark/DuckDB MAX and
        # GREATEST skip NULLs) — the sentinel never wins a max, and lags
        # compute ONLY on the valid mask, so the full bigint domain stays
        # exact (a float64 detour would round micros >= 2^53 and break
        # replay ≡ batch for large synthetic timestamps).
        sentinel = np.iinfo(np.int64).min
        s = whole["m"]
        isnull = s.isna().to_numpy()
        raw = s.fillna(sentinel).astype("int64").to_numpy()
        run = np.maximum.accumulate(raw)
        seed = np.int64(max_ts) if has else np.int64(sentinel)
        pmax = np.concatenate(([seed], np.maximum(run[:-1], seed)))
        valid = (pmax != sentinel) & ~isnull
        lag = np.zeros(len(raw), dtype=np.int64)
        lag[valid] = np.maximum(pmax[valid] - delay_us - raw[valid], 0)
        new_max = max(int(run[-1]), int(seed))
        if new_max != sentinel:
            state.update((1, new_max))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_rows": [int(len(raw))],
                "n_late": [int((lag > 0).sum())],
                "max_lag_us": [int(lag.max())],
            }
        )

    return _run


def streaming_lateness(
    events: DataFrame,
    delay_seconds: int,
    key_col: str = "event_type",
    arrival_col: str = "arrival",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key lateness deltas over a stream: each micro-batch emits
    (key, n_rows, n_late, max_lag_us) for the batch's rows, the
    watermark prefix carrying EXACTLY across batch boundaries through
    two integers of GroupState.  ``ts_col`` must already be integer
    microseconds or a timestamp (converted here);``arrival_col`` is the
    caller's monotone ingestion sequence."""
    if delay_seconds < 0:
        raise ValueError(f"delay_seconds must be >= 0, got {delay_seconds}")
    src = events
    ts_field = dict(src.dtypes).get(ts_col)
    m = (
        F.unix_micros(F.col(ts_col))
        if ts_field == "timestamp"
        else F.col(ts_col).cast("bigint")
    )
    keyed = src.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(arrival_col).alias("arrival"),
        m.alias("m"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _auditor(int(delay_seconds) * 1_000_000),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
