"""Custom stateful streaming: applyInPandasWithState
(SURVEY.md §2.2 streaming row; the 'custom stateful operator' slot).

``running_user_stats`` keeps one state tuple (count, value-sum) per user and
emits the updated totals each micro-batch — the minimal shape of every
sessionizer/accumulator you'd build on this API.  State is GroupState-backed
(checkpointed, bounded by timeout); the batch mirror of the same semantics
is a plain groupBy, asserted equal in tests with availableNow draining.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value)) via
    applyInPandasWithState; works only on a streaming DataFrame."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_stats(events: DataFrame) -> DataFrame:
    """The batch mirror of :func:`running_user_stats`'s final state."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
