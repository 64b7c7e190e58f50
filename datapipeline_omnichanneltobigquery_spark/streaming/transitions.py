"""Streaming journey-transition maintenance — the incremental face of
Markov removal-effect attribution (operators/attribution.py::
markov_attribution): per-user GroupState carries (last_state, closed)
and each micro-batch emits transition-count DELTAS, so the attribution
consumer keeps a running (from_state, to_state) count table without ever
rescanning history.

Contract vs the batch builder (plans/relational2.py::
events_attribution_markov): summing the emitted deltas over an
event-time-ordered replay equals the batch transition table's chain
links AND its CONV terminals (a purchase arrives as an event, so the
closing transition — including the lonely START→CONV journey with no
prior touches — is emitted in-stream); only the NULL terminals (journeys
that never convert) are inherently an ANALYSIS-TIME snapshot — the
consumer derives them from the still-open states, exactly as the batch
builder derives them from users with no purchase.  Pinned by
tests/test_streaming.py.

State: two bigints per user (last_state, closed) — constant whatever the
journey length; events after the first purchase are ignored (the
pre-first-purchase journey contract).  All Arrow chunks of a group
CONCAT before the single (ts, event_id) sort — the sessions.py lesson:
applyInPandasWithState splits hot groups at arrow.maxRecordsPerBatch and
per-chunk ordering would corrupt the chain at chunk boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id string, from_state int, to_state int, cnt bigint"
STATE_SCHEMA = "last_state bigint, closed bigint"


def _transitioner(state_of: dict[str, int], start: int, conv: int):
    conv_types = {t for t, s in state_of.items() if s == conv}

    def _run(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last, closed = state.get if state.exists else (start, 0)
        if closed:
            return  # journey already converted: pre-first-purchase contract
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        whole = whole.sort_values(["ts", "event_id"], ignore_index=True)
        pairs: dict[tuple[int, int], int] = {}
        cur = int(last)
        done = False
        for et in whole["event_type"]:
            if et in conv_types:
                pairs[(cur, conv)] = pairs.get((cur, conv), 0) + 1
                done = True
                break  # everything after the first purchase is ignored
            nxt = state_of.get(et)
            if nxt is None:
                continue  # unmapped event types don't advance the chain
            pairs[(cur, nxt)] = pairs.get((cur, nxt), 0) + 1
            cur = nxt
        state.update((cur, 1 if done else 0))
        if pairs:
            ks = sorted(pairs)
            yield pd.DataFrame(
                {
                    "user_id": str(key[0]),
                    "from_state": [k[0] for k in ks],
                    "to_state": [k[1] for k in ks],
                    "cnt": [pairs[k] for k in ks],
                }
            )

    return _run


def streaming_transitions(
    events: DataFrame,
    state_of: dict[str, int],
    start_state: int = 0,
    conv_state: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user journey transition-count deltas over a stream of typed
    events: ``state_of`` maps event types to chain states (map the
    conversion type to ``conv_state``); every micro-batch emits the new
    (from_state, to_state) counts its events create, chains carrying
    EXACTLY across batch boundaries through two integers of GroupState.

    The per-event python loop (unlike sessions.py's vectorized gap
    rule) is genuinely sequential-with-early-exit: the chain both feeds
    back (cur = nxt) AND truncates at the first conversion, and per-user
    journeys are short by construction (bounded by the pre-conversion
    touch count, not the stream length)."""
    keyed = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(id_col).cast("bigint").alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).cast("string").alias("event_type"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _transitioner(dict(state_of), int(start_state), int(conv_state)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
