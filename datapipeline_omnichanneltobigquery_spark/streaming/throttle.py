"""Streaming per-key rate capping (SURVEY.md §2.2 streaming/stateful row —
the ingestion-throttle complement of the data-contract gate): admit at most
``max_per_window`` events per (key, tumbling event-time window) ACROSS
micro-batches, in arrival order.

Batch twin: :func:`operators.sampling.rate_cap` — when the stream delivers
in event-time order (the replay case, pinned in tests), the streaming
admit set is EXACTLY the batch kept set.  Under out-of-order arrival the
semantics are deliberately arrival-order ("first N observed"): a throttle
protects the pipeline from burst VOLUME, so admitting the first-seen N is
the correct contract — the batch form is the auditable replay.

State: ONE bigint admit-counter per (key, window) group — constant size,
GroupState-checkpointed; old windows stop receiving keys and their state
stays one integer (bound it with a state timeout in long-running
deployments).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "event_id bigint, user_id bigint, win_start bigint, in_window_rank bigint"
)
STATE_SCHEMA = "n bigint"


def _capper(max_per_window: int):
    def _cap(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        out_ids, out_ranks = [], []
        # applyInPandasWithState delivers one group as MULTIPLE Arrow chunks
        # once it exceeds arrow.maxRecordsPerBatch — sorting each chunk
        # independently would admit in chunk order, not (ts, event_id)
        # order, breaking the ordered-replay ≡ batch rate_cap contract.
        # Concatenate the whole group FIRST, then sort once.  Group size is
        # bounded by the micro-batch's rows for one (key, window) — the
        # same order of memory the per-chunk form already held transiently.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            # earliest-first inside the micro-batch, unique-id tie-break —
            # the batch twin's total order
            whole = whole.sort_values(["ts", "event_id"])
            for eid in whole["event_id"]:
                if n < max_per_window:
                    n += 1
                    out_ids.append(int(eid))
                    out_ranks.append(n)
        state.update((n,))
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_id": out_ids,
                    "user_id": [int(key[0])] * len(out_ids),
                    "win_start": [int(key[1])] * len(out_ids),
                    "in_window_rank": out_ranks,
                }
            )

    return _cap


def streaming_rate_cap(
    events: DataFrame, window_seconds: int, max_per_window: int
) -> DataFrame:
    """Admit-or-drop throttle over a streaming (event_id, user_id, ts)
    frame: at most ``max_per_window`` admitted rows per (user, window),
    arrival-ordered, exactly once across micro-batches (the admit counter
    is GroupState).  Returns the ADMITTED rows with their rank."""
    win_us = int(window_seconds) * 1_000_000
    # a - pmod(a, w): exact integer FLOOR bucket, matching the batch twin
    # (operators/sampling.rate_cap) on the whole signed epoch range —
    # `div` truncates toward zero and would diverge pre-1970.
    keyed = events.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(f"unix_micros(ts) - pmod(unix_micros(ts), {win_us})").alias("win_start"),
    )
    return keyed.groupBy("user_id", "win_start").applyInPandasWithState(
        _capper(int(max_per_window)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
