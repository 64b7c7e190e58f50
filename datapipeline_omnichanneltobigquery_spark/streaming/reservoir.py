"""Streaming weighted reservoir sampling — the A-Res reservoir
(Efraimidis & Spirakis, IPL 2006) maintained per key across micro-batches
in GroupState: each arriving item draws the deterministic key
u^(1/w) (ranked in the monotone log form ln(u)/w), and the state keeps
the top-``n`` set — CONSTANT size w.r.t. stream length, the defining
reservoir property.

Batch twin: :func:`operators.sampling.weighted_reservoir` — the top-n
by ln(u)/w over the whole corpus.  Because the key of an item depends
only on (seed, id, weight), never on arrival order, and max-n is a
mergeable fold, the final streaming reservoir is EXACTLY the batch
sample over the union of all micro-batches (pinned in
tests/test_streaming.py, including eviction of early items by later
heavier ones and Arrow chunk splits).

Output (append mode): the FULL reservoir snapshot after each
micro-batch, tagged with a per-key monotone ``ver`` from state — a
consumer takes the max-ver rows per key for the current sample; rows
per batch are bounded by n per key.

State: (ver, ids, weights, log-keys) — one bigint + three ≤n-element
arrays per key.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, ver bigint, id string, weight double, res_key double"
STATE_SCHEMA = (
    "ver bigint, ids array<string>, ws array<double>, lks array<double>"
)

_H_SPACE = float(1 << 60)


def _log_key(seed: str, item_id: str, weight: float) -> float:
    """ln(u)/w with u = (md5₆₀(seed:id) + 1) / 2⁶⁰ — the same hash text
    as the batch operator (md5 of the concatenated string, first 15 hex
    chars), so batch and stream rank identical keys."""
    h = int(hashlib.md5(f"{seed}:{item_id}".encode("utf-8")).hexdigest()[:15], 16)
    return math.log((h + 1) / _H_SPACE) / weight


def _reservoir(n: int, seed: str):
    def _run(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        ver, ids, ws, lks = state.get if state.exists else (0, [], [], [])
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return  # no rows for this key: leave state exactly as-is
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        whole = whole[whole["weight"] > 0]
        cand = pd.DataFrame(
            {
                "id": whole["id"].astype(str),
                "w": whole["weight"].astype(float),
            }
        )
        # math.log (not np.log): the C-library scalar log, the closest
        # twin of the JVM's Math.log the batch operator ranks with —
        # selection only needs ORDER agreement on distinct keys
        cand["lk"] = [
            _log_key(seed, i, w) for i, w in zip(cand["id"], cand["w"])
        ]
        pool = pd.concat(
            [pd.DataFrame({"id": ids, "w": ws, "lk": lks}), cand],
            ignore_index=True,
        )
        # top-n by (lk desc, id asc) — the batch operator's exact order
        top = pool.sort_values(["lk", "id"], ascending=[False, True]).head(n)
        ver += 1
        state.update(
            (int(ver), list(top["id"]), list(top["w"]), list(top["lk"]))
        )
        yield pd.DataFrame(
            {
                "key": str(key[0]),
                "ver": int(ver),
                "id": top["id"].to_numpy(),
                "weight": top["w"].to_numpy(),
                "res_key": [round(math.exp(v), 6) for v in top["lk"]],
            }
        )

    return _run


def streaming_weighted_reservoir(
    items: DataFrame,
    n: int = 10,
    key_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    seed: str = "ares-v1",
) -> DataFrame:
    """Per-key streaming A-Res reservoir over (key, id, weight) rows:
    after every micro-batch each key emits its current top-``n``
    weighted sample (snapshot rows tagged with a monotone ``ver``).
    Items with weight <= 0 draw no key and never enter the reservoir
    (the batch operator's contract)."""
    keyed = items.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("string").alias("id"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _reservoir(int(n), seed),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
