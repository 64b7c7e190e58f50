"""Rendezvous (highest-random-weight) sharding: a stable, coordination-free
assignment of keys to N shards where changing N relocates only the
mathematically minimal fraction of keys.

Why a 100 TB pipeline wants this instead of ``hash(key) % N``: with
modulo, growing 8 shards to 9 relocates ~8/9 of ALL keys — every
downstream cache, co-located index and incremental job rebuilds from
scratch.  With HRW (Thaler & Ravishankar '96), each key independently
scores every shard with ``h(key, shard)`` and lives on the argmax; adding
shard N+1 only claims the keys whose new score beats their old winner —
exactly 1/(N+1) in expectation — and REMOVING a shard only reassigns that
shard's own keys.  Keys that move under growth provably move TO the new
shard (their old argmax is unchanged among the old shards), which is the
property the tests pin.

Scale shape: the assignment is a pure per-row projection — ZERO shuffles,
no state, no coordination; N md5s per row (N = shard count, a small
constant).  Reference scope: the reference loads everything into one
BigQuery table (omnichannel_to_bq.py:143-165); sharding is §2.2 extension
surface for distributing a corpus across writers/stores.

Determinism: weights are the repo's 60-bit md5 bigints (collision odds
~n·N/2^60 per key); ties (astronomically unlikely) still resolve totally
by struct order (weight, then shard id) on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long, md5_long_sql


def hrw_shard(key: Column, n_shards: int, salt: str = "hrw") -> Column:
    """The HRW shard id of ``key`` among ``n_shards`` shards — a pure
    column expression (compose it into any projection)."""
    scored = F.array(
        *[
            F.struct(
                md5_long(F.concat(F.lit(f"{salt}{s}:"), key.cast("string"))).alias("w"),
                F.lit(s).alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(scored)["s"]


def hrw_shard_sql(key_expr: str, n_shards: int, salt: str = "hrw") -> str:
    """DuckDB twin of :func:`hrw_shard` (list_max over (w, s) structs —
    the identical total order)."""
    packs = []
    for s in range(n_shards):
        w = md5_long_sql(f"concat('{salt}{s}:', CAST({key_expr} AS VARCHAR))")
        packs.append(f"struct_pack(w := {w}, s := {s})")
    return f"(list_max([{', '.join(packs)}])).s"


def shard_assignments(
    df: DataFrame, key_col: str, n_shards: int, salt: str = "hrw"
) -> DataFrame:
    """(key, shard) for every row — one narrow map-side projection."""
    return df.select(
        F.col(key_col), hrw_shard(F.col(key_col), n_shards, salt).alias("shard")
    )
