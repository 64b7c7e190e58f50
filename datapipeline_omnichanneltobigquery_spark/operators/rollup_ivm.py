"""Incremental view maintenance for rollup aggregates (continuous
aggregates / hypertable-rollup pattern).

A materialized per-(window, key) aggregate is kept up to date by MERGING
each new batch's partial aggregate into it — never re-reading the raw
history.  Works because the maintained aggregates are decomposable
(count/sum; avg = sum/count at read time; min/max merge with min/max).

At 100 TB this is the difference between O(batch) and O(history) per
refresh: the stored rollup is orders of magnitude smaller than the events
table, the merge is a full-outer join on the rollup key (broadcastable
batch side), and in streaming the same function is the ``foreachBatch``
body.  Decimal-exact sums keep refresh order irrelevant to the result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def rollup_partial(events: DataFrame, window_len: str = "1 hour") -> DataFrame:
    """Partial rollup of one batch: (window_start, event_type, n, sum_value
    as exact decimal)."""
    return (
        events.groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def rollup_merge(current: DataFrame, batch_partial: DataFrame) -> DataFrame:
    """Merge a batch's partial rollup into the maintained rollup: full-outer
    on the rollup key, counts and sums add (aggregate-merge, not overwrite)."""
    keys = ["window_start", "event_type"]
    c = current.select(
        *keys, F.col("n").alias("n_c"), F.col("sum_value").alias("s_c")
    )
    b = batch_partial.select(
        *keys, F.col("n").alias("n_b"), F.col("sum_value").alias("s_b")
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return c.join(b, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col("n_c"), F.lit(0)) + F.coalesce(F.col("n_b"), F.lit(0))).alias("n"),
        (F.coalesce(F.col("s_c"), zero) + F.coalesce(F.col("s_b"), zero))
        .cast("decimal(18,6)")
        .alias("sum_value"),
    )
