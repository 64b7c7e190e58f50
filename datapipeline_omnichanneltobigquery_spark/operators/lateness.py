"""Watermark-lag / late-data audit — the LATENESS instrumentation the
streaming family's state operators monitor production with.

The reference loads event batches into BigQuery with no arrival-order
accounting (omnichannel_to_bq.py:143-201 appends whatever the API
returned); a streaming deployment of the same pipeline needs to know,
per key, how far event time runs behind arrival — because that lag is
what sizes the watermark delay, and rows beyond the delay are silently
DROPPED by every watermarked stateful operator downstream.

Semantics (per-key watermark, the scalable monitoring shape): order
each key's rows by an explicit ARRIVAL column (a monotone ingestion
sequence — the caller's contract; a composite zero-padded string works
when arrival is synthetic), define the key's watermark before row i as

    wm_i = max(event_time over the key's arrivals strictly before i)
           − allowed_delay

and call row i LATE iff event_time_i < wm_i, with
lag_i = wm_i − event_time_i.  The first arrival of a key is never late
(empty prefix → no watermark yet).  Spark's built-in watermark is
query-global and batch-granular; the per-key prefix form here is the
DETERMINISTIC, engine-reproducible audit of the same phenomenon — it
bounds the global form (a row late per-key is at least as late
globally) and is what you alert on per source/tenant.

Exactness: event times convert to integer MICROSECONDS once
(``unix_micros`` / ``epoch_us``); prefix maxima, lags, and counts are
exact bigints; ``late_share`` is the single rounded division.

Scale: ONE shuffle on the key for the prefix-max window (the window
frame is ROWS UNBOUNDED PRECEDING → Spark keeps a single running max,
no buffering), then one partial-aggregated rollup — linear, no global
windows, no driver collects.  Skewed keys spread via AQE like every
other per-key window in the catalog.

The streaming face (streaming/lateness.py::streaming_lateness) keeps
(has, max_ts) per key in GroupState and emits per-batch delta rows;
summing deltas over an arrival-ordered replay equals this batch audit
(pinned in tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def lateness_audit(
    df: DataFrame,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    delay_seconds: int,
) -> DataFrame:
    """Per-key lateness report: (key, n_rows, n_late, max_lag_us,
    late_share).  ``max_lag_us`` is 0 when no row is late.  See the
    module docstring for the watermark definition."""
    if delay_seconds < 0:
        raise ValueError(f"delay_seconds must be >= 0, got {delay_seconds}")
    delay_us = int(delay_seconds) * 1_000_000
    w = Window.partitionBy("__k").orderBy("__a").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(arrival_col).alias("__a"),
        F.unix_micros(F.col(ts_col)).alias("__m"),
    )
    scored = base.withColumn("__pmax", F.max("__m").over(w)).select(
        "__k",
        F.when(
            F.col("__pmax").isNotNull(),
            F.greatest(F.col("__pmax") - F.lit(delay_us) - F.col("__m"), F.lit(0)),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("__lag"),
    )
    return (
        scored.groupBy("__k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum((F.col("__lag") > 0).cast("bigint")).alias("n_late"),
            F.max("__lag").alias("max_lag_us"),
        )
        .select(
            F.col("__k").alias(key_col),
            "n_rows",
            "n_late",
            "max_lag_us",
            F.round(
                F.col("n_late").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("late_share"),
        )
    )


def lateness_audit_sql(
    table_sql: str,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    delay_seconds: int,
) -> str:
    """DuckDB twin of :func:`lateness_audit` — identical prefix-max
    frame, integer-micro lags, and final division."""
    if delay_seconds < 0:
        raise ValueError(f"delay_seconds must be >= 0, got {delay_seconds}")
    delay_us = int(delay_seconds) * 1_000_000
    return f"""
    WITH base AS (
        SELECT {key_col} AS k, {arrival_col} AS a, epoch_us({ts_col}) AS m
        FROM ({table_sql})),
    wm AS (
        SELECT k, m,
               MAX(m) OVER (PARTITION BY k ORDER BY a
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS pmax
        FROM base),
    scored AS (
        SELECT k,
               CAST(CASE WHEN pmax IS NULL THEN 0
                    ELSE GREATEST(pmax - {delay_us} - m, 0) END AS BIGINT) AS lag
        FROM wm)
    SELECT k AS {key_col},
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN lag > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           MAX(lag) AS max_lag_us,
           round(CAST(SUM(CASE WHEN lag > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS late_share
    FROM scored GROUP BY 1
    """


def late_window_drops(
    df: DataFrame,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    delay_seconds: int,
    window_seconds: int,
) -> DataFrame:
    """Per (key, tumbling window) DROP accounting: how many of the
    window's rows a watermarked streaming aggregate would discard —
    a row is dropped when its WINDOW'S END is already at-or-behind the
    key's watermark at the row's arrival (the window is closed; the
    standard structured-streaming drop rule).  Returns
    (key, window_start_us, n_rows, n_dropped) — windows with zero drops
    included, so the report shows coverage, not just failures."""
    if delay_seconds < 0 or window_seconds <= 0:
        raise ValueError(
            f"need delay_seconds >= 0 and window_seconds > 0, got "
            f"({delay_seconds}, {window_seconds})"
        )
    delay_us = int(delay_seconds) * 1_000_000
    win_us = int(window_seconds) * 1_000_000
    w = Window.partitionBy("__k").orderBy("__a").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(arrival_col).alias("__a"),
        F.unix_micros(F.col(ts_col)).alias("__m"),
    )
    # window start via TRUE floor (m − mathematical mod), not `div`:
    # both engines' integer division truncates toward zero, which would
    # collapse the windows on either side of epoch 0 for pre-1970 event
    # times — ((m % w) + w) % w is the branch-free non-negative remainder.
    wstart = F.expr(f"__m - (((__m % {win_us}) + {win_us}) % {win_us})")
    scored = base.withColumn("__pmax", F.max("__m").over(w)).select(
        "__k",
        wstart.cast("bigint").alias("window_start_us"),
        F.when(
            F.col("__pmax").isNotNull()
            & (wstart + F.lit(win_us) <= F.col("__pmax") - F.lit(delay_us)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("__drop"),
    )
    return scored.groupBy("__k", "window_start_us").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("__drop").alias("n_dropped"),
    ).select(
        F.col("__k").alias(key_col), "window_start_us", "n_rows", "n_dropped"
    )


def late_window_drops_sql(
    table_sql: str,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    delay_seconds: int,
    window_seconds: int,
) -> str:
    """DuckDB twin of :func:`late_window_drops`."""
    if delay_seconds < 0 or window_seconds <= 0:
        raise ValueError(
            f"need delay_seconds >= 0 and window_seconds > 0, got "
            f"({delay_seconds}, {window_seconds})"
        )
    delay_us = int(delay_seconds) * 1_000_000
    win_us = int(window_seconds) * 1_000_000
    return f"""
    WITH base AS (
        SELECT {key_col} AS k, {arrival_col} AS a, epoch_us({ts_col}) AS m
        FROM ({table_sql})),
    wm AS (
        SELECT k, m,
               MAX(m) OVER (PARTITION BY k ORDER BY a
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS pmax
        FROM base),
    scored AS (
        SELECT k,
               CAST(m - (((m % {win_us}) + {win_us}) % {win_us}) AS BIGINT)
                 AS window_start_us,
               CAST(CASE WHEN pmax IS NOT NULL
                          AND m - (((m % {win_us}) + {win_us}) % {win_us})
                              + {win_us} <= pmax - {delay_us}
                    THEN 1 ELSE 0 END AS BIGINT) AS drp
        FROM wm)
    SELECT k AS {key_col}, window_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(drp) AS BIGINT) AS n_dropped
    FROM scored GROUP BY 1, 2
    """
