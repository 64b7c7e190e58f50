"""Event-stream-shaped queries over the events table (SURVEY.md §2.2
streaming row): tumbling windows and sessionization, expressed so the same
operator runs in batch (oracle-checked here) and under readStream
(tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipeline_omnichanneltobigquery_spark.plans.queries import query
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
from datapipeline_omnichanneltobigquery_spark.streaming.windows import (
    sessionize,
    session_stats,
    tumbling_counts,
)


@query(
    "events_tumbling_hourly",
    driver=False,  # rotated out r5 (green r3+r4; events_session_stats keeps the streaming-twin family gated)
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming agg;
    decimal-exact sums)."""
    return tumbling_counts(read_table(spark, sf_dir, "events"), "1 hour")


@query(
    "events_sessionize",
    driver=False,  # the sessionize CTE is driver-verified inside events_session_stats
    oracle=f"""
    SELECT event_id, user_id,
           -- CAST: DuckDB's integer SUM yields HUGEINT (int128); Spark yields
           -- bigint — the driver's value-hash distinguishes the two even when
           -- values are equal, so pin the oracle to BIGINT.
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM (
        SELECT event_id, user_id, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap)."""
    return sessionize(read_table(spark, sf_dir, "events"))


@query(
    "events_session_stats",
    driver=False,  # rotated out r7 (green r5-r6); events family keeps funnel/retention/resample gated
    oracle="""
    WITH s AS (
        SELECT event_id, user_id, ts,
               CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM (
            SELECT event_id, user_id, ts,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id)) AS gap_us
            FROM events
        )
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_s
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session event counts and durations."""
    return session_stats(read_table(spark, sf_dir, "events"))


@query(
    "scd2_user_state_history",
    driver=False,  # rotated out r6 (green r4+r5); upsert family keeps upsert_merge + cdc_snapshot_diff gated
    oracle="""
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to
    FROM events
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2/CDC: the events stream as a versioned per-user state history —
    each event opens a version valid until the user's next event (NULL =
    current).  operators/scd2.py generalizes this to merging change batches
    into an existing history."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
    )
