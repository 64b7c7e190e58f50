"""Customer-segmentation analytics: RFM (recency / frequency / monetary)
quintile scoring — the standard omnichannel marketing segmentation the
reference pipeline's downstream BigQuery consumers run on the loaded
order stream (SURVEY.md §2.2 extension surface; public technique, Hughes'
RFM formulation).

Determinism contract: scores are QUANTILE BUCKETS over an exact global
rank — ``score = 1 + ((rank - 1) * 5) div n`` with rank ordered by
(value, customer id), a total order.  This uniform-bucket formula is used
on BOTH engines verbatim (NTILE's remainder-distribution rule is
engine-defined trivia we don't depend on).  All rank inputs are integers
(days, counts, money in cents), so bucketing arithmetic is exact.

Scale: the rollup is one partial-aggregated groupBy(customer); each of
the three ranks uses exact-integer RANGE buckets + within-bucket
row_number + bucket offsets (the global_shuffle two-level discipline) —
never a single-partition global sort of the customer table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: range-bucket fan-out for the two-level global rank (constant, tiny
#: offset table; within-bucket sort parallelism scales with it)
RANK_BUCKETS = 32


def _global_rank(df: DataFrame, id_col: str, val_col: str, out: str) -> DataFrame:
    """Exact ascending global rank of (``val_col``, ``id_col``) appended as
    ``out`` — two-level: exact-integer range buckets ((v-lo)*B div span,
    monotone in v so bucket order == value order), parallel within-bucket
    row_number, plus the cumulative sizes of preceding buckets (a
    RANK_BUCKETS-row window, broadcast back)."""
    stats = df.agg(F.min(val_col).alias("__lo"), F.max(val_col).alias("__hi"))
    # localCheckpoint: `b` feeds BOTH the ranked window and the bucket-size
    # aggregate, and chained rank calls would otherwise re-embed the whole
    # upstream subtree twice per call (exponential plan growth — caught by
    # the r10 plan audit at 70 exchanges for three chained ranks)
    b = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__b",
            F.expr(f"(({val_col} - __lo) * {RANK_BUCKETS}) div (__hi - __lo + 1)"),
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("__b").orderBy(val_col, id_col)
    local = b.withColumn("__r", F.row_number().over(w))
    sizes = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    # RANK_BUCKETS rows — the single-partition window is deliberate and tiny
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    offs = sizes.select("__b", (F.sum("__c").over(wo) - F.col("__c")).alias("__o"))
    return (
        local.join(F.broadcast(offs), "__b")
        .withColumn(out, (F.col("__o") + F.col("__r")).cast("bigint"))
        .drop("__b", "__r", "__o", "__lo", "__hi")
    )


def rfm_scores(
    orders: DataFrame, cust_col: str, date_col: str, amount_col
) -> DataFrame:
    """RFM quintile segmentation over an order stream — one row per
    customer: (cust, recency_days, frequency, monetary, r_score, f_score,
    m_score, segment).  ``amount_col`` may be a column name or expression;
    it is summed in DECIMAL(18,2).  Recency anchors on the corpus MAX
    order date (reproducible — no wall clock).  r_score 5 = most recent,
    f/m_score 5 = most frequent / highest spend; segment is the standard
    5-bucket read (champion / loyal / new / at_risk / hibernating /
    regular)."""
    amount = F.col(amount_col) if isinstance(amount_col, str) else amount_col
    per_cust = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(F.col(date_col)).alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(amount.cast("decimal(18,2)")).alias("__mon"),
    )
    anchor = orders.agg(F.max(F.col(date_col)).alias("__anchor"))
    base = (
        per_cust.crossJoin(F.broadcast(anchor))
        .select(
            "cust",
            F.datediff(F.col("__anchor"), F.col("__last"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            F.col("__mon").cast("decimal(18,2)").alias("monetary"),
            # cents as BIGINT: the exact integer rank key for monetary
            (F.col("__mon") * 100).cast("bigint").alias("__cents"),
        )
        .localCheckpoint()  # three rank jobs + the final projection read it
    )
    n = base.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    ranked = _global_rank(base, "cust", "recency_days", "__rr")
    ranked = _global_rank(ranked, "cust", "frequency", "__fr")
    ranked = _global_rank(ranked, "cust", "__cents", "__mr")
    # integer `div` on positive operands == DuckDB's `//` — never float
    # division for a bucket boundary
    out = ranked.crossJoin(F.broadcast(n)).select(
        F.col("cust").alias(cust_col),
        "recency_days",
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        # ascending recency rank = most recent first -> invert to 5-best
        F.expr("CAST(6 - (1 + ((__rr - 1) * 5) div __n) AS INT)").alias("r_score"),
        F.expr("CAST(1 + ((__fr - 1) * 5) div __n AS INT)").alias("f_score"),
        F.expr("CAST(1 + ((__mr - 1) * 5) div __n AS INT)").alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4), "champion")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return out.withColumn("segment", seg)


def rfm_scores_sql(table: str, cust_col: str, date_col: str, amount_sql: str) -> str:
    """DuckDB twin of :func:`rfm_scores` — single ROW_NUMBER ranks (the
    two-level Spark plan must equal the definitional global rank; bucket
    boundaries cannot change a rank), identical score formula.  NOTE the
    integer division: ``(rank-1)*5 // n`` on positive operands equals
    Spark's ``div`` exactly."""
    return f"""
    WITH per_cust AS (
        SELECT {cust_col} AS cust,
               MAX({date_col}) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST({amount_sql} AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS mon
        FROM {table} GROUP BY 1
    ),
    anchor AS (SELECT MAX({date_col}) AS a FROM {table}),
    base AS (
        SELECT cust,
               CAST(datediff('day', last_order, a) AS BIGINT) AS recency_days,
               frequency, mon,
               CAST(mon * 100 AS BIGINT) AS cents
        FROM per_cust CROSS JOIN anchor
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY recency_days, cust) AS rr,
               ROW_NUMBER() OVER (ORDER BY frequency, cust) AS fr,
               ROW_NUMBER() OVER (ORDER BY cents, cust) AS mr,
               COUNT(*) OVER () AS n
        FROM base
    ),
    scored AS (
        SELECT cust AS {cust_col}, recency_days, frequency,
               CAST(mon AS DOUBLE) AS monetary,
               CAST(6 - (1 + ((rr - 1) * 5) // n) AS INT) AS r_score,
               CAST(1 + ((fr - 1) * 5) // n AS INT) AS f_score,
               CAST(1 + ((mr - 1) * 5) // n AS INT) AS m_score
        FROM ranked
    )
    SELECT *,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    """
