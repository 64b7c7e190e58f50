"""RFM segmentation (operators/segments.py): score semantics on a known
corpus and the two-level global rank against the definitional single
window."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import Window


def test_rfm_scores_known_customers(spark):
    """A 5-customer corpus engineered so quintiles are singletons: the
    most recent/frequent/valuable customer scores (5,5,5) = champion, the
    stalest/least (1,1,1) = hibernating."""
    from datapipeline_omnichanneltobigquery_spark.operators.segments import rfm_scores

    base = dt.datetime(2024, 1, 1)
    rows = []
    for c in range(1, 6):
        # customer c: c orders, most recent at base + c days, each worth 100*c
        for i in range(c):
            rows.append((c, base + dt.timedelta(days=c - i), 100.0 * c))
    df = spark.createDataFrame(rows, "cust long, odate timestamp, amount double")
    out = {r.cust: r for r in rfm_scores(df, "cust", "odate", "amount").collect()}
    assert out[5].r_score == 5 and out[5].f_score == 5 and out[5].m_score == 5
    assert out[5].segment == "champion"
    assert out[1].r_score == 1 and out[1].f_score == 1 and out[1].m_score == 1
    assert out[1].segment == "hibernating"
    assert out[5].recency_days == 0 and out[1].recency_days == 4
    assert out[3].frequency == 3 and out[3].monetary == 900.0


def test_global_rank_matches_single_window(spark):
    """The two-level range-bucket rank == ROW_NUMBER over the full order,
    for a skewed value distribution with duplicates (ties broken by id)."""
    from datapipeline_omnichanneltobigquery_spark.operators.segments import _global_rank

    df = spark.range(500).select(
        F.col("id").alias("cust"),
        (F.col("id") % 17 * F.col("id") % 97).cast("bigint").alias("val"),
    )
    got = {r.cust: r.rk for r in _global_rank(df, "cust", "val", "rk").collect()}
    w = Window.orderBy("val", "cust")
    want = {
        r.cust: r.rk
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want
