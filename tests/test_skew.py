"""Salting rewrites must be result-identical to the plain plans."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.operators.skew import salted_agg, salted_join
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table

from tests.conftest import SF_DIR


def test_salted_agg_equals_plain(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag, r.n, float(r.s))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n, float(r.s))
        for r in salted_agg(
            li,
            keys=["l_returnflag"],
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("ps"),
            ],
            merge_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            unique_col="l_orderkey",
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    orders = read_table(spark, SF_DIR, "orders")
    cust = read_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = {
        (r.o_orderkey, r.c_mktsegment)
        for r in orders.join(cust, "o_custkey").select("o_orderkey", "c_mktsegment").collect()
    }
    salted = {
        (r.o_orderkey, r.c_mktsegment)
        for r in salted_join(orders, cust, key="o_custkey", unique_left_col="o_orderkey", n_salts=8)
        .select("o_orderkey", "c_mktsegment")
        .collect()
    }
    assert salted == plain


def test_skew_report_null_key_at_boundary(spark, duck):
    """A NULL hot key tying in n_rows at the top_k boundary must select the
    SAME row set on both engines: Spark defaults ascending NULLS FIRST,
    DuckDB NULLS LAST — the explicit NULLS LAST tie-break pins it."""
    from datapipeline_omnichanneltobigquery_spark.operators.skew import (
        skew_report,
        skew_report_sql,
    )
    from tests.helpers import compare_spark_duckdb

    # keys a,b,NULL all tie at 3 rows; top_k=2 cuts through the tie
    rows = [("a",)] * 3 + [("b",)] * 3 + [(None,)] * 3 + [("z",)]
    df = spark.createDataFrame(rows, "key_col string")
    duck.sql("CREATE OR REPLACE TEMP TABLE _skew_null AS "
             "SELECT * FROM (VALUES ('a'),('a'),('a'),('b'),('b'),('b'),"
             "(NULL),(NULL),(NULL),('z')) t(key_col)")
    try:
        compare_spark_duckdb(
            skew_report(df, "key_col", top_k=2),
            duck,
            skew_report_sql("_skew_null", "key_col", top_k=2),
        )
    finally:
        duck.sql("DROP TABLE _skew_null")
