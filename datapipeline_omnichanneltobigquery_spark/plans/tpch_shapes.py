"""Additional TPC-H query shapes (Q3, Q18) — the canonical mixed
join+agg+top-k plans every warehouse engine is judged on.  Decimal-exact
money math throughout (functions/scalars.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_omnichanneltobigquery_spark.functions.scalars import money
from datapipeline_omnichanneltobigquery_spark.plans.queries import query
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment dim filter broadcasts into the orders scan,
    one fact-fact shuffle, top-10 via TakeOrderedAndProject with unique-key
    tie-break."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(
            F.sum(money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a semi-join back
    into the fact join — the 'big order' pattern.  The big-orders set is
    tiny after the HAVING, so it broadcasts as the semi-join side."""
    l = read_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        l.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(money(F.col("l_quantity"))).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "q7_volume_shipping",
    driver=False,  # variant of the gated join+agg family (Q3/Q18/multiway gated)
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'FRANCE' AND nc.n_name = 'GERMANY')
        OR (ns.n_name = 'GERMANY' AND nc.n_name = 'FRANCE'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year.  The fact side shuffles once (lineitem ⋈ orders on orderkey);
    supplier/customer/nation all ride broadcasts, and the nation-pair
    disjunction prunes through them before the fact join."""
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    ns = n.select(F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation"))
    sd = s.join(F.broadcast(ns), "s_nationkey").select("s_suppkey", "supp_nation")
    cd = c.join(F.broadcast(nc), "c_nationkey").select("c_custkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY")
    ) | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sd), li.l_suppkey == sd.s_suppkey)
        .join(F.broadcast(cd), o.o_custkey == cd.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q13_customer_distribution",
    driver=False,  # variant of the gated join+agg family
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — a groupBy OF a
    groupBy (histogram of per-customer counts), with the classic
    conditional LEFT join (the filter lives in the join condition, so
    customers whose every order is excluded still count at c_count = 0 —
    a WHERE would silently drop them).  The second aggregate's input is
    one row per customer, so its shuffle is tiny regardless of fact size."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
