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
    driver=False,  # rotated out r9 (green r2-r8 (7 green); family keeps a gated anchor)
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
    """TPC-H Q3 shape: the segment-filtered customer keylist joins into
    orders (unhinted — customer scales with the data, AQE broadcasts it
    only while it measures small), one fact-fact shuffle, top-10 via
    TakeOrderedAndProject with unique-key tie-break."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
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
    tiny after the HAVING *today*, but a HAVING output is not bounded by
    construction — no hint; AQE broadcasts the semi-join side while it
    measures small."""
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
        l.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
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
    nation (fixed dim) broadcasts by hint, supplier/customer joins are
    AQE-sized, and the nation-pair disjunction prunes through them before
    the fact join."""
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
        .join(sd, li.l_suppkey == sd.s_suppkey)
        .join(cd, o.o_custkey == cd.c_custkey)
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


@query(
    "q4_order_priority",
    driver=False,  # variant of the gated semi-join family (join_semi gated)
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority distribution of orders that have at least one
    qualifying lineitem — an EXISTS that Catalyst plans as a left-semi join.
    (The schema has no commit/receipt dates, so the qualifying predicate is
    ``l_returnflag = 'R'``; the plan shape — filtered fact, semi-join,
    grouped count — is the judged artifact.)  The date filter prunes orders
    BEFORE the semi-join, so the shuffle carries one quarter, not the table."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_local_supplier_volume",
    driver=False,  # rotated out r8 (green r4-r7; TPC-H keeps q1/q3/q18 gated)
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the CUSTOMER and the SUPPLIER
    share a nation — the classic snowflake with a cross-dimension equality.
    region→nation broadcast into supplier (fixed dims by hint; supplier
    itself is AQE-sized); the only shuffles are the two fact joins
    (lineitem ⋈ orders ⋈ customer).  The s_nationkey = c_nationkey
    predicate rides the supplier join, so mismatched-nation rows die
    before the aggregate."""
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = read_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .groupBy("n_name")
        .agg(
            F.sum(money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    driver=False,  # variant of the gated join+agg+topk family
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost (returned) revenue in a
    quarter.  Both selective filters (date on orders, returnflag on
    lineitem) push to their scans; nation broadcasts by hint, customer by
    AQE sizing; the top-20
    is TakeOrderedAndProject with the unique c_custkey tie-break."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    driver=False,  # variant of the gated conditional-agg family
    oracle="""
    SELECT CAST(100.0 * (CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE))
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    GROUP BY ALL
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month — a
    conditional aggregate ratio over a fact ⋈ part join (AQE-sized —
    part scales with the data).  Both
    sums ride ONE aggregate (single shuffle of two partials); the division
    happens once on two DECIMAL-exact totals cast to double, so the ratio
    is bitwise-stable across engines."""
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(zero)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * (F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "q19_discounted_revenue",
    driver=False,  # variant of the gated join family (disjunctive pushdown shape)
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    GROUP BY ALL
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of brand/size/quantity
    conjuncts spanning BOTH join sides.  Catalyst extracts the common
    single-side conjuncts (the per-branch p_brand/p_size and l_quantity
    envelopes OR-folded) below the join, so each scan is pre-filtered even
    though the full predicate can only be decided after the join — the
    judged artifact is that the OR does not defeat pushdown.  (No
    p_container / l_shipmode columns in this schema; the disjunctive
    cross-side shape is preserved on brand × size × quantity.)"""
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    cond = branch("Brand#11", 15, 1, 11) | branch("Brand#22", 25, 10, 20) | branch(
        "Brand#33", 35, 20, 30
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    driver=False,  # filter+agg shape; scan family gated via event_time_filter/q1
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + ungrouped aggregate — every predicate
    must reach the parquet scan (PushedFilters carries all four), and the
    aggregate is a two-phase partial/final with no grouping keys: the
    minimal full-scan query, bounded only by IO."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(money(F.col("l_extendedprice")) * money(F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q15_top_supplier",
    driver=False,  # agg + scalar-subquery-max shape; families gated via q18/topk
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' consumed twice — by the max
    scalar subquery and the equality filter.  The two consumers are NOT
    identical exchange subtrees, so exchange reuse cannot dedupe them; the
    per-supplier aggregate (supplier-count rows, tiny at any corpus scale)
    is one-shot localCheckpointed instead — the quarter's lineitem scan +
    aggregate runs exactly once, both branches read the materialized rows
    (the dedup.py:238 discipline).  Ties return every top supplier,
    exactly like the spec."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount"))))
            .cast("double")
            .alias("total_revenue")
        )
        .localCheckpoint()
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("mx"))
        .join(s, rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    driver=False,  # correlated-avg shape; subquery family keeps local parity
    oracle="""
    WITH avg_q AS (
        SELECT l_partkey, 0.2 * AVG(CAST(l_quantity AS DECIMAL(18,2))) AS threshold
        FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_q a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < a.threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated per-part average de-correlated into
    an aggregate-then-join (what Catalyst does to the subquery form): the
    per-part threshold table is fact-sized-by-key — AQE broadcasts it
    after its aggregate only while it measures small; the brand filter
    prunes the probe side first.  The
    /7.0 ratio is applied once on the DECIMAL-exact sum."""
    l = read_table(spark, sf_dir, "lineitem")
    avg_q = l.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg(money(F.col("l_quantity")))).alias("threshold")
    )
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_q.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(money(F.col("l_extendedprice"))) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q8_market_share",
    driver=False,  # variant of the gated multiway-join family (q5 gated)
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND p.p_type = 'ECONOMY'
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): the widest snowflake in the suite —
    lineitem joined out to part, supplier, orders, customer and BOTH
    nation roles plus region.  nation/region are fixed-cardinality (25/5
    at every SF) so their broadcasts are provably bounded and hinted;
    part/supplier/customer scale with the data and are left to AQE.  The
    share is a ratio of two DECIMAL-exact sums over the SAME rows (one
    conditional), computed in a single aggregate pass — never two scans —
    then one double division."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    vol = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q12_late_shipment_priority",
    driver=False,  # conditional-agg variant (q14/pivot family gated)
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → adapted to late-shipment, the testdata
    lineitem carries no shipmode/commit/receipt columns): fact-fact equi
    join with a non-equi residual (shipdate > orderdate + 30 days — stays
    a join residual, never a post-join filter losing pushdown), then the
    canonical high/low CASE-pair aggregate.  The one-year shipdate window
    is pushed to the lineitem scan."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q21_suppliers_kept_waiting",
    driver=False,  # correlated exists/not-exists shape (semi/anti families gated)
    oracle="""
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; 'late' adapted
    to shipdate > orderdate + 60 days — the testdata has no commit/receipt
    dates).  The oracle is the textbook double-correlated EXISTS/NOT
    EXISTS DEFINITION; the Spark plan is its aggregate de-correlation —
    per-order distinct-supplier count and distinct-LATE-supplier count
    computed once, then 'another supplier exists' ⇔ n_supp ≥ 2 and 'no
    other late supplier' ⇔ n_late = 1.  Two per-key aggregates replace two
    correlated self-joins: one pass over lineitem each, no Σdf² candidate
    blowup, and the hash gate proves the rewrite exact."""
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = l.join(
        o,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
    ).select("l_orderkey", "l_suppkey")
    n_supp = l.groupBy("l_orderkey").agg(F.countDistinct("l_suppkey").alias("n_supp"))
    n_late = late.groupBy("l_orderkey").agg(F.countDistinct("l_suppkey").alias("n_late"))
    eligible = (
        n_supp.join(n_late, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .select("l_orderkey")
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(eligible, "l_orderkey", "left_semi")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@query(
    "q22_dormant_rich_customers",
    driver=False,  # scalar-subquery + anti-join shape (join_anti gated)
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / CAST(COUNT(c_acctbal) AS DOUBLE)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity; country-code substring
    adapted to the nation dim, 'no orders' adapted to 'no orders since
    2000' so the testdata yields a non-empty answer).  One ungrouped
    aggregate produces the acctbal cutoff — provably bounded (1 row), so
    the crossJoin broadcast is hinted; the AVG is DECIMAL-exact then one
    cast, order-independent across engines.  Dormancy is a left_anti
    against the date-pruned orders scan — null-safe, and the filter is
    pushed below the anti-join's shuffle."""
    c = read_table(spark, sf_dir, "customer")
    cutoff = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(money(F.col("c_acctbal"))).cast("double")
                / F.count("c_acctbal").cast("double")
            ).alias("cutoff")
        )
    )
    recent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )
