"""Iterative graph analytics: fixed-point PageRank (SURVEY.md §2.2
extension surface — the iterative-algorithm complement to the
large-star/small-star connected components in operators/dedup.py).

PageRank's textbook form sums floating-point contributions per node, and a
distributed groupBy sums in arbitrary order — run-to-run (and engine-to-
engine) nondeterminism in the low bits, which the oracle gate would
reject.  This implementation works in 10^12-denominator FIXED POINT:
ranks are BIGINTs, each edge contribution is the integer
``(85 * r) div (100 * deg)`` (damping 0.85 as a ratio of integers), and
sums of integers are exact in any order.  The flooring loss per edge is
< 1e-12 of total rank — irrelevant for ranking, decisive for
reproducibility: Spark and DuckDB produce bit-identical ranks.

Scale: each iteration is one join (edges ⋈ ranks — co-partitioned on the
source key after the first shuffle) + one partial-aggregated groupBy(dst)
+ one left join back onto the node list.  Edges/degrees/nodes are computed
once and localCheckpointed (the q15 discipline) so k iterations never
re-derive the graph; rank state stays (node, BIGINT) — 16 bytes a row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 10**12  # fixed-point denominator
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio


def pagerank_fixedpoint(
    edges: DataFrame, iterations: int = 3, checkpoint_every: int = 4
) -> DataFrame:
    """PageRank over directed ``edges`` (src, dst) — ``iterations`` exact
    fixed-point rounds from a uniform start.  Returns (node, rank) with
    rank in units of 1/SCALE.  Nodes are the union of srcs and dsts;
    dangling nodes (no out-edges) simply stop propagating — their rank
    mass decays into the teleport term, the standard simplification.
    An empty edge set returns an empty (node, rank) frame instead of
    dividing by n = 0.  The evolving ``ranks`` state is localCheckpointed
    every ``checkpoint_every`` rounds so plan depth (and Catalyst analysis
    cost) stays bounded at high iteration counts — the same discipline as
    ``connected_components``."""
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = nodes.count()  # scalar: fixes r0 and the teleport base
    if n == 0:
        return nodes.select("node", F.lit(0).cast("bigint").alias("rank")).limit(0)
    r0 = SCALE // n
    base = (15 * SCALE) // (100 * n)
    ranks = nodes.withColumn("r", F.lit(r0).cast("bigint"))
    for it in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                "dst",
                F.expr(f"({DAMP_NUM} * r) div ({DAMP_DEN} * deg)").alias("c"),
            )
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("bigint").alias("r"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.col("r").alias("rank"))


def pagerank_fixedpoint_sql(edges_sql: str, iterations: int = 3) -> str:
    """DuckDB twin of :func:`pagerank_fixedpoint`: the same iterations
    unrolled as CTEs with identical integer arithmetic (``//`` is DuckDB's
    flooring integer division ≡ Spark's ``div`` on non-negative
    operands)."""
    parts = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1)",
        f"c0 AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({SCALE} // n AS BIGINT) AS r FROM nodes, c0)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""s{i} AS (SELECT e.dst, SUM(({DAMP_NUM} * p.r) // ({DAMP_DEN} * d.deg)) AS s
         FROM edges e JOIN {prev} p ON p.node = e.src
         JOIN deg d ON d.src = e.src GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS (SELECT n.node,
                CAST((15 * {SCALE}) // (100 * c0.n) + COALESCE(s{i}.s, 0) AS BIGINT) AS r
         FROM nodes n LEFT JOIN s{i} ON s{i}.dst = n.node, c0)"""
        )
        prev = f"r{i}"
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, r AS rank FROM {prev}"
