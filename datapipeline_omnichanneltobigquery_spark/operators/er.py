"""Entity-resolution survivorship: collapse each matched cluster into ONE
golden record with per-field merge rules — the step after blocking
(dedup.py::snm_pairs / the blocked ER scorer in plans/relational2.py),
scoring (Fellegi-Sunter shape) and clustering
(dedup.py::connected_components_star).  Reference scope: the reference
pipeline upserts raw records by id (omnichannel_to_bq.py:168-186) and has
no notion of merging duplicates; this is part of the §2.2 extension
surface a training-data / MDM pipeline needs.

Scale shape: survivorship is ONE key-partitioned aggregate over
(cluster_id) — no self-joins, no windows over the full table; each
``most_frequent`` rule adds one (cluster, value)-count pre-aggregate
(partial-combined map-side) joined back on cluster_id.  At 100 TB the
cost is the same groupBy you would pay for any per-cluster rollup.

Determinism (the oracle-gate rails): every rule resolves ties totally —
``longest`` picks the lexicographically GREATEST among longest values,
``most_frequent`` the lexicographically greatest among modal values,
``latest`` breaks recency ties by greatest id — so both engines select
the identical survivor bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: rule strategies handled in the single per-cluster aggregate
_SIMPLE = {"longest", "max", "min", "latest"}


def golden_records(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    rules: list,
    recency_col: str | None = None,
) -> DataFrame:
    """One golden record per cluster.

    ``clusters`` is an (id, cluster_id) frame (the contract of
    ``connected_components_star``); rows of ``df`` absent from it become
    singleton clusters (cluster_id = own id), so the output covers the
    whole table.  ``rules`` is a list of ``(col, strategy)`` with
    strategy one of:

    - ``longest``       longest non-null string (tie: lexicographically greatest)
    - ``most_frequent`` modal non-null value (tie: greatest value)
    - ``max`` / ``min`` plain extrema
    - ``latest``        value on the row with max ``recency_col`` (tie: max id)

    Output: ``cluster_id``, one column per rule (original name), and
    ``n_members``.
    """
    membered = df.join(
        clusters.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))

    aggs = [F.count(F.lit(1)).alias("n_members")]
    for col, strat in rules:
        if strat == "longest":
            packed = F.when(
                F.col(col).isNotNull(),
                F.struct(F.length(col).alias("l"), F.col(col).alias("v")),
            )
            aggs.append(F.max(packed)["v"].alias(col))
        elif strat == "max":
            aggs.append(F.max(col).alias(col))
        elif strat == "min":
            aggs.append(F.min(col).alias(col))
        elif strat == "latest":
            if recency_col is None:
                raise ValueError("latest rule requires recency_col")
            packed = F.when(
                F.col(col).isNotNull(),
                F.struct(
                    F.col(recency_col).alias("r"),
                    F.col(id_col).alias("i"),
                    F.col(col).alias("v"),
                ),
            )
            aggs.append(F.max(packed)["v"].alias(col))
        elif strat != "most_frequent":
            raise ValueError(f"unknown survivorship strategy {strat!r}")

    out = membered.groupBy("cluster_id").agg(*aggs)

    for col, strat in rules:
        if strat != "most_frequent":
            continue
        modal = (
            membered.filter(F.col(col).isNotNull())
            .groupBy("cluster_id", col)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy("cluster_id")
            .agg(
                F.max(
                    F.struct(F.col("__cnt").alias("c"), F.col(col).alias("v"))
                )["v"].alias(col)
            )
        )
        out = out.join(modal, "cluster_id", "left")

    ordered = ["cluster_id"] + [c for c, _ in rules] + ["n_members"]
    return out.select(*ordered)


def golden_records_sql(
    table_sql: str,
    id_col: str,
    clusters_sql: str,
    rules: list,
    recency_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`golden_records` — window/row_number selection
    with the identical total tie orders.  ``table_sql`` / ``clusters_sql``
    are full SELECTs (clusters yielding (id, cluster_id))."""
    joins = []
    sel = ["g.cluster_id"]
    for i, (col, strat) in enumerate(rules):
        a = f"r{i}"
        if strat == "longest":
            sub = (
                f"SELECT cluster_id, {col} FROM ("
                f"SELECT cluster_id, {col}, ROW_NUMBER() OVER ("
                f"PARTITION BY cluster_id ORDER BY length({col}) DESC, {col} DESC"
                f") AS rn FROM mem WHERE {col} IS NOT NULL) WHERE rn = 1"
            )
        elif strat == "most_frequent":
            sub = (
                f"SELECT cluster_id, {col} FROM ("
                f"SELECT cluster_id, {col}, ROW_NUMBER() OVER ("
                f"PARTITION BY cluster_id ORDER BY COUNT(*) DESC, {col} DESC"
                f") AS rn FROM mem WHERE {col} IS NOT NULL GROUP BY cluster_id, {col}"
                f") WHERE rn = 1"
            )
        elif strat in ("max", "min"):
            fn = strat.upper()
            sub = f"SELECT cluster_id, {fn}({col}) AS {col} FROM mem GROUP BY cluster_id"
        elif strat == "latest":
            sub = (
                f"SELECT cluster_id, {col} FROM ("
                f"SELECT cluster_id, {col}, ROW_NUMBER() OVER ("
                f"PARTITION BY cluster_id ORDER BY {recency_col} DESC, {id_col} DESC"
                f") AS rn FROM mem WHERE {col} IS NOT NULL) WHERE rn = 1"
            )
        else:
            raise ValueError(f"unknown survivorship strategy {strat!r}")
        joins.append(f"    LEFT JOIN ({sub}) {a} USING (cluster_id)")
        sel.append(f"{a}.{col}")
    sel.append("cnt.n_members")
    join_block = "\n".join(joins)
    return f"""
    WITH src AS ({table_sql}),
    cc AS ({clusters_sql}),
    mem AS (
        SELECT src.*, COALESCE(cc.cluster_id, src.{id_col}) AS cluster_id
        FROM src LEFT JOIN cc ON cc.id = src.{id_col}
    ),
    cnt AS (SELECT cluster_id, COUNT(*) AS n_members FROM mem GROUP BY cluster_id)
    SELECT {', '.join(sel)}
    FROM (SELECT DISTINCT cluster_id FROM mem) g
{join_block}
    LEFT JOIN cnt USING (cluster_id)
    """


def reciprocal_best(
    pairs, id_a: str = "id_a", id_b: str = "id_b", score_col: str = "match_score"
):
    """Reciprocal-best-match filter over a scored UNDIRECTED pair list:
    keep (a, b) only when b is a's highest-scoring partner AND a is b's —
    the standard ER precision upgrade (a hub record that weakly matches
    everything survives blocked scoring but is nobody's mutual best).
    Ties break to the smaller partner id, so "best" is a total order and
    the output is engine-exact.  The argmax is a struct-MIN over
    (-score, dst): negating the (double) score instead of the id keeps
    the filter generic — ids may be strings, and a Long.MIN_VALUE id
    can't overflow; the raw ids never pass through a negation.

    Scale: explode pairs to a directed view (2|pairs| rows), one
    partial-aggregated struct-min per src (argmax without a window sort),
    then a self-join of the node-count-sized best table — never touches
    the records themselves."""
    import pyspark.sql.functions as F

    d1 = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst"), F.col(score_col).alias("s")
    )
    d2 = pairs.select(
        F.col(id_b).alias("src"), F.col(id_a).alias("dst"), F.col(score_col).alias("s")
    )
    best = (
        d1.unionByName(d2)
        .groupBy("src")
        .agg(
            F.min(
                F.struct(
                    (-F.col("s").cast("double")).alias("neg_s"),
                    F.col("dst"),
                    F.col("s"),
                )
            ).alias("__b")
        )
        .select(
            "src",
            F.col("__b.dst").alias("best_dst"),
            F.col("__b.s").alias("best_s"),
        )
        .localCheckpoint()  # both self-join sides read it
    )
    x, y = best.alias("x"), best.alias("y")
    return (
        x.join(
            y,
            (F.col("x.best_dst") == F.col("y.src"))
            & (F.col("y.best_dst") == F.col("x.src"))
            & (F.col("x.src") < F.col("x.best_dst")),
        )
        .select(
            F.col("x.src").alias(id_a),
            F.col("x.best_dst").alias(id_b),
            F.col("x.best_s").alias(score_col),
        )
    )


def reciprocal_best_sql(
    pairs_sql: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "match_score",
) -> str:
    """DuckDB twin of :func:`reciprocal_best` — same struct-min argmax
    ((-score, dst) lexicographic), same mutuality join."""
    return f"""
    WITH pairs AS ({pairs_sql}),
    directed AS (
        SELECT {id_a} AS src, {id_b} AS dst, {score_col} AS s FROM pairs
        UNION ALL
        SELECT {id_b} AS src, {id_a} AS dst, {score_col} AS s FROM pairs
    ),
    best AS (
        SELECT src,
               (MIN(struct_pack(ns := -CAST(s AS DOUBLE), dst := dst, s := s))).dst
                 AS best_dst,
               (MIN(struct_pack(ns := -CAST(s AS DOUBLE), dst := dst, s := s))).s
                 AS best_s
        FROM directed GROUP BY src
    )
    SELECT x.src AS {id_a}, x.best_dst AS {id_b}, x.best_s AS {score_col}
    FROM best x JOIN best y
      ON x.best_dst = y.src AND y.best_dst = x.src AND x.src < x.best_dst
    """
