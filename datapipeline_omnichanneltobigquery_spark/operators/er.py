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


def fs_weights(
    pairs: DataFrame, label_col: str, field_cols: list[str], alpha: float = 1.0
) -> DataFrame:
    """Fellegi-Sunter match/unmatch weight ESTIMATION (Fellegi & Sunter,
    JASA 1969) from labeled candidate pairs — the learning step that
    turns the fixed-weight ER scorer (plans/relational2.py
    ``er_part_matches``) into a principled one: for each comparison
    field k, estimate m_k = P(agree_k | match) and
    u_k = P(agree_k | non-match) with Laplace smoothing ``alpha``, and
    report the log-likelihood-ratio weights the linkage score sums —
    w_agree = ln(m/u), w_disagree = ln((1-m)/(1-u)).

    ``pairs`` carries one row per labeled candidate pair with
    ``label_col`` (boolean: true match) and one boolean agreement column
    per field.  Output: one row per field —
    (field, n_match, n_unmatch, m, u, w_agree, w_disagree), ordered by
    field name.

    Scale shape: ONE partial+final aggregate over the pair list (counts
    only — 4 integers per field); the per-field pivot is a fixed-width
    stack expression, no shuffle beyond the single scalar aggregate.
    Determinism: exact integer counts; m, u and both weights are each
    ONE fixed-order double expression over those counts (the smoothing
    sums stay integer-valued until the division), rounded to 6."""
    lab = F.col(label_col).cast("int")
    aggs = [F.sum(lab).cast("bigint").alias("n_match")]
    aggs.append((F.count(F.lit(1)) - F.sum(lab)).cast("bigint").alias("n_unmatch"))
    for f in field_cols:
        a = F.col(f).cast("int")
        aggs.append(F.sum(a * lab).cast("bigint").alias(f"__am_{f}"))
        aggs.append(F.sum(a * (1 - lab)).cast("bigint").alias(f"__au_{f}"))
    counts = pairs.agg(*aggs)
    stacked = counts.selectExpr(
        "n_match",
        "n_unmatch",
        "stack({}, {}) AS (field, agree_m, agree_u)".format(
            len(field_cols),
            ", ".join(f"'{f}', __am_{f}, __au_{f}" for f in field_cols),
        ),
    )
    a_ = float(alpha)
    m = (F.col("agree_m").cast("double") + F.lit(a_)) / (
        F.col("n_match").cast("double") + F.lit(2.0 * a_)
    )
    u = (F.col("agree_u").cast("double") + F.lit(a_)) / (
        F.col("n_unmatch").cast("double") + F.lit(2.0 * a_)
    )
    return stacked.select(
        "field",
        "n_match",
        "n_unmatch",
        F.round(m, 6).alias("m"),
        F.round(u, 6).alias("u"),
        F.round(F.log(m) - F.log(u), 6).alias("w_agree"),
        F.round(F.log(F.lit(1.0) - m) - F.log(F.lit(1.0) - u), 6).alias("w_disagree"),
    ).orderBy("field")


def fs_weights_sql(
    pairs_sql: str, label_sql: str, fields: list[tuple[str, str]], alpha: float = 1.0
) -> str:
    """DuckDB twin of :func:`fs_weights`.  ``pairs_sql`` is a query
    producing the labeled pair rows; ``fields`` is [(name, agree_sql)]
    evaluated against it; same smoothing, same fixed-order expressions."""
    a_ = f"CAST({float(alpha)!r} AS DOUBLE)"
    two_a = f"CAST({2.0 * float(alpha)!r} AS DOUBLE)"
    field_rows = "\n        UNION ALL\n        ".join(
        f"SELECT '{name}' AS field,"
        f" CAST(SUM(CAST(({agree}) AS INT) * CAST(({label_sql}) AS INT)) AS BIGINT) AS agree_m,"
        f" CAST(SUM(CAST(({agree}) AS INT) * (1 - CAST(({label_sql}) AS INT))) AS BIGINT) AS agree_u"
        f" FROM pairs"
        for name, agree in fields
    )
    return f"""
    WITH pairs AS ({pairs_sql}),
    tot AS (SELECT CAST(SUM(CAST(({label_sql}) AS INT)) AS BIGINT) AS n_match,
                   CAST(COUNT(*) - SUM(CAST(({label_sql}) AS INT)) AS BIGINT) AS n_unmatch
            FROM pairs),
    fl AS (
        {field_rows}
    )
    SELECT field, n_match, n_unmatch,
           round((CAST(agree_m AS DOUBLE) + {a_}) / (CAST(n_match AS DOUBLE) + {two_a}), 6) AS m,
           round((CAST(agree_u AS DOUBLE) + {a_}) / (CAST(n_unmatch AS DOUBLE) + {two_a}), 6) AS u,
           round(ln((CAST(agree_m AS DOUBLE) + {a_}) / (CAST(n_match AS DOUBLE) + {two_a}))
                 - ln((CAST(agree_u AS DOUBLE) + {a_}) / (CAST(n_unmatch AS DOUBLE) + {two_a})), 6) AS w_agree,
           round(ln(1.0 - (CAST(agree_m AS DOUBLE) + {a_}) / (CAST(n_match AS DOUBLE) + {two_a}))
                 - ln(1.0 - (CAST(agree_u AS DOUBLE) + {a_}) / (CAST(n_unmatch AS DOUBLE) + {two_a})), 6) AS w_disagree
    FROM fl CROSS JOIN tot
    ORDER BY field
    """
