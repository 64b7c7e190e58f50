"""Model-evaluation metrics computed EXACTLY from integer sufficient
statistics — the family beside the decile lift/gains table
(plans/relational2.py::features_lift_table): ROC AUC per group, the
standard threshold-free ranking metric an ML-platform consumer of this
engine scores candidate features / model outputs with.

Exactness discipline: tie-aware AUC is the Mann-Whitney U statistic —
AUC = (n_concordant + ties/2) / (n_pos · n_neg) — and every term is an
exact integer until ONE final division: the 2×-scaled numerator
2·Σ_s pos_s·cum_neg_before(s) + Σ_s pos_s·neg_s accumulates in
DECIMAL(38,0) (pos·neg products up to ~1e24 at 100 TB-scale group
sizes), the divisor is 2·n_pos·n_neg, and the quotient rounds to 6 — so
the DuckDB twin hash-matches bit-for-bit.

Scale shape: the stream first collapses to DISTINCT (group, score)
sufficient-statistic rows (one partial+final aggregate — the only
corpus-wide exchange); the negative-count prefix sum over those rows
runs TWO-LEVEL (exact integer range buckets + within-bucket window +
a ≤RANK_BUCKETS-row offset window per group, the segments.py::
_global_rank discipline) — never a single-reducer-per-group sort of the
distinct-score table.  The oracle uses the definitional per-group
window, proving the two-level decomposition exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: range-bucket fan-out for the two-level prefix (same constant class as
#: segments.RANK_BUCKETS; the offset table is n_groups × buckets rows)
AUC_BUCKETS = 32


def roc_auc(
    df: DataFrame, group_col: str, label: Column, score: Column
) -> DataFrame:
    """Tie-aware ROC AUC per ``group_col``: (grp, n_pos, n_neg, auc).

    ``label`` is a boolean column expression (positive class), ``score``
    an INTEGER-valued ranking column expression (money in cents, counts,
    micro-units — the module's exactness contract; callers with float
    scores scale them to integers first).  A group with no positives or
    no negatives has undefined AUC and reports NULL.

    Bucket arithmetic note: scores feed ``(s - lo) * AUC_BUCKETS`` — safe
    while |score span| < 2^58; a group whose span exceeds that raises at
    runtime (``raise_error`` in the bucket expression, checked in DOUBLE
    so a span that wraps bigint is still caught) instead of silently
    producing non-monotone buckets and a wrong AUC.  Scores wider than
    2^58 should be range-reduced first."""
    base = df.select(
        F.col(group_col).alias("grp"),
        score.cast("bigint").alias("s"),
        label.cast("int").alias("y"),
    )
    d = (
        base.groupBy("grp", "s")
        .agg(
            F.sum("y").cast("bigint").alias("pos"),
            (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("neg"),
        )
    )
    stats = d.groupBy("grp").agg(F.min("s").alias("__lo"), F.max("s").alias("__hi"))
    # localCheckpoint: the bucketed frame feeds BOTH the within-bucket
    # window and the bucket-size aggregate (the segments.py lesson)
    b = (
        d.join(F.broadcast(stats), "grp")
        .withColumn(
            "__b",
            F.expr(
                # span check in DOUBLE: a span past 2^63 WRAPS in bigint
                # arithmetic, so the guard itself must not use (s-lo)
                # >= with a 2^13-shaved bound: a span of EXACTLY 2^58
                # passes a strict '>' yet (s-lo)*32 = 2^63 wraps, and the
                # double subtraction (ulp <= 2^10 at these magnitudes) can
                # round slightly-larger spans DOWN past the check
                f"CASE WHEN CAST(__hi AS DOUBLE) - CAST(__lo AS DOUBLE)"
                f" >= {float((1 << 58) - (1 << 13))} THEN CAST(raise_error("
                "'roc_auc: score span exceeds 2^58 and would overflow the"
                " bucket arithmetic; range-reduce scores first') AS BIGINT)"
                f" ELSE ((s - __lo) * {AUC_BUCKETS}) div (__hi - __lo + 1) END"
            ),
        )
        .localCheckpoint()
    )
    wiv = (
        Window.partitionBy("grp", "__b")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sizes = b.groupBy("grp", "__b").agg(F.sum("neg").alias("__bn"))
    wo = (
        Window.partitionBy("grp")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offs = sizes.select(
        "grp", "__b", (F.sum("__bn").over(wo) - F.col("__bn")).alias("__off")
    )
    scored = (
        b.withColumn("__within", F.sum("neg").over(wiv) - F.col("neg"))
        .join(F.broadcast(offs), ["grp", "__b"])
        .select(
            "grp",
            "pos",
            "neg",
            (F.col("__off") + F.col("__within")).alias("cnb"),
        )
    )
    num2 = F.sum(
        F.col("pos").cast("decimal(19,0)")
        * (F.lit(2) * F.col("cnb") + F.col("neg")).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    agg = scored.groupBy("grp").agg(
        num2.alias("__num2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
    )
    auc = F.round(
        F.col("__num2").cast("double")
        / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double") * F.lit(2.0)),
        6,
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc).alias("auc"),
    )


def roc_auc_sql(table: str, group_col: str, label_sql: str, score_sql: str) -> str:
    """DuckDB twin of :func:`roc_auc` — the DEFINITIONAL per-group window
    prefix over distinct scores (the gate proves the two-level Spark
    decomposition); identical integer numerator and one rounded
    division."""
    return f"""
    WITH base AS (SELECT {group_col} AS grp,
                         CAST({score_sql} AS BIGINT) AS s,
                         CAST({label_sql} AS INT) AS y
                  FROM {table}),
    d AS (SELECT grp, s,
                 CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
          FROM base GROUP BY 1, 2),
    c AS (SELECT grp, pos, neg,
                 COALESCE(CAST(SUM(neg) OVER (PARTITION BY grp ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                      0) AS cnb
          FROM d)
    SELECT grp AS {group_col},
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
             round(CAST(CAST(SUM(CAST(pos AS DECIMAL(19,0))
                                 * CAST(2 * cnb + neg AS DECIMAL(19,0)))
                             AS DECIMAL(38,0)) AS DOUBLE)
                   / (CAST(SUM(pos) AS DOUBLE) * CAST(SUM(neg) AS DOUBLE) * 2.0), 6)
           END AS auc
    FROM c GROUP BY 1
    """


def conformal_intervals(
    df: DataFrame,
    group_col: str,
    id_col: str,
    y: Column,
    alpha_bps: int = 1000,
    seed: str = "conformal-v1",
) -> DataFrame:
    """Split-conformal prediction intervals per group (Vovk et al.;
    Papadopoulos et al. ECML 2002; Lei et al. JASA 2018) — the
    distribution-free uncertainty gate beside the point metrics
    (roc_auc / lift / calibration): does "the interval covers with
    probability >= 1-α" actually hold on held-out data?

    Rows split calibration/test by md5(seed:id) parity (the engine's
    deterministic-split contract — membership never changes as data
    grows); the point predictor is the per-group CALIBRATION mean, the
    nonconformity score |y - mean|, and q̂ the k-th smallest calibration
    score with k = ⌈(n_cal+1)·(1-α)⌉ — computed in pure INTEGER basis
    points ( ((n+1)·(10000-α_bps) + 9999) div 10000 ), because
    ceil((n+1)*0.9) in floats straddles engines at exact multiples.

    Exactness: ``y`` must be integer-valued (cents/micro-units).  All
    nonconformity comparisons run n_cal-SCALED — |y·n_cal - sum_cal| —
    so means never materialize as floats; y·n_cal must fit bigint
    (|y| < 2^63 / n_cal, documented like roc_auc's span bound).  The two
    output floats (qhat in y units, empirical coverage) are single
    rounded divisions.

    Scale: one partial+final agg per split; q̂ selection runs over the
    DISTINCT (group, score) table (the roc_auc discipline — the window
    prefix sees one row per distinct score, never a per-row sort of the
    calibration split).  A group whose k exceeds n_cal (calibration too
    small for the requested α) reports NULL qhat/coverage — surfaced,
    never silently clamped."""
    from pyspark.sql import Window

    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).cast("string").alias("id"),
        y.cast("bigint").alias("y"),
    ).withColumn(
        "is_cal",
        md5_long(F.concat(F.lit(f"{seed}:"), F.col("id"))) % 10000 < 5000,
    )
    cal_stats = (
        base.filter("is_cal")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cal"),
            F.sum("y").cast("bigint").alias("sum_cal"),
        )
        .localCheckpoint()  # per-group stats: broadcast twice-consumed leaf
    )
    scored = base.join(F.broadcast(cal_stats), "grp").withColumn(
        "r", F.abs(F.col("y") * F.col("n_cal") - F.col("sum_cal"))
    )
    k = F.expr(f"((n_cal + 1) * (10000 - {int(alpha_bps)}) + 9999) div 10000")
    dist = (
        scored.filter("is_cal")
        .groupBy("grp", "n_cal", "r")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wp = Window.partitionBy("grp").orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    qhat = (
        dist.withColumn("cum", F.sum("c").over(wp))
        .withColumn("__k", k)
        .filter(F.col("cum") >= F.col("__k"))
        .groupBy("grp")
        .agg(F.min("r").alias("q_scaled"))
        .localCheckpoint()  # per-group quantile row, broadcast into the test scan
    )
    test = (
        scored.filter(~F.col("is_cal"))
        .join(F.broadcast(qhat), "grp", "left")
        .groupBy("grp", "n_cal")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.max("q_scaled").alias("q_scaled"),  # constant per grp (NULL if k > n_cal)
            F.sum(
                F.when(
                    F.col("q_scaled").isNotNull(),
                    (F.col("r") <= F.col("q_scaled")).cast("int"),
                )
            ).cast("bigint").alias("covered"),
        )
    )
    return test.select(
        F.col("grp").alias(group_col),
        "n_cal",
        "n_test",
        F.round(
            F.col("q_scaled").cast("double") / F.col("n_cal").cast("double"), 6
        ).alias("qhat"),
        F.round(
            F.col("covered").cast("double") / F.col("n_test").cast("double"), 6
        ).alias("coverage"),
    )

def conformal_intervals_sql(
    table: str,
    group_col: str,
    id_col: str,
    y_sql: str,
    alpha_bps: int = 1000,
    seed: str = "conformal-v1",
) -> str:
    """DuckDB twin of :func:`conformal_intervals` — identical md5 split,
    integer-bps k, scaled nonconformity, and final divisions."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long_sql

    bucket = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH base AS (
        SELECT {group_col} AS grp,
               CAST({y_sql} AS BIGINT) AS y,
               ({bucket}) % 10000 < 5000 AS is_cal
        FROM {table}),
    cal AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_cal,
               CAST(SUM(y) AS BIGINT) AS sum_cal
        FROM base WHERE is_cal GROUP BY grp),
    scored AS (
        SELECT b.grp, b.is_cal, c.n_cal,
               abs(b.y * c.n_cal - c.sum_cal) AS r
        FROM base b JOIN cal c ON c.grp = b.grp),
    dist AS (
        SELECT grp, n_cal, r, COUNT(*) AS c
        FROM scored WHERE is_cal GROUP BY 1, 2, 3),
    qh AS (
        SELECT grp, MIN(r) AS q_scaled
        FROM (SELECT grp, r,
                     SUM(c) OVER (PARTITION BY grp ORDER BY r
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     ((n_cal + 1) * (10000 - {int(alpha_bps)}) + 9999) // 10000 AS k
              FROM dist)
        WHERE cum >= k GROUP BY grp),
    test AS (
        SELECT s.grp, s.n_cal,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               MAX(q.q_scaled) AS q_scaled,
               CAST(SUM(CASE WHEN q.q_scaled IS NOT NULL
                             THEN CASE WHEN s.r <= q.q_scaled THEN 1 ELSE 0 END
                        END) AS BIGINT) AS covered
        FROM scored s LEFT JOIN qh q ON q.grp = s.grp
        WHERE NOT s.is_cal GROUP BY 1, 2)
    SELECT grp AS {group_col}, n_cal, n_test,
           round(CAST(q_scaled AS DOUBLE) / CAST(n_cal AS DOUBLE), 6) AS qhat,
           round(CAST(covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage
    FROM test
    """


def jackknife_ratio(
    df: DataFrame, slice_col: str, num: Column, den: Column, z_crit: float = 1.96
) -> DataFrame:
    """Delete-one-GROUP jackknife standard error of a ratio-of-totals
    metric θ = Σnum / Σden (Quenouille 1956, Tukey 1958; the grouped
    form is the estimator production A/B systems use for ratio metrics,
    since leave-one-ROW-out is both intractable and wrong under
    within-group correlation).  One summary row: (n_slices, theta,
    se_jack, ci_lo, ci_hi).

    For each slice i, θ₍ᵢ₎ = (Σnum − numᵢ)/(Σden − denᵢ); the jackknife
    variance is (g−1)/g · Σ(θ₍ᵢ₎ − θ̄)².  Exactness discipline: slice
    totals are exact bigints; each θ₍ᵢ₎ is ONE IEEE division, floored to
    integer micro-units; the variance cross-product
    M = g·Σθᵤ² − (Σθᵤ)² accumulates in DECIMAL(38,0) — the cancellation
    Σ(θᵤ−θ̄ᵤ)² suffers when slices are near-equal (12+ digits here) is
    EXACT in decimal where a double-side M would have engine-divergent
    noise — and only the final sqrt/scale/round touch floats, in
    identical expression order on both engines.

    A slice holding the ENTIRE denominator (θ₍ᵢ₎ undefined) raises
    loudly rather than skewing the variance.  Scale: one partial-agg
    groupBy to g slice rows, then driver-sized arithmetic — the corpus
    is touched once."""
    per = df.groupBy(F.col(slice_col).alias("__s")).agg(
        F.sum(num).cast("bigint").alias("r_i"),
        F.sum(den).cast("bigint").alias("c_i"),
    )
    tot = per.agg(
        F.sum("r_i").cast("bigint").alias("R"),
        F.sum("c_i").cast("bigint").alias("C"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    th = (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "theta_u",
            F.when(
                F.col("C") > F.col("c_i"),
                F.expr(
                    "CAST(floor(CAST(R - r_i AS DOUBLE) / CAST(C - c_i AS DOUBLE)"
                    " * 1000000.0) AS BIGINT)"
                ),
            ).otherwise(
                F.expr(
                    "CAST(raise_error('jackknife_ratio: a single slice holds the"
                    " entire denominator; theta_(i) is undefined') AS BIGINT)"
                )
            ),
        )
    )
    agg = th.groupBy("R", "C", "g").agg(
        F.sum(F.col("theta_u").cast("decimal(19,0)")).cast("decimal(38,0)").alias("st"),
        F.sum(
            F.col("theta_u").cast("decimal(19,0)") * F.col("theta_u").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("st2"),
    )
    m = (
        F.col("g").cast("decimal(19,0)") * F.col("st2") - F.col("st") * F.col("st")
    ).cast("decimal(38,0)")
    se = F.round(
        F.sqrt(
            (F.col("g") - 1).cast("double")
            * m.cast("double")
            / (F.col("g") * F.col("g")).cast("double")
        )
        / F.lit(1000000.0),
        6,
    )
    theta = F.round(F.col("R").cast("double") / F.col("C").cast("double"), 6)
    return agg.select(
        F.col("g").alias("n_slices"),
        theta.alias("theta"),
        se.alias("se_jack"),
        F.round(theta - F.lit(float(z_crit)) * se, 6).alias("ci_lo"),
        F.round(theta + F.lit(float(z_crit)) * se, 6).alias("ci_hi"),
    )


def jackknife_ratio_sql(
    rows_sql: str, slice_col: str, num_sql: str, den_sql: str, z_crit: float = 1.96
) -> str:
    """DuckDB twin of :func:`jackknife_ratio` — identical micro-unit
    floors, DECIMAL(38,0) cross-product, and final float order."""
    return f"""
    WITH rows_in AS ({rows_sql}),
    per AS (
        SELECT {slice_col} AS s,
               CAST(SUM({num_sql}) AS BIGINT) AS r_i,
               CAST(SUM({den_sql}) AS BIGINT) AS c_i
        FROM rows_in GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(r_i) AS BIGINT) AS R, CAST(SUM(c_i) AS BIGINT) AS C,
               CAST(COUNT(*) AS BIGINT) AS g
        FROM per),
    th AS (
        SELECT t.R, t.C, t.g,
               CASE WHEN t.C > p.c_i THEN
                 CAST(floor(CAST(t.R - p.r_i AS DOUBLE) / CAST(t.C - p.c_i AS DOUBLE)
                            * 1000000.0) AS BIGINT)
               ELSE CAST(error('jackknife_ratio: a single slice holds the entire'
                               ' denominator; theta_(i) is undefined') AS BIGINT)
               END AS theta_u
        FROM per p CROSS JOIN tot t),
    agg AS (
        SELECT R, C, g,
               CAST(SUM(CAST(theta_u AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS st,
               CAST(SUM(CAST(theta_u AS DECIMAL(19,0))
                        * CAST(theta_u AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS st2
        FROM th GROUP BY 1, 2, 3)
    SELECT g AS n_slices,
           round(CAST(R AS DOUBLE) / CAST(C AS DOUBLE), 6) AS theta,
           round(sqrt(CAST(g - 1 AS DOUBLE)
                      * CAST(CAST(CAST(g AS DECIMAL(19,0)) * st2 - st * st
                                  AS DECIMAL(38,0)) AS DOUBLE)
                      / CAST(g * g AS DOUBLE)) / 1000000.0, 6) AS se_jack,
           round(round(CAST(R AS DOUBLE) / CAST(C AS DOUBLE), 6)
                 - {float(z_crit)} * round(sqrt(CAST(g - 1 AS DOUBLE)
                      * CAST(CAST(CAST(g AS DECIMAL(19,0)) * st2 - st * st
                                  AS DECIMAL(38,0)) AS DOUBLE)
                      / CAST(g * g AS DOUBLE)) / 1000000.0, 6), 6) AS ci_lo,
           round(round(CAST(R AS DOUBLE) / CAST(C AS DOUBLE), 6)
                 + {float(z_crit)} * round(sqrt(CAST(g - 1 AS DOUBLE)
                      * CAST(CAST(CAST(g AS DECIMAL(19,0)) * st2 - st * st
                                  AS DECIMAL(38,0)) AS DOUBLE)
                      / CAST(g * g AS DOUBLE)) / 1000000.0, 6), 6) AS ci_hi
    FROM agg
    """


#: Abramowitz & Stegun 26.2.17 (Zelen & Severo) normal survival-function
#: coefficients — |error| < 7.5e-8, far inside the round-6 output grid.
#: One python tuple feeds BOTH engines, so the polynomial is literal-
#: identical (same doubles, same op order) and no engine evaluates erf.
_AS_T = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_SQRT_2PI = 2.5066282746310002


def _normal_sf_formula(z: str) -> str:
    """SQL-syntax expression for P(Z > z), z >= 0 — shared verbatim by
    Spark (expr) and DuckDB (both accept this exact string)."""
    k = f"(1.0 / (1.0 + {_AS_T} * ({z})))"
    poly = ""
    for b in reversed(_AS_B):
        poly = f"({b} + {poly} * {k})" if poly else f"({b})"
    return (
        f"(exp(-(({z}) * ({z})) / 2.0) / {_SQRT_2PI})"
        f" * ({poly} * {k})"
    )


def two_sided_p_expr(z_sql: str) -> str:
    """SQL-syntax expression (valid in Spark ``F.expr`` AND DuckDB) for
    the two-sided p-value 2·P(Z > |z|)."""
    return f"CASE WHEN ({z_sql}) IS NULL THEN NULL ELSE 2.0 * {_normal_sf_formula(f'abs(CAST(({z_sql}) AS DOUBLE))')} END"


def bh_fdr(
    results: DataFrame, key_cols: list[str], p_col: str, alpha_bps: int = 500
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a battery of test
    results (Benjamini & Hochberg, JRSS-B 1995) — the multiple-testing
    gate the trend/AB/drift families need before anyone acts on "m tests,
    k of them significant": at α with m hypotheses, ~α·m raw-threshold
    tests reject by luck alone.

    Input: one row per hypothesis with a two-sided p-value in ``p_col``
    (NULL p = undefined test, EXCLUDED from m and reported unrejected).
    Returns keys + (p, rank, m, rejected): rank is the ascending-p order
    (ties broken by the key columns), and rejected marks ranks ≤ the
    largest k with p₍ₖ₎ ≤ k·α/m — compared as p·m·10⁴ ≤ k·α_bps with m
    and α exact integers, so the only float in the decision is p itself
    (identical on both engines by construction of the upstream test).

    Scale: the input is a RESULTS table — one row per hypothesis, bounded
    by the grouping contract, so the single rank window is over m rows,
    never the corpus."""
    from pyspark.sql import Window

    keys = [F.col(k) for k in key_cols]
    valid = results.filter(F.col(p_col).isNotNull())
    m = valid.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    w = Window.orderBy(F.col(p_col).asc(), *keys)
    ranked = (
        valid.crossJoin(F.broadcast(m))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "__pass",
            F.col(p_col) * F.col("m").cast("double") * F.lit(10000.0)
            <= F.col("rank").cast("double") * F.lit(float(alpha_bps)),
        )
        .localCheckpoint()  # feeds the kmax aggregate AND the final select
    )
    kmax = ranked.agg(
        F.coalesce(F.max(F.when(F.col("__pass"), F.col("rank"))), F.lit(0)).alias("__kmax")
    )
    out = ranked.crossJoin(F.broadcast(kmax)).select(
        *key_cols,
        F.round(F.col(p_col), 6).alias("p"),
        "rank",
        "m",
        (F.col("rank") <= F.col("__kmax")).alias("rejected"),
    )
    nulls = results.filter(F.col(p_col).isNull()).select(
        *key_cols,
        F.lit(None).cast("double").alias("p"),
        F.lit(None).cast("bigint").alias("rank"),
        F.lit(None).cast("bigint").alias("m"),
        F.lit(False).alias("rejected"),
    )
    return out.unionByName(nulls)


def bh_fdr_sql(
    results_sql: str, key_cols: list[str], p_sql: str, alpha_bps: int = 500
) -> str:
    """DuckDB twin of :func:`bh_fdr` — identical rank order, integer-
    scaled threshold compare, and NULL-p handling."""
    keys = ", ".join(key_cols)
    return f"""
    WITH results AS ({results_sql}),
    valid AS (SELECT *, ({p_sql}) AS __p FROM results WHERE ({p_sql}) IS NOT NULL),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM valid),
    ranked AS (
        SELECT v.*, mm.m,
               CAST(ROW_NUMBER() OVER (ORDER BY v.__p ASC, {keys}) AS BIGINT) AS rank
        FROM valid v CROSS JOIN mm),
    km AS (
        SELECT COALESCE(MAX(CASE WHEN __p * CAST(m AS DOUBLE) * 10000.0
                                      <= CAST(rank AS DOUBLE) * {float(alpha_bps)}
                                 THEN rank END), 0) AS kmax
        FROM ranked)
    SELECT {keys}, round(__p, 6) AS p, rank, m, rank <= km.kmax AS rejected
    FROM ranked CROSS JOIN km
    UNION ALL
    SELECT {keys}, CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE
    FROM results WHERE ({p_sql}) IS NULL
    """


def qini_deciles(
    df: DataFrame, id_col: str, treat: Column, outcome: Column, score: Column
) -> DataFrame:
    """Decile Qini table for uplift evaluation (Radcliffe, Direct
    Marketing Analytics J. 2007) — the causal counterpart of the lift
    table: rank units by the uplift model's score (descending), cut into
    10 deciles with the exact two-level global rank, and report per
    decile both the within-decile uplift and the CUMULATIVE Qini value
    q(d) = cumConvT − cumConvC · cumNT / cumNC — how many extra
    conversions targeting the top d deciles buys over not treating.

    Inputs are integer-valued columns: treat ∈ {0,1}, outcome ∈ {0,1},
    score integer (the roc_auc exactness contract — float scores scale
    to micro-units first).  Returns (decile, n_t, n_c, conv_t, conv_c,
    uplift, qini): uplift/qini are single rounded float expressions over
    exact bigint sums; a decile with an empty treatment or control arm
    reports NULL uplift, and NULL qini while the cumulative control arm
    is empty — surfaced, never 0 disguised as "no effect".

    Scale: the rank is segments._global_rank (range buckets + within-
    bucket windows — no single-partition sort of the unit table); the
    decile aggregate is one partial+final groupBy; the cumulative
    window runs over 10 rows."""
    from pyspark.sql import Window

    from datapipeline_omnichanneltobigquery_spark.operators.segments import _global_rank

    base = df.select(
        F.col(id_col).alias("id"),
        treat.cast("int").alias("t"),
        outcome.cast("int").alias("o"),
        # NULL score would silently vanish from Spark's bucketed rank while
        # the definitional oracle ranks it NULLS LAST — raise instead
        F.when(
            score.isNull(),
            F.expr(
                "CAST(raise_error('qini_deciles: NULL score — impute or filter"
                " before ranking; a NULL would silently drop from the deciles')"
                " AS BIGINT)"
            ),
        )
        .otherwise(-score.cast("bigint"))
        .alias("negs"),  # ascending rank of -score = score desc
    ).localCheckpoint()  # feeds the count, the rank stats agg, and the bucketing
    n = base.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    ranked = _global_rank(base, "id", "negs", "rk").crossJoin(F.broadcast(n))
    dec = (
        ranked.withColumn("decile", F.expr("((rk - 1) * 10) div __n").cast("int"))
        .groupBy("decile")
        .agg(
            F.sum("t").cast("bigint").alias("n_t"),
            F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("n_c"),
            F.sum(F.col("t") * F.col("o")).cast("bigint").alias("conv_t"),
            F.sum((F.lit(1) - F.col("t")) * F.col("o")).cast("bigint").alias("conv_c"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        dec.withColumn("ct", F.sum("conv_t").over(w))
        .withColumn("cc", F.sum("conv_c").over(w))
        .withColumn("nt", F.sum("n_t").over(w))
        .withColumn("nc", F.sum("n_c").over(w))
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            F.round(
                F.col("conv_t").cast("double") / F.col("n_t").cast("double")
                - F.col("conv_c").cast("double") / F.col("n_c").cast("double"),
                6,
            ),
        ).alias("uplift"),
        F.when(
            F.col("nc") > 0,
            F.round(
                F.col("ct").cast("double")
                - F.col("cc").cast("double") * F.col("nt").cast("double")
                / F.col("nc").cast("double"),
                6,
            ),
        ).alias("qini"),
    )


def qini_deciles_sql(
    units_sql: str, id_col: str, treat_sql: str, outcome_sql: str, score_sql: str
) -> str:
    """DuckDB twin of :func:`qini_deciles` — the DEFINITIONAL global
    row_number (the gate proves the two-level Spark rank), identical
    decile cut, cumulative sums, and float expression order."""
    return f"""
    WITH base AS (
        SELECT {id_col} AS id,
               CAST({treat_sql} AS INT) AS t,
               CAST({outcome_sql} AS INT) AS o,
               -CAST({score_sql} AS BIGINT) AS negs
        FROM ({units_sql})),
    ranked AS (
        SELECT t, o,
               ROW_NUMBER() OVER (ORDER BY negs, id) AS rk,
               COUNT(*) OVER () AS n
        FROM base),
    dec AS (
        SELECT CAST(((rk - 1) * 10) // n AS INT) AS decile,
               CAST(SUM(t) AS BIGINT) AS n_t,
               CAST(SUM(1 - t) AS BIGINT) AS n_c,
               CAST(SUM(t * o) AS BIGINT) AS conv_t,
               CAST(SUM((1 - t) * o) AS BIGINT) AS conv_c
        FROM ranked GROUP BY 1),
    cum AS (
        SELECT *,
               SUM(conv_t) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
               SUM(conv_c) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(n_t) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt,
               SUM(n_c) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nc
        FROM dec)
    SELECT decile, n_t, n_c, conv_t, conv_c,
           CASE WHEN n_t > 0 AND n_c > 0 THEN
             round(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                   - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
           END AS uplift,
           CASE WHEN nc > 0 THEN
             round(CAST(ct AS DOUBLE)
                   - CAST(cc AS DOUBLE) * CAST(nt AS DOUBLE)
                     / CAST(nc AS DOUBLE), 6)
           END AS qini
    FROM cum
    """


#: cumulative Poisson(1) CDF thresholds in micro-units — one python
#: derivation feeds both engines (floor(cum·1e6 + 0.5)); a row's bootstrap
#: weight is the count of thresholds BELOW its md5-uniform micro draw,
#: capped at len(thresholds) (P(K > 8) ≈ 1e-6 — inside the round-6 grid)
_POISSON1_CUM_MICRO = (
    367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990, 999999
)


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    y: Column,
    n_reps: int = 200,
    alpha_bps: int = 500,
    seed: str = "boot-v1",
) -> DataFrame:
    """Poisson-bootstrap percentile CI for a group mean (Efron 1979;
    the Poisson(1)-weight streaming form of Chamandy et al., Google
    2012 — the resampling face of the UQ trio: [[stats_jackknife_ratio]]
    does ratio metrics analytically, [[stats_quantile_ci]] does
    quantiles by order statistics, the bootstrap handles ANY smooth
    statistic).  Returns (group, n, n_reps, mean_hat, ci_lo, ci_hi).

    Determinism: each (row, replicate) weight is the count of
    compile-time integer thresholds below md5(seed:b:id)%10⁶ — exact
    Poisson(1) inverse-CDF in pure integer compares; replicate sums are
    exact bigints; each replicate mean is ONE IEEE division; the
    percentile cut selects order statistics of the replicate means
    (integer-bps ranks, clamped to [1, B]).  A replicate whose weights
    all drew 0 (P ≈ e^{-n}, real only for tiny groups) has no mean; the
    rank math counts only MATERIALIZED means and the effective count is
    surfaced as ``n_reps``.

    Scale: the corpus fans out ×n_reps via ONE exploded literal range
    (one md5 per fanned row, map-side), collapses in ONE partial-agg
    groupBy to (group × n_reps) rows; the percentile window sorts
    n_reps rows per group.  ``y`` must be integer-valued; |y|·max_w·n
    must fit bigint (w ≤ 9)."""
    from pyspark.sql import Window

    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long

    reps = F.explode(F.sequence(F.lit(0), F.lit(int(n_reps) - 1))).alias("b")
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).cast("string").alias("id"),
        y.cast("bigint").alias("y"),
    )
    draws = base.select("__g", "id", "y", reps).withColumn(
        "u",
        md5_long(
            F.concat(F.lit(f"{seed}:"), F.col("b").cast("string"), F.lit(":"), F.col("id"))
        )
        % 1_000_000,
    )
    wexpr = sum(
        (F.col("u") >= F.lit(t)).cast("int") for t in _POISSON1_CUM_MICRO
    )
    rep_means = (
        draws.withColumn("w", wexpr)
        .groupBy("__g", "b")
        .agg(
            F.sum(F.col("w") * F.col("y")).cast("bigint").alias("swy"),
            F.sum("w").cast("bigint").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "__g",
            "b",
            (F.col("swy").cast("double") / F.col("sw").cast("double")).alias("m"),
        )
        .localCheckpoint()  # (group x B) rows; feeds beff, the window, and the cut
    )
    stats = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    ).localCheckpoint()  # per-group totals: broadcast rides a bounded leaf
    beff = rep_means.groupBy("__g").agg(F.count(F.lit(1)).cast("bigint").alias("beff"))
    # Pre-floor alpha/2 in python so BOTH engines evaluate the literal
    # ((beff+1) * floor(alpha/2)) // 10000 — Spark's left-assoc
    # ((beff+1)*alpha div 2) div 10000 diverges from the DuckDB twin for odd
    # alpha_bps (e.g. alpha=101, beff=397: 2 vs 1).
    a2h = int(alpha_bps) // 2
    lo_rank = F.expr(f"GREATEST(1, ((beff + 1) * {a2h}) div 10000)")
    hi_rank = F.expr(f"LEAST(beff, ((beff + 1) * (10000 - {a2h}) + 9999) div 10000)")
    w = Window.partitionBy("__g").orderBy("m", "b")
    ranked = (
        rep_means.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(beff), "__g")
        .withColumn("__lo", lo_rank)
        .withColumn("__hi", hi_rank)
    )
    ci = ranked.groupBy("__g", "beff").agg(
        F.min(F.when(F.col("rk") == F.col("__lo"), F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rk") == F.col("__hi"), F.col("m"))).alias("ci_hi"),
    )
    return (
        ci.join(F.broadcast(stats), "__g")
        .select(
            F.col("__g").alias(group_col),
            "n",
            F.col("beff").alias("n_reps"),
            F.round(F.col("sy").cast("double") / F.col("n").cast("double"), 6).alias(
                "mean_hat"
            ),
            F.round(F.col("ci_lo"), 6).alias("ci_lo"),
            F.round(F.col("ci_hi"), 6).alias("ci_hi"),
        )
    )


def bootstrap_mean_ci_sql(
    table: str,
    group_col: str,
    id_col: str,
    y_sql: str,
    n_reps: int = 200,
    alpha_bps: int = 500,
    seed: str = "boot-v1",
) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci` — identical threshold
    table, md5 draws, rank formulas, and selection."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long_sql

    u = md5_long_sql(
        f"'{seed}:' || CAST(b.range AS VARCHAR) || ':' || CAST({id_col} AS VARCHAR)"
    )
    wterms = " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in _POISSON1_CUM_MICRO
    )
    a2h = int(alpha_bps) // 2  # pre-floored alpha/2 — identical literal in Spark
    return f"""
    WITH draws AS (
        SELECT {group_col} AS g, b.range AS b,
               CAST({y_sql} AS BIGINT) AS y,
               ({u}) % 1000000 AS u
        FROM {table} CROSS JOIN range({int(n_reps)}) b),
    rep AS (
        SELECT g, b,
               CAST(SUM(({wterms}) * y) AS BIGINT) AS swy,
               CAST(SUM({wterms}) AS BIGINT) AS sw
        FROM draws GROUP BY 1, 2),
    means AS (
        SELECT g, b, CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) AS m
        FROM rep WHERE sw > 0),
    beff AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS beff FROM means GROUP BY g),
    ranked AS (
        SELECT m.g, m.m, e.beff,
               ROW_NUMBER() OVER (PARTITION BY m.g ORDER BY m.m, m.b) AS rk,
               GREATEST(1, ((e.beff + 1) * {a2h}) // 10000) AS lo,
               LEAST(e.beff,
                     ((e.beff + 1) * (10000 - {a2h}) + 9999) // 10000) AS hi
        FROM means m JOIN beff e ON e.g = m.g),
    ci AS (
        SELECT g, beff,
               MIN(CASE WHEN rk = lo THEN m END) AS ci_lo,
               MIN(CASE WHEN rk = hi THEN m END) AS ci_hi
        FROM ranked GROUP BY 1, 2),
    stats AS (
        SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST({y_sql} AS BIGINT)) AS BIGINT) AS sy
        FROM {table} GROUP BY 1)
    SELECT c.g AS {group_col}, s.n, c.beff AS n_reps,
           round(CAST(s.sy AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS mean_hat,
           round(c.ci_lo, 6) AS ci_lo,
           round(c.ci_hi, 6) AS ci_hi
    FROM ci c JOIN stats s ON s.g = c.g
    """


def target_encoding(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    target_col,
    m: int = 20,
) -> DataFrame:
    """Leave-one-out target encoding with m-estimate smoothing
    (Micci-Barreca, SIGKDD Explorations 2001) — the standard
    high-cardinality categorical feature for downstream models: each
    row's category is replaced by the target mean of the OTHER rows in
    the category, shrunk toward the global prior by pseudo-count ``m``
    (LOO prevents the row's own label leaking into its feature; the
    shrinkage keeps rare categories from memorizing).

        te = ((sum_cat − y) + m·prior) / (n_cat − 1 + m)
           = ((sum_cat − y)·N + m·S) / ((n_cat − 1 + m)·N)

    with S, N the global target sum/count — the second form is ONE
    exact-bigint ratio (prior never materializes as a float), rounded
    once to 6.  NULL when the denominator is 0 (singleton category with
    m = 0), surfaced not defaulted.

    Returns (id, cat, te).  Plan: one partial-aggregated groupBy on the
    category + one scalar aggregate (1-row crossJoin broadcast) + one
    map-side join back — linear, no windows, the 100 TB shape.
    ``target_col`` is a 0/1-integer Column expression."""
    if m < 0:
        raise ValueError(f"m must be >= 0, got {m}")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cat_col).alias("cat"),
        target_col.cast("bigint").alias("y"),
    ).localCheckpoint()  # feeds the category agg, the global agg, and the join
    per_cat = base.groupBy("cat").agg(
        F.sum("y").cast("bigint").alias("sum_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
    )
    tot = base.agg(
        F.sum("y").cast("bigint").alias("S"),
        F.count(F.lit(1)).cast("bigint").alias("N"),
    )
    # products in DECIMAL(38,0) (the roc_auc discipline): (n_c-1+m)*N and
    # (sum_c-y)*N exceed int64 once N passes ~3e9 — a 100 TB corpus —
    # where non-ANSI Spark would silently wrap to a negative denominator
    # while DuckDB raises (engine-divergent AND wrong)
    d38 = "decimal(38,0)"
    num = (
        (F.col("sum_c") - F.col("y")).cast(d38) * F.col("N").cast(d38)
        + F.lit(int(m)).cast(d38) * F.col("S").cast(d38)
    )
    den = (F.col("n_c") - 1 + F.lit(int(m))).cast(d38) * F.col("N").cast(d38)
    return (
        base.join(per_cat, "cat")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("id").alias(id_col),
            F.col("cat").alias(cat_col),
            F.when(
                den > F.lit(0).cast(d38),
                F.round(num.cast("double") / den.cast("double"), 6),
            ).alias("te"),
        )
    )


def target_encoding_sql(
    table: str, id_col: str, cat_col: str, target_sql: str, m: int = 20
) -> str:
    """DuckDB twin of :func:`target_encoding` — identical exact-bigint
    ratio and single rounding."""
    if m < 0:
        raise ValueError(f"m must be >= 0, got {m}")
    return f"""
    WITH base AS (
        SELECT {id_col} AS id, {cat_col} AS cat,
               CAST({target_sql} AS BIGINT) AS y
        FROM {table}),
    per_cat AS (
        SELECT cat, CAST(SUM(y) AS BIGINT) AS sum_c,
               CAST(COUNT(*) AS BIGINT) AS n_c
        FROM base GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM base)
    SELECT b.id AS {id_col}, b.cat AS {cat_col},
           CASE WHEN CAST(p.n_c - 1 + {int(m)} AS DECIMAL(38,0))
                     * CAST(t.n AS DECIMAL(38,0)) > 0 THEN
             round(CAST(CAST(p.sum_c - b.y AS DECIMAL(38,0))
                          * CAST(t.n AS DECIMAL(38,0))
                        + CAST({int(m)} AS DECIMAL(38,0))
                          * CAST(t.s AS DECIMAL(38,0)) AS DOUBLE)
                   / CAST(CAST(p.n_c - 1 + {int(m)} AS DECIMAL(38,0))
                          * CAST(t.n AS DECIMAL(38,0)) AS DOUBLE), 6)
           END AS te
    FROM base b JOIN per_cat p ON p.cat = b.cat CROSS JOIN tot t
    """


def cohen_kappa(
    df: DataFrame,
    group_col: str,
    rater_a,
    rater_b,
) -> DataFrame:
    """Cohen's kappa per group (Cohen 1960) — chance-corrected agreement
    between two categorical raters: the measurement every LLM-judge /
    human-label pipeline needs before trusting either rater (raw
    agreement rewards majority-class collusion; kappa subtracts the
    agreement two independent raters with these marginals would reach
    by chance).

    Exactness: with integer counts, κ = (p_o − p_e)/(1 − p_e) collapses
    to ONE exact-bigint ratio

        κ = (n·Σ_k agree_k  −  Σ_k n_ak·n_bk) / (n²  −  Σ_k n_ak·n_bk)

    rounded once to 6; NULL when the denominator is 0 (both raters
    constant — chance agreement is already 1, κ undefined; surfaced,
    never defaulted to 0).

    NULL contract: a NULL rater label is COALESCED to the explicit
    sentinel category ``__NULL__`` on BOTH engines (rater abstention is
    a category, not a silent vote): without it a NULL-labeled row would
    count in n and n² yet never in n_agree or the marginal products
    (NULL equality fails in both engines) — guaranteed disagreement
    with zero chance-correction mass, silently shifting κ.  As a
    sentinel it agrees with the other rater's NULLs and carries its own
    marginal mass.  Callers with a genuine ``__NULL__`` label must
    rename it first.

    Returns (group, n, n_agree, kappa).  Plan: one pair-count aggregate
    on (group, a, b) — the contingency table, ≤ |labels|² rows per
    group — then marginal products fold group-side; the corpus crosses
    ONE exchange (the 100 TB shape).  ``rater_a`` / ``rater_b`` are
    string Column expressions."""
    base = df.select(
        F.col(group_col).alias("__g"),
        F.coalesce(rater_a.cast("string"), F.lit("__NULL__")).alias("a"),
        F.coalesce(rater_b.cast("string"), F.lit("__NULL__")).alias("b"),
    )
    cells = base.groupBy("__g", "a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # contingency cells feed n/agree AND both marginals
    tot = cells.groupBy("__g").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_agree"),
    )
    ma = cells.groupBy("__g", "a").agg(F.sum("c").cast("bigint").alias("n_a"))
    mb = cells.groupBy("__g", "b").agg(F.sum("c").cast("bigint").alias("n_b"))
    # products in DECIMAL(38,0): n², n·agree, and Σ n_ak·n_bk exceed
    # int64 once n passes ~3e9 — non-ANSI Spark would wrap silently
    # while DuckDB raises (the roc_auc discipline)
    d38 = "decimal(38,0)"
    pe = (
        ma.join(mb, (ma["__g"] == mb["__g"]) & (ma["a"] == mb["b"]))
        .select(ma["__g"], (F.col("n_a").cast(d38) * F.col("n_b").cast(d38)).alias("p"))
        .groupBy("__g")
        .agg(F.sum("p").cast(d38).alias("pe_num"))
    )
    zero = F.lit(0).cast(d38)
    pe_n = F.coalesce(F.col("pe_num"), zero)
    num = F.col("n").cast(d38) * F.col("n_agree").cast(d38) - pe_n
    den = F.col("n").cast(d38) * F.col("n").cast(d38) - pe_n
    return (
        tot.join(pe, "__g", "left")
        .select(
            F.col("__g").alias(group_col),
            "n",
            "n_agree",
            F.when(
                den > zero,
                F.round(num.cast("double") / den.cast("double"), 6),
            ).alias("kappa"),
        )
    )


def cohen_kappa_sql(
    table_sql: str, group_col: str, a_sql: str, b_sql: str
) -> str:
    """DuckDB twin of :func:`cohen_kappa` — identical contingency
    cells, marginal products, bigint ratio, and NULL contract."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS g,
               COALESCE(CAST({a_sql} AS VARCHAR), '__NULL__') AS a,
               COALESCE(CAST({b_sql} AS VARCHAR), '__NULL__') AS b
        FROM ({table_sql})),
    cells AS MATERIALIZED (
        SELECT g, a, b, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2, 3),
    tot AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
        FROM cells GROUP BY 1),
    ma AS (SELECT g, a, CAST(SUM(c) AS BIGINT) AS n_a FROM cells GROUP BY 1, 2),
    mb AS (SELECT g, b, CAST(SUM(c) AS BIGINT) AS n_b FROM cells GROUP BY 1, 2),
    pe AS (
        SELECT ma.g,
               CAST(SUM(CAST(ma.n_a AS DECIMAL(38,0))
                        * CAST(mb.n_b AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS pe_num
        FROM ma JOIN mb ON mb.g = ma.g AND mb.b = ma.a
        GROUP BY 1)
    SELECT t.g AS {group_col}, t.n, t.n_agree,
           CASE WHEN CAST(t.n AS DECIMAL(38,0)) * CAST(t.n AS DECIMAL(38,0))
                     - COALESCE(p.pe_num, 0) > 0 THEN
             round(CAST(CAST(t.n AS DECIMAL(38,0)) * CAST(t.n_agree AS DECIMAL(38,0))
                        - COALESCE(p.pe_num, 0) AS DOUBLE)
                   / CAST(CAST(t.n AS DECIMAL(38,0)) * CAST(t.n AS DECIMAL(38,0))
                          - COALESCE(p.pe_num, 0) AS DOUBLE), 6)
           END AS kappa
    FROM tot t LEFT JOIN pe p ON p.g = t.g
    """


#: shared z expression for the Mann-Whitney normal approximation —
#: ONE string evaluated verbatim by Spark expr AND DuckDB over the
#: identically-named columns (n1, n2, nn bigint; num2, n1n2, tt
#: DECIMAL(38,0)), so the float op order cannot diverge.
_MW_VAR = (
    "((CAST(n1n2 AS DOUBLE) / 12.0)"
    " * ((CAST(nn AS DOUBLE) + 1.0)"
    " - CAST(tt AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))))"
)
MW_Z_SQL = (
    f"CASE WHEN n1 > 0 AND n2 > 0 AND nn > 1 AND {_MW_VAR} > 0.0 THEN "
    f"(CAST(num2 AS DOUBLE) - CAST(n1n2 AS DOUBLE)) / (2.0 * sqrt({_MW_VAR})) END"
)


def mann_whitney_z(
    df: DataFrame, group_col: str, label: Column, score: Column
) -> DataFrame:
    """Mann-Whitney U test per group (Mann & Whitney 1947; the
    tie-corrected normal approximation) — the NONPARAMETRIC two-sample
    face of the testing family: ab_ztest compares proportions,
    chi2 compares categoricals, this compares whole DISTRIBUTIONS of an
    integer metric between the label's two sides without assuming
    normality (heavy-tailed spend/latency is exactly where the t-test
    lies).

    Exactness: 2U is roc_auc's exact numerator
    Σ pos·(2·cum_neg_before + neg) in DECIMAL(38,0); the tie term
    Σ(t³−t) also accumulates in DECIMAL(38,0) (t³ wraps int64 past
    t ≈ 2e6); z and the two-sided p evaluate ONE shared expression
    string verbatim in both engines (the _normal_sf discipline), each
    rounded once.  NULL z/p when either side is empty, n < 2, or the
    variance degenerates (all values tied) — surfaced, never 0.

    NULL contract: rows whose label or score casts to NULL are DROPPED
    (standard NA omission) on BOTH engines — without the filter a NULL
    label would silently join the control cohort (COUNT(*) − SUM(y))
    and a NULL score would diverge between engines in the prefix window
    (Spark orders NULLS FIRST by default, DuckDB NULLS LAST).

    Returns (grp, n_pos, n_neg, z, p_value).  Scale: one distinct
    (group, score) sufficient-statistic aggregate crosses the corpus;
    the prefix runs per group over DISTINCT scores (the quantile_ci
    window discipline)."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("grp"),
        score.cast("bigint").alias("s"),
        label.cast("int").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    d = base.groupBy("grp", "s").agg(
        F.sum("y").cast("bigint").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("neg"),
    )
    w = Window.partitionBy("grp").orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = d.withColumn("cnb", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    t = (F.col("pos") + F.col("neg")).cast(d38)
    agg = c.groupBy("grp").agg(
        F.sum("pos").cast("bigint").alias("n1"),
        F.sum("neg").cast("bigint").alias("n2"),
        F.sum(
            F.col("pos").cast(d38)
            * (F.lit(2).cast(d38) * F.col("cnb").cast(d38) + F.col("neg").cast(d38))
        ).cast(d38).alias("num2"),
        F.sum(t * t * t - t).cast(d38).alias("tt"),
    )
    staged = agg.select(
        "grp",
        "n1",
        "n2",
        "num2",
        "tt",
        (F.col("n1") + F.col("n2")).cast("bigint").alias("nn"),
        (F.col("n1").cast(d38) * F.col("n2").cast(d38)).alias("n1n2"),
    )
    return staged.select(
        F.col("grp").alias(group_col),
        F.col("n1").alias("n_pos"),
        F.col("n2").alias("n_neg"),
        F.round(F.expr(MW_Z_SQL), 6).alias("z"),
        F.round(F.expr(two_sided_p_expr(MW_Z_SQL)), 6).alias("p_value"),
    )


def mann_whitney_z_sql(
    table: str, group_col: str, label_sql: str, score_sql: str
) -> str:
    """DuckDB twin of :func:`mann_whitney_z` — identical sufficient
    statistics and the SAME shared z/p expression strings."""
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS grp,
                           CAST({score_sql} AS BIGINT) AS s,
                           CAST({label_sql} AS INT) AS y
                    FROM {table})
                  WHERE s IS NOT NULL AND y IS NOT NULL),
    d AS (SELECT grp, s,
                 CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
          FROM base GROUP BY 1, 2),
    c AS (SELECT grp, pos, neg,
                 COALESCE(CAST(SUM(neg) OVER (PARTITION BY grp ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                      0) AS cnb
          FROM d),
    agg AS (
        SELECT grp,
               CAST(SUM(pos) AS BIGINT) AS n1,
               CAST(SUM(neg) AS BIGINT) AS n2,
               CAST(SUM(CAST(pos AS DECIMAL(38,0))
                        * (CAST(2 AS DECIMAL(38,0)) * CAST(cnb AS DECIMAL(38,0))
                           + CAST(neg AS DECIMAL(38,0)))) AS DECIMAL(38,0)) AS num2,
               CAST(SUM(CAST(pos + neg AS DECIMAL(38,0))
                        * CAST(pos + neg AS DECIMAL(38,0))
                        * CAST(pos + neg AS DECIMAL(38,0))
                        - CAST(pos + neg AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tt
        FROM c GROUP BY 1),
    staged AS (
        SELECT grp, n1, n2, num2, tt,
               CAST(n1 + n2 AS BIGINT) AS nn,
               CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)) AS n1n2
        FROM agg)
    SELECT grp AS {group_col}, n1 AS n_pos, n2 AS n_neg,
           round({MW_Z_SQL}, 6) AS z,
           round({two_sided_p_expr(MW_Z_SQL)}, 6) AS p_value
    FROM staged
    """


def fleiss_kappa(
    df: DataFrame, group_col: str, item_col: str, label: Column
) -> DataFrame:
    """Fleiss' kappa per group (Fleiss 1971) — chance-corrected agreement
    for a PANEL of ≥ 2 raters, the multi-rater generalization of
    :func:`cohen_kappa` every LLM-judge-panel pipeline needs: input is
    LONG format, one row per (item, rating), ``n`` raters per item.

    Exactness: with n_ij = raters assigning item i to category j,
    A = Σ_i Σ_j n_ij(n_ij−1) (agreeing pairs), c_j = Σ_i n_ij,
    D = N·n·(n−1) (all pairs), E = (N·n)², B = Σ_j c_j², the textbook
    κ = (P̄ − P̄_e)/(1 − P̄_e) collapses to ONE exact ratio

        κ = (A·E − B·D) / (D·(E − B))

    with every product in DECIMAL(38,0) (A·E ~ N³n⁴ — exact past 10⁹
    items × 5 raters), rounded once to 6.  NULL when the denominator is
    0 (every rating in one category — chance agreement already 1;
    surfaced, never defaulted).  Fleiss' model REQUIRES a constant
    rater count per item: a group where items disagree on rating count
    (or n < 2) raises loudly in BOTH engines rather than silently
    mis-weighting P̄ — callers with missing ratings should complete or
    drop items first.

    Returns (group, n_items, n_raters, kappa).  Plan: one (group, item,
    category) cell aggregate crosses the corpus — the only corpus-wide
    exchange; item pair-sums and category marginals fold from the cells
    (≤ |categories| rows per item), the κ ratio on n_groups rows."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(item_col).alias("__i"),
        label.cast("string").alias("cat"),
    )
    cells = base.groupBy("__g", "__i", "cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # cells feed the per-item pair sums AND the marginals
    per_item = cells.groupBy("__g", "__i").agg(
        F.sum("c").cast("bigint").alias("n_i"),
        F.sum(F.col("c") * (F.col("c") - F.lit(1))).cast("bigint").alias("pairs_i"),
    )
    gstats = per_item.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("n_i").alias("__nmin"),
        F.max("n_i").alias("__nmax"),
        # cast INSIDE the sum: Σ pairs_i ≤ N·n² wraps int64 at extreme N
        F.sum(F.col("pairs_i").cast(d38)).cast(d38).alias("a_pairs"),
    ).select(
        "__g",
        "n_items",
        "a_pairs",
        F.expr(
            "CASE WHEN __nmin <> __nmax OR __nmin < 2 THEN CAST(raise_error("
            "'fleiss_kappa: every item needs the SAME rater count >= 2; "
            "complete or drop items with missing ratings first') AS BIGINT) "
            "ELSE __nmin END"
        ).alias("n_raters"),
    )
    marg = (
        cells.groupBy("__g", "cat")
        .agg(F.sum("c").cast(d38).alias("c_j"))
        .groupBy("__g")
        .agg(F.sum(F.col("c_j") * F.col("c_j")).cast(d38).alias("b_sq"))
    )
    nn = F.col("n_items").cast(d38) * F.col("n_raters").cast(d38)  # N·n
    d_pairs = nn * (F.col("n_raters") - F.lit(1)).cast(d38)        # D = N·n·(n−1)
    e_sq = nn * nn                                                  # E = (N·n)²
    num = F.col("a_pairs") * e_sq - F.col("b_sq") * d_pairs
    den = d_pairs * (e_sq - F.col("b_sq"))
    return gstats.join(marg, "__g").select(
        F.col("__g").alias(group_col),
        "n_items",
        "n_raters",
        F.when(
            den > F.lit(0).cast("decimal(38,0)"),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def fleiss_kappa_sql(
    long_sql: str, group_col: str, item_col: str, label_sql: str
) -> str:
    """DuckDB twin of :func:`fleiss_kappa` over the same LONG-format
    rating stream — identical cells, pair sums, marginals, the same
    equal-rater-count guard (``error()``), and ONE rounded division."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS g, {item_col} AS i,
               CAST({label_sql} AS VARCHAR) AS cat
        FROM ({long_sql})),
    cells AS MATERIALIZED (
        SELECT g, i, cat, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2, 3),
    per_item AS (
        SELECT g, i, CAST(SUM(c) AS BIGINT) AS n_i,
               CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs_i
        FROM cells GROUP BY 1, 2),
    gstats AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(pairs_i) AS DECIMAL(38,0)) AS a_pairs,
               CASE WHEN MIN(n_i) <> MAX(n_i) OR MIN(n_i) < 2
                    THEN CAST(error('fleiss_kappa: every item needs the SAME rater count >= 2; complete or drop items with missing ratings first') AS BIGINT)
                    ELSE MIN(n_i) END AS n_raters
        FROM per_item GROUP BY 1),
    marg AS (
        SELECT g, CAST(SUM(CAST(c_j AS DECIMAL(38,0))
                           * CAST(c_j AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS b_sq
        FROM (SELECT g, cat, CAST(SUM(c) AS BIGINT) AS c_j
              FROM cells GROUP BY 1, 2)
        GROUP BY 1),
    -- D = N·n·(n−1) (all pairs), E = (N·n)² — computed ONCE (the Spark
    -- side's nd/d_pairs/e_sq locals), so numerator and denominator
    -- cannot silently drift apart under a single-site edit
    staged AS (
        SELECT s.g, s.n_items, s.n_raters, s.a_pairs, m.b_sq,
               CAST(s.n_items AS DECIMAL(38,0))
                 * CAST(s.n_raters AS DECIMAL(38,0))
                 * CAST(s.n_raters - 1 AS DECIMAL(38,0)) AS d_pairs,
               CAST(s.n_items AS DECIMAL(38,0)) * CAST(s.n_raters AS DECIMAL(38,0))
                 * CAST(s.n_items AS DECIMAL(38,0)) * CAST(s.n_raters AS DECIMAL(38,0))
                 AS e_sq
        FROM gstats s JOIN marg m ON m.g = s.g)
    SELECT g AS {group_col}, n_items, n_raters,
           CASE WHEN d_pairs * (e_sq - b_sq) > 0 THEN
             round(CAST(a_pairs * e_sq - b_sq * d_pairs AS DOUBLE)
                   / CAST(d_pairs * (e_sq - b_sq) AS DOUBLE), 6)
           END AS kappa
    FROM staged
    """


#: shared Kruskal-Wallis expression strings — evaluated verbatim by Spark
#: expr AND DuckDB over identically-named columns (nn bigint, sumsq double,
#: tt DECIMAL(38,0)), so the float op order cannot diverge.
KW_H_SQL = (
    "CASE WHEN k >= 2 AND nn >= 2 THEN "
    "3.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)) * sumsq"
    " - 3.0 * (CAST(nn AS DOUBLE) + 1.0) END"
)
_KW_TIE_DEN = (
    "(1.0 - CAST(tt AS DOUBLE)"
    " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
    " - CAST(nn AS DOUBLE)))"
)
KW_H_TC_SQL = (
    f"CASE WHEN k >= 2 AND nn >= 2 AND {_KW_TIE_DEN} > 0.0"
    f" THEN ({KW_H_SQL}) / {_KW_TIE_DEN} END"
)
#: per-sample term of Σ S_j²/n_j — S_j is the 2×-scaled midrank sum, so
#: the /4.0 folds into the leading 12/(N(N+1)) → 3/(N(N+1)) in KW_H_SQL
KW_TERM_SQL = "CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(nj AS DOUBLE)"


def kruskal_wallis(
    df: DataFrame, group_col: str, sample_col: str, value: Column
) -> DataFrame:
    """Kruskal-Wallis H test per group (Kruskal & Wallis 1952; the
    tie-corrected form) — the K-SAMPLE face of the testing battery:
    ab_ztest compares two proportions, mann_whitney two distributions,
    this asks whether K samples (channels, cohorts, model variants)
    share one value distribution, without normality assumptions.

    Exactness: midranks double to INTEGERS — the 2×-scaled midrank of a
    distinct value v is R2(v) = 2·|{x < v}| + count(v) + 1 — so each
    sample's rank sum S_j = Σ c_jv·R2(v) is an exact bigint (2·R_j) and
    Σ R_j²/n_j = Σ S_j²/(4·n_j) folds the 4 into the H constant.  The
    per-sample float terms sum in SAMPLE-KEY ORDER (the chi2/js ordered-
    fold discipline); H, the tie term Σ(t³−t) (DECIMAL(38,0) — t³ wraps
    int64 past t ≈ 2e6, the mann_whitney lesson), and the tie-corrected
    H evaluate ONE shared expression string on both engines, each
    rounded once.  NULL H when k < 2 or n < 2; NULL corrected H when
    every value ties (the correction denominator degenerates) —
    surfaced, never 0.

    NULL contract: rows with a NULL sample key or NULL value are
    DROPPED (NA omission — the mann_whitney contract).  A NULL GROUP
    key is also dropped (the internal joins are group-key equi-joins,
    identical in both engines) — pre-coalesce a sentinel group if NULL
    groups must surface (spearman_corr's null-safe-join treatment).

    Returns (group, k_samples, n, h, h_tie_corrected).  Scale: the
    corpus collapses to (group, sample, value) sufficient-statistic
    rows in one exchange; the midrank prefix runs per group over
    DISTINCT values (the quantile_ci window discipline); everything
    after is k rows per group."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(sample_col).cast("string").alias("smp"),
        value.cast("bigint").alias("v"),
    ).filter(F.col("smp").isNotNull() & F.col("v").isNotNull())
    d_sv = base.groupBy("__g", "smp", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_sv")
    ).localCheckpoint()  # feeds the distinct-value table AND the rank sums
    d_v = d_sv.groupBy("__g", "v").agg(F.sum("c_sv").cast("bigint").alias("c_v"))
    w = Window.partitionBy("__g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = d_v.withColumn("cum", F.sum("c_v").over(w)).select(
        "__g",
        "v",
        "c_v",
        (F.lit(2) * (F.col("cum") - F.col("c_v")) + F.col("c_v") + F.lit(1))
        .cast("bigint")
        .alias("r2"),
    ).localCheckpoint()  # feeds the per-sample rank sums AND the tie term
    s = (
        d_sv.join(ranked.select("__g", "v", "r2"), ["__g", "v"])
        .groupBy("__g", "smp")
        .agg(
            F.sum(F.col("c_sv").cast(d38) * F.col("r2").cast(d38)).cast(d38).alias("s2"),
            F.sum("c_sv").cast("bigint").alias("nj"),
        )
    )
    ties = ranked.groupBy("__g").agg(
        F.sum(
            F.col("c_v").cast(d38) * F.col("c_v").cast(d38) * F.col("c_v").cast(d38)
            - F.col("c_v").cast(d38)
        ).cast(d38).alias("tt"),
        F.sum("c_v").cast("bigint").alias("nn"),
    )
    gagg = s.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("smp", F.expr(KW_TERM_SQL).alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("sumsq"),
    )
    return gagg.join(ties, "__g").select(
        F.col("__g").alias(group_col),
        F.col("k").alias("k_samples"),
        F.col("nn").alias("n"),
        F.round(F.expr(KW_H_SQL), 6).alias("h"),
        F.round(F.expr(KW_H_TC_SQL), 6).alias("h_tie_corrected"),
    )


def kruskal_wallis_sql(
    table: str, group_col: str, sample_sql: str, value_sql: str
) -> str:
    """DuckDB twin of :func:`kruskal_wallis` — identical integer
    midranks, sample-key-ordered float fold (``SUM(... ORDER BY smp)``),
    and the SAME shared H / tie-correction expression strings."""
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS g,
                           CAST({sample_sql} AS VARCHAR) AS smp,
                           CAST({value_sql} AS BIGINT) AS v
                    FROM {table})
                  WHERE smp IS NOT NULL AND v IS NOT NULL),
    d_sv AS MATERIALIZED (
        SELECT g, smp, v, CAST(COUNT(*) AS BIGINT) AS c_sv
        FROM base GROUP BY 1, 2, 3),
    d_v AS (SELECT g, v, CAST(SUM(c_sv) AS BIGINT) AS c_v FROM d_sv GROUP BY 1, 2),
    ranked AS MATERIALIZED (
        SELECT g, v, c_v,
               CAST(2 * (cum - c_v) + c_v + 1 AS BIGINT) AS r2
        FROM (SELECT g, v, c_v,
                     SUM(c_v) OVER (PARTITION BY g ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM d_v)),
    s AS (
        SELECT d.g, d.smp,
               CAST(SUM(CAST(d.c_sv AS DECIMAL(38,0))
                        * CAST(r.r2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
               CAST(SUM(d.c_sv) AS BIGINT) AS nj
        FROM d_sv d JOIN ranked r ON r.g = d.g AND r.v = d.v
        GROUP BY 1, 2),
    ties AS (
        SELECT g,
               CAST(SUM(CAST(c_v AS DECIMAL(38,0)) * CAST(c_v AS DECIMAL(38,0))
                        * CAST(c_v AS DECIMAL(38,0))
                        - CAST(c_v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tt,
               CAST(SUM(c_v) AS BIGINT) AS nn
        FROM ranked GROUP BY 1),
    gagg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
               SUM({KW_TERM_SQL} ORDER BY smp) AS sumsq
        FROM s GROUP BY 1)
    SELECT a.g AS {group_col}, a.k AS k_samples, t.nn AS n,
           round({KW_H_SQL}, 6) AS h,
           round({KW_H_TC_SQL}, 6) AS h_tie_corrected
    FROM gagg a JOIN ties t ON t.g = a.g
    """


#: per-sample between-groups term of the one-way F — S_j²/n_j as ONE
#: double expression (exact decimal/bigint operands), folded in
#: sample-key order on both engines (the kruskal KW_TERM discipline)
ANOVA_TERM_SQL = "CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)"

#: the one-way F statistic from (k, nn, tt, zz, sumsq) — shared by the
#: raw-value ANOVA face and the Brown-Forsythe deviation face; NULL
#: when k < 2, N ≤ k, or the within-groups sum degenerates to ≤ 0
#: (every sample internally constant — no error variance, F undefined)
ANOVA_F_SQL = (
    "CASE WHEN k >= 2 AND nn > k AND (CAST(zz AS DOUBLE) - sumsq) > 0 "
    "THEN ((sumsq - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE)) "
    "* CAST(nn - k AS DOUBLE)) "
    "/ ((CAST(zz AS DOUBLE) - sumsq) * CAST(k - 1 AS DOUBLE)) END"
)


def _oneway_f(cells: DataFrame, group_col: str) -> DataFrame:
    """One-way F over (``__g``, ``smp``, ``z``) rows (z exact bigint):
    F = [SS_between/(k−1)] / [SS_within/(N−k)] via the sum-of-squares
    identities SS_between = Σ_j S_j²/n_j − T²/N and SS_within =
    Σz² − Σ_j S_j²/n_j.  All integer/DECIMAL(38,0) sufficient
    statistics; the only floats are the per-sample S_j²/n_j terms,
    folded in sample-key order, and the final shared expression
    (:data:`ANOVA_F_SQL`), rounded once.  Returns
    (group, k_samples, n, f)."""
    d38 = "decimal(38,0)"
    s = cells.groupBy("__g", "smp").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum(F.col("z").cast(d38)).cast(d38).alias("sj"),
        F.sum(F.col("z").cast(d38) * F.col("z").cast(d38)).cast(d38).alias("zzj"),
    )
    grp = s.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("nn"),
        F.sum("sj").cast(d38).alias("tt"),
        F.sum("zzj").cast(d38).alias("zz"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("smp", F.expr(ANOVA_TERM_SQL).alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("sumsq"),
    )
    return grp.select(
        F.col("__g").alias(group_col),
        F.col("k").alias("k_samples"),
        F.col("nn").alias("n"),
        F.round(F.expr(ANOVA_F_SQL), 6).alias("f"),
    )


def _oneway_f_sql(cells_sql: str, group_col: str) -> str:
    """DuckDB twin of :func:`_oneway_f` over a (g, smp, z) subquery."""
    return f"""
    WITH cells AS ({cells_sql}),
    s AS (
        SELECT g, smp, CAST(COUNT(*) AS BIGINT) AS nj,
               CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sj,
               CAST(SUM(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS zzj
        FROM cells GROUP BY 1, 2),
    grp AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(nj) AS BIGINT) AS nn,
               CAST(SUM(sj) AS DECIMAL(38,0)) AS tt,
               CAST(SUM(zzj) AS DECIMAL(38,0)) AS zz,
               SUM({ANOVA_TERM_SQL} ORDER BY smp) AS sumsq
        FROM s GROUP BY 1)
    SELECT g AS {group_col}, k AS k_samples, nn AS n,
           round({ANOVA_F_SQL}, 6) AS f
    FROM grp
    """


def anova_f(
    df: DataFrame, group_col: str, sample_col: str, value: Column
) -> DataFrame:
    """One-way ANOVA F per group (Fisher) — the PARAMETRIC companion of
    :func:`kruskal_wallis`: do K samples share one MEAN?  Use this when
    values are roughly normal with similar variances (check with
    :func:`brown_forsythe` first); kruskal_wallis when they are not.

    ``value`` must be integer units (the engine-wide micro-unit
    contract).  NULL contract: rows with a NULL sample key or NULL
    value are dropped (NA omission); a NULL GROUP key survives (the
    chain is aggregate-only, no joins).  Under H₀, F ~ F(k−1, N−k).

    Returns (group, k_samples, n, f).  Scale: ONE partial-aggregated
    pass to (group, sample) sufficient statistics — k rows per group
    however big the corpus — then a rollup."""
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(sample_col).cast("string").alias("smp"),
        value.cast("bigint").alias("z"),
    ).filter(F.col("smp").isNotNull() & F.col("z").isNotNull())
    return _oneway_f(base, group_col)


def anova_f_sql(
    table: str, group_col: str, sample_sql: str, value_sql: str
) -> str:
    """DuckDB twin of :func:`anova_f`."""
    cells = f"""
        SELECT * FROM (
            SELECT {group_col} AS g,
                   CAST({sample_sql} AS VARCHAR) AS smp,
                   CAST({value_sql} AS BIGINT) AS z
            FROM {table})
        WHERE smp IS NOT NULL AND z IS NOT NULL"""
    return _oneway_f_sql(cells, group_col)


def brown_forsythe(
    df: DataFrame, group_col: str, sample_col: str, value: Column
) -> DataFrame:
    """Brown-Forsythe test per group (Brown & Forsythe 1974; Levene's
    test with MEDIAN centers) — do K samples share one VARIANCE?  The
    robust homogeneity-of-variance check that gates :func:`anova_f`'s
    equal-variance assumption and flags dispersion shifts a mean test
    misses.  It is the one-way F applied to the absolute deviations
    from each sample's median.

    Exactness: sample medians come from the exact distinct-value prefix
    machinery (the mad_outliers discipline) as 2×medians
    (lower + upper middle values — integer even for even n), and the
    deviations z = |2v − med2| = 2·|v − med_j| stay exact bigints (the
    constant 2 scales both sums of squares by 4 and cancels in F).
    The F arithmetic is the SAME shared expression as anova_f.

    NULL contract: rows with a NULL sample key or NULL value are
    dropped (NA omission); a NULL GROUP key survives — the
    median-join is null-safe on the group key (the spearman
    discipline).  Under H₀, F ~ F(k−1, N−k).

    Returns (group, k_samples, n, f).  Scale: one distinct-value
    prefix window per (group, sample) — bounded, partitioned — plus
    the cell-table joins; the corpus itself crosses one exchange."""
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(sample_col).cast("string").alias("smp"),
        value.cast("bigint").alias("v"),
    ).filter(F.col("smp").isNotNull() & F.col("v").isNotNull())
    dist = base.groupBy("__g", "smp", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # feeds the rank cut AND the deviation join
    ks = dist.groupBy("__g", "smp").agg(F.sum("c").cast("bigint").alias("n")).select(
        "__g",
        "smp",
        F.expr("(n + 1) div 2").alias("lo_k"),
        F.expr("(n + 2) div 2").alias("hi_k"),
    )
    w = Window.partitionBy("__g", "smp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dist.withColumn("cum", F.sum("c").over(w)).join(ks, ["__g", "smp"])
    med2 = cum.groupBy("__g", "smp").agg(
        (
            F.min(F.when(F.col("cum") >= F.col("lo_k"), F.col("v")))
            + F.min(F.when(F.col("cum") >= F.col("hi_k"), F.col("v")))
        )
        .cast("bigint")
        .alias("med2")
    )
    # null-safe on the group key only (smp is non-NULL by the filter)
    med2_r = med2.select(
        F.col("__g").alias("__mg"), F.col("smp").alias("__ms"), "med2"
    )
    dev = dist.join(
        med2_r,
        F.col("__g").eqNullSafe(F.col("__mg")) & (F.col("smp") == F.col("__ms")),
    ).select(
        "__g",
        "smp",
        F.abs(F.lit(2) * F.col("v") - F.col("med2")).cast("bigint").alias("z"),
        "c",
    )
    # re-expand the distinct-value cells to row multiplicity via the
    # count column: the F core needs per-ROW sums, which fold exactly as
    # c-weighted cell sums
    d38 = "decimal(38,0)"
    s = dev.groupBy("__g", "smp").agg(
        F.sum("c").cast("bigint").alias("nj"),
        F.sum(F.col("c").cast(d38) * F.col("z").cast(d38)).cast(d38).alias("sj"),
        F.sum(
            F.col("c").cast(d38) * F.col("z").cast(d38) * F.col("z").cast(d38)
        ).cast(d38).alias("zzj"),
    )
    grp = s.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("nn"),
        F.sum("sj").cast(d38).alias("tt"),
        F.sum("zzj").cast(d38).alias("zz"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("smp", F.expr(ANOVA_TERM_SQL).alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("sumsq"),
    )
    return grp.select(
        F.col("__g").alias(group_col),
        F.col("k").alias("k_samples"),
        F.col("nn").alias("n"),
        F.round(F.expr(ANOVA_F_SQL), 6).alias("f"),
    )


def brown_forsythe_sql(
    table: str, group_col: str, sample_sql: str, value_sql: str
) -> str:
    """DuckDB twin of :func:`brown_forsythe` — identical 2×median prefix
    selection, c-weighted deviation cells, and the shared F expression."""
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS g,
                           CAST({sample_sql} AS VARCHAR) AS smp,
                           CAST({value_sql} AS BIGINT) AS v
                    FROM {table})
                  WHERE smp IS NOT NULL AND v IS NOT NULL),
    dist AS MATERIALIZED (
        SELECT g, smp, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2, 3),
    ks AS (SELECT g, smp, (CAST(SUM(c) AS BIGINT) + 1) // 2 AS lo_k,
                  (CAST(SUM(c) AS BIGINT) + 2) // 2 AS hi_k
           FROM dist GROUP BY 1, 2),
    med2 AS (
        SELECT d.g, d.smp,
               CAST(MIN(CASE WHEN cum >= k.lo_k THEN d.v END)
                    + MIN(CASE WHEN cum >= k.hi_k THEN d.v END) AS BIGINT) AS med2
        FROM (SELECT g, smp, v, c,
                     SUM(c) OVER (PARTITION BY g, smp ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM dist) d
        JOIN ks k ON k.g IS NOT DISTINCT FROM d.g AND k.smp = d.smp
        GROUP BY 1, 2),
    dev AS (
        SELECT d.g, d.smp, CAST(abs(2 * d.v - m.med2) AS BIGINT) AS z, d.c
        FROM dist d
        JOIN med2 m ON m.g IS NOT DISTINCT FROM d.g AND m.smp = d.smp),
    s AS (
        SELECT g, smp, CAST(SUM(c) AS BIGINT) AS nj,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sj,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))
                        * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS zzj
        FROM dev GROUP BY 1, 2),
    grp AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(nj) AS BIGINT) AS nn,
               CAST(SUM(sj) AS DECIMAL(38,0)) AS tt,
               CAST(SUM(zzj) AS DECIMAL(38,0)) AS zz,
               SUM({ANOVA_TERM_SQL} ORDER BY smp) AS sumsq
        FROM s GROUP BY 1)
    SELECT g AS {group_col}, k AS k_samples, nn AS n,
           round({ANOVA_F_SQL}, 6) AS f
    FROM grp
    """


#: Spearman's rho from exact 2×-midrank sufficient statistics — ONE
#: shared expression string both engines evaluate on DECIMAL(38,0)
#: columns (nn, su, sv, suv, suu, svv): rho = (n·Σuv − Σu·Σv) /
#: √((n·Σu² − (Σu)²)·(n·Σv² − (Σv)²)), NULL when either marginal is
#: constant (zero rank variance — undefined, surfaced, never 0).
SPEARMAN_RHO_SQL = (
    "CASE WHEN (nn * suu - su * su) > 0 AND (nn * svv - sv * sv) > 0 "
    "THEN CAST(nn * suv - su * sv AS DOUBLE) "
    "/ sqrt(CAST(nn * suu - su * su AS DOUBLE) "
    "* CAST(nn * svv - sv * sv AS DOUBLE)) END"
)


def spearman_corr(
    df: DataFrame, group_col: str, x: Column, y: Column
) -> DataFrame:
    """Spearman's rank correlation per group (Spearman 1904, the
    tie-corrected midrank form) — the MONOTONE-association face of the
    correlation battery: feature_correlations' exact Pearson reads
    linear association and is outlier-sensitive; this is Pearson on
    RANKS, invariant to any monotone transform of either margin (the
    robust screen for feature/metric relationships).

    Exactness: the Kruskal-Wallis integer-midrank discipline applied to
    BOTH margins — the 2×-scaled midrank of a distinct value v is
    R2(v) = 2·|{x < v}| + count(v) + 1, an exact bigint, and the
    constant 2 cancels in rho — so all six sufficient statistics
    (n, Σu, Σv, Σuv, Σu², Σv²) are exact DECIMAL(38,0) sums and rho is
    ONE shared expression string (:data:`SPEARMAN_RHO_SQL`) with a
    single double division + sqrt, rounded once.  Bound: the n·Σuv
    product stays inside DECIMAL(38,0) to ~10⁹ rows per group (4n⁴ <
    10³⁸) — same class as the kruskal rank-sum squares.  NULL rho when
    either margin is constant or n < 2.

    NULL contract: rows with NULL in EITHER value are dropped (pairwise
    NA omission — the mann_whitney contract); a NULL GROUP key is a
    real group and surfaces its own row (null-safe rank joins in both
    engines — the tokenizer_fertility NULL-lang lesson).

    Returns (group, n, rho).  Scale: the corpus collapses to distinct
    (group, x, y) cells in one exchange; midranks run per group over
    the DISTINCT marginal values (bounded windows, the kruskal
    discipline); the rank joins ride the cell table, never corpus
    rows."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        x.cast("bigint").alias("xv"),
        y.cast("bigint").alias("yv"),
    ).filter(F.col("xv").isNotNull() & F.col("yv").isNotNull())
    cells = base.groupBy("__g", "xv", "yv").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # feeds both marginals AND the pair sums

    def _ranked(col: str) -> DataFrame:
        dv = cells.groupBy("__g", col).agg(F.sum("c").cast("bigint").alias("c_v"))
        w = Window.partitionBy("__g").orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return dv.withColumn("cum", F.sum("c_v").over(w)).select(
            F.col("__g").alias(f"__rg_{col}"),
            F.col(col).alias(f"__rv_{col}"),
            (F.lit(2) * (F.col("cum") - F.col("c_v")) + F.col("c_v") + F.lit(1))
            .cast("bigint")
            .alias(f"r2{col}"),
        )

    # group keys join NULL-SAFELY (a NULL group must not silently vanish
    # from the output); the value keys are non-NULL by the filter above
    joined = (
        cells.join(
            _ranked("xv"),
            F.col("__g").eqNullSafe(F.col("__rg_xv"))
            & (F.col("xv") == F.col("__rv_xv")),
        )
        .join(
            _ranked("yv"),
            F.col("__g").eqNullSafe(F.col("__rg_yv"))
            & (F.col("yv") == F.col("__rv_yv")),
        )
    )
    stats = joined.groupBy("__g").agg(
        F.sum("c").cast(d38).alias("nn"),
        F.sum(F.col("c").cast(d38) * F.col("r2xv").cast(d38)).cast(d38).alias("su"),
        F.sum(F.col("c").cast(d38) * F.col("r2yv").cast(d38)).cast(d38).alias("sv"),
        F.sum(
            F.col("c").cast(d38) * F.col("r2xv").cast(d38) * F.col("r2yv").cast(d38)
        ).cast(d38).alias("suv"),
        F.sum(
            F.col("c").cast(d38) * F.col("r2xv").cast(d38) * F.col("r2xv").cast(d38)
        ).cast(d38).alias("suu"),
        F.sum(
            F.col("c").cast(d38) * F.col("r2yv").cast(d38) * F.col("r2yv").cast(d38)
        ).cast(d38).alias("svv"),
    )
    return stats.select(
        F.col("__g").alias(group_col),
        F.col("nn").cast("bigint").alias("n"),
        F.round(F.expr(SPEARMAN_RHO_SQL), 6).alias("rho"),
    )


def spearman_corr_sql(
    table: str, group_col: str, x_sql: str, y_sql: str
) -> str:
    """DuckDB twin of :func:`spearman_corr` — identical integer
    midranks on both margins, identical DECIMAL(38,0) sufficient
    statistics, the SAME shared rho expression string."""
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS g,
                           CAST({x_sql} AS BIGINT) AS xv,
                           CAST({y_sql} AS BIGINT) AS yv
                    FROM {table})
                  WHERE xv IS NOT NULL AND yv IS NOT NULL),
    cells AS MATERIALIZED (
        SELECT g, xv, yv, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2, 3),
    rx AS (
        SELECT g, xv, CAST(2 * (cum - c_v) + c_v + 1 AS BIGINT) AS r2xv
        FROM (SELECT g, xv, c_v,
                     SUM(c_v) OVER (PARTITION BY g ORDER BY xv
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM (SELECT g, xv, CAST(SUM(c) AS BIGINT) AS c_v
                    FROM cells GROUP BY 1, 2))),
    ry AS (
        SELECT g, yv, CAST(2 * (cum - c_v) + c_v + 1 AS BIGINT) AS r2yv
        FROM (SELECT g, yv, c_v,
                     SUM(c_v) OVER (PARTITION BY g ORDER BY yv
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM (SELECT g, yv, CAST(SUM(c) AS BIGINT) AS c_v
                    FROM cells GROUP BY 1, 2))),
    stats AS (
        SELECT c.g,
               CAST(SUM(c.c) AS DECIMAL(38,0)) AS nn,
               CAST(SUM(CAST(c.c AS DECIMAL(38,0))
                        * CAST(rx.r2xv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS su,
               CAST(SUM(CAST(c.c AS DECIMAL(38,0))
                        * CAST(ry.r2yv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
               CAST(SUM(CAST(c.c AS DECIMAL(38,0))
                        * CAST(rx.r2xv AS DECIMAL(38,0))
                        * CAST(ry.r2yv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS suv,
               CAST(SUM(CAST(c.c AS DECIMAL(38,0))
                        * CAST(rx.r2xv AS DECIMAL(38,0))
                        * CAST(rx.r2xv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS suu,
               CAST(SUM(CAST(c.c AS DECIMAL(38,0))
                        * CAST(ry.r2yv AS DECIMAL(38,0))
                        * CAST(ry.r2yv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS svv
        FROM cells c
        JOIN rx ON rx.g IS NOT DISTINCT FROM c.g AND rx.xv = c.xv
        JOIN ry ON ry.g IS NOT DISTINCT FROM c.g AND ry.yv = c.yv
        GROUP BY 1)
    SELECT g AS {group_col}, CAST(nn AS BIGINT) AS n,
           round({SPEARMAN_RHO_SQL}, 6) AS rho
    FROM stats
    """


#: confidence scores are integer micro-units in [0, ECE_SCALE]
ECE_SCALE = 1_000_000


def expected_calibration_error(
    df: DataFrame,
    group_col: str,
    label: Column,
    score_micro: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Expected Calibration Error per group (Naeini et al. AAAI 2015;
    Guo et al. ICML 2017) — THE summary reliability number for a
    probabilistic classifier / LLM-judge confidence: bin predictions by
    confidence, weight each bin's |accuracy − mean confidence| by its
    mass.  The pointwise companion of the isotonic/conformal calibration
    family (those FIX calibration; this MEASURES it).

    Exactness — fully integer, no fold-order risk: with confidence in
    micro-units (``score_micro`` ∈ [0, 1e6]), each bin's gap term is

        n_b·|acc_b − conf_b| = |Σy_b·SCALE − Σs_b| / SCALE

    so ECE = Σ_b |Σy_b·SCALE − Σs_b| / (SCALE·N) — the numerator is an
    EXACT DECIMAL(38,0) sum of per-bin absolute integers (order-free),
    and ECE is ONE rounded division.  MCE (the max bin gap) rounds each
    bin's exact-numerator division once, then takes the max.  NULL on
    empty groups only (ECE of a constant-confidence group is still
    defined).  Scores outside [0, ECE_SCALE] raise loudly (a
    mis-scaled probability would silently land in the top bin).

    Bins are equal-width: bin = min(score·n_bins div (SCALE+1),
    n_bins−1) — pure integer arithmetic (the PSI/z-order discipline).

    Returns (group, n, n_bins_used, ece, mce).  Scale: ONE partial-
    aggregated pass to (group, bin) sufficient statistics — ≤ n_bins
    rows per group — then the rollup."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        label.cast("int").alias("y"),
        score_micro.cast("bigint").alias("s"),
    ).filter(F.col("y").isNotNull() & F.col("s").isNotNull())
    guarded = base.withColumn(
        "s",
        F.expr(
            f"CASE WHEN s < 0 OR s > {ECE_SCALE} THEN CAST(raise_error("
            f"'expected_calibration_error: score_micro outside [0, {ECE_SCALE}] — "
            "scale probabilities to micro-units first') AS BIGINT) ELSE s END"
        ),
    )
    bins = guarded.withColumn(
        "b",
        F.expr(f"LEAST(s * {int(n_bins)} div {ECE_SCALE + 1}, {int(n_bins) - 1})"),
    )
    cells = bins.groupBy("__g", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("sy"),
        # cast INSIDE the sum: a (group, bin) cell past ~9.2e12 rows at
        # near-max scores would wrap a raw-BIGINT sum in non-ANSI Spark
        # while DuckDB sums exactly (the mad_outliers lesson)
        F.sum(F.col("s").cast(d38)).cast(d38).alias("ss"),
    )
    gap = cells.withColumn(
        "num",
        F.abs(
            F.col("sy").cast(d38) * F.lit(ECE_SCALE).cast(d38) - F.col("ss")
        ).cast(d38),
    )
    return gap.groupBy("__g").agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        F.round(
            F.sum("num").cast("double")
            / (F.lit(float(ECE_SCALE)) * F.sum("n_b").cast("double")),
            6,
        ).alias("ece"),
        F.max(
            F.round(
                F.col("num").cast("double")
                / (F.lit(float(ECE_SCALE)) * F.col("n_b").cast("double")),
                6,
            )
        ).alias("mce"),
    ).select(
        F.col("__g").alias(group_col), "n", "n_bins_used", "ece", "mce"
    )


def expected_calibration_error_sql(
    table: str, group_col: str, label_sql: str, score_sql: str, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`expected_calibration_error` — identical
    integer bins, exact numerators, one rounded division (+ the same
    loud out-of-range guard)."""
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS g,
                           CAST({label_sql} AS INT) AS y,
                           CAST({score_sql} AS BIGINT) AS s
                    FROM {table})
                  WHERE y IS NOT NULL AND s IS NOT NULL),
    guarded AS (
        SELECT g, y,
               CASE WHEN s < 0 OR s > {ECE_SCALE}
                    THEN CAST(error('expected_calibration_error: score_micro outside [0, {ECE_SCALE}] — scale probabilities to micro-units first') AS BIGINT)
                    ELSE s END AS s
        FROM base),
    cells AS (
        SELECT g, LEAST(s * {int(n_bins)} // {ECE_SCALE + 1}, {int(n_bins) - 1}) AS b,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(s) AS DECIMAL(38,0)) AS ss
        FROM guarded GROUP BY 1, 2),
    gap AS (
        SELECT g, n_b,
               CAST(abs(CAST(sy AS DECIMAL(38,0)) * CAST({ECE_SCALE} AS DECIMAL(38,0))
                        - ss) AS DECIMAL(38,0)) AS num
        FROM cells)
    SELECT g AS {group_col},
           CAST(SUM(n_b) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins_used,
           round(CAST(SUM(num) AS DOUBLE)
                 / ({float(ECE_SCALE)!r} * CAST(SUM(n_b) AS DOUBLE)), 6) AS ece,
           MAX(round(CAST(num AS DOUBLE)
                     / ({float(ECE_SCALE)!r} * CAST(n_b AS DOUBLE)), 6)) AS mce
    FROM gap GROUP BY 1
    """


def brier_decomposition(
    df: DataFrame,
    group_col: str,
    label: Column,
    score_micro: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Brier score + Murphy (1973) decomposition per group — the proper
    scoring rule beside ECE's gap summary: BS measures total probability
    error; reliability (REL, calibration error mass), resolution (RES,
    how much the forecast separates outcomes), and uncertainty
    (UNC = ȳ(1−ȳ)) attribute it.  Skill exists iff RES > REL.

    Exactness: the Brier score itself is FULLY exact — with scores in
    micro-units, BS = Σ(s − y·SCALE)² / (SCALE²·N): an exact
    DECIMAL(38,0) numerator (order-free) and ONE rounded division.
    UNC = Sy·(N−Sy)/N² likewise.  REL and RES are the BINNED forms
    (decile bins, the ECE cells): per-bin exact integer numerators
    (Ss_b − Sy_b·SCALE)² / (n_b·SCALE²) and (Sy_b·N − Sy·n_b)² / (n_b·N²),
    folded in BIN ORDER (the chi2 ordered-fold discipline) then divided
    by N once.  Note the textbook identity BS = UNC − RES + REL holds
    for the BINNED forecast; with raw scores the gap is the within-bin
    forecast variance (reported as ``wbv`` so the identity is checkable:
    bs = unc − res + rel + wbv up to rounding).

    NULL label/score rows are dropped (NA omission); out-of-range
    scores raise loudly (the ECE guard).  Returns
    (group, n, bs, rel, res, unc, wbv).  Scale: ONE partial-aggregated
    pass to ≤ n_bins cells per group (+ the row-level exact BS moments
    riding the same pass' base)."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        label.cast("int").alias("y"),
        score_micro.cast("bigint").alias("s"),
    ).filter(F.col("y").isNotNull() & F.col("s").isNotNull())
    guarded = base.withColumn(
        "s",
        F.expr(
            f"CASE WHEN s < 0 OR s > {ECE_SCALE} THEN CAST(raise_error("
            f"'brier_decomposition: score_micro outside [0, {ECE_SCALE}] — "
            "scale probabilities to micro-units first') AS BIGINT) ELSE s END"
        ),
    )
    bins = guarded.withColumn(
        "b",
        F.expr(f"LEAST(s * {int(n_bins)} div {ECE_SCALE + 1}, {int(n_bins) - 1})"),
    )
    err = (F.col("s").cast(d38) - F.col("y").cast(d38) * F.lit(ECE_SCALE).cast(d38))
    cells = bins.groupBy("__g", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("sy_b"),
        F.sum(F.col("s").cast(d38)).cast(d38).alias("ss_b"),
        F.sum(err * err).cast(d38).alias("se2_b"),
    ).localCheckpoint()  # feeds the group totals AND the per-bin folds
    tot = cells.groupBy("__g").agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum(F.col("sy_b").cast(d38)).cast(d38).alias("sy"),
        F.sum("se2_b").cast(d38).alias("se2"),
    )
    # per-bin float terms: exact integer numerators, ONE division each,
    # folded in bin order — identical IEEE trees on both engines
    rel_term = (
        "CAST(CAST(ss_b AS DECIMAL(38,0)) - CAST(sy_b AS DECIMAL(38,0))"
        f" * CAST({ECE_SCALE} AS DECIMAL(38,0)) AS DOUBLE)"
    )
    res_term = (
        "CAST(CAST(sy_b AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"
        " - CAST(sy AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)) AS DOUBLE)"
    )
    joined = cells.join(tot, "__g")
    folded = joined.groupBy("__g", "n", "sy", "se2").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "b",
                        F.expr(
                            f"{rel_term} * {rel_term}"
                            f" / (CAST(n_b AS DOUBLE) * {float(ECE_SCALE)!r} * {float(ECE_SCALE)!r})"
                        ).alias("rel_t"),
                        F.expr(
                            f"{res_term} * {res_term}"
                            " / (CAST(n_b AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
                        ).alias("res_t"),
                    )
                )
            ),
            F.struct(F.lit(0.0).alias("rel"), F.lit(0.0).alias("res")),
            lambda acc, x: F.struct(
                (acc["rel"] + x["rel_t"]).alias("rel"),
                (acc["res"] + x["res_t"]).alias("res"),
            ),
        ).alias("f")
    )
    nd = F.col("n").cast("double")
    bs = F.col("se2").cast("double") / (F.lit(float(ECE_SCALE)) * F.lit(float(ECE_SCALE)) * nd)
    unc = (
        F.col("sy").cast("double")
        * (nd - F.col("sy").cast("double"))
        / (nd * nd)
    )
    rel = F.col("f.rel") / nd
    res = F.col("f.res") / nd
    return folded.select(
        F.col("__g").alias(group_col),
        "n",
        F.round(bs, 6).alias("bs"),
        F.round(rel, 6).alias("rel"),
        F.round(res, 6).alias("res"),
        F.round(unc, 6).alias("unc"),
        F.round(bs - (unc - res + rel), 6).alias("wbv"),
    )


def brier_decomposition_sql(
    table: str, group_col: str, label_sql: str, score_sql: str, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`brier_decomposition` — identical cells,
    exact numerators, bin-ordered folds (``SUM(... ORDER BY b)``), the
    same single divisions and the same loud range guard."""
    rel_term = (
        "CAST(CAST(ss_b AS DECIMAL(38,0)) - CAST(sy_b AS DECIMAL(38,0))"
        f" * CAST({ECE_SCALE} AS DECIMAL(38,0)) AS DOUBLE)"
    )
    res_term = (
        "CAST(CAST(sy_b AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"
        " - CAST(sy AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)) AS DOUBLE)"
    )
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS g,
                           CAST({label_sql} AS INT) AS y,
                           CAST({score_sql} AS BIGINT) AS s
                    FROM {table})
                  WHERE y IS NOT NULL AND s IS NOT NULL),
    guarded AS (
        SELECT g, y,
               CASE WHEN s < 0 OR s > {ECE_SCALE}
                    THEN CAST(error('brier_decomposition: score_micro outside [0, {ECE_SCALE}] — scale probabilities to micro-units first') AS BIGINT)
                    ELSE s END AS s
        FROM base),
    cells AS MATERIALIZED (
        SELECT g, LEAST(s * {int(n_bins)} // {ECE_SCALE + 1}, {int(n_bins) - 1}) AS b,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(y) AS BIGINT) AS sy_b,
               CAST(SUM(s) AS DECIMAL(38,0)) AS ss_b,
               CAST(SUM((CAST(s AS DECIMAL(38,0))
                         - CAST(y AS DECIMAL(38,0)) * CAST({ECE_SCALE} AS DECIMAL(38,0)))
                        * (CAST(s AS DECIMAL(38,0))
                           - CAST(y AS DECIMAL(38,0)) * CAST({ECE_SCALE} AS DECIMAL(38,0))))
                    AS DECIMAL(38,0)) AS se2_b
        FROM guarded GROUP BY 1, 2),
    tot AS (
        SELECT g, CAST(SUM(n_b) AS BIGINT) AS n,
               CAST(SUM(sy_b) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(se2_b) AS DECIMAL(38,0)) AS se2
        FROM cells GROUP BY 1),
    folded AS (
        SELECT c.g, t.n, t.sy, t.se2,
               SUM({rel_term} * {rel_term}
                   / (CAST(n_b AS DOUBLE) * {float(ECE_SCALE)!r} * {float(ECE_SCALE)!r})
                   ORDER BY c.b) AS frel,
               SUM({res_term} * {res_term}
                   / (CAST(n_b AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   ORDER BY c.b) AS fres
        FROM cells c JOIN tot t ON t.g = c.g
        GROUP BY 1, 2, 3, 4)
    SELECT g AS {group_col}, n,
           round(CAST(se2 AS DOUBLE) / ({float(ECE_SCALE)!r} * {float(ECE_SCALE)!r} * CAST(n AS DOUBLE)), 6) AS bs,
           round(frel / CAST(n AS DOUBLE), 6) AS rel,
           round(fres / CAST(n AS DOUBLE), 6) AS res,
           round(CAST(sy AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS unc,
           round(CAST(se2 AS DOUBLE) / ({float(ECE_SCALE)!r} * {float(ECE_SCALE)!r} * CAST(n AS DOUBLE))
                 - (CAST(sy AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                    - fres / CAST(n AS DOUBLE) + frel / CAST(n AS DOUBLE)), 6) AS wbv
    FROM folded
    """


#: shared McNemar z expression — evaluated verbatim by both engines over
#: identically-named bigint columns (n10, n01)
MCNEMAR_Z_SQL = (
    "CASE WHEN n10 + n01 > 0 THEN "
    "(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE))"
    " / sqrt(CAST(n10 + n01 AS DOUBLE)) END"
)


def mcnemar_test(
    df: DataFrame, group_col: str, rater_a: Column, rater_b: Column
) -> DataFrame:
    """McNemar's test per group (McNemar 1947) — the PAIRED counterpart
    of ab_ztest and the rate-side companion of cohen_kappa: on the SAME
    items, does rater/model B flag positive at a different rate than A?
    (Kappa measures agreement; McNemar tests marginal-rate difference —
    an upgraded model can agree less yet be unbiased, or agree more
    while drifting.)  Only the DISCORDANT pairs are informative:
    z = (n10 − n01)/√(n10 + n01) (z² is the uncorrected McNemar χ²₁),
    two-sided p via the shared normal-CDF machinery.

    Exactness: n10/n01/n11/n00 are exact bigints from ONE pair-count
    aggregate; z and p evaluate one shared expression string, each
    rounded once.  NULL z/p when no discordant pairs exist (the test is
    undefined — surfaced, never 0).  Rows where either rater is NULL
    are DROPPED (NA omission, the mann_whitney contract) — raters are
    BOOLEAN column expressions.

    Returns (group, n, n10, n01, z, p_value).  Scale: the corpus
    crosses ONE exchange into ≤4 cells per group."""
    base = df.select(
        F.col(group_col).alias("__g"),
        rater_a.cast("boolean").alias("a"),
        rater_b.cast("boolean").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n",
        "n10",
        "n01",
        F.round(F.expr(MCNEMAR_Z_SQL), 6).alias("z"),
        F.round(F.expr(two_sided_p_expr(MCNEMAR_Z_SQL)), 6).alias("p_value"),
    )


def mcnemar_test_sql(
    table_sql: str, group_col: str, a_sql: str, b_sql: str
) -> str:
    """DuckDB twin of :func:`mcnemar_test` — identical discordant-pair
    counts and the SAME shared z/p expression strings."""
    return f"""
    WITH base AS (SELECT * FROM (
                    SELECT {group_col} AS g,
                           CAST({a_sql} AS BOOLEAN) AS a,
                           CAST({b_sql} AS BOOLEAN) AS b
                    FROM ({table_sql}))
                  WHERE a IS NOT NULL AND b IS NOT NULL),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN (NOT a) AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01
        FROM base GROUP BY 1)
    SELECT g AS {group_col}, n, n10, n01,
           round({MCNEMAR_Z_SQL}, 6) AS z,
           round({two_sided_p_expr(MCNEMAR_Z_SQL)}, 6) AS p_value
    FROM agg
    """


def cochran_q(
    df: DataFrame, group_col: str, item_col: str, treatment: Column, y: Column
) -> DataFrame:
    """Cochran's Q test per group (Cochran 1950) — the K-treatment
    extension of :func:`mcnemar_test`, completing the paired-binary
    battery the way kruskal_wallis completes mann_whitney: on the SAME
    items, do K raters/models/treatments flag positive at different
    rates?  Input is LONG format, one row per (item, treatment, flag).

    Exactness: with column totals C_j (positives per treatment), row
    totals R_i (positives per item), T = ΣC_j = ΣR_i, the textbook

        Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)

    is ONE exact-DECIMAL(38,0) ratio rounded once.  NULL when the
    denominator is 0 (every item unanimous — no within-item variation,
    the test is undefined; surfaced, never 0).  Under H₀,
    Q ~ χ²(k−1).

    Contract, guarded loudly in BOTH engines: every item carries each
    treatment EXACTLY once (a duplicate (item, treatment) or a missing
    treatment silently biases the row totals) — complete or drop items
    first.  NULL treatment/flag rows raise the same guard by absence.

    Returns (group, k_treatments, n_items, q).  Scale: one
    (group, item, treatment) distinct pass crosses the corpus; column
    and row totals fold from it; the Q arithmetic runs on n_groups
    rows."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(item_col).alias("__i"),
        treatment.cast("string").alias("t"),
        y.cast("int").alias("y"),
    )
    # the duplicate guard rides ON yy — the column every downstream
    # aggregate consumes — so Catalyst cannot prune it away (same
    # discipline as the n_t guard below); it fires during the
    # localCheckpoint job, with no separate eager guard action
    cells = base.groupBy("__g", "__i", "t").agg(
        F.when(F.count(F.lit(1)) == 1, F.sum("y").cast("bigint"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "cochran_q: duplicate (item, treatment) rows — every item "
                    "must carry each treatment exactly once; dedupe first"
                )
            ).cast("bigint")
        )
        .alias("yy"),
    ).localCheckpoint()  # feeds both totals and k (3 consumers)
    k_tab = cells.groupBy("__g").agg(F.count_distinct("t").cast("bigint").alias("k"))
    per_item = cells.groupBy("__g", "__i").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t"),
        F.sum("yy").cast("bigint").alias("r_i"),
    )
    # the guard rides ON r_i (the column every downstream aggregate
    # consumes) — a separate check column would be pruned away by
    # Catalyst and the raise_error never evaluated
    rows = per_item.join(k_tab, "__g").select(
        "__g",
        F.expr(
            "CASE WHEN n_t <> k THEN CAST(raise_error("
            "'cochran_q: an item is missing treatments — every item must carry "
            "each treatment exactly once; complete or drop items first') AS BIGINT) "
            "ELSE r_i END"
        ).alias("r_i"),
    )
    row_stats = rows.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("r_i").cast(d38)).cast(d38).alias("t_tot"),
        F.sum(F.col("r_i").cast(d38) * F.col("r_i").cast(d38)).cast(d38).alias("r_sq"),
    )
    col_stats = (
        cells.groupBy("__g", "t")
        .agg(F.sum("yy").cast("bigint").alias("c_j"))
        .groupBy("__g")
        .agg(
            F.sum(F.col("c_j").cast(d38) * F.col("c_j").cast(d38)).cast(d38).alias("c_sq")
        )
    )
    kd = F.col("k").cast(d38)
    num = (kd - F.lit(1).cast(d38)) * (kd * F.col("c_sq") - F.col("t_tot") * F.col("t_tot"))
    den = kd * F.col("t_tot") - F.col("r_sq")
    return (
        row_stats.join(col_stats, "__g")
        .join(k_tab, "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("k").alias("k_treatments"),
            "n_items",
            F.when(
                den > F.lit(0).cast("decimal(38,0)"),
                F.round(num.cast("double") / den.cast("double"), 6),
            ).alias("q"),
        )
    )


def cochran_q_sql(
    long_sql: str, group_col: str, item_col: str, treatment_sql: str, y_sql: str
) -> str:
    """DuckDB twin of :func:`cochran_q` — identical cells, the same
    exactly-once guards (``error()``), exact DECIMAL(38,0) totals, ONE
    rounded division."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS g, {item_col} AS i,
               CAST({treatment_sql} AS VARCHAR) AS t,
               CAST({y_sql} AS INT) AS y
        FROM ({long_sql})),
    cells AS MATERIALIZED (
        -- the duplicate guard rides ON yy (consumed by per_item and
        -- col_stats), not a dedicated column: a projection-pruning
        -- optimizer change can never silently disable it
        SELECT g, i, t,
               CASE WHEN COUNT(*) <> 1 THEN CAST(error('cochran_q: duplicate (item, treatment) rows — every item must carry each treatment exactly once; dedupe first') AS BIGINT)
                    ELSE CAST(SUM(y) AS BIGINT) END AS yy
        FROM base GROUP BY 1, 2, 3),
    k_tab AS (SELECT g, CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells GROUP BY 1),
    per_item AS (
        SELECT g, i, CAST(COUNT(*) AS BIGINT) AS n_t,
               CAST(SUM(yy) AS BIGINT) AS r_i
        FROM cells GROUP BY 1, 2),
    rows_ok AS (
        SELECT p.g,
               CASE WHEN p.n_t <> k.k THEN CAST(error('cochran_q: an item is missing treatments — every item must carry each treatment exactly once; complete or drop items first') AS BIGINT)
                    ELSE p.r_i END AS r_i
        FROM per_item p JOIN k_tab k ON k.g = p.g),
    row_stats AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(r_i AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t_tot,
               CAST(SUM(CAST(r_i AS DECIMAL(38,0)) * CAST(r_i AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS r_sq
        FROM rows_ok GROUP BY 1),
    col_stats AS (
        SELECT g, CAST(SUM(CAST(c_j AS DECIMAL(38,0)) * CAST(c_j AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS c_sq
        FROM (SELECT g, t, CAST(SUM(yy) AS BIGINT) AS c_j FROM cells GROUP BY 1, 2)
        GROUP BY 1)
    SELECT r.g AS {group_col}, k.k AS k_treatments, r.n_items,
           CASE WHEN CAST(k.k AS DECIMAL(38,0)) * r.t_tot - r.r_sq > 0 THEN
             round(CAST((CAST(k.k AS DECIMAL(38,0)) - 1)
                        * (CAST(k.k AS DECIMAL(38,0)) * c.c_sq - r.t_tot * r.t_tot)
                        AS DOUBLE)
                   / CAST(CAST(k.k AS DECIMAL(38,0)) * r.t_tot - r.r_sq AS DOUBLE), 6)
           END AS q
    FROM row_stats r JOIN col_stats c ON c.g = r.g JOIN k_tab k ON k.g = r.g
    """
