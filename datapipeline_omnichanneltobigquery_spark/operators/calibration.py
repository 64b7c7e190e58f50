"""Isotonic (PAVA) score calibration: turn a ranker/classifier's raw
scores into monotone probability estimates — the calibration step a
training pipeline runs on its quality/toxicity classifier scores before
thresholding them into keep/drop decisions (reliability *bins* are the
diagnostic — textstats.quality_calibrate / the reliability report — this
is the *fix*).

Semantics: classic pool-adjacent-violators over (score, label) pairs —
the unique monotone-nondecreasing fit minimizing squared error.  Scores
tie-collapse first (identical scores must share one calibrated value),
then adjacent pools merge while any pool mean exceeds its successor's.
Output is the step function as (group, score_lo, score_hi, p_cal,
n_obs) intervals; apply with a range lookup or as-of join on score.

Scale shape: calibration is per-GROUP (per domain / per classifier
version) and each group's curve is a sequential fixed point — the
documented ``applyInPandas`` sequential-dependency class (the pack_greedy
contract): groups distribute, the within-group solve is a single Arrow
batch.  A group's state is (distinct scores) rows, NOT the corpus — cap
it upstream by quantile-bucketing scores if a group's distinct-score
count could not fit one executor (the same guard contract as
resample's ``max_points_per_key``).

Determinism: PAVA pool merging is a fixed left-to-right sweep; pool
means are ratios of float sums accumulated in score order — a fixed
sequential order, so repeated runs are bit-identical (no distributed
float summation is involved).

No SQL oracle: the pooled fit is an inherently sequential fixed point
(the BPE/kmeans class) — pinned instead by pytest against a brute-force
reference and the monotonicity/interpolation invariants
(tests/test_profile.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pava(scores, weights, means):
    """Left-to-right pool-adjacent-violators sweep.  Returns parallel
    lists (score_lo, score_hi, weight, mean) per final pool."""
    pools: list[list] = []  # [lo, hi, w, sum]
    for s, w, m in zip(scores, weights, means):
        pools.append([s, s, w, w * m])
        while len(pools) > 1 and pools[-2][3] / pools[-2][2] > pools[-1][3] / pools[-1][2]:
            _, hi2, w2, t2 = pools.pop()
            pools[-1][1] = hi2
            pools[-1][2] += w2
            pools[-1][3] += t2
    return pools


def isotonic_fit(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Fit one isotonic curve per group.  Returns (group, score_lo,
    score_hi, p_cal, n_obs) step intervals, monotone in score."""
    import pandas as pd

    schema = (
        f"{group_col} string, score_lo double, score_hi double, "
        "p_cal double, n_obs long"
    )

    def fit(key, pdf):
        agg = (
            pdf.groupby(score_col, sort=True)[label_col]
            .agg(["sum", "count"])
            .reset_index()
        )
        scores = agg[score_col].to_list()
        weights = agg["count"].to_list()
        means = [s / c for s, c in zip(agg["sum"].to_list(), agg["count"].to_list())]
        pools = _pava(scores, weights, means)
        return pd.DataFrame(
            {
                group_col: [key[0]] * len(pools),
                "score_lo": [p[0] for p in pools],
                "score_hi": [p[1] for p in pools],
                "p_cal": [p[3] / p[2] for p in pools],
                "n_obs": [int(p[2]) for p in pools],
            }
        )

    return (
        df.select(group_col, score_col, label_col)
        .groupBy(group_col)
        .applyInPandas(fit, schema=schema)
    )


def isotonic_apply(
    scored: DataFrame,
    curve: DataFrame,
    group_col: str,
    score_col: str,
) -> DataFrame:
    """Calibrate ``scored`` rows against a fitted curve: each row takes
    the p_cal of the LAST interval whose score_lo <= score (scores below
    every interval clamp to the first pool; the curve is a step function,
    so this is a backward as-of lookup on score_lo).  The curve has
    (pools × groups) rows — small per group but it SCALES with group
    count, so no forced broadcast hint: AQE sizes the join and
    broadcasts whenever the curve actually fits (the repo-wide
    no-force-broadcast-on-scaling-inputs discipline)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    wmin = W.partitionBy(group_col).orderBy("score_lo")
    c = (
        curve.withColumn("__rn", F.row_number().over(wmin))
        .withColumn(
            "score_lo",  # first pool clamps every below-range score
            F.when(F.col("__rn") == 1, F.lit(float("-inf"))).otherwise(
                F.col("score_lo")
            ),
        )
        .select(F.col(group_col), "score_lo", F.col("p_cal").alias("__p"))
    )
    sid = scored.withColumn("__rid", F.monotonically_increasing_id())
    joined = sid.join(c, group_col, "left").filter(
        (F.col("score_lo") <= F.col(score_col)) | (F.col("score_lo").isNull())
    )
    w = W.partitionBy("__rid").orderBy(F.col("score_lo").desc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rid", "score_lo")
        .withColumnRenamed("__p", "p_cal")
    )
