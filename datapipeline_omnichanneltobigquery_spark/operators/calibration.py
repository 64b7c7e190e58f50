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

    # derive the group field's type from the input: a non-string group
    # (e.g. an int classifier-version id) must round-trip exactly
    group_type = df.schema[group_col].dataType.simpleString()
    schema = (
        f"{group_col} {group_type}, score_lo double, score_hi double, "
        "p_cal double, n_obs long"
    )

    def fit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
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
    so this is a backward as-of lookup on score_lo).  Rows keep their
    identity: a NULL score, or a group with no fitted curve, surfaces as
    p_cal = NULL — never a dropped row.

    Scale shape: the curve collapses to ONE sorted step-array row per
    group (an exchange over the tiny curve table only), and the lookup is
    a per-row array probe after the group-keyed join — no per-row-id
    window, no shuffle of ``scored`` beyond the join itself.  The
    one-row-per-group side SCALES with group count, so no forced
    broadcast hint: AQE sizes the join and broadcasts whenever it
    actually fits (the repo-wide no-force-broadcast discipline)."""
    import pyspark.sql.functions as F

    steps = curve.groupBy(group_col).agg(
        F.sort_array(F.collect_list(F.struct("score_lo", "p_cal"))).alias("__steps")
    )
    joined = scored.join(steps, group_col, "left")
    # index of the last step with score_lo <= score; 0 (below every pool)
    # clamps to the first pool, reproducing the -inf first-interval lower
    # bound without mutating the array
    idx = F.greatest(
        F.size(F.filter("__steps", lambda s: s["score_lo"] <= F.col(score_col))),
        F.lit(1),
    )
    p_cal = F.when(
        F.col("__steps").isNull() | F.col(score_col).isNull(),
        F.lit(None).cast("double"),
    ).otherwise(F.element_at("__steps", idx)["p_cal"])
    return joined.withColumn("p_cal", p_cal).drop("__steps")
