"""Multi-touch attribution beyond positional rules — the Shapley-value
channel credit the omnichannel analytics surface rounds out with
(reference scope: omnichannel_to_bq.py moves channel events to BigQuery
for exactly this kind of marketing analysis; positional rules live in
plans/relational2.py::events_attribution_last_touch/_linear).

Shapley attribution (Shapley 1953; the simplified journey-set form of
Zhao, Mahboobi & Manavoglu, arXiv:1804.05327): the value function
v(S) = number of conversions among journeys whose touched-channel set is
EXACTLY S, and each channel's credit is the Shapley value
φ_c = Σ_{S ⊆ N\{c}} |S|!·(n-|S|-1)!/n! · (v(S ∪ {c}) − v(S)).

Exactness discipline: with n channels the weights are rationals with the
common denominator n!, so φ_c·n! is an EXACT INTEGER — coalition
coefficients are generated compile-time in python, injected into both
engines as a literal table, and the engines only sum integer products;
the single rounded division by n! happens once per channel at the end.
Efficiency check built in: Σ_c φ_c·n! = n!·(v(N) − v(∅)) exactly.

Scale: journeys collapse to a ≤2^n-row v(mask) table in ONE partial
aggregate; everything after is literal-table joins on ≤ n·2^(n-1) rows.
n is bounded by construction (the coalition table is 2^n — callers with
more than ~16 channels need a sampled estimator, raised loudly)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: hard bound: n·2^(n-1) coalition rows stay driver-trivial through 16
MAX_CHANNELS = 16


def _coalitions(n: int) -> list[tuple[int, int, int]]:
    """(channel_bit, subset_mask, coef) rows — coef = |S|!·(n-|S|-1)!
    (the n!-scaled Shapley weight) for every channel c and every subset
    S of the other channels.  Pure python, reproducible inside a SQL
    VALUES list."""
    rows = []
    for c in range(n):
        cbit = 1 << c
        others = [b for b in range(n) if b != c]
        for m in range(1 << (n - 1)):
            smask = sum(1 << others[i] for i in range(n - 1) if m >> i & 1)
            s = bin(smask).count("1")
            rows.append((cbit, smask, math.factorial(s) * math.factorial(n - 1 - s)))
    return rows


def shapley_attribution(
    journeys: DataFrame, mask_col: str, channels: dict[str, int]
) -> DataFrame:
    """Shapley channel credit from converted journeys — (channel,
    phi_scaled, phi, share).

    ``journeys`` has one row per CONVERTED journey with ``mask_col`` =
    the bitmask of channels touched (bit values from ``channels``,
    name → single bit; the empty mask 0 is a valid journey — conversions
    with no prior touch).  ``phi_scaled`` = φ·n! (exact bigint), ``phi``
    = one rounded division, ``share`` = φ / Σφ (NULL when total credit
    is 0 — all conversions touchless)."""
    n = len(channels)
    if n > MAX_CHANNELS:
        raise ValueError(
            f"shapley_attribution: {n} channels would need {n * 2 ** (n - 1)} "
            f"coalition rows (> MAX_CHANNELS={MAX_CHANNELS}); use a sampled estimator"
        )
    bits = sorted(channels.values())
    if bits != [1 << i for i in range(n)]:
        raise ValueError(f"channels must map names to distinct single bits 1,2,4,...: {channels}")
    spark = journeys.sparkSession
    # v is <= 2^n rows but derives from the whole journey pipeline — it
    # feeds TWO coalition lookups and the efficiency total, and without a
    # materialized leaf Catalyst re-executes the corpus aggregate per
    # consumer (the audit read 12x corpus scans before this checkpoint)
    v = journeys.groupBy(F.col(mask_col).alias("mask")).agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    ).localCheckpoint()
    coal = spark.createDataFrame(
        _coalitions(n), "cbit int, smask int, coef long"
    )
    # v is <= 2^n rows; both lookups ride one broadcast each
    scored = (
        coal.join(
            F.broadcast(v.select(F.col("mask").alias("__m1"), F.col("v").alias("v_sc"))),
            F.col("smask") + F.col("cbit") == F.col("__m1"),
            "left",
        )
        .join(
            F.broadcast(v.select(F.col("mask").alias("__m0"), F.col("v").alias("v_s"))),
            F.col("smask") == F.col("__m0"),
            "left",
        )
        .groupBy("cbit")
        .agg(
            F.sum(
                F.col("coef")
                * (F.coalesce(F.col("v_sc"), F.lit(0)) - F.coalesce(F.col("v_s"), F.lit(0)))
            ).cast("bigint").alias("phi_scaled")
        )
        .localCheckpoint()  # n rows; feeds the total AND the final select
    )
    names = spark.createDataFrame(
        sorted(channels.items(), key=lambda kv: kv[1]), "channel string, cbit int"
    )
    tot = scored.agg(F.sum("phi_scaled").cast("bigint").alias("__tot"))
    fact = float(math.factorial(n))
    return (
        scored.join(F.broadcast(names), "cbit")
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "phi_scaled",
            F.round(F.col("phi_scaled").cast("double") / F.lit(fact), 6).alias("phi"),
            F.when(
                F.col("__tot") != 0,
                F.round(
                    F.col("phi_scaled").cast("double") / F.col("__tot").cast("double"), 6
                ),
            ).alias("share"),
        )
    )


def shapley_attribution_sql(
    journeys_sql: str, mask_col: str, channels: dict[str, int]
) -> str:
    """DuckDB twin of :func:`shapley_attribution` — the same literal
    coalition/name tables and integer sums."""
    n = len(channels)
    coal_rows = ", ".join(f"({c}, {s}, {w})" for c, s, w in _coalitions(n))
    name_rows = ", ".join(
        f"('{nm}', {b})" for nm, b in sorted(channels.items(), key=lambda kv: kv[1])
    )
    fact = float(math.factorial(n))
    return f"""
    WITH journeys AS ({journeys_sql}),
    v AS (SELECT {mask_col} AS mask, CAST(COUNT(*) AS BIGINT) AS v
          FROM journeys GROUP BY 1),
    coal(cbit, smask, coef) AS (VALUES {coal_rows}),
    names(channel, cbit) AS (VALUES {name_rows}),
    scored AS (
        SELECT c.cbit,
               CAST(SUM(c.coef * (COALESCE(v1.v, 0) - COALESCE(v0.v, 0))) AS BIGINT)
                 AS phi_scaled
        FROM coal c
        LEFT JOIN v v1 ON v1.mask = c.smask + c.cbit
        LEFT JOIN v v0 ON v0.mask = c.smask
        GROUP BY 1),
    tot AS (SELECT CAST(SUM(phi_scaled) AS BIGINT) AS t FROM scored)
    SELECT n.channel, s.phi_scaled,
           round(CAST(s.phi_scaled AS DOUBLE) / {fact}, 6) AS phi,
           CASE WHEN t.t <> 0 THEN
             round(CAST(s.phi_scaled AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
           END AS share
    FROM scored s JOIN names n ON n.cbit = s.cbit CROSS JOIN tot t
    """
