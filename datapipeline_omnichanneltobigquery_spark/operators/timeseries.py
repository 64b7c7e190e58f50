"""Time-series resampling — regularize an irregular event stream onto a
fixed grid with forward-fill (SURVEY.md §2.2 extension surface; the
hypertable/`time_bucket_gapfill` operation of time-series warehouses).

Semantics: for each key, sample points run from ceil(min_ts) to
floor(max_ts) on ``step_seconds`` boundaries; each point carries the LAST
observed value at-or-before it (forward fill).  Multiple observations on
one (key, ts) collapse deterministically to MAX(value) first.

Scale design:

* all bucket arithmetic is INTEGER microseconds (``unix_micros`` /
  ``epoch_us`` + mod/div) — no floating-point epochs, so Spark and the
  DuckDB oracle bucket identically down to the tick;
* the grid is generated per key from its [min, max] aggregate —
  ``sequence()`` arrays of at most (range/step)+1 entries, exploded
  map-side; no driver-side loop, no cross join against a global calendar;
* the fill is the union+window trick (same discipline as
  operators/temporal.py::asof_join): grid points and observations union
  into one stream, one window per key ordered by (ts, is_grid) forward-
  fills via last_value(ignorenulls) — ONE shuffle on the key, no range
  join, no per-point probe.  At 100 TB the state per task is one window
  frame, and the only data movement is the key-partitioned exchange the
  per-key semantics require.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _obs_and_grid(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_us: int,
    max_points_per_key: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of both resamplers: deduped observations in integer
    microseconds, and the per-key grid — with a span guard.  A single
    pathological key (years of span at a 1 s step) would otherwise
    materialize one ``sequence()`` array of range/step entries in a single
    row before the explode and OOM that task; the guard turns it into a
    diagnosable per-key error naming the key and the point count."""
    m = F.unix_micros(F.col(ts_col))
    obs = (
        df.select(
            F.col(key_col).alias("key"), m.alias("m"), F.col(val_col).alias("value")
        )
        .groupBy("key", "m")
        .agg(F.max("value").alias("value"))
    )
    floor_m = lambda c: c - F.pmod(c, F.lit(step_us))  # noqa: E731
    bounds = (
        obs.groupBy("key")
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .select(
            "key",
            floor_m(F.col("lo") + F.lit(step_us - 1)).alias("t0"),  # ceil
            floor_m(F.col("hi")).alias("t1"),
        )
        .filter(F.col("t1") >= F.col("t0"))
    )
    npts = (F.col("t1") - F.col("t0")) / F.lit(step_us) + 1
    guarded = F.when(
        npts <= F.lit(int(max_points_per_key)), F.sequence("t0", "t1", F.lit(step_us))
    ).otherwise(
        F.raise_error(
            F.format_string(
                "resample grid for key %s spans %s points at step "
                f"{step_us} us (max_points_per_key={int(max_points_per_key)}) "
                "— widen the step or raise the cap",
                F.col("key").cast("string"),
                npts.cast("bigint").cast("string"),
            )
        )
    )
    grid = bounds.select("key", F.explode(guarded).alias("m"))
    return obs, grid


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int,
    max_points_per_key: int = 10_000_000,
) -> DataFrame:
    """(key, sample_ts, value): per-key fixed-step grid, forward-filled.
    sample_ts is a real timestamp on exact step boundaries."""
    step_us = int(step_seconds) * 1_000_000
    obs, grid = _obs_and_grid(df, key_col, ts_col, val_col, step_us, max_points_per_key)
    u = grid.select(
        "key", "m", F.lit(None).cast("double").alias("value"), F.lit(1).alias("is_grid")
    ).unionByName(obs.select("key", "m", "value", F.lit(0).alias("is_grid")))
    w = (
        Window.partitionBy("key")
        .orderBy("m", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("value", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            F.col("key").alias(key_col),
            F.timestamp_micros(F.col("m")).alias("sample_ts"),
            "value",
        )
    )


def resample_ffill_sql(
    table: str, key_col: str, ts_col: str, val_col: str, step_seconds: int
) -> str:
    """DuckDB twin of :func:`resample_ffill` — same integer-microsecond
    bucket arithmetic, same union+window fill."""
    step_us = int(step_seconds) * 1_000_000
    return f"""
    WITH obs AS (
        SELECT {key_col} AS key, epoch_us({ts_col}) AS m, MAX({val_col}) AS value
        FROM {table} GROUP BY 1, 2),
    bounds AS (
        -- floor-mod, not DuckDB's sign-following %: pre-1970 timestamps
        -- have negative epoch-micros, and Spark's pmod is non-negative —
        -- ((x % s) + s) % s buckets identically down to the tick
        SELECT key,
               (MIN(m) + {step_us - 1})
                 - ((((MIN(m) + {step_us - 1}) % {step_us}) + {step_us}) % {step_us}) AS t0,
               MAX(m) - (((MAX(m) % {step_us}) + {step_us}) % {step_us}) AS t1
        FROM obs GROUP BY key),
    grid AS (
        SELECT key, UNNEST(generate_series(t0, t1, {step_us})) AS m
        FROM bounds WHERE t1 >= t0),
    u AS (
        SELECT key, m, NULL::DOUBLE AS value, 1 AS is_grid FROM grid
        UNION ALL
        SELECT key, m, value, 0 AS is_grid FROM obs),
    f AS (
        SELECT key, m, is_grid,
               LAST_VALUE(value IGNORE NULLS) OVER (
                   PARTITION BY key ORDER BY m, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        FROM u)
    SELECT key AS {key_col}, make_timestamp(m) AS sample_ts, value
    FROM f WHERE is_grid = 1
    """


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int,
    max_points_per_key: int = 10_000_000,
) -> DataFrame:
    """Linear-interpolation resampling: like :func:`resample_ffill` but each
    sample point takes pv + (nv - pv) * ((t - pm) / (nm - pm)) between its
    bracketing observations (pv@pm before-or-at t, nv@nm after-or-at t).
    Same union+window shape — one extra descending-frame window carries the
    NEXT observation, still a single key-partitioned shuffle (both windows
    share the exchange and sort).  The arithmetic is ordered identically in
    the SQL twin, so results are bitwise engine-equal."""
    step_us = int(step_seconds) * 1_000_000
    obs, grid = _obs_and_grid(df, key_col, ts_col, val_col, step_us, max_points_per_key)
    u = grid.select(
        "key", "m", F.lit(None).cast("double").alias("value"), F.lit(1).alias("is_grid")
    ).unionByName(obs.select("key", "m", "value", F.lit(0).alias("is_grid")))
    # obs sort BEFORE the grid point on ties (is_grid asc) so a boundary obs
    # is both its own prev and next
    fwd = (
        Window.partitionBy("key")
        .orderBy("m", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("key")
        .orderBy("m", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_m = F.when(F.col("is_grid") == 0, F.col("m"))
    filled = (
        u.withColumn("pv", F.last("value", ignorenulls=True).over(fwd))
        .withColumn("pm", F.last(obs_m, ignorenulls=True).over(fwd))
        .withColumn("nv", F.first("value", ignorenulls=True).over(bwd))
        .withColumn("nm", F.first(obs_m, ignorenulls=True).over(bwd))
        .filter(F.col("is_grid") == 1)
    )
    frac = (F.col("m") - F.col("pm")).cast("double") / (F.col("nm") - F.col("pm")).cast(
        "double"
    )
    # nm is NULL when the last observation falls exactly ON the final grid
    # boundary (the obs row sorts before its grid twin, so the backward
    # frame starting at the grid row never sees it) — degrade to the
    # forward-filled value, which IS that observation
    interp = F.when(
        F.col("nm").isNull() | (F.col("nm") == F.col("pm")), F.col("pv")
    ).otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    return filled.select(
        F.col("key").alias(key_col),
        F.timestamp_micros(F.col("m")).alias("sample_ts"),
        interp.alias("value"),
    )


def resample_interp_sql(
    table: str, key_col: str, ts_col: str, val_col: str, step_seconds: int
) -> str:
    """DuckDB twin of :func:`resample_interp` (identical operation order)."""
    step_us = int(step_seconds) * 1_000_000
    return f"""
    WITH obs AS (
        SELECT {key_col} AS key, epoch_us({ts_col}) AS m, MAX({val_col}) AS value
        FROM {table} GROUP BY 1, 2),
    bounds AS (
        -- floor-mod, not DuckDB's sign-following %: pre-1970 timestamps
        -- have negative epoch-micros, and Spark's pmod is non-negative —
        -- ((x % s) + s) % s buckets identically down to the tick
        SELECT key,
               (MIN(m) + {step_us - 1})
                 - ((((MIN(m) + {step_us - 1}) % {step_us}) + {step_us}) % {step_us}) AS t0,
               MAX(m) - (((MAX(m) % {step_us}) + {step_us}) % {step_us}) AS t1
        FROM obs GROUP BY key),
    grid AS (
        SELECT key, UNNEST(generate_series(t0, t1, {step_us})) AS m
        FROM bounds WHERE t1 >= t0),
    u AS (
        SELECT key, m, NULL::DOUBLE AS value, 1 AS is_grid FROM grid
        UNION ALL
        SELECT key, m, value, 0 AS is_grid FROM obs),
    f AS (
        SELECT key, m, is_grid,
               LAST_VALUE(value IGNORE NULLS) OVER (
                   PARTITION BY key ORDER BY m, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN m END IGNORE NULLS) OVER (
                   PARTITION BY key ORDER BY m, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
               FIRST_VALUE(value IGNORE NULLS) OVER (
                   PARTITION BY key ORDER BY m, is_grid
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN is_grid = 0 THEN m END IGNORE NULLS) OVER (
                   PARTITION BY key ORDER BY m, is_grid
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
        FROM u)
    SELECT key AS {key_col}, make_timestamp(m) AS sample_ts,
           CASE WHEN nm IS NULL OR nm = pm THEN pv
                ELSE pv + (nv - pv) * (CAST(m - pm AS DOUBLE) / CAST(nm - pm AS DOUBLE))
           END AS value
    FROM f WHERE is_grid = 1
    """


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection
# ---------------------------------------------------------------------------


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    window_rows: int = 10,
    min_prev: int = 5,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each observation scored
    against the mean/std of its own TRAILING window (the ``window_rows``
    previous rows per key, current row excluded — scoring a point against
    a window containing itself dampens the very spike being detected).
    Returns (unique, key, zscore, is_anomaly) for rows with at least
    ``min_prev`` history rows and non-zero spread.

    Cross-engine determinism: the value quantizes to integer micro-units
    via FLOOR (truncating vs rounding casts differ between engines; floor
    does not), window sums run over exact integers/decimals (moving-frame
    float summation is engine-dependent — DuckDB uses segment trees, Spark
    re-adds the frame), and mean/var/z are then SINGLE IEEE expressions in
    the same order on both sides — bit-identical.  One shuffle: the (key)
    window's exchange+sort; everything else is map-side."""
    v = F.expr(f"CAST(FLOOR({val_col} * 1000000) AS BIGINT)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, unique_col)
        .rowsBetween(-window_rows, -1)
    )
    base = df.select(
        F.col(unique_col), F.col(key_col), F.col(ts_col), v.alias("__v")
    )
    stats = base.select(
        unique_col,
        key_col,
        "__v",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum("__v").over(w).alias("__s"),
        F.sum(F.expr("CAST(__v AS DECIMAL(19,0)) * __v")).over(w).alias("__sq"),
    )
    n_d = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n_d
    var = F.col("__sq").cast("double") / n_d - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (F.col("__v").cast("double") - mean) / std
    return (
        stats.filter((F.col("__n") >= min_prev) & (std > 0))
        .select(
            unique_col,
            key_col,
            z.alias("zscore"),
            (F.abs(z) > F.lit(z_threshold)).alias("is_anomaly"),
        )
    )


def rolling_zscore_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    window_rows: int = 10,
    min_prev: int = 5,
    z_threshold: float = 2.0,
) -> str:
    """DuckDB twin of :func:`rolling_zscore` — same integer quantization,
    same frame, same single-expression statistics (HUGEINT plays the role
    of Spark's DECIMAL(38,0): both are exact, and equal integers cast to
    equal doubles)."""
    return f"""
    WITH base AS (
        SELECT {unique_col}, {key_col}, {ts_col},
               CAST(FLOOR({val_col} * 1000000) AS BIGINT) AS v
        FROM {table}),
    stats AS (
        SELECT {unique_col}, {key_col}, v,
               COUNT(*) OVER w AS n,
               SUM(v) OVER w AS s,
               SUM(CAST(v AS HUGEINT) * v) OVER w AS sq
        FROM base
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {unique_col}
                     ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING))
    SELECT {unique_col}, {key_col},
           (CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt(GREATEST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS zscore,
           abs((CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt(GREATEST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)))
             > {z_threshold} AS is_anomaly
    FROM stats
    WHERE n >= {min_prev}
      AND sqrt(GREATEST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) > 0
    """


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    n_taps: int = 8,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with DYADIC weights:
    ``ewma_t = Σ_{j<n} 2^{-j}·x_{t-j} / Σ_{j<avail} 2^{-j}`` over the
    trailing ``n_taps`` observations (α = 1/2, truncated) — the smoothing
    pass before thresholding/drift logic.

    Why dyadic: 2^{-j} and their partial sums are EXACT in binary floating
    point, every product halves an exponent without touching the mantissa,
    and both the numerator and the boundary-adjusted normalizer are summed
    in one fixed-order expression — so unlike a textbook α-EWMA (whose
    (1-α)^j powers round) the result is bit-deterministic and engine-exact
    under the hash gate.  Implementation is ``n_taps`` LAGs sharing ONE
    window sort (no self-join, no list aggregation whose order Spark does
    not contract); one key-partitioned shuffle total.

    Returns (uid, key, value, ewma)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(unique_col))
    x = df.select(
        F.col(unique_col).alias("uid"),
        F.col(key_col).alias("key"),
        F.col(val_col).cast("double").alias("value"),
        *[
            F.lag(F.col(val_col).cast("double"), j).over(w).alias(f"__l{j}")
            for j in range(n_taps)
        ],
    )
    num = None
    den = None
    for j in range(n_taps):
        wgt = 2.0 ** (-j)
        term = F.coalesce(F.col(f"__l{j}") * F.lit(wgt), F.lit(0.0))
        norm = F.when(F.col(f"__l{j}").isNotNull(), F.lit(wgt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = norm if den is None else den + norm
    return x.select("uid", "key", "value", (num / den).alias("ewma"))


def ewma_smooth_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    n_taps: int = 8,
) -> str:
    """DuckDB twin of :func:`ewma_smooth` — identical lags, weights, and
    fold order."""
    lags = ",\n               ".join(
        f"LAG(CAST({val_col} AS DOUBLE), {j}) OVER "
        f"(PARTITION BY {key_col} ORDER BY {ts_col}, {unique_col}) AS __l{j}"
        for j in range(n_taps)
    )
    num = " + ".join(
        f"COALESCE(__l{j} * CAST({2.0 ** (-j)!r} AS DOUBLE), 0.0)"
        for j in range(n_taps)
    )
    den = " + ".join(
        f"CASE WHEN __l{j} IS NOT NULL THEN CAST({2.0 ** (-j)!r} AS DOUBLE) ELSE 0.0 END"
        for j in range(n_taps)
    )
    return f"""
    WITH lagged AS (
        SELECT {unique_col} AS uid, {key_col} AS key,
               CAST({val_col} AS DOUBLE) AS value,
               {lags}
        FROM {table}
    )
    SELECT uid, key, value, ({num}) / ({den}) AS ewma FROM lagged
    """


def seasonal_residuals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    z_threshold: float = 3.0,
    min_n: int = 30,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: each observation scored against
    the mean/std of ITS OWN (key, hour-of-day) cell — the periodic
    complement of :func:`rolling_zscore` (trailing windows see a spike
    coming; a seasonal baseline sees Tuesday-3am traffic that is normal at
    3pm).  Returns (unique, key, hr, zscore, is_anomaly) for rows whose
    cell has ≥ ``min_n`` observations and non-zero spread.

    Same determinism rails as rolling_zscore: FLOOR micro-unit
    quantization, exact integer/decimal cell sums, then mean/var/z as one
    fixed IEEE expression.  Scale: one partial-aggregated groupBy to the
    (keys × 24)-cell profile, which AQE broadcasts back onto the stream —
    the data shuffles zero times."""
    v = F.expr(f"CAST(FLOOR({val_col} * 1000000) AS BIGINT)")
    base = df.select(
        F.col(unique_col),
        F.col(key_col),
        F.hour(ts_col).alias("hr"),
        v.alias("__v"),
    )
    prof = base.groupBy(key_col, "hr").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.expr("CAST(__v AS DECIMAL(19,0)) * __v")).alias("__sq"),
    )
    joined = base.join(prof, [key_col, "hr"])
    n_d = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n_d
    var = F.col("__sq").cast("double") / n_d - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (F.col("__v").cast("double") - mean) / std
    return (
        joined.filter((F.col("__n") >= min_n) & (std > 0))
        .filter(F.abs(z) > F.lit(z_threshold))
        .select(unique_col, key_col, "hr", z.alias("zscore"))
    )


def seasonal_residuals_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    z_threshold: float = 3.0,
    min_n: int = 30,
) -> str:
    """DuckDB twin of :func:`seasonal_residuals` — same quantization, same
    cell sums (HUGEINT as the exact accumulator), same expression order."""
    mean = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    std = (
        f"sqrt(GREATEST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - ({mean}) * ({mean}), 0.0))"
    )
    z = f"(CAST(v AS DOUBLE) - {mean}) / {std}"
    return f"""
    WITH base AS (
        SELECT {unique_col}, {key_col}, hour({ts_col}) AS hr,
               CAST(FLOOR({val_col} * 1000000) AS BIGINT) AS v
        FROM {table}),
    prof AS (
        SELECT {key_col}, hr, COUNT(*) AS n, SUM(v) AS s,
               SUM(CAST(v AS HUGEINT) * v) AS sq
        FROM base GROUP BY 1, 2)
    SELECT b.{unique_col}, b.{key_col}, b.hr, {z} AS zscore
    FROM base b JOIN prof USING ({key_col}, hr)
    WHERE n >= {min_n} AND {std} > 0 AND abs({z}) > {z_threshold}
    """


def debounce(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    unique_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Per-key TRAILING-SUPPRESS debouncing: keep an event only when at
    least ``gap_seconds`` passed since the previous ARRIVED event of the
    same key (the standard lag form).  Contract implication: continuous
    chatter with inter-arrival < gap keeps ONLY its first row for as long
    as the chatter lasts — it does NOT re-admit one event per gap_seconds
    (that alternative, gap-since-previous-KEPT, needs a sessionize pass;
    use :func:`~..operators.sampling.rate_cap` when a per-window admit
    budget is what's wanted).  This is the duplicate-click / sensor-
    chatter cleaner: a burst collapses to its first row.  Determinism:
    (ts, unique) total order; integer-microsecond gap arithmetic.
    One (key)-partitioned window — the sessionize shape."""
    w = Window.partitionBy(key_col).orderBy(ts_col, unique_col)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = int(gap_seconds) * 1_000_000
    return (
        df.withColumn("__prev", prev)
        .filter(
            F.col("__prev").isNull()
            | (F.unix_micros(F.col(ts_col)) - F.col("__prev") >= gap_us)
        )
        .drop("__prev")
    )


def debounce_sql(
    table: str,
    key_col: str,
    ts_col: str,
    unique_col: str,
    gap_seconds: int,
    select_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`debounce` — same lag form, same integer gap."""
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
    SELECT {select_cols}
    FROM (
        SELECT *, LAG(epoch_us({ts_col})) OVER (PARTITION BY {key_col}
                      ORDER BY {ts_col}, {unique_col}) AS __prev
        FROM {table}
    )
    WHERE __prev IS NULL OR epoch_us({ts_col}) - __prev >= {gap_us}
    """


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    window_seconds: int,
) -> DataFrame:
    """OHLC time bars: per (key, tumbling window) the Open (value at the
    earliest (ts, unique)), High, Low, Close (value at the latest
    (ts, unique)), event count, and exact total — the candle/bar
    aggregation every time-series warehouse ships, and the standard
    compaction step before charting or trend models.

    Determinism: open/close are single PICKED values (struct-min/max over
    (ts_us, unique, value) — a total order via the unique tie-break, so
    no distributed float summation decides them); high/low are float
    min/max (order-free); the total accumulates in DECIMAL(18,6) and
    casts to double once.  Window bucket = the floored a - pmod(a, w)
    integer idiom shared with rate_cap (pre-1970-safe).

    Scale: ONE partial-aggregated groupBy(key, bucket) — map-side combine
    collapses each partition's bars before the exchange, so the shuffle
    carries ≤ |distinct bars per partition| rows, never the event stream."""
    win_us = int(window_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bucket = us - F.pmod(us, F.lit(win_us))
    tagged = df.select(
        F.col(key_col).alias("key"),
        bucket.alias("win_start"),
        F.struct(
            us.alias("us"), F.col(unique_col).alias("uid"), F.col(val_col).alias("v")
        ).alias("__t"),
        F.col(val_col).alias("v"),
        F.col(val_col).cast("decimal(18,6)").alias("vd"),
    )
    return (
        tagged.groupBy("key", "win_start")
        .agg(
            F.min("__t").alias("__first"),
            F.max("__t").alias("__last"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vd").alias("__total"),
        )
        .select(
            F.col("key").alias(key_col),
            "win_start",
            F.col("__first.v").alias("open"),
            "high",
            "low",
            F.col("__last.v").alias("close"),
            "n_events",
            F.col("__total").cast("double").alias("total_value"),
        )
    )


def ohlc_bars_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    window_seconds: int,
) -> str:
    """DuckDB twin of :func:`ohlc_bars` — same floored integer bucket,
    same (ts_us, unique) total order picking open/close, same DECIMAL
    total."""
    win_us = int(window_seconds) * 1_000_000
    e = f"epoch_us({ts_col})"
    bucket = f"({e} - ((({e} % {win_us}) + {win_us}) % {win_us}))"
    return f"""
    WITH tagged AS (
        SELECT {key_col} AS key, {bucket} AS win_start,
               {e} AS us, {unique_col} AS uid, {val_col} AS v,
               CAST({val_col} AS DECIMAL(18,6)) AS vd
        FROM {table}
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY key, win_start
                                  ORDER BY us, uid) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY key, win_start
                                  ORDER BY us DESC, uid DESC) AS rn_d
        FROM tagged
    )
    SELECT key AS {key_col}, win_start,
           MAX(CASE WHEN rn_a = 1 THEN v END) AS open,
           MAX(v) AS high,
           MIN(v) AS low,
           MAX(CASE WHEN rn_d = 1 THEN v END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(vd) AS DOUBLE) AS total_value
    FROM ranked
    GROUP BY 1, 2
    """


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per key (Page 1954, the
    standard sequential drift detector): the classic recurrences
    ``s+ = max(0, s+ + (x - mu - k))`` / ``s- = min(0, s- + (x - mu + k))``
    flagged when |s| exceeds ``threshold``.  ``slack`` (k) and
    ``threshold`` (h) are in the value's own units.

    DISTRIBUTED-EXACT form: the max(0, ...) recurrence is not a prefix
    sum, but it has the closed form ``s+_i = P_i - min_{j<=i} P_j`` over
    the centered prefix sums P — two stacked windows per key, no
    sequential state.  Exactness discipline: values land in integer
    MICRO-units (``floor(v * 1e6)`` — the established micro-scaling
    idiom), everything is multiplied through by n (the key's row count)
    so the mean never divides, and the prefix sums accumulate in
    DECIMAL(38,0) — order-independent, engine-exact; the threshold
    compare ``P_i - min P > n*h_micro*n?`` stays integer-exact, and only
    the two REPORTED cusum columns divide (one fixed-order double +
    round(6) each).

    Output: (key, unique, ts, value, cusum_pos, cusum_neg, is_change).
    One shuffle on the key; at 100 TB per-key state is a window frame.

    PER-KEY CARDINALITY BOUND (ADVICE r11): the n-scaled steps
    ``n*x_micro - S`` prefix-sum over n rows, so the worst-case
    magnitude grows ~ n^2 * 1e6 * max|v|; DECIMAL(38,0) holds that up
    to roughly n ~ 1e9 rows PER KEY at 100-unit values (n^2*1e8 <
    1e38).  A 100 TB table is fine as long as no single key carries
    more than ~1e9 points; beyond that use :func:`cusum_fixed_ref`,
    whose steps are NOT n-scaled (magnitude ~ n * 1e6 * max|v|, safe to
    n ~ 1e30) — the fixed-reference variant is also the statistically
    standard form when a target mean is known."""
    k_micro = int(round(float(slack) * 1_000_000))
    h_micro = int(round(float(threshold) * 1_000_000))
    xm = F.expr(f"CAST(floor({val_col} * 1000000.0) AS BIGINT)")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(unique_col).alias("uid"),
        F.col(ts_col).alias("ts"),
        F.col(val_col).alias("v"),
        xm.alias("xm"),
    )
    wk = Window.partitionBy("key")
    stats = base.select(
        "key",
        "uid",
        "ts",
        "v",
        "xm",
        F.count(F.lit(1)).over(wk).cast("decimal(18,0)").alias("n"),
        F.sum("xm").over(wk).cast("decimal(28,0)").alias("s"),
    )
    # centered, n-scaled integer step: n*x_micro - S_micro -/+ n*k_micro
    step_pos = (
        F.col("n") * F.col("xm") - F.col("s") - F.col("n") * F.lit(k_micro)
    ).cast("decimal(38,0)")
    step_neg = (
        F.col("n") * F.col("xm") - F.col("s") + F.col("n") * F.lit(k_micro)
    ).cast("decimal(38,0)")
    wo = (
        Window.partitionBy("key")
        .orderBy("ts", "uid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = stats.select(
        "key",
        "uid",
        "ts",
        "v",
        "n",
        F.sum(step_pos).over(wo).cast("decimal(38,0)").alias("p_pos"),
        F.sum(step_neg).over(wo).cast("decimal(38,0)").alias("p_neg"),
    )
    run = pre.select(
        "key",
        "uid",
        "ts",
        "v",
        "n",
        "p_pos",
        "p_neg",
        # clamp with 0: the classic recurrences start from the EMPTY
        # prefix (P_0 = 0), so the running extremum must include it —
        # s+_i = P_i - min(0, min_j P_j), symmetrically for s-
        F.least(F.min("p_pos").over(wo), F.lit(0).cast("decimal(38,0)")).alias("m_pos"),
        F.greatest(F.max("p_neg").over(wo), F.lit(0).cast("decimal(38,0)")).alias("m_neg"),
    )
    nh = (F.col("n") * F.lit(h_micro)).cast("decimal(38,0)")
    return run.select(
        F.col("key").alias(key_col),
        F.col("uid").alias(unique_col),
        "ts",
        F.col("v").alias(val_col),
        F.round(
            (F.col("p_pos") - F.col("m_pos")).cast("double")
            / F.col("n").cast("double")
            / F.lit(1_000_000.0),
            6,
        ).alias("cusum_pos"),
        F.round(
            (F.col("p_neg") - F.col("m_neg")).cast("double")
            / F.col("n").cast("double")
            / F.lit(1_000_000.0),
            6,
        ).alias("cusum_neg"),
        (
            ((F.col("p_pos") - F.col("m_pos")) > nh)
            | ((F.col("p_neg") - F.col("m_neg")) < -nh)
        ).alias("is_change"),
    )


def cusum_changepoints_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> str:
    """DuckDB twin of :func:`cusum_changepoints` — same micro-unit
    integer scaling, same n-scaled DECIMAL prefix sums, same
    running-extremum closed form, same final divisions."""
    k_micro = int(round(float(slack) * 1_000_000))
    h_micro = int(round(float(threshold) * 1_000_000))
    return f"""
    WITH base AS (
        SELECT {key_col} AS key, {unique_col} AS uid, {ts_col} AS ts,
               {val_col} AS v,
               CAST(floor({val_col} * 1000000.0) AS BIGINT) AS xm
        FROM {table}
    ),
    stats AS (
        SELECT *,
               CAST(COUNT(*) OVER (PARTITION BY key) AS DECIMAL(18,0)) AS n,
               CAST(SUM(xm) OVER (PARTITION BY key) AS DECIMAL(28,0)) AS s
        FROM base
    ),
    pre AS (
        SELECT key, uid, ts, v, n,
               CAST(SUM(CAST(n * xm - s - n * {k_micro} AS DECIMAL(38,0)))
                 OVER (PARTITION BY key ORDER BY ts, uid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,0)) AS p_pos,
               CAST(SUM(CAST(n * xm - s + n * {k_micro} AS DECIMAL(38,0)))
                 OVER (PARTITION BY key ORDER BY ts, uid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,0)) AS p_neg
        FROM stats
    ),
    run AS (
        SELECT *,
               -- clamp with 0: the running extremum includes the empty
               -- prefix P_0 = 0 the classic recurrences start from
               LEAST(MIN(p_pos) OVER (PARTITION BY key ORDER BY ts, uid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     CAST(0 AS DECIMAL(38,0))) AS m_pos,
               GREATEST(MAX(p_neg) OVER (PARTITION BY key ORDER BY ts, uid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     CAST(0 AS DECIMAL(38,0))) AS m_neg
        FROM pre
    )
    SELECT key AS {key_col}, uid AS {unique_col}, ts, v AS {val_col},
           round(CAST(p_pos - m_pos AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
             AS cusum_pos,
           round(CAST(p_neg - m_neg AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
             AS cusum_neg,
           (p_pos - m_pos) > CAST(n * {h_micro} AS DECIMAL(38,0))
             OR (p_neg - m_neg) < -CAST(n * {h_micro} AS DECIMAL(38,0))
             AS is_change
    FROM run
    """


def burstiness(
    df: DataFrame, key_col: str, ts_col: str, unique_col: str
) -> DataFrame:
    """Per-key burstiness of the event arrival process (Goh & Barabási
    2008, public measure): B = (sigma - mu) / (sigma + mu) over the
    inter-arrival gaps — B→-1 periodic, B≈0 Poisson, B→+1 bursty.  The
    traffic-shape screen that separates organic users from schedulers and
    scrapers.

    Exactness: gaps are INTEGER microseconds (lag over the (ts, unique)
    total order); n, Σg, Σg² accumulate in BIGINT/DECIMAL, and B's
    sqrt/divisions are one fixed-order double expression rounded to 6.
    Keys with < 3 events (fewer than 2 gaps) are reported with NULL B.
    One shuffle on the key, then one partial-aggregated groupBy."""
    w = Window.partitionBy(key_col).orderBy(ts_col, unique_col)
    us = F.unix_micros(F.col(ts_col))
    gaps = (
        df.select(F.col(key_col).alias("key"), us.alias("us"), F.col(unique_col).alias("uid"))
        .withColumn("__gap", F.col("us") - F.lag("us").over(
            Window.partitionBy("key").orderBy("us", "uid")
        ))
        .filter(F.col("__gap").isNotNull())
    )
    sums = gaps.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("__gap").cast("decimal(24,0)").alias("sg"),
        # (19,0)x(19,0): wide enough that BOTH engines compute the product in
        # 128-bit (DuckDB overflows a same-width DECIMAL(18) multiply on
        # multi-hour microsecond gaps; 19+19 = 38 stays inside both caps)
        F.sum(F.col("__gap").cast("decimal(19,0)") * F.col("__gap").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("sgg"),
    )
    b = F.expr(
        "round((sqrt((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)"
        " - CAST(sg AS DOUBLE) / n_gaps)"
        " / (sqrt((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)"
        " + CAST(sg AS DOUBLE) / n_gaps), 6)"
    )
    return sums.select(
        F.col("key").alias(key_col),
        "n_gaps",
        F.round((F.col("sg").cast("double") / F.col("n_gaps") / 1e6), 6).alias(
            "mean_gap_sec"
        ),
        F.when(F.col("n_gaps") >= 2, b).alias("burstiness"),
    )


def burstiness_sql(table: str, key_col: str, ts_col: str, unique_col: str) -> str:
    """DuckDB twin of :func:`burstiness` — same integer gaps, same exact
    sums, same fixed-order B expression."""
    return f"""
    WITH gaps AS (
        SELECT key, us - LAG(us) OVER (PARTITION BY key ORDER BY us, uid) AS g
        FROM (SELECT {key_col} AS key, epoch_us({ts_col}) AS us,
                     {unique_col} AS uid FROM {table})
    ),
    sums AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(g) AS DECIMAL(24,0)) AS sg,
               CAST(SUM(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sgg
        FROM gaps WHERE g IS NOT NULL GROUP BY key
    )
    SELECT key AS {key_col}, n_gaps,
           round(CAST(sg AS DOUBLE) / n_gaps / 1e6, 6) AS mean_gap_sec,
           CASE WHEN n_gaps >= 2 THEN
             round((sqrt((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)
                    - CAST(sg AS DOUBLE) / n_gaps)
                   / (sqrt((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)
                      + CAST(sg AS DOUBLE) / n_gaps), 6)
           END AS burstiness
    FROM sums
    """


def twap_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    window_seconds: int,
) -> DataFrame:
    """Time-weighted average price/value per (key, tumbling window) — the
    irregular-sampling correction plain AVG gets wrong: a value that held
    for 59 minutes weighs 59× one that held for a minute.  Each
    observation holds until the next observation in the window (the last
    holds to the window end), so
    ``twap = Σ v_i·d_i / (window_end - first_ts)`` over the held
    durations d_i.

    Exactness: durations are integer microseconds (lead over the
    (ts, unique) total order), values land in integer micro-units, the
    Σ v·d products accumulate in DECIMAL(38,0), and one final division
    per bar touches floats (round 6).  One key+bucket shuffle shared by
    the lead window and the aggregate."""
    win_us = int(window_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bucket = us - F.pmod(us, F.lit(win_us))
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(unique_col).alias("uid"),
        us.alias("us"),
        bucket.alias("win_start"),
        F.expr(f"CAST(floor({val_col} * 1000000.0) AS BIGINT)").alias("vm"),
    )
    w = Window.partitionBy("key", "win_start").orderBy("us", "uid")
    seg = base.withColumn(
        "dur",
        F.coalesce(F.lead("us").over(w), F.col("win_start") + F.lit(win_us))
        - F.col("us"),
    )
    return (
        seg.groupBy("key", "win_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.col("vm").cast("decimal(19,0)") * F.col("dur").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("__vd"),
            F.sum("dur").cast("decimal(28,0)").alias("__d"),
        )
        .select(
            F.col("key").alias(key_col),
            "win_start",
            "n_events",
            F.round(
                F.col("__vd").cast("double") / F.col("__d").cast("double") / 1e6, 6
            ).alias("twap"),
        )
    )


def twap_bars_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    window_seconds: int,
) -> str:
    """DuckDB twin of :func:`twap_bars` — same floored bucket, same held
    durations, same DECIMAL products and final division."""
    win_us = int(window_seconds) * 1_000_000
    e = f"epoch_us({ts_col})"
    bucket = f"({e} - ((({e} % {win_us}) + {win_us}) % {win_us}))"
    return f"""
    WITH base AS (
        SELECT {key_col} AS key, {unique_col} AS uid, {e} AS us,
               {bucket} AS win_start,
               CAST(floor({val_col} * 1000000.0) AS BIGINT) AS vm
        FROM {table}
    ),
    seg AS (
        SELECT *,
               COALESCE(LEAD(us) OVER (PARTITION BY key, win_start
                                       ORDER BY us, uid),
                        win_start + {win_us}) - us AS dur
        FROM base
    )
    SELECT key AS {key_col}, win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(CAST(SUM(CAST(vm AS DECIMAL(19,0)) * CAST(dur AS DECIMAL(19,0)))
                           AS DECIMAL(38,0)) AS DOUBLE)
                 / CAST(CAST(SUM(dur) AS DECIMAL(28,0)) AS DOUBLE) / 1e6, 6) AS twap
    FROM seg GROUP BY 1, 2
    """


def cusum_fixed_ref(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    ref: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """CUSUM against a FIXED reference level ``ref`` (the process-control
    form: mu0 is the known target, not the sample mean) — the batch twin
    of :func:`streaming.cusum.streaming_cusum`, and simpler than
    :func:`cusum_changepoints`: steps are plain integers
    ``x_micro - ref_micro -/+ k_micro`` (no n-scaling needed because
    nothing divides), so prefix sums are DECIMAL-exact and the closed
    form ``s+ = P - min(0, running min P)`` applies directly.

    Output: (key, unique, ts, value, cusum_pos, cusum_neg, is_change)
    with the cusum columns in value units (round 6)."""
    ref_micro = int(round(float(ref) * 1_000_000))
    k_micro = int(round(float(slack) * 1_000_000))
    h_micro = int(round(float(threshold) * 1_000_000))
    xm = F.expr(f"CAST(floor({val_col} * 1000000.0) AS BIGINT)")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(unique_col).alias("uid"),
        F.col(ts_col).alias("ts"),
        F.col(val_col).alias("v"),
        xm.alias("xm"),
    )
    wo = (
        Window.partitionBy("key")
        .orderBy("ts", "uid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = base.select(
        "key",
        "uid",
        "ts",
        "v",
        F.sum(
            (F.col("xm") - F.lit(ref_micro) - F.lit(k_micro)).cast("decimal(38,0)")
        ).over(wo).alias("p_pos"),
        F.sum(
            (F.col("xm") - F.lit(ref_micro) + F.lit(k_micro)).cast("decimal(38,0)")
        ).over(wo).alias("p_neg"),
    )
    run = pre.select(
        "key",
        "uid",
        "ts",
        "v",
        "p_pos",
        "p_neg",
        F.least(F.min("p_pos").over(wo), F.lit(0).cast("decimal(38,0)")).alias("m_pos"),
        F.greatest(F.max("p_neg").over(wo), F.lit(0).cast("decimal(38,0)")).alias("m_neg"),
    )
    return run.select(
        F.col("key").alias(key_col),
        F.col("uid").alias(unique_col),
        "ts",
        F.col("v").alias(val_col),
        F.round((F.col("p_pos") - F.col("m_pos")).cast("double") / 1e6, 6).alias(
            "cusum_pos"
        ),
        F.round((F.col("p_neg") - F.col("m_neg")).cast("double") / 1e6, 6).alias(
            "cusum_neg"
        ),
        (
            ((F.col("p_pos") - F.col("m_pos")) > F.lit(h_micro).cast("decimal(38,0)"))
            | ((F.col("p_neg") - F.col("m_neg")) < F.lit(-h_micro).cast("decimal(38,0)"))
        ).alias("is_change"),
    )


def cusum_fixed_ref_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    unique_col: str,
    ref: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> str:
    """DuckDB twin of :func:`cusum_fixed_ref`."""
    ref_micro = int(round(float(ref) * 1_000_000))
    k_micro = int(round(float(slack) * 1_000_000))
    h_micro = int(round(float(threshold) * 1_000_000))
    return f"""
    WITH base AS (
        SELECT {key_col} AS key, {unique_col} AS uid, {ts_col} AS ts,
               {val_col} AS v,
               CAST(floor({val_col} * 1000000.0) AS BIGINT) AS xm
        FROM {table}
    ),
    pre AS (
        SELECT key, uid, ts, v,
               CAST(SUM(CAST(xm - {ref_micro} - {k_micro} AS DECIMAL(38,0)))
                 OVER (PARTITION BY key ORDER BY ts, uid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,0)) AS p_pos,
               CAST(SUM(CAST(xm - {ref_micro} + {k_micro} AS DECIMAL(38,0)))
                 OVER (PARTITION BY key ORDER BY ts, uid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,0)) AS p_neg
        FROM base
    ),
    run AS (
        SELECT *,
               LEAST(MIN(p_pos) OVER (PARTITION BY key ORDER BY ts, uid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     CAST(0 AS DECIMAL(38,0))) AS m_pos,
               GREATEST(MAX(p_neg) OVER (PARTITION BY key ORDER BY ts, uid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     CAST(0 AS DECIMAL(38,0))) AS m_neg
        FROM pre
    )
    SELECT key AS {key_col}, uid AS {unique_col}, ts, v AS {val_col},
           round(CAST(p_pos - m_pos AS DOUBLE) / 1e6, 6) AS cusum_pos,
           round(CAST(p_neg - m_neg AS DOUBLE) / 1e6, 6) AS cusum_neg,
           (p_pos - m_pos) > CAST({h_micro} AS DECIMAL(38,0))
             OR (p_neg - m_neg) < CAST(-{h_micro} AS DECIMAL(38,0)) AS is_change
    FROM run
    """


def km_survival(df: DataFrame, duration_col: str, observed_col: str) -> DataFrame:
    """Kaplan-Meier survival estimate (Kaplan & Meier, JASA 1958 — the
    standard right-censored time-to-event curve: conversion lag, churn,
    time-to-failure): one subject per input row with an integer
    ``duration_col`` and boolean ``observed_col`` (true = the event
    happened at duration; false = censored there).  Returns the KM table
    (duration, n_at_risk, n_events, n_censored, survival) with
    S(t) = Π_{s<=t} (1 - d_s/n_s) over event times.

    Scale shape: ONE partial+final aggregate collapses subjects to
    per-duration (d, c) counts; the KM fold then runs over DISTINCT
    durations only — bounded by the observation horizon (days/hours),
    not by subject count, so the single-partition ordered window over it
    is a deliberate constant-size fold (the bucket-offset window class),
    never a subject sort.

    Determinism: counts are exact integers; each factor is ONE double
    division (n-d)/n, the product is exp(Σ ln factor) in duration order
    (ln/exp agree cross-engine on identical doubles — the module's
    ordered-fold discipline), rounded to 6.  A duration where d = n
    (everyone remaining dies) zeroes the curve exactly from there on —
    pinned via a flag, never ln(0)."""
    obs = F.col(observed_col).cast("int")
    # localCheckpoint: the horizon-bounded (duration, d, c) table feeds
    # BOTH the total aggregate and the fold (>=2-consumer discipline —
    # without it every consumer re-scans the subject table)
    g = df.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(obs).cast("bigint").alias("n_events"),
        (F.count(F.lit(1)) - F.sum(obs)).cast("bigint").alias("n_censored"),
    ).localCheckpoint()
    total = g.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).cast("bigint").alias("__total")
    )
    wo = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    base = g.crossJoin(F.broadcast(total)).select(
        "duration",
        "n_events",
        "n_censored",
        (
            F.col("__total")
            - (
                F.sum(F.col("n_events") + F.col("n_censored")).over(wo)
                - (F.col("n_events") + F.col("n_censored"))
            )
        ).cast("bigint").alias("n_at_risk"),
    )
    lnf = F.when(
        F.col("n_events") == 0, F.lit(0.0)
    ).when(
        F.col("n_events") < F.col("n_at_risk"),
        F.log(
            (F.col("n_at_risk") - F.col("n_events")).cast("double")
            / F.col("n_at_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))  # d = n: excluded from the fold, zeroed by the flag
    zflag = F.max(
        F.when(F.col("n_events") == F.col("n_at_risk"), F.lit(1)).otherwise(F.lit(0))
    ).over(wo)
    return base.select(
        "duration",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.round(
            F.when(zflag == 1, F.lit(0.0)).otherwise(F.exp(F.sum(lnf).over(wo))), 6
        ).alias("survival"),
    )


def km_survival_sql(subjects_sql: str) -> str:
    """DuckDB twin of :func:`km_survival`.  ``subjects_sql`` yields
    (duration BIGINT, observed BOOLEAN) rows; identical counts, fold
    order, and the d = n zero flag."""
    return f"""
    WITH subjects AS ({subjects_sql}),
    g AS (SELECT duration,
                 CAST(SUM(CAST(observed AS INT)) AS BIGINT) AS n_events,
                 CAST(COUNT(*) - SUM(CAST(observed AS INT)) AS BIGINT) AS n_censored
          FROM subjects GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_events + n_censored) AS BIGINT) AS total FROM g),
    base AS (SELECT duration, n_events, n_censored,
                    CAST(total - (SUM(n_events + n_censored)
                          OVER (ORDER BY duration
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - (n_events + n_censored)) AS BIGINT) AS n_at_risk
             FROM g CROSS JOIN tot)
    SELECT duration, n_at_risk, n_events, n_censored,
           round(CASE WHEN MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
                           OVER (ORDER BY duration
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                      THEN 0.0
                      ELSE exp(SUM(CASE WHEN n_events = 0 THEN 0.0
                                        WHEN n_events < n_at_risk
                                        THEN ln(CAST(n_at_risk - n_events AS DOUBLE)
                                                / CAST(n_at_risk AS DOUBLE))
                                        ELSE 0.0 END)
                               OVER (ORDER BY duration
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 END, 6) AS survival
    FROM base
    """


def theilsen_mk(
    df: DataFrame, group_col: str, t_col: str, y_col: str
) -> DataFrame:
    """Theil-Sen robust slope + Mann-Kendall trend test per group over a
    pre-aggregated integer series — the OUTLIER-IMMUNE counterpart of
    [[events_trend_ols]]'s least squares (one wild day moves an OLS
    slope arbitrarily; the pairwise-slope median has a 29.3% breakdown
    point — Theil 1950, Sen JASA 1968; the MK S-statistic with the
    tie-corrected normal approximation — Mann 1945, Kendall 1975).

    Input: (group, t, y) with INTEGER t (e.g. epoch days) and INTEGER y
    (micro-unit daily aggregates), one row per (group, t).  Returns
    (group, n_points, slope_ts, s_stat, var18, z_mk).

    Determinism: every pairwise slope is ONE IEEE division of two
    bigints (identical across engines); the median picks the
    ⌈m/2⌉-th / (m div 2 + 1)-th order statistics by VALUE and averages
    them (one fixed two-operand float op — equal values when m is odd).
    S and the tie-corrected 18·Var(S) numerator are exact bigints; z is
    one sqrt + one division, NULL when Var = 0 (a constant series has no
    testable trend — surfaced, never 0 disguised as "no trend").

    Scale contract: pairs are C(n_points, 2) per group — the operator
    REQUIRES the caller to pre-aggregate to a bounded horizon (daily
    sums over two years = ≤ 731 points → ≤ 267k pairs per group; raw
    events would explode quadratically).  The pair join and both
    windows shuffle on the group key only; the median window sorts
    pair rows per group — bounded by the same contract."""
    g, t, y = group_col, t_col, y_col
    # the series is horizon-bounded by contract and feeds FOUR consumers
    # (both pair sides, n_points, ties); pairs feed two (stats, median) —
    # localCheckpoint both or Catalyst re-runs the upstream aggregate per
    # consumer (the audit read 8x corpus scans before these)
    ser = df.localCheckpoint()
    a = ser.select(F.col(g).alias("__g"), F.col(t).alias("ti"), F.col(y).alias("yi"))
    b = ser.select(F.col(g).alias("__g"), F.col(t).alias("tj"), F.col(y).alias("yj"))
    pairs = (
        a.join(b, "__g")
        .filter(F.col("ti") < F.col("tj"))
        .select(
            "__g",
            "ti",
            "tj",
            (
                (F.col("yj") - F.col("yi")).cast("double")
                / (F.col("tj") - F.col("ti")).cast("double")
            ).alias("slope"),
            F.signum((F.col("yj") - F.col("yi")).cast("double")).cast("int").alias("sgn"),
        )
        .localCheckpoint()
    )
    stats = pairs.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("sgn").cast("bigint").alias("s_stat"),
    )
    w = Window.partitionBy("__g").orderBy("slope", "ti", "tj")
    med = (
        pairs.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(stats), "__g")
        .filter(F.expr("rn = (m + 1) div 2 OR rn = m div 2 + 1"))
        .groupBy("__g")
        .agg(F.avg("slope").alias("__med"))
    )
    n_pts = ser.groupBy(F.col(g).alias("__g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    ties = (
        ser.groupBy(F.col(g).alias("__g"), F.col(y).alias("__y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("tcnt"))
        .groupBy("__g")
        .agg(
            F.sum(
                F.col("tcnt") * (F.col("tcnt") - 1) * (2 * F.col("tcnt") + 5)
            ).cast("bigint").alias("tie18")
        )
    )
    out = (
        stats.join(med, "__g")
        .join(F.broadcast(n_pts), "__g")
        .join(F.broadcast(ties), "__g")
        .withColumn(
            "var18",
            (
                F.col("n_points") * (F.col("n_points") - 1) * (2 * F.col("n_points") + 5)
                - F.col("tie18")
            ).cast("bigint"),
        )
    )
    z = F.when(
        F.col("var18") > 0,
        F.round(
            F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
            .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
            .otherwise(F.lit(0))
            .cast("double")
            / F.sqrt(F.col("var18").cast("double") / F.lit(18.0)),
            6,
        ),
    )
    return out.select(
        F.col("__g").alias(g),
        "n_points",
        F.round(F.col("__med"), 6).alias("slope_ts"),
        "s_stat",
        "var18",
        z.alias("z_mk"),
    )


def theilsen_mk_sql(series_sql: str, group_col: str, t_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`theilsen_mk` — identical pair stream, order
    statistics, tie correction, and final float expressions.  The series
    subquery must produce (group, t, y) with one row per (group, t)."""
    return f"""
    WITH series AS ({series_sql}),
    pairs AS (
        SELECT a.{group_col} AS g, a.{t_col} AS ti, b.{t_col} AS tj,
               CAST(b.{y_col} - a.{y_col} AS DOUBLE)
                 / CAST(b.{t_col} - a.{t_col} AS DOUBLE) AS slope,
               CAST(sign(b.{y_col} - a.{y_col}) AS INT) AS sgn
        FROM series a JOIN series b
          ON b.{group_col} = a.{group_col} AND a.{t_col} < b.{t_col}),
    stats AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(sgn) AS BIGINT) AS s_stat
        FROM pairs GROUP BY g),
    med AS (
        SELECT g, AVG(slope) AS med FROM (
            SELECT p.g, p.slope,
                   ROW_NUMBER() OVER (PARTITION BY p.g
                                      ORDER BY p.slope, p.ti, p.tj) AS rn,
                   s.m
            FROM pairs p JOIN stats s ON s.g = p.g)
        WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        GROUP BY g),
    npts AS (
        SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM series GROUP BY 1),
    ties AS (
        SELECT g, CAST(SUM(tcnt * (tcnt - 1) * (2 * tcnt + 5)) AS BIGINT) AS tie18
        FROM (SELECT {group_col} AS g, {y_col} AS y,
                     CAST(COUNT(*) AS BIGINT) AS tcnt
              FROM series GROUP BY 1, 2)
        GROUP BY g)
    SELECT s.g AS {group_col}, n.n_points,
           round(m.med, 6) AS slope_ts,
           s.s_stat,
           CAST(n.n_points * (n.n_points - 1) * (2 * n.n_points + 5) - t.tie18
                AS BIGINT) AS var18,
           CASE WHEN n.n_points * (n.n_points - 1) * (2 * n.n_points + 5) - t.tie18 > 0
                THEN round(
                  CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                            WHEN s.s_stat < 0 THEN s.s_stat + 1
                            ELSE 0 END AS DOUBLE)
                  / sqrt(CAST(n.n_points * (n.n_points - 1) * (2 * n.n_points + 5)
                              - t.tie18 AS DOUBLE) / 18.0), 6)
           END AS z_mk
    FROM stats s
    JOIN med m ON m.g = s.g
    JOIN npts n ON n.g = s.g
    JOIN ties t ON t.g = s.g
    """


def snaive_eval(
    df: DataFrame,
    group_col: str,
    t_col: str,
    y_col: str,
    season: int = 7,
    horizon: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast accuracy per group — MASE and WAPE of the
    ŷ(t) = y(t - season) forecaster over each group's last ``horizon``
    points (Hyndman & Koehler, IJF 2006: MASE is THE scale-free forecast
    metric — error relative to the in-sample seasonal-naive MAE, so
    values > 1 mean "worse than the naive baseline").  The eval gate of
    the forecasting face (resample/EWMA/seasonal/OLS produce forecasts;
    this scores any of them — applied here to the naive baseline itself,
    the number every other model must beat).

    Input: (group, t, y) with INTEGER t and y, one row per (group, t).
    Test = points with t > max(t) - horizon; train = the rest.  Lags
    resolve by t VALUE (self-join on t - season), not row position, so
    gaps drop terms identically on both engines; with horizon <= season
    every test lag lands in train (true out-of-sample).

    Exactness: both MAE ratios reduce to integer cross-products —
    MASE = (Σ_test|e| · n_train) / (n_test · Σ_train|e|), WAPE =
    Σ_test|e| / Σ_test|y| — each ONE rounded division (NULL when the
    denominator is 0: a perfectly-seasonal train or an all-zero test
    has no defined ratio).  Scale: two self-joins + one agg, all keyed
    by (group, t) — no windows, no corpus sort."""
    if horizon > season:
        raise ValueError(
            f"horizon ({horizon}) must be <= season ({season}): longer horizons "
            "would forecast test points from other TEST points' actuals"
        )
    g, t, y = group_col, t_col, y_col
    # the horizon-bounded series feeds three consumers (base, lag, dmax) —
    # localCheckpoint so the upstream aggregate runs once and the per-group
    # dmax broadcast rides a mechanically-bounded LogicalRDD leaf
    base = df.select(
        F.col(g).alias("__g"), F.col(t).alias("t"), F.col(y).alias("y")
    ).localCheckpoint()
    dmax = base.groupBy("__g").agg(F.max("t").alias("tmax"))
    lag = base.select(
        "__g", (F.col("t") + F.lit(int(season))).alias("t"), F.col("y").alias("y_lag")
    )
    joined = (
        base.join(lag, ["__g", "t"])
        .join(F.broadcast(dmax), "__g")
        .withColumn("is_test", F.col("t") > F.col("tmax") - F.lit(int(horizon)))
        .withColumn("ae", F.abs(F.col("y") - F.col("y_lag")).cast("bigint"))
    )
    agg = joined.groupBy("__g").agg(
        F.sum(F.when(~F.col("is_test"), 1).otherwise(0)).cast("bigint").alias("n_train"),
        F.sum(F.when(~F.col("is_test"), F.col("ae")).otherwise(0)).cast("bigint").alias("sae_train"),
        F.sum(F.when(F.col("is_test"), 1).otherwise(0)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("is_test"), F.col("ae")).otherwise(0)).cast("bigint").alias("sae_test"),
        F.sum(F.when(F.col("is_test"), F.abs(F.col("y"))).otherwise(0)).cast("bigint").alias("say_test"),
    )
    return agg.select(
        F.col("__g").alias(g),
        "n_train",
        "n_test",
        "sae_test",
        F.when(
            (F.col("sae_train") > 0) & (F.col("n_test") > 0),
            F.round(
                (F.col("sae_test") * F.col("n_train")).cast("double")
                / (F.col("n_test") * F.col("sae_train")).cast("double"),
                6,
            ),
        ).alias("mase"),
        F.when(
            F.col("say_test") > 0,
            F.round(F.col("sae_test").cast("double") / F.col("say_test").cast("double"), 6),
        ).alias("wape"),
    )


def snaive_eval_sql(
    series_sql: str,
    group_col: str,
    t_col: str,
    y_col: str,
    season: int = 7,
    horizon: int = 7,
) -> str:
    """DuckDB twin of :func:`snaive_eval` — identical value-keyed lag
    join, test cutoff, integer cross-products, and NULL guards."""
    return f"""
    WITH series AS ({series_sql}),
    dmax AS (SELECT {group_col} AS g, MAX({t_col}) AS tmax FROM series GROUP BY 1),
    j AS (
        SELECT b.{group_col} AS g, b.{t_col} AS t,
               b.{t_col} > d.tmax - {int(horizon)} AS is_test,
               CAST(abs(b.{y_col} - l.{y_col}) AS BIGINT) AS ae,
               CAST(abs(b.{y_col}) AS BIGINT) AS ay
        FROM series b
        JOIN series l ON l.{group_col} = b.{group_col}
                     AND l.{t_col} = b.{t_col} - {int(season)}
        JOIN dmax d ON d.g = b.{group_col}),
    agg AS (
        SELECT g,
               CAST(SUM(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN NOT is_test THEN ae ELSE 0 END) AS BIGINT) AS sae_train,
               CAST(SUM(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN is_test THEN ae ELSE 0 END) AS BIGINT) AS sae_test,
               CAST(SUM(CASE WHEN is_test THEN ay ELSE 0 END) AS BIGINT) AS say_test
        FROM j GROUP BY g)
    SELECT g AS {group_col}, n_train, n_test, sae_test,
           CASE WHEN sae_train > 0 AND n_test > 0 THEN
             round(CAST(sae_test * n_train AS DOUBLE)
                   / CAST(n_test * sae_train AS DOUBLE), 6)
           END AS mase,
           CASE WHEN say_test > 0 THEN
             round(CAST(sae_test AS DOUBLE) / CAST(say_test AS DOUBLE), 6)
           END AS wape
    FROM agg
    """


def _holt_weights(train: int, alpha_bps: int, beta_bps: int) -> list[tuple[int, int, int]]:
    """(t, wl_micro, wb_micro) rows: Holt's linear-trend state after
    ``train`` dense points is LINEAR in the observations, so the final
    level/trend are fixed weight vectors over y_1..y_train — computed
    once in python (floats), rounded HALF-UP to micro-units, and injected
    into BOTH engines (the _dcg_weights_micro discipline: no recursion
    executes in either engine)."""
    import math

    a, b = alpha_bps / 10000.0, beta_bps / 10000.0
    wl = [[0.0] * train for _ in range(2)]  # wl[0] = level, wl[1] = trend weights
    lvl = [0.0] * train
    trd = [0.0] * train
    lvl[0] = 1.0  # l_1 = y_1
    trd[0], trd[1] = -1.0, 1.0  # b_1 = y_2 - y_1
    for t in range(1, train):
        prev_l, prev_t = lvl[:], trd[:]
        for i in range(train):
            lvl[i] = (1 - a) * (prev_l[i] + prev_t[i])
            trd[i] = (1 - b) * prev_t[i]
        lvl[t] += a
        for i in range(train):
            trd[i] += b * (lvl[i] - prev_l[i])
    return [
        (t + 1, math.floor(lvl[t] * 1e6 + 0.5), math.floor(trd[t] * 1e6 + 0.5))
        for t in range(train)
    ]


def holt_eval(
    df: DataFrame,
    group_col: str,
    t_col: str,
    y_col: str,
    train_days: int = 23,
    horizon: int = 7,
    alpha_bps: int = 3000,
    beta_bps: int = 1000,
) -> DataFrame:
    """Holt's linear-trend forecaster (Holt 1957) evaluated HEAD-TO-HEAD
    against the seasonal-naive baseline over each group's last
    ``horizon`` points — the model-comparison face of the forecast
    family ([[events_forecast_snaive]] scores the baseline; this answers
    "does a trend model actually beat it?").

    Input: (group, t, y) integer series, DENSE over exactly
    train_days + horizon consecutive t per group (Holt's recursion is
    undefined over gaps — violations RAISE with the offending group).

    Exactness: the trained level/trend are linear in the observations,
    so both are exact bigint dot products with compile-time micro-unit
    weight vectors (:func:`_holt_weights` — no recursion executes in
    either engine); forecasts ℓ+h·b stay in micro-units; both error
    sums Σ|y·10⁶ − ŷ_micro| are exact bigints; rel_mae (holt error /
    naive error) is ONE rounded division, NULL when the naive error is
    0.  Returns (group, err_holt_micro, err_naive_micro, rel_mae,
    holt_better).

    Scale: one value-keyed anchor join + two bounded-weight joins; no
    windows; the weight table is train_days rows, broadcast."""
    if horizon > 7:
        raise ValueError(
            "horizon must be <= 7: the naive baseline is lag-7, so a longer "
            "horizon would compare against test-period actuals"
        )
    if train_days < 2:
        raise ValueError(
            f"train_days must be >= 2 (got {train_days}): Holt's initial trend "
            "b_1 = y_2 - y_1 needs two training points"
        )
    for nm, bps in (("alpha_bps", alpha_bps), ("beta_bps", beta_bps)):
        if not 0 <= int(bps) <= 10000:
            raise ValueError(f"{nm} must be in [0, 10000], got {bps}")
    spark = df.sparkSession
    W = train_days + horizon
    g, t, y = group_col, t_col, y_col
    base = df.select(
        F.col(g).alias("__g"), F.col(t).alias("t"), F.col(y).alias("y")
    ).localCheckpoint()  # feeds the anchor agg, the density check, and three joins
    anchor = base.groupBy("__g").agg(
        F.max("t").alias("tmax"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("t").alias("nd"),
        F.min("t").alias("tmin"),
    )
    # the guarded expression IS tmax — a separate unused check column
    # would be PRUNED by the optimizer and the raise would never fire
    checked = anchor.select(
        "__g",
        F.when(
            (F.col("n") == W) & (F.col("nd") == W) & (F.col("tmax") - F.col("tmin") == W - 1),
            F.col("tmax"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("holt_eval: group "),
                    F.col("__g").cast("string"),
                    F.lit(
                        f" is not a dense {W}-point series (train_days={train_days}"
                        f" + horizon={horizon}); Holt's recursion is undefined over gaps"
                    ),
                )
            )
        ).alias("tmax"),
    )
    idx = base.join(F.broadcast(checked), "__g").withColumn(
        "ti", (F.col("t") - F.col("tmax") + F.lit(W)).cast("int")
    )
    wdf = spark.createDataFrame(
        _holt_weights(train_days, alpha_bps, beta_bps), "ti int, wl long, wb long"
    )
    state = (
        idx.join(F.broadcast(wdf), "ti")
        .groupBy("__g")
        .agg(
            F.sum(F.col("y") * F.col("wl")).cast("bigint").alias("lu"),
            F.sum(F.col("y") * F.col("wb")).cast("bigint").alias("bu"),
        )
    )
    test = idx.filter(F.col("ti") > train_days)
    lagged = idx.select(
        "__g", (F.col("ti") + 7).alias("ti"), F.col("y").alias("y_lag7")
    )
    scored = (
        test.join(F.broadcast(state), "__g")
        .join(lagged, ["__g", "ti"])
        .select(
            "__g",
            F.abs(
                F.col("y") * F.lit(1_000_000)
                - (F.col("lu") + (F.col("ti") - train_days) * F.col("bu"))
            ).cast("bigint").alias("eh"),
            (F.abs(F.col("y") - F.col("y_lag7")) * F.lit(1_000_000))
            .cast("bigint")
            .alias("en"),
        )
    )
    agg = scored.groupBy("__g").agg(
        F.sum("eh").cast("bigint").alias("err_holt_micro"),
        F.sum("en").cast("bigint").alias("err_naive_micro"),
    )
    return agg.select(
        F.col("__g").alias(g),
        "err_holt_micro",
        "err_naive_micro",
        F.when(
            F.col("err_naive_micro") > 0,
            F.round(
                F.col("err_holt_micro").cast("double")
                / F.col("err_naive_micro").cast("double"),
                6,
            ),
        ).alias("rel_mae"),
        (F.col("err_holt_micro") < F.col("err_naive_micro")).alias("holt_better"),
    )


def holt_eval_sql(
    series_sql: str,
    group_col: str,
    t_col: str,
    y_col: str,
    train_days: int = 23,
    horizon: int = 7,
    alpha_bps: int = 3000,
    beta_bps: int = 1000,
) -> str:
    """DuckDB twin of :func:`holt_eval` — identical injected weight
    table, density check, micro-unit errors, and final division."""
    if train_days < 2:
        raise ValueError(
            f"train_days must be >= 2 (got {train_days}): Holt's initial trend "
            "b_1 = y_2 - y_1 needs two training points"
        )
    for nm, bps in (("alpha_bps", alpha_bps), ("beta_bps", beta_bps)):
        if not 0 <= int(bps) <= 10000:
            raise ValueError(f"{nm} must be in [0, 10000], got {bps}")
    W = train_days + horizon
    wrows = ", ".join(
        f"({t}, {wl}, {wb})" for t, wl, wb in _holt_weights(train_days, alpha_bps, beta_bps)
    )
    return f"""
    WITH base AS MATERIALIZED (
        SELECT {group_col} AS g, {t_col} AS t, {y_col} AS y FROM ({series_sql})),
    anchor AS (
        -- the guarded CASE IS tmax: an unused check column would be pruned
        SELECT g,
               CASE WHEN COUNT(*) = {W} AND COUNT(DISTINCT t) = {W}
                     AND MAX(t) - MIN(t) = {W - 1} THEN MAX(t)
               ELSE CAST(error('holt_eval: group ' || CAST(g AS VARCHAR)
                     || ' is not a dense {W}-point series') AS BIGINT)
               END AS tmax
        FROM base GROUP BY g),
    idx AS (
        SELECT b.g, CAST(b.t - a.tmax + {W} AS INT) AS ti, b.y
        FROM base b JOIN anchor a ON a.g = b.g),
    w(ti, wl, wb) AS (VALUES {wrows}),
    state AS (
        SELECT g, CAST(SUM(y * wl) AS BIGINT) AS lu,
               CAST(SUM(y * wb) AS BIGINT) AS bu
        FROM idx JOIN w USING (ti) GROUP BY g),
    scored AS (
        SELECT i.g,
               CAST(abs(i.y * 1000000 - (s.lu + (i.ti - {train_days}) * s.bu))
                    AS BIGINT) AS eh,
               CAST(abs(i.y - l.y) * 1000000 AS BIGINT) AS en
        FROM idx i
        JOIN state s ON s.g = i.g
        JOIN idx l ON l.g = i.g AND l.ti = i.ti - 7
        WHERE i.ti > {train_days}),
    agg AS (
        SELECT g, CAST(SUM(eh) AS BIGINT) AS err_holt_micro,
               CAST(SUM(en) AS BIGINT) AS err_naive_micro
        FROM scored GROUP BY g)
    SELECT g AS {group_col}, err_holt_micro, err_naive_micro,
           CASE WHEN err_naive_micro > 0 THEN
             round(CAST(err_holt_micro AS DOUBLE) / CAST(err_naive_micro AS DOUBLE), 6)
           END AS rel_mae,
           err_holt_micro < err_naive_micro AS holt_better
    FROM agg
    """


def acf_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    max_lag: int = 12,
    step_seconds: int = 3600,
    max_points_per_key: int = 100_000,
) -> DataFrame:
    """Sample autocorrelation function of the per-bucket EVENT-COUNT
    series per key, lags 1..``max_lag`` (Box & Jenkins; the standard
    r_k with the full-series mean and variance) — the seasonality/
    memory fingerprint beside the trend (theilsen) and changepoint
    (cusum) screens: a daily cycle shows as a peak at lag 24 on hourly
    buckets, white noise dies inside ±2/√n.

    Exactness — integer counts end-to-end: with S = Σx, Q = Σx²,
    C_k = Σ x_t·x_{t+k}, H_k/T_k the head/tail partial sums, the
    textbook r_k multiplies through by n² to

        r_k = (n²·C_k − n·S·(H_k + T_k) + (n−k)·S²) / (n²·Q − n·S²)

    — numerator and denominator EXACT DECIMAL(38,0), ONE rounded
    division per (key, lag).  NULL r_k for a constant series (zero
    variance — surfaced); lags with no pairs (k > n−1) don't emit rows.
    Missing buckets inside [min, max] count as ZERO events (they are
    zeros of the count series, not gaps); the dense grid guard raises
    diagnosably past ``max_points_per_key`` (the resample discipline).

    Returns (key, lag, n, r).  Scale: the corpus collapses to
    per-(key, bucket) counts in one exchange (n ≤ points-per-key rows);
    the lag self-join fans out n·max_lag SERIES rows (not corpus rows),
    partitioned by key."""
    step_us = int(step_seconds) * 1_000_000
    m = F.unix_micros(F.col(ts_col))
    obs = (
        df.select(F.col(key_col).alias("key"), m.alias("m"))
        .groupBy("key", (F.col("m") - F.pmod(F.col("m"), F.lit(step_us))).alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # t1 >= t0 is the _obs_and_grid NULL-proofing (an all-NULL-ts key has
    # NULL bounds: the filter OMITS it, matching the SQL twin's empty
    # generate_series, instead of firing the grid guard with a misleading
    # "spans null points" error).  Bounds need no ceil/floor rounding here
    # because b is already bucket-floored.
    bounds = obs.groupBy("key").agg(
        F.min("b").alias("t0"), F.max("b").alias("t1")
    ).filter(F.col("t1") >= F.col("t0"))
    npts = (F.col("t1") - F.col("t0")) / F.lit(step_us) + 1
    guarded = F.when(
        npts <= F.lit(int(max_points_per_key)),
        F.sequence("t0", "t1", F.lit(step_us)),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "acf grid for key %s spans %s points at step "
                f"{step_us} us (max_points_per_key={int(max_points_per_key)}) "
                "— widen the step or raise the cap",
                F.col("key").cast("string"),
                npts.cast("bigint").cast("string"),
            )
        )
    )
    grid = bounds.select("key", F.explode(guarded).alias("b"))
    series = (
        grid.join(obs, ["key", "b"], "left")
        .select(
            "key",
            F.expr(f"(b - MIN(b) OVER (PARTITION BY key)) div {step_us}").alias("t"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("x"),
        )
        .localCheckpoint()  # feeds the moment stats AND both lag-join sides
    )
    d38 = "decimal(38,0)"
    stats = series.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("s"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).cast(d38).alias("q"),
    )
    a, b = series.alias("a"), series.alias("b")
    lagged = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("b.t") > F.col("a.t"))
            & (F.col("b.t") <= F.col("a.t") + F.lit(int(max_lag))),
        )
        .select(
            F.col("a.key").alias("key"),
            (F.col("b.t") - F.col("a.t")).cast("bigint").alias("lag"),
            F.col("a.x").alias("xh"),
            F.col("b.x").alias("xt"),
        )
        .groupBy("key", "lag")
        .agg(
            F.sum(F.col("xh").cast(d38) * F.col("xt").cast(d38)).cast(d38).alias("ck"),
            F.sum(F.col("xh").cast(d38)).cast(d38).alias("hk"),
            F.sum(F.col("xt").cast(d38)).cast(d38).alias("tk"),
        )
    )
    nd = F.col("n").cast(d38)
    num = (
        nd * nd * F.col("ck")
        - nd * F.col("s") * (F.col("hk") + F.col("tk"))
        + (nd - F.col("lag").cast(d38)) * F.col("s") * F.col("s")
    )
    den = nd * nd * F.col("q") - nd * F.col("s") * F.col("s")
    return lagged.join(stats, "key").select(
        F.col("key").alias(key_col),
        "lag",
        "n",
        F.when(
            den > F.lit(0).cast("decimal(38,0)"),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("r"),
    )


def acf_counts_sql(
    table: str,
    key_col: str,
    ts_col: str,
    max_lag: int = 12,
    step_seconds: int = 3600,
) -> str:
    """DuckDB twin of :func:`acf_counts` — identical floor-mod buckets,
    dense zero-filled grid, exact DECIMAL(38,0) moments, one rounded
    division per (key, lag)."""
    step_us = int(step_seconds) * 1_000_000
    return f"""
    WITH obs AS (
        SELECT {key_col} AS key,
               epoch_us({ts_col})
                 - ((((epoch_us({ts_col})) % {step_us}) + {step_us}) % {step_us}) AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM {table} GROUP BY 1, 2),
    bounds AS (SELECT key, MIN(b) AS t0, MAX(b) AS t1 FROM obs GROUP BY 1),
    grid AS (
        SELECT key, UNNEST(generate_series(t0, t1, {step_us})) AS b
        FROM bounds),
    series AS MATERIALIZED (
        SELECT g.key,
               (g.b - MIN(g.b) OVER (PARTITION BY g.key)) // {step_us} AS t,
               CAST(COALESCE(o.c, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN obs o ON o.key = g.key AND o.b = g.b),
    stats AS (
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS s,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS q
        FROM series GROUP BY 1),
    lagged AS (
        SELECT a.key, CAST(b.t - a.t AS BIGINT) AS lag,
               CAST(SUM(CAST(a.x AS DECIMAL(38,0)) * CAST(b.x AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS ck,
               CAST(SUM(CAST(a.x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS hk,
               CAST(SUM(CAST(b.x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tk
        FROM series a JOIN series b
          ON b.key = a.key AND b.t > a.t AND b.t <= a.t + {int(max_lag)}
        GROUP BY 1, 2)
    SELECT l.key AS {key_col}, l.lag, s.n,
           CASE WHEN CAST(s.n AS DECIMAL(38,0)) * CAST(s.n AS DECIMAL(38,0)) * s.q
                     - CAST(s.n AS DECIMAL(38,0)) * s.s * s.s > 0 THEN
             round(CAST(CAST(s.n AS DECIMAL(38,0)) * CAST(s.n AS DECIMAL(38,0)) * l.ck
                        - CAST(s.n AS DECIMAL(38,0)) * s.s * (l.hk + l.tk)
                        + (CAST(s.n AS DECIMAL(38,0)) - CAST(l.lag AS DECIMAL(38,0)))
                          * s.s * s.s AS DOUBLE)
                   / CAST(CAST(s.n AS DECIMAL(38,0)) * CAST(s.n AS DECIMAL(38,0)) * s.q
                          - CAST(s.n AS DECIMAL(38,0)) * s.s * s.s AS DOUBLE), 6)
           END AS r
    FROM lagged l JOIN stats s ON s.key = l.key
    """
