"""Data-level table profiling — per-column null count, distinct count and
min/max in ONE aggregate pass (SURVEY.md §2.2 extension surface; the data-
quality screening step every ingestion pipeline runs before training jobs).

Complements `sources/tables.py::footer_stats` (metadata-only COUNT/MIN/MAX
via parquet-footer aggregate pushdown — zero data read, but no null/distinct
info and only for columns with footer statistics): this operator reads the
data once and profiles every requested column in a single wide aggregate.

Scale design: exact multi-column COUNT(DISTINCT) makes Catalyst plan an
Expand (one input row fans out to n_cols rows before the partial
aggregate).  A MIN/MAX whose aggregation buffer is a var-length type
(string/binary columns) disqualifies HashAggregate, which would drag that
entire expanded stream through SortAggregate — measured 2.5× slower at
sf0.1.  So the exact form splits: counts + distincts + fixed-width min/max
ride the hash aggregate over the Expand; string min/max run in a second,
column-pruned aggregate subtree (no Expand, no grouping keys — its
SortAggregate never sorts) and the two 1-row results cross-join back
together in the same job.  At 100 TB screening scale pass ``approx=True``:
HLL++ sketches replace the exact distincts, the Expand disappears, and one
single-scan aggregate profiles everything (the exact form is the default
because the driver's DuckDB oracle hash-checks it)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-form profile: one row per column — (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val).  min/max are computed on the NATIVE type
    (so numeric order, not lexicographic) and cast to string only for the
    uniform long-form schema."""
    cols = cols or df.columns
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    nd = F.approx_count_distinct if approx else F.countDistinct
    types = dict(df.dtypes)
    # string/binary min-max buffers disqualify HashAggregate; in exact mode
    # keep them OUT of the Expand-carrying aggregate (see module docstring)
    var_len = {c for c in cols if not approx and types[c] in ("string", "binary")}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__nd_{c}"),
        ]
        if c not in var_len:
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
            ]
    wide = df.agg(*aggs)
    if var_len:
        str_aggs = []
        for c in var_len:
            str_aggs += [
                F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
            ]
        wide = wide.crossJoin(df.select(*sorted(var_len)).agg(*str_aggs))
    # one wide row -> n_cols long rows: explode an array of per-column
    # structs (no SQL identifier quoting, any column name survives)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_val"),
            F.col(f"__mx_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def profile_columns_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`profile_columns` (exact form): one aggregate
    CTE, UNION ALL per column for the long form."""
    parts = [f"COUNT(*) AS __n"]
    for c in cols:
        parts += [
            f"COUNT({c}) AS __nn_{c}",
            f"COUNT(DISTINCT {c}) AS __nd_{c}",
            f"CAST(MIN({c}) AS VARCHAR) AS __mn_{c}",
            f"CAST(MAX({c}) AS VARCHAR) AS __mx_{c}",
        ]
    rows = [
        f"""SELECT '{c}' AS col_name, __n AS n_rows, __n - __nn_{c} AS n_nulls,
               __nd_{c} AS n_distinct, __mn_{c} AS min_val, __mx_{c} AS max_val
        FROM agg"""
        for c in cols
    ]
    return f"WITH agg AS (SELECT {', '.join(parts)} FROM {table})\n" + "\nUNION ALL\n".join(rows)


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Equal-width histogram over a FIXED [lo, hi) range: (bin, bin_lo,
    n) with out-of-range values clamped into the edge bins — one map-side
    bucket projection + one aggregate (the two-pass min/max+bucket dance is
    for when you don't know the domain; fixing it keeps this a single
    shuffle and makes the bucket arithmetic an identical double expression
    on both engines).  NULLs are dropped."""
    if n_bins <= 0 or not hi > lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)).cast("bigint")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bin", (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"), "n")
    )


def histogram_sql(table: str, col: str, lo: float, hi: float, n_bins: int) -> str:
    """DuckDB twin of :func:`histogram` (identical bucket arithmetic)."""
    width = (hi - lo) / n_bins
    raw = f"CAST(floor((CAST({col} AS DOUBLE) - {lo!r}) / {width!r}) AS BIGINT)"
    b = f"least(greatest({raw}, 0), {n_bins - 1})"
    return f"""
    SELECT bin, {lo!r} + bin * {width!r} AS bin_lo, COUNT(*) AS n
    FROM (SELECT {b} AS bin FROM {table} WHERE {col} IS NOT NULL)
    GROUP BY bin
    """


def histogram_equidepth(
    df: DataFrame, col: str, tie_col: str, n_buckets: int = 10
) -> DataFrame:
    """EQUI-DEPTH histogram: ``n_buckets`` buckets of (near-)equal row count
    with their [lo, hi] value spans — (bucket, lo, hi, n).  The dual of
    :func:`histogram`'s equal-width bins: quantile boundaries adapt to the
    distribution, which is what optimizers store and what skew diagnosis
    reads (a bucket whose span collapses to a point is a heavy hitter).

    Determinism: ntile over (col, tie_col) — the unique tie column makes
    bucket assignment total, so the result is engine-exact.  Cost: one
    global sort (the honest price of exact quantile buckets; the
    approximate screening path is approx_percentile in the profiling
    suite)."""
    x = df.select(F.col(col).cast("double").alias("__v"), F.col(tie_col)).filter(
        F.col("__v").isNotNull()
    )
    w = Window.orderBy(F.col("__v"), F.col(tie_col))
    return (
        x.withColumn("bucket", F.ntile(int(n_buckets)).over(w))
        .groupBy("bucket")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def histogram_equidepth_sql(table: str, col: str, tie_col: str, n_buckets: int = 10) -> str:
    """DuckDB twin of :func:`histogram_equidepth` — NTILE has the same
    remainder rule (first buckets take the extra row) in both engines."""
    return f"""
    SELECT bucket, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n
    FROM (
        SELECT CAST({col} AS DOUBLE) AS v,
               NTILE({int(n_buckets)}) OVER (ORDER BY CAST({col} AS DOUBLE), {tie_col}) AS bucket
        FROM {table} WHERE {col} IS NOT NULL)
    GROUP BY bucket
    """
