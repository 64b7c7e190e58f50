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


# ---------------------------------------------------------------------------
# Explicit HyperLogLog (cross-engine-exact sketch)
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    """The standard HLL bias constant — computed once in Python and baked
    into BOTH engines' expressions as the same literal."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df, group_col: str, value_col: str, n_buckets: int = 512):
    """The MERGEABLE register state of :func:`hll_explicit`: one row per
    (grp, bucket) with ``m_j`` = max rank observed.  This is the state a
    100 TB pipeline persists per day: ``m`` rows per group regardless of
    data size, and :func:`hll_merge` over any set of days is EXACT — the
    per-register MAX of sketches equals the sketch of the unioned data, so
    daily register tables roll up to any period bit-identically (the
    rollup_ivm discipline applied to sketches)."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long

    rest_bits = 60 - n_buckets.bit_length() + 1  # bits left after bucketing
    h = md5_long(F.col(value_col).cast("string"))
    keyed = (
        df.select(F.col(group_col).alias("grp"), h.alias("__h"))
        .select(
            "grp",
            (F.col("__h") % n_buckets).alias("bucket"),
            # integer div, NOT '/': pyspark '/' is double division, which
            # loses the low bits of a 60-bit hash before truncation
            F.expr(f"__h div {n_buckets}").alias("rest"),
        )
    )
    rho = F.when(
        F.col("rest") == 0, F.lit(rest_bits + 1)
    ).otherwise(F.lit(rest_bits) - F.length(F.expr("bin(rest)")) + 1)
    return keyed.groupBy("grp", "bucket").agg(F.max(rho).alias("m_j"))


def hll_merge(*register_frames):
    """Merge HLL register states (outputs of :func:`hll_registers`, e.g.
    read back from per-day parquet): union + per-(grp, bucket) MAX.  One
    partial-aggregated shuffle over constant-size state — merging a year
    of dailies moves 365·m rows per group, never data."""
    import functools

    import pyspark.sql.functions as F

    u = functools.reduce(lambda a, b: a.unionByName(b), register_frames)
    return u.groupBy("grp", "bucket").agg(F.max("m_j").alias("m_j"))


def hll_estimate(regs, group_col: str, n_buckets: int = 512):
    """Finalize register state into (group, est_distinct) — the estimator
    tail of :func:`hll_explicit` (α bias constant, linear-counting
    small-range correction), usable on fresh or merged registers alike."""
    import pyspark.sql.functions as F

    alpha = _hll_alpha(n_buckets)
    per = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 60 - m_j) AS DECIMAL(38,0))")).alias(
            "s_present"
        ),
    )
    m = F.lit(float(n_buckets))
    v_empty = (F.lit(n_buckets) - F.col("present")).cast("bigint")
    s_total = (
        F.col("s_present")
        + v_empty.cast("decimal(38,0)") * F.lit(1 << 60).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(alpha) * m * m * F.lit(float(1 << 60)) / s_total
    est = F.when(
        (raw <= F.lit(2.5) * m) & (v_empty > 0),
        m * F.log(m / v_empty.cast("double")),
    ).otherwise(raw)
    return per.select(F.col("grp").alias(group_col), est.alias("est_distinct"))


def hll_explicit(
    df, group_col: str, value_col: str, n_buckets: int = 512
):
    """Per-group HyperLogLog distinct estimate built EXPLICITLY — md5
    bucket/rank registers, exact power-of-two register sums — so Spark and
    DuckDB compute the IDENTICAL estimate (native HLL++ sketches differ per
    engine and can only be rows-only checked; this one hash-gates the
    estimate itself, the agg_approx_sketches family's missing rigor).

    Register math with no float accumulation: rank uses bit-length (bin()
    string length — identical on both engines), and Σ 2^{−M_j} scales by
    2^60 into exact DECIMAL integer sums — order-independent across any
    shuffle.  The final estimate (bias constant α baked as a shared
    literal, linear-counting small-range correction) is one IEEE
    expression.  Two partial-aggregated shuffles: (group, bucket) → max
    rank, then (group); register state is m rows per group, constant in
    data size.  Composition of :func:`hll_registers` (the mergeable state)
    and :func:`hll_estimate` (the finalizer) — persist the registers and
    :func:`hll_merge` them for cross-day rollups.

    Flink/Presto ship the same explicit-register construction for their
    approx_distinct; standard estimator per Flajolet et al. '07."""
    return hll_estimate(
        hll_registers(df, group_col, value_col, n_buckets), group_col, n_buckets
    )


def hll_explicit_sql(
    table: str, group_col: str, value_col: str, n_buckets: int = 512
) -> str:
    """DuckDB twin of :func:`hll_explicit` — identical hash, register, and
    estimator algebra."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long_sql

    rest_bits = 60 - n_buckets.bit_length() + 1
    alpha = _hll_alpha(n_buckets)
    h = md5_long_sql(f"CAST({value_col} AS VARCHAR)")
    # every numeric literal is CAST AS DOUBLE: DuckDB parses bare decimal
    # literals as DECIMAL and the products overflow DECIMAL(18)
    a = f"CAST({alpha!r} AS DOUBLE)"
    md = f"CAST({float(n_buckets)!r} AS DOUBLE)"
    p60 = f"CAST({float(1 << 60)!r} AS DOUBLE)"
    s_total = (
        f"CAST(s_present + CAST({n_buckets} - present AS DECIMAL(38,0))"
        f" * CAST({1 << 60} AS DECIMAL(38,0)) AS DOUBLE)"
    )
    raw = f"{a} * {md} * {md} * {p60} / {s_total}"
    return f"""
    WITH keyed AS (
        SELECT {group_col} AS grp,
               ({h}) % {n_buckets} AS bucket,
               CAST(({h}) // {n_buckets} AS BIGINT) AS rest
        FROM {table}),
    regs AS (
        SELECT grp, bucket,
               MAX(CASE WHEN rest = 0 THEN {rest_bits + 1}
                        ELSE {rest_bits} - length(bin(rest)) + 1 END) AS m_j
        FROM keyed GROUP BY 1, 2),
    per AS (
        SELECT grp, COUNT(*) AS present,
               SUM(CAST(CAST(1 AS BIGINT) << (60 - m_j) AS DECIMAL(38,0))) AS s_present
        FROM regs GROUP BY 1)
    SELECT grp AS {group_col},
           CASE WHEN {raw} <= CAST(2.5 AS DOUBLE) * {md}
                 AND {n_buckets} - present > 0
                THEN {md} * ln({md} / CAST({n_buckets} - present AS DOUBLE))
                ELSE {raw}
           END AS est_distinct
    FROM per
    """


def _cms_buckets(col, depth: int, width: int):
    """The depth salted (d, bucket) probes of one value — engine-shared."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long

    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (md5_long(F.concat(F.lit(f"cms{d}:"), col.cast("string"))) % width).alias(
                    "bucket"
                ),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(df, key_col: str, depth: int = 4, width: int = 1024):
    """The MERGEABLE count-min state: (d, bucket, c) counts — depth×width
    rows regardless of key cardinality.  Persist one per day and
    :func:`cms_merge` across days: CMS counts ADD, so the merge is exact
    (identical to sketching the unioned data) — the rollup_ivm discipline
    applied to frequency sketches."""
    import pyspark.sql.functions as F

    pos = df.select(F.explode(_cms_buckets(F.col(key_col), depth, width)).alias("p")).select(
        "p.*"
    )
    return pos.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_merge(*sketches):
    """Merge CMS states (outputs of :func:`cms_sketch`): union + per-
    (d, bucket) SUM.  One shuffle over constant-size state."""
    import functools

    import pyspark.sql.functions as F

    u = functools.reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cms_probe(sketch, keys, key_col: str, depth: int = 4, width: int = 1024):
    """Estimate frequencies for ``keys`` (a one-column frame of distinct
    probe values) against a (possibly merged) sketch: per-key MIN over its
    depth probes — est ≥ truth by construction.

    The join is LEFT with a ``coalesce(c, 0)``: a probe key the sketch has
    never seen hits (d, bucket) cells absent from the state table, and true
    CMS semantics read an absent cell as count 0 — the key must report
    ``est_count = 0``, not vanish from the output or take a MIN over only
    its present depths (which would inflate unseen keys to a collision
    count).  Matters exactly when probing a persisted/merged sketch with
    externally supplied keys."""
    import pyspark.sql.functions as F

    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(_cms_buckets(F.col(key_col), depth, width)).alias("p"),
    ).select("key", "p.*")
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
        .select(F.col("key").alias(key_col), "est_count")
    )


def cms_estimates(
    df, key_col: str, depth: int = 4, width: int = 1024
):
    """Explicit count-min sketch frequency estimates — (key, est_count)
    for every distinct key, with the CMS guarantee est ≥ true count
    (equality whp when width ≫ distinct keys).  The fixed-memory
    frequency complement to :func:`hll_explicit`'s cardinality: the
    sketch table is depth×width rows REGARDLESS of key cardinality, so a
    100 TB stream's heavy hitters cost constant state.

    Same engineering as hll_explicit: md5-salted buckets, integer counts
    only, both engines build the identical sketch — estimates (including
    collision inflation) hash-match the twin.  Two partial-aggregated
    shuffles: (d, bucket) counts, then per-key MIN over its d probes.
    Composition of :func:`cms_sketch` + :func:`cms_probe` — persist the
    sketch and :func:`cms_merge` it for cross-day rollups."""
    return cms_probe(
        cms_sketch(df, key_col, depth, width),
        df.select(key_col).distinct(),
        key_col,
        depth,
        width,
    )


def cms_estimates_sql(table: str, key_col: str, depth: int = 4, width: int = 1024) -> str:
    """DuckDB twin of :func:`cms_estimates` — identical salts, buckets,
    counts and min-probe."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long_sql

    pos_parts = []
    probe_parts = []
    for d in range(depth):
        salted_row = md5_long_sql(f"concat('cms{d}:', CAST({key_col} AS VARCHAR))")
        salted_key = md5_long_sql("concat('cms" + str(d) + ":', CAST(key AS VARCHAR))")
        pos_parts.append(
            f"        SELECT {d} AS d, ({salted_row}) % {width} AS bucket FROM {table}"
        )
        probe_parts.append(
            f"        SELECT key, {d} AS d, ({salted_key}) % {width} AS bucket FROM keys"
        )
    pos_rows = "\n        UNION ALL\n".join(pos_parts)
    probe_rows = "\n        UNION ALL\n".join(probe_parts)
    return f"""
    WITH pos AS (
{pos_rows}
    ),
    sketch AS (SELECT d, bucket, COUNT(*) AS c FROM pos GROUP BY 1, 2),
    keys AS (SELECT DISTINCT {key_col} AS key FROM {table}),
    probes AS (
{probe_rows}
    )
    SELECT p.key AS {key_col}, MIN(s.c) AS est_count
    FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
    GROUP BY 1
    """


def _q_micro(x: float) -> int:
    """A float bound as exact integer micro-units — computed once in
    Python and baked into BOTH engines' expressions as the same literal."""
    return int(round(x * 1_000_000))


def qsketch_registers(
    df, group_col: str, value_col: str, lo: float, hi: float, n_bins: int = 256
):
    """The MERGEABLE quantile-sketch state: an equi-width histogram — one
    row per (grp, bin) with the occupancy count, ≤ ``n_bins`` rows per
    group regardless of data size.  Completes the sketch triad (HLL =
    cardinality, CMS = frequency, this = distribution): persist one per
    day and :func:`qsketch_merge` across days — bin counts ADD, so the
    merge is exact (identical to sketching the unioned data).

    Determinism rails (the hll/cms discipline applied to binning): the
    value is floored to integer MICRO-units (`floor(v*1e6)` — one IEEE
    multiply then floor, bit-identical cross-engine), clamped to
    ``[lo, hi)`` in integers, and binned by pure int64 arithmetic
    ``((vi - lo_i) * n_bins) div (hi_i - lo_i)`` — no float rounding at
    bin boundaries on either engine.  Out-of-range mass lands in the edge
    bins, so a mis-guessed range degrades the tails, never the row count."""
    import pyspark.sql.functions as F

    lo_i, hi_i = _q_micro(lo), _q_micro(hi)
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(
                f"greatest({lo_i}L, least(CAST(floor({value_col} * 1000000.0) AS BIGINT),"
                f" {hi_i - 1}L))"
            ).alias("__vi"),
        )
        .select("grp", F.expr(f"((__vi - {lo_i}) * {n_bins}) div {hi_i - lo_i}").alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def qsketch_merge(*register_frames):
    """Merge quantile-sketch states (outputs of :func:`qsketch_registers`,
    e.g. read back from per-day parquet): union + per-(grp, bin) SUM.
    One partial-aggregated shuffle over constant-size state — a year of
    dailies moves 365·n_bins rows per group, never data."""
    import functools

    import pyspark.sql.functions as F

    u = functools.reduce(lambda a, b: a.unionByName(b), register_frames)
    return u.groupBy("grp", "bin").agg(F.sum("c").alias("c"))


def qsketch_quantiles(
    regs,
    group_col: str,
    quantiles: list,
    lo: float,
    hi: float,
    n_bins: int = 256,
):
    """Finalize (possibly merged) register state into one row per
    (group, quantile): rank selection + within-bin linear interpolation,
    ALL in int64 until one final IEEE division.

    ``quantiles`` is a list of ``(name, num, den)`` rationals (e.g.
    ``("p50", 1, 2)``): the target rank is ``ceil(q·total)`` computed as
    ``(num·total + den - 1) div den`` — exact, so both engines select the
    identical bin; bin edges and the interpolated offset are integer
    expressions over the shared micro-unit constants.  Work: one
    bin-ordered window per group over ≤ n_bins rows + a broadcast of the
    literal quantile spec — never a data scan."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    lo_i, hi_i = _q_micro(lo), _q_micro(hi)
    width_i = hi_i - lo_i
    spark = regs.sparkSession
    spec = F.broadcast(
        spark.createDataFrame(list(quantiles), "quantile string, num long, den long")
    )
    # Two consumers (cumulative window + totals) — materialize the register
    # table once (the redundant-subtree discipline) or each recompiles the
    # full source scan + aggregate; the state is ≤ n_bins rows per group.
    regs = regs.localCheckpoint()
    cum = regs.withColumn(
        "cum", F.sum("c").over(W.partitionBy("grp").orderBy("bin"))
    )
    totals = regs.groupBy("grp").agg(F.sum("c").alias("total"))
    targets = totals.crossJoin(spec).select(
        "grp", "quantile", F.expr("(num * total + den - 1) div den").alias("t")
    )
    hit = cum.join(targets, "grp").filter(
        (F.col("cum") - F.col("c") < F.col("t")) & (F.col("t") <= F.col("cum"))
    )
    return hit.select(
        F.col("grp").alias(group_col),
        "quantile",
        (
            F.expr(
                f"CAST(({lo_i} + (bin * {width_i}) div {n_bins})"
                f" + ((t - (cum - c)) * ((({lo_i} + ((bin + 1) * {width_i}) div {n_bins}))"
                f" - ({lo_i} + (bin * {width_i}) div {n_bins}))) div c AS DOUBLE)"
            )
            / F.lit(1000000.0)
        ).alias("est_value"),
    )


def qsketch_quantiles_direct(
    df, group_col: str, value_col: str, quantiles: list, lo: float, hi: float,
    n_bins: int = 256,
):
    """Build + finalize in one call — the direct (unmerged) estimate."""
    return qsketch_quantiles(
        qsketch_registers(df, group_col, value_col, lo, hi, n_bins),
        group_col, quantiles, lo, hi, n_bins,
    )


def qsketch_quantiles_sql(
    table: str, group_col: str, value_col: str, quantiles: list,
    lo: float, hi: float, n_bins: int = 256,
) -> str:
    """DuckDB twin of :func:`qsketch_quantiles_direct` — identical
    micro-unit clamping, integer binning, rank targets and interpolation
    (`//` is DuckDB's integer division; all operands are BIGINT and
    non-negative, so it agrees with Spark's `div`)."""
    lo_i, hi_i = _q_micro(lo), _q_micro(hi)
    width_i = hi_i - lo_i
    spec_rows = ", ".join(f"('{n}', {num}, {den})" for n, num, den in quantiles)
    left = f"({lo_i} + (bin * {width_i}) // {n_bins})"
    right = f"({lo_i} + ((bin + 1) * {width_i}) // {n_bins})"
    return f"""
    WITH vi AS (
        SELECT {group_col} AS grp,
               GREATEST({lo_i}, LEAST(CAST(floor({value_col} * 1000000.0) AS BIGINT),
                        {hi_i - 1})) AS vic
        FROM {table}
    ),
    regs AS (
        SELECT grp, ((vic - {lo_i}) * {n_bins}) // {width_i} AS bin, COUNT(*) AS c
        FROM vi GROUP BY 1, 2
    ),
    cum AS (
        SELECT grp, bin, c, SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS cum
        FROM regs
    ),
    tot AS (SELECT grp, SUM(c) AS total FROM regs GROUP BY 1),
    spec(quantile, num, den) AS (VALUES {spec_rows}),
    tq AS (
        SELECT grp, quantile, (num * total + den - 1) // den AS t
        FROM tot CROSS JOIN spec
    )
    SELECT cum.grp AS {group_col}, tq.quantile,
           CAST({left} + ((tq.t - (cum.cum - cum.c)) * ({right} - {left})) // cum.c
                AS DOUBLE) / 1000000.0 AS est_value
    FROM cum JOIN tq ON tq.grp = cum.grp
                    AND (cum.cum - cum.c) < tq.t AND tq.t <= cum.cum
    """


def drift_psi(
    df_ref, df_cur, col: str, lo: float, hi: float, n_bins: int = 10
):
    """Population Stability Index between a reference and a current
    snapshot of a numeric column — THE standard drift monitor for feature
    / label distributions between pipeline runs (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted).  Returns one row:
    (psi, n_ref, n_cur).

    Same fixed-domain binning as :func:`histogram` (edge-clamped, so the
    bins partition everything); per-bin shares use Laplace-smoothed
    counts ((c+1)/(n+bins) — an empty bin must not produce ln(0)).  Exact
    integer counts; the PSI sum is an ordered fold over the bin index, so
    the statistic itself is engine-exact.  Two scans (one per snapshot),
    each one partial-aggregated groupBy(bin); the per-bin table is
    n_bins rows — constant."""
    import pyspark.sql.functions as F

    if n_bins <= 0 or not hi > lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    width = (hi - lo) / n_bins

    def binned(d, name):
        raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)).cast("bigint")
        b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
        return (
            d.filter(F.col(col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    r = binned(df_ref, "c_ref")
    c = binned(df_cur, "c_cur")
    bins = df_ref.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    per_bin = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    tot = per_bin.agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    p = (F.col("c_ref").cast("double") + F.lit(1.0)) / (
        F.col("n_ref").cast("double") + F.lit(float(n_bins))
    )
    q = (F.col("c_cur").cast("double") + F.lit(1.0)) / (
        F.col("n_cur").cast("double") + F.lit(float(n_bins))
    )
    term = (p - q) * F.log(p / q)
    contrib = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin", term.alias("t"), "n_ref", "n_cur"
    )
    return contrib.groupBy("n_ref", "n_cur").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("psi")
    ).select("psi", "n_ref", "n_cur")


def drift_psi_sql(
    ref_expr: str, cur_expr: str, col: str, lo: float, hi: float, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`drift_psi` — identical binning, smoothing,
    and bin-ordered summation."""
    width = (hi - lo) / n_bins

    def binned(expr, name):
        raw = f"CAST(floor((CAST({col} AS DOUBLE) - CAST({lo!r} AS DOUBLE)) / CAST({width!r} AS DOUBLE)) AS BIGINT)"
        b = f"least(greatest({raw}, 0), {n_bins - 1})"
        return (
            f"SELECT {b} AS bin, COUNT(*) AS {name} FROM {expr} "
            f"WHERE {col} IS NOT NULL GROUP BY 1"
        )

    return f"""
    WITH r AS ({binned(ref_expr, "c_ref")}),
    c AS ({binned(cur_expr, "c_cur")}),
    bins AS (SELECT UNNEST(range(0, {n_bins})) AS bin),
    per_bin AS (
        SELECT bins.bin, COALESCE(r.c_ref, 0) AS c_ref, COALESCE(c.c_cur, 0) AS c_cur
        FROM bins LEFT JOIN r ON r.bin = bins.bin LEFT JOIN c ON c.bin = bins.bin),
    tot AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM per_bin)
    SELECT SUM(((CAST(c_ref AS DOUBLE) + 1.0) / (CAST(n_ref AS DOUBLE) + CAST({float(n_bins)!r} AS DOUBLE))
               - (CAST(c_cur AS DOUBLE) + 1.0) / (CAST(n_cur AS DOUBLE) + CAST({float(n_bins)!r} AS DOUBLE)))
               * ln(((CAST(c_ref AS DOUBLE) + 1.0) / (CAST(n_ref AS DOUBLE) + CAST({float(n_bins)!r} AS DOUBLE)))
                    / ((CAST(c_cur AS DOUBLE) + 1.0) / (CAST(n_cur AS DOUBLE) + CAST({float(n_bins)!r} AS DOUBLE))))
               ORDER BY bin) AS psi,
           CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur
    FROM per_bin, tot
    GROUP BY n_ref, n_cur
    """


def k_anonymity(df, quasi_cols: list, k: int):
    """k-anonymity audit over a set of quasi-identifier columns: every
    combination's population and whether it meets the anonymity threshold
    (``group_n >= k``).  Rows in under-populated combinations are
    re-identifiable by joining the quasi-identifiers against outside data
    — the standard privacy screen to run BEFORE exporting a dataset
    (Sweeney '02; suppress or generalize the flagged combinations).

    One partial-aggregated groupBy — the output is bounded by the
    quasi-identifier domain product, not the data."""
    import pyspark.sql.functions as F

    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_n"),
        (F.count(F.lit(1)) >= F.lit(int(k))).alias("k_anonymous"),
    )


def k_anonymity_sql(table: str, quasi_cols: list, k: int) -> str:
    """DuckDB twin of :func:`k_anonymity`."""
    cols = ", ".join(quasi_cols)
    return f"""
    SELECT {cols}, COUNT(*) AS group_n, COUNT(*) >= {int(k)} AS k_anonymous
    FROM {table} GROUP BY {cols}
    """


def l_diversity(df, quasi_cols: list, sensitive_col: str, l: int):
    """l-diversity audit: k-anonymity's stronger sibling (Machanavajjhala
    '06) — a quasi-identifier group can be k-anonymous yet leak the
    SENSITIVE attribute outright when every member shares one value
    (homogeneity attack).  Per quasi combination: population, distinct
    sensitive values, and whether it meets the diversity floor
    (``distinct_sensitive >= l``).

    One partial-aggregated groupBy (count_distinct carries a per-group
    distinct-set partial); output bounded by the quasi domain product."""
    import pyspark.sql.functions as F

    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.count_distinct(sensitive_col).alias("distinct_sensitive"),
        (F.count_distinct(sensitive_col) >= F.lit(int(l))).alias("l_diverse"),
    )


def l_diversity_sql(table: str, quasi_cols: list, sensitive_col: str, l: int) -> str:
    """DuckDB twin of :func:`l_diversity`."""
    cols = ", ".join(quasi_cols)
    return f"""
    SELECT {cols}, COUNT(*) AS group_n,
           COUNT(DISTINCT {sensitive_col}) AS distinct_sensitive,
           COUNT(DISTINCT {sensitive_col}) >= {int(l)} AS l_diverse
    FROM {table} GROUP BY {cols}
    """


def fd_violations(df, lhs_cols: list, rhs_col: str):
    """Functional-dependency check: report every LHS combination that maps
    to MORE than one distinct RHS value — the classic consistency screen
    (same customer ⇒ same nation; same SKU ⇒ same brand).  Returns
    (lhs..., n_rows, n_rhs) for violating groups only.

    One partial-aggregated groupBy; output bounded by violating-key
    count, so the report stays small even when the table is not."""
    import pyspark.sql.functions as F

    return (
        df.groupBy(*lhs_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(rhs_col).alias("n_rhs"),
        )
        .filter(F.col("n_rhs") > 1)
    )


def fd_violations_sql(table: str, lhs_cols: list, rhs_col: str) -> str:
    """DuckDB twin of :func:`fd_violations`."""
    cols = ", ".join(lhs_cols)
    return f"""
    SELECT {cols}, COUNT(*) AS n_rows, COUNT(DISTINCT {rhs_col}) AS n_rhs
    FROM {table} GROUP BY {cols}
    HAVING COUNT(DISTINCT {rhs_col}) > 1
    """


def validate_constraints(df, rules: list) -> "DataFrame":
    """Declarative data-contract validation (the Deequ/Great-Expectations
    primitive): evaluate a list of rules in ONE aggregate pass and return
    the long-form report (rule, n_violations, passed).

    Rules are (name, kind, params) tuples:

    - ``("r", "not_null", col)`` — NULLs are violations
    - ``("r", "unique", col)`` — violations = rows beyond the first per value
    - ``("r", "range", (col, lo, hi))`` — non-NULL values outside [lo, hi]
    - ``("r", "in_set", (col, [v, ...]))`` — non-NULL values not in the set
    - ``("r", "expr", sql_bool)`` — rows where the SQL predicate is FALSE

    Everything except ``unique`` is a map-side conditional count riding one
    hash aggregate (no per-rule passes); each ``unique`` adds one
    COUNT(DISTINCT) to the same aggregate (Expand-carried, the
    profile_columns discipline).  At 100 TB this is the pre-load gate run
    on every batch: one scan, a handful of counters."""
    import pyspark.sql.functions as F

    aggs = []
    for name, kind, p in rules:
        if kind == "not_null":
            aggs.append(F.count_if(F.col(p).isNull()).alias(name))
        elif kind == "unique":
            aggs.append(
                (F.count(F.col(p)) - F.countDistinct(F.col(p))).alias(name)
            )
        elif kind == "range":
            col, lo, hi = p
            aggs.append(
                F.count_if(
                    F.col(col).isNotNull()
                    & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))
                ).alias(name)
            )
        elif kind == "in_set":
            col, vals = p
            aggs.append(
                F.count_if(
                    F.col(col).isNotNull() & ~F.col(col).isin(list(vals))
                ).alias(name)
            )
        elif kind == "expr":
            aggs.append(F.count_if(~F.expr(p)).alias(name))
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(name).alias("n_violations"),
            (F.col(name) == 0).alias("passed"),
        )
        for name, _, _ in rules
    ]
    return wide.select(F.explode(F.array(*entries)).alias("r")).select("r.*")


def validate_constraints_sql(table: str, rules: list) -> str:
    """DuckDB twin of :func:`validate_constraints`."""
    parts = []
    for name, kind, p in rules:
        if kind == "not_null":
            parts.append(f"COUNT(*) FILTER (WHERE {p} IS NULL) AS {name}")
        elif kind == "unique":
            parts.append(f"COUNT({p}) - COUNT(DISTINCT {p}) AS {name}")
        elif kind == "range":
            col, lo, hi = p
            parts.append(
                f"COUNT(*) FILTER (WHERE {col} IS NOT NULL AND "
                f"({col} < {lo} OR {col} > {hi})) AS {name}"
            )
        elif kind == "in_set":
            col, vals = p
            lits = ", ".join(
                "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else str(v)
                for v in vals
            )
            parts.append(
                f"COUNT(*) FILTER (WHERE {col} IS NOT NULL AND {col} NOT IN ({lits})) AS {name}"
            )
        elif kind == "expr":
            parts.append(f"COUNT(*) FILTER (WHERE NOT ({p})) AS {name}")
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    rows = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, {name} AS n_violations, {name} = 0 AS passed FROM agg"
        for name, _, _ in rules
    )
    return f"WITH agg AS (SELECT {', '.join(parts)} FROM {table})\n{rows}"


def drift_ks(df_ref, df_cur, col: str, lo: float, hi: float, n_buckets: int = 64):
    """EXACT two-sample Kolmogorov-Smirnov statistic between a reference
    and a current snapshot — the sharpest standard drift test (PSI sees
    binned mass shifts; KS sees the worst-case CDF gap at full
    resolution).

    Exactness without floats: at every distinct observed value,
    ``|ecdf_ref − ecdf_cur| = |cum_ref·n_cur − cum_cur·n_ref| / (n_ref·n_cur)``
    — the numerator is INTEGER, so the max is found in exact arithmetic
    and ONE final division produces d_stat (ties on the max resolve to
    the largest value — a total order both engines share).

    Scale shape — the part worth copying: a naive ECDF is a GLOBAL
    cumulative sum, i.e. a single-partition window sort.  Here the
    cumulative count is a two-level distributed prefix sum: distinct
    values are range-bucketed on the [lo, hi) micro-unit grid
    (``n_buckets`` buckets), per-bucket totals (a ``n_buckets``-row
    frame) take the only global window, and each bucket's interior
    cumulates under ``partitionBy(bucket)`` — fully parallel, no
    single-partition sort over the data.  The DuckDB twin is the
    definitional global-window form, so the hash gate proves the
    decomposition correct.

    NULL contract: a NULL value has no place on a CDF — both engines drop
    NULL rows BEFORE counting (totals and curve alike), so a nullable
    input can't make the decomposed Spark form (whose bucket join would
    silently lose the NULL group while totals kept it) diverge from the
    definitional oracle.

    Output: one row (n_ref, n_cur, d_stat, ks_at)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    lo_i, hi_i = _q_micro(lo), _q_micro(hi)

    def tagged(d, flag):
        return d.select(
            F.col(col).alias("v"), F.lit(flag).alias("is_ref")
        )

    u = (
        tagged(df_ref, 1)
        .unionByName(tagged(df_cur, 0))
        .filter(F.col("v").isNotNull())
    )
    # The distinct-value table feeds three consumers (bucket totals, the
    # interior cumulation join, the n_ref/n_cur totals) — materialize it
    # once or each recompiles from the source scans (the redundant-subtree
    # discipline; it is distinct-values-sized, never the corpus).
    vals = (
        u.groupBy("v")
        .agg(
            F.sum("is_ref").alias("cr"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("cc"),
        )
        .withColumn(
            "b",
            F.expr(
                f"((greatest({lo_i}L, least(CAST(floor(v * 1000000.0) AS BIGINT),"
                f" {hi_i - 1}L)) - {lo_i}) * {n_buckets}) div {hi_i - lo_i}"
            ),
        )
        .localCheckpoint()
    )
    btot = vals.groupBy("b").agg(
        F.sum("cr").alias("bcr"), F.sum("cc").alias("bcc")
    )
    wpre = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    prefix = btot.select(
        "b",
        F.coalesce(F.sum("bcr").over(wpre), F.lit(0)).alias("pr"),
        F.coalesce(F.sum("bcc").over(wpre), F.lit(0)).alias("pc"),
    )
    win = W.partitionBy("b").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = vals.join(F.broadcast(prefix), "b").select(
        "v",
        (F.col("pr") + F.sum("cr").over(win)).alias("cum_r"),
        (F.col("pc") + F.sum("cc").over(win)).alias("cum_c"),
    )
    totals = vals.agg(
        F.sum("cr").alias("n_ref"), F.sum("cc").alias("n_cur")
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "n_ref",
        "n_cur",
        F.abs(
            F.col("cum_r") * F.col("n_cur") - F.col("cum_c") * F.col("n_ref")
        ).alias("dnum"),
        "v",
    )
    best = scored.agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.max(F.struct(F.col("dnum").alias("d"), F.col("v").alias("at"))).alias("m"),
    )
    return best.select(
        "n_ref",
        "n_cur",
        (
            F.col("m")["d"].cast("double")
            / (F.col("n_ref") * F.col("n_cur")).cast("double")
        ).alias("d_stat"),
        F.col("m")["at"].alias("ks_at"),
    )


def drift_ks_sql(ref_sql: str, cur_sql: str, col: str) -> str:
    """DuckDB twin of :func:`drift_ks` — the DEFINITIONAL global-window
    ECDF form (the Spark side's two-level prefix decomposition must
    reproduce it bit-for-bit)."""
    return f"""
    WITH u AS (
        SELECT {col} AS v, 1 AS is_ref FROM {ref_sql} WHERE {col} IS NOT NULL
        UNION ALL
        SELECT {col} AS v, 0 AS is_ref FROM {cur_sql} WHERE {col} IS NOT NULL
    ),
    vals AS (
        SELECT v, SUM(is_ref) AS cr, SUM(1 - is_ref) AS cc
        FROM u GROUP BY v
    ),
    cum AS (
        SELECT v,
               SUM(cr) OVER (ORDER BY v) AS cum_r,
               SUM(cc) OVER (ORDER BY v) AS cum_c
        FROM vals
    ),
    tot AS (SELECT CAST(SUM(is_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur FROM u),
    scored AS (
        SELECT n_ref, n_cur,
               ABS(cum_r * n_cur - cum_c * n_ref) AS dnum, v
        FROM cum CROSS JOIN tot
    )
    SELECT MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
           CAST((MAX(struct_pack(d := dnum, at := v))).d AS DOUBLE)
             / (CAST(MAX(n_ref) AS DOUBLE) * MAX(n_cur)) AS d_stat,
           (MAX(struct_pack(d := dnum, at := v))).at AS ks_at
    FROM scored
    """


# Benford first-digit probabilities log10(1 + 1/d), materialized as Python
# float literals so BOTH engines multiply by the identical IEEE constants
# (never re-deriving the log on either side).
BENFORD_P: tuple[float, ...] = (
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
)


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit over a positive numeric column —
    (digit, n_obs, expected_share, expected_n, chi2_term) for digits 1-9.
    Fabricated or systematically-capped monetary data diverges from the
    log-uniform first-digit law; the chi-square contribution per digit
    localizes WHICH digit carries the divergence (the classic
    forensic-accounting / DQ screen).  Values < 1 are excluded (no
    leading significant digit in the integer part).

    Determinism: digit extraction is integer/string only; the expected
    shares are shared float literals, and the two float expressions per
    digit are single fixed-order formulas rounded to 6 — the MI/
    correlation rounding precedent.  Scale: one partial-aggregated
    9-group aggregate; the digit spine is a 9-row inline frame so absent
    digits report 0 observations instead of vanishing."""
    d = (
        df.filter(F.col(value_col) >= 1)
        .select(
            F.substring(F.floor(F.col(value_col)).cast("bigint").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(BENFORD_P)], "digit int, expected_share double"
    )
    total = d.agg(F.sum("n_obs").cast("bigint").alias("__total"))
    return (
        spine.join(d, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            "expected_share",
            F.expr("round(__total * expected_share, 6)").alias("expected_n"),
            F.expr(
                "round((coalesce(n_obs, 0) - __total * expected_share)"
                " * (coalesce(n_obs, 0) - __total * expected_share)"
                " / (__total * expected_share), 6)"
            ).alias("chi2_term"),
        )
    )


def benford_audit_sql(table: str, value_col: str) -> str:
    """DuckDB twin of :func:`benford_audit` — same literals, same
    fixed-order float expressions."""
    # CAST AS DOUBLE: DuckDB types a bare decimal VALUES literal as DECIMAL,
    # and the downstream (n - total*share)^2 would overflow DECIMAL(38) —
    # the repr digits round-trip to the identical IEEE double Spark uses
    spine = ", ".join(
        f"({i + 1}, CAST({p!r} AS DOUBLE))" for i, p in enumerate(BENFORD_P)
    )
    return f"""
    WITH obs AS (
        SELECT CAST(substr(CAST(CAST(floor({value_col}) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit,
               COUNT(*) AS n_obs
        FROM {table} WHERE {value_col} >= 1
        GROUP BY 1
    ),
    spine(digit, expected_share) AS (VALUES {spine}),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS total FROM obs)
    SELECT s.digit,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           s.expected_share,
           round(t.total * s.expected_share, 6) AS expected_n,
           round((COALESCE(o.n_obs, 0) - t.total * s.expected_share)
                 * (COALESCE(o.n_obs, 0) - t.total * s.expected_share)
                 / (t.total * s.expected_share), 6) AS chi2_term
    FROM spine s LEFT JOIN obs o ON o.digit = s.digit CROSS JOIN tot t
    """


def cms_join_size(
    a, key_a: str, b, key_b: str, depth: int = 4, width: int = 256
):
    """Join-cardinality estimation by count-min INNER PRODUCT (Cormode &
    Muthukrishnan's second classic CMS use beside point queries):
    |A ⋈ B| ≈ min_d Σ_w cmsA[d][w] · cmsB[d][w], an over-estimate whp —
    the cost-based-optimizer primitive that sizes a join from two
    constant-size sketches without touching either table again.

    Returns ONE row: (est_join_size, true_join_size) — the exact size
    rides along (Σ_k cntA(k)·cntB(k), one aggregate each + a key join)
    so the estimate's guarantee (est ≥ true) is visible in the output.
    All integer arithmetic: counts in BIGINT, products accumulated in
    DECIMAL(38,0) (a 100 TB pair of streams can carry 1e12-scale counts
    whose products overflow BIGINT).  Sketch state is depth×width rows
    per side regardless of table size."""
    import pyspark.sql.functions as F

    sa = cms_sketch(a.select(F.col(key_a).alias("k")), "k", depth, width)
    sb = cms_sketch(b.select(F.col(key_b).alias("k")), "k", depth, width)
    prod = (
        sa.alias("x")
        .join(sb.alias("y"), ["d", "bucket"])
        .groupBy("d")
        .agg(
            F.sum(
                F.col("x.c").cast("decimal(19,0)") * F.col("y.c").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("ip")
        )
    )
    # COALESCE(.., 0): an empty input table means MIN aggregates zero rows
    # (NULL) while the exact companion coalesces to 0 — the documented
    # est >= true guarantee must hold on the empty boundary too (ADVICE r11)
    est = prod.agg(
        F.coalesce(F.min("ip").cast("bigint"), F.lit(0).cast("bigint")).alias(
            "est_join_size"
        )
    )
    ca = a.groupBy(F.col(key_a).alias("k")).agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy(F.col(key_b).alias("k")).agg(F.count(F.lit(1)).alias("nb"))
    true = ca.join(cb, "k").agg(
        F.coalesce(
            F.sum(F.col("na").cast("decimal(19,0)") * F.col("nb").cast("decimal(19,0)")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("true_join_size")
    )
    return est.crossJoin(true)


def cms_join_size_sql(
    table_a: str, key_a: str, table_b: str, key_b: str, depth: int = 4, width: int = 256
) -> str:
    """DuckDB twin of :func:`cms_join_size` — identical salts, buckets,
    inner product and exact companion."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long_sql

    def side(table, key):
        parts = []
        for d in range(depth):
            salted = md5_long_sql(f"concat('cms{d}:', CAST({key} AS VARCHAR))")
            parts.append(
                f"SELECT {d} AS d, ({salted}) % {width} AS bucket FROM {table}"
            )
        return "\n        UNION ALL\n        ".join(parts)

    return f"""
    WITH pos_a AS (
        {side(table_a, key_a)}
    ),
    sk_a AS (SELECT d, bucket, COUNT(*) AS c FROM pos_a GROUP BY 1, 2),
    pos_b AS (
        {side(table_b, key_b)}
    ),
    sk_b AS (SELECT d, bucket, COUNT(*) AS c FROM pos_b GROUP BY 1, 2),
    prod AS (
        SELECT x.d,
               CAST(SUM(CAST(x.c AS DECIMAL(19,0)) * CAST(y.c AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS ip
        FROM sk_a x JOIN sk_b y ON y.d = x.d AND y.bucket = x.bucket
        GROUP BY 1
    ),
    est AS (SELECT COALESCE(CAST(MIN(ip) AS BIGINT), 0) AS est_join_size FROM prod),
    ca AS (SELECT {key_a} AS k, COUNT(*) AS na FROM {table_a} GROUP BY 1),
    cb AS (SELECT {key_b} AS k, COUNT(*) AS nb FROM {table_b} GROUP BY 1),
    tru AS (
        SELECT CAST(COALESCE(SUM(CAST(na AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0))), 0)
                    AS BIGINT) AS true_join_size
        FROM ca JOIN cb ON cb.k = ca.k
    )
    SELECT est.est_join_size, tru.true_join_size FROM est CROSS JOIN tru
    """


def hll_overlap(
    df,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    n_buckets: int = 512,
):
    """Audience-overlap estimation by HLL INCLUSION-EXCLUSION — the third
    classic sketch composition beside point queries and the CMS join-size
    inner product: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where the
    union's registers are EXACTLY the per-register max of A's and B's
    (the mergeability property — no third data pass).  The standard
    audience/segment-overlap primitive: both sides sketch independently
    (e.g. on different days or clusters), and any pairwise overlap is
    answerable from constant-size state.

    Returns ONE row: (est_a, est_b, est_union, est_overlap, true_overlap)
    — the exact overlap rides along (one distinct-aggregate) so the
    estimator's error is visible in the output, the cms_join_size
    discipline.  est_overlap is the one fixed-order difference of the
    three engine-exact estimates, rounded to 6.

    Scale: one (grp, bucket) register aggregate over the filtered stream
    + an m-row register merge; the exact companion is one distinct
    aggregate.  Inclusion-exclusion error compounds (±1.04/√m per term),
    so size ``n_buckets`` for the SMALLEST audience, not the union."""
    import pyspark.sql.functions as F

    val = F.col(value_col) if isinstance(value_col, str) else value_col
    ev = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("grp"), val.alias("v")
    )
    regs = hll_registers(ev, "grp", "v", n_buckets).localCheckpoint()
    regs_u = (
        regs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit("__union").alias("grp"), "bucket", "m_j")
    )
    ests = hll_estimate(
        regs.select("grp", "bucket", "m_j").unionByName(regs_u), "grp", n_buckets
    )
    wide = ests.agg(
        F.max(F.when(F.col("grp") == group_a, F.col("est_distinct"))).alias("est_a"),
        F.max(F.when(F.col("grp") == group_b, F.col("est_distinct"))).alias("est_b"),
        F.max(F.when(F.col("grp") == "__union", F.col("est_distinct"))).alias(
            "est_union"
        ),
    )
    both = (
        ev.groupBy("v")
        .agg(F.count_distinct("grp").alias("__ng"))
        .filter(F.col("__ng") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_overlap"))
    )
    return wide.crossJoin(both).select(
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.col("est_a") + F.col("est_b") - F.col("est_union"), 6
        ).alias("est_overlap"),
        "true_overlap",
    )


def hll_overlap_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_buckets: int = 512,
) -> str:
    """DuckDB twin of :func:`hll_overlap` — identical registers, merge,
    estimator algebra, inclusion-exclusion order, and exact companion."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long_sql

    rest_bits = 60 - n_buckets.bit_length() + 1
    alpha = _hll_alpha(n_buckets)
    h = md5_long_sql("CAST(v AS VARCHAR)")
    a = f"CAST({alpha!r} AS DOUBLE)"
    md = f"CAST({float(n_buckets)!r} AS DOUBLE)"
    p60 = f"CAST({float(1 << 60)!r} AS DOUBLE)"
    s_total = (
        f"CAST(s_present + CAST({n_buckets} - present AS DECIMAL(38,0))"
        f" * CAST({1 << 60} AS DECIMAL(38,0)) AS DOUBLE)"
    )
    raw = f"{a} * {md} * {md} * {p60} / {s_total}"
    est = (
        f"CASE WHEN {raw} <= CAST(2.5 AS DOUBLE) * {md} AND {n_buckets} - present > 0 "
        f"THEN {md} * ln({md} / CAST({n_buckets} - present AS DOUBLE)) ELSE {raw} END"
    )
    return f"""
    WITH ev AS (SELECT {group_col} AS grp, {value_col} AS v FROM {table}
                WHERE {group_col} IN ('{group_a}', '{group_b}')),
    keyed AS (SELECT grp, ({h}) % {n_buckets} AS bucket,
                     CAST(({h}) // {n_buckets} AS BIGINT) AS rest
              FROM ev),
    regs AS (SELECT grp, bucket,
                    MAX(CASE WHEN rest = 0 THEN {rest_bits + 1}
                             ELSE {rest_bits} - length(bin(rest)) + 1 END) AS m_j
             FROM keyed GROUP BY 1, 2),
    all_regs AS (SELECT grp, bucket, m_j FROM regs
                 UNION ALL
                 SELECT '__union', bucket, MAX(m_j) FROM regs GROUP BY 2),
    per AS (SELECT grp, COUNT(*) AS present,
                   SUM(CAST(CAST(1 AS BIGINT) << (60 - m_j) AS DECIMAL(38,0))) AS s_present
            FROM all_regs GROUP BY 1),
    ests AS (SELECT grp, {est} AS est_distinct FROM per),
    wide AS (SELECT MAX(CASE WHEN grp = '{group_a}' THEN est_distinct END) AS est_a,
                    MAX(CASE WHEN grp = '{group_b}' THEN est_distinct END) AS est_b,
                    MAX(CASE WHEN grp = '__union' THEN est_distinct END) AS est_union
             FROM ests),
    tru AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_overlap
            FROM (SELECT v FROM ev GROUP BY v HAVING COUNT(DISTINCT grp) = 2))
    SELECT est_a, est_b, est_union,
           round(est_a + est_b - est_union, 6) AS est_overlap,
           true_overlap
    FROM wide CROSS JOIN tru
    """


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (Pearson 1900) + Cramér's V effect size — the DQ screen for
    "are these two dimensions actually related" beside Benford
    (fabrication), FD violations (determinism), and mutual information
    (association in bits; V is the bounded [0,1] effect size reviewers
    expect).  One summary row: (n, r, c, dof, chi2, cramers_v).

    Exactness: cell/marginal counts are exact bigints; each cell's
    (n_ab·N − ra·cb) residual is an exact DECIMAL(38,0) BEFORE its one
    cast to double, so the per-cell term (res² / (N·ra·cb)) is the same
    two IEEE ops on both engines; terms sum in (a, b) ORDER (the bm25
    ordered-fold discipline) over the FULL r×c grid — absent
    combinations contribute their expected mass, not zero.

    NULL categories: rows where either column is NULL are EXCLUDED
    (complete-case analysis — a NULL key would silently miss the
    null-unsafe grid join and corrupt chi2 while escaping r/c) and the
    excluded count is SURFACED as ``n_excluded``.  A constant column
    (r = 1 or c = 1) has dof = 0 — chi2 and V are reported NULL
    (undefined test), never a fabricated 0.

    Scale: one groupBy to the cell table, two marginal aggregates, and
    an r×c grid join — all bounded by the categorical-cardinality
    contract (this is a test for CATEGORICALS; high-cardinality keys
    belong in mutual information / correlation, and a grid past ~100k
    cells is a misuse this raises on)."""
    n_excluded = df.filter(
        F.col(col_a).isNull() | F.col(col_b).isNull()
    ).count()  # bounded 1-row action; surfaced in the output
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .localCheckpoint()  # feeds both marginals AND the grid join
    )
    n_cells = cells.count()  # bounded by contract; the guard below is loud
    if n_cells > 100_000:
        raise ValueError(
            f"chi2_independence: {n_cells} observed cells — this is a test for "
            "bounded categoricals; use mutual information for high-cardinality keys"
        )
    ra = cells.groupBy("a").agg(F.sum("n_ab").cast("bigint").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("n_ab").cast("bigint").alias("cb"))
    tot = cells.agg(
        F.sum("n_ab").cast("bigint").alias("N"),
        F.count_distinct("a").cast("bigint").alias("r"),
        F.count_distinct("b").cast("bigint").alias("c"),
    )
    grid = (
        ra.crossJoin(cb)
        .join(cells, ["a", "b"], "left")
        .withColumn("n_ab", F.coalesce(F.col("n_ab"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "res",
            (
                F.col("n_ab").cast("decimal(19,0)") * F.col("N").cast("decimal(19,0)")
                - F.col("ra").cast("decimal(19,0)") * F.col("cb").cast("decimal(19,0)")
            ).cast("decimal(38,0)"),
        )
        .withColumn(
            "term",
            (F.col("res").cast("double") * F.col("res").cast("double"))
            / (
                F.col("N").cast("double")
                * F.col("ra").cast("double")
                * F.col("cb").cast("double")
            ),
        )
    )
    agg = grid.groupBy("N", "r", "c").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("a", "b", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2_raw")
    )
    defined = (F.col("r") > 1) & (F.col("c") > 1)
    return agg.select(
        F.col("N").alias("n"),
        F.lit(int(n_excluded)).cast("bigint").alias("n_excluded"),
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.when(defined, F.round(F.col("chi2_raw"), 6)).alias("chi2"),
        F.when(
            defined,
            F.round(
                F.sqrt(
                    F.col("chi2_raw")
                    / (F.col("N").cast("double") * (F.least("r", "c") - 1).cast("double"))
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


def chi2_independence_sql(table: str, col_a: str, col_b: str) -> str:
    """DuckDB twin of :func:`chi2_independence` — identical decimal
    residuals, per-cell float ops, and (a, b)-ordered summation."""
    return f"""
    WITH excl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded FROM {table}
                  WHERE {col_a} IS NULL OR {col_b} IS NULL),
    cells AS MATERIALIZED (
        SELECT {col_a} AS a, {col_b} AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM {table}
        WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
        GROUP BY 1, 2),
    ram AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS ra FROM cells GROUP BY 1),
    cbm AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS cb FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS N,
                   CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT b) AS BIGINT) AS c
            FROM cells),
    grid AS (
        SELECT ram.a, cbm.b, COALESCE(cells.n_ab, 0) AS n_ab, ram.ra, cbm.cb,
               tot.N, tot.r, tot.c
        FROM ram CROSS JOIN cbm
        LEFT JOIN cells ON cells.a = ram.a AND cells.b = cbm.b
        CROSS JOIN tot),
    terms AS (
        SELECT a, b, N, r, c,
               CAST(CAST(CAST(n_ab AS DECIMAL(19,0)) * CAST(N AS DECIMAL(19,0))
                         - CAST(ra AS DECIMAL(19,0)) * CAST(cb AS DECIMAL(19,0))
                    AS DECIMAL(38,0)) AS DOUBLE) AS res,
               CAST(N AS DOUBLE) * CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) AS den
        FROM grid)
    SELECT N AS n, excl.n_excluded, r, c,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           CASE WHEN r > 1 AND c > 1
                THEN round(SUM(res * res / den ORDER BY a, b), 6) END AS chi2,
           CASE WHEN r > 1 AND c > 1
                THEN round(sqrt(SUM(res * res / den ORDER BY a, b)
                      / (CAST(N AS DOUBLE) * CAST(LEAST(r, c) - 1 AS DOUBLE))), 6)
           END AS cramers_v
    FROM terms CROSS JOIN excl GROUP BY N, excl.n_excluded, r, c
    """


def quantile_ci(
    df: DataFrame,
    group_col: str,
    value: "Column",
    q_bps: int = 5000,
    z_micro: int = 1_959_964,
) -> DataFrame:
    """Distribution-free confidence interval for a quantile per group by
    ORDER STATISTICS (Conover, Practical Nonparametric Statistics §3.2;
    Thompson 1936): the interval (x₍ₗ₎, x₍ᵤ₎) with
    l = ⌊nq − z√(nq(1−q))⌋ and u = ⌈nq + z√(nq(1−q))⌉ covers the true
    quantile at ~1−α REGARDLESS of the distribution — the UQ companion
    to [[stats_jackknife_ratio]] (that one does ratio METRICS; this does
    quantiles, where the jackknife is inconsistent).

    ``value`` must be integer-valued (cents/micro-units).  Returns
    (group, n, k_lo, k_point, k_hi, q_point, ci_lo, ci_hi) with the
    three order statistics as exact bigints.

    Determinism: n and the ranks are integers; the only floats are
    nq ± z√(nq(1−q)) — fixed-order expressions of (n, q, z) literals,
    identical across engines, floored/ceiled once; ranks clamp to
    [1, n] (a tiny-group CI honestly widens to the min/max).  The point
    rank is ⌈(n+1)·q⌉ in integer basis points (no float ceil — the
    conformal discipline).

    Scale: one groupBy to per-(group, value) counts, one per-group
    prefix window over DISTINCT values (the roc_auc/conformal
    discipline), one broadcast of the per-group rank targets."""
    from pyspark.sql import Window

    base = df.select(F.col(group_col).alias("__g"), value.cast("bigint").alias("v"))
    dist = (
        base.groupBy("__g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # feeds the n-agg AND the prefix selection
    )
    q = q_bps / 10000.0
    zq = z_micro / 1e6
    ks = dist.groupBy("__g").agg(F.sum("c").cast("bigint").alias("n")).select(
        "__g",
        "n",
        F.greatest(
            F.lit(1),
            F.least(
                F.col("n"),
                F.expr(f"CAST(floor(n * {q} - {zq} * sqrt(n * {q} * {1.0 - q})) AS BIGINT)"),
            ),
        ).alias("k_lo"),
        F.greatest(
            F.lit(1),
            F.least(F.col("n"), F.expr(f"((n + 1) * {int(q_bps)} + 9999) div 10000")),
        ).alias("k_point"),
        F.greatest(
            F.lit(1),
            F.least(
                F.col("n"),
                F.expr(f"CAST(ceil(n * {q} + {zq} * sqrt(n * {q} * {1.0 - q})) AS BIGINT)"),
            ),
        ).alias("k_hi"),
    )
    w = Window.partitionBy("__g").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.withColumn("cum", F.sum("c").over(w)).join(F.broadcast(ks), "__g")
    sel = cum.groupBy("__g", "n", "k_lo", "k_point", "k_hi").agg(
        F.min(F.when(F.col("cum") >= F.col("k_lo"), F.col("v"))).alias("ci_lo"),
        F.min(F.when(F.col("cum") >= F.col("k_point"), F.col("v"))).alias("q_point"),
        F.min(F.when(F.col("cum") >= F.col("k_hi"), F.col("v"))).alias("ci_hi"),
    )
    return sel.select(
        F.col("__g").alias(group_col),
        "n",
        "k_lo",
        "k_point",
        "k_hi",
        "q_point",
        "ci_lo",
        "ci_hi",
    )


def quantile_ci_sql(
    table: str,
    group_col: str,
    value_sql: str,
    q_bps: int = 5000,
    z_micro: int = 1_959_964,
) -> str:
    """DuckDB twin of :func:`quantile_ci` — identical rank formulas,
    clamps, and distinct-value prefix selection."""
    q = q_bps / 10000.0
    zq = z_micro / 1e6
    return f"""
    WITH dist AS MATERIALIZED (
        SELECT {group_col} AS g, CAST({value_sql} AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM {table} GROUP BY 1, 2),
    ks AS (
        SELECT g, n,
               GREATEST(1, LEAST(n,
                 CAST(floor(n * {q} - {zq} * sqrt(n * {q} * {1.0 - q})) AS BIGINT)))
                 AS k_lo,
               GREATEST(1, LEAST(n, ((n + 1) * {int(q_bps)} + 9999) // 10000)) AS k_point,
               GREATEST(1, LEAST(n,
                 CAST(ceil(n * {q} + {zq} * sqrt(n * {q} * {1.0 - q})) AS BIGINT)))
                 AS k_hi
        FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM dist GROUP BY g)),
    cum AS (
        SELECT d.g, d.v,
               SUM(d.c) OVER (PARTITION BY d.g ORDER BY d.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               k.n, k.k_lo, k.k_point, k.k_hi
        FROM dist d JOIN ks k ON k.g = d.g)
    SELECT g AS {group_col}, n, k_lo, k_point, k_hi,
           MIN(CASE WHEN cum >= k_point THEN v END) AS q_point,
           MIN(CASE WHEN cum >= k_lo THEN v END) AS ci_lo,
           MIN(CASE WHEN cum >= k_hi THEN v END) AS ci_hi
    FROM cum GROUP BY g, n, k_lo, k_point, k_hi
    """


def winsorize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value: "Column",
    lo_bps: int = 100,
    hi_bps: int = 9900,
) -> DataFrame:
    """Per-group winsorization at EXACT order statistics (Tukey; Dixon
    1960): clip each value to [x₍ₖˡᵒ₎, x₍ₖʰⁱ₎] where the cut ranks are
    k = ⌈(n+1)·p⌉ in integer basis points — the heavy-tail taming step
    feature pipelines run before scaling (clipping beats dropping:
    the row survives, only its leverage is bounded).

    ``value`` must be integer-valued (cents/micro-units — the module
    contract).  Returns one row per input row: (group, id, v, v_wins),
    both exact bigints.

    Determinism: ranks are pure integer arithmetic (the conformal/
    quantile_ci discipline — no float ceil); cut selection is the
    distinct-value prefix min; clipping is LEAST/GREATEST on bigints.
    Scale: one groupBy to per-(group, value) counts, one per-group
    prefix window over DISTINCT values, then a per-group cut table
    (n_groups rows) joined back map-side — the corpus never sorts."""
    from pyspark.sql import Window

    for nm, bps in (("lo_bps", lo_bps), ("hi_bps", hi_bps)):
        if not 0 <= int(bps) <= 10000:
            raise ValueError(f"{nm} must be in [0, 10000], got {bps}")
    if lo_bps >= hi_bps:
        raise ValueError(f"need lo_bps < hi_bps, got ({lo_bps}, {hi_bps})")
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        value.cast("bigint").alias("v"),
    ).localCheckpoint()  # feeds the distinct-value counts AND the clip join
    dist = base.groupBy("__g", "v").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    ks = dist.groupBy("__g").agg(F.sum("c").cast("bigint").alias("n")).select(
        "__g",
        F.greatest(
            F.lit(1),
            F.least(F.col("n"), F.expr(f"((n + 1) * {int(lo_bps)} + 9999) div 10000")),
        ).alias("k_lo"),
        F.greatest(
            F.lit(1),
            F.least(F.col("n"), F.expr(f"((n + 1) * {int(hi_bps)} + 9999) div 10000")),
        ).alias("k_hi"),
    )
    w = Window.partitionBy("__g").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.withColumn("cum", F.sum("c").over(w)).join(F.broadcast(ks), "__g")
    cuts = cum.groupBy("__g").agg(
        F.min(F.when(F.col("cum") >= F.col("k_lo"), F.col("v"))).alias("lo_cut"),
        F.min(F.when(F.col("cum") >= F.col("k_hi"), F.col("v"))).alias("hi_cut"),
    )
    return base.join(cuts, "__g").select(
        F.col("__g").alias(group_col),
        F.col("__id").alias(id_col),
        "v",
        F.least(F.greatest(F.col("v"), F.col("lo_cut")), F.col("hi_cut")).alias("v_wins"),
    )


def winsorize_sql(
    table: str,
    group_col: str,
    id_col: str,
    value_sql: str,
    lo_bps: int = 100,
    hi_bps: int = 9900,
) -> str:
    """DuckDB twin of :func:`winsorize` — identical integer rank
    formulas, prefix selection, and clamps."""
    for nm, bps in (("lo_bps", lo_bps), ("hi_bps", hi_bps)):
        if not 0 <= int(bps) <= 10000:
            raise ValueError(f"{nm} must be in [0, 10000], got {bps}")
    if lo_bps >= hi_bps:
        raise ValueError(f"need lo_bps < hi_bps, got ({lo_bps}, {hi_bps})")
    return f"""
    WITH base AS MATERIALIZED (
        SELECT {group_col} AS g, {id_col} AS id,
               CAST({value_sql} AS BIGINT) AS v
        FROM {table}),
    dist AS MATERIALIZED (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
    ks AS (
        SELECT g,
               GREATEST(1, LEAST(n, ((n + 1) * {int(lo_bps)} + 9999) // 10000)) AS k_lo,
               GREATEST(1, LEAST(n, ((n + 1) * {int(hi_bps)} + 9999) // 10000)) AS k_hi
        FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM dist GROUP BY g)),
    cum AS (
        SELECT d.g, d.v,
               SUM(d.c) OVER (PARTITION BY d.g ORDER BY d.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               k.k_lo, k.k_hi
        FROM dist d JOIN ks k ON k.g = d.g),
    cuts AS (
        SELECT g,
               MIN(CASE WHEN cum >= k_lo THEN v END) AS lo_cut,
               MIN(CASE WHEN cum >= k_hi THEN v END) AS hi_cut
        FROM cum GROUP BY g)
    SELECT b.g AS {group_col}, b.id AS {id_col}, b.v,
           LEAST(GREATEST(b.v, c.lo_cut), c.hi_cut) AS v_wins
    FROM base b JOIN cuts c ON c.g = b.g
    """


def gini_coefficient(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value: "Column",
) -> DataFrame:
    """Gini concentration coefficient per group (Gini 1912, via the
    ordered-sum identity G = Σᵢ(2i − n − 1)·x₍ᵢ₎ / (n·Σx)) — the
    standard inequality/concentration measure: how concentrated is spend
    across customers, traffic across users, tokens across documents.

    ``value`` must be NON-NEGATIVE integer units (cents/micro-units —
    negative values make G meaningless; they still compute identically
    in both engines but the caller owns that interpretation).  Returns
    (group, n, total, gini) with gini ∈ [0, 1); NULL when n·Σx = 0 (an
    all-zero or empty group has no concentration to measure — surfaced,
    never defaulted).

    Determinism: the rank weight Σ(2i−n−1)x₍ᵢ₎ is invariant to order
    within ties (equal x share the tie block's weight sum), and the
    ordering is pinned to (v, id) anyway; products accumulate in
    DECIMAL(38,0) (i ≲ n can pass 3e9 at corpus scale — the roc_auc
    discipline); ONE rounded division.

    Scale: one per-group window (row_number over the group's rows —
    a single shuffle on the key) + one partial-aggregated rollup."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        value.cast("bigint").alias("v"),
    )
    w = Window.partitionBy("__g").orderBy("v", "__id")
    ranked = base.withColumn("i", F.row_number().over(w).cast("bigint"))
    agg = ranked.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("total"),
        F.sum(
            (F.lit(2).cast(d38) * F.col("i").cast(d38)).alias("t")
            * F.col("v").cast(d38)
        ).cast(d38).alias("s2iv"),
    )
    num = F.col("s2iv") - (F.col("n").cast(d38) + F.lit(1).cast(d38)) * F.col(
        "total"
    ).cast(d38)
    den = F.col("n").cast(d38) * F.col("total").cast(d38)
    return agg.select(
        F.col("__g").alias(group_col),
        "n",
        "total",
        F.when(
            den > F.lit(0).cast(d38),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("gini"),
    )


def gini_coefficient_sql(
    table_sql: str, group_col: str, id_col: str, value_sql: str
) -> str:
    """DuckDB twin of :func:`gini_coefficient` — identical (v, id)
    ranking, DECIMAL(38,0) products, and single rounded division."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS g, {id_col} AS id,
               CAST({value_sql} AS BIGINT) AS v
        FROM ({table_sql})),
    ranked AS (
        SELECT g, v,
               CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id)
                    AS BIGINT) AS i
        FROM base),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS total,
               CAST(SUM(CAST(2 AS DECIMAL(38,0)) * CAST(i AS DECIMAL(38,0))
                        * CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2iv
        FROM ranked GROUP BY 1)
    SELECT g AS {group_col}, n, total,
           CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(total AS DECIMAL(38,0)) > 0
           THEN round(
             CAST(s2iv - (CAST(n AS DECIMAL(38,0)) + 1)
                         * CAST(total AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0))
                    * CAST(total AS DECIMAL(38,0)) AS DOUBLE), 6)
           END AS gini
    FROM agg
    """


#: 3 x 1.4826 (the normal-consistency constant for MAD) in 1e4 units —
#: one integer literal shared by both engines, so the robust-z outlier
#: test |v - med| * 10000 > 44478 * mad never evaluates a float.
ROBUST_Z3_E4 = 44478


def mad_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value: "Column",
) -> DataFrame:
    """Robust outlier flags per group via median/MAD (Hampel; the
    standard robust alternative to mean/std z-scores, whose 50%
    breakdown point means a few extreme rows can't mask themselves by
    inflating the std): flag rows with
    |v − med| > 3·1.4826·MAD, evaluated as the INTEGER test
    |v − med|·10000 > 44478·MAD — no float ever computed.

    ``value`` must be integer units.  Both medians are the LOWER median
    (rank (n+1) div 2 — pure integer arithmetic, deterministic for even
    n).  Returns one row per input row: (group, id, v, med, mad,
    is_outlier).  A zero-MAD group (majority-constant values) flags
    EVERY deviating row — the documented MAD degeneracy; callers
    wanting laxer behavior should pre-filter constants.

    Scale: two distinct-value prefix windows (values, then absolute
    deviations — the quantile_ci machinery) + two map-side joins of
    n_groups-row cut tables; the corpus never sorts."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        value.cast("bigint").alias("v"),
    ).localCheckpoint()  # feeds the value dist, the deviation dist, and the output

    def _lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        dist = (
            frame.groupBy("__g", col)
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()  # feeds the n-agg AND the prefix selection
        )
        ks = dist.groupBy("__g").agg(F.sum("c").cast("bigint").alias("n")).select(
            "__g", F.expr("(n + 1) div 2").alias("k")
        )
        w = Window.partitionBy("__g").orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = dist.withColumn("cum", F.sum("c").over(w)).join(F.broadcast(ks), "__g")
        return cum.groupBy("__g").agg(
            F.min(F.when(F.col("cum") >= F.col("k"), F.col(col))).alias(out)
        )

    # n_groups-row cut table, consumed by the deviation pass AND the final
    # join — materialized once so the distinct-value prefix window behind
    # it runs once (r15 optimization round)
    med = _lower_median(base, "v", "med").localCheckpoint(eager=False)
    dev = base.join(med, "__g").select(
        "__g", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    mad = _lower_median(dev, "d", "mad")
    return (
        base.join(med, "__g")
        .join(mad, "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__id").alias(id_col),
            "v",
            "med",
            "mad",
            (
                # DECIMAL(38,0) products — same discipline as the sibling
                # gini/target-encoding/kappa operators: raw BIGINT×literal
                # would wrap silently in non-ANSI Spark for |v−med| beyond
                # ~9.2e14 micro-units while DuckDB raises (engine-divergent).
                F.abs(F.col("v") - F.col("med")).cast("decimal(38,0)")
                * F.lit(10000).cast("decimal(38,0)")
                > F.lit(ROBUST_Z3_E4).cast("decimal(38,0)")
                * F.col("mad").cast("decimal(38,0)")
            ).alias("is_outlier"),
        )
    )


def mad_outliers_sql(
    table_sql: str, group_col: str, id_col: str, value_sql: str
) -> str:
    """DuckDB twin of :func:`mad_outliers` — identical lower-median
    ranks, prefix selections, and integer outlier test."""
    return f"""
    WITH base AS MATERIALIZED (
        SELECT {group_col} AS g, {id_col} AS id,
               CAST({value_sql} AS BIGINT) AS v
        FROM ({table_sql})),
    dist1 AS MATERIALIZED (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
    k1 AS (SELECT g, (CAST(SUM(c) AS BIGINT) + 1) // 2 AS k FROM dist1 GROUP BY g),
    med AS (
        SELECT d.g, MIN(CASE WHEN cum >= k.k THEN d.v END) AS med
        FROM (SELECT g, v,
                     SUM(c) OVER (PARTITION BY g ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM dist1) d
        JOIN k1 k ON k.g = d.g GROUP BY d.g),
    dev AS MATERIALIZED (
        SELECT b.g, abs(b.v - m.med) AS d
        FROM base b JOIN med m ON m.g = b.g),
    dist2 AS MATERIALIZED (
        SELECT g, d, CAST(COUNT(*) AS BIGINT) AS c FROM dev GROUP BY 1, 2),
    k2 AS (SELECT g, (CAST(SUM(c) AS BIGINT) + 1) // 2 AS k FROM dist2 GROUP BY g),
    mad AS (
        SELECT d.g, MIN(CASE WHEN cum >= k.k THEN d.d END) AS mad
        FROM (SELECT g, d,
                     SUM(c) OVER (PARTITION BY g ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM dist2) d
        JOIN k2 k ON k.g = d.g GROUP BY d.g)
    SELECT b.g AS {group_col}, b.id AS {id_col}, b.v, m.med, a.mad,
           CAST(abs(b.v - m.med) AS DECIMAL(38,0)) * CAST(10000 AS DECIMAL(38,0))
             > CAST({ROBUST_Z3_E4} AS DECIMAL(38,0)) * CAST(a.mad AS DECIMAL(38,0))
             AS is_outlier
    FROM base b JOIN med m ON m.g = b.g JOIN mad a ON a.g = b.g
    """
