"""Parquet/CSV/JSON table readers over the driver testdata layout.

The reference's only source is a paginated REST API
(omnichannel_to_bq.py:33-61, handled in
:mod:`datapipeline_omnichanneltobigquery_spark.sources.paginated`); file scans
are the engine extension that makes everything else testable and is the
natural 100 TB substrate: columnar parquet scans get predicate pushdown,
column pruning, and partition pruning from Catalyst for free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Event-time columns whose physical parquet type has varied across driver
# testdata generations: TIMESTAMP(NANOS) (surfaced as epoch-nanos LongType
# under spark.sql.legacy.parquet.nanosAsLong=true) or TIMESTAMP(MICROS,
# isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ in Spark 4).  Either way
# we normalize to session-local TimestampType at microsecond precision —
# the session zone is pinned to UTC below, so the NTZ→LTZ cast is
# value-preserving and matches what DuckDB reads from the same file.
_EVENT_TS_COLUMNS = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame.

    Plain ``spark.read.parquet`` so filters/projections placed on the result
    push down into the scan (check ``PushedFilters`` in ``.explain``).
    """
    # Defensive session confs for sessions not built by get_spark() (e.g. the
    # driver's own).  Both are runtime-settable:
    # - UTC session tz: date_format/window on ltz timestamps render in the
    #   session zone; a non-UTC ambient zone would silently shift every
    #   formatted timestamp relative to the (naive) DuckDB oracle;
    # - nanosAsLong: Spark 4 otherwise rejects TIMESTAMP(NANOS) parquet.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _EVENT_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _EVENT_TS_COLUMNS.get(name, ()):
        if col not in df.columns:
            continue
        dtype = dict(df.dtypes)[col]
        if dtype == "bigint":
            # TIMESTAMP(NANOS) read as epoch-nanos.  Integer arithmetic:
            # epoch-nanos exceed double's 2^53 exact range, so a float
            # divide would occasionally shift the microsecond; and the
            # pmod form FLOORS (matching every other engine's unit
            # conversion) where `div` truncates toward zero and would be
            # +1µs off for pre-1970 instants.
            df = df.withColumn(
                col,
                F.timestamp_micros(
                    F.expr(f"(`{col}` - pmod(`{col}`, 1000)) div 1000")
                ),
            )
        elif dtype == "timestamp_ntz":
            # TIMESTAMP(MICROS, no UTC adjustment).  Session tz is UTC, so
            # this cast relabels the same instant; unix_micros/window/etc.
            # require the LTZ type.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table; keys match DuckDB oracle view names."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` can address them."""
    for name, df in read_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV scan; explicit schema preferred (autodetect re-inference is the
    reference's load-path weakness — omnichannel_to_bq.py:145-152 round-trips
    through CSV + BigQuery autodetect, losing the types it just cast)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines scan with optional explicit schema (sampled inference
    otherwise); nested structs are preserved, unlike the reference which
    stringifies them (omnichannel_to_bq.py:96)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


CORRUPT_COL = "_corrupt_record"


def read_json_tolerant(spark: SparkSession, path: str, schema) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan that SURVIVES malformed rows instead of failing the
    job: PERMISSIVE mode parks each unparseable line in ``_corrupt_record``
    and nulls the data columns.  Returns (good, bad) DataFrames — the
    quarantine pattern every long-running ingestion needs at scale (one bad
    line in 100 TB must not kill the load; the reference's eager
    ``resp.json()`` at omnichannel_to_bq.py:45 simply crashes).

    ``schema`` is required (a StructType or DDL string WITHOUT the corrupt
    column — it is appended here): schema inference would read the data
    twice and silently drop the quarantine column."""
    from pyspark.sql.types import StringType, StructField, StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # build a COPY — StructType.add mutates in place, so appending to the
    # caller's object would leak the corrupt column into their schema (and
    # append it twice if the same object were passed to two calls)
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # The quarantine keeps the FULL row (partially-parsed columns + raw
    # line) — also sidestepping Spark's restriction on querying only the
    # corrupt column from a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def unwrap_envelope(df: DataFrame, obj_key: str) -> DataFrame:
    """Envelope projection (S3): select the one array field of an API
    response envelope and explode it to records —
    ``resp.json().get(obj_key, [])`` (omnichannel_to_bq.py:45) as a plan.
    Missing/NULL envelopes contribute zero rows, like ``.get(key, [])``."""
    return df.select(F.explode(F.col(obj_key)).alias("record")).select("record.*")


def _footer_stats_df(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """The aggregate whose scan is answered from parquet footer statistics
    (caller must have v2 parquet + aggregatePushdown active)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return spark.read.parquet(path).agg(*aggs)


def footer_stats(spark: SparkSession, path: str, cols: list[str]) -> dict:
    """COUNT/MIN/MAX table profile answered from parquet FOOTER metadata —
    the scan reads row-group statistics, not data pages (the plan carries
    ``PushedAggregation``, pinned in tests).  At 100 TB this is instant
    profiling vs a full scan: the numbers already sit in every footer.

    Aggregate pushdown is a DSv2-only feature and the engine's default scans
    stay on v1 (stable plan shapes), so the two confs are flipped for this
    call and restored after — the aggregate must EXECUTE while they are
    active, hence the collect inside.

    Eligibility: every requested column must have a pushdown-supported type
    (numerics, strings, dates — NOT timestamp_ntz), the path must be plain
    parquet, and there must be no filters; otherwise Spark silently falls
    back to a real scan — results identical, just not metadata-speed.  The
    plan-shape test pins the pushdown for eligible columns."""
    prev = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushdown")
    }
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        return _footer_stats_df(spark, path, cols).collect()[0].asDict()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time) — the long-lived-table reality a
    nightly append pipeline hits the first time a source adds a field.

    ``mergeSchema`` unions the file schemas (costing one footer read per
    file — why it is off by default); rows from files that predate a
    column read NULL for it, the same contract as the reference's BigQuery
    schema-relaxation loads (omnichannel_to_bq.py:167-201 staging MERGE
    recreates the table instead — this is the additive path).  Type
    CONFLICTS (same name, different type) still fail loudly: silent
    coercion would corrupt downstream casts."""
    return spark.read.option("mergeSchema", "true").parquet(path)
