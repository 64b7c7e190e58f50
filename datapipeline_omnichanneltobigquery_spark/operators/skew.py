"""Skew mitigation: salting for hot keys (SURVEY.md §2.2; 100 TB design).

AQE's skew-join splitting handles most skew at runtime; salting is the
explicit tool for the two places AQE can't help:

* **aggregation skew** — one giant group serializes into one task.
  :func:`salted_agg` runs partial aggregation over (key, salt) first, then
  merges the partials per key: two small shuffles instead of one hot one.
* **join skew with a replicable right side** — :func:`salted_join`
  replicates each right row ``n_salts`` times while the left side draws a
  deterministic salt, so one hot key fans across ``n_salts`` tasks.

Both are semantics-preserving rewrites (results identical to the unsalted
plan, proven in tests/test_skew.py) — they only reshape the shuffle.
Salts derive from a hash of a unique column, not rand(), so plans stay
deterministic and retry-safe.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a unique column (retry-safe,
    unlike rand())."""
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``partial_aggs`` aggregate raw rows; ``merge_aggs`` combine the partial
    columns (e.g. partial ``sum(x) as s`` then merge ``sum(s) as s``).  The
    caller picks decomposable aggregates (sum/count/min/max — avg as
    sum+count).
    """
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    unique_left_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has hot keys and ``right`` is small enough to
    replicate ``n_salts``× (dimension tables): join on (key, salt) so a hot
    key's rows spread over ``n_salts`` shuffle partitions."""
    l_s = with_salt(left, unique_left_col, n_salts)
    r_s = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias(SALT_COL))
        )
    )
    out = l_s.join(r_s, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)


def skew_report(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Diagnose key skew BEFORE a join/agg chooses its strategy: one row
    per hot key — (key, n_rows, share, skew_factor, rank) for the
    ``top_k`` heaviest keys, where ``share`` is the key's fraction of all
    rows and ``skew_factor`` = n_rows / mean-rows-per-key (how many
    average keys this one weighs).  skew_factor ≳ n_shuffle_partitions
    means the key serializes a whole task → reach for :func:`salted_agg` /
    :func:`salted_join` or AQE skew splitting; this report is the
    measurement that justifies that choice (the diagnose half of the
    diagnose → salt workflow).

    Plan: ONE partial-aggregated groupBy(key) (the same shuffle the
    skewed operation itself would pay, so the diagnosis costs what one
    run of the problem costs), a 1-row global aggregate off those counts
    (provably bounded → broadcast), and a top-k TakeOrderedAndProject —
    never a global sort.  Ratios are single IEEE divisions over exact
    integer counts."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__n_keys"),
    )
    top = (
        # explicit NULLS LAST on the key tie-break: Spark defaults ascending
        # NULLS FIRST, DuckDB NULLS LAST — and a NULL key is a classic hot
        # key, so it can land exactly on the top_k boundary
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        "key",
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("__total").cast("double")).alias("share"),
        (
            F.col("n_rows").cast("double")
            / (F.col("__total").cast("double") / F.col("__n_keys").cast("double"))
        ).alias("skew_factor"),
    )


def skew_report_sql(table: str, key_col: str, top_k: int = 5) -> str:
    """DuckDB twin of :func:`skew_report` — same counts, same division
    order."""
    return f"""
    WITH counts AS (SELECT {key_col} AS key, COUNT(*) AS n_rows
                    FROM {table} GROUP BY 1),
    totals AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM counts),
    top AS (SELECT * FROM counts ORDER BY n_rows DESC, key ASC NULLS LAST LIMIT {top_k})
    SELECT t.key, t.n_rows,
           CAST(t.n_rows AS DOUBLE) / CAST(x.total AS DOUBLE) AS share,
           CAST(t.n_rows AS DOUBLE)
             / (CAST(x.total AS DOUBLE) / CAST(x.n_keys AS DOUBLE)) AS skew_factor
    FROM top t CROSS JOIN totals x
    """
