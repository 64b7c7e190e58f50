"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §2.2;
100 TB design).

Writing both sides of a recurring join bucketed by the join key means every
subsequent join between them is an exchange-free zipped join — the single
biggest recurring-cost saver for fact-fact joins at scale.  The plan-shape
proof (no Exchange in the join) lives in tests/test_bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sort-bucketed) managed table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``key`` — planner elides both exchanges
    when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
