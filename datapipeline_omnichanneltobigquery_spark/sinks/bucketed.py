"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §2.2;
100 TB design).

Writing both sides of a recurring join bucketed by the join key means every
subsequent join between them is an exchange-free zipped join — the single
biggest recurring-cost saver for fact-fact joins at scale.  The plan-shape
proof (no Exchange in the join) lives in tests/test_bucketed.py.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clean_orphan_location(spark: SparkSession, table: str) -> None:
    """Remove a managed-table directory that outlived its catalog entry.

    A fresh (in-memory/derby) metastore over a persistent warehouse dir is
    routine across driver runs: the table is gone from the catalog but its
    location survives, and ``saveAsTable`` then refuses with
    LOCATION_ALREADY_EXISTS even in overwrite mode.  Only applies to
    local-filesystem warehouses; if the table IS registered, overwrite mode
    handles it and nothing is touched here."""
    if spark.catalog.tableExists(table):
        return
    parsed = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if parsed.scheme not in ("", "file"):
        return
    parts = table.lower().split(".")
    sub = [parts[-2] + ".db", parts[-1]] if len(parts) > 1 else [parts[-1]]
    loc = os.path.join(parsed.path, *sub)
    if os.path.exists(loc):
        shutil.rmtree(loc)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sort-bucketed) managed table."""
    _clean_orphan_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``key`` — planner elides both exchanges
    when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
