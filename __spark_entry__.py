"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(``datapipeline_omnichanneltobigquery_spark.plans.queries``): every
implemented operator from SURVEY.md §2 registers there with a Spark builder
and (where SQL-expressible) a DuckDB oracle; this module just re-exports the
registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipeline_omnichanneltobigquery_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # The session the driver passes may lack the nanos config; the flagship
    # query touches only orders/lineitem (ms timestamps), so it runs anywhere.
    return QUERIES["flagship_monthly_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(ORACLES)
