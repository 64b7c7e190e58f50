"""Persistence round-trip under the driver gate (SURVEY.md §2.1 K1/K2/K5):
write partitioned parquet, read it back with a partition-pruned scan, and
prove content fidelity against the oracle computed from the ORIGINAL table —
the write→read cycle is only correct if both directions preserve values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_omnichanneltobigquery_spark.plans.queries import query
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table

# Scratch location inside the repo (gitignored) so the query is runnable from
# any cwd the driver uses; overwrite mode makes reruns idempotent.
SCRATCH = "/root/repo/.scratch"


@query(
    "sink_partitioned_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           year(o_orderdate) AS yr
    FROM orders
    WHERE year(o_orderdate) = 1997
    """,
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2/K5 + partition pruning as one driver-verified cycle: project
    orders, hive-partition the parquet layout by year, overwrite-load it
    (WRITE_TRUNCATE semantics, omnichannel_to_bq.py:147-152), then read it
    back filtered to one year.  The read-side filter hits PartitionFilters
    (directory pruning — only yr=1997 files are opened; asserted in
    tests/test_sinks.py), which is the 100 TB time-series layout: partition
    by time, prune by time."""
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = f"{SCRATCH}/roundtrip_orders_{sf_tag}"
    out = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.year("o_orderdate").alias("yr"),
    )
    out.write.mode("overwrite").partitionBy("yr").parquet(path)
    back = spark.read.parquet(path).filter(F.col("yr") == 1997)
    return back.select(
        "o_orderkey", "o_custkey", "o_totalprice", F.col("yr").cast("int").alias("yr")
    )
