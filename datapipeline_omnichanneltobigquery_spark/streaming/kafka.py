"""Kafka source adapter — deployment-guarded (the reference's README lists
Kafka ingestion as future work; README.md:102-104).

The spark-sql-kafka connector jar is not in this container, so this module
only shapes the adapter: subscribe → decode the value payload with the
engine's JSON schema tooling → the same downstream operators
(cast policy, windows, upsert sink) that the file sources feed.  With the
jar on the classpath (``--packages org.apache.spark:spark-sql-kafka-0-10``)
this is the complete streaming ingestion path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_kafka_json(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """readStream from Kafka, JSON-decode the value into ``value_schema``
    columns.  Raises a clear error when the connector jar is absent."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:
        raise NotImplementedError(
            "spark-sql-kafka connector not on the classpath in this "
            "environment; file-based streaming sources cover the semantics "
            "(streaming/windows.py, streaming/sink.py)"
        ) from exc
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "timestamp",
    ).select("kafka_key", "v.*", F.col("timestamp").alias("kafka_ts"))
