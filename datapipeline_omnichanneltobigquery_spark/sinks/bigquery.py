"""Optional BigQuery writer — deployment adapter, isolated and import-guarded.

The reference loads via CSV + autodetect (omnichannel_to_bq.py:143-165); on
Spark the idiomatic path is the spark-bigquery-connector, which writes
parquet/avro directly into BigQuery with the DataFrame's real schema.  The
connector jar is not present in this environment, so these helpers raise a
clear error if invoked without it — engine semantics (cast policy, upsert
plan) are already covered by the catalog sinks and do not depend on this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bigquery(
    df: DataFrame,
    table: str,
    temp_gcs_bucket: str,
    mode: str = "overwrite",
) -> None:
    """``df.write.format('bigquery')`` with WRITE_TRUNCATE-equivalent mode.

    Requires the public spark-bigquery-connector on the classpath
    (``--packages com.google.cloud.spark:spark-bigquery-with-dependencies``).
    """
    try:
        (
            df.write.format("bigquery")
            .option("table", table)
            .option("temporaryGcsBucket", temp_gcs_bucket)
            .mode(mode)
            .save()
        )
    except Exception as exc:  # connector not on classpath in this container
        raise NotImplementedError(
            "BigQuery connector not available in this environment; "
            "engine-side semantics are covered by sinks.catalog"
        ) from exc
