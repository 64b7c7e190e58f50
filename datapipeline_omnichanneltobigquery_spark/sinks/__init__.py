from datapipeline_omnichanneltobigquery_spark.sinks.catalog import (  # noqa: F401
    overwrite_table,
    upsert_into_table,
    list_tables,
    drop_table,
    row_count,
    table_columns,
)
