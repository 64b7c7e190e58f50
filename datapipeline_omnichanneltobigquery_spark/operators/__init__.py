from datapipeline_omnichanneltobigquery_spark.operators.normalize import (  # noqa: F401
    INT_COLS,
    DATE_COLS,
    cast_columns,
    cast_report,
    sort_by_created_at,
    preview,
)
from datapipeline_omnichanneltobigquery_spark.operators.upsert import upsert  # noqa: F401
