from datapipeline_omnichanneltobigquery_spark.functions.scalars import (  # noqa: F401
    iso_ts,
    canonical_ts,
    money_sum,
    money_avg,
)
from datapipeline_omnichanneltobigquery_spark.functions.vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine,
)
from datapipeline_omnichanneltobigquery_spark.functions.hashing import (  # noqa: F401
    md5_long,
    minhash_expr,
)
