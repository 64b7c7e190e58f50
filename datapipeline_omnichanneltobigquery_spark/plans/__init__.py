from datapipeline_omnichanneltobigquery_spark.plans.queries import QUERIES, ORACLES, query  # noqa: F401

# Importing registers each module's queries into the shared registry.
from datapipeline_omnichanneltobigquery_spark.plans import relational  # noqa: F401, E402
from datapipeline_omnichanneltobigquery_spark.plans import llm_ops  # noqa: F401, E402
from datapipeline_omnichanneltobigquery_spark.plans import events_ops  # noqa: F401, E402
from datapipeline_omnichanneltobigquery_spark.plans import temporal_ops  # noqa: F401, E402
from datapipeline_omnichanneltobigquery_spark.plans import relational2  # noqa: F401, E402
from datapipeline_omnichanneltobigquery_spark.plans import tpch_shapes  # noqa: F401, E402
from datapipeline_omnichanneltobigquery_spark.plans import persistence  # noqa: F401, E402
