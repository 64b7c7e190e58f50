from datapipeline_omnichanneltobigquery_spark.plans.queries import QUERIES, ORACLES, query  # noqa: F401
