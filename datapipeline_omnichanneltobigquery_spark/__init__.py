"""datapipeline_omnichanneltobigquery_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference repo
``kina2711/datapipeline_omnichanneltobigquery`` (a single-process pandas →
BigQuery ETL app, see ``/root/reference/omnichannel_to_bq.py``) as an
idiomatic, scale-first Spark DataFrame library, extended with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search, text
analysis, multimodal column plumbing).

Design rules (enforced across the package):

* DataFrame/SQL only — logical plans are declared, Catalyst + AQE pick the
  physical strategy.  No RDDs, no driver-side ``collect()`` loops.
* Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where built-ins genuinely cannot express the semantics (multimodal decode).
* Every operator is written for a 1000-executor / 100 TB deployment even
  though tests run on ``local[*]``: broadcast hints on dimension joins,
  partial aggregation, salting helpers for skew, no global bottlenecks.
"""

__version__ = "0.1.0"

from datapipeline_omnichanneltobigquery_spark.session import get_spark  # noqa: F401
