"""Streaming data-quality gate: the declarative constraint contract
(operators/profile.py::validate_constraints — the Deequ-style pre-load
rules) enforced per micro-batch, with quarantine instead of data loss.

The production shape this models: a continuous ingest where every batch
must pass the table's data contract BEFORE it reaches the serving/training
corpus.  Per micro-batch:

1. ONE aggregate pass evaluates every rule (a handful of counters — the
   validate_constraints scale contract), collected as a bounded
   one-row-per-rule report;
2. a batch with zero violations lands under ``accept_path``; a failing
   batch lands — whole, untouched — under ``quarantine_path`` for triage
   and replay (gating is BATCH-level: rules like ``unique`` are batch
   properties, and a poisoned batch usually indicates an upstream fault
   better fixed than filtered);
3. the report itself is appended under ``report_path`` either way — the
   audit trail that makes "why was last Tuesday quarantined" answerable.

Crash-replay contract: every write targets a ``batch_id=N`` subdirectory
with overwrite semantics, so a foreachBatch replay overwrites its own
previous (possibly partial) output instead of duplicating it — idempotent
without markers, and readers of the root get the batch id back as a hive
partition column (free provenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from datapipeline_omnichanneltobigquery_spark.operators.profile import validate_constraints

REPORT_SCHEMA = "batch_id long, rule string, n_violations long, passed boolean"


def gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    rules: list,
    accept_path: str,
    quarantine_path: str,
    report_path: str,
) -> bool:
    """Validate one batch against ``rules`` and route it (see module
    docstring).  Returns True if the batch was accepted.  Idempotent per
    (batch content, batch_id): overwrite-into-subdirectory writes."""
    report = validate_constraints(batch_df, rules).collect()  # one row per rule
    ok = all(r.passed for r in report)
    dest = accept_path if ok else quarantine_path
    batch_df.write.mode("overwrite").parquet(f"{dest}/batch_id={batch_id}")
    spark = batch_df.sparkSession
    spark.createDataFrame(
        [(batch_id, r.rule, r.n_violations, r.passed) for r in report],
        REPORT_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{report_path}/batch_id={batch_id}")
    return ok


def streaming_constraint_gate(
    stream: DataFrame,
    rules: list,
    accept_path: str,
    quarantine_path: str,
    report_path: str,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the gated ingest: every micro-batch is contract-checked and
    routed to accept/quarantine with an audit report.  Read the accepted
    corpus with ``spark.read.parquet(accept_path)`` (batch_id arrives as a
    partition column); re-ingest a fixed quarantine batch by pointing a
    batch job at its subdirectory."""

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            gate_batch(
                batch_df, batch_id, rules, accept_path, quarantine_path, report_path
            )

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
