"""Physical-plan audit helpers — the engine's own '.explain and iterate'
discipline, made assertable.

These inspect the formatted plan for the properties that matter at 100 TB:
filters reaching the parquet scan (PushedFilters), projections pruning the
scan (ReadSchema), dimension joins broadcasting, codegen coverage, and
shuffle (Exchange) counts.  tests/test_plans.py pins them for the flagship
queries so a regression in plan shape fails CI, not a cluster bill.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    return any(column in entry for entry in pushed_filters(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", plan_string(df))


def broadcast_join_count(df: DataFrame) -> int:
    return plan_string(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return plan_string(df).count("SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    Matches both the pre-AQE detail form ('Exchange hashpartitioning(...)')
    and the AQE formatted tree form ('Exchange (5)')."""
    s = plan_string(df)
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hash|range|\()", s))


def codegen_stage_count_of(build, spark) -> int:
    """Distinct WholeStageCodegen stages of the plan ``build(spark)`` returns.

    Under AQE the pre-execution explain hides codegen stars (stages are
    finalized at runtime), so this helper re-plans with AQE off; ``build``
    must construct the DataFrame fresh (a cached queryExecution would keep
    the AQE plan)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        s = plan_string(build(spark), mode="simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return len(set(re.findall(r"\*\((\d+)\)", s)))


def uses_python_eval(df: DataFrame) -> bool:
    """True if the plan contains a row-at-a-time Python UDF eval (BatchEvalPython);
    ArrowEvalPython / mapInPandas stages are the sanctioned Python path."""
    return "BatchEvalPython" in plan_string(df)
