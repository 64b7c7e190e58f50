"""Scalar expression helpers shared by queries and their SQL oracles.

Two concerns live here:

1. Reference-fidelity timestamp formatting (omnichannel_to_bq.py:24, :90).
2. **Cross-engine numeric determinism.**  Floating-point SUM order differs
   between Spark's partial/final aggregation and any single-node oracle, so
   money aggregates go through exact DECIMAL arithmetic and only convert to
   DOUBLE at the very end — bitwise-identical results on both engines, at
   any partitioning, at any scale.  (Decimal aggregation is also the right
   call at 100 TB: it makes results run-to-run deterministic under AQE.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"  # omnichannel_to_bq.py:24
CANONICAL_FMT = "yyyy-MM-dd HH:mm:ss"  # omnichannel_to_bq.py:90


def iso_ts(col: Column) -> Column:
    """ISO-8601 Z-suffixed second-precision string (:24)."""
    return F.date_format(col, ISO_FMT)


def canonical_ts(col: Column) -> Column:
    """Canonical ``yyyy-MM-dd HH:mm:ss`` string (:90)."""
    return F.date_format(col, CANONICAL_FMT)


def money(col: Column, scale: int = 2) -> Column:
    """Recover the exact decimal value a 2-dp price column encodes in binary
    floating point."""
    return col.cast(f"decimal(18,{scale})")


def money_sum(col: Column, scale: int = 2, out: str = "double") -> Column:
    """Order-independent SUM of a fixed-point column: decimal-exact inside the
    aggregation, cast once at the end."""
    return F.sum(money(col, scale)).cast(out)


def money_avg(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal SUM divided by COUNT in double —
    one IEEE division of two deterministic operands."""
    return F.sum(money(col, scale)).cast("double") / F.count(col).cast("double")
