"""Vector math over ``array<float>`` columns via higher-order functions.

Everything stays JVM-side: ``zip_with`` + ``aggregate`` compile to Catalyst
expressions, no Python in the loop.  The accumulation is an ordered left
fold over the array — the SAME order on every engine and every partitioning,
so dot products are bitwise-deterministic (unlike a parallel reduction).

Elements are upcast to double before multiply/accumulate: float32 inputs →
exact float64 products → reproducible sums to the last ulp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product of two equal-length float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe only as far as the inputs are."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def norm_unit(a: Column) -> Column:
    """L2-normalize an array<float> to array<double> (pre-normalizing the
    corpus once turns every cosine into a plain dot at query time)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
