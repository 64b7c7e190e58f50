"""Vector math over ``array<float>`` columns.

Two implementations with IDENTICAL floating-point results:

* ``dim=None``: ``zip_with`` + ``aggregate`` — a Catalyst higher-order left
  fold.  Correct for any length, but higher-order lambdas are *interpreted*
  per element (no WholeStageCodegen) — fine for one query vector, slow for
  all-pairs workloads.
* ``dim=K`` (statically known): an explicit ``a[1]*b[1] + … + a[K]*b[K]``
  expression chain — plain arithmetic that compiles into WholeStageCodegen,
  ~1-2 orders of magnitude faster in pairwise joins.  Left-associated
  addition evaluates in exactly the fold's order (and ``0.0 + p1 == p1`` in
  IEEE), so both paths and the DuckDB oracle construction
  ``list_sum(list_transform(range(1,K+1), i -> CAST(a[i] AS DOUBLE) * …))``
  are bitwise-identical.

Elements are upcast to double before multiply/accumulate: float32 inputs →
exact float64 products → reproducible sums to the last ulp.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Ordered dot product of two equal-length float arrays (see module
    docstring for the dim=None vs static-dim trade-off).

    Pass PLAIN COLUMN NAMES (both sides) with a static ``dim`` to build
    the chain as ONE parsed SQL expression: the Column-by-Column form
    costs ~6 py4j round trips per term (~2 s of DRIVER time per 64-dim
    chain, measured — r15 optimization round), the parsed form ~3 ms,
    and the resulting expressions are bit-identical (verified)."""
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        return F.expr(
            " + ".join(
                f"CAST(element_at(`{a}`, {i}) AS DOUBLE)"
                f" * CAST(element_at(`{b}`, {i}) AS DOUBLE)"
                for i in range(1, dim + 1)
            )
        )
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        terms = [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        return reduce(lambda acc, t: acc + t, terms)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity; NULL-safe only as far as the inputs are."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def norm_unit(a: Column, dim: int | None = None) -> Column:
    """L2-normalize an array<float> to array<double> (pre-normalizing the
    corpus once turns every cosine into a plain dot at query time — the
    O(n) norms instead of O(n²) trick for pairwise workloads).

    The norm is materialized ONCE per row via ``array_repeat`` and zipped
    against the elements: the earlier ``transform(a, x -> x / n)`` form
    captured the whole norm chain inside the lambda, and higher-order
    lambdas are interpreted per element — the 64-term chain re-evaluated
    64× per row measured ~10× slower on a corpus normalize.  Same doubles
    bit for bit (one shared n, same ``x.cast(double)/n`` division); rows
    are fixed-``dim`` by contract when ``dim`` is static.

    Pass a PLAIN COLUMN NAME with static ``dim`` to build the whole thing
    as one parsed SQL expression (the :func:`dot` py4j-cost note; the two
    forms are bit-identical, verified)."""
    if dim is not None and isinstance(a, str):
        n_sql = "sqrt(%s)" % " + ".join(
            f"CAST(element_at(`{a}`, {i}) AS DOUBLE)"
            f" * CAST(element_at(`{a}`, {i}) AS DOUBLE)"
            for i in range(1, dim + 1)
        )
        return F.expr(
            f"zip_with(`{a}`, array_repeat({n_sql}, {dim}),"
            " (x, nn) -> CAST(x AS DOUBLE) / nn)"
        )
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a, dim)
    reps = F.lit(dim) if dim is not None else F.size(a)
    return F.zip_with(a, F.array_repeat(n, reps), lambda x, nn: x.cast("double") / nn)
