"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector against a single scan of the corpus — embarrassingly parallel, no
shuffle until the final TakeOrderedAndProject (k rows per partition → driver
merge).  That is already the right 100 TB plan for one-off queries.

The scale path for repeated queries is IVF: partition the corpus once by
nearest centroid (one shuffle, persisted/bucketed by cluster id), then probe
only ``n_probe`` clusters per query — a partition-pruned scan instead of a
full one.  Centroid assignment is argmin over a broadcast centroid table,
computed with the same ordered-fold dot product, so assignments are
deterministic.

All math goes through functions/vectors.py (ordered fold, double
accumulation) — bitwise-identical to the DuckDB oracle construction
``list_sum(list_transform(range(...), i -> CAST(a[i] AS DOUBLE) * ...))``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipeline_omnichanneltobigquery_spark.functions.vectors import cosine, dot, l2_norm


def _query_vec_df(embeddings: DataFrame, query_vec_id: int) -> DataFrame:
    return embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("__qv")
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the corpus vector ``query_vec_id``.

    Broadcast 1-row query ⨯ corpus scan → cosine in codegen → orderBy+limit
    (TakeOrderedAndProject).  Ties broken by id for determinism.  Excludes
    the query vector itself.
    """
    q = _query_vec_df(embeddings, query_vec_id)
    return (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_sql(table: str, query_vec_id: int, k: int, dim: int) -> str:
    """DuckDB twin of :func:`cosine_topk` — same fold order, same formula
    shape dot/(sqrt(aa)*sqrt(bb)), bitwise-equal doubles."""

    def d(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )

    return f"""
    WITH q AS (SELECT embedding AS qv FROM {table} WHERE vec_id = {query_vec_id})
    SELECT vec_id,
           {d("e.embedding", "qv")}
             / (sqrt({d("e.embedding", "e.embedding")}) * sqrt({d("qv", "qv")})) AS cos_sim
    FROM {table} e, q
    WHERE vec_id <> {query_vec_id}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {k}
    """


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).

    Brute force O(n²) — correct and fine into the ~10⁴ corpus range; beyond
    that use :func:`ivf_assign` buckets or random-hyperplane LSH so only
    bucket-mates pair up.  Returns (id_a, id_b, cos_sim), id_a < id_b.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_pairs_sql(table: str, threshold: float, dim: int) -> str:
    def d(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )

    cs = f"{d('a.embedding', 'b.embedding')} / (sqrt({d('a.embedding', 'a.embedding')}) * sqrt({d('b.embedding', 'b.embedding')}))"
    return f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cs} AS cos_sim
    FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
    WHERE {cs} >= {threshold}
    """


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest 'centroid' (deterministic seed
    centroids: the first ``n_centroids`` corpus vectors by id — a k-means
    iteration could refine them, but assignment mechanics are what matters
    for the index shape).

    Plan: broadcast the centroid table, explode per-centroid similarity,
    argmax via max_by — one wide map stage, one small agg, no O(n²).
    Output: (vec_id, cluster, cos_sim) — the bucketed index: at deployment
    write it partitioned/bucketed by cluster for partition-pruned probes.
    """
    w = F.broadcast(
        embeddings.orderBy(id_col).limit(n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
        )
    )
    scored = embeddings.crossJoin(w).select(
        id_col,
        "cid",
        cosine(F.col(vec_col), F.col("cv")).alias("sim"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("sim"), (-F.col("cid")).alias("tb"))).alias("cluster"),
        F.max("sim").alias("cos_sim"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe only the ``n_probe`` clusters nearest the query.

    Approximate — recall measured against :func:`cosine_topk` in tests.
    At scale the assignment table is precomputed & bucketed; here it's built
    inline for self-containment.
    """
    assign = ivf_assign(embeddings, n_centroids, id_col, vec_col)
    q = _query_vec_df(embeddings, query_vec_id)
    centroids = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select("cid", cosine(F.col("cv"), F.col("__qv")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("cid"))
        .limit(n_probe)
        .select("cid")
    )
    probed_ids = assign.join(F.broadcast(probe), assign.cluster == probe.cid, "left_semi").select(
        id_col
    )
    cand = embeddings.join(F.broadcast(probed_ids), id_col, "left_semi")
    return (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
