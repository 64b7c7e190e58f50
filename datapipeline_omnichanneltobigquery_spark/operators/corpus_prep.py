"""The full training-corpus preparation pipeline in ONE call — the
composition a real LLM data team runs nightly (SURVEY.md §2.2; every stage
is an already-oracle-verified operator of this repo):

  1. dedup (exact fingerprint pass → n-gram-Jaccard near-dup clusters →
     one canonical doc per cluster)                 operators/dedup.py
  2. benchmark decontamination vs an eval set       operators/decontam.py
  3. heuristic quality filter (C4/Gopher-family)    operators/textstats.py
  4. deterministic train/val/test hash split        operators/sampling.py

Scale: each stage is the scale-shaped plan its module documents (df-capped
candidate joins, broadcast eval probe, map-side scoring and split); between
stages only ID KEEP-LISTS flow — the document bodies are semi-joined back
once per stage boundary and never shuffle by value.

`prepare_corpus_sql` composes the SAME stage twins into one nested DuckDB
query, so the driver hash-checks the END-TO-END composition, not just the
stages (the dedup_pipeline_full discipline, extended to the whole prep)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipeline_omnichanneltobigquery_spark.operators import dedup as dd
from datapipeline_omnichanneltobigquery_spark.operators import decontam as dc
from datapipeline_omnichanneltobigquery_spark.operators import sampling as sa
from datapipeline_omnichanneltobigquery_spark.operators import textstats as ts


def prepare_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_min_overlap: int = 3,
    decontam_max_df_bench: int = 8,
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "corpus-v1",
) -> DataFrame:
    """docs + eval set → deduplicated, decontaminated, quality-filtered,
    split-labeled corpus rows (all original columns + ``split``)."""
    split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    labeled = dd.dedup_pipeline(
        docs, id_col, text_col, n=jaccard_n, threshold=jaccard_threshold
    )
    keep_ids = labeled.filter(F.col("keep")).select(F.col("id").alias(id_col))
    kept = docs.join(keep_ids, id_col, "left_semi")

    clean = dc.decontaminate(
        kept, bench, id_col, text_col, id_col, text_col,
        n=decontam_n, min_overlap=decontam_min_overlap,
        max_df_bench=decontam_max_df_bench,
    )

    # map-side score-and-filter: no metrics projection, no semi-join back
    good = clean.filter(ts.quality_score(F.col(text_col)) >= F.lit(min_quality))

    return sa.hash_split(good, id_col, split_weights, seed=split_seed)


def _dedup_keep_sql(
    table_expr: str, id_col: str, text_col: str, n: int, threshold: float
) -> str:
    """Kept-rows expression after the dedup chain (exact → Jaccard → CC →
    canonical winner) over an arbitrary table expression — the
    llm_ops._dedup_pipeline_oracle composition, parameterized."""
    surv = (
        f"(SELECT MIN({id_col}) AS {id_col}, {text_col} FROM "
        f"(SELECT {id_col}, {text_col}, md5({text_col}) AS fp FROM {table_expr}) "
        f"GROUP BY fp, {text_col})"
    )
    cc = dd.connected_components_sql(
        dd.jaccard_pairs_sql(
            surv, id_col, text_col, n=n, threshold=threshold, max_df=dd.JACCARD_MAX_DF
        )
    )
    return f"""(
    WITH labeled AS ({cc}),
    surv AS (SELECT MIN({id_col}) AS id FROM
             (SELECT {id_col}, md5({text_col}) AS fp FROM {table_expr}) GROUP BY fp),
    keepers AS (
        SELECT s.id FROM surv s LEFT JOIN labeled l ON l.id = s.id
        WHERE s.id = COALESCE(l.cluster_id, s.id))
    SELECT d.* FROM {table_expr} d WHERE d.{id_col} IN (SELECT id FROM keepers)
    )"""


def prepare_corpus_sql(
    docs_expr: str,
    bench_expr: str,
    id_col: str,
    text_col: str,
    *,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_min_overlap: int = 3,
    decontam_max_df_bench: int = 8,
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "corpus-v1",
    out_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`prepare_corpus`, composed from the stage twins
    with the same constants."""
    split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    kept = _dedup_keep_sql(docs_expr, id_col, text_col, jaccard_n, jaccard_threshold)
    clean = "(" + dc.decontaminate_sql(
        kept, bench_expr, id_col, text_col, id_col, text_col,
        n=decontam_n, min_overlap=decontam_min_overlap,
        max_df_bench=decontam_max_df_bench, select_cols="tr.*",
    ) + ")"
    quality = ts.text_quality_sql(clean, id_col, text_col)
    good = f"""(
    SELECT * FROM {clean}
    WHERE {id_col} IN (SELECT {id_col} FROM ({quality}) WHERE quality_score >= {min_quality})
    )"""
    split = sa.hash_split_sql(good, id_col, split_weights, seed=split_seed)
    return f"SELECT {out_cols} FROM ({split})"
