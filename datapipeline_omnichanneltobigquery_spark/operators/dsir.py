"""DSIR-style data selection: hashed n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method).  Score every document by how much its
hashed n-gram distribution looks like a TARGET corpus rather than the
raw pool: log w(x) = Σ_features ln( p_target(b) / q_raw(b) ), with the
feature space hashed into a fixed number of buckets so both
distributions are dense, constant-size tables.

Spark shape: one tokenize pass builds the positional bigram stream with
its target/raw flag; ONE partial-aggregated groupBy produces the
(n_buckets ≤ 256)-row count table for BOTH distributions (sum of flag /
sum of 1−flag — no second scan); the per-occurrence log ratio joins
against that broadcast-sized table and folds per document in POSITION
order (the bigram_logprob ordered-fold discipline — a distributed float
sum would be order-nondeterministic).  Laplace +1 smoothing keeps every
ratio finite.

Determinism: exact integer counts everywhere; the only floats are one
division pair + one ln per occurrence and the ordered per-doc fold,
rounded to 6 — the established LM-scoring rails, so the DuckDB twin
hash-matches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long, md5_long_sql


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """(id, is_target, n_feats, dsir_logw): per-document hashed-bigram
    importance log-weight of the raw pool against the target slice
    (``target_col`` is a boolean column of ``df``).  Select raw docs with
    the HIGHEST weights to shift the pool toward the target distribution;
    target docs are scored too (their weights calibrate the scale).
    Documents with fewer than 2 tokens have no bigrams and fold to 0.0
    (kept — row identity)."""
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(target_col).cast("int").alias("tgt"),
            F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "pos", "tok"
            ),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("id").orderBy("pos")
    grams = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "id",
            "tgt",
            "pos",
            (md5_long(F.concat_ws(" ", "tok", "nxt")) % n_buckets).alias("b"),
        )
    )
    # one aggregate carries BOTH distributions (no second corpus scan);
    # the table is <= n_buckets rows — broadcast-sized by construction
    counts = (
        grams.groupBy("b")
        .agg(
            F.sum("tgt").cast("long").alias("ct"),
            F.sum(F.lit(1) - F.col("tgt")).cast("long").alias("cr"),
        )
        .localCheckpoint()
    )
    totals = counts.agg(
        F.sum("ct").cast("long").alias("tt"), F.sum("cr").cast("long").alias("tr")
    )
    lw = F.log(
        (
            (F.col("ct") + F.lit(1)).cast("double")
            / (F.col("tt") + F.lit(int(n_buckets))).cast("double")
        )
        / (
            (F.col("cr") + F.lit(1)).cast("double")
            / (F.col("tr") + F.lit(int(n_buckets))).cast("double")
        )
    )
    scored = (
        grams.join(F.broadcast(counts), "b")
        .crossJoin(F.broadcast(totals))
        .select("id", "tgt", "pos", lw.alias("lw"))
    )
    per_doc = scored.groupBy("id").agg(
        F.max("tgt").alias("tgt"),
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "lw"))),
                F.lit(0.0),
                lambda acc, x: acc + x["lw"],
            ),
            6,
        ).alias("dsir_logw"),
    )
    ids = df.select(
        F.col(id_col).alias("id"), F.col(target_col).cast("int").alias("tgt0")
    ).distinct()
    return ids.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        (F.coalesce("tgt", F.col("tgt0")) == 1).alias("is_target"),
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        (F.coalesce("dsir_logw", F.lit(0.0)) + F.lit(0.0)).alias("dsir_logw"),
    )


def dsir_logweights_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    target_sql: str,
    n_buckets: int = 256,
) -> str:
    """DuckDB twin of :func:`dsir_logweights` — same hash buckets, same
    Laplace smoothing, same position-ordered fold.  ``target_sql`` is a
    boolean SQL expression over the table's columns."""
    bucket = md5_long_sql("array_to_string(w[i:i+1], ' ')") + f" % {int(n_buckets)}"
    return f"""
    WITH src AS (
        SELECT {id_col} AS id, CASE WHEN {target_sql} THEN 1 ELSE 0 END AS tgt,
               regexp_split_to_array(trim(lower({text_col})), '\\s+') AS w
        FROM {table_sql}
    ),
    grams AS (
        SELECT id, tgt, i - 1 AS pos, {bucket} AS b
        FROM src, UNNEST(range(1, len(w))) AS u(i)
        WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    counts AS (
        SELECT b, CAST(SUM(tgt) AS BIGINT) AS ct,
               CAST(SUM(1 - tgt) AS BIGINT) AS cr
        FROM grams GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
                   CAST(SUM(cr) AS BIGINT) AS tr FROM counts),
    scored AS (
        SELECT g.id, g.tgt, g.pos,
               ln((CAST(ct + 1 AS DOUBLE) / CAST(tt + {int(n_buckets)} AS DOUBLE))
                  / (CAST(cr + 1 AS DOUBLE) / CAST(tr + {int(n_buckets)} AS DOUBLE))) AS lw
        FROM grams g JOIN counts USING (b) CROSS JOIN tot
    ),
    per_doc AS (
        SELECT id, MAX(tgt) AS tgt, CAST(COUNT(*) AS BIGINT) AS n_feats,
               round(list_sum(list_transform(
                   list(struct_pack(pos := pos, lw := lw) ORDER BY pos),
                   s -> s.lw)), 6) AS dsir_logw
        FROM scored GROUP BY id
    ),
    ids AS (SELECT DISTINCT {id_col} AS id,
                   CASE WHEN {target_sql} THEN 1 ELSE 0 END AS tgt0
            FROM {table_sql})
    SELECT i.id AS {id_col},
           COALESCE(p.tgt, i.tgt0) = 1 AS is_target,
           COALESCE(p.n_feats, 0) AS n_feats,
           COALESCE(p.dsir_logw, 0.0) + 0.0 AS dsir_logw
    FROM ids i LEFT JOIN per_doc p ON p.id = i.id
    """
