"""Information-retrieval scoring over the documents table: TF-IDF / BM25.

A training-data pipeline uses these to quality-filter and to retrieve
topical subsets ("find docs about X") without an embedding model.  Both are
pure relational compositions over the token inverted index:

* tf: one groupBy (doc, term) over exploded tokens;
* df/idf: one groupBy (term) over the distinct postings;
* scoring: join the query terms (broadcast — a query is tiny) to the
  postings, weight, and sum per doc.

Scale: the inverted index is the shuffle (tokens, not documents); the query
side always broadcasts; the final per-doc sum is a key shuffle on doc id.
Nothing is quadratic and nothing collects.

Cross-engine determinism: tf/df/dl are integers; idf and the BM25 kernel
use double `ln`/division, which agree bitwise between the JVM and DuckDB's
libm on this platform — scores are additionally rounded to 6 decimals on
BOTH engines so the oracle hash never rides on a last-ulp difference, and
ranking ties always break on doc id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def _tokens_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
    toks AS (SELECT {id_col} AS id,
                    UNNEST(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS term
             FROM {table}),
    tok AS (SELECT id, term FROM toks WHERE term <> '')
    """


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 score of every matching document for a bag of query terms
    (Robertson/Sparck Jones idf, the Okapi formulation).  Returns
    (id, n_hits, score) for docs containing at least one query term,
    score rounded to 6 decimals (see module docstring).

    Scale shape: the token stream is semi-joined to the broadcast query
    BEFORE the (id, term) aggregate, so the tf shuffle carries only
    query-term postings — and the broadcast document-frequency table is
    therefore O(|query|) rows, never the corpus vocabulary (df counts for
    the query terms are identical either way).  Corpus stats (n_docs,
    avgdl) ride one broadcast row kept in-plan: the whole score is a
    single lazy plan with zero driver actions."""
    spark = df.sparkSession
    tok = _tokens(df, id_col, text_col)
    dl = tok.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))], "term string")
    tf_q = tok.join(F.broadcast(q), "term").groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    hits = tf_q.join(F.broadcast(dfreq), "term").join(dl, "id").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    kernel = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    per_term = hits.select("id", "term", (idf * kernel).alias("w"))
    # ordered sum: sort_array over (term, w) structs makes the double
    # addition order deterministic — same order as the oracle's ORDER BY term
    return (
        per_term.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "w"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["w"],
                ),
                6,
            ).alias("score"),
        )
    )


def bm25_scores_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    terms = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    return f"""
    WITH {_tokens_sql(table, id_col, text_col)},
    dl AS (SELECT id, COUNT(*) AS dl FROM tok GROUP BY id),
    stats AS (SELECT (SELECT COUNT(DISTINCT {id_col}) FROM {table}) AS n_docs,
                     (SELECT AVG(dl) FROM dl) AS avgdl),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    q(term) AS (VALUES {terms}),
    hits AS (
        SELECT tf.id, tf.term,
               ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
               * (tf * ({k1} + 1.0))
               / (tf + {k1} * (1.0 - {b} + {b} * dl.dl / avgdl)) AS w
        FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                JOIN dl ON dl.id = tf.id, stats
    )
    SELECT id, COUNT(*) AS n_hits,
           ROUND(SUM(w ORDER BY term), 6) AS score
    FROM hits GROUP BY id
    """
