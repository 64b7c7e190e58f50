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
from pyspark.sql import DataFrame, Window

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
    avgdl) ride one broadcast row kept in-plan.

    Subplan reuse: ``dl`` (one small row per doc) and ``tf_q`` (query-term
    postings only — tiny) are each referenced twice downstream, and
    Catalyst recomputes a referenced subtree from the scan; without
    materialization the compiled plan tokenizes the corpus FIVE times
    (the round-7 plan-audit finding).  Both are localCheckpointed — the
    dedup.py shared-stream discipline — so the corpus is scanned ≤3
    times total (dl, tf_q, n_docs), each scan column-pruned to (id, text)
    or less.  Deliberately NOT the alternative of checkpointing ``tok``:
    that would materialize the full exploded token stream (corpus-sized)
    to save one pruned scan."""
    spark = df.sparkSession
    tok = _tokens(df, id_col, text_col)
    dl = tok.groupBy("id").agg(F.count(F.lit(1)).alias("dl")).localCheckpoint()
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))], "term string")
    tf_q = (
        tok.join(F.broadcast(q), "term")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
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


# ---------------------------------------------------------------------------
# TF-IDF document-document similarity
# ---------------------------------------------------------------------------

#: candidate-generation document-frequency cap — the dedup module's
#: Zipf-head discipline (operators/dedup.py::JACCARD_MAX_DF rationale):
#: pairs are DISCOVERED through terms with df <= cap (bounding the
#: inverted-index self-join at cap * |index| rows), then scored EXACTLY
#: over all shared terms.  Recall contract: a pair is found iff it shares
#: >= 1 term rarer than the cap — near-dup/topical-dup pairs always do.
TFIDF_MAX_DF = 128


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.3,
    max_df: int = TFIDF_MAX_DF,
) -> DataFrame:
    """Document-document TF-IDF cosine pairs ≥ ``threshold`` — topical /
    near-duplicate similarity WITHOUT an embedding model (the classic
    sparse-vector complement to embedding cosine and n-gram Jaccard:
    Jaccard sees token overlap, TF-IDF weights it by informativeness).

    Weights: w = tf · (ln((N+1)/(df+1)) + 1) (smooth idf); cosine over
    the full shared-term products, normalized by per-doc L2 norms.

    Scale shape: candidates come from the df-capped inverted-index
    self-join (linear under Zipf — see TFIDF_MAX_DF); the exact dot then
    joins candidates back to the FULL postings (candidate-spine form, the
    verify_jaccard_pairs discipline).  Every double sum is an ordered
    fold over sorted terms (the BM25 idiom), and the final cosine rounds
    to 6 decimals on both engines — the oracle hash never rides a
    last-ulp difference.

    Subplan reuse: the weighted-postings frame ``w`` is referenced FOUR
    ways (norms, both sides of the df-capped self-join via ``rare``,
    ``wa``, ``wb``) and ``tf`` twice (dfreq + the w join) — compiled
    naively, Catalyst recomputes each reference from the scan and the
    plan tokenizes the corpus 18 times with zero ReusedExchange (the
    round-7 plan-audit finding; redundancy that hides at local scale is
    18 corpus scans for one job at 100 TB).  ``tf`` and ``w`` are
    therefore localCheckpointed — the dedup.py shared-stream discipline —
    bounding the whole query at 2 corpus scans (postings build + n_docs),
    with the materialized state being postings-sized (distinct doc-term
    pairs), never the raw token stream."""
    tok = _tokens(df, id_col, text_col)
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    w = tf.join(dfreq, "term").crossJoin(F.broadcast(stats)).select(
        "id",
        "term",
        "df",
        (
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            )
        ).alias("w"),
    ).localCheckpoint()
    norms = w.groupBy("id").agg(
        F.sqrt(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", (F.col("w") * F.col("w")).alias("ww")))),
                F.lit(0.0),
                lambda acc, x: acc + x["ww"],
            )
        ).alias("norm")
    )
    rare = w.filter(F.col("df") <= max_df).select("id", "term")
    a, b = rare.alias("a"), rare.alias("b")
    cand = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    wa = w.select(F.col("id").alias("id_a"), "term", F.col("w").alias("w_a"))
    wb = w.select(F.col("id").alias("id_b"), "term", F.col("w").alias("w_b"))
    prods = (
        cand.join(wa, "id_a")
        .join(wb, ["id_b", "term"])
        .select("id_a", "id_b", "term", (F.col("w_a") * F.col("w_b")).alias("p"))
    )
    dots = prods.groupBy("id_a", "id_b").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("dot")
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def tfidf_cosine_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.3,
    max_df: int = TFIDF_MAX_DF,
) -> str:
    """DuckDB twin of :func:`tfidf_cosine_pairs` — same weights, same
    df-capped candidates, same ordered sums (SUM ... ORDER BY term), same
    6-decimal rounding."""
    return f"""
    WITH {_tokens_sql(table, id_col, text_col)},
    tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table}),
    w AS (SELECT tf.id, tf.term, dfreq.df,
                 CAST(tf AS DOUBLE)
                 * (ln((CAST(n_docs AS DOUBLE) + 1.0)
                        / (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS w
          FROM tf JOIN dfreq USING (term), stats),
    norms AS (SELECT id, sqrt(SUM(w * w ORDER BY term)) AS norm
              FROM w GROUP BY id),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM (SELECT id, term FROM w WHERE df <= {max_df}) a
             JOIN (SELECT id, term FROM w WHERE df <= {max_df}) b
               ON a.term = b.term AND a.id < b.id),
    dots AS (SELECT c.id_a, c.id_b, SUM(wa.w * wb.w ORDER BY wa.term) AS dot
             FROM cand c
             JOIN w wa ON wa.id = c.id_a
             JOIN w wb ON wb.id = c.id_b AND wb.term = wa.term
             GROUP BY c.id_a, c.id_b)
    SELECT d.id_a, d.id_b,
           ROUND(d.dot / (na.norm * nb.norm), 6) AS cos_sim
    FROM dots d
    JOIN norms na ON na.id = d.id_a
    JOIN norms nb ON nb.id = d.id_b
    WHERE ROUND(d.dot / (na.norm * nb.norm), 6) >= {threshold}
    """


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` terms by smooth-idf
    TF-IDF weight (the :func:`tfidf_cosine_pairs` weighting) — the
    document-labeling / topical-routing primitive that needs no model.

    Output (id, rank, term, weight) with weight rounded to 6 decimals;
    rank ties break on the term itself, and the ranking weight is the
    identical double expression on both engines (integer counts → one
    ln + multiply), so the selected keywords hash-gate.

    Shape: one corpus scan builds the (id, term, tf) postings
    (localCheckpointed — referenced by the df aggregate and the weight
    join), one scan for n_docs, one per-doc window for the top-k."""
    tok = _tokens(df, id_col, text_col)
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    w = tf.join(dfreq, "term").crossJoin(F.broadcast(stats)).select(
        "id",
        "term",
        (
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            )
        ).alias("w"),
    )
    win = Window.partitionBy("id").orderBy(F.col("w").desc(), "term")
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "rank",
            "term",
            F.round("w", 6).alias("weight"),
        )
    )


def tfidf_keywords_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB twin of :func:`tfidf_keywords` — same weights, same
    deterministic (weight desc, term) ranking, same rounding."""
    return f"""
    WITH {_tokens_sql(table, id_col, text_col)},
    tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table}),
    w AS (SELECT tf.id, tf.term,
                 CAST(tf AS DOUBLE)
                 * (ln((CAST(n_docs AS DOUBLE) + 1.0)
                        / (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS w
          FROM tf JOIN dfreq USING (term), stats),
    ranked AS (SELECT id, term, w,
                      ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY w DESC, term) AS rank
               FROM w)
    SELECT id AS {id_col}, rank, term, ROUND(w, 6) AS weight
    FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------


def rrf_fuse(rankers: list, id_col: str, rank_col: str = "rank", k0: int = 60):
    """Reciprocal-rank fusion of N ranked candidate lists:
    ``rrf_score = Σ_i 1/(k0 + rank_i)`` (Cormack et al. SIGIR'09, k0=60),
    the standard way to combine a lexical ranker (BM25) with a semantic
    one (embedding cosine) without score calibration — only RANKS cross
    the fusion boundary, so incomparable score scales don't matter.

    Inputs are (id, rank) frames — the TOP-K lists the upstream rankers
    emit (candidate generation bounds them; this is a reranker, not a
    corpus scan).  Frames are full-outer-joined on ``id`` and the score
    is ONE fixed-order expression (coalesce(1/(k0+r_i), 0) added left to
    right) — integer ranks in, a few IEEE divisions and additions out,
    so the fused scores are bit-deterministic and engine-exact; a
    distributed float SUM over a groupBy would not be.

    Output: (id, rrf_score, n_rankers) — ``n_rankers`` counts the lists
    the id appeared in."""
    import functools

    import pyspark.sql.functions as F

    renamed = [
        r.select(F.col(id_col), F.col(rank_col).alias(f"__r{i}"))
        for i, r in enumerate(rankers)
    ]
    joined = functools.reduce(lambda a, b: a.join(b, id_col, "outer"), renamed)
    score = None
    hits = None
    for i in range(len(rankers)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r{i}").cast("double")),
            F.lit(0.0),
        )
        hit = F.col(f"__r{i}").isNotNull().cast("int")
        score = term if score is None else score + term
        hits = hit if hits is None else hits + hit
    return joined.select(
        id_col, score.alias("rrf_score"), hits.alias("n_rankers")
    )


def phrase_search(df: DataFrame, id_col: str, text_col: str, phrase: str) -> DataFrame:
    """Exact-phrase search via the POSITIONAL inverted index: every
    (doc, start_pos) where the phrase's tokens appear contiguously — the
    capability BM25's bag-of-words scoring cannot express (quoted-query
    retrieval, boilerplate-sentence lookup, citation finding).

    Scale shape: the positional postings are restricted to the phrase's
    terms BEFORE any join — the k-way positional self-join then moves
    only those postings (corpus-frequency of the query terms, not the
    corpus), joined on (id, adjacent position).  The restricted frame is
    ``localCheckpoint``-ed once, so the plan scans the source ONCE no
    matter how long the phrase (the redundant-subtree discipline; without
    it each of the k joins would recompile the tokenize-from-scan
    subtree).  Positions are assigned BEFORE the empty-token filter, so
    both engines index identical token grids.

    Output: (doc_id, start_pos), one row per occurrence."""
    terms = [t for t in phrase.strip().lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    pos = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "p", "term"
            ),
        )
        .filter(F.col("term").isin(terms))
        .localCheckpoint()
    )
    out = pos.filter(F.col("term") == terms[0]).select("id", "p")
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos.filter(F.col("term") == t).select(
            F.col("id").alias("__rid"), (F.col("p") - i).alias("__start")
        )
        out = out.join(
            nxt,
            (F.col("id") == F.col("__rid")) & (F.col("p") == F.col("__start")),
        ).select("id", "p")
    return out.select(F.col("id").alias("doc_id"), F.col("p").alias("start_pos"))


def phrase_search_sql(table: str, id_col: str, text_col: str, phrase: str) -> str:
    """DuckDB twin of :func:`phrase_search` — identical tokenization
    (positions before the empty filter) and adjacency joins."""
    terms = [t for t in phrase.strip().lower().split() if t]
    joins = []
    for i, t in enumerate(terms[1:], start=1):
        joins.append(
            f"    JOIN pos p{i} ON p{i}.id = p0.id AND p{i}.p = p0.p + {i}"
            f" AND p{i}.term = '{t}'"
        )
    join_block = "\n".join(joins)
    return f"""
    WITH toks AS (SELECT {id_col} AS id,
                         regexp_split_to_array(trim(lower({text_col})), '\\s+') AS w
                  FROM {table}),
    pos AS (SELECT id, i - 1 AS p, w[i] AS term
            FROM toks, UNNEST(range(1, len(w) + 1)) AS u(i)),
    hits AS (
        SELECT p0.id, p0.p
        FROM pos p0
{join_block}
        WHERE p0.term = '{terms[0]}'
    )
    SELECT id AS doc_id, p AS start_pos FROM hits
    """


# ---------------------------------------------------------------------------
# Trigram substring index (new r9): the pg_trgm / code-search design —
# a persisted posting-list index that answers arbitrary substring queries
# by reading only the pattern's trigram postings, never the corpus.
# ---------------------------------------------------------------------------

#: hash-bucket count for the index's partition column: small enough that
#: the directory tree stays flat, large enough that one query's pattern
#: trigrams prune most of the index's bytes at the directory level.
TRIGRAM_BUCKETS = 32


def _trigram_bucket_py(tri: str) -> int:
    """Driver-side twin of the index's bucket expression — the repo's
    md5-60-bit convention (functions/hashing.py::md5_long), so the probe
    can compute its partition filter without a JVM round-trip."""
    import hashlib

    return int(hashlib.md5(tri.encode("utf-8")).hexdigest()[:15], 16) % TRIGRAM_BUCKETS


def build_trigram_index(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist the character-trigram posting index: one (doc_id, trigram)
    row per DISTINCT trigram of lower(text), hive-partitioned by the
    md5 bucket of the trigram and sorted by trigram within each partition
    (directory pruning first, then row-group min/max pruning — the
    persisted-IVF layout discipline).  Building is one map-side explode +
    one distinct; the index scales linearly with corpus bytes."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long

    t = F.lower(F.col(text_col))
    tris = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(lower({text_col})) - 2, 0)), "
            f"i -> substr(lower({text_col}), i, 3))"
        )
    )
    postings = (
        docs.filter(F.length(t) >= 3)
        .select(F.col(id_col).alias("doc_id"), F.explode(tris).alias("trigram"))
        .withColumn("pfx", (md5_long(F.col("trigram")) % TRIGRAM_BUCKETS).cast("int"))
    )
    (
        postings.repartition("pfx")
        .sortWithinPartitions("trigram", "doc_id")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(path)
    )


def trigram_search_from_index(
    spark,
    index_path: str,
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring search through the persisted trigram index — LOSSLESS:
    any document containing ``pattern`` (case-insensitive) contains every
    one of its trigrams, so the posting intersection is a superset of the
    answer and the final ``instr`` verify makes the result EQUAL to the
    definitional full-scan LIKE (the oracle of record).  The index scan
    reads only the pattern trigrams' hash-bucket directories
    (PartitionFilters) and, inside them, only the row groups whose
    trigram min/max straddle a probe (the scan never touches the corpus;
    the verify reads just the candidate docs via a semi-join).

    Returns (id_col, pos_first) for every matching document."""
    import pyspark.sql.functions as F

    pat = pattern.lower()
    if len(pat) < 3:
        raise ValueError("trigram search needs a pattern of >= 3 characters")
    tris = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    buckets = sorted({_trigram_bucket_py(t) for t in tris})
    postings = spark.read.parquet(index_path).filter(
        F.col("pfx").isin(buckets) & F.col("trigram").isin(tris)
    )
    cands = (
        postings.groupBy("doc_id")
        .agg(F.count_distinct("trigram").alias("__k"))
        .filter(F.col("__k") == len(tris))
        .select(F.col("doc_id").alias(id_col))
    )
    pos = F.instr(F.lower(F.col(text_col)), pat)
    return (
        docs.join(cands, id_col, "left_semi")
        .filter(pos > 0)
        .select(id_col, pos.cast("bigint").alias("pos_first"))
    )


def trigram_search_sql(table: str, id_col: str, text_col: str, pattern: str) -> str:
    """DuckDB twin of :func:`trigram_search_from_index` — the DEFINITIONAL
    full-scan substring search the index path must reproduce exactly
    (losslessness proved by the hash gate)."""
    pat = pattern.lower().replace("'", "''")
    return f"""
    SELECT {id_col}, CAST(strpos(lower({text_col}), '{pat}') AS BIGINT) AS pos_first
    FROM {table}
    WHERE strpos(lower({text_col}), '{pat}') > 0
    """


def _dcg_weights_micro(k: int) -> dict[int, int]:
    """Position weights 1/log2(rank+1) for ranks 1..k, pre-rounded
    HALF-UP to integer micro-units ON THE DRIVER (python floats) and
    injected into BOTH engines as literals — k is a small constant, so
    the whole discount table is compile-time data and the engines never
    evaluate log2 at all (no cross-engine transcendental surface)."""
    import math

    return {r: math.floor(1_000_000.0 / math.log2(r + 1) + 0.5) for r in range(1, k + 1)}


def ranking_metrics(
    ranked: DataFrame,
    rels: DataFrame,
    k: int = 10,
    rel_threshold: int = 1,
) -> DataFrame:
    """Ranking-quality metrics per query — the retrieval family's EVAL
    gate, the measurement face beside the rankers (BM25/cosine/RRF), the
    same discipline as dedup_lsh_eval / similarity_*_recall: a ranker
    without a scored metric is not a deliverable.

    Inputs: ``ranked`` = (query_id, id, rank) with rank 1..k per query
    (bounded top-k lists from any ranker — never a corpus scan);
    ``rels`` = (query_id, id, rel) graded integer relevance >= 1 (zero /
    absent rows mean irrelevant).

    Returns (query_id, n_rel, hits_at_k, dcg_micro, ndcg, mrr):
    NDCG@k with gains 2^rel - 1 and the standard log2 position discount
    (Järvelin & Kekäläinen, TOIS 2002), MRR over ranks whose rel >=
    ``rel_threshold``, hit count in the top k, and the raw DCG numerator.

    Determinism: gains are exact ints, position discounts come
    pre-rounded to micro-units from :func:`_dcg_weights_micro`, so DCG
    and ideal-DCG are exact BIGINT sums whatever the shuffle order;
    ndcg = round(dcg/idcg, 6) and mrr = round(1/first_rank, 6) are the
    only float divisions.  A query with no relevant docs anywhere has
    idcg = 0 and reports NULL ndcg (undefined, surfaced — never 0
    disguised as "bad").

    Scale: all per-query frames are <= k rows after the ranked join;
    the ideal ordering ranks only each query's TOP-k relevance rows via
    one window over (rel desc, id) — per-query partitions, and the rels
    stream is first cut to k rows per query by the same window, so no
    reducer ever sorts more than one query's relevance list."""
    from pyspark.sql import Window

    w = _dcg_weights_micro(k)
    wmap = F.create_map(*[F.lit(x) for kv in w.items() for x in kv])
    # rel outside [0, 43] raises loudly: the summed term is
    # (2^rel - 1) * w_micro with w_micro = 1e6 at rank 1, so rel = 44
    # already exceeds int64 (2^44 * 1e6 > 2^63) and would WRAP silently in
    # Spark while the oracle errors; a NEGATIVE rel's fractional 2^rel
    # casts engine-divergently (trunc vs round-half-even) — both are the
    # quiet-corruption class the guards exist for
    gain = lambda c: (  # noqa: E731
        F.when(
            (F.col(c) < 0) | (F.col(c) > 43),
            F.expr(
                "CAST(raise_error('ranking_metrics: rel must be an integer in"
                " [0, 43] — negative rels cast engine-divergently and the"
                " micro-unit DCG term (2^rel * 1e6) wraps bigint past 43')"
                " AS BIGINT)"
            ),
        ).otherwise(F.pow(F.lit(2.0), F.col(c).cast("double")).cast("bigint") - 1)
    )

    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(rels, ["query_id", "id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    )
    dcg = hits.groupBy("query_id").agg(
        F.sum(gain("rel") * wmap[F.col("rank")]).cast("bigint").alias("dcg_micro"),
        F.sum((F.col("rel") >= rel_threshold).cast("int")).cast("bigint").alias("hits_at_k"),
        F.min(F.when(F.col("rel") >= rel_threshold, F.col("rank"))).alias("__first"),
    )
    iw = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("id"))
    ideal = (
        rels.filter(F.col("rel") >= 1)
        .withColumn("__ir", F.row_number().over(iw))
        .filter(F.col("__ir") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(gain("rel") * wmap[F.col("__ir")]).cast("bigint").alias("idcg_micro"),
        )
    )
    n_rel = rels.filter(F.col("rel") >= 1).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    return (
        dcg.join(ideal, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint").alias("n_rel"),
            "hits_at_k",
            "dcg_micro",
            F.when(
                F.col("idcg_micro").isNotNull() & (F.col("idcg_micro") > 0),
                F.round(
                    F.col("dcg_micro").cast("double") / F.col("idcg_micro").cast("double"), 6
                ),
            ).alias("ndcg"),
            F.coalesce(
                F.round(F.lit(1.0) / F.col("__first").cast("double"), 6), F.lit(0.0)
            ).alias("mrr"),
        )
    )


def ranking_metrics_sql(
    ranked_sql: str, rels_sql: str, k: int = 10, rel_threshold: int = 1
) -> str:
    """DuckDB twin of :func:`ranking_metrics` — identical injected
    micro-unit discount table, gains, windows, and final divisions."""
    w = _dcg_weights_micro(k)
    wcase = "CASE " + " ".join(f"WHEN {r} THEN CAST({m} AS BIGINT)" for r, m in w.items()) + " END"
    return f"""
    WITH ranked AS ({ranked_sql}),
    rels AS ({rels_sql}),
    hits AS (
        SELECT r.query_id, r.id, r.rank, COALESCE(e.rel, 0) AS rel
        FROM ranked r LEFT JOIN rels e
          ON e.query_id = r.query_id AND e.id = r.id
        WHERE r.rank <= {k}),
    dcg AS (
        SELECT query_id,
               CAST(SUM((CAST(pow(2.0, CAST(rel AS DOUBLE)) AS BIGINT) - 1)
                        * (CASE rank {wcase.replace('CASE ', '', 1)})) AS BIGINT)
                 AS dcg_micro,
               CAST(SUM(CASE WHEN rel >= {rel_threshold} THEN 1 ELSE 0 END) AS BIGINT)
                 AS hits_at_k,
               MIN(CASE WHEN rel >= {rel_threshold} THEN rank END) AS first_hit
        FROM hits GROUP BY query_id),
    ideal AS (
        SELECT query_id,
               CAST(SUM((CAST(pow(2.0, CAST(rel AS DOUBLE)) AS BIGINT) - 1)
                        * (CASE ir {wcase.replace('CASE ', '', 1)})) AS BIGINT)
                 AS idcg_micro
        FROM (SELECT query_id, rel,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY rel DESC, id) AS ir
              FROM rels WHERE rel >= 1)
        WHERE ir <= {k} GROUP BY query_id),
    nrel AS (
        SELECT query_id, COUNT(*) AS n_rel FROM rels WHERE rel >= 1 GROUP BY query_id)
    SELECT d.query_id,
           CAST(COALESCE(n.n_rel, 0) AS BIGINT) AS n_rel,
           d.hits_at_k, d.dcg_micro,
           CASE WHEN i.idcg_micro > 0
                THEN round(CAST(d.dcg_micro AS DOUBLE) / CAST(i.idcg_micro AS DOUBLE), 6)
           END AS ndcg,
           COALESCE(round(1.0 / CAST(d.first_hit AS DOUBLE), 6), 0.0) AS mrr
    FROM dcg d LEFT JOIN ideal i ON i.query_id = d.query_id
    LEFT JOIN nrel n ON n.query_id = d.query_id
    """


def bm25_scores_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, list[str]],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 for a BATCH of queries over ONE shared token stream —
    (query_id, id, n_hits, score).  Per-term BM25 weights w(term, doc)
    are query-independent (idf is the term's df; the kernel is tf/dl),
    so the corpus-side work (tokenize, doc lengths, query-term postings,
    document frequencies) runs ONCE for the union of all query terms and
    each query just sums ITS terms' weights — q bm25_scores calls would
    re-scan and re-tokenize the corpus q times for identical postings.
    Scores are bit-identical to per-query :func:`bm25_scores` (same
    ordered (term, w) fold).

    Scale: the only corpus-sized frames are the shared scans; everything
    keyed by (query_id, id) is bounded by matching postings × the number
    of queries a term appears in (the query map broadcasts)."""
    spark = df.sparkSession
    tok = _tokens(df, id_col, text_col)
    dl = tok.groupBy("id").agg(F.count(F.lit(1)).alias("dl")).localCheckpoint()
    all_terms = sorted({t for ts in queries.values() for t in ts})
    q = spark.createDataFrame([(t,) for t in all_terms], "term string")
    tf_q = (
        tok.join(F.broadcast(q), "term")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
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
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(queries.items()) for t in sorted(set(ts))],
        "query_id string, term string",
    )
    return (
        per_term.join(F.broadcast(qmap), "term")
        .groupBy("query_id", "id")
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
