"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
— the MOSS local fingerprinting algorithm) and the overlap join built on
them: the SUBSTRING-overlap detector the set-similarity family (MinHash /
Jaccard / containment) is blind to.  SURVEY.md §2.2 names "document
fingerprinting (rolling hash)" as a first-class LLM-pipeline extension;
this is its guaranteed-local form.

Algorithm: hash every token k-gram, slide a window of ``w`` consecutive
k-gram hashes over the document, and SELECT the minimum hash of each
window (ties to the SMALLEST position — a fixed deterministic choice;
classic robust winnowing picks the rightmost, either is a valid
selection rule and both engines here use the same one).  Distinct
selected (hash, position) pairs are the document's fingerprints.

Guarantee (the paper's correctness property): any shared substring of at
least ``w + k - 1`` tokens contributes at least one IDENTICAL selected
hash to both documents, so substring plagiarism/quotation above that
length is detected with recall 1 — unlike MinHash, whose detection is
probabilistic, and unlike whole-set Jaccard, which dilutes a short
shared span inside long documents.  Expected density: ~2/(w+1) of the
k-gram stream, so the fingerprint index is a small fraction of the
token volume.

Scale shape: one (id)-shuffle of the token stream feeds window ``lead``s
(k-gram stitching) and the w-frame struct-min — all per-document window
work bounded by document length; selection is map-side after that one
exchange.  The overlap join is the standard inverted-index shape with an
ABSOLUTE df cap on fingerprint postings (the dedup.py Σdf² discipline):
candidate volume ≤ cap · |index|, linear in corpus size.

Engine-exactness: 60-bit md5 k-gram hashes (functions/hashing), 1-based
contiguous token positions via row_number on BOTH engines, integer
arithmetic end-to-end — the DuckDB twin is the definitional O(n·w)
window join over the same hashes, so the hash gate proves the
window-frame decomposition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long, md5_long_sql

#: absolute fingerprint document-frequency cap for the overlap join —
#: boilerplate k-grams (license headers, navigation chrome) would
#: otherwise emit df² candidate rows; the recall contract below.
MAX_FP_DF = 64


def _kgram_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, idx, h): 60-bit md5 hash of each token ``k``-gram, with idx a
    1-BASED CONTIGUOUS position over the document's non-empty tokens
    (row_number, not the raw split offset — the SQL twin's
    generate_subscripts over the filtered list must agree exactly)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "rawpos", "tok"
        ),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("id").orderBy("rawpos")
    toks = toks.select("id", F.row_number().over(w).alias("idx"), "tok")
    wi = Window.partitionBy("id").orderBy("idx")
    leads = [F.lead("tok", j).over(wi).alias(f"_l{j}") for j in range(1, k)]
    kg = toks.select(
        "id", "idx", F.concat_ws(" ", F.col("tok"), *leads).alias("kgram"), *leads
    )
    for j in range(1, k):
        kg = kg.filter(F.col(f"_l{j}").isNotNull())
    return kg.select("id", "idx", md5_long(F.col("kgram")).alias("h"))


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """Selected winnowing fingerprints per document:
    (doc_id, pos, fp) — ``pos`` the 1-based k-gram position the selected
    hash sits at, ``fp`` the 60-bit hash.  Documents shorter than ``k``
    tokens have no k-grams and emit nothing; documents with fewer than
    ``w`` k-grams get ONE window covering all of them (the truncated-
    frame boundary both engines implement identically).

    One token-stream exchange; the w-frame struct-min and the window-
    start filter are per-document window work (state = w rows)."""
    kg = _kgram_hashes(df, id_col, text_col, k).localCheckpoint()
    wd = Window.partitionBy("id").orderBy("idx")
    frame = wd.rowsBetween(0, w - 1)
    sel = (
        kg.select(
            "id",
            "idx",
            # idx is a full-window start iff a (w-1)-ahead row exists;
            # lead shares the struct-min's (id, idx) window spec, so BOTH
            # evaluate in ONE WindowExec pass — the r11 form's unordered
            # whole-partition COUNT window forced a second pass per doc
            F.lead("idx", w - 1).over(wd).alias("__end"),
            F.min(F.struct(F.col("h"), F.col("idx"))).over(frame).alias("__m"),
        )
        # window starts: 1 .. max(n_kg - w + 1, 1); later starts would be
        # truncated REPEATS of the final full window's suffix (idx == 1
        # keeps the ONE truncated window of docs with < w k-grams)
        .filter(F.col("__end").isNotNull() | (F.col("idx") == 1))
        .select(
            F.col("id").alias("doc_id"),
            F.col("__m.idx").alias("pos"),
            F.col("__m.h").alias("fp"),
        )
        .distinct()
    )
    return sel


def _kgram_sql(table: str, id_col: str, text_col: str, k: int) -> str:
    """CTE body producing the identical (id, idx, h) stream in DuckDB —
    generate_subscripts over the FILTERED token list is 1-based
    contiguous, matching the Spark row_number."""
    return f"""
    wtoks AS (SELECT {id_col} AS id,
                     list_filter(regexp_split_to_array(trim(lower({text_col})), '\\s+'),
                                 t -> t <> '') AS wl
              FROM {table}),
    kg AS (SELECT id, i AS idx,
                  {md5_long_sql(f"array_to_string(wl[i:i+{k - 1}], ' ')")} AS h
           FROM wtoks, UNNEST(range(1, len(wl) - {k - 2})) AS u(i))
    """


def winnow_fingerprints_sql(
    table: str, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` — the DEFINITIONAL
    O(n·w) form: every window start joins its w k-grams, takes MIN(h),
    then the smallest position carrying that hash; the hash gate proves
    the Spark window-frame decomposition equals it."""
    return f"""
    WITH {_kgram_sql(table, id_col, text_col, k)},
    nk AS (SELECT id, COUNT(*) AS n FROM kg GROUP BY 1),
    ws AS (SELECT kg.id, kg.idx AS s
           FROM kg JOIN nk ON nk.id = kg.id
           WHERE kg.idx <= GREATEST(nk.n - {w - 1}, 1)),
    m AS (SELECT ws.id, ws.s, MIN(b.h) AS mh
          FROM ws JOIN kg b ON b.id = ws.id AND b.idx BETWEEN ws.s AND ws.s + {w - 1}
          GROUP BY 1, 2),
    sel AS (SELECT m.id, m.s, m.mh, MIN(b.idx) AS sp
            FROM m JOIN kg b ON b.id = m.id AND b.h = m.mh
                            AND b.idx BETWEEN m.s AND m.s + {w - 1}
            GROUP BY 1, 2, 3)
    SELECT DISTINCT id AS doc_id, sp AS pos, mh AS fp FROM sel
    """


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = MAX_FP_DF,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` DISTINCT winnowing
    fingerprint values — (id_a, id_b, n_shared), id_a < id_b.  The
    substring-overlap detector: two documents embedding the same passage
    of ≥ w + k - 1 tokens share ≥ 1 fingerprint by the winnowing
    guarantee (and long passages share proportionally many, which
    ``min_shared`` thresholds against chance k-gram collisions).

    Recall contract (the dedup.py df-cap discipline): a shared
    fingerprint participates iff its document frequency ≤ ``max_df`` —
    boilerplate k-grams selected in more than ``max_df`` documents are
    evidence of TEMPLATE text, not copying, and would emit df² candidate
    rows; the oracle applies the identical cap, so the gate stays
    definitional."""
    fps = (
        winnow_fingerprints(df, id_col, text_col, k, w)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint()
    )
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    # materialized once (lazy checkpoint): both sides of the fp self-join
    # consume this with different projections (no ReusedExchange), so the
    # df-cap join ran twice unmaterialized (r15 optimization round)
    keep = (
        fps.join(dfreq.filter(F.col("__df") <= max_df), "fp")
        .select("doc_id", "fp")
        .localCheckpoint(eager=False)
    )
    a = keep.select(F.col("doc_id").alias("id_a"), "fp")
    b = keep.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_overlap_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = MAX_FP_DF,
) -> str:
    """DuckDB twin of :func:`winnow_overlap_pairs` — same fingerprints
    (via the definitional window join), same df cap, same pair join."""
    return f"""
    WITH fp_all AS ({winnow_fingerprints_sql(table, id_col, text_col, k, w)}),
    fps AS (SELECT DISTINCT doc_id, fp FROM fp_all),
    dfreq AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_df}),
    keep AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfreq d ON d.fp = f.fp)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM keep a JOIN keep b ON b.fp = a.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {min_shared}
    """
