"""Model-free language identification — Cavnar & Trenkle 1994
("N-Gram-Based Text Categorization", SDAIR): rank a document's most
frequent character n-grams and pick the language whose COMPILE-TIME
literal profile minimizes the out-of-place distance.

The reference surface moves multilingual channel text to BigQuery
(omnichannel_to_bq.py:143-201 loads whatever the API returns, any
locale); a training-data pipeline additionally needs language ID as a
routing/filter primitive (per-language dedup, per-language quality
thresholds), so this completes the text-analysis family beside the
quality scores and the JS drift gate.

Method (the paper's, with the determinism pinned): lower + whitespace
tokenize (the module-standard tokenizer), pad each word as ``_word_``,
emit character 1-3-grams, rank the document's top ``profile_len`` by
(count DESC, gram ASC), and score each candidate language by
Σ |doc_rank − lang_rank| with missing grams costing the maximum
penalty (= ``profile_len``).  Prediction = argmin distance, ties to
the lexicographically smaller language code.  All counts, ranks, and
distances are exact integers — nothing floats until the accuracy
report's single rounded division.

The language profiles are compile-time literals (public linguistic
knowledge: high-frequency character n-grams of each language,
word-boundary padded) injected into BOTH engines as a VALUES table —
the DSIR/holt-weights discipline: no training executes in either
engine, so the gate hashes the full prediction surface.

Scale: the n-gram explosion is map-side (≤ 3 rows per character — the
shingle-explosion class); one partial-aggregated count shuffle on
(doc, gram); one per-doc window for the rank cut; the profile join is
a broadcast of |langs| × profile_len literal rows; the argmin is one
more partial agg.  Linear in corpus bytes, no self-joins, no driver
collects — the 100 TB shape.

NOTE on the testdata: /root/testdata documents.text is synthetic
English-vocabulary noise for EVERY lang label, so the accuracy gate
honestly measures ~majority-class there — the gate pins the
MEASUREMENT, not a quality claim; real multilingual discrimination is
pinned by tests/test_llm_ops.py on genuine snippets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: rank-ordered high-frequency character n-grams per language (1-based
#: rank = list position + 1).  Word-boundary '_' padding per the paper.
#: Public linguistic knowledge; shared verbatim with the SQL twin.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (
        "_", "e", "t", "a", "o", "n", "i", "s", "r", "h",
        "e_", "th", "he", "_t", "t_", "s_", "d", "l", "the", "_th",
        "he_", "an", "in", "er", "nd", "_a", "on", "re", "and", "_an",
        "nd_", "ing", "ng_", "_of", "of_", "ed_", "is_", "_is", "to_", "_to",
    ),
    "es": (
        "_", "e", "a", "o", "s", "n", "r", "l", "i", "d",
        "a_", "e_", "s_", "de", "_d", "en", "el", "la", "os", "_de",
        "de_", "er", "es", "on", "as", "ar", "que", "_qu", "ue_", "_la",
        "la_", "_el", "el_", "os_", "ón_", "ció", "ión", "es_", "nte", "_es",
    ),
    "de": (
        "_", "e", "n", "i", "r", "s", "t", "a", "d", "h",
        "n_", "e_", "en", "er", "ch", "de", "ei", "ie", "in", "nd",
        "en_", "er_", "ch_", "sch", "die", "_di", "ie_", "der", "_de", "und",
        "_un", "nd_", "ein", "_ei", "ich", "ung", "ng_", "ber", "gen", "cht",
    ),
    "fr": (
        "_", "e", "s", "a", "i", "t", "n", "r", "u", "l",
        "e_", "s_", "t_", "es", "le", "de", "en", "on", "nt", "re",
        "es_", "de_", "_de", "le_", "_le", "les", "ent", "nt_", "ion", "_la",
        "la_", "que", "_qu", "ue_", "ou", "ai", "eu", "é", "é_", "un",
    ),
    "zh": (
        "的", "一", "是", "不", "了", "人", "我", "在", "有", "他",
        "这", "中", "大", "来", "上", "国", "个", "到", "说", "们",
        "为", "子", "和", "你", "地", "出", "道", "也", "时", "年",
        "得", "就", "那", "要", "下", "以", "生", "会", "自", "着",
    ),
}

#: document profile length AND the missing-gram penalty (the paper's
#: "maximum distance") — one constant so both stay in lockstep.
PROFILE_LEN = 40

#: character n-gram orders emitted (1..3; padded words are >= 3 chars,
#: so no empty-sequence guard is needed in either engine).
MAX_N = 3

# n-gram emission as two row-generating explodes (codegen Generate
# operators) rather than nested transform() lambdas: higher-order
# lambdas are interpreted per element, and the lambda form measured
# ~2x slower on the corpus gram pass (r15 optimization round).  Same
# (id, g) multiset — substring(w, i, n) over the same (i, n) grid.
_GRAM_NS = list(range(1, MAX_N + 1))


def _doc_top_grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, top): each document's top ``PROFILE_LEN`` grams as ONE
    rank-ordered array — ``sort_array`` ascending on (−count, gram) is
    exactly the (count DESC, gram ASC) ``row_number`` order (counts are
    positive bigints; (count, gram) pairs are unique per doc after the
    count aggregate, so the order is total).  Shape: the rank cut runs
    inside the per-doc aggregate, so the old per-doc window exchange+sort
    is gone — two partial-aggregated shuffles total."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w0"),
    ).filter(F.col("w0") != "")
    padded = words.select(
        "id", F.concat(F.lit("_"), F.col("w0"), F.lit("_")).alias("w")
    )
    grams = (
        padded.select("id", "w", F.explode(F.array(*[F.lit(n) for n in _GRAM_NS])).alias("n"))
        .select("id", "w", "n", F.explode(F.expr("sequence(1, length(w) - n + 1)")).alias("i"))
        .select("id", F.expr("substring(w, i, n)").alias("g"))
    )
    counts = grams.groupBy("id", "g").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return counts.groupBy("id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct((-F.col("c")).alias("nc"), F.col("g")))
            ),
            1,
            PROFILE_LEN,
        ).alias("top")
    )


def langid_predict(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document language prediction: (id, lang_pred, dist) where
    ``dist`` is the winning language's exact integer out-of-place
    distance.  Documents with no tokens produce no row (nothing to
    profile — the caller's null-routing decision, surfaced not
    defaulted).  See the module docstring for method and scale.

    Shape (r15 optimization round): the per-language out-of-place sums
    run MAP-SIDE over each doc's rank-ordered top-gram array — one
    integer fold per language against a literal gram→rank map (the same
    ``coalesce(abs(rk − lrk), PROFILE_LEN)`` terms the old ×|langs|
    crossJoin + broadcast-profile join + two aggregation exchanges
    produced; integer sums are order-free), and the argmin is ``least``
    over (dist, lang) structs ≡ the old ``min_by(lang, struct(dist,
    lang))`` + ``min(dist)`` pair exactly (smaller-code tie-break
    included).  Four shuffles become two."""

    def _dist(lang: str) -> Column:
        lut = F.expr(
            "map(%s)"
            % ", ".join(
                f"'{g}', CAST({r + 1} AS BIGINT)"
                for r, g in enumerate(LANG_PROFILES[lang])
            )
        )
        oop = F.transform(
            F.col("top"),
            lambda s, i: F.coalesce(
                F.abs((i + 1).cast("bigint") - F.element_at(lut, s["g"])),
                F.lit(PROFILE_LEN).cast("bigint"),
            ),
        )
        return F.aggregate(oop, F.lit(0).cast("bigint"), lambda acc, v: acc + v)

    best = F.least(
        *[
            F.struct(_dist(lang).alias("d"), F.lit(lang).alias("l"))
            for lang in sorted(LANG_PROFILES)
        ]
    )
    return _doc_top_grams(df, id_col, text_col).select(
        F.col("id").alias(id_col), best["l"].alias("lang_pred"), best["d"].alias("dist")
    )


def _profile_values_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{g}', {r + 1})"
        for lang, grams in sorted(LANG_PROFILES.items())
        for r, g in enumerate(grams)
    )
    return rows


def langid_predict_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`langid_predict` — identical tokenizer,
    literal profile table, integer out-of-place sums, and argmin
    tie-break."""
    lang_rows = ", ".join(f"('{lang}')" for lang in sorted(LANG_PROFILES))
    return f"""
    WITH words AS (
        SELECT {id_col} AS id,
               '_' || w || '_' AS w
        FROM (SELECT {id_col},
                     UNNEST(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
              FROM {table})
        WHERE w <> ''),
    grams AS (
        SELECT id,
               UNNEST(flatten(list_transform(range(1, {MAX_N + 1}), n ->
                   list_transform(range(1, length(w) - n + 2), i ->
                       substr(w, CAST(i AS INT), CAST(n AS INT)))))) AS g
        FROM words),
    counts AS (
        SELECT id, g, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2),
    docprof AS (
        SELECT id, g, CAST(rk AS BIGINT) AS rk FROM (
            SELECT id, g, ROW_NUMBER() OVER (PARTITION BY id
                                             ORDER BY c DESC, g) AS rk
            FROM counts)
        WHERE rk <= {PROFILE_LEN}),
    langs(lang) AS (VALUES {lang_rows}),
    profiles(lang, g, lrk) AS (VALUES {_profile_values_sql()}),
    scored AS (
        SELECT d.id, l.lang,
               CAST(SUM(COALESCE(abs(d.rk - p.lrk), {PROFILE_LEN})) AS BIGINT) AS dist
        FROM docprof d
        CROSS JOIN langs l
        LEFT JOIN profiles p ON p.lang = l.lang AND p.g = d.g
        GROUP BY 1, 2)
    SELECT id AS {id_col}, lang AS lang_pred, dist FROM (
        SELECT id, lang, dist,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, lang) AS rn
        FROM scored)
    WHERE rn = 1
    """


def langid_accuracy(
    df: DataFrame, id_col: str, text_col: str, label_col: str
) -> DataFrame:
    """Per-label accuracy of :func:`langid_predict` against a labeled
    column: (lang, n, n_correct, n_unclassified, accuracy) — the
    measurement gate the survey commissions.  ``n`` counts EVERY labeled
    document (LEFT join: a no-token document with no prediction stays in
    the denominator and is surfaced in ``n_unclassified``, never silently
    dropped — an inner join would overstate accuracy and could make an
    all-empty label vanish from the report).  Exact integer counts;
    accuracy is ONE rounded division."""
    pred = langid_predict(df, id_col, text_col)
    joined = df.select(
        F.col(id_col), F.col(label_col).alias("lang")
    ).join(pred, id_col, "left")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.coalesce(
                    (F.col("lang_pred") == F.col("lang")).cast("bigint"), F.lit(0)
                )
            ).alias("n_correct"),
            F.sum(F.col("lang_pred").isNull().cast("bigint")).alias("n_unclassified"),
        )
        .select(
            "lang",
            "n",
            "n_correct",
            "n_unclassified",
            F.round(
                F.col("n_correct").cast("double") / F.col("n").cast("double"), 6
            ).alias("accuracy"),
        )
    )


def langid_accuracy_sql(
    table: str, id_col: str, text_col: str, label_col: str
) -> str:
    """DuckDB twin of :func:`langid_accuracy` — same LEFT join so
    unclassified documents stay in the denominator."""
    pred = langid_predict_sql(table, id_col, text_col)
    return f"""
    WITH pred AS ({pred}),
    joined AS (
        SELECT t.{label_col} AS lang, p.lang_pred
        FROM {table} t LEFT JOIN pred p ON p.{id_col} = t.{id_col})
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN lang_pred IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unclassified,
           round(CAST(SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM joined GROUP BY 1
    """
