"""PII detection and redaction (SURVEY.md §2.2 extension surface — the
privacy-scrub stage every LLM training pipeline runs between raw crawl and
tokenization; reference analogue: the cleaning step of
omnichannel_to_bq.py's transform stage, generalized to content).

Pattern-based detectors for the canonical structured-PII types: emails,
IPv4 addresses, US SSNs, 16-digit card numbers, and phone numbers.  Each
detector is an anchored regex evaluated by ``regexp_extract_all`` /
``regexp_replace`` — pure map-side expressions in WholeStageCodegen, no
shuffle anywhere: the operator costs one scan at any corpus size.

Determinism contract (the oracle-gate discipline):

* Patterns avoid every construct Java regex and DuckDB's RE2 disagree on
  (no backreferences, no lookaround); for these patterns both engines
  produce identical non-overlapping leftmost match sequences.
* Redaction is STAGED — email → ipv4 → ssn → card → phone — and each
  stage's count is taken on the PREVIOUS stage's output, so a card number
  is never double-counted as a phone and the per-type counts are exactly
  reproducible in the SQL twin (which applies the same stages in the same
  order with RE2's 'g' flag).
* The staged order also makes redaction idempotent: replacement tokens
  (``<EMAIL>`` etc.) contain no digits, so later stages can't re-match
  inside them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: (name, pattern, replacement) — staged order IS the contract (see module
#: docstring): a type's matches are counted and redacted before any later
#: type sees the text, so overlapping families (ssn/card/phone digit runs)
#: resolve identically in both engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b", "<CARD>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, clean_text, n_email, n_ipv4, n_ssn, n_card, n_phone, n_pii) —
    per-document PII counts and the fully redacted text.  One map-side
    projection; every row survives (NULL text ⇒ NULL clean_text, zero
    counts)."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col)]
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    total = None
    for c in counts:
        total = c if total is None else total + c
    return df.select(
        cols[0],
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(cur)
        .alias("clean_text"),
        *counts,
        total.cast("long").alias("n_pii"),
    )


def pii_scrub_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`pii_scrub` — same patterns, same staged order
    (RE2 and Java regex agree on these constructs), 'g' flag because
    DuckDB's regexp_replace is first-match-only by default."""
    stages = []
    prev = f"COALESCE({text_col}, '')"
    count_exprs = []
    for name, pat, repl in PII_PATTERNS:
        count_exprs.append(f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) AS n_{name}")
        stages.append(f"regexp_replace({prev}, '{pat}', '{repl}', 'g')")
        prev = stages[-1]
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
    WITH scrubbed AS (
        SELECT {id_col},
               CASE WHEN {text_col} IS NULL THEN NULL ELSE {prev} END AS clean_text,
               {', '.join(count_exprs)}
        FROM {table}
    )
    SELECT {id_col}, clean_text,
           {', '.join(f'n_{name}' for name, _, _ in PII_PATTERNS)},
           CAST({total} AS BIGINT) AS n_pii
    FROM scrubbed
    """


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-level PII prevalence: per type, total matches and documents
    affected — the go/no-go report before a corpus ships to training.
    One partial-aggregated pass over :func:`pii_scrub`'s projection."""
    scrubbed = pii_scrub(df, id_col, text_col)
    aggs = []
    for name, _, _ in PII_PATTERNS:
        aggs.append(F.sum(f"n_{name}").cast("long").alias(f"total_{name}"))
        aggs.append(
            F.sum((F.col(f"n_{name}") > 0).cast("long")).cast("long").alias(f"docs_{name}")
        )
    return scrubbed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_pii") > 0).cast("long")).cast("long").alias("docs_any"),
        *aggs,
    )


def pii_report_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`pii_report` (over the scrub twin)."""
    aggs = []
    for name, _, _ in PII_PATTERNS:
        aggs.append(f"CAST(SUM(n_{name}) AS BIGINT) AS total_{name}")
        aggs.append(f"CAST(SUM(CASE WHEN n_{name} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_{name}")
    return f"""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_any,
           {', '.join(aggs)}
    FROM ({pii_scrub_sql(table, id_col, text_col)})
    """
