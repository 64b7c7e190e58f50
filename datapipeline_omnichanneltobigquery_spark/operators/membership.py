"""Explicit Bloom-filter membership screening (SURVEY.md §2.2 extension
surface: approximate membership at scale).

The 100 TB problem this solves: screening a huge probe side (every document
in the corpus) against a membership set (benchmark fingerprints, a blocklist,
yesterday's keys) without shuffling the probe side at all.  A semi-join
shuffles or broadcasts the VALUES; a Bloom filter compresses the set into a
fixed-size bit table (``m_bits`` total, as ``m_bits/WORD_BITS`` bigint words) that
is bounded BY CONSTRUCTION — so the probe is a pure map-side expression
over a literal copy of that table: zero probe-side shuffle of any kind.  False positives happen
at the standard (1 − e^{−kn/m})^k rate and are one-sided: a true member is
NEVER missed.

Spark ships ``bloom_filter_agg``/``might_contain`` natively; this module
builds the filter EXPLICITLY (md5-salted positions, bit_or over words) so
the result is a plain DataFrame both engines can compute — the DuckDB twin
constructs the identical bit table, which makes even the false positives
deterministic and hash-checkable.  Use the native aggregate when
cross-engine reproducibility doesn't matter; the plan shape is the same.

No reference counterpart (omnichannel_to_bq.py has no membership screens);
the pattern is standard (Bloom CACM'70; Spark's own runtime row-level
filtering).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long, md5_long_sql

#: default geometry: 2^16 bits ≈ 1057 bigint words; at n=4k members, k=4
#: gives an FP rate under 1e-3 — and the words table is ~8 KiB regardless
#: of probe size.
DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 4

#: bits packed per bigint word: 62, not 64 — DuckDB's ``<<`` is
#: overflow-checked and rejects 1 << 63, while Spark's shiftleft wraps
#: silently; 62 keeps every word positive on both engines.
WORD_BITS = 62


def _positions(value, m_bits: int, k: int):
    """The k salted bit positions of one value — md5-based, engine-shared."""
    return [
        md5_long(F.concat(F.lit(f"bloom{i}:"), value)) % F.lit(m_bits)
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, value_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """Build the filter: (word_idx, word) — ``m_bits/WORD_BITS`` bigint rows OR-ing
    every member's k salted bit positions.  One explode (k rows per member)
    + one partial-aggregated groupBy; the output size is a constant of the
    geometry, independent of member count."""
    pos = F.explode(F.array(*_positions(F.col(value_col), m_bits, k))).alias("p")
    return (
        df.select(pos)
        .select(
            (F.col("p") / WORD_BITS).cast("bigint").alias("word_idx"),
            # shiftleft needs a column shift amount -> SQL expr form
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} AS INT))").alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("b").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    value_col: str,
    words: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    out_col: str = "maybe_member",
) -> DataFrame:
    """``probe`` + a boolean ``out_col``: true iff ALL k bits are set (a
    member always tests true; a non-member tests true at the FP rate).

    Plan: the bit table is bounded BY CONSTRUCTION (≤ m_bits/WORD_BITS
    bigints, ~8 KiB at the default geometry), so it is materialized ONCE
    into a dense literal array and the probe becomes a single map-side
    conjunction of k ``element_at``/bit-AND tests — zero probe-side
    shuffle, zero join, no synthetic row ids (an earlier form round-tripped
    through ``monotonically_increasing_id`` + groupBy, which both shuffled
    the probe and broke if the probe's row order wasn't recompute-stable).
    The one bounded ``collect`` here is the same class as the IVF probe's
    centroid-id collect: geometry-constant metadata, never data."""
    n_words = (m_bits + WORD_BITS - 1) // WORD_BITS
    dense = [0] * n_words
    for r in words.collect():  # bounded: ≤ n_words rows by construction
        dense[int(r["word_idx"])] = int(r["word"])
    p = probe.withColumn("__bloom_words", F.lit(dense))
    pos_cols = _positions(F.col(value_col), m_bits, k)
    for i, pos in enumerate(pos_cols):
        p = p.withColumn(f"__bp{i}", pos)
    test = None
    for i in range(k):
        word = F.element_at(
            F.col("__bloom_words"), (F.col(f"__bp{i}") / WORD_BITS).cast("int") + F.lit(1)
        )
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__bp{i} % {WORD_BITS} AS INT))")
        hit = word.bitwiseAND(bit) != 0
        test = hit if test is None else test & hit
    return p.withColumn(out_col, test).drop(
        "__bloom_words", *[f"__bp{i}" for i in range(k)]
    )


def bloom_screen_sql(
    members_expr: str,
    probe_expr: str,
    member_value: str,
    probe_id: str,
    probe_value: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    out_col: str = "maybe_member",
) -> str:
    """DuckDB twin of bloom_build + bloom_probe over the same md5-salted
    positions and 62-bit word packing — identical bit table, identical
    (one-sided) false positives."""
    mem_parts = []
    prb_parts = []
    for i in range(k):
        msalted = md5_long_sql(f"concat('bloom{i}:', {member_value})")
        psalted = md5_long_sql(f"concat('bloom{i}:', {probe_value})")
        mem_parts.append(
            f"            SELECT ({msalted}) % {m_bits} AS p FROM {members_expr}"
        )
        prb_parts.append(
            f"            SELECT {probe_id} AS pid, ({psalted}) % {m_bits} AS p"
            f" FROM {probe_expr}"
        )
    mem_pos = "\n            UNION ALL\n".join(mem_parts)
    prb_pos = "\n            UNION ALL\n".join(prb_parts)
    return f"""
    WITH mpos AS (
{mem_pos}
    ),
    words AS (
        SELECT CAST(p // 62 AS BIGINT) AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INTEGER)) AS word
        FROM mpos GROUP BY 1
    ),
    ppos AS (
{prb_pos}
    ),
    hits AS (
        SELECT pp.pid,
               SUM(CASE WHEN (COALESCE(w.word, 0) & (CAST(1 AS BIGINT) << CAST(pp.p % 62 AS INTEGER))) <> 0
                        THEN 1 ELSE 0 END) AS n_set
        FROM ppos pp LEFT JOIN words w ON w.word_idx = CAST(pp.p // 62 AS BIGINT)
        GROUP BY 1
    )
    SELECT pid AS {probe_id}, n_set = {k} AS {out_col} FROM hits
    """
