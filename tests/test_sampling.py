"""Dataset selection operators: the properties that make hash-based
sampling auditable — determinism, growth-stability, proportions, packing
geometry."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.operators.sampling import (
    hash_split,
    pack_sequences,
    stratified_sample,
)
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table

from tests.conftest import SF_DIR_MID

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_proportions_and_determinism(spark):
    d = read_table(spark, SF_DIR_MID, "documents")
    n = d.count()
    counts = {
        r["split"]: r["cnt"]
        for r in hash_split(d, "doc_id", WEIGHTS).groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(counts) <= set(WEIGHTS)
    for name, w in WEIGHTS.items():
        assert abs(counts.get(name, 0) / n - w) < 0.08, (name, counts)
    again = {
        r["split"]: r["cnt"]
        for r in hash_split(d, "doc_id", WEIGHTS).groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == again


def test_split_stable_under_corpus_growth(spark):
    """The contamination contract: a doc's split depends only on (seed, id),
    so splitting HALF the corpus and the WHOLE corpus must agree on the
    shared docs."""
    d = read_table(spark, SF_DIR_MID, "documents")
    half = d.filter(F.col("doc_id") % 2 == 0)
    full_map = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id", WEIGHTS).collect()}
    half_map = {r["doc_id"]: r["split"] for r in hash_split(half, "doc_id", WEIGHTS).collect()}
    assert half_map and all(full_map[k] == v for k, v in half_map.items())


def test_stratified_sample_hits_per_stratum_rate(spark):
    d = read_table(spark, SF_DIR_MID, "documents")
    kept = stratified_sample(d, "doc_id", "lang", {"en": 0.5}, default_fraction=1.0)
    by_lang_all = {r["lang"]: r["cnt"] for r in d.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    by_lang_kept = {r["lang"]: r["cnt"] for r in kept.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert abs(by_lang_kept["en"] / by_lang_all["en"] - 0.5) < 0.1
    for lang, cnt in by_lang_all.items():
        if lang != "en":
            assert by_lang_kept.get(lang, 0) == cnt  # fraction 1.0 keeps all


def test_pack_sequences_geometry(spark):
    """Offsets within a shard are a gapless concatenation in key order, and
    chunk ids follow from offsets."""
    d = read_table(spark, SF_DIR_MID, "documents").withColumn(
        "n_tokens", ((F.col("n_chars") + 3) / 4).cast("bigint")
    )
    pk = pack_sequences(d, "doc_id", "n_tokens", ctx_len=512, n_shards=8)
    rows = pk.join(
        d.select(F.col("doc_id").alias("id"), "n_tokens"), "id"
    ).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["pack_offset"])
        pos = 0
        for r in shard_rows:
            assert r["pack_offset"] == pos
            assert r["chunk"] == pos // 512
            assert r["straddles"] == ((pos + r["n_tokens"] - 1) // 512 > pos // 512)
            pos += r["n_tokens"]
