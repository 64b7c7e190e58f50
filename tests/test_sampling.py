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


def _duck_ids(sql: str, sf_dir: str) -> set:
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return {r[0] for r in con.sql(f"SELECT doc_id FROM ({sql})").fetchall()}


def test_hash_split_sql_single_label_degenerates_to_literal(spark):
    """A single-label weights map must emit valid SQL (a zero-WHEN CASE is
    not) and agree with the Spark twin's F.lit fallback."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import hash_split_sql

    d = read_table(spark, SF_DIR_MID, "documents")
    sp = hash_split(d, "doc_id", {"all": 1.0})
    assert sp.filter(F.col("split") != "all").count() == 0
    sql = hash_split_sql("documents", "doc_id", {"all": 1.0})
    assert "CASE" not in sql
    got = _duck_ids(f"SELECT doc_id FROM ({sql}) WHERE split = 'all'", SF_DIR_MID)
    assert got == {r["doc_id"] for r in sp.select("doc_id").collect()}


def test_stratified_sample_sql_empty_fractions_degenerates(spark):
    """Empty fractions map: everything rides the default fraction; the SQL
    twin must emit the bare threshold, not an invalid CASE."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import (
        stratified_sample_sql,
    )

    d = read_table(spark, SF_DIR_MID, "documents")
    samp = stratified_sample(d, "doc_id", "lang", {}, default_fraction=0.3)
    sql = stratified_sample_sql("documents", "doc_id", "lang", {}, default_fraction=0.3)
    assert "CASE" not in sql
    got = _duck_ids(sql, SF_DIR_MID)
    assert got == {r["doc_id"] for r in samp.select("doc_id").collect()}
    assert 0 < len(got) < d.count()


def test_sampling_sql_escapes_quotes():
    """Labels/strata are caller data — single quotes must not break the
    generated SQL."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import (
        hash_split_sql,
        stratified_sample_sql,
    )

    sql = hash_split_sql("t", "id", {"o'brien": 0.5, "rest": 0.5})
    assert "'o''brien'" in sql
    sql2 = stratified_sample_sql("t", "id", "lang", {"don't": 0.5})
    assert "'don''t'" in sql2


def test_global_shuffle_is_permutation(spark):
    """global_pos is exactly 0..n-1; within a shard, positions are the
    contiguous range starting at the shard's offset; a different seed gives
    a different order, the same seed the identical one."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import global_shuffle

    d = read_table(spark, SF_DIR_MID, "documents")
    n = d.count()
    out = global_shuffle(d, "doc_id").collect()
    assert sorted(r.global_pos for r in out) == list(range(n))
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append((r.shard_pos, r.global_pos))
    for rows in by_shard.values():
        rows.sort()
        base = rows[0][1]
        assert [g for _, g in rows] == list(range(base, base + len(rows)))
    again = {r.id: r.global_pos for r in global_shuffle(d, "doc_id").collect()}
    assert again == {r.id: r.global_pos for r in out}
    other = {r.id: r.global_pos for r in global_shuffle(d, "doc_id", seed="epoch-2").collect()}
    assert other != again


def test_mix_report_keep_fractions(spark):
    """keep_fraction is downsample-only (≤1, max exactly 1) and realizes the
    requested target proportions among targeted groups."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import mix_report

    d = read_table(spark, SF_DIR_MID, "documents")
    targets = {"src0": 0.2, "src1": 0.1}
    rows = {r.grp: r for r in mix_report(d, "source", "n_chars", targets).collect()}
    fracs = [r.keep_fraction for r in rows.values()]
    assert max(fracs) == 1.0 and all(0 < f <= 1.0 for f in fracs)
    # kept weight of src0 vs src1 must land at the 0.2 : 0.1 target ratio
    kept0 = rows["src0"].w * rows["src0"].keep_fraction
    kept1 = rows["src1"].w * rows["src1"].keep_fraction
    assert abs(kept0 / kept1 - 2.0) < 1e-9


def test_rebalance_hits_target_mix(spark):
    """Rebalancing to a target mix realizes the requested ratios within
    hash-sampling tolerance, without upsampling any group."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import rebalance

    d = read_table(spark, SF_DIR_MID, "documents")
    targets = {"src0": 0.15, "src1": 0.15}
    out = rebalance(d, "doc_id", "source", targets, weight_col="n_chars")
    w = {
        r["source"]: r["w"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("w")).collect()
    }
    # equal targets -> roughly equal kept weight for the two boosted sources
    ratio = w["src0"] / w["src1"]
    assert 0.7 < ratio < 1.4, ratio
    # downsample-only: nothing exceeds its original weight
    orig = {
        r["source"]: r["w"]
        for r in d.groupBy("source").agg(F.sum("n_chars").alias("w")).collect()
    }
    assert all(w[g] <= orig[g] for g in w)


def test_mix_report_zero_weight_group_does_not_poison_fractions(spark):
    """A group whose summed weight is 0 must not yield an infinite/NaN ratio
    that poisons the MAX normalization — it keeps ratio 1 (its own share)."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.sampling import mix_report

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 10.0), ("b", 5.0), ("z", 0.0)],
        "src string, wt double",
    )
    rows = {r.grp: r for r in mix_report(df, "src", weight_col="wt").collect()}
    assert set(rows) == {"a", "b", "z"}
    for r in rows.values():
        assert r.keep_fraction is not None and math.isfinite(r.keep_fraction)
        assert 0.0 < r.keep_fraction <= 1.0


def test_negative_samples_contract(spark):
    """Every anchor gets exactly k negatives, never itself, ranks 1..k,
    and the draw is deterministic across invocations."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    out = negative_samples(df, "doc_id", F.col("doc_id") < 10, k=3, n_buckets=8)
    rows = out.collect()
    by_anchor = {}
    for r in rows:
        assert r.neg_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append(r.neg_rank)
    assert set(by_anchor) == set(range(10))
    assert all(sorted(v) == [1, 2, 3] for v in by_anchor.values())
    again = negative_samples(df, "doc_id", F.col("doc_id") < 10, k=3, n_buckets=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_priority_sample_contract(spark):
    """k rows come back, estimates never fall below the true weight, and
    when the population fits inside k the sample is exhaustive with EXACT
    estimates (tau = 0 -> est_weight == weight)."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import priority_sample

    rows = [(i, 10 * (i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "w"])

    out = priority_sample(df, "id", "w", k=8).collect()
    assert len(out) == 8
    assert all(r.est_weight >= float(r.weight) for r in out)

    full = priority_sample(df, "id", "w", k=30).collect()
    assert len(full) == 20
    assert all(r.est_weight == float(r.weight) for r in full)


def test_pack_greedy_no_split_invariants(spark):
    """Greedy no-split packing contract: every bin's token total fits the
    budget unless it is a singleton oversized doc; a doc opening a new bin
    would NOT have fit in the previous one (greedy tightness); bin_offset
    is the running total inside the bin; determinism across runs."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import pack_greedy

    rows = [(i, 1 + (i * 37) % 400) for i in range(120)] + [(990, 5000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_greedy(df, "doc_id", "n_tokens", ctx_len=512, n_shards=4)
    got = out.join(df, out.id == df.doc_id).select("id", "shard", "bin", "bin_offset", "n_tokens")
    rows_out = sorted(
        ((r.shard, r.bin, r.bin_offset, r.id, r.n_tokens) for r in got.collect())
    )
    toks = dict(rows)
    # group by (shard, bin), ordered by bin_offset
    from collections import defaultdict

    bins = defaultdict(list)
    for shard, b, off, i, nt in rows_out:
        bins[(shard, b)].append((off, i, nt))
    for (shard, b), members in bins.items():
        members.sort()
        total = sum(nt for _, _, nt in members)
        if len(members) > 1:
            assert total <= 512, (shard, b, total)
        # offsets are the running totals
        run = 0
        for off, i, nt in members:
            assert off == run, (shard, b, i)
            run += nt
        # greedy tightness: first member would not fit in the previous bin
        if b > 0 and (shard, b - 1) in bins:
            prev_total = sum(nt for _, _, nt in bins[(shard, b - 1)])
            first_nt = members[0][2]
            assert prev_total + first_nt > 512, (shard, b)
    # oversized doc is a singleton bin
    big = [(s, b) for (s, b), m in bins.items() if any(i == 990 for _, i, _ in m)]
    assert len(big) == 1 and len(bins[big[0]]) == 1
    # determinism
    again = sorted(
        ((r.shard, r.bin, r.bin_offset, r.id)
         for r in pack_greedy(df, "doc_id", "n_tokens", ctx_len=512, n_shards=4).collect())
    )
    assert again == [t[:4] for t in rows_out]


def test_hrw_sharding_minimal_movement(spark):
    """HRW growth property: adding a shard moves ~1/(N+1) of keys and every
    mover lands ON the new shard (old argmax unchanged among old shards);
    removal reassigns ONLY the removed shard's keys.  Assignment is a pure
    projection — zero exchanges."""
    from datapipeline_omnichanneltobigquery_spark.operators.sharding import (
        hrw_shard,
        shard_assignments,
    )
    from datapipeline_omnichanneltobigquery_spark.plans import audit

    keys = spark.range(2000).withColumnRenamed("id", "k")
    both = keys.select(
        "k",
        hrw_shard(F.col("k"), 8).alias("s8"),
        hrw_shard(F.col("k"), 9).alias("s9"),
    )
    assert audit.exchange_count(both) == 0, audit.plan_string(both)
    rows = both.collect()
    movers = [r for r in rows if r.s8 != r.s9]
    # every mover lands on the NEW shard (id 8)
    assert movers and all(r.s9 == 8 for r in movers)
    # expected fraction 1/9 ≈ 11%; allow a generous band at n=2000
    frac = len(movers) / len(rows)
    assert 0.06 < frac < 0.18, frac
    # removal face: keys NOT on the removed shard keep their assignment
    stay = [r for r in rows if r.s9 != 8]
    assert all(r.s8 == r.s9 for r in stay)
    # shard_assignments face covers all rows
    assert shard_assignments(keys, "k", 8).count() == 2000


def test_rate_cap_floors_pre_1970_buckets(spark, duck):
    """VERDICT r9 #3: `div` truncates toward zero, `//` floors — a
    pre-1970 timestamp must land in the FLOORED window on both engines.
    23:30 on 1969-12-31 belongs to the window starting 23:00 that day
    (win_start = -3600s in micros), not to the hour-0 window truncation
    would pick; and the Spark bucket must equal DuckDB's to the
    microsecond."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.sampling import (
        rate_cap,
        rate_cap_sql,
    )

    rows = [
        (1, 10, dt.datetime(1969, 12, 31, 23, 30)),
        (2, 10, dt.datetime(1969, 12, 31, 23, 45)),
        (3, 10, dt.datetime(1970, 1, 1, 0, 15)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: (r.win_start, r.in_window_rank)
        for r in rate_cap(df, "user_id", "ts", "event_id", 3600, 5).collect()
    }
    hour_us = 3600 * 1_000_000
    assert got[1] == (-hour_us, 1)
    assert got[2] == (-hour_us, 2)  # same pre-epoch window, floored
    assert got[3] == (0, 1)         # post-epoch window unaffected
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE pre70 AS SELECT * FROM (VALUES "
        "(1, 10, TIMESTAMP '1969-12-31 23:30:00'),"
        "(2, 10, TIMESTAMP '1969-12-31 23:45:00'),"
        "(3, 10, TIMESTAMP '1970-01-01 00:15:00')) t(event_id, user_id, ts)"
    )
    oracle = {
        r[0]: (r[3], r[4])
        for r in duck.execute(
            rate_cap_sql("pre70", "user_id", "ts", "event_id", 3600, 5)
        ).fetchall()
    }
    assert oracle == got


def test_weighted_reservoir_contract(spark):
    """A-Res (Efraimidis-Spirakis) contract: exactly n survivors, keys in
    (0, 1], non-positive/NULL weights excluded, deterministic under the
    seed, and the inclusion law favors heavy items (a weight-10000 item
    beats weight-1 items almost surely at this pool size)."""
    from datapipeline_omnichanneltobigquery_spark.operators.sampling import (
        weighted_reservoir,
    )

    rows = [(i, 1) for i in range(200)] + [(1000, 10_000), (1001, 0), (1002, -5)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_reservoir(df, "doc_id", "w", n=20).collect()
    assert len(got) == 20
    ids = {r.doc_id for r in got}
    assert 1001 not in ids and 1002 not in ids  # w <= 0 never sampled
    assert 1000 in ids  # the heavy item wins a slot
    assert all(0.0 < r.res_key <= 1.0 for r in got)
    again = {r.doc_id for r in weighted_reservoir(df, "doc_id", "w", n=20).collect()}
    assert again == ids  # deterministic under the seed
    other = {
        r.doc_id
        for r in weighted_reservoir(df, "doc_id", "w", n=20, seed="ares-v2").collect()
    }
    assert other != ids  # the seed actually drives the draw
