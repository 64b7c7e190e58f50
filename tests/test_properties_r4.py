"""Property-based tests (hypothesis) for the round-4 operators:
decontamination's cap/complement contracts and resampling's grid/fill
invariants hold on arbitrary inputs, checked against naive in-Python
oracles."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from datapipeline_omnichanneltobigquery_spark.operators.decontam import (
    contamination_pairs,
    decontaminate,
)
from datapipeline_omnichanneltobigquery_spark.operators.timeseries import resample_ffill

words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
texts = st.lists(words, min_size=1, max_size=8).map(" ".join)
corpora = st.lists(texts, min_size=1, max_size=6)


def _ngrams(text: str, n: int) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(train_texts=corpora, bench_texts=corpora)
def test_contamination_matches_naive_set_oracle(spark, train_texts, bench_texts):
    """n_overlap equals the naive |ngrams(train) ∩ ngrams(bench)| for every
    reported pair, pairs below min_overlap are absent, and capped pairs are
    a subset of uncapped pairs."""
    n, k = 2, 2
    train = spark.createDataFrame(list(enumerate(train_texts)), ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench_texts)], ["doc_id", "text"]
    )
    got = {
        (r.train_id, r.bench_id): r.n_overlap
        for r in contamination_pairs(
            train, bench, "doc_id", "text", "doc_id", "text", n=n, min_overlap=k
        ).collect()
    }
    expect = {}
    for ti, tt in enumerate(train_texts):
        for bi, bt in enumerate(bench_texts):
            ov = len(_ngrams(tt, n) & _ngrams(bt, n))
            if ov >= k:
                expect[(ti, 100 + bi)] = ov
    assert got == expect

    capped = {
        (r.train_id, r.bench_id)
        for r in contamination_pairs(
            train, bench, "doc_id", "text", "doc_id", "text",
            n=n, min_overlap=k, max_df_bench=1,
        ).collect()
    }
    assert capped <= set(expect)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(train_texts=corpora, bench_texts=corpora)
def test_decontaminate_is_exact_complement(spark, train_texts, bench_texts):
    train = spark.createDataFrame(list(enumerate(train_texts)), ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench_texts)], ["doc_id", "text"]
    )
    kw = dict(n=2, min_overlap=1, max_df_bench=2)
    flagged = {
        r.train_id
        for r in contamination_pairs(
            train, bench, "doc_id", "text", "doc_id", "text", **kw
        ).collect()
    }
    kept = {
        r.doc_id
        for r in decontaminate(train, bench, "doc_id", "text", "doc_id", "text", **kw).collect()
    }
    assert kept == set(range(len(train_texts))) - flagged


obs_lists = st.lists(
    st.tuples(
        st.integers(0, 2),                      # key
        st.integers(0, 10_800),                 # offset seconds within 3 h
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(obs=obs_lists)
def test_resample_matches_naive_oracle(spark, obs):
    """Grid size and every forward-filled value equal a naive per-key
    Python replay, for arbitrary observation patterns."""
    base = dt.datetime(2024, 1, 1)
    rows = [(k, base + dt.timedelta(seconds=s), v) for k, s, v in obs]
    df = spark.createDataFrame(rows, ["uid", "ts", "v"])
    step = 3600
    got = {}
    for r in resample_ffill(df, "uid", "ts", "v", step).collect():
        got[(r.uid, r.sample_ts)] = r.value

    expect = {}
    by_key: dict[int, dict] = {}
    for k, s, v in obs:
        d = by_key.setdefault(k, {})
        d[s] = max(d[s], v) if s in d else v  # same-tick MAX contract
    for k, d in by_key.items():
        lo, hi = min(d), max(d)
        t0 = -(-lo // step) * step  # ceil
        t1 = (hi // step) * step
        for t in range(t0, t1 + 1, step):
            last = max((s for s in d if s <= t), default=None)
            expect[(k, base + dt.timedelta(seconds=t))] = d[last]
    assert got == expect
