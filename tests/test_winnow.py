"""Winnowing fingerprints (operators/winnow.py): brute-force reference
equality, the paper's substring-detection guarantee, and the df-capped
overlap join — plus PMI collocations and exact ROC AUC (the other r11
families)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_ref(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Sequential reference: (pos, fp) selections per the module contract
    (window minima of k-gram md5-60 hashes, ties to the SMALLEST pos,
    1-based positions, one truncated window when n_kg < w)."""
    toks = [t for t in text.strip().lower().split() if t]
    kgrams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_md5_60(g) for g in kgrams]
    n = len(hs)
    if n == 0:
        return set()
    out = set()
    for s in range(max(n - w + 1, 1)):
        window = hs[s : s + w]
        mh = min(window)
        sp = s + window.index(mh)  # first (smallest pos) occurrence of min
        out.add((sp + 1, mh))  # 1-based
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from("a b c d aa bb cc".split()), min_size=0, max_size=24),
        min_size=1,
        max_size=6,
    )
)
def test_winnow_fingerprints_match_bruteforce(spark, docs):
    """The Spark window-frame struct-min selection equals the sequential
    winnowing reference for arbitrary docs — including docs shorter than
    k (no output) and docs with fewer than w k-grams (one window)."""
    from datapipeline_omnichanneltobigquery_spark.operators.winnow import (
        winnow_fingerprints,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    }
    want = {
        (i, pos, fp)
        for i, ws in enumerate(docs)
        for pos, fp in _winnow_ref(" ".join(ws), 3, 4)
    }
    assert got == want


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    """The SIGMOD'03 guarantee: two documents embedding the same passage
    of >= w + k - 1 tokens (here 6) share at least one selected
    fingerprint VALUE, whatever surrounds the passage."""
    from datapipeline_omnichanneltobigquery_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    passage = "the quick brown fox jumps high"  # 6 tokens = w + k - 1
    rows = [
        (1, f"alpha beta {passage} gamma delta epsilon"),
        (2, f"one two three four {passage}"),
        (3, "entirely different words with no shared passage at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        d: {r.fp for r in grp}
        for d, grp in __import__("itertools").groupby(
            sorted(
                winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect(),
                key=lambda r: r.doc_id,
            ),
            key=lambda r: r.doc_id,
        )
    }
    assert fps[1] & fps[2], "shared 6-token passage must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_overlap_pairs(
            df, "doc_id", "text", k=3, w=4, min_shared=1
        ).collect()
    }
    assert set(pairs) == {(1, 2)}


def test_winnow_overlap_df_cap_drops_boilerplate(spark):
    """A fingerprint selected in more than max_df documents (template
    text) is excluded from pairing — the documented recall contract."""
    from datapipeline_omnichanneltobigquery_spark.operators.winnow import (
        winnow_overlap_pairs,
    )

    boiler = "standard license header applies to this file always"
    rows = [(i, boiler) for i in range(1, 6)]  # 5 identical docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap below the df: no pairs at all survive
    assert (
        winnow_overlap_pairs(df, "doc_id", "text", min_shared=1, max_df=4).count() == 0
    )
    # cap at/above the df: all 10 pairs
    assert (
        winnow_overlap_pairs(df, "doc_id", "text", min_shared=1, max_df=5).count() == 10
    )


def test_pmi_ranks_true_collocation_above_chance_pair(spark):
    """PMI orders a low-frequency always-together pair above a
    high-frequency chance pair, and min_count drops hapax pairs."""
    from datapipeline_omnichanneltobigquery_spark.operators.textstats import (
        pmi_collocations,
    )

    # 'san francisco' always together (6x); 'the cat'/'the dog'... 'the'
    # pairs with everything; 'rare unique' occurs once (hapax)
    docs = [
        "san francisco is where the cat and the dog and the bird live",
        "the cat saw the dog near san francisco yesterday evening",
        "san francisco fog rolled over the cat and the dog",
        "in san francisco the dog chased the cat around",
        "san francisco streets and the bird above the dog",
        "the cat the dog and san francisco again rare unique",
    ]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = pmi_collocations(df, "doc_id", "text", min_count=3, k=50).collect()
    scores = {(r.term_a, r.term_b): r.pmi for r in out}
    assert ("san", "francisco") in scores
    assert ("rare", "unique") not in scores  # below min_count
    the_pairs = [v for (a, b), v in scores.items() if a == "the" or b == "the"]
    assert the_pairs, "frequent pairs present for contrast"
    assert scores[("san", "francisco")] > max(the_pairs)
    # top-1 by (pmi desc, a, b) is deterministic and the collocation wins
    assert (out[0].term_a, out[0].term_b) == ("san", "francisco")


def _auc_ref(pairs: list[tuple[int, int]]) -> float | None:
    """Brute-force tie-aware AUC: mean over (pos, neg) pairs of
    1[s_p > s_n] + 0.5*1[s_p == s_n]."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    num = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    return num / (2.0 * len(pos) * len(neg))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),       # group
            st.integers(-50, 50),    # integer score
            st.booleans(),           # label
        ),
        min_size=1,
        max_size=40,
    )
)
def test_roc_auc_matches_bruteforce(spark, rows):
    """The two-level prefix-sum AUC equals the definitional pairwise
    Mann-Whitney statistic for arbitrary groups, ties, and single-class
    groups (NULL)."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import roc_auc

    df = spark.createDataFrame(rows, "grp int, s long, y boolean")
    got = {
        r.grp: (r.n_pos, r.n_neg, r.auc)
        for r in roc_auc(df, "grp", F.col("y"), F.col("s")).collect()
    }
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, s, y in rows:
        by_g[g].append((s, int(y)))
    for g, pairs in by_g.items():
        n_pos = sum(y for _, y in pairs)
        n_neg = len(pairs) - n_pos
        want = _auc_ref(pairs)
        assert got[g][:2] == (n_pos, n_neg), g
        if want is None:
            assert got[g][2] is None, g
        else:
            assert got[g][2] is not None and abs(got[g][2] - want) <= 1e-6, (
                g, got[g][2], want,
            )


def test_roc_auc_perfect_and_inverted(spark):
    """Sanity anchors: a perfectly-separating score gives 1.0, the
    inverted score 0.0, and all-tied scores 0.5."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import roc_auc

    rows = [("g", s, s >= 10) for s in range(20)]
    df = spark.createDataFrame(rows, "grp string, s long, y boolean")
    assert roc_auc(df, "grp", F.col("y"), F.col("s")).collect()[0].auc == 1.0
    assert roc_auc(df, "grp", F.col("y"), -F.col("s")).collect()[0].auc == 0.0
    assert (
        roc_auc(df, "grp", F.col("y"), F.lit(7)).collect()[0].auc == 0.5
    )


def test_readability_hand_computed(spark):
    """Flesch reading ease ≡ the by-hand formula: word/sentence/syllable
    proxies (vowel-group runs floored at 1 per word) on known text;
    empty documents report NULL."""
    from datapipeline_omnichanneltobigquery_spark.operators.textstats import readability

    rows = [
        (1, "The cat sat. The dog ran!"),   # 6 words, 2 sentences, 6 syllables
        (2, "xyz 123"),                     # no vowels: 2 words -> 2 syllables, 1 sentence
        (3, ""),                            # empty -> NULL flesch
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in readability(df, "doc_id", "text").collect()}
    assert (out[1].n_words, out[1].n_sentences, out[1].n_syllables) == (6, 2, 6)
    want = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert abs(out[1].flesch - want) < 1e-6
    assert (out[2].n_words, out[2].n_sentences, out[2].n_syllables) == (2, 1, 2)
    assert out[3].n_words == 0 and out[3].flesch is None


def test_js_divergence_bounds_and_symmetry(spark):
    """JSD anchors: 0 for identical slices, ln 2 for disjoint
    vocabularies, symmetric under slice swap, and the __other bucket
    engages when the vocabulary exceeds top_k."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.textstats import (
        js_divergence,
    )

    rows = [
        (1, "alpha beta gamma alpha", "a"),
        (2, "alpha beta gamma alpha", "b"),   # identical distribution
        (3, "delta epsilon zeta", "c"),       # disjoint from a
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    same = js_divergence(df, "doc_id", "text", "source", "a", "b").collect()[0]
    assert same.jsd == 0.0
    disj = js_divergence(df, "doc_id", "text", "source", "a", "c").collect()[0]
    assert abs(disj.jsd - math.log(2)) < 1e-6
    ab = js_divergence(df, "doc_id", "text", "source", "a", "c").collect()[0].jsd
    ba = js_divergence(df, "doc_id", "text", "source", "c", "a").collect()[0].jsd
    assert ab == ba
    # top_k=2 folds the tail into __other on both sides
    small = js_divergence(df, "doc_id", "text", "source", "a", "c", top_k=2).collect()[0]
    assert small.n_terms <= 3 and small.jsd > 0


def test_js_divergence_empty_slice_boundary(spark):
    """ADVICE r12: an empty slice must report the SAME row on both
    engines — n_terms counts the surviving side's terms, the empty
    side's token total is NULL, and jsd is NULL (undefined divergence),
    never a silent 0.0."""
    import duckdb
    import pandas as pd

    from datapipeline_omnichanneltobigquery_spark.operators.textstats import (
        js_divergence,
        js_divergence_sql,
    )
    from tests.helpers import compare_spark_duckdb

    rows = [
        (1, "alpha beta gamma alpha", "a"),
        (2, "delta epsilon", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # slice b does not exist at all
    got = js_divergence(df, "doc_id", "text", "source", "a", "b").collect()[0]
    assert got.n_terms > 0 and got.tokens_a == 6
    assert got.tokens_b is None and got.jsd is None
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    compare_spark_duckdb(
        js_divergence(df, "doc_id", "text", "source", "a", "b"),
        con,
        js_divergence_sql("docs", "doc_id", "text", "source", "a", "b"),
    )
    # BOTH slices empty: zero terms, everything NULL, still identical
    compare_spark_duckdb(
        js_divergence(df, "doc_id", "text", "source", "x", "y"),
        con,
        js_divergence_sql("docs", "doc_id", "text", "source", "x", "y"),
    )
    both = js_divergence(df, "doc_id", "text", "source", "x", "y").collect()[0]
    assert both.n_terms == 0 and both.jsd is None


def test_roc_auc_span_overflow_raises(spark):
    """ADVICE r12: a score span past 2^58 must raise (bucket arithmetic
    would overflow into non-monotone ids and a silently wrong AUC), and
    a span that wraps bigint entirely is still caught."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import roc_auc

    rows = [("g", -(1 << 60), True), ("g", 1 << 60, False), ("g", 0, True)]
    df = spark.createDataFrame(rows, "grp string, s long, y boolean")
    with pytest.raises(SparkRuntimeException, match="roc_auc: score span"):
        roc_auc(df, "grp", F.col("y"), F.col("s")).collect()
    # the guard leaves in-range groups untouched
    ok = [("g", s, s >= 10) for s in range(20)]
    okdf = spark.createDataFrame(ok, "grp string, s long, y boolean")
    assert roc_auc(okdf, "grp", F.col("y"), F.col("s")).collect()[0].auc == 1.0


def test_shingles_df_schema_validated(spark):
    """ADVICE r12: the shingles_df fast path rejects frames that are not
    the (id, shingle) shape shingles() produces — a mismatched cache must
    fail loudly, not silently produce wrong pairs."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.dedup import (
        minhash_candidate_pairs,
        prefix_jaccard_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    bad = docs.selectExpr("doc_id AS id", "text")  # wrong second column
    with pytest.raises(ValueError, match="shingles_df must have exactly"):
        minhash_candidate_pairs(docs, "doc_id", "text", shingles_df=bad)
    with pytest.raises(ValueError, match="shingles_df must have exactly"):
        prefix_jaccard_pairs(docs, "doc_id", "text", shingles_df=bad)
    # the well-formed stream still works and matches the internal path
    sh = shingles(docs, "doc_id", "text", n=2)
    a = {tuple(r) for r in minhash_candidate_pairs(docs, "doc_id", "text", n=2).collect()}
    b = {
        tuple(r)
        for r in minhash_candidate_pairs(
            docs, "doc_id", "text", n=2, shingles_df=sh
        ).collect()
    }
    assert a == b


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(-1000, 1000)),  # (group, y)
        min_size=8,
        max_size=60,
    )
)
def test_conformal_matches_bruteforce(spark, rows):
    """conformal_intervals equals a literal python re-derivation: same
    md5 parity split, integer-bps k, k-th order statistic of the scaled
    nonconformity, and held-out coverage — including the NULL-q̂ case
    when k exceeds n_cal."""
    import hashlib
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        conformal_intervals,
    )

    df = spark.createDataFrame(
        [(g, i, y) for i, (g, y) in enumerate(rows)], "grp int, id long, y long"
    )
    got = {
        r.grp: (r.n_cal, r.n_test, r.qhat, r.coverage)
        for r in conformal_intervals(df, "grp", "id", F.col("y")).collect()
    }

    def bucket(i):
        h = hashlib.md5(f"conformal-v1:{i}".encode()).hexdigest()
        return int(h[:15], 16) % 10000

    for g in {g for g, _ in rows}:
        pts = [(i, y) for i, (gg, y) in enumerate(rows) if gg == g]
        cal = [y for i, y in pts if bucket(i) < 5000]
        test = [y for i, y in pts if bucket(i) >= 5000]
        if not cal:
            assert g not in got  # no calibration stats -> group dropped
            continue
        if not test:
            assert g not in got  # nothing held out -> no coverage row
            continue
        n, s = len(cal), sum(cal)
        k = ((n + 1) * 9000 + 9999) // 10000
        rs = sorted(abs(y * n - s) for y in cal)
        n_cal, n_test, qhat, cov = got[g]
        assert (n_cal, n_test) == (n, len(test))
        if k > n:
            assert qhat is None and cov is None
        else:
            q = rs[k - 1]
            assert qhat is not None and abs(qhat - q / n) < 1e-6
            covered = sum(1 for y in test if abs(y * n - s) <= q)
            assert abs(cov - covered / len(test)) < 1e-6


def test_jackknife_ratio_matches_bruteforce(spark):
    """jackknife_ratio equals a literal python re-derivation (micro-unit
    floors included), and a single-slice input raises rather than
    reporting a degenerate zero variance."""
    import math

    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import jackknife_ratio

    data = [("a", 100, 1), ("a", 140, 2), ("b", 90, 1), ("c", 260, 2), ("c", 10, 1)]
    df = spark.createDataFrame(data, "s string, n long, d long")
    r = jackknife_ratio(df, "s", F.col("n"), F.col("d")).collect()[0]

    per = {}
    for s, n, d in data:
        rn, rd = per.get(s, (0, 0))
        per[s] = (rn + n, rd + d)
    R = sum(n for n, _ in per.values())
    C = sum(d for _, d in per.values())
    g = len(per)
    th_u = [math.floor((R - rn) / (C - rd) * 1e6) for rn, rd in per.values()]
    # exactly as the operator: se = sqrt((g-1) * M / g^2) / 1e6
    M = g * sum(t * t for t in th_u) - sum(th_u) ** 2
    se = math.sqrt((g - 1) * M / (g * g)) / 1e6
    assert r.n_slices == g
    assert abs(r.theta - R / C) < 1e-6
    assert abs(r.se_jack - se) < 1e-6
    assert abs(r.ci_lo - (round(R / C, 6) - 1.96 * round(se, 6))) < 1e-5
    assert abs(r.ci_hi - (round(R / C, 6) + 1.96 * round(se, 6))) < 1e-5

    one = spark.createDataFrame([("only", 5, 1)], "s string, n long, d long")
    with pytest.raises(Exception, match="entire denominator"):
        jackknife_ratio(one, "s", F.col("n"), F.col("d")).collect()


def test_shapley_attribution_hand_case(spark):
    """2-channel hand case: v(∅)=1, v({a})=2, v({b})=1, v({a,b})=1 gives
    φ_a = +0.5, φ_b = −0.5 (negative credit is REAL for a channel that
    appears in weaker coalitions); Σφ = v(N) − v(∅) = 0 exactly, so
    shares are NULL (zero total credit), not a division blow-up."""
    from datapipeline_omnichanneltobigquery_spark.operators.attribution import (
        shapley_attribution,
    )

    j = spark.createDataFrame([(1,), (1,), (3,), (2,), (0,)], "mask int")
    rows = {r.channel: r for r in shapley_attribution(j, "mask", {"a": 1, "b": 2}).collect()}
    assert rows["a"].phi_scaled == 1 and rows["a"].phi == 0.5
    assert rows["b"].phi_scaled == -1 and rows["b"].phi == -0.5
    assert rows["a"].share is None and rows["b"].share is None


def test_shapley_attribution_efficiency_and_validation(spark):
    """Σ_c φ_c·n! = n!·(v(N) − v(∅)) holds exactly on a random-ish mask
    table; >MAX_CHANNELS and non-power-of-two bit maps raise."""
    import math

    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.attribution import (
        shapley_attribution,
    )

    masks = [(i * 7 + 3) % 8 for i in range(40)]  # all 3-bit coalitions hit
    j = spark.createDataFrame([(m,) for m in masks], "mask int")
    ch = {"a": 1, "b": 2, "c": 4}
    out = shapley_attribution(j, "mask", ch).collect()
    v_full = sum(1 for m in masks if m == 7)
    v_empty = sum(1 for m in masks if m == 0)
    assert sum(r.phi_scaled for r in out) == math.factorial(3) * (v_full - v_empty)

    with pytest.raises(ValueError, match="MAX_CHANNELS"):
        shapley_attribution(j, "mask", {f"c{i}": 1 << i for i in range(17)})
    with pytest.raises(ValueError, match="single bits"):
        shapley_attribution(j, "mask", {"a": 1, "b": 3})


def test_markov_attribution_matches_bruteforce(spark):
    """markov_attribution equals a python mirror of the same micro-unit
    floored fixed point (self-loops, an unreachable-after-removal branch,
    and a dangling state included); the single-channel chain gives the
    full removal effect exactly."""
    from datapipeline_omnichanneltobigquery_spark.operators.attribution import (
        MARKOV_SCALE as S,
        markov_attribution,
    )

    START, CONV, NULL = 0, 5, 6
    ch = {"a": 1, "b": 2}
    trans = [
        (START, 1, 6), (START, 2, 4),
        (1, 1, 2), (1, 2, 3), (1, CONV, 4), (1, NULL, 1),
        (2, CONV, 2), (2, NULL, 2), (2, 1, 1),
    ]
    df = spark.createDataFrame(trans, "from_state int, to_state int, cnt long")
    got = {r.channel: r for r in markov_attribution(df, ch, START, CONV, NULL).collect()}

    def absorb(removed):
        t = {}
        for i, j, c in trans:
            jj = NULL if removed and j == removed else j
            t[(i, jj)] = t.get((i, jj), 0) + c
        rows = {}
        for (i, _), c in t.items():
            rows[i] = rows.get(i, 0) + c
        p = {(i, j): c * S // rows[i] for (i, j), c in t.items() if i not in (CONV, NULL)}
        a = {CONV: S, NULL: 0}
        for _ in range(12):
            nxt = {}
            for (i, j), pm in p.items():
                nxt[i] = nxt.get(i, 0) + pm * a.get(j, 0)
            a = {CONV: S, NULL: 0} | {i: v // S for i, v in nxt.items()}
        return a.get(START, 0)

    a_base = absorb(None)
    drops = {c: a_base - absorb(st) for c, st in ch.items()}
    tot = sum(drops.values())
    for c in ch:
        r = got[c]
        assert abs(r.p_conv_base - a_base / S) < 1e-9
        assert abs(r.removal_effect - drops[c] / a_base) < 1e-6
        assert abs(r.share - drops[c] / tot) < 1e-6

    one = spark.createDataFrame(
        [(START, 1, 2), (1, CONV, 1), (1, NULL, 1)], "from_state int, to_state int, cnt long"
    )
    ra = {r.channel: r for r in markov_attribution(one, {"a": 1}, START, CONV, NULL).collect()}
    assert ra["a"].removal_effect == 1.0 and ra["a"].share == 1.0


def test_bh_fdr_matches_bruteforce(spark):
    """bh_fdr reproduces the textbook step-up on a crafted p battery
    (one rank passes BELOW a failing rank — the step-up must still
    reject everything up to the LARGEST passing k), NULL p rows are
    excluded from m and reported unrejected, and the two-sided p
    polynomial matches erf to <2e-7."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        bh_fdr,
        two_sided_p_expr,
    )

    # m=6; alpha=0.05: thresholds k/m*alpha = .00833,.01667,.025,.0333,.04167,.05
    ps = [0.001, 0.020, 0.024, 0.040, 0.045, 0.900]
    # k=1 passes, k=2 fails (.020>.01667), k=3 passes (.024<=.025), k=4 fails,
    # k=5 fails, k=6 fails -> kmax=3: ranks 1..3 rejected INCLUDING the k=2 row
    rows = [(f"h{i}", p) for i, p in enumerate(ps)] + [("h_null", None)]
    df = spark.createDataFrame(rows, "key string, p double")
    got = {r.key: r for r in bh_fdr(df, ["key"], "p", alpha_bps=500).collect()}
    assert got["h_null"].m is None and not got["h_null"].rejected
    rejected = {k for k, r in got.items() if r.rejected}
    assert rejected == {"h0", "h1", "h2"}
    assert got["h0"].m == 6 and got["h5"].rank == 6

    sf = spark.sql(
        "SELECT " + ", ".join(
            f"({two_sided_p_expr(str(z))}) AS p{i}"
            for i, z in enumerate([0.5, 1.96, 3.0])
        )
    ).collect()[0]
    for i, z in enumerate([0.5, 1.96, 3.0]):
        ref = 2 * (1 - 0.5 * (1 + math.erf(z / math.sqrt(2))))
        assert abs(sf[f"p{i}"] - ref) < 2e-7


def test_ranking_metrics_and_shapley_guards_raise(spark):
    """Out-of-range inputs fail LOUDLY: rel outside [0,43] (the int64
    bound for 2^rel * 1e6) and journey masks outside [0, 2^n)
    (credit would silently vanish from the coalition lookups)."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.attribution import (
        shapley_attribution,
    )
    from datapipeline_omnichanneltobigquery_spark.operators.ir import ranking_metrics

    ranked = spark.createDataFrame([("A", "d1", 1)], "query_id string, id string, rank int")
    bad_rels = spark.createDataFrame([("A", "d1", -1)], "query_id string, id string, rel int")
    with pytest.raises(Exception, match="rel must be"):
        ranking_metrics(ranked, bad_rels, k=3).collect()

    bad_mask = spark.createDataFrame([(4,)], "mask int")  # 2 channels -> [0,4)
    with pytest.raises(Exception, match="outside"):
        shapley_attribution(bad_mask, "mask", {"a": 1, "b": 2}).collect()


def test_qini_deciles_matches_bruteforce(spark):
    """qini_deciles equals a python re-derivation on a 40-unit synthetic
    with a real uplift signal (treated high-score units convert more),
    including the empty-arm NULL in a decile that is all-treatment."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import qini_deciles

    units = []
    for i in range(40):
        t = i % 2
        score = 40 - i
        o = 1 if (t == 1 and score > 25) or (score > 35) else 0
        units.append((i, t, o, score))
    # force an all-treatment decile: units 36-39 (lowest scores) all treated
    units = [(i, 1 if i >= 36 else t, o, s) for (i, t, o, s) in units]
    df = spark.createDataFrame(units, "id long, t int, o int, s long")
    got = {
        r.decile: r
        for r in qini_deciles(df, "id", F.col("t"), F.col("o"), F.col("s")).collect()
    }

    ordered = sorted(units, key=lambda u: (-u[3], u[0]))
    n = len(ordered)
    cum = {"ct": 0, "cc": 0, "nt": 0, "nc": 0}
    per = {}
    for rk, (i, t, o, s) in enumerate(ordered, 1):
        d = (rk - 1) * 10 // n
        row = per.setdefault(d, {"n_t": 0, "n_c": 0, "conv_t": 0, "conv_c": 0})
        row["n_t"] += t
        row["n_c"] += 1 - t
        row["conv_t"] += t * o
        row["conv_c"] += (1 - t) * o
    for d in sorted(per):
        row, r = per[d], got[d]
        assert (r.n_t, r.n_c, r.conv_t, r.conv_c) == (
            row["n_t"], row["n_c"], row["conv_t"], row["conv_c"]
        )
        cum["ct"] += row["conv_t"]; cum["cc"] += row["conv_c"]
        cum["nt"] += row["n_t"]; cum["nc"] += row["n_c"]
        if row["n_t"] > 0 and row["n_c"] > 0:
            assert abs(r.uplift - (row["conv_t"] / row["n_t"] - row["conv_c"] / row["n_c"])) < 1e-6
        else:
            assert r.uplift is None
        assert abs(r.qini - (cum["ct"] - cum["cc"] * cum["nt"] / cum["nc"])) < 1e-6

    import pytest

    bad = spark.createDataFrame([(1, 1, 1, None)], "id long, t int, o int, s long")
    with pytest.raises(Exception, match="NULL score"):
        qini_deciles(bad, "id", F.col("t"), F.col("o"), F.col("s")).collect()


def test_chi2_independence_matches_bruteforce(spark):
    """chi2_independence equals scipy-free python math on a table with a
    real association AND an absent cell (the zero-cell must contribute
    its expected mass); a perfectly independent 2x2 gives chi2 = 0; a
    guard rejects high-cardinality misuse."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        chi2_independence,
    )

    rows = (
        [("x", "p")] * 8 + [("x", "q")] * 2 + [("y", "p")] * 3 + [("y", "q")] * 7
        + [("z", "p")] * 5  # (z, q) is an ABSENT cell
    )
    with_nulls = rows + [(None, "p"), ("x", None)]  # excluded, surfaced
    df = spark.createDataFrame(with_nulls, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r.n_excluded == 2
    from collections import Counter

    cnt = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    N = len(rows)
    chi2 = sum(
        (cnt.get((a, b), 0) * N - ra[a] * cb[b]) ** 2 / (N * ra[a] * cb[b])
        for a in ra
        for b in cb
    )
    assert (r.n, r.r, r.c, r.dof) == (N, 3, 2, 2)
    assert abs(r.chi2 - chi2) < 1e-5
    assert abs(r.cramers_v - math.sqrt(chi2 / (N * 1))) < 1e-5

    indep = spark.createDataFrame(
        [("x", "p")] * 4 + [("x", "q")] * 4 + [("y", "p")] * 2 + [("y", "q")] * 2,
        "a string, b string",
    )
    assert chi2_independence(indep, "a", "b").collect()[0].chi2 == 0.0

    const = spark.createDataFrame([("x", "p"), ("y", "p")], "a string, b string")
    rc = chi2_independence(const, "a", "b").collect()[0]
    assert rc.dof == 0 and rc.chi2 is None and rc.cramers_v is None

    import pytest

    wide = spark.range(110_000).selectExpr("CAST(id AS STRING) AS a", "'q' AS b")
    with pytest.raises(ValueError, match="cells"):
        chi2_independence(wide, "a", "b")


def test_quantile_ci_matches_bruteforce(spark):
    """quantile_ci equals a python re-derivation (rank formulas, clamps,
    order-statistic selection with duplicate values), and a tiny group's
    CI honestly widens to the min/max via the clamp."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.profile import quantile_ci

    data = {
        "big": [((i * 13) % 97) * 10 for i in range(80)] + [50] * 20,  # dups
        "tiny": [7, 3, 9],
    }
    df = spark.createDataFrame(
        [(g, v) for g, vs in data.items() for v in vs], "grp string, v long"
    )
    got = {r.grp: r for r in quantile_ci(df, "grp", F.col("v")).collect()}
    q, z = 0.5, 1.959964
    for g, vs in data.items():
        n = len(vs)
        s = math.sqrt(n * q * (1 - q))
        k_lo = max(1, min(n, math.floor(n * q - z * s)))
        k_hi = max(1, min(n, math.ceil(n * q + z * s)))
        k_pt = max(1, min(n, ((n + 1) * 5000 + 9999) // 10000))
        xs = sorted(vs)
        r = got[g]
        assert (r.n, r.k_lo, r.k_point, r.k_hi) == (n, k_lo, k_pt, k_hi)
        assert (r.ci_lo, r.q_point, r.ci_hi) == (xs[k_lo - 1], xs[k_pt - 1], xs[k_hi - 1])
    assert (got["tiny"].ci_lo, got["tiny"].ci_hi) == (3, 9)  # clamped to extremes


def test_bootstrap_mean_ci_matches_bruteforce(spark):
    """bootstrap_mean_ci equals a python mirror of the md5 Poisson draws,
    replicate means, and integer-bps percentile ranks; the CI brackets
    the point estimate on a well-behaved group."""
    import hashlib

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        _POISSON1_CUM_MICRO,
        bootstrap_mean_ci,
    )

    vals = [(i, 100 + (i * 37) % 50) for i in range(40)]
    df = spark.createDataFrame([("g", i, v) for i, v in vals], "grp string, id long, y long")
    r = bootstrap_mean_ci(df, "grp", "id", F.col("y"), n_reps=50).collect()[0]

    def u(b, i):
        h = hashlib.md5(f"boot-v1:{b}:{i}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    means = []
    for b in range(50):
        swy = sw = 0
        for i, v in vals:
            w = sum(1 for t in _POISSON1_CUM_MICRO if u(b, i) >= t)
            swy += w * v
            sw += w
        if sw > 0:
            means.append(swy / sw)
    means.sort()
    beff = len(means)
    lo = max(1, (beff + 1) * (500 // 2) // 10000)
    hi = min(beff, ((beff + 1) * (10000 - 500 // 2) + 9999) // 10000)
    assert r.n == 40 and r.n_reps == beff
    assert abs(r.mean_hat - sum(v for _, v in vals) / 40) < 1e-6
    assert abs(r.ci_lo - round(means[lo - 1], 6)) < 1e-9
    assert abs(r.ci_hi - round(means[hi - 1], 6)) < 1e-9
    assert r.ci_lo <= r.mean_hat <= r.ci_hi


def test_bootstrap_mean_ci_odd_alpha_matches_duckdb(spark, duck):
    """r12 ADVICE regression: for ODD alpha_bps the Spark lo-rank used
    ((beff+1)*alpha div 2) div 10000 while the DuckDB twin pre-floored
    alpha — both now emit ((beff+1)*floor(alpha/2)) // 10000 and must
    hash-match end to end (alpha=101, the advisor's counterexample)."""
    from tests.helpers import compare_spark_duckdb

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        bootstrap_mean_ci,
        bootstrap_mean_ci_sql,
    )

    rows = [("g", i, 100 + (i * 37) % 50) for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, id long, y long")
    got = bootstrap_mean_ci(df, "grp", "id", F.col("y"), n_reps=400, alpha_bps=101)

    duck.execute("CREATE OR REPLACE TABLE boot_t AS SELECT * FROM (VALUES " +
                 ", ".join(f"('g', {i}, {y})" for _, i, y in rows) +
                 ") v(grp, id, y)")
    sql = bootstrap_mean_ci_sql("boot_t", "grp", "id", "y", n_reps=400, alpha_bps=101)
    compare_spark_duckdb(got, duck, sql)


def test_shapley_markov_sql_escapes_quoted_channel_names(duck):
    """r12 ADVICE regression: a channel name containing a single quote
    must produce RUNNABLE oracle SQL (escaped '' in the VALUES literal),
    not a syntax error."""
    from datapipeline_omnichanneltobigquery_spark.operators.attribution import (
        markov_attribution_sql,
        shapley_attribution_sql,
    )

    ch = {"o'brien": 1, "email": 2}
    sql = shapley_attribution_sql("SELECT 3 AS mask", "mask", ch)
    names = {r[0] for r in duck.execute(sql).fetchall()}
    assert names == {"o'brien", "email"}

    msql = markov_attribution_sql(
        "SELECT * FROM (VALUES (0, 1, 5), (1, 3, 3), (1, 4, 2)) t(from_state, to_state, cnt)",
        ch, start_state=0, conv_state=3, null_state=4,
    )
    mnames = {r[0] for r in duck.execute(msql).fetchall()}
    assert mnames == {"o'brien", "email"}


def test_target_encoding_matches_bruteforce_and_guards(spark):
    """target_encoding equals the literal LOO m-estimate formula on a
    hand case; singleton category with m=0 surfaces NULL; m<0 raises."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        target_encoding,
        target_encoding_sql,
    )

    # cats: a -> ys [1, 0, 1]; b -> [0]; global S=2, N=4
    rows = [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 0)]
    df = spark.createDataFrame(rows, "id long, cat string, y int")
    got = {r.id: r.te for r in target_encoding(df, "id", "cat", F.col("y"), m=2).collect()}
    S, N, m = 2, 4, 2
    for i, c, y in rows:
        n_c = 3 if c == "a" else 1
        sum_c = 2 if c == "a" else 0
        want = round(((sum_c - y) * N + m * S) / ((n_c - 1 + m) * N), 6)
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)

    got0 = {r.id: r.te for r in target_encoding(df, "id", "cat", F.col("y"), m=0).collect()}
    assert got0[4] is None  # singleton + m=0: undefined, surfaced as NULL
    assert got0[1] is not None

    with pytest.raises(ValueError, match="m must be"):
        target_encoding(df, "id", "cat", F.col("y"), m=-1)
    with pytest.raises(ValueError, match="m must be"):
        target_encoding_sql("t", "id", "cat", "y", m=-1)


def test_cohen_kappa_matches_bruteforce_and_null_contract(spark):
    """cohen_kappa equals the textbook definition on a hand contingency
    table; perfect agreement gives 1; constant raters (pe = 1) surface
    NULL, not 0."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import cohen_kappa

    # g1: classic 2x2 table — a/b cells: (y,y)=20, (y,n)=5, (n,y)=10, (n,n)=15
    rows = (
        [("g1", "y", "y")] * 20 + [("g1", "y", "n")] * 5
        + [("g1", "n", "y")] * 10 + [("g1", "n", "n")] * 15
        + [("g2", "x", "x")] * 7                      # perfect, single label -> pe=1 -> NULL
        + [("g3", "a", "a")] * 4 + [("g3", "b", "b")] * 4  # perfect, two labels -> 1.0
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {r.g: r for r in cohen_kappa(df, "g", F.col("a"), F.col("b")).collect()}

    n, agree = 50, 35
    pe_num = 25 * 30 + 25 * 20  # n_a(y)*n_b(y) + n_a(n)*n_b(n)
    want = round((n * agree - pe_num) / (n * n - pe_num), 6)
    assert (got["g1"].n, got["g1"].n_agree) == (50, 35)
    assert abs(got["g1"].kappa - want) < 1e-9
    assert got["g2"].kappa is None  # both raters constant: chance is already 1
    assert got["g3"].kappa == 1.0


def test_mann_whitney_matches_scipy_free_bruteforce(spark):
    """mann_whitney_z equals a literal python implementation of the
    tie-corrected normal approximation (U from pairwise comparisons, the
    same variance formula); degenerate groups (one-sided, all-tied)
    surface NULL."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        mann_whitney_z,
    )

    rows = (
        [("g", 1, s) for s in [3, 5, 5, 9, 12]]          # treatment
        + [("g", 0, s) for s in [1, 2, 5, 6, 7, 7]]      # control
        + [("solo", 1, 4)]                               # no negatives -> NULL
        + [("tied", i % 2, 5) for i in range(8)]         # variance 0 -> NULL
    )
    df = spark.createDataFrame(rows, "grp string, y int, s long")
    got = {r.grp: r for r in mann_whitney_z(df, "grp", F.col("y") == 1, F.col("s")).collect()}

    pos = [3, 5, 5, 9, 12]
    neg = [1, 2, 5, 6, 7, 7]
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    n1, n2 = len(pos), len(neg)
    n = n1 + n2
    from collections import Counter

    ties = Counter(pos + neg)
    tt = sum(t**3 - t for t in ties.values())
    var = (n1 * n2 / 12.0) * ((n + 1.0) - tt / (n * (n - 1.0)))
    z = (u2 - n1 * n2) / (2.0 * math.sqrt(var))
    assert (got["g"].n_pos, got["g"].n_neg) == (5, 6)
    assert abs(got["g"].z - round(z, 6)) < 1e-9
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert abs(got["g"].p_value - p) < 2e-6  # A&S poly error << round6 grid
    assert got["solo"].z is None and got["solo"].p_value is None
    assert got["tied"].z is None  # all-tied: variance degenerates


def test_cohen_kappa_null_labels_become_sentinel_category(spark):
    """r14 ADVICE regression: NULL rater labels coalesce to the explicit
    '__NULL__' category — they agree with the OTHER rater's NULLs and
    carry marginal mass, instead of acting as guaranteed disagreement
    with zero chance-correction mass."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import cohen_kappa

    rows = (
        [("g", "y", "y")] * 10
        + [("g", None, None)] * 5      # both abstain: AGREEMENT under the contract
        + [("g", "y", None)] * 3       # one-sided abstention: disagreement
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = cohen_kappa(df, "g", F.col("a"), F.col("b")).collect()[0]
    assert got.n == 18
    assert got.n_agree == 15  # 10 y/y + 5 NULL/NULL
    # python mirror with the sentinel category
    n = 18
    n_a = {"y": 13, "__NULL__": 5}
    n_b = {"y": 10, "__NULL__": 8}
    pe_num = sum(n_a[k] * n_b.get(k, 0) for k in n_a)
    want = round((n * 15 - pe_num) / (n * n - pe_num), 6)
    assert abs(got.kappa - want) < 1e-9


def test_mann_whitney_drops_null_label_and_score_rows(spark):
    """r14 ADVICE regression: rows whose label or score is NULL are
    dropped (NA omission), never silently bucketed into the control
    cohort; the surviving statistics match the NULL-free frame."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        mann_whitney_z,
    )

    clean = [("g", 1, s) for s in [3, 5, 9]] + [("g", 0, s) for s in [1, 2, 6, 7]]
    dirty = clean + [("g", None, 100), ("g", 1, None), ("g", None, None)]
    mk = lambda rows: spark.createDataFrame(rows, "grp string, y int, s long")
    got_clean = mann_whitney_z(mk(clean), "grp", F.col("y") == 1, F.col("s")).collect()[0]
    got_dirty = mann_whitney_z(mk(dirty), "grp", F.col("y") == 1, F.col("s")).collect()[0]
    assert (got_dirty.n_pos, got_dirty.n_neg) == (got_clean.n_pos, got_clean.n_neg) == (3, 4)
    assert got_dirty.z == got_clean.z
    assert got_dirty.p_value == got_clean.p_value


def test_fleiss_kappa_matches_textbook_and_guards(spark):
    """fleiss_kappa equals the literal Fleiss-1971 arithmetic on a hand
    panel; a perfect panel gives 1; one-category saturation surfaces
    NULL; unequal rater counts raise loudly."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import fleiss_kappa

    # g1: 4 items x 3 raters over categories {a, b}
    panel = {
        1: ["a", "a", "a"],
        2: ["a", "a", "b"],
        3: ["b", "b", "b"],
        4: ["a", "b", "b"],
    }
    rows = [("g1", i, c) for i, cs in panel.items() for c in cs]
    rows += [("perfect", i, "x" if i % 2 else "y") for i in range(6) for _ in range(3)]
    rows += [("sat", i, "only") for i in range(5) for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, item long, cat string")
    got = {r.g: r for r in fleiss_kappa(df, "g", "item", F.col("cat")).collect()}

    # python mirror of the exact ratio
    N, n = 4, 3
    A = sum(
        sum(cs.count(c) * (cs.count(c) - 1) for c in set(cs)) for cs in panel.values()
    )
    cj = {"a": 6, "b": 6}
    B = sum(v * v for v in cj.values())
    D = N * n * (n - 1)
    E = (N * n) ** 2
    want = round((A * E - B * D) / (D * (E - B)), 6)
    assert (got["g1"].n_items, got["g1"].n_raters) == (4, 3)
    assert abs(got["g1"].kappa - want) < 1e-9
    assert got["perfect"].kappa == 1.0
    assert got["sat"].kappa is None  # every rating one category: P_e = 1

    uneq = spark.createDataFrame(
        [("g", 1, "a"), ("g", 1, "a"), ("g", 2, "a")], "g string, item long, cat string"
    )
    with pytest.raises(Exception, match="SAME rater count"):
        fleiss_kappa(uneq, "g", "item", F.col("cat")).collect()


def test_kruskal_wallis_matches_scipy_free_bruteforce(spark):
    """kruskal_wallis equals a literal python implementation (midranks,
    H, tie correction); k=1 and all-tied degeneracies surface NULL;
    NULL sample/value rows drop."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        kruskal_wallis,
    )

    samples = {"a": [1, 3, 5, 7], "b": [2, 4, 6, 6], "c": [1, 8, 9]}
    rows = [("g", s, v) for s, vs in samples.items() for v in vs]
    rows += [("solo", "only", v) for v in [1, 2, 3]]         # k=1 -> NULL
    rows += [("tied", s, 5) for s in ["a", "b"] for _ in range(3)]  # all tied
    rows += [("g", None, 99), ("g", "a", None)]              # dropped
    df = spark.createDataFrame(rows, "g string, smp string, v long")
    got = {r.g: r for r in kruskal_wallis(df, "g", "smp", F.col("v")).collect()}

    # python mirror: midranks over the pooled values
    pooled = sorted(v for vs in samples.values() for v in vs)
    n = len(pooled)

    def midrank(v):
        less = sum(1 for x in pooled if x < v)
        cnt = pooled.count(v)
        return less + (cnt + 1) / 2

    h = (
        12.0 / (n * (n + 1))
        * sum(sum(midrank(v) for v in vs) ** 2 / len(vs) for vs in samples.values())
        - 3 * (n + 1)
    )
    from collections import Counter

    tt = sum(t**3 - t for t in Counter(pooled).values())
    h_tc = h / (1 - tt / (n**3 - n))
    assert (got["g"].k_samples, got["g"].n) == (3, 11)
    assert abs(got["g"].h - h) < 1e-6
    assert abs(got["g"].h_tie_corrected - h_tc) < 1e-6
    assert got["solo"].h is None
    assert got["tied"].h_tie_corrected is None  # correction denominator 0
    assert got["tied"].h == 0.0                 # identical rank sums


def test_expected_calibration_error_hand_case(spark):
    """ECE/MCE equal the hand-binned definition; a perfectly calibrated
    group scores 0; an out-of-range score raises loudly."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        expected_calibration_error,
    )

    # bin 0 [0, 0.1): two rows conf 0.05, one positive -> acc .5, conf .05
    # bin 9 [0.9, 1]: two rows conf 1.0, one positive -> acc .5, conf 1.0
    rows = [
        ("g", 1, 50_000), ("g", 0, 50_000),
        ("g", 1, 1_000_000), ("g", 0, 1_000_000),
        # perfectly calibrated: conf 0 with label 0, conf 1e6 with label 1
        ("cal", 0, 0), ("cal", 1, 1_000_000),
    ]
    df = spark.createDataFrame(rows, "g string, y int, s long")
    got = {
        r.g: r
        for r in expected_calibration_error(
            df, "g", F.col("y") == 1, F.col("s")
        ).collect()
    }
    gap0 = abs(1 * 1_000_000 - 100_000)     # |sy*SCALE - ss| bin 0
    gap9 = abs(1 * 1_000_000 - 2_000_000)   # bin 9
    assert got["g"].n == 4 and got["g"].n_bins_used == 2
    assert got["g"].ece == round((gap0 + gap9) / (1_000_000 * 4), 6)
    assert got["g"].mce == round(gap9 / (1_000_000 * 2), 6)
    assert got["cal"].ece == 0.0 and got["cal"].mce == 0.0

    bad = spark.createDataFrame([("g", 1, 2_000_000)], "g string, y int, s long")
    with pytest.raises(Exception, match="micro-units"):
        expected_calibration_error(bad, "g", F.col("y") == 1, F.col("s")).collect()


def test_brier_decomposition_matches_bruteforce(spark):
    """bs/rel/res/unc equal the literal Murphy-1973 arithmetic on a hand
    case, and bs == unc - res + rel + wbv (the binning residual is
    surfaced, not hidden)."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        brier_decomposition,
    )

    # two bins: conf .05/.08 (bin 0), conf .95 (bin 9)
    rows = [
        ("g", 0, 50_000), ("g", 1, 80_000),
        ("g", 1, 950_000), ("g", 1, 950_000), ("g", 0, 950_000),
    ]
    df = spark.createDataFrame(rows, "g string, y int, s long")
    got = brier_decomposition(df, "g", F.col("y") == 1, F.col("s")).collect()[0]

    S = 1_000_000
    data = [(y, s) for (_, y, s) in rows]
    n = len(data)
    bs = sum((s / S - y) ** 2 for y, s in data) / n
    ybar = sum(y for y, _ in data) / n
    unc = ybar * (1 - ybar)
    bins = {0: [(0, 50_000), (1, 80_000)], 9: [(1, 950_000), (1, 950_000), (0, 950_000)]}
    rel = sum(
        len(b) * (sum(s for _, s in b) / (len(b) * S) - sum(y for y, _ in b) / len(b)) ** 2
        for b in bins.values()
    ) / n
    res = sum(
        len(b) * (sum(y for y, _ in b) / len(b) - ybar) ** 2 for b in bins.values()
    ) / n
    assert got.n == 5
    assert abs(got.bs - bs) < 1e-6
    assert abs(got.unc - unc) < 1e-6
    assert abs(got.rel - rel) < 1e-6
    assert abs(got.res - res) < 1e-6
    assert abs(got.bs - (got.unc - got.res + got.rel + got.wbv)) < 5e-6


def test_mcnemar_matches_textbook_and_null_contracts(spark):
    """mcnemar_test equals the textbook z on a hand contingency table;
    no-discordant-pairs surfaces NULL; NULL-rater rows drop."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        mcnemar_test,
    )

    rows = (
        [("g", True, True)] * 20 + [("g", True, False)] * 9
        + [("g", False, True)] * 3 + [("g", False, False)] * 8
        + [("g", None, True), ("g", True, None)]          # dropped
        + [("agree", True, True)] * 5                      # no discordant -> NULL
    )
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
    got = {r.g: r for r in mcnemar_test(df, "g", F.col("a"), F.col("b")).collect()}
    g = got["g"]
    assert (g.n, g.n10, g.n01) == (40, 9, 3)
    z = (9 - 3) / math.sqrt(12)
    assert abs(g.z - round(z, 6)) < 1e-9
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert abs(g.p_value - p) < 2e-6
    assert got["agree"].z is None and got["agree"].p_value is None


def test_cochran_q_matches_textbook_and_guards(spark):
    """cochran_q equals the textbook statistic on a hand panel (and
    collapses to McNemar's z² at k=2); unanimity surfaces NULL; a
    missing treatment raises loudly."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import cochran_q

    panel = {  # item -> flags for treatments (a, b, c)
        1: (1, 1, 0),
        2: (1, 0, 0),
        3: (1, 1, 1),
        4: (0, 0, 0),
        5: (1, 1, 0),
        6: (1, 0, 1),
    }
    rows = [
        ("g", i, t, f)
        for i, fs in panel.items()
        for t, f in zip(("a", "b", "c"), fs)
    ]
    rows += [("unan", i, t, 1) for i in range(3) for t in ("a", "b")]
    df = spark.createDataFrame(rows, "g string, item long, t string, y int")
    got = {r.g: r for r in cochran_q(df, "g", "item", F.col("t"), F.col("y")).collect()}

    k = 3
    C = [sum(fs[j] for fs in panel.values()) for j in range(k)]
    R = [sum(fs) for fs in panel.values()]
    T = sum(C)
    q = (k - 1) * (k * sum(c * c for c in C) - T * T) / (k * T - sum(r * r for r in R))
    assert (got["g"].k_treatments, got["g"].n_items) == (3, 6)
    assert abs(got["g"].q - round(q, 6)) < 1e-9
    assert got["unan"].q is None  # every item unanimous: denominator 0

    missing = spark.createDataFrame(
        [("g", 1, "a", 1), ("g", 1, "b", 0), ("g", 2, "a", 1)],
        "g string, item long, t string, y int",
    )
    with pytest.raises(Exception, match="missing treatments"):
        cochran_q(missing, "g", "item", F.col("t"), F.col("y")).collect()


def test_cochran_q_duplicate_guard_rides_consumed_column(spark):
    """r14 ADVICE: the duplicate-(item, treatment) guard must ride a column
    the downstream aggregates CONSUME (yy), not a dedicated check column a
    projection-pruning optimizer could silently drop — pinned by firing it
    in BOTH engines."""
    import duckdb
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import (
        cochran_q,
        cochran_q_sql,
    )

    dup_rows = [
        ("g", 1, "a", 1), ("g", 1, "a", 0),  # duplicate (item 1, treatment a)
        ("g", 1, "b", 0), ("g", 2, "a", 1), ("g", 2, "b", 1),
    ]
    df = spark.createDataFrame(dup_rows, "g string, item long, t string, y int")
    with pytest.raises(Exception, match="dedupe first"):
        # the guard fires during the eager cells localCheckpoint inside
        # the builder — no separate action needed
        cochran_q(df, "g", "item", F.col("t"), F.col("y")).collect()

    sql = cochran_q_sql(
        "SELECT * FROM (VALUES ('g', 1, 'a', 1), ('g', 1, 'a', 0), "
        "('g', 1, 'b', 0), ('g', 2, 'a', 1), ('g', 2, 'b', 1)) "
        "AS v(g, item, t, y)",
        "g", "item", "t", "y",
    )
    con = duckdb.connect()
    try:
        with pytest.raises(Exception, match="dedupe first"):
            con.sql(sql).fetchall()
    finally:
        con.close()


def test_spearman_corr_hand_cases(spark):
    """rho equals the textbook rank-Pearson on a no-ties case (classic
    1 − 6Σd²/(n(n²−1)) = −0.2) and a midrank tie case (0.5); a constant
    margin surfaces NULL; NULL values drop pairwise."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import spearman_corr

    rows = [
        ("g", 1, 2), ("g", 2, 4), ("g", 3, 6), ("g", 4, 1),
        ("t", 1, 1), ("t", 1, 2), ("t", 2, 2),
        ("c", 5, 1), ("c", 5, 2),
        ("g", None, 7), ("g", 7, None),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in spearman_corr(df, "g", F.col("x"), F.col("y")).collect()}
    assert got["g"].n == 4 and got["g"].rho == -0.2
    assert got["t"].n == 3 and got["t"].rho == 0.5
    assert got["c"].n == 2 and got["c"].rho is None


def test_anova_f_matches_textbook(spark):
    """F equals the hand sum-of-squares computation (samples [1,2,3] vs
    [4,5,6] → F = 13.5); k=1 and zero-within-variance groups surface
    NULL; NULL sample keys drop."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import anova_f

    rows = (
        [("g", "a", v) for v in (1, 2, 3)]
        + [("g", "b", v) for v in (4, 5, 6)]
        + [("one", "a", v) for v in (1, 2)]          # k = 1 -> NULL
        + [("const", "a", 2), ("const", "a", 2), ("const", "b", 5), ("const", "b", 5)]
        + [("g", None, 99)]                          # dropped
    )
    df = spark.createDataFrame(rows, "g string, smp string, v long")
    got = {r.g: r for r in anova_f(df, "g", "smp", F.col("v")).collect()}
    assert (got["g"].k_samples, got["g"].n, got["g"].f) == (2, 6, 13.5)
    assert got["one"].f is None
    assert got["const"].f is None  # zero within-groups variance


def test_brown_forsythe_matches_textbook_and_even_median(spark):
    """The BF statistic equals the hand median-deviation F ([1,2,9] vs
    [4,5,6] → 72/88 = 0.818182), including an even-n sample whose
    2×median is the sum of the two middle values."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import brown_forsythe

    rows = [("g", "a", v) for v in (1, 2, 9)] + [("g", "b", v) for v in (4, 5, 6)]
    df = spark.createDataFrame(rows, "g string, smp string, v long")
    got = brown_forsythe(df, "g", "smp", F.col("v")).collect()[0]
    assert (got.k_samples, got.n) == (2, 6)
    assert got.f == round(72 / 88, 6)

    # even n: [1, 3] has med2 = 4, deviations |2v-4| = (2, 2) -> zero
    # within-variance against a spread sample stays defined
    rows2 = [("e", "a", 1), ("e", "a", 3), ("e", "b", 1), ("e", "b", 9)]
    df2 = spark.createDataFrame(rows2, "g string, smp string, v long")
    got2 = brown_forsythe(df2, "g", "smp", F.col("v")).collect()
    # a: z = (2,2); b: med2=10, z = (8,8) -> both samples constant
    # deviations -> W = 0 -> NULL (every sample internally constant)
    assert got2[0].f is None


def test_spearman_corr_null_group_key_surfaces(spark):
    """r15 review: a NULL group key is a real group — the rank joins are
    null-safe in both engines, so it must surface its own row instead of
    silently vanishing (memory defect class 2)."""
    from datapipeline_omnichanneltobigquery_spark.operators.ml_eval import spearman_corr

    rows = [(None, 1, 2), (None, 2, 4), (None, 3, 5), ("g", 1, 1), ("g", 2, 3)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in spearman_corr(df, "g", F.col("x"), F.col("y")).collect()}
    assert set(got) == {None, "g"}
    assert got[None].n == 3 and got[None].rho == 1.0
    assert got["g"].n == 2 and got["g"].rho == 1.0
