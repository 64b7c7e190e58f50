"""BPE tokenizer training/application (operators/bpe.py): merge sequence
pinned against an independent in-test implementation of the textbook
algorithm (Sennrich ACL'16), application checked for reconstruction."""

from __future__ import annotations

from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
    EOW,
    bpe_apply,
    bpe_train,
)


def ref_bpe(word_freqs: dict, n_merges: int, min_pair_freq: int = 2):
    """Textbook BPE with the same tie-break (freq desc, then lexicographic)
    and the same left-to-right greedy merge."""
    vocab = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for seg, f in vocab.items():
            for i in range(len(seg) - 1):
                pairs[(seg[i], seg[i + 1])] = pairs.get((seg[i], seg[i + 1]), 0) + f
        if not pairs:
            break
        (a, b), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if f < min_pair_freq:
            break
        merges.append((a, b))
        newv: dict = {}
        for seg, fr in vocab.items():
            out: list = []
            for x in seg:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            newv[tuple(out)] = newv.get(tuple(out), 0) + fr
        vocab = newv
    return merges


def test_bpe_train_matches_reference(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, f in freqs.items() for _ in range(f))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = bpe_train(df, "text", n_merges=10)
    want = ref_bpe(freqs, 10)
    assert got == want
    assert got[0] == ("e", "s")  # classic first merge: freq 9


def test_bpe_train_spans_documents_and_ties_deterministic(spark):
    """Frequencies aggregate across documents, and rerunning training
    yields the identical merge list."""
    rows = [(i, "aa ab aa") for i in range(3)] + [(10, "ab ab")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    freqs = {"aa": 6, "ab": 5}
    m1 = bpe_train(df, "text", n_merges=5)
    assert m1 == ref_bpe(freqs, 5)
    assert m1 == bpe_train(df, "text", n_merges=5)


def test_bpe_apply_reconstructs_words(spark):
    train = spark.createDataFrame(
        [(1, "low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest")],
        ["doc_id", "text"],
    )
    merges = bpe_train(train, "text", n_merges=8)
    assert merges
    test = spark.createDataFrame(
        [(7, "newest widest lowest"), (8, "low")], ["doc_id", "text"]
    )
    out = {r.doc_id: list(r.tokens) for r in bpe_apply(test, "doc_id", "text", merges).collect()}
    # concatenating tokens (EOW marks word ends) reconstructs the text
    for did, text in [(7, "newest widest lowest"), (8, "low")]:
        joined = "".join(out[did]).replace(EOW, " ").strip()
        assert joined == text
    # trained words compress well below character count
    assert len(out[8]) < len("low") + 1
    n = {r.doc_id: r.n_tokens for r in bpe_apply(test, "doc_id", "text", merges).collect()}
    assert n[7] == len(out[7]) and n[8] == len(out[8])


def test_bpe_train_refuses_unbounded_rounds(spark):
    """The bounded-rounds contract: n_merges above BPE_MAX_MERGES is a
    loud ValueError (each merge is a sequential vocab-wide round), not a
    silent 100k-job queue."""
    import pytest as _pytest

    from datapipeline_omnichanneltobigquery_spark.operators.bpe import BPE_MAX_MERGES, bpe_train

    df = spark.createDataFrame([("a b",)], ["text"])
    with _pytest.raises(ValueError, match="BPE_MAX_MERGES"):
        bpe_train(df, "text", n_merges=BPE_MAX_MERGES + 1)


def _py_greedy_merge(tokens: list[str], a: str, b: str) -> list[str]:
    """Literal python mirror of _merge_expr's left-to-right greedy fold."""
    acc: list[str] = []
    for x in tokens:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


def test_fertility_replace_chain_equals_greedy_fold():
    """The DuckDB replace-chain segmentation (fertility_seg_expr) computes
    EXACTLY the greedy fold on adversarial vocab: cascades within one
    rule, overlapping candidates, rules consuming earlier merges, and
    the end-of-word marker."""
    import duckdb

    from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
        EOW,
        FERTILITY_MERGES,
        fertility_seg_expr,
    )

    words = [
        "the", "then", "there", "and", "andand", "inginging",
        "aaaa", "ttth", "ofof", "s", "d", "e", "xyz", "rere",
        "thethethe", "inginging", "errere", "onon", "a",
    ]
    expr = fertility_seg_expr(FERTILITY_MERGES)
    got = dict(
        duckdb.sql(
            f"SELECT w, string_split(trim({expr}), '  ') AS toks "
            "FROM (SELECT unnest(?) AS w)",
            params=[words],
        ).fetchall()
    )
    for w in words:
        toks = list(w) + [EOW]
        for a, b in FERTILITY_MERGES:
            toks = _py_greedy_merge(toks, a, b)
        assert got[w] == toks, (w, got[w], toks)


def test_tokenizer_fertility_hand_case(spark):
    """Exact byte/word/token sums and the two rounded ratios on a corpus
    small enough to count by hand; an empty-text group surfaces NULL
    ratios."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
        tokenizer_fertility,
    )

    rows = [
        ("web", "en", "the theft"),   # 'the'->[the</w>]=1 tok; 'theft'->[the,f,t,</w>]=4
        ("web", "en", "of of"),       # 'of' -> [of, </w>] = 2 toks each
        ("web", "zh", ""),            # empty text: 0 words -> NULL ratios
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {
        (r.source, r.lang): r
        for r in tokenizer_fertility(df, ["source", "lang"], "text").collect()
    }
    en = got[("web", "en")]
    # bytes: 'the theft'=9 + 'of of'=5 = 14; words: 2 + 2 = 4
    # tokens: the->1, theft->4, of->2 (x2) = 9
    assert (en.n_docs, en.n_bytes, en.n_words, en.n_tokens) == (2, 14, 4, 9)
    assert en.bytes_per_token == round(14 / 9, 6)
    assert en.tokens_per_word == round(9 / 4, 6)
    zh = got[("web", "zh")]
    assert zh.n_docs == 1 and zh.bytes_per_token is None and zh.tokens_per_word is None


def test_tokenizer_fertility_null_group_key_joins_null_safe(spark):
    """r14 review regression: a NULL group key (lang unset) aggregates on
    both the byte and token sides and must JOIN — null-unsafe equality
    would report NULL token counts for a group that has words."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
        tokenizer_fertility,
    )

    rows = [("web", None, "of of"), ("web", "en", "of")]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {
        (r.source, r.lang): r
        for r in tokenizer_fertility(df, ["source", "lang"], "text").collect()
    }
    nul = got[("web", None)]
    assert (nul.n_words, nul.n_tokens) == (2, 4)  # 'of' -> [of, </w>] x2
    assert nul.tokens_per_word == 2.0


def test_fertility_dial_replace_chain_equals_greedy_fold_32():
    """fold ≡ replace extended to the 32-merge dial table (the property
    that makes every dial point's DuckDB twin exact), plus the prefix
    invariant: the dial table's 16-prefix IS the fertility table."""
    import duckdb

    from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
        EOW,
        FERTILITY_MERGES,
        FERTILITY_MERGES_DIAL,
        fertility_seg_expr,
    )

    assert FERTILITY_MERGES_DIAL[:16] == FERTILITY_MERGES
    assert len(FERTILITY_MERGES_DIAL) == 32
    words = [
        "the", "then", "there", "and", "is", "his", "this", "to", "tot",
        "es", "yes", "essen", "ororor", "atat", "aya", "ny", "tnt",
        "senor", "onto", "notes", "arena",
    ]
    expr = fertility_seg_expr(FERTILITY_MERGES_DIAL)
    got = dict(
        duckdb.sql(
            f"SELECT w, string_split(trim({expr}), '  ') AS toks "
            "FROM (SELECT unnest(?) AS w)",
            params=[words],
        ).fetchall()
    )
    for w in words:
        toks = list(w) + [EOW]
        for a, b in FERTILITY_MERGES_DIAL:
            toks = _py_greedy_merge(toks, a, b)
        assert got[w] == toks, (w, got[w], toks)


def test_tokenizer_fertility_dial_nested_points(spark):
    """Dial rows are nested prefixes of one chain: the 16-merge point
    equals the standalone fertility report's counts; token counts are
    non-increasing in n_merges; validation rejects bad dials."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
        tokenizer_fertility,
        tokenizer_fertility_dial,
    )

    rows = [("web", "en", "the theft of essen"), ("web", "en", "is to and")]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    dial = {
        r.n_merges: r
        for r in tokenizer_fertility_dial(df, ["source", "lang"], "text").collect()
    }
    assert set(dial) == {8, 16, 32}
    flat = tokenizer_fertility(df, ["source", "lang"], "text").collect()[0]
    assert (dial[16].n_words, dial[16].n_tokens) == (flat.n_words, flat.n_tokens)
    assert dial[16].tokens_per_word == flat.tokens_per_word
    assert dial[8].n_tokens >= dial[16].n_tokens >= dial[32].n_tokens
    assert dial[8].n_words == dial[16].n_words == dial[32].n_words

    with pytest.raises(ValueError, match="ascending"):
        tokenizer_fertility_dial(df, ["source"], "text", merge_counts=(16, 8))
    with pytest.raises(ValueError, match="ascending"):
        tokenizer_fertility_dial(df, ["source"], "text", merge_counts=(8, 64))
    # r15 review: negative counts passed the ascending+bounded check but
    # Python slice semantics made BOTH engines silently wrong (merges[0:-1]
    # for the -1 point, an empty continuation for the next) — oracle-blind
    with pytest.raises(ValueError, match="ascending"):
        tokenizer_fertility_dial(df, ["source"], "text", merge_counts=(-1, 8))
    from datapipeline_omnichanneltobigquery_spark.operators.bpe import (
        tokenizer_fertility_dial_sql,
    )
    with pytest.raises(ValueError, match="ascending"):
        tokenizer_fertility_dial_sql("documents", ["source"], "text", merge_counts=(0, 8))
