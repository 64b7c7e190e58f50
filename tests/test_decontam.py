"""Semantics + plan-shape tests for benchmark decontamination
(operators/decontam.py) beyond oracle parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.operators.decontam import (
    contamination_pairs,
    decontaminate,
)


def _corpus(spark):
    train = spark.createDataFrame(
        [
            # contains the bench doc's 4-gram "the quick brown fox" verbatim
            (1, "intro text then the quick brown fox jumps over things"),
            # shares nothing with the bench set
            (2, "completely unrelated words about spark shuffles and joins"),
            # shares ONLY the boilerplate line that every bench doc carries
            (3, "copyright header all rights reserved plus original content here"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [
            (101, "copyright header all rights reserved the quick brown fox runs"),
            (102, "copyright header all rights reserved some eval question text"),
            (103, "copyright header all rights reserved another eval item body"),
        ],
        ["doc_id", "text"],
    )
    return train, bench


def test_contamination_pairs_flags_verbatim_ngram(spark):
    train, bench = _corpus(spark)
    pairs = contamination_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", n=4, min_overlap=1
    )
    got = {(r.train_id, r.bench_id) for r in pairs.collect()}
    assert (1, 101) in got  # verbatim 4-gram leak found
    assert not any(t == 2 for t, _ in got)  # clean doc untouched


def test_bench_df_cap_drops_boilerplate(spark):
    """The 'copyright header all rights' 4-gram appears in ALL 3 bench docs;
    with max_df_bench=2 it leaves the probe, so doc 3 (boilerplate-only
    overlap) is no longer flagged while the real leak (doc 1) still is."""
    train, bench = _corpus(spark)
    uncapped = contamination_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", n=4, min_overlap=1
    )
    assert any(r.train_id == 3 for r in uncapped.collect())
    capped = contamination_pairs(
        train, bench, "doc_id", "text", "doc_id", "text",
        n=4, min_overlap=1, max_df_bench=2,
    )
    got = {(r.train_id, r.bench_id) for r in capped.collect()}
    assert not any(t == 3 for t, _ in got)
    assert (1, 101) in got


def test_decontaminate_keeps_complement(spark):
    """decontaminate(train) == train MINUS the flagged train ids — exactly."""
    train, bench = _corpus(spark)
    kept = decontaminate(
        train, bench, "doc_id", "text", "doc_id", "text",
        n=4, min_overlap=1, max_df_bench=2,
    )
    flagged = {
        r.train_id
        for r in contamination_pairs(
            train, bench, "doc_id", "text", "doc_id", "text",
            n=4, min_overlap=1, max_df_bench=2,
        ).collect()
    }
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3} - flagged


def test_overlap_count_is_distinct_intersection(spark):
    """n_overlap counts DISTINCT shared shingles even when a shingle repeats
    inside a document (the per-doc shingle sets are distinct by
    construction)."""
    train = spark.createDataFrame(
        [(1, "a b c d a b c d a b c d")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "a b c d x y z w")], ["doc_id", "text"])
    rows = contamination_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", n=4, min_overlap=1
    ).collect()
    # train 4-gram set: {a b c d, b c d a, c d a b, d a b c}; bench contains
    # only 'a b c d' among those -> exactly 1, not one per repetition
    assert [(r.train_id, r.bench_id, r.n_overlap) for r in rows] == [(1, 9, 1)]


def test_probe_join_is_broadcast(spark):
    """The discovery join must broadcast the bench shingle index — the
    corpus side is probed map-side, no shuffle for discovery."""
    train, bench = _corpus(spark)
    pairs = contamination_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", n=4, min_overlap=1
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sql_twin_matches_spark_without_cap(spark):
    """The uncapped branch of contamination_pairs_sql (no df-cap CTE) is a
    faithful twin: Spark and DuckDB agree on an in-memory corpus."""
    import duckdb

    from datapipeline_omnichanneltobigquery_spark.operators.decontam import (
        contamination_pairs_sql,
    )

    train, bench = _corpus(spark)
    con = duckdb.connect()
    con.register("train_t", train.toPandas())
    con.register("bench_t", bench.toPandas())
    sql = contamination_pairs_sql(
        "train_t", "bench_t", "doc_id", "text", "doc_id", "text", n=4, min_overlap=1
    )
    duck = {(int(a), int(b), int(c)) for a, b, c in con.sql(sql).fetchall()}
    got = {
        (r.train_id, r.bench_id, r.n_overlap)
        for r in contamination_pairs(
            train, bench, "doc_id", "text", "doc_id", "text", n=4, min_overlap=1
        ).collect()
    }
    assert got == duck and got


def test_semantic_pairs_catch_paraphrase_direction(spark):
    """A corpus vector parallel to an eval vector (the paraphrase case:
    same meaning, different words, no shared n-gram) is flagged at
    cosine 1.0; an orthogonal vector stays clean.  The keep face returns
    exactly the complement."""
    from datapipeline_omnichanneltobigquery_spark.operators.decontam import (
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    dim = 4
    rows = [
        (100, [1.0, 0.0, 0.0, 0.0]),   # eval item
        (1, [2.0, 0.0, 0.0, 0.0]),     # paraphrase: parallel, cos = 1
        (2, [0.0, 3.0, 0.0, 0.0]),     # orthogonal: cos = 0
        (3, [1.0, 1.0, 0.0, 0.0]),     # 45 degrees: cos ~ 0.7071
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = df.filter(F.col("vec_id") < 100)
    eval_set = df.filter(F.col("vec_id") >= 100)

    pairs = {
        (r.corpus_id, r.eval_id): r.cos_sim
        for r in semantic_contamination_pairs(
            corpus, eval_set, threshold=0.5, dim=dim
        ).collect()
    }
    assert set(pairs) == {(1, 100), (3, 100)}
    assert abs(pairs[(1, 100)] - 1.0) < 1e-12
    assert abs(pairs[(3, 100)] - 2**-0.5) < 1e-12

    kept = sorted(
        r.vec_id
        for r in semantic_decontaminate(
            corpus, eval_set, threshold=0.5, dim=dim
        ).collect()
    )
    assert kept == [2]


def test_semantic_decontaminate_keeps_null_id_rows(spark):
    """left_anti NULL-key semantics: a corpus row with a NULL id matches
    nothing in the contaminated list and is KEPT (the decontaminate_sql
    NOT EXISTS contract) — and its vectors still screen by value."""
    from datapipeline_omnichanneltobigquery_spark.operators.decontam import (
        semantic_decontaminate,
    )

    rows = [
        (None, [0.0, 1.0]),           # NULL id, orthogonal to eval -> kept
        (1, [1.0, 0.0]),              # contaminated -> dropped
        (7, [1.0, 0.0]),              # eval item
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semantic_decontaminate(
        df.filter(F.col("vec_id").isNull() | (F.col("vec_id") < 7)),
        df.filter(F.col("vec_id") == 7),
        threshold=0.5,
        dim=2,
    ).collect()
    assert [r.vec_id for r in kept] == [None]


def test_decontaminate_combined_unions_both_screens(spark):
    """The combined keep face drops a doc flagged by EITHER screen: doc 1
    leaks a verbatim 3-gram (no embedding neighbor), doc 2 is an embedding
    paraphrase (no shared 3-gram), doc 3 is clean on both."""
    from datapipeline_omnichanneltobigquery_spark.operators.decontam import (
        decontaminate_combined,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),  # verbatim 3-gram leak
            (2, "completely different wording here"),  # paraphrase (vector) leak
            (3, "nothing shared with the suite"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(9, "quick brown fox somewhere else")], ["doc_id", "text"]
    )
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # orthogonal to the eval vector
            (2, [0.0, 1.0]),   # cosine 1.0 vs eval — paraphrase twin
            (3, [1.0, 0.0]),
            (9, [0.0, 1.0]),   # the eval suite's embedding
        ],
        "vec_id long, embedding array<float>",
    )
    kept = decontaminate_combined(
        docs,
        bench,
        vecs.filter(F.col("vec_id") != 9),
        vecs.filter(F.col("vec_id") == 9),
        n=3,
        min_overlap=1,
        threshold=0.5,
        dim=2,
    ).collect()
    assert [r.doc_id for r in kept] == [3]
