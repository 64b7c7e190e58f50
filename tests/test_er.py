"""Golden-record survivorship (operators/er.py): rule semantics, total
tie orders, NULL handling, singleton coverage."""

from datapipeline_omnichanneltobigquery_spark.operators.er import golden_records


def test_golden_records_semantics(spark):
    rows = [
        (1, "alpha", "A", 5, 10),
        (2, "bravo", "B", 7, 30),
        (3, None, "A", 6, 20),
        (9, "zz", None, 1, 99),
    ]
    df = spark.createDataFrame(rows, "id long, name string, typ string, sz long, ts long")
    clusters = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "id long, cluster_id long")
    out = {
        r.cluster_id: r
        for r in golden_records(
            df,
            "id",
            clusters,
            [("name", "longest"), ("typ", "most_frequent"), ("sz", "max"), ("ts", "latest")],
            recency_col="ts",
        ).collect()
    }
    g = out[1]
    # longest: alpha/bravo tie at 5 chars -> lexicographically greatest wins
    assert g.name == "bravo"
    # most_frequent: A appears twice, B once
    assert g.typ == "A"
    assert g.sz == 7
    assert g.ts == 30  # latest by recency
    assert g.n_members == 3
    # singleton: own cluster, own values, NULL typ stays NULL
    s = out[9]
    assert (s.name, s.typ, s.sz, s.n_members) == ("zz", None, 1, 1)


def test_fs_weights_hand_computed(spark):
    """fs_weights ≡ the by-hand Fellegi-Sunter estimate on a tiny labeled
    pair set: m/u are Laplace-smoothed agreement rates per class, the
    weights their log ratios; field order is deterministic."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.er import fs_weights

    # 3 matches (field1 agrees 3/3, field2 1/3); 2 non-matches
    # (field1 agrees 0/2, field2 1/2)
    rows = [
        (True, True, True),
        (True, True, False),
        (True, True, False),
        (False, False, True),
        (False, False, False),
    ]
    df = spark.createDataFrame(rows, "y boolean, f1 boolean, f2 boolean")
    out = {r.field: r for r in fs_weights(df, "y", ["f1", "f2"]).collect()}
    assert set(out) == {"f1", "f2"}
    assert (out["f1"].n_match, out["f1"].n_unmatch) == (3, 2)
    m1, u1 = (3 + 1) / (3 + 2), (0 + 1) / (2 + 2)
    assert out["f1"].m == round(m1, 6) and out["f1"].u == round(u1, 6)
    assert abs(out["f1"].w_agree - (math.log(m1) - math.log(u1))) < 1e-6
    assert abs(out["f1"].w_disagree - (math.log(1 - m1) - math.log(1 - u1))) < 1e-6
    m2, u2 = (1 + 1) / (3 + 2), (1 + 1) / (2 + 2)
    assert abs(out["f2"].w_agree - (math.log(m2) - math.log(u2))) < 1e-6
    # an informative field gets a positive agree weight, negative disagree
    assert out["f1"].w_agree > 0 > out["f1"].w_disagree
