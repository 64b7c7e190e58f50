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
