"""Upsert semantics (omnichannel_to_bq.py:176-182) + idempotency property."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.operators.upsert import upsert


def _tables(spark):
    main = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    staging = spark.createDataFrame(
        [(2, "B2", 99.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    return main, staging


def test_matched_replaced_unmatched_inserted(spark):
    main, staging = _tables(spark)
    got = {r["id"]: (r["name"], r["v"]) for r in upsert(main, staging).collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_idempotent(spark):
    main, staging = _tables(spark)
    once = upsert(main, staging)
    twice = upsert(once, staging)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_broadcast_variant_same_result(spark):
    main, staging = _tables(spark)
    a = sorted(map(tuple, upsert(main, staging).collect()))
    b = sorted(map(tuple, upsert(main, staging, broadcast_staging=True).collect()))
    assert a == b


def test_dedupe_staging_keep_latest(spark):
    main = spark.createDataFrame([(1, "a", 0)], "id long, name string, seq long")
    staging = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2)], "id long, name string, seq long"
    )
    got = upsert(main, staging, dedupe_staging_by="seq").collect()
    assert len(got) == 1 and got[0]["name"] == "new"


def test_column_order_alignment(spark):
    main = spark.createDataFrame([(1, "a")], "id long, name string")
    staging = spark.createDataFrame([("b", 2)], "name string, id long")  # shuffled order
    got = {r["id"]: r["name"] for r in upsert(main, staging).collect()}
    assert got == {1: "a", 2: "b"}


def test_scd2_apply_versions(spark):
    """SCD2 merge: current rows close at the first change; change batches
    chain into ordered versions; history is append-only."""
    import pyspark.sql.functions as F
    from datapipeline_omnichanneltobigquery_spark.operators.scd2 import scd2_apply

    history = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
            (1, "silver", "2024-02-01 00:00:00", None),
            (2, "bronze", "2024-01-15 00:00:00", None),
        ],
        "id long, tier string, valid_from string, valid_to string",
    )
    changes = spark.createDataFrame(
        [
            (1, "gold", "2024-03-01 00:00:00"),
            (1, "platinum", "2024-04-01 00:00:00"),
        ],
        "id long, tier string, ts string",
    )
    out = scd2_apply(history, changes, key="id", ts_col="ts", attr_cols=["tier"])
    rows = {(r.id, r.tier): (r.valid_from, r.valid_to) for r in out.collect()}
    assert rows[(1, "bronze")] == ("2024-01-01 00:00:00", "2024-02-01 00:00:00")
    assert rows[(1, "silver")] == ("2024-02-01 00:00:00", "2024-03-01 00:00:00")  # closed
    assert rows[(1, "gold")] == ("2024-03-01 00:00:00", "2024-04-01 00:00:00")  # chained
    assert rows[(1, "platinum")] == ("2024-04-01 00:00:00", None)  # current
    assert rows[(2, "bronze")] == ("2024-01-15 00:00:00", None)  # untouched
    assert out.count() == 5


def test_snapshot_diff_classification(spark):
    """insert/delete/update classified correctly; unchanged rows dropped;
    NULL->NULL is unchanged and NULL->value is update (null-safe compare);
    deleted rows carry their OLD values."""
    from datapipeline_omnichanneltobigquery_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, None), (5, "e")],
        "id long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (3, None), (4, "now"), (5, "E"), (6, "f")],
        "id long, v string",
    )
    got = {(r.op, r.id, r.v) for r in snapshot_diff(old, new, "id", ["v"]).collect()}
    assert got == {
        ("delete", 2, "b"),     # gone, old value carried
        ("update", 4, "now"),   # NULL -> value
        ("update", 5, "E"),
        ("insert", 6, "f"),
    }  # 1 (same) and 3 (NULL==NULL) are absent
