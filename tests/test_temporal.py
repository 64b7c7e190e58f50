"""As-of join unit tests: non-long right-id types (ADVICE r5) and
nearest-direction semantics sanity on tiny frames."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.operators.temporal import (
    asof_join,
    asof_join_nearest,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_string_right_id(spark):
    """right_id of STRING type must not break unionByName resolution —
    the null placeholder on the left branch carries right_id's actual
    type, not a hardcoded long."""
    left = spark.createDataFrame([(1, _ts(10)), (1, _ts(30))], ["k", "lt"])
    right = spark.createDataFrame(
        [(1, _ts(5), "r-a", 100.0), (1, _ts(25), "r-b", 200.0)],
        ["k", "rt", "rid", "price"],
    )
    out = {
        r.lt.minute: r.price
        for r in asof_join(
            left, right, key="k", left_ts="lt", right_ts="rt",
            right_id="rid", payload_cols=["price"],
        ).collect()
    }
    assert out == {10: 100.0, 30: 200.0}


def test_asof_nearest_string_right_id_and_tolerance(spark):
    """Nearest-direction as-of with a STRING right id: picks the closer
    side, honors the tolerance, NULLs when nothing is in range."""
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(21)), (1, _ts(50))], ["k", "lt"]
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "a", 1.0), (1, _ts(24), "b", 2.0)],
        ["k", "rt", "rid", "v"],
    )
    out = {
        r.lt.minute: r.v
        for r in asof_join_nearest(
            left, right, key="k", left_ts="lt", right_ts="rt",
            right_id="rid", payload_cols=["v"],
            tolerance_us=10 * 60 * 1_000_000,
        ).collect()
    }
    # 10 -> backward 8 (dist 2) beats forward 24 (dist 14 > tol anyway)
    # 21 -> forward 24 (dist 3) beats backward 8 (dist 13)
    # 50 -> nothing within 10 minutes -> NULL
    assert out == {10: 1.0, 21: 2.0, 50: None}


def test_overlap_join_matches_naive(spark):
    """Bucketized interval-overlap join equals the naive inequality join:
    same-key overlapping pairs only, boundary touching counts, no
    duplicates from multi-bucket overlaps."""
    from datapipeline_omnichanneltobigquery_spark.operators.temporal import overlap_join

    L = spark.createDataFrame(
        [
            (1, 10, _ts(0), _ts(30)),    # long interval spanning buckets
            (1, 11, _ts(45), _ts(50)),
            (2, 12, _ts(0), _ts(5)),
        ],
        ["k", "lid", "ls", "le"],
    )
    R = spark.createDataFrame(
        [
            (1, 20, _ts(29), _ts(40)),   # overlaps 10 (boundary-ish), not 11
            (1, 21, _ts(50), _ts(55)),   # touches 11 at the boundary
            (2, 22, _ts(6), _ts(9)),     # disjoint from 12
        ],
        ["k", "rid", "rs", "re"],
    )
    got = {
        (r.lid, r.rid)
        for r in overlap_join(
            L, R, key="k", l_start="ls", l_end="le", r_start="rs", r_end="re",
            bucket_seconds=600,
        ).collect()
    }
    naive = {
        (l[1], r[1])
        for l in L.collect()
        for r in R.collect()
        if l[0] == r[0] and l[2] <= r[3] and r[2] <= l[3]
    }
    assert got == naive
    assert (10, 20) in got and (11, 21) in got and (12, 22) not in got


def test_overlap_join_explode_guard(spark):
    """A pathological open-ended interval (here: a year-long session) with a
    small bucket raises a diagnosable error instead of exploding millions of
    rows inside one task; raising the cap admits it."""
    import pytest as _pytest

    from datapipeline_omnichanneltobigquery_spark.operators.temporal import overlap_join

    import datetime as dt

    def sec(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    L = spark.createDataFrame([(1, 10, sec(0), sec(5000))], ["k", "lid", "ls", "le"])
    R = spark.createDataFrame([(1, 20, sec(5), sec(10))], ["k", "rid", "rs", "re"])
    bad = overlap_join(
        L, R, key="k", l_start="ls", l_end="le", r_start="rs", r_end="re",
        bucket_seconds=1, max_buckets_per_interval=1000,
    )
    with _pytest.raises(Exception, match="max_buckets_per_interval"):
        bad.collect()
    ok = overlap_join(
        L, R, key="k", l_start="ls", l_end="le", r_start="rs", r_end="re",
        bucket_seconds=1, max_buckets_per_interval=10_000,
    )
    assert {(r.lid, r.rid) for r in ok.collect()} == {(10, 20)}


def test_overlap_join_null_bounds_dropped(spark):
    """An open-ended interval (NULL start or end) is silently skipped — it
    can never satisfy the closed-interval predicate — rather than routed
    into the explode guard's raise_error (the round-7 ADVICE regression:
    NULL n made the guard's otherwise() branch fail the whole query)."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.temporal import overlap_join

    def sec(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s) if s is not None else None

    L = spark.createDataFrame(
        [(1, 10, sec(0), sec(30)), (1, 11, sec(40), None), (1, 12, None, sec(90))],
        "k int, lid int, ls timestamp, le timestamp",
    )
    R = spark.createDataFrame(
        [(1, 20, sec(10), sec(20)), (1, 21, sec(45), sec(50))],
        "k int, rid int, rs timestamp, re timestamp",
    )
    got = {
        (r.lid, r.rid)
        for r in overlap_join(
            L, R, key="k", l_start="ls", l_end="le", r_start="rs", r_end="re",
            bucket_seconds=60,
        ).collect()
    }
    assert got == {(10, 20)}  # NULL-bounded 11 and 12 dropped, no error


def test_overlap_duration_geometry(spark):
    """overlap_duration on the four interval geometries: partial overlap,
    containment (duration = inner interval), boundary touch (0), disjoint
    (absent)."""
    from datapipeline_omnichanneltobigquery_spark.operators.temporal import (
        overlap_duration,
    )

    import datetime as dt

    def sec(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    L = spark.createDataFrame(
        [(1, 10, sec(0), sec(100))], ["k", "lid", "ls", "le"]
    )
    R = spark.createDataFrame(
        [
            (1, 20, sec(80), sec(150)),   # partial: overlap 80..100 = 20 s
            (1, 21, sec(30), sec(40)),    # contained: 10 s
            (1, 22, sec(100), sec(120)),  # boundary touch: 0 s
            (1, 23, sec(200), sec(220)),  # disjoint: absent
        ],
        ["k", "rid", "rs", "re"],
    )
    got = {
        r.rid: r.overlap_us
        for r in overlap_duration(
            L, R, key="k", l_start="ls", l_end="le", r_start="rs", r_end="re",
            bucket_seconds=60,
        ).collect()
    }
    assert got == {20: 20_000_000, 21: 10_000_000, 22: 0}
