"""Temporal joins: as-of (backward) and bounded-range joins
(SURVEY.md §2.2 'Range / as-of join' — absent in the reference, standard in
time-series engines).

Both are implemented in the shape that scales:

* **as-of** uses the union+window trick: tag both inputs, union, and carry
  the most recent right-side payload forward with ``last_value(...,
  ignoreNulls)`` over (key, time) — ONE shuffle on the key, no range
  predicate, no per-row probe.  The naive inequality join is O(L×R) per key;
  this is O((L+R) log) and AQE-friendly.
* **bounded range join** buckets time into window-width buckets and joins on
  (key, bucket) ∪ (key, bucket−1) before the exact range filter — turning an
  inequality join into two equi-joins, which is exactly what Spark shuffles
  well.  Bucket width = range width so each left row probes ≤ 2 buckets.

Determinism: as-of ties (equal timestamps) resolve to the largest right id;
both operators' outputs are pure functions of their inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row of
    the same ``key`` with ``right_ts <= left_ts`` (backward as-of; NULLs when
    no such row).  Equal-timestamp right rows sort by ``right_id`` so the
    largest id wins deterministically.
    """
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_id).alias("__rid"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        # null placeholder must carry right_id's ACTUAL type (string ids
        # etc.), or unionByName fails type resolution at analysis time
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at the same timestamp (is_left asc)
    # so a left row can match a right row with the identical timestamp
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__is_left", "__rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__asof")[c].alias(c) for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int = 0,
) -> DataFrame:
    """Pairs (left, right) of the same ``key`` with
    ``left_ts - lower_seconds <= right_ts < left_ts - upper_seconds``
    (a backward-looking window), via bucket equi-join.

    Requires ``lower_seconds - upper_seconds`` to be the bucket width; left
    rows explode into the two candidate buckets, the exact predicate prunes
    after the equi-join.  Column name collisions are the caller's concern
    (alias before calling).
    """
    width = lower_seconds - upper_seconds
    if width <= 0:
        raise ValueError("lower_seconds must exceed upper_seconds")
    lb = F.floor((F.unix_micros(F.col(left_ts)) / 1_000_000 - upper_seconds) / width)
    rb = F.floor(F.unix_micros(F.col(right_ts)) / 1_000_000 / width)
    l = left.withColumn("__b", F.explode(F.array(lb.cast("long"), lb.cast("long") - 1)))
    r = right.withColumn("__b", rb.cast("long"))
    lo = F.unix_micros(F.col(left_ts)) - lower_seconds * 1_000_000
    hi = F.unix_micros(F.col(left_ts)) - upper_seconds * 1_000_000
    rt = F.unix_micros(F.col(right_ts))
    return (
        l.join(r, on=[key, "__b"])
        .filter((rt >= lo) & (rt < hi))
        .drop("__b")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    payload_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join in the NEAREST direction with an optional tolerance (the
    pandas ``merge_asof(direction='nearest', tolerance=...)`` surface):
    each left row attaches the right row of the same ``key`` whose
    timestamp is closest in EITHER direction, NULLs when none lands within
    ``tolerance_us`` microseconds.  Equal distance resolves to the earlier
    (backward) match; equal right timestamps to the largest ``right_id`` —
    fully deterministic.

    Plan: the same union trick as :func:`asof_join`, but TWO window passes
    over the one (key, ts) sort — a running ``last`` (preceding frame) for
    the backward candidate and a ``first`` over the following frame for
    the forward candidate; both windows share a single exchange+sort
    because partition and order match.  Candidate distances compare
    map-side; still ONE shuffle total, no inequality join."""
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_id).alias("__rid"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload_cols]
        ).alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        # null placeholder must carry right_id's ACTUAL type (string ids
        # etc.), or unionByName fails type resolution at analysis time
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # backward: right rows at the same ts sort BEFORE left (is_left asc) so
    # an equal-timestamp right row is visible to the left row's frame;
    # forward: the following frame starts at +1 row, so the same ordering
    # keeps equal-ts rows in the backward branch only (distance 0 wins
    # there anyway — matching the earlier-on-tie contract).
    w = Window.partitionBy(key).orderBy("__ts", "__is_left", "__rid")
    back = F.last("__payload", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = F.first("__payload", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__back", back)
        .withColumn("__fwd", fwd)
        .filter(F.col("__is_left") == 1)
    )
    bdist = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__back.__rts"))
    fdist = F.unix_micros(F.col("__fwd.__rts")) - F.unix_micros(F.col("__ts"))
    if tolerance_us is not None:
        bdist = F.when(bdist <= tolerance_us, bdist)
        fdist = F.when(fdist <= tolerance_us, fdist)
    pick_back = F.when(
        bdist.isNotNull() & (fdist.isNull() | (bdist <= fdist)), True
    ).otherwise(False)
    chosen = F.when(pick_back, F.col("__back")).otherwise(
        F.when(fdist.isNotNull(), F.col("__fwd"))
    )
    return carried.withColumn("__chosen", chosen).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__chosen")[c].alias(c) for c in payload_cols],
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Interval-overlap join: pairs of a left and a right interval of the
    same ``key`` that OVERLAP (``l_start <= r_end AND r_start <= l_end``,
    closed intervals) — the both-sides-are-intervals generalization of
    :func:`range_join` (point-in-window), the session-concurrency /
    availability-window workhorse.

    Bucket decomposition: each interval explodes into the
    ``bucket_seconds``-wide time buckets it touches, the join runs as a
    (key, bucket) EQUI-join, and the exact predicate prunes after; a pair
    overlapping several shared buckets is deduplicated by the final
    distinct on the joined row.  Explode factor is interval_len/bucket + 1
    — size ``bucket_seconds`` near the typical interval length so each
    side's blowup is ~2×.  Like every bucket scheme here: turns an
    inequality join Spark would nested-loop into the hash shuffle it
    does well.  Column collisions are the caller's concern (alias before
    calling).

    ``max_buckets_per_interval`` is the same discipline as resample's
    ``max_points_per_key`` (timeseries.py): one pathological interval (a
    session that never closed) with a small bucket would explode into
    millions of rows inside one task and OOM the executor at scale — the
    guard turns it into a diagnosable per-interval error naming the span
    instead.

    NULL bounds: a row with a NULL start or end (an open-ended session)
    is dropped BEFORE the explode — it can never satisfy the closed-
    interval overlap predicate anyway (NULL comparisons are never true),
    and routing it into the bucket expression would otherwise trip the
    explode guard's raise_error with a misleading "spans null buckets"
    message.  Matches the naive inequality-join oracle, which excludes
    such rows via the predicate itself."""
    w_us = bucket_seconds * 1_000_000
    cap = int(max_buckets_per_interval)

    def buckets(start, end):
        s = F.floor(F.unix_micros(F.col(start)) / w_us).cast("long")
        e = F.floor(F.unix_micros(F.col(end)) / w_us).cast("long")
        n = e - s + 1
        return F.when(n <= F.lit(cap), F.sequence(s, e)).otherwise(
            F.raise_error(
                F.format_string(
                    "overlap_join interval [%s, %s] spans %s buckets of "
                    f"{bucket_seconds} s (max_buckets_per_interval={cap}) — "
                    "widen the bucket, raise the cap, or clamp open-ended "
                    "intervals upstream",
                    F.col(start).cast("string"),
                    F.col(end).cast("string"),
                    n.cast("string"),
                )
            )
        )

    l = left.filter(
        F.col(l_start).isNotNull() & F.col(l_end).isNotNull()
    ).withColumn("__b", F.explode(buckets(l_start, l_end)))
    r = right.filter(
        F.col(r_start).isNotNull() & F.col(r_end).isNotNull()
    ).withColumn("__b", F.explode(buckets(r_start, r_end)))
    pred = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    return l.join(r, on=[key, "__b"]).filter(pred).drop("__b").distinct()


def overlap_duration(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
    out_col: str = "overlap_us",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """:func:`overlap_join` plus the DURATION of each overlap — the
    analytic face: ``out_col`` = microseconds both intervals were
    simultaneously live, ``min(l_end, r_end) − max(l_start, r_start)``
    (0 for boundary touch of closed intervals).  Sum it per key for total
    concurrency seconds, the question session-overlap analysis actually
    asks; the arithmetic is exact integer microseconds, so the aggregate
    is order-independent and twin-exact."""
    pairs = overlap_join(
        left, right, key, l_start, l_end, r_start, r_end, bucket_seconds,
        max_buckets_per_interval=max_buckets_per_interval,
    )
    dur = F.least(
        F.unix_micros(F.col(l_end)), F.unix_micros(F.col(r_end))
    ) - F.greatest(F.unix_micros(F.col(l_start)), F.unix_micros(F.col(r_start)))
    return pairs.withColumn(out_col, dur)
