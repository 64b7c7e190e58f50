"""Incremental rollup maintenance: merging per-batch partials must equal the
direct aggregate over all data, for any batch split."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.operators.rollup_ivm import (
    rollup_merge,
    rollup_partial,
)
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table

from tests.conftest import SF_DIR


def _canon(df):
    return {
        (r.window_start, r.event_type, r.n, float(r.sum_value)) for r in df.collect()
    }


def test_incremental_equals_direct(spark):
    ev = read_table(spark, SF_DIR, "events")
    direct = _canon(rollup_partial(ev))

    # split the stream into three uneven batches and maintain incrementally
    b1 = ev.filter(F.col("event_id") % 5 < 2)
    b2 = ev.filter(F.col("event_id") % 5 == 2)
    b3 = ev.filter(F.col("event_id") % 5 > 2)
    state = rollup_partial(b1)
    state = rollup_merge(state, rollup_partial(b2))
    state = rollup_merge(state, rollup_partial(b3))
    assert _canon(state) == direct


def test_merge_with_empty_batch_is_identity(spark):
    ev = read_table(spark, SF_DIR, "events")
    state = rollup_partial(ev)
    empty = rollup_partial(ev.filter(F.lit(False)))
    assert _canon(rollup_merge(state, empty)) == _canon(state)
