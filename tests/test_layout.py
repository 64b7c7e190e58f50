"""Range-sorted layout (sinks/layout.py): footer-statistics disjointness —
the property data-skipping relies on — plus read-back fidelity."""

from __future__ import annotations

import pyspark.sql.functions as F

from datapipeline_omnichanneltobigquery_spark.sinks.layout import (
    file_ranges,
    write_range_sorted,
)
from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table

from tests.conftest import SF_DIR


def test_range_sorted_files_are_disjoint(spark, tmp_path):
    """After write_range_sorted, per-file [min,max] spans of the sort column
    overlap at most at the range boundaries — so a point/range filter can
    skip every non-matching file on footer stats alone."""
    orders = read_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_by_key")
    write_range_sorted(orders, path, "o_orderkey", n_partitions=8)

    ranges = sorted(file_ranges(path, "o_orderkey"), key=lambda t: t[1])
    assert len(ranges) >= 4  # range partitioner actually split the domain
    for (_, _, hi_prev), (_, lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # disjoint up to boundary equality

    # a point lookup's key falls inside exactly one file's span
    probe = ranges[2][1]
    containing = [r for r in ranges if r[1] <= probe <= r[2]]
    assert len(containing) <= 2  # the file + possibly a boundary twin


def test_range_sorted_roundtrip_fidelity(spark, tmp_path):
    orders = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    path = str(tmp_path / "orders_rt")
    write_range_sorted(orders, path, "o_orderkey", n_partitions=4)
    back = spark.read.parquet(path)
    lo, hi = 100, 500
    expect = sorted(
        (r.o_orderkey, r.o_custkey)
        for r in orders.filter(F.col("o_orderkey").between(lo, hi)).collect()
    )
    got = sorted(
        (r.o_orderkey, r.o_custkey)
        for r in back.filter(F.col("o_orderkey").between(lo, hi)).collect()
    )
    assert got == expect


def test_compact_files_shrinks_and_preserves(spark, tmp_path):
    """64 tiny files -> a handful; row multiset unchanged; directory swap
    leaves no temp residue."""
    import os

    from datapipeline_omnichanneltobigquery_spark.sinks.layout import compact_files

    orders = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "tiny")
    orders.repartition(64).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before == 64

    stats = compact_files(spark, path, target_file_bytes=1 << 20)
    assert stats["files_before"] == 64
    assert stats["files_after"] < 64
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert sorted(r.o_orderkey for r in back.collect()) == sorted(
        r.o_orderkey for r in orders.collect()
    )
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    """Compacting the ROOT of a hive-partitioned layout would flatten the
    directory partitioning — must refuse."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.sinks.layout import compact_files

    orders = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    path = str(tmp_path / "parted")
    orders.write.partitionBy("o_orderstatus").parquet(path)
    with pytest.raises(ValueError, match="partition subdirectories"):
        compact_files(spark, path)


def test_compact_preserves_range_layout_with_sort_col(spark, tmp_path):
    """compact_files(sort_col=...) must keep per-file [min, max] spans
    disjoint (the footer data-skipping property write_range_sorted paid
    for); the default round-robin mode documents that it discards it."""
    from datapipeline_omnichanneltobigquery_spark.sinks.layout import (
        compact_files,
        file_ranges,
        write_range_sorted,
    )

    ev = read_table(spark, SF_DIR, "events").select("event_id", "user_id")
    path = str(tmp_path / "ev_sorted")
    write_range_sorted(ev, path, "user_id", n_partitions=8)
    stats = compact_files(spark, path, target_file_bytes=2 * 1024, sort_col="user_id")
    assert stats["files_after"] >= 2  # multiple files, so disjointness is non-trivial
    ranges = sorted(file_ranges(path, "user_id"), key=lambda r: r[1])
    for (_, _, hi_prev), (_, lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges
    back = spark.read.parquet(path)
    assert back.count() == ev.count()


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered layout makes footer min/max selective on BOTH clustered
    columns, where single-column range sort leaves the second column
    unprunable: a mid-domain point probe on each column must overlap only
    a strict subset of the z-ordered files, while the range-sorted layout
    overlaps EVERY file on the non-sort column."""
    from datapipeline_omnichanneltobigquery_spark.sinks.layout import write_zordered

    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("o_day"),
    )
    n_files = 16

    zpath = str(tmp_path / "orders_z")
    write_zordered(orders, zpath, "o_custkey", "o_day", n_partitions=n_files)
    rpath = str(tmp_path / "orders_r")
    write_range_sorted(orders, rpath, "o_custkey", n_partitions=n_files)

    def overlapping(path, col, probe):
        return sum(1 for _, lo, hi in file_ranges(path, col) if lo <= probe <= hi)

    mid_cust = orders.agg(F.expr("percentile_approx(o_custkey, 0.5)")).first()[0]
    mid_day = orders.agg(F.expr("percentile_approx(o_day, 0.5)")).first()[0]

    z_files = len(file_ranges(zpath, "o_custkey"))
    assert z_files >= n_files // 2  # the writer actually split the domain
    # z-order: both columns prune (each probe touches < half the files)
    assert overlapping(zpath, "o_custkey", mid_cust) < z_files / 2
    assert overlapping(zpath, "o_day", mid_day) < z_files / 2
    # range sort: the sort column prunes, the OTHER column cannot
    r_files = len(file_ranges(rpath, "o_day"))
    assert overlapping(rpath, "o_day", mid_day) == r_files


def test_zorder_scaled_fractional_column_parity(spark, duck):
    """zorder_scaled on a NON-integral column: FLOOR-before-cast makes
    Spark (truncating cast) and DuckDB (rounding cast) produce identical
    ranks — the r5 ADVICE divergence."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.sinks.layout import (
        zorder_scaled,
        zorder_scaled_sql,
    )
    from tests.helpers import compare_spark_duckdb

    rows = [(i, i * 0.7 + 0.5, (100 - i) * 1.3) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    duck.sql(
        "CREATE OR REPLACE TEMP TABLE _zfrac AS "
        "SELECT i AS id, i * CAST(0.7 AS DOUBLE) + CAST(0.5 AS DOUBLE) AS a, "
        "(100 - i) * CAST(1.3 AS DOUBLE) AS b FROM range(50) t(i)"
    )
    try:
        compare_spark_duckdb(
            zorder_scaled(df, "a", "b").select("id", "zval"),
            duck,
            f"SELECT id, zval FROM {zorder_scaled_sql('_zfrac', 'a', 'b')} z",
        )
    finally:
        duck.sql("DROP TABLE _zfrac")


def test_compact_partitioned_preserves_layout_and_rows(spark, tmp_path):
    """Partition-wise compaction: file counts shrink inside each key=value
    directory, the directory scheme (and its pruning) survives, and the
    row multiset is unchanged."""
    import os

    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.sinks.layout import compact_partitioned

    p = str(tmp_path / "parted")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 3).alias("k"), (F.col("id") * 2).alias("v")
    )
    df.repartition(16).write.partitionBy("k").mode("overwrite").parquet(p)
    before = {
        d: len([f for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet")])
        for d in os.listdir(p) if d.startswith("k=")
    }
    assert all(n > 1 for n in before.values())
    stats = compact_partitioned(spark, p, target_file_bytes=1 << 30)
    assert set(stats) == set(before)
    for d, st in stats.items():
        assert st["files_after"] < before[d]
    spark.catalog.refreshByPath(p)
    back = spark.read.parquet(p)
    assert back.count() == 2000
    assert back.groupBy("k").count().count() == 3
