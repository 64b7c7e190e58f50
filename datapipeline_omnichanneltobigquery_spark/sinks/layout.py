"""Range-sorted ("Z-order-lite") parquet layout: global range partitioning +
in-file sort so parquet footer min/max statistics become selective — the
data-skipping technique for high-cardinality filter columns that hive
partitioning can't handle (a directory per value would explode) and
bucketing doesn't help with (hash buckets scatter ranges).

Write once sorted, and every subsequent range/point filter on the layout
column prunes whole FILES from the scan via footer statistics (row-group
min/max), before any data IO: with k output files over a sorted domain, a
point lookup reads ~1/k of the bytes.  At 100 TB this is the difference
between a full-table scan and touching a handful of files.

`repartitionByRange` samples the column to build balanced range bounds (one
extra sampling job at write time — the read-side win amortizes it); the
within-partition sort keeps every row group's min/max span tight inside each
file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_range_sorted(df: DataFrame, path: str, col: str, n_partitions: int) -> None:
    """Persist ``df`` at ``path`` range-partitioned AND sorted by ``col`` —
    n_partitions files with tight, (near-)disjoint [min, max] spans."""
    (
        df.repartitionByRange(n_partitions, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(path: str, col: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) of ``col`` read from parquet FOOTERS only —
    the statistics the scan's data-skipping consults.  Diagnostic/test
    helper; runs on the driver over file metadata, never row data."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is not None and stats.has_min_max:
                mins.append(stats.min)
                maxs.append(stats.max)
        if mins:
            out.append((name, min(mins), max(maxs)))
    return out


def compact_files(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> dict[str, int]:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and swap it into place.

    Streaming sinks, per-micro-batch upserts and over-parallel writes leave
    thousands of KB-sized files; at scale the scan's task-scheduling and
    footer-reading overhead then dwarfs the data read (the classic
    small-file problem).  Default compaction is pure re-layout:
    `repartition(n)` is a round-robin exchange — no keys, no skew — sized
    so each output file lands near the target (HDFS-block-ish 128 MiB
    default).  Round-robin DESTROYS any range-sorted layout (and its
    footer min/max data-skipping): to compact a directory produced by
    :func:`write_range_sorted`, pass ``sort_col`` — the rewrite then uses
    repartitionByRange + sortWithinPartitions, preserving tight per-file
    spans at the new file count.

    Swap discipline (NOT atomic — plain filesystems have no atomic
    directory swap): the rewrite lands complete in a sibling
    ``__compact_tmp``, then two renames run (original → ``__compact_old``,
    tmp → original) with a short window in between where ``path`` does not
    exist; a concurrent reader in that window fails and should retry.  Use
    under the same external mutual exclusion as any overwrite of ``path``
    (a table-format commit protocol is the real fix at scale).  Crash
    recovery: the ORIGINAL data survives every failure point — before the
    first rename it is still at ``path``; between the renames and until
    cleanup it is intact under ``__compact_old`` (rename it back to
    ``path``, drop ``__compact_tmp``); only after the new directory is in
    place is ``__compact_old`` deleted.
    Returns {files_before, files_after, bytes_total}."""
    import math
    import shutil

    subdirs = [
        f for f in os.listdir(path)
        if os.path.isdir(os.path.join(path, f)) and not f.startswith((".", "_"))
    ]
    if subdirs:
        # a hive-partitioned layout: a flat rewrite would silently discard
        # the directory partitioning (and its pruning) — refuse; compact
        # each partition directory individually instead
        raise ValueError(
            f"{path} contains partition subdirectories {subdirs[:3]}...; "
            "compact each partition directory, not the root"
        )
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    if not files:
        raise ValueError(f"no parquet files under {path}")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    tmp, old = path.rstrip("/") + "__compact_tmp", path.rstrip("/") + "__compact_old"
    src = spark.read.parquet(path)
    if sort_col is not None:
        rewritten = src.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        rewritten = src.repartition(n_out)
    rewritten.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return {"files_before": len(files), "files_after": after, "bytes_total": total}


# ---------------------------------------------------------------------------
# Z-order (multi-column clustering)
# ---------------------------------------------------------------------------

ZORDER_BITS = 16  # per-column resolution; 2 cols × 16 bits = 32-bit z-value


def zorder_value(a, b, bits: int = ZORDER_BITS):
    """Interleave the low ``bits`` bits of two non-negative BIGINT columns
    into one Morton (Z-curve) value: z = …b₁a₁b₀a₀.  Pure shift/and/or —
    whole-stage codegen, no UDF.  Inputs must already be scaled to
    [0, 2^bits) (see :func:`zorder_scaled`)."""
    import pyspark.sql.functions as F

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(F.shiftleft(bbit, 2 * i))
    return z


def zorder_value_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`zorder_value` — identical shift/mask algebra."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(parts)


def zorder_scaled(df, col_a: str, col_b: str, bits: int = ZORDER_BITS):
    """``df`` plus a ``zval`` column: both columns min-max scaled to
    ``bits``-bit integer ranks — pure integer arithmetic
    ``(x-lo)*(2^bits-1) div (hi-lo)`` so Spark and the SQL twin produce
    bit-identical ranks (no floating rounding at bucket boundaries;
    degenerate hi == lo range maps to 0) — then Morton-interleaved.
    Non-integral columns are FLOORed before the BIGINT cast (Spark's bare
    cast truncates toward zero, DuckDB's rounds — floor makes the two
    twins agree on fractional inputs); the degenerate-range guard checks
    the FLOORED difference, so a fractional column whose whole range sits
    inside one unit interval (lo=1.2, hi=1.8 → floor-delta 0) maps to rank
    0 instead of dividing by zero.  The
    global bounds come from one ungrouped aggregate (provably bounded at
    1 row, so its broadcast is hinted)."""
    import pyspark.sql.functions as F

    bounds = df.agg(
        F.min(col_a).alias("_alo"), F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"), F.max(col_b).alias("_bhi"),
    )
    m = (1 << bits) - 1
    with_b = df.crossJoin(F.broadcast(bounds))
    a_s = F.expr(
        f"CASE WHEN (CAST(FLOOR(_ahi) AS BIGINT) - CAST(FLOOR(_alo) AS BIGINT)) = 0 "
        f"THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST(FLOOR({col_a}) AS BIGINT) - CAST(FLOOR(_alo) AS BIGINT)) * {m} "
        f"div (CAST(FLOOR(_ahi) AS BIGINT) - CAST(FLOOR(_alo) AS BIGINT)) END"
    )
    b_s = F.expr(
        f"CASE WHEN (CAST(FLOOR(_bhi) AS BIGINT) - CAST(FLOOR(_blo) AS BIGINT)) = 0 "
        f"THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST(FLOOR({col_b}) AS BIGINT) - CAST(FLOOR(_blo) AS BIGINT)) * {m} "
        f"div (CAST(FLOOR(_bhi) AS BIGINT) - CAST(FLOOR(_blo) AS BIGINT)) END"
    )
    return with_b.withColumn("zval", zorder_value(a_s, b_s, bits)).drop(
        "_alo", "_ahi", "_blo", "_bhi"
    )


def zorder_scaled_sql(table: str, col_a: str, col_b: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`zorder_scaled` as a derived-table body —
    columns: the source table's plus ``zval``."""
    m = (1 << bits) - 1
    a_s = (
        f"CASE WHEN (CAST(FLOOR(_ahi) AS BIGINT) - CAST(FLOOR(_alo) AS BIGINT)) = 0 "
        f"THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST(FLOOR({col_a}) AS BIGINT) - CAST(FLOOR(_alo) AS BIGINT)) * {m} "
        f"// (CAST(FLOOR(_ahi) AS BIGINT) - CAST(FLOOR(_alo) AS BIGINT)) END"
    )
    b_s = (
        f"CASE WHEN (CAST(FLOOR(_bhi) AS BIGINT) - CAST(FLOOR(_blo) AS BIGINT)) = 0 "
        f"THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST(FLOOR({col_b}) AS BIGINT) - CAST(FLOOR(_blo) AS BIGINT)) * {m} "
        f"// (CAST(FLOOR(_bhi) AS BIGINT) - CAST(FLOOR(_blo) AS BIGINT)) END"
    )
    return f"""
    (SELECT t.*, {zorder_value_sql(f"({a_s})", f"({b_s})", bits)} AS zval
     FROM {table} t CROSS JOIN
          (SELECT MIN({col_a}) AS _alo, MAX({col_a}) AS _ahi,
                  MIN({col_b}) AS _blo, MAX({col_b}) AS _bhi
           FROM {table}) bounds)
    """


def write_zordered(df, path: str, col_a: str, col_b: str, n_partitions: int) -> None:
    """Persist ``df`` Z-ordered on (``col_a``, ``col_b``): Morton-value
    range partitioning + in-file sort, so parquet footer min/max become
    selective on BOTH columns at once — the multi-column data-skipping
    layout single-column range sort can't provide (sorting by A leaves B
    scattered across every file).  This is what Delta's OPTIMIZE ZORDER
    does; here it is one extra integer column at write time, dropped
    before the rows hit disk.  At 100 TB a point/range filter on either
    clustered column prunes most files before any data IO."""
    z = zorder_scaled(df, col_a, col_b)
    (
        z.repartitionByRange(n_partitions, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_partitioned(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> dict[str, dict[str, int]]:
    """Compact every partition directory of a hive-partitioned layout —
    the loop :func:`compact_files` refuses to hide: each ``key=value``
    subdirectory compacts independently (its own byte-targeted file
    count, its own two-rename swap), so partition pruning and the
    directory scheme survive, and a crash mid-loop leaves every partition
    either fully old or fully new.  The driver only LISTS directories
    (bounded by partition count); all data movement is executor-side per
    partition.  Returns {partition_dir: compact_files stats}."""
    parts = sorted(
        f for f in os.listdir(path)
        if os.path.isdir(os.path.join(path, f)) and "=" in f and not f.startswith((".", "_"))
    )
    if not parts:
        raise ValueError(f"{path} has no key=value partition subdirectories")
    out = {}
    for p in parts:
        out[p] = compact_files(
            spark, os.path.join(path, p),
            target_file_bytes=target_file_bytes, sort_col=sort_col,
        )
    return out
