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
