"""Key-based upsert — the reference's MERGE semantics as a DataFrame plan.

Reproduces the generated BigQuery ``MERGE`` (omnichannel_to_bq.py:176-182):
row matched on key → staging replaces ALL non-key columns; unmatched →
insert.  Since a matched row is *fully* replaced, the whole statement
reduces to::

    main ANTI JOIN staging ON key   UNION ALL   staging

The staging table's schema is the source of truth for column alignment
(:170-175) — we replicate via ``unionByName`` with no missing-column
allowance, so schema drift fails loudly, like the generated SQL would.

Scale notes:

* the anti join shuffles both sides on the key (sort-merge) unless the
  staging side is small — pass ``broadcast_staging=True`` (typical: a daily
  increment merged into a 100 TB main table → broadcast-anti-join reads
  main exactly once with no shuffle of the big side);
* ``dedupe_staging`` guards against duplicate keys *within* one staging
  batch, which BigQuery MERGE would reject at runtime; keep-latest order is
  deterministic via ``order_col`` then key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def upsert(
    main: DataFrame,
    staging: DataFrame,
    key: str = "id",
    broadcast_staging: bool = False,
    dedupe_staging_by: str | None = None,
) -> DataFrame:
    """MERGE(main ← staging) ON key, matched→replace-row, unmatched→insert."""
    if dedupe_staging_by is not None:
        w = Window.partitionBy(key).orderBy(F.col(dedupe_staging_by).desc(), F.col(key))
        staging = (
            staging.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    s = F.broadcast(staging) if broadcast_staging else staging
    kept = main.join(s, on=key, how="left_anti")
    return kept.unionByName(staging.select(*kept.columns))


def upsert_sql(main_table: str, staging_table: str, columns: list[str], key: str = "id") -> str:
    """The ANSI-SQL oracle form of :func:`upsert` (anti-join + union),
    mirroring the reference's string-templated MERGE (:176-182) for engines
    without MERGE support over plain files."""
    collist = ", ".join(columns)
    return (
        f"SELECT {collist} FROM {main_table} T "
        f"WHERE NOT EXISTS (SELECT 1 FROM {staging_table} S WHERE S.{key} = T.{key}) "
        f"UNION ALL SELECT {collist} FROM {staging_table}"
    )
