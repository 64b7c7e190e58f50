"""SCD2 / CDC history: versioned rows with validity intervals.

The reference's MERGE overwrites matched rows, losing history
(omnichannel_to_bq.py:176-182).  SCD2 is the auditable alternative: each
change CLOSES the current version (valid_to = change time) and INSERTS a new
current one.  On plain parquet this is the anti-join+union+window
composition below (the emulation every engine without MERGE uses); on
Delta/Iceberg the same logic rides a transactional MERGE.

Plan shape: one shuffle on the key for the change-ordering window, one for
the history join — no driver involvement, scales like the upsert.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_from_changes(
    changes: DataFrame, key: str, ts_col: str, attr_cols: list[str]
) -> DataFrame:
    """Build a full SCD2 history from a change log alone: each key's changes
    in time order become versions with ``valid_from``/``valid_to``
    (NULL = current)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    return changes.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Merge a change batch into an existing SCD2 history.

    * current rows (valid_to IS NULL) of changed keys close at the key's
      FIRST change timestamp;
    * the batch's changes become new versions chained by ``lead``;
    * closed/untouched history passes through unchanged.
    """
    new_versions = scd2_from_changes(changes, key, ts_col, attr_cols)
    first_change = changes.groupBy(key).agg(F.min(ts_col).alias("__first_ts"))
    cols = [key, *attr_cols, "valid_from", "valid_to"]
    closed = (
        history.filter(F.col("valid_to").isNull())
        .join(first_change, key)
        .select(
            key,
            *attr_cols,
            "valid_from",
            F.col("__first_ts").alias("valid_to"),
        )
    )
    untouched_current = history.filter(F.col("valid_to").isNull()).join(
        first_change, key, "left_anti"
    )
    past = history.filter(F.col("valid_to").isNotNull())
    return (
        past.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(new_versions.select(*cols))
    )
