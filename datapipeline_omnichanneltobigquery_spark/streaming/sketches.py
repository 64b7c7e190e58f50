"""Streaming sketch-register maintenance: a persisted HLL register table
(and CMS sketch table) kept current by Structured Streaming micro-batches
— the streaming face of the mergeable-sketch rollup discipline
(operators/profile.py::hll_registers/hll_merge, cms_sketch/cms_merge).

The 100 TB shape: the register table is CONSTANT-SIZE (m rows per group;
depth×width rows), so each micro-batch's work is sketch(batch) + one
merge against constant state + one small overwrite — "distinct users so
far" / "event counts so far" stay queryable at any moment without ever
rescanning history.

Crash-replay contracts (foreachBatch can re-run a batch):

- HLL: merge is PER-REGISTER MAX — idempotent, so re-merging a replayed
  batch changes nothing.  No markers needed; the operator is natively
  exactly-once.
- CMS: merge is PER-BUCKET SUM — a replay would double-count, so the CMS
  maintainer uses the applied-batch marker discipline of
  streaming/ingest.py (marker written AFTER the swap; a replay that
  finds it is a no-op).  The one unguarded window — crash between the
  swap and the marker — re-adds that batch once; callers needing the
  hard guarantee write markers and state to the same transactional store.

State overwrite is the two-rename backup swap (sinks/layout.py
discipline): new state lands beside the old, then renames — readers
never observe a half-written register table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from datapipeline_omnichanneltobigquery_spark.operators.profile import (
    cms_merge,
    cms_sketch,
    hll_merge,
    hll_registers,
)


def _swap_state(df: DataFrame, path: str) -> None:
    """Write ``df`` as the new state at ``path`` via write-aside + two
    renames — readers see the old state or the new, never a partial."""
    tmp, old = path + ".__new", path + ".__old"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def maintain_hll_batch(
    batch_df: DataFrame, register_path: str, group_col: str, value_col: str,
    n_buckets: int = 512,
) -> None:
    """Fold one batch into the persisted HLL register table.  Idempotent:
    replaying the same batch re-MAXes identical registers."""
    spark = batch_df.sparkSession
    regs = hll_registers(batch_df, group_col, value_col, n_buckets)
    if os.path.exists(register_path):
        regs = hll_merge(spark.read.parquet(register_path), regs)
    _swap_state(regs.localCheckpoint(), register_path)


def maintain_cms_batch(
    batch_df: DataFrame, sketch_path: str, key_col: str, batch_id: int,
    depth: int = 4, width: int = 1024,
) -> None:
    """Fold one batch into the persisted CMS sketch table — guarded by an
    applied-batch marker because CMS counts ADD (a replay would double-
    count where HLL's max would not)."""
    marker = os.path.join(sketch_path + ".__applied", str(batch_id))
    if os.path.exists(marker):
        return
    spark = batch_df.sparkSession
    sk = cms_sketch(batch_df, key_col, depth, width)
    if os.path.exists(sketch_path):
        sk = cms_merge(spark.read.parquet(sketch_path), sk)
    _swap_state(sk.localCheckpoint(), sketch_path)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w"):
        pass


def streaming_hll_maintain(
    stream: DataFrame,
    register_path: str,
    group_col: str,
    value_col: str,
    checkpoint_dir: str,
    *,
    n_buckets: int = 512,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start a stream that keeps the HLL register table at
    ``register_path`` current; query distinct-count estimates at any time
    with ``hll_estimate(spark.read.parquet(register_path), group_col)``."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            maintain_hll_batch(
                batch_df, register_path, group_col, value_col, n_buckets
            )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
