"""Training-data export: sharded JSONL with a verifiable manifest.

The handoff format most LLM training stacks ingest is newline-delimited
JSON in addressable shards plus a manifest the loader can verify — this
module writes exactly that from any DataFrame:

  {path}/__shard=0/part-*.txt … __shard={n-1}/part-*.txt
  {path}/_MANIFEST.json   {"n_shards", "n_rows", "total_bytes",
                          "shards": [{"shard", "n_rows", "n_bytes",
                                      "checksum"}]}

Scale shape — everything is executor-side:

* rows route to shards by a DETERMINISTIC id hash (md5 basis — the
  sampling.hash_split discipline), so re-running the export reproduces
  the same shard membership and a loader can address a document's shard
  from its id alone;
* the write is ``partitionBy(__shard)`` over Spark's text sink — shard
  directories stream straight from executors, no driver data path;
* the manifest's per-shard row/byte counts and checksums come from ONE
  distributed aggregate (n_shards result rows — bounded by the caller's
  parameter); the checksum is a commutative ``bit_xor`` of 60-bit line
  hashes, order-independent by construction, so it verifies content
  without imposing a file order the distributed writer can't promise.

JSON encoding is Spark's ``to_json`` (struct of all columns) — stable key
order (struct field order), executor-side.

No reference counterpart; the reference's CSV temp-file handoff
(omnichannel_to_bq.py:145-152) is the same idea one format down.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long


def _payload(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    shard = (md5_long(F.col(id_col).cast("string")) % F.lit(n_shards)).alias("__shard")
    return df.select(
        shard,
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )


def _shard_stats(payload: DataFrame) -> DataFrame:
    return payload.groupBy("__shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # newline per row is part of the on-disk bytes
        (F.sum(F.octet_length("value").cast("bigint")) + F.count(F.lit(1))).alias("n_bytes"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(value), 1, 15), 16, 10) AS BIGINT))"
        ).alias("checksum"),
    )


def write_jsonl_shards(df: DataFrame, path: str, id_col: str, n_shards: int) -> dict:
    """Write ``df`` as ``n_shards`` JSONL shard directories plus
    MANIFEST.json; returns the manifest dict."""
    payload = _payload(df, id_col, n_shards).localCheckpoint()
    payload.write.partitionBy("__shard").mode("overwrite").text(path)
    rows = _shard_stats(payload).collect()  # n_shards rows — bounded
    by_shard = {int(r["__shard"]): r for r in rows}
    shards = []
    for i in range(n_shards):
        r = by_shard.get(i)
        shards.append(
            {
                "shard": i,
                "n_rows": int(r.n_rows) if r else 0,
                "n_bytes": int(r.n_bytes) if r else 0,
                "checksum": int(r.checksum) if r else 0,
            }
        )
    manifest = {
        "n_shards": n_shards,
        "n_rows": sum(s["n_rows"] for s in shards),
        "total_bytes": sum(s["n_bytes"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_manifest(spark: SparkSession, path: str) -> bool:
    """Loader-side check, itself distributed: re-read every shard directory
    and recompute (n_rows, n_bytes, checksum) with the same aggregate; any
    mismatch raises ValueError.  The only driver-side data is the
    n_shards-row stats result."""
    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    # the session's FileStatusCache may hold a stale listing from the
    # export (externally modified shards would fail the scan with a
    # length mismatch instead of a clean checksum diff)
    spark.catalog.refreshByPath(path)
    # partition discovery yields __shard from the directory names; the
    # underscore-prefixed manifest is invisible to Spark's file index
    back = spark.read.text(path).select(F.col("__shard").cast("bigint").alias("__shard"), "value")
    got = {int(r["__shard"]): r for r in _shard_stats(back).collect()}
    for s in manifest["shards"]:
        if s["n_rows"] == 0:
            if s["shard"] in got:
                raise ValueError(f"shard {s['shard']}: expected empty, found rows")
            continue
        r = got.get(s["shard"])
        if r is None:
            raise ValueError(f"missing shard {s['shard']}")
        if (int(r.n_rows), int(r.n_bytes), int(r.checksum)) != (
            s["n_rows"], s["n_bytes"], s["checksum"]
        ):
            raise ValueError(f"content mismatch in shard {s['shard']}")
    return True
