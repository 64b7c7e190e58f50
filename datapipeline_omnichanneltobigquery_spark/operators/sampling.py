"""Dataset sampling / splitting / packing — the selection layer of a
training-data pipeline (extension surface; no analogue in the reference,
which loads everything it fetches, omnichannel_to_bq.py:143-165).

Everything here is DETERMINISTIC-BY-HASH: membership decisions come from
``md5(seed:id)`` (functions/hashing.py), never from `rand()`, so

* results are reproducible across runs, engines, and cluster sizes — the
  property that makes train/test splits auditable;
* every operator has an exact DuckDB oracle twin (``*_sql``);
* no shuffle is needed to DECIDE membership — the hash is a map-side
  projection; only downstream consumers shuffle.

Scale notes: split/sample are pure narrow projections (100 TB-safe by
construction).  Packing needs a running sum, which would serialize on one
task as a global window — so it is SHARDED: docs land in ``n_shards``
hash-buckets and the running sum is windowed per shard, which is both
embarrassingly parallel and exactly what a multi-worker packer does
(each worker packs its own stream).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from datapipeline_omnichanneltobigquery_spark.functions.hashing import md5_long, md5_long_sql

# Membership hashes are reduced to basis points (1/10000) — fractions are
# specified with 4-decimal precision on both engines.
_BPS = 10_000


def _bucket(id_col: str, seed: str) -> F.Column:
    return md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) % _BPS


def _bucket_sql(id_expr: str, seed: str) -> str:
    return f"{md5_long_sql(f''''{seed}:' || CAST({id_expr} AS VARCHAR)''')} % {_BPS}"


def _sql_str(value: str) -> str:
    """Single-quoted SQL string literal with quotes escaped — labels and
    strata are caller data and must not be able to break the generated SQL."""
    return "'" + str(value).replace("'", "''") + "'"


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, float], seed: str = "split-v1"
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) by hashing
    its id into basis points and cutting at the cumulative weights.  A row's
    split NEVER changes when the dataset grows — membership depends only on
    (seed, id) — which is the contract that keeps eval sets uncontaminated
    across dataset versions."""
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    bucket = _bucket(id_col, seed)
    expr, lo = None, 0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        hi = lo + int(round(w * _BPS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = (
        F.lit(labels[0][0])
        if expr is None
        else expr.otherwise(labels[-1][0])
    )
    return df.withColumn("split", expr)


def hash_split_sql(
    table: str, id_col: str, weights: dict[str, float], seed: str = "split-v1"
) -> str:
    bucket = _bucket_sql(id_col, seed)
    labels = list(weights.items())
    clauses, lo = [], 0
    for name, w in labels[:-1]:
        hi = lo + int(round(w * _BPS))
        clauses.append(f"WHEN ({bucket}) < {hi} THEN {_sql_str(name)}")
        lo = hi
    last = _sql_str(labels[-1][0])
    # single-label weights degenerate to a bare literal (a zero-WHEN CASE is
    # invalid SQL) — mirrors the Spark twin's F.lit fallback
    case = last if not clauses else "CASE " + " ".join(clauses) + f" ELSE {last} END"
    return f"SELECT *, {case} AS split FROM {table}"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "sample-v1",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows: a row survives iff
    ``md5(seed:id) % 10000 < fraction[stratum] * 10000``.  Rebalancing a
    skewed corpus (e.g. downsample the dominant language) is a map-side
    filter — no shuffle, no rand(), repeatable."""
    bucket = _bucket(id_col, seed)
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        thresh = F.lit(int(round(frac * _BPS)))
        expr = F.when(cond, thresh) if expr is None else expr.when(cond, thresh)
    thresh_col = (
        F.lit(int(round(default_fraction * _BPS)))
        if expr is None
        else expr.otherwise(F.lit(int(round(default_fraction * _BPS))))
    )
    return df.filter(bucket < thresh_col)


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "sample-v1",
) -> str:
    bucket = _bucket_sql(id_col, seed)
    whens = " ".join(
        f"WHEN {strata_col} = {_sql_str(s)} THEN {int(round(f * _BPS))}"
        for s, f in fractions.items()
    )
    default = int(round(default_fraction * _BPS))
    # empty fractions degenerate to the bare default threshold (mirrors the
    # Spark twin's F.lit fallback; a zero-WHEN CASE is invalid SQL)
    case = str(default) if not whens else f"CASE {whens} ELSE {default} END"
    return f"SELECT * FROM {table} WHERE ({bucket}) < {case}"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    ctx_len: int,
    n_shards: int = 64,
    seed: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chunk sequence packing, sharded for scale: docs are dealt
    into ``n_shards`` hash-buckets, ordered inside each shard by a
    deterministic shuffle key, laid end-to-end, and cut into ``ctx_len``
    token chunks — the standard LLM-pretraining packing (a doc may straddle
    a chunk boundary; ``straddles`` flags it).

    Output: (id, shard, pack_offset, chunk, straddles) where ``pack_offset``
    is the doc's start position in its shard's token stream and ``chunk`` =
    pack_offset // ctx_len.  The running sum is windowed PER SHARD — each
    shard's window sorts independently, so the operator parallelizes across
    shards instead of serializing on a global cumsum (the shard count is the
    parallelism knob; at 100 TB use n_shards ≈ a few × executor count)."""
    key = md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    sharded = df.select(
        F.col(id_col).alias("id"),
        F.col(token_count_col).alias("n_tokens"),
        (key % n_shards).alias("shard"),
        key.alias("__key"),
    )
    w = Window.partitionBy("shard").orderBy("__key", "id")
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("pack_offset")
    out = sharded.select("id", "shard", "n_tokens", offset)
    return out.select(
        "id",
        "shard",
        "pack_offset",
        F.floor(F.col("pack_offset") / ctx_len).cast("bigint").alias("chunk"),
        (
            F.floor((F.col("pack_offset") + F.col("n_tokens") - 1) / ctx_len) > F.floor(F.col("pack_offset") / ctx_len)
        ).alias("straddles"),
    )


def pack_sequences_sql(
    table: str,
    id_col: str,
    token_count_expr: str,
    ctx_len: int,
    n_shards: int = 64,
    seed: str = "pack-v1",
) -> str:
    key = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH sharded AS (
        SELECT {id_col} AS id, {token_count_expr} AS n_tokens,
               ({key}) % {n_shards} AS shard, ({key}) AS __key
        FROM {table}
    ),
    packed AS (
        SELECT id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY __key, id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS pack_offset
        FROM sharded
    )
    SELECT id, shard, CAST(pack_offset AS BIGINT) AS pack_offset,
           CAST(pack_offset // {ctx_len} AS BIGINT) AS chunk,
           (pack_offset + n_tokens - 1) // {ctx_len} > pack_offset // {ctx_len} AS straddles
    FROM packed
    """


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    ctx_len: int,
    n_shards: int = 64,
    seed: str = "pack-v1",
) -> DataFrame:
    """NO-SPLIT greedy sequence packing — the complement of
    :func:`pack_sequences`: documents are dealt into ``n_shards``
    hash-buckets, ordered inside each shard by a deterministic shuffle
    key, and greedily filled into bins that never split a document — a
    new bin starts whenever the next doc would push the running total
    past ``ctx_len``.  This is the packing used when truncating or
    straddling a context boundary is unacceptable (SFT examples,
    documents with loss masks); padding waste is the price, and the
    per-bin fill rate is directly measurable from the output.  A doc
    longer than ``ctx_len`` becomes a singleton bin (callers that want
    to drop those filter first).

    Greedy fill is sequentially dependent, so this is the documented
    Pandas-group path (SURVEY custom-operator rule (b)): one
    ``applyInPandas`` over shards, each shard one linear loop — the
    shard count is the parallelism knob exactly as in
    :func:`pack_sequences`, and shards are hash-balanced so no task sees
    more than ~|docs|/n_shards rows.  Determinism: same seed ⇒ identical
    bins on any cluster size.

    Output: (id, shard, bin, bin_offset) — ``bin`` numbers bins within a
    shard from 0 in fill order, ``bin_offset`` is the doc's token start
    inside its bin."""
    import pandas as pd

    key = md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    sharded = df.select(
        F.col(id_col).alias("id"),
        F.col(token_count_col).cast("bigint").alias("n_tokens"),
        (key % n_shards).alias("shard"),
        key.alias("__key"),
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__key", "id"], kind="mergesort")
        bins, offsets = [], []
        b, cum = 0, 0
        first = True
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if not first and cum + tok > ctx_len:
                b += 1
                cum = 0
            bins.append(b)
            offsets.append(cum)
            cum += tok
            first = False
        pdf = pdf.assign(bin=bins, bin_offset=offsets)
        return pdf[["id", "shard", "bin", "bin_offset"]]

    schema = "id {}, shard bigint, bin bigint, bin_offset bigint".format(
        dict(sharded.dtypes)["id"]
    )
    return sharded.groupBy("shard").applyInPandas(fill, schema=schema)


def pack_greedy_sql(
    table: str,
    id_col: str,
    token_count_expr: str,
    ctx_len: int,
    n_shards: int = 64,
    seed: str = "pack-v1",
) -> str:
    """DuckDB twin of :func:`pack_greedy`: the greedy fill as a recursive
    CTE walking each shard's deterministic order one row per step (level-
    synchronous across shards, so iterations = max shard length)."""
    key = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH RECURSIVE sharded AS (
        SELECT {id_col} AS id, CAST({token_count_expr} AS BIGINT) AS n_tokens,
               ({key}) % {n_shards} AS shard, ({key}) AS __key
        FROM {table}
    ),
    ordered AS (
        SELECT id, n_tokens, shard,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY __key, id) AS rn
        FROM sharded
    ),
    walk AS (
        SELECT shard, rn, id, n_tokens,
               CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS bin_offset,
               n_tokens AS cum
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.id, o.n_tokens,
               CASE WHEN w.cum + o.n_tokens > {ctx_len} THEN w.bin + 1 ELSE w.bin END,
               CASE WHEN w.cum + o.n_tokens > {ctx_len} THEN CAST(0 AS BIGINT) ELSE w.cum END,
               CASE WHEN w.cum + o.n_tokens > {ctx_len} THEN o.n_tokens
                    ELSE w.cum + o.n_tokens END
        FROM walk w JOIN ordered o ON o.shard = w.shard AND o.rn = w.rn + 1
    )
    SELECT id, shard, bin, bin_offset FROM walk
    """


def global_shuffle(
    df: DataFrame, id_col: str, n_shards: int = 64, seed: str = "shuffle-v1"
) -> DataFrame:
    """Deterministic global shuffle: assign every row a stable pseudo-random
    position ``global_pos`` ∈ [0, n) — the epoch-reproducible training order
    (vary ``seed`` per epoch for a fresh permutation; same seed ⇒ identical
    order on any cluster size).

    Two-level plan, the same sharding trick as :func:`pack_sequences`: rows
    are dealt into ``n_shards`` hash-buckets and ranked INSIDE each shard
    (parallel window), then each shard's rank is offset by the cumulative
    sizes of the preceding shards (an ``n_shards``-row aggregate, broadcast
    back).  Equivalent to ``row_number() OVER (ORDER BY hash)`` without the
    single-partition global sort that would serialize at 100 TB.

    Output: (id, shard, shard_pos, global_pos)."""
    key = md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(id_col).alias("id"), key.alias("__key"), (key % n_shards).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("__key", "id")
    pos = keyed.withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
    sizes = keyed.groupBy("shard").agg(F.count(F.lit(1)).alias("__c"))
    # n_shards rows — the single-partition window is deliberate and tiny
    wo = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, 0)
    offs = sizes.select("shard", (F.sum("__c").over(wo) - F.col("__c")).alias("__off"))
    return pos.join(F.broadcast(offs), "shard").select(
        "id",
        "shard",
        "shard_pos",
        (F.col("__off") + F.col("shard_pos") - 1).cast("bigint").alias("global_pos"),
    )


def global_shuffle_sql(
    table: str, id_col: str, n_shards: int = 64, seed: str = "shuffle-v1"
) -> str:
    key = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT {id_col} AS id,
           ({key}) % {n_shards} AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY ({key}) % {n_shards}
                                   ORDER BY ({key}), {id_col}) AS BIGINT) AS shard_pos,
           CAST(ROW_NUMBER() OVER (ORDER BY ({key}) % {n_shards}, ({key}), {id_col}) - 1
                AS BIGINT) AS global_pos
    FROM {table}
    """


def cap_per_group(
    df: DataFrame, id_col: str, group_col: str, k: int, seed: str = "cap-v1"
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically by hash
    order — the per-source cap that stops one crawl/domain from dominating
    the training mix.  Unlike ``ORDER BY rand() LIMIT``, membership is a
    pure function of (seed, id, the group's contents): one window shuffle on
    the group key, rank-k selection inside each group, no global sort."""
    key = md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def cap_per_group_sql(
    table: str, id_col: str, group_col: str, k: int, seed: str = "cap-v1"
) -> str:
    key = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY {group_col}
                                     ORDER BY ({key}), {id_col}) AS __rn
        FROM {table}
    ) WHERE __rn <= {k}
    """


def mix_report(
    df: DataFrame,
    group_col: str,
    weight_col: str | None = None,
    targets: dict[str, float] | None = None,
) -> DataFrame:
    """Training-mix report per group (source/domain/language): weight (row
    count or ``sum(weight_col)``, e.g. tokens), observed share, target
    share, and the downsample-only ``keep_fraction`` that realizes the
    target mix — exactly the fractions :func:`stratified_sample` consumes.

    ``keep_fraction`` = (target/share) normalized so the largest ratio is 1:
    the closest achievable mix without upsampling.  Groups absent from
    ``targets`` keep their observed share (ratio 1 before normalization).

    Plan: one aggregate shuffle on the group key, then two single-partition
    windows over the n_groups-row result — deliberate and tiny (group
    cardinality is sources/languages, not rows)."""
    w_expr = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    per = df.groupBy(F.col(group_col).alias("grp")).agg(w_expr.cast("bigint").alias("w"))
    everything = Window.partitionBy()
    share = F.col("w").cast("double") / F.sum("w").over(everything).cast("double")
    shared = per.select("grp", "w", share.alias("share"))
    if targets:
        expr = None
        for g, t in targets.items():
            cond = F.col("grp") == g
            expr = F.when(cond, F.lit(float(t))) if expr is None else expr.when(cond, F.lit(float(t)))
        target = expr.otherwise(F.col("share"))
    else:
        target = F.col("share")
    # zero-share guard: a group whose summed weight is 0 would yield an
    # infinite/NaN ratio and poison the MAX normalization for every group
    ratio = (
        F.when(F.col("share") > 0, target / F.col("share")).otherwise(F.lit(1.0))
    ).alias("__ratio")
    r = shared.select("grp", "w", "share", target.alias("target"), ratio)
    return r.select(
        "grp",
        "w",
        "share",
        "target",
        (F.col("__ratio") / F.max("__ratio").over(everything)).alias("keep_fraction"),
    )


def mix_report_sql(
    table: str,
    group_col: str,
    weight_expr: str | None = None,
    targets: dict[str, float] | None = None,
) -> str:
    w = "COUNT(*)" if weight_expr is None else f"SUM({weight_expr})"
    if targets:
        whens = " ".join(
            f"WHEN grp = {_sql_str(g)} THEN {float(t)!r}" for g, t in targets.items()
        )
        target = f"CASE {whens} ELSE share END"
    else:
        target = "share"
    return f"""
    WITH per AS (SELECT {group_col} AS grp, CAST({w} AS BIGINT) AS w
                 FROM {table} GROUP BY {group_col}),
    shared AS (SELECT grp, w,
                      CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS share
               FROM per),
    r AS (SELECT grp, w, share, {target} AS target,
                 CASE WHEN share > 0 THEN ({target}) / share ELSE 1.0 END AS __ratio
          FROM shared)
    SELECT grp, w, share, target, __ratio / MAX(__ratio) OVER () AS keep_fraction
    FROM r
    """


def rebalance(
    df: DataFrame,
    id_col: str,
    group_col: str,
    targets: dict[str, float],
    weight_col: str | None = None,
    seed: str = "rebalance-v1",
) -> DataFrame:
    """One call from a target mix to the rebalanced corpus: compute
    downsample-only keep fractions with :func:`mix_report` and apply them
    with :func:`stratified_sample`.

    The only driver-side data movement is the n_groups-row fractions table
    (groups are sources/languages — inherently tiny); the resample itself
    stays a map-side hash filter.  Fractions quantize ONCE to basis points
    (1/10000, round-half-even — the single rounding keeps the SQL twin
    :func:`rebalance_sql` exactly mirrorable via round_even), so realized
    shares track targets to hash-sampling tolerance, deterministically."""
    fr = {
        r["grp"]: int(round(float(r["keep_fraction"]) * _BPS)) / _BPS
        for r in mix_report(df, group_col, weight_col, targets).collect()
    }
    return stratified_sample(df, id_col, group_col, fr, default_fraction=1.0, seed=seed)


def rebalance_sql(
    table: str,
    id_col: str,
    group_col: str,
    targets: dict[str, float],
    weight_expr: str | None = None,
    seed: str = "rebalance-v1",
) -> str:
    """DuckDB twin of :func:`rebalance`: fractions from
    :func:`mix_report_sql`, quantized to basis points with ``round_even``
    (DuckDB's banker's rounding — the same half-even rule as the Python
    ``round`` the Spark path applies), then the identical md5 basis-point
    membership filter.  Every group of ``table`` appears in the mix report,
    so the threshold join is total."""
    mix = mix_report_sql(table, group_col, weight_expr, targets)
    bucket = _bucket_sql(id_col, seed)
    return f"""
    WITH mix AS ({mix}),
    thresh AS (SELECT grp,
                      CAST(round_even(keep_fraction * {_BPS}, 0) AS BIGINT) AS bp
               FROM mix)
    SELECT d.* FROM {table} d
    JOIN thresh t ON d.{group_col} = t.grp
    WHERE ({bucket}) < t.bp
    """


def negative_samples(
    df: DataFrame,
    id_col: str,
    anchor_predicate,
    k: int = 4,
    n_buckets: int = 64,
    seed: str = "neg-v1",
) -> DataFrame:
    """Deterministic negative sampling for contrastive/retrieval training:
    for every ANCHOR row (those matching ``anchor_predicate``), ``k``
    pseudo-random negatives drawn from the whole corpus — (anchor_id,
    neg_rank 1..k, neg_id).

    Scale design — never rank the full corpus per anchor (|A|·|C| scoring
    is the naive trap).  The corpus hashes once into ``n_buckets`` pools
    (md5, map-side); each anchor's slot j probes ONE pseudo-random bucket
    (md5(anchor, j)) and takes the argmin-md5 candidate inside it.  Work is
    |A|·k·(|C|/n_buckets) and every step is an equi-join + windowed argmin
    — at 10⁹ docs pick n_buckets ≈ |C|/10⁵ and each slot scans ~10⁵
    candidates.  All choices are md5-deterministic (reproducible across
    runs, engines, cluster sizes; exact DuckDB twin
    :func:`negative_samples_sql`).

    Slots draw independently (two slots of one anchor can, rarely, land the
    same negative — with-replacement semantics, standard for in-batch
    negative mining).  The anchor itself is excluded; to also exclude an
    anchor's near-duplicates, pre-filter ``df`` through the dedup keep-list
    (operators/dedup.py) so the pool is canonical documents only."""
    pool = df.select(
        F.col(id_col).alias("neg_id"),
        (
            md5_long(F.concat_ws(":", F.lit(seed), F.lit("pool"), F.col(id_col).cast("string")))
            % n_buckets
        ).alias("bucket"),
    )
    anchors = (
        df.filter(anchor_predicate)
        .select(F.col(id_col).alias("anchor_id"))
        .select(
            "anchor_id",
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("neg_rank"),
        )
        .select(
            "anchor_id",
            F.col("neg_rank").cast("int").alias("neg_rank"),
            (
                md5_long(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.lit("probe"),
                        F.col("anchor_id").cast("string"),
                        F.col("neg_rank").cast("string"),
                    )
                )
                % n_buckets
            ).alias("bucket"),
        )
    )
    cand = (
        anchors.join(pool, "bucket")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "neg_rank",
            "neg_id",
            md5_long(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.lit("pair"),
                    F.col("anchor_id").cast("string"),
                    F.col("neg_rank").cast("string"),
                    F.col("neg_id").cast("string"),
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("anchor_id", "neg_rank").orderBy("score", "neg_id")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("anchor_id", "neg_rank", "neg_id")
    )


def negative_samples_sql(
    table: str,
    id_col: str,
    anchor_predicate: str,
    k: int = 4,
    n_buckets: int = 64,
    seed: str = "neg-v1",
) -> str:
    """DuckDB twin of :func:`negative_samples` — same md5 constructions,
    same bucket math, same argmin tie-break."""
    pool_h = md5_long_sql(f"'{seed}:pool:' || CAST({id_col} AS VARCHAR)")
    probe_h = md5_long_sql(
        f"'{seed}:probe:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
    )
    pair_h = md5_long_sql(
        f"'{seed}:pair:' || CAST(p.anchor_id AS VARCHAR) || ':' "
        f"|| CAST(p.neg_rank AS VARCHAR) || ':' || CAST(pool.neg_id AS VARCHAR)"
    )
    return f"""
    WITH pool AS (
        SELECT {id_col} AS neg_id, ({pool_h}) % {n_buckets} AS bucket FROM {table}),
    anch AS (SELECT {id_col} AS anchor_id FROM {table} WHERE {anchor_predicate}),
    probes AS (
        SELECT anchor_id, CAST(j AS INTEGER) AS neg_rank,
               ({probe_h}) % {n_buckets} AS bucket
        FROM anch, UNNEST(range(1, {int(k) + 1})) AS u(j)),
    cand AS (
        SELECT p.anchor_id, p.neg_rank, pool.neg_id, ({pair_h}) AS score
        FROM probes p JOIN pool USING (bucket)
        WHERE pool.neg_id <> p.anchor_id)
    SELECT anchor_id, neg_rank, neg_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, neg_rank
                                     ORDER BY score, neg_id) AS rn
        FROM cand)
    WHERE rn = 1
    """


# 2^60 — the md5_long hash space; exact as a double (power of two).
_H_SPACE = float(1 << 60)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "prio-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    q = w / u with u = md5-uniform in (0, 1]; the sample is the k highest
    priorities, and est_weight = max(w, τ) — τ the (k+1)-th priority —
    is the unbiased subset-sum estimator (Σ est over any sampled subset
    estimates that subset's true Σw), which is what makes a weighted
    sample USEFUL for downstream aggregation, not just selection.

    Determinism: u = (md5₆₀(seed:id) + 1) / 2^60 and q = w / u use only
    IEEE *, /, + — no transcendentals — so Spark and the DuckDB twin
    produce bit-identical priorities, and the hash gate checks the sampled
    SET and the estimates, not just row counts.

    Plan (100 TB): priorities are map-side expressions; the k+1 survivors
    come from orderBy().limit(k+1) — TakeOrderedAndProject, a per-partition
    heap + driver merge of k+1 rows per partition, never a global sort.
    The survivor set is one-shot localCheckpointed (the q15 discipline):
    both consumers (τ scalar, sample rows) read the materialized k+1 rows
    instead of re-running the corpus scan.  τ is a 1-row aggregate —
    provably bounded, broadcast-hinted."""
    u = (
        md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) + F.lit(1)
    ).cast("double") / F.lit(_H_SPACE)
    pr = df.select(
        F.col(id_col),
        F.col(weight_col).alias("weight"),
        (F.col(weight_col).cast("double") / u).alias("priority"),
    )
    ranked = (
        pr.orderBy(F.col("priority").desc(), F.col(id_col)).limit(k + 1).localCheckpoint()
    )
    tau = ranked.agg(
        F.when(F.count(F.lit(1)) > k, F.min("priority")).otherwise(F.lit(0.0)).alias("tau")
    )
    sample = ranked.orderBy(F.col("priority").desc(), F.col(id_col)).limit(k)
    return sample.crossJoin(F.broadcast(tau)).select(
        id_col,
        "weight",
        "priority",
        F.greatest(F.col("weight").cast("double"), F.col("tau")).alias("est_weight"),
    )


def priority_sample_sql(
    table: str, id_col: str, weight_col: str, k: int, seed: str = "prio-v1"
) -> str:
    """DuckDB twin of :func:`priority_sample` — same hash, same two-division
    expression shape, same (k+1)-th-priority threshold."""
    h = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH pr AS (
        SELECT {id_col}, {weight_col} AS weight,
               CAST({weight_col} AS DOUBLE)
                 / (CAST(({h}) + 1 AS DOUBLE) / {_H_SPACE!r}) AS priority
        FROM {table}),
    ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, {id_col}) AS rn
               FROM pr),
    tau AS (SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN priority END), 0.0) AS tau
            FROM ranked)
    SELECT {id_col}, weight, priority,
           GREATEST(CAST(weight AS DOUBLE), tau) AS est_weight
    FROM ranked, tau
    WHERE rn <= {k}
    """


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Token-budget mixture planning: given target mix weights and a total
    token budget, compute per-source availability, target, sampling rate,
    epoch count and deficit — the bookkeeping that turns 'we want 70% web
    / 20% code / 10% papers' into executable per-source sampling rates
    (feed ``sample_rate`` to :func:`stratified_sample`, or repeat a source
    ``epochs`` times when the target exceeds what exists).

    Per source: tokens_target = budget·w; sample_rate = min(1, target /
    available); epochs = target/available (> 1 ⇒ the source must repeat);
    deficit = max(0, target − available).  A source whose token sum is 0
    (all-empty docs) gets sample_rate = epochs = 0.0 and deficit = the
    full target — defined values instead of an ANSI DIVIDE_BY_ZERO.
    Sums are exact integers; the ratios are single IEEE divisions —
    bit-identical in the SQL twin.

    Plan: one partial-aggregated groupBy over the corpus + a join against
    the inline weight table (bounded by construction — it IS the
    argument)."""
    w_rows = [(s, float(w)) for s, w in sorted(weights.items())]
    wdf = df.sparkSession.createDataFrame(w_rows, ["source", "w"])
    agg = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("bigint").alias("tokens_available"),
        )
    )
    target = F.lit(float(budget_tokens)) * F.col("w")
    avail = F.col("tokens_available").cast("double")
    empty = F.col("tokens_available") == 0
    return (
        agg.join(F.broadcast(wdf), "source")
        .select(
            "source",
            "n_docs",
            "tokens_available",
            target.alias("tokens_target"),
            F.when(empty, F.lit(0.0))
            .otherwise(F.least(F.lit(1.0), target / avail))
            .alias("sample_rate"),
            F.when(empty, F.lit(0.0)).otherwise(target / avail).alias("epochs"),
            F.greatest(F.lit(0.0), target - avail).alias("deficit_tokens"),
        )
    )


def mixture_plan_sql(
    table: str,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> str:
    """DuckDB twin of :func:`mixture_plan` — same inline weight table, same
    single-division expressions."""
    vals = ", ".join(f"({_sql_str(s)}, {float(w)!r})" for s, w in sorted(weights.items()))
    return f"""
    WITH w(source, w) AS (VALUES {vals}),
    agg AS (SELECT {source_col} AS source, COUNT(*) AS n_docs,
                   CAST(SUM({token_col}) AS BIGINT) AS tokens_available
            FROM {table} GROUP BY 1)
    SELECT a.source, a.n_docs, a.tokens_available,
           CAST({float(budget_tokens)!r} AS DOUBLE) * w.w AS tokens_target,
           CASE WHEN a.tokens_available = 0 THEN 0.0
                ELSE LEAST(1.0, (CAST({float(budget_tokens)!r} AS DOUBLE) * w.w)
                        / CAST(a.tokens_available AS DOUBLE)) END AS sample_rate,
           CASE WHEN a.tokens_available = 0 THEN 0.0
                ELSE (CAST({float(budget_tokens)!r} AS DOUBLE) * w.w)
             / CAST(a.tokens_available AS DOUBLE) END AS epochs,
           GREATEST(0.0, CAST({float(budget_tokens)!r} AS DOUBLE) * w.w
                           - CAST(a.tokens_available AS DOUBLE)) AS deficit_tokens
    FROM agg a JOIN w ON w.source = a.source
    """


def temperature_mix(
    df: DataFrame,
    source_col: str,
    token_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Temperature-scaled source mixing at T = 1/2 (the multilingual /
    multi-source rebalancing rule of mC4 / XLM-R: sample source i with
    probability p_i^α / Σ p_j^α, upweighting the tail, downweighting the
    head) — where :func:`mixture_plan` takes EXPLICIT weights, this
    DERIVES them from the corpus itself.  α = 0.5 is the specialization
    whose power is IEEE-exact (sqrt), so the whole plan hash-gates; other
    temperatures would drag exp/ln cross-engine rounding into the gate.

    Per source: share = sqrt(tokens_i) / Σ_j sqrt(tokens_j) (the Σ is an
    ordered per-source fold — sources, not rows, so the frame is tiny at
    any corpus size), tokens_target = budget·share, sample_rate =
    min(1, target/available) with 0-token sources pinned to 0.0.

    Plan: one partial-aggregated groupBy over the corpus, then a one-row
    fold broadcast back — nothing else touches the data."""
    agg = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("bigint").alias("tokens_available"),
        )
        .localCheckpoint()  # feeds the fold AND the final projection
    )
    total = agg.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "tokens_available"))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["tokens_available"].cast("double")),
        ).alias("__tot")
    )
    share = F.sqrt(F.col("tokens_available").cast("double")) / F.col("__tot")
    target = F.lit(float(budget_tokens)) * share
    avail = F.col("tokens_available").cast("double")
    empty = F.col("tokens_available") == 0
    return agg.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "tokens_available",
        share.alias("share"),
        target.alias("tokens_target"),
        F.when(empty, F.lit(0.0))
        .otherwise(F.least(F.lit(1.0), target / avail))
        .alias("sample_rate"),
    )


def temperature_mix_sql(
    table: str, source_col: str, token_col: str, budget_tokens: int
) -> str:
    """DuckDB twin of :func:`temperature_mix` — same ordered fold over
    (source asc), same single-division expressions."""
    return f"""
    WITH agg AS (SELECT {source_col} AS source, COUNT(*) AS n_docs,
                        CAST(SUM({token_col}) AS BIGINT) AS tokens_available
                 FROM {table} GROUP BY 1),
    tot AS (SELECT list_sum(list_transform(
                list(struct_pack(source := source, t := tokens_available)
                     ORDER BY source),
                s -> sqrt(CAST(s.t AS DOUBLE)))) AS tt
            FROM agg)
    SELECT a.source, a.n_docs, a.tokens_available,
           sqrt(CAST(a.tokens_available AS DOUBLE)) / tt AS share,
           CAST({float(budget_tokens)!r} AS DOUBLE)
             * (sqrt(CAST(a.tokens_available AS DOUBLE)) / tt) AS tokens_target,
           CASE WHEN a.tokens_available = 0 THEN 0.0
                ELSE LEAST(1.0, (CAST({float(budget_tokens)!r} AS DOUBLE)
                        * (sqrt(CAST(a.tokens_available AS DOUBLE)) / tt))
                        / CAST(a.tokens_available AS DOUBLE)) END AS sample_rate
    FROM agg a CROSS JOIN tot
    """


def rate_cap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    unique_col: str,
    window_seconds: int,
    max_per_window: int,
) -> DataFrame:
    """Per-key rate capping: keep at most ``max_per_window`` rows per
    (key, tumbling event-time window), earliest-first (ties by the unique
    column — a total order, so the kept set is engine-exact).  The
    ingestion throttle for abusive producers / scraper bursts: a key that
    floods one window loses its excess, everyone else is untouched.
    Returns the kept rows with their window start and in-window rank.

    Scale: one (key, window) exchange + sort for the row_number — the
    same shape as sessionization; the window bucket is integer-exact
    microsecond arithmetic shared with the twin.  The bucket is
    ``a - pmod(a, w)`` (exact integer FLOOR division), not ``div``:
    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors,
    so the two silently disagree on pre-1970 (negative-epoch)
    timestamps; pmod's always-positive remainder makes Spark's bucket
    the floored one on the whole signed range."""
    win_us = int(window_seconds) * 1_000_000
    bucket = F.expr(f"unix_micros({ts_col}) - pmod(unix_micros({ts_col}), {win_us})")
    w = Window.partitionBy(key_col, "win_start").orderBy(ts_col, unique_col)
    return (
        df.withColumn("win_start", bucket)
        .withColumn("in_window_rank", F.row_number().over(w))
        .filter(F.col("in_window_rank") <= int(max_per_window))
    )


def rate_cap_sql(
    table: str,
    key_col: str,
    ts_col: str,
    unique_col: str,
    window_seconds: int,
    max_per_window: int,
    select_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`rate_cap` — same FLOORED integer bucket
    (``a - ((a % w + w) % w)``: DuckDB's integer ``//`` truncates toward
    zero like Spark's ``div``, so floor semantics must be explicit on
    both engines for pre-1970 epochs), same total order, QUALIFY form."""
    win_us = int(window_seconds) * 1_000_000
    e = f"epoch_us({ts_col})"
    bucket = f"({e} - ((({e} % {win_us}) + {win_us}) % {win_us}))"
    return f"""
    SELECT {select_cols},
           {bucket} AS win_start,
           ROW_NUMBER() OVER (PARTITION BY {key_col}, {bucket}
                              ORDER BY {ts_col}, {unique_col}) AS in_window_rank
    FROM {table}
    QUALIFY in_window_rank <= {int(max_per_window)}
    """


def weighted_reservoir(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: str = "ares-v1",
) -> DataFrame:
    """Weighted reservoir sample WITHOUT replacement via A-Res
    (Efraimidis & Spirakis, IPL 2006): each row draws key = u^(1/w) with
    u uniform in (0, 1]; the sample is the ``n`` LARGEST keys.  The
    *reservoir* framing is what the streaming face maintains incrementally
    (streaming/reservoir.py): the key is computed once per item and the
    top-``n`` set is a mergeable state, so batch and stream agree exactly.

    Where :func:`priority_sample` (w/u priorities) buys the unbiased
    subset-sum estimator, A-Res buys the inclusion law P(i first) =
    wᵢ/Σw recursively — the standard choice when the sample must follow
    the weight distribution (temperature-mixed corpus draws) rather than
    estimate totals.

    Determinism: u = (md5₆₀(seed:id) + 1) / 2⁶⁰ and the rank key is
    ln(u)/w — the MONOTONE log form of u^(1/w) (w > 0), so selection
    needs only ln agreement (pinned by the cross-engine ln battery) and
    never pow.  Rows with weight <= 0 or NULL draw no key and are
    excluded (u^(1/w) is undefined there; the paper assumes w > 0).

    Plan (100 TB): keys are map-side expressions; the survivors come from
    orderBy().limit(n) — TakeOrderedAndProject (per-partition heap +
    driver merge of n rows per partition), never a global sort.

    Returns (id, weight, res_key) with res_key = round(u^(1/w), 6)
    (display form; ranking uses the unrounded log key).
    """
    u = (
        md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) + F.lit(1)
    ).cast("double") / F.lit(_H_SPACE)
    lk = F.log(u) / F.col(weight_col).cast("double")
    keyed = df.filter(F.col(weight_col) > 0).select(
        F.col(id_col),
        F.col(weight_col).alias("weight"),
        lk.alias("__lk"),
    )
    return (
        keyed.orderBy(F.col("__lk").desc(), F.col(id_col))
        .limit(int(n))
        .select(id_col, "weight", F.round(F.exp(F.col("__lk")), 6).alias("res_key"))
    )


def weighted_reservoir_sql(
    table: str, id_col: str, weight_col: str, n: int, seed: str = "ares-v1"
) -> str:
    """DuckDB twin of :func:`weighted_reservoir` — same hash-uniform, same
    ln(u)/w rank key, same tie-break, same rounded display key."""
    h = md5_long_sql(f"'{seed}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH keyed AS (
        SELECT {id_col}, {weight_col} AS weight,
               ln(CAST(({h}) + 1 AS DOUBLE) / {_H_SPACE!r})
                 / CAST({weight_col} AS DOUBLE) AS lk
        FROM {table}
        WHERE {weight_col} > 0)
    SELECT {id_col}, weight, round(exp(lk), 6) AS res_key
    FROM keyed
    ORDER BY lk DESC, {id_col}
    LIMIT {int(n)}
    """
