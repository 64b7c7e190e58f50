"""The full training-corpus preparation pipeline in ONE call — the
composition a real LLM data team runs nightly (SURVEY.md §2.2; every stage
is an already-oracle-verified operator of this repo):

  1. dedup (exact fingerprint pass → n-gram-Jaccard near-dup clusters →
     one canonical doc per cluster)                 operators/dedup.py
  2. benchmark decontamination vs an eval set       operators/decontam.py
  3. heuristic quality filter (C4/Gopher-family)    operators/textstats.py
  4. deterministic train/val/test hash split        operators/sampling.py

Scale: each stage is the scale-shaped plan its module documents (df-capped
candidate joins, broadcast eval probe, map-side scoring and split); between
stages only ID KEEP-LISTS flow — the document bodies are semi-joined back
once per stage boundary and never shuffle by value.

`prepare_corpus_sql` composes the SAME stage twins into one nested DuckDB
query, so the driver hash-checks the END-TO-END composition, not just the
stages (the dedup_pipeline_full discipline, extended to the whole prep)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipeline_omnichanneltobigquery_spark.operators import dedup as dd
from datapipeline_omnichanneltobigquery_spark.operators import decontam as dc
from datapipeline_omnichanneltobigquery_spark.operators import sampling as sa
from datapipeline_omnichanneltobigquery_spark.operators import textstats as ts


def prepare_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_min_overlap: int = 3,
    decontam_max_df_bench: int = 8,
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "corpus-v1",
) -> DataFrame:
    """docs + eval set → deduplicated, decontaminated, quality-filtered,
    split-labeled corpus rows (all original columns + ``split``)."""
    split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    labeled = dd.dedup_pipeline(
        docs, id_col, text_col, n=jaccard_n, threshold=jaccard_threshold
    )
    # the keep-list is localCheckpointed (id-sized state): downstream,
    # `kept` is referenced twice by decontaminate (shingle probe + final
    # anti-join), and without the cut Catalyst re-derives the WHOLE dedup
    # chain — scans included — once per reference (7 corpus scans in the
    # compiled round-7 plan; 2 after, the floor for probe + anti-join)
    keep_ids = (
        labeled.filter(F.col("keep")).select(F.col("id").alias(id_col)).localCheckpoint()
    )
    kept = docs.join(keep_ids, id_col, "left_semi")

    clean = dc.decontaminate(
        kept, bench, id_col, text_col, id_col, text_col,
        n=decontam_n, min_overlap=decontam_min_overlap,
        max_df_bench=decontam_max_df_bench,
    )

    # map-side score-and-filter: no metrics projection, no semi-join back
    good = clean.filter(ts.quality_score(F.col(text_col)) >= F.lit(min_quality))

    return sa.hash_split(good, id_col, split_weights, seed=split_seed)


def _dedup_keep_sql(
    table_expr: str, id_col: str, text_col: str, n: int, threshold: float
) -> str:
    """Kept-rows expression after the dedup chain (exact → Jaccard → CC →
    canonical winner) over an arbitrary table expression — the
    llm_ops._dedup_pipeline_oracle composition, parameterized."""
    surv = (
        f"(SELECT MIN({id_col}) AS {id_col}, {text_col} FROM "
        f"(SELECT {id_col}, {text_col}, md5({text_col}) AS fp FROM {table_expr}) "
        f"GROUP BY fp, {text_col})"
    )
    cc = dd.connected_components_sql(
        dd.jaccard_pairs_sql(
            surv, id_col, text_col, n=n, threshold=threshold, max_df=dd.JACCARD_MAX_DF
        )
    )
    return f"""(
    WITH labeled AS ({cc}),
    surv AS (SELECT MIN({id_col}) AS id FROM
             (SELECT {id_col}, md5({text_col}) AS fp FROM {table_expr}) GROUP BY fp),
    keepers AS (
        SELECT s.id FROM surv s LEFT JOIN labeled l ON l.id = s.id
        WHERE s.id = COALESCE(l.cluster_id, s.id))
    SELECT d.* FROM {table_expr} d WHERE d.{id_col} IN (SELECT id FROM keepers)
    )"""


def prepare_corpus_sql(
    docs_expr: str,
    bench_expr: str,
    id_col: str,
    text_col: str,
    *,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_min_overlap: int = 3,
    decontam_max_df_bench: int = 8,
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "corpus-v1",
    out_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`prepare_corpus`, composed from the stage twins
    with the same constants."""
    split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    kept = _dedup_keep_sql(docs_expr, id_col, text_col, jaccard_n, jaccard_threshold)
    clean = "(" + dc.decontaminate_sql(
        kept, bench_expr, id_col, text_col, id_col, text_col,
        n=decontam_n, min_overlap=decontam_min_overlap,
        max_df_bench=decontam_max_df_bench, select_cols="tr.*",
    ) + ")"
    quality = ts.text_quality_sql(clean, id_col, text_col)
    good = f"""(
    SELECT * FROM {clean}
    WHERE {id_col} IN (SELECT {id_col} FROM ({quality}) WHERE quality_score >= {min_quality})
    )"""
    split = sa.hash_split_sql(good, id_col, split_weights, seed=split_seed)
    return f"SELECT {out_cols} FROM ({split})"


def _dedup_artifacts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    rows_per_band: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three per-doc dedup artifacts of a document set: (id, fp) exact
    fingerprints, (id, h60) distinct hashed shingle sets, (id, band, key)
    LSH band keys.  One shingle explode feeds both the shingle sets and
    the MinHash signatures."""
    num_bands = num_hashes // rows_per_band
    ids = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    fp = ids.select("id", F.md5("text").alias("fp"))
    # the hashed set is LAZILY checkpointed so the signature consumer
    # reads the materialized rows instead of re-running the explode +
    # distinct (the index build previously ran the explode twice, and
    # the incremental probe three times — r15 optimization round)
    hashed = dd.hashed_shingles(ids, "id", "text", n).localCheckpoint(eager=False)
    sig = dd._signatures_from_hashed(hashed, num_hashes)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                dd._band_key(num_hashes, rows_per_band, i).alias("key"),
            )
            for i in range(num_bands)
        ]
    )
    keyed = sig.select("id", F.explode(bands).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    return fp, hashed, keyed


def _write_artifacts(
    fp: DataFrame, hashed: DataFrame, keyed: DataFrame, index_path: str, mode: str
) -> None:
    """Write the three dedup-index tables, OVERLAPPING the two independent
    jobs (guide §2.6: actions are only sequential because the driver calls
    them sequentially — concurrent independent writes back-fill each
    other's stragglers).  The fingerprint write shares no state with the
    shingle write, so the two run concurrently; the bands write consumes
    the lazily-checkpointed ``hashed`` that the shingle write materializes,
    so it waits for that write (never racing the checkpoint), then runs."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_fp = pool.submit(
            lambda: fp.write.mode(mode).parquet(f"{index_path}/fingerprints")
        )
        f_sh = pool.submit(
            lambda: hashed.write.mode(mode).parquet(f"{index_path}/shingles")
        )
        f_sh.result()
        f_fp.result()
    keyed.write.mode(mode).partitionBy("band").parquet(f"{index_path}/bands")


def build_dedup_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    *,
    jaccard_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> None:
    """Persist the corpus's DEDUP INDEX — the maintained artifact that makes
    :func:`prepare_corpus_incremental` linear in the batch (the
    build/append discipline of similarity.build_ivf_index, applied to
    dedup).  Three tables under ``index_path``:

      fingerprints/  (id, fp)          exact md5 fingerprints
      shingles/      (id, h60)         distinct 60-bit hashed shingle sets
      bands/         (id, band, key)   LSH band-bucket keys, hive-
                                       partitioned by band

    Together ~1-3% of corpus text bytes; a nightly batch reads ONLY these —
    never corpus text.  The (jaccard_n, num_hashes, rows_per_band)
    constants are part of the index contract: probes must pass the same
    values (the IVF-index convention).  At cluster scale, write bands/
    bucketed by ``key`` and shingles/ bucketed by ``id`` (sinks/bucketed)
    to make every probe join shuffle-free on the index side."""
    fp, hashed, keyed = _dedup_artifacts(
        docs, id_col, text_col, jaccard_n, num_hashes, rows_per_band
    )
    _write_artifacts(fp, hashed, keyed, index_path, "overwrite")


def append_to_dedup_index(
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    *,
    jaccard_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> None:
    """Append a KEPT batch's artifacts to an existing dedup index — new
    parquet files beside the old (no rewrite; work linear in the batch).
    Call with exactly the rows :func:`prepare_corpus_incremental` kept, and
    the same constants the index was built with."""
    fp, hashed, keyed = _dedup_artifacts(
        new_docs, id_col, text_col, jaccard_n, num_hashes, rows_per_band
    )
    _write_artifacts(fp, hashed, keyed, index_path, "append")


def prepare_corpus_incremental(
    spark,
    index_path: str,
    batch: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    jaccard_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    neardup_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_min_overlap: int = 3,
    decontam_max_df_bench: int = 8,
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "corpus-v1",
) -> DataFrame:
    """INCREMENTAL corpus prep: the rows of a NEW ``batch`` that should be
    appended to an already-prepared corpus whose dedup index lives at
    ``index_path`` (:func:`build_dedup_index`) — the nightly shape once the
    corpus exists.  The plan reads the INDEX TABLES and the batch, never
    the corpus text (pinned by a plan test): re-running
    :func:`prepare_corpus` over existing+batch would rescan the whole
    100 TB corpus for a 0.1% delta.

    Stage shapes, each linear in the batch (plus index-table reads):

    1. exact — within-batch min-id winners, then an anti-join of batch
       fingerprints against the persisted fingerprint keylist;
    2. near-dup — the batch's LSH band keys probe the persisted
       band-bucket index (only matching buckets survive the join) plus a
       batch self-join; candidates verify with EXACT Jaccard over 60-bit
       hashed shingle sets — batch sets explode from batch text, existing
       sets are READ from the shingles table semi-joined to candidate ids
       BEFORE any explode, so no full-corpus Generate exists anywhere.  A
       batch doc verified against ANY existing doc drops (the corpus
       already holds its canonical); surviving batch-batch pairs cluster
       (large-star/small-star) and keep the min-id winner;
    3-5. decontam / quality / hash split run on the batch alone —
       map-side, and ``hash_split``'s (seed, id)-only membership keeps new
       rows' split assignment consistent with every earlier batch.

    Ids must be unique across corpus ∪ batch (the upsert key contract);
    (jaccard_n, num_hashes, rows_per_band) must match the index build.
    After appending the kept rows to the corpus, call
    :func:`append_to_dedup_index` with the SAME kept rows.  Deterministic
    end to end; composed DuckDB twin (which recomputes the index
    definition from the raw existing docs — same values, oracle-side
    cost): :func:`prepare_corpus_incremental_sql`."""
    split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    ix_fp = spark.read.parquet(f"{index_path}/fingerprints")
    ix_sh = spark.read.parquet(f"{index_path}/shingles")
    ix_bands = spark.read.parquet(f"{index_path}/bands")

    # -- stage 1: exact ---------------------------------------------------
    # b1 (the exact-surviving batch rows) is localCheckpointed: it is
    # referenced by every later stage (bids twice inside v2, s1, kept),
    # and without the cut each reference re-derives the whole exact stage
    # from the batch scan (the compiled round-7 plan read the batch's
    # parquet 18 times).  Materialized state is BATCH-sized — the nightly
    # delta, not the corpus — which the module contract already budgets.
    # LAZY (r16): the near-dup stage's materialization job below is b1's
    # first consumer and materializes it in the same job — every eager
    # checkpoint here was a separate sequential job barrier; the lazy form
    # keeps the exactly-once materialization and drops the barrier.
    win = dd.dedup_exact_keylist(batch, text_col, id_col).select(id_col)
    b1 = (
        batch.join(win, id_col, "left_semi")
        .withColumn("__fp", F.md5(F.col(text_col)))
        .join(ix_fp.select(F.col("fp").alias("__fp")), "__fp", "left_anti")
        .drop("__fp")
        .localCheckpoint(eager=False)
    )

    # -- stage 2: near-dup via LSH index probe ----------------------------
    # hb is already lazily checkpointed inside _dedup_artifacts (and kb
    # derives from that same materialization, so the shingle explode runs
    # once); kb gets its own lazy checkpoint for its two consumers below
    _, hb, kb = _dedup_artifacts(b1, id_col, text_col, jaccard_n, num_hashes, rows_per_band)
    kb = kb.localCheckpoint(eager=False)
    cross = kb.join(
        ix_bands.select(F.col("id").alias("id2"), "band", "key"), ["band", "key"]
    ).select(
        F.least("id", "id2").alias("id_a"), F.greatest("id", "id2").alias("id_b")
    )
    kb2 = kb.select(F.col("id").alias("id2"), "band", "key")
    bb_cand = (
        kb.join(kb2, ["band", "key"])
        .filter(F.col("id") < F.col("id2"))
        .select(F.col("id").alias("id_a"), F.col("id2").alias("id_b"))
    )
    # ONE distinct over the union replaces the per-branch distincts — the
    # final set is identical and two aggregation exchanges disappear.
    # Lazy: materializes inside the verify job (its only consumers live
    # there), shared exactly once — no dedicated checkpoint job.
    cand = cross.unionByName(bb_cand).distinct().localCheckpoint(eager=False)

    # existing shingle sets come from the INDEX, restricted to candidate
    # ids BEFORE anything else touches them; batch sets are hb (already
    # hashed).  verify_jaccard_pairs then computes exact Jaccard over the
    # h60 sets — equal to string-shingle Jaccard up to mirrored collisions.
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh_ex = ix_sh.join(cand_ids, "id", "left_semi")
    sh_all = hb.unionByName(sh_ex).select("id", F.col("h60").alias("shingle"))
    # lazy: first materialized by the CC edge job (via bb_pairs), then the
    # final keep semi-join reads the checkpointed rows
    verified = dd.verify_jaccard_pairs(sh_all, cand, neardup_threshold).localCheckpoint(
        eager=False
    )

    bids = b1.select(F.col(id_col).alias("id"), F.lit(1).alias("__isb"))
    v2 = (
        verified.join(
            bids.select(F.col("id").alias("id_a"), F.col("__isb").alias("__ba")),
            "id_a",
            "left",
        )
        .join(
            bids.select(F.col("id").alias("id_b"), F.col("__isb").alias("__bb")),
            "id_b",
            "left",
        )
    )
    drop = v2.filter(
        F.coalesce("__ba", F.lit(0)) != F.coalesce("__bb", F.lit(0))
    ).select(
        F.when(F.col("__ba") == 1, F.col("id_a")).otherwise(F.col("id_b")).alias("id")
    )
    # s1 (batch survivors after existing-dup drops) is consumed THREE
    # times (both bb_pairs semi-join sides + the final keep) and keep
    # TWICE (decontaminate references its train side in the shingle
    # probe AND the final anti-join) — without the lazy cuts the final
    # job re-derived the whole verified→s1 anti-join chain once per
    # reference (the r16 before-plan shows the SMJ-anti subtree twice).
    # Both are batch-id-sized frames.
    s1 = bids.select("id").join(drop, "id", "left_anti").localCheckpoint(eager=False)
    bb_pairs = (
        v2.filter((F.col("__ba") == 1) & (F.col("__bb") == 1))
        .join(s1.select(F.col("id").alias("id_a")), "id_a", "left_semi")
        .join(s1.select(F.col("id").alias("id_b")), "id_b", "left_semi")
        .select("id_a", "id_b")
    )
    cc = dd.connected_components_star(bb_pairs)
    losers = cc.filter(F.col("id") != F.col("cluster_id")).select("id")
    keep = (
        s1.join(losers, "id", "left_anti")
        .select(F.col("id").alias(id_col))
        .localCheckpoint(eager=False)
    )
    kept = b1.join(keep, id_col, "left_semi")

    # -- stages 3-5: batch-only -------------------------------------------
    clean = dc.decontaminate(
        kept, bench, id_col, text_col, id_col, text_col,
        n=decontam_n, min_overlap=decontam_min_overlap,
        max_df_bench=decontam_max_df_bench,
    )
    good = clean.filter(ts.quality_score(F.col(text_col)) >= F.lit(min_quality))
    return sa.hash_split(good, id_col, split_weights, seed=split_seed)


def prepare_corpus_incremental_sql(
    existing_expr: str,
    batch_expr: str,
    bench_expr: str,
    id_col: str,
    text_col: str,
    *,
    jaccard_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    neardup_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_min_overlap: int = 3,
    decontam_max_df_bench: int = 8,
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "corpus-v1",
    out_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`prepare_corpus_incremental`, composed from the
    same stage twins and hash constants (candidates = LSH band-mates among
    existing ∪ batch restricted to pairs touching the batch — exactly the
    pair set the Spark side's index-probe + batch self-join produces)."""
    from datapipeline_omnichanneltobigquery_spark.functions.hashing import (
        MERSENNE_P,
        _minhash_params,
        md5_long_sql,
    )

    split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    num_bands = num_hashes // rows_per_band
    params = _minhash_params(num_hashes)
    mh_exprs = ",\n             ".join(
        f"MIN(((h60 % {MERSENNE_P}) * {a} + {b}) % {MERSENNE_P}) AS mh_{i}"
        for i, (a, b) in enumerate(params)
    )
    band_rows = "\n        UNION ALL\n".join(
        "        SELECT id, {band} AS band, concat_ws(',', {cols}) AS key FROM sig".format(
            band=i,
            cols=", ".join(
                f"CAST(mh_{i * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
            ),
        )
        for i in range(num_bands)
    )
    cc = dd.connected_components_sql("SELECT id_a, id_b FROM bbp")
    kept = f"""(
    WITH b1 AS (
        SELECT d.* FROM {batch_expr} d
        WHERE d.{id_col} IN (
            SELECT MIN({id_col}) FROM
            (SELECT {id_col}, md5({text_col}) AS fp FROM {batch_expr}) GROUP BY fp)
          AND NOT EXISTS (SELECT 1 FROM {existing_expr} e
                          WHERE md5(e.{text_col}) = md5(d.{text_col}))),
    docs_all AS (SELECT {id_col} AS id, {text_col} AS text FROM {existing_expr}
                 UNION ALL
                 SELECT {id_col} AS id, {text_col} AS text FROM b1),
    {dd._shingles_sql("docs_all", "id", "text", jaccard_n)},
    hashed AS MATERIALIZED (SELECT DISTINCT id, {md5_long_sql("shingle")} AS h60 FROM sh),
    sig AS (SELECT id,
             {mh_exprs}
            FROM hashed GROUP BY id),
    keyed AS (
{band_rows}
    ),
    bids AS (SELECT {id_col} AS id FROM b1),
    cand AS MATERIALIZED (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM keyed a JOIN keyed b
               ON a.band = b.band AND a.key = b.key AND a.id < b.id
             WHERE a.id IN (SELECT id FROM bids) OR b.id IN (SELECT id FROM bids)),
    sizes AS (SELECT id, COUNT(*) AS sz FROM hashed GROUP BY id),
    -- intersections ONLY for candidate pairs (the Spark side semi-joins
    -- candidate ids against the shingle table BEFORE any pairing; an
    -- all-pairs hashed-self-join here was quadratic in hot shingles and
    -- dominated the oracle's runtime)
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS ic
              FROM cand c
              JOIN hashed a ON a.id = c.id_a
              JOIN hashed b ON b.id = c.id_b AND b.h60 = a.h60
              GROUP BY 1, 2),
    verified AS (
        SELECT c.id_a, c.id_b FROM cand c
        JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN sizes sa ON sa.id = c.id_a
        JOIN sizes sb ON sb.id = c.id_b
        WHERE CAST(ic AS DOUBLE) / CAST(sa.sz + sb.sz - ic AS DOUBLE)
              >= {neardup_threshold}),
    flags AS (SELECT id_a, id_b,
                     id_a IN (SELECT id FROM bids) AS ba,
                     id_b IN (SELECT id FROM bids) AS bb
              FROM verified),
    drop1 AS (SELECT CASE WHEN ba THEN id_a ELSE id_b END AS id
              FROM flags WHERE ba <> bb),
    s1 AS (SELECT id FROM bids t
           WHERE NOT EXISTS (SELECT 1 FROM drop1 x WHERE x.id = t.id)),
    bbp AS (SELECT id_a, id_b FROM flags
            WHERE ba AND bb
              AND id_a IN (SELECT id FROM s1) AND id_b IN (SELECT id FROM s1)),
    labeled AS ({cc}),
    losers AS (SELECT id FROM labeled WHERE id <> cluster_id),
    keep AS (SELECT id FROM s1 t
             WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = t.id))
    SELECT d.* FROM b1 d WHERE d.{id_col} IN (SELECT id FROM keep)
    )"""
    clean = "(" + dc.decontaminate_sql(
        kept, bench_expr, id_col, text_col, id_col, text_col,
        n=decontam_n, min_overlap=decontam_min_overlap,
        max_df_bench=decontam_max_df_bench, select_cols="tr.*",
    ) + ")"
    quality = ts.text_quality_sql(clean, id_col, text_col)
    good = f"""(
    SELECT * FROM {clean}
    WHERE {id_col} IN (SELECT {id_col} FROM ({quality}) WHERE quality_score >= {min_quality})
    )"""
    split = sa.hash_split_sql(good, id_col, split_weights, seed=split_seed)
    return f"SELECT {out_cols} FROM ({split})"
