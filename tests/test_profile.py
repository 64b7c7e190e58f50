"""Semantics + plan-shape tests for the single-pass column profiler
(operators/profile.py) beyond oracle parity."""

from __future__ import annotations

from datapipeline_omnichanneltobigquery_spark.operators.profile import profile_columns


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)],
        ["k", "s", "v"],
    )


def test_profile_null_distinct_minmax(spark):
    rows = {r.col_name: r for r in profile_columns(_df(spark)).collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_nulls == 0 and rows["k"].n_distinct == 3
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_val == "a" and rows["s"].max_val == "b"
    # min/max on the NATIVE type: 2.5 < 10.0 numerically even though
    # "10.0" < "2.5" lexicographically
    assert rows["v"].min_val == "2.5" and rows["v"].max_val == "10.0"
    assert rows["v"].n_nulls == 1 and rows["v"].n_distinct == 2


def test_profile_scan_and_aggregate_shape(spark):
    """No per-column passes: at most two scan subtrees (the full profile +
    the column-pruned string min/max side), and the Expand-carrying
    distinct stream stays on HashAggregate — string buffers must NOT drag
    it through SortAggregate (measured 2.5x at sf0.1)."""
    df = _df(spark)
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 2
    assert "Expand" in plan
    expand_at = plan.index("Expand")
    assert "SortAggregate" not in plan[:expand_at]  # hash path above the Expand


def test_profile_approx_drops_expand(spark):
    """approx=True replaces exact multi-distinct (Expand) with HLL++ —
    the screening-scale form has no Expand node."""
    df = _df(spark)
    exact = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    approx = profile_columns(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact
    assert "Expand" not in approx
    rows = {r.col_name: r for r in profile_columns(df, approx=True).collect()}
    # HLL++ at default rsd is exact-ish at tiny cardinalities
    assert rows["k"].n_distinct == 3


def test_equidepth_buckets_are_balanced_and_ordered(spark):
    """Equi-depth bucket counts differ by at most one row and spans are
    non-overlapping in bucket order."""
    from datapipeline_omnichanneltobigquery_spark.operators.profile import histogram_equidepth

    df = spark.createDataFrame([(i, float(i * i % 997)) for i in range(500)], ["id", "x"])
    rows = sorted(histogram_equidepth(df, "x", "id", 7).collect(), key=lambda r: r.bucket)
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1 and sum(counts) == 500
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_hll_explicit_accuracy(spark):
    """The explicit-HLL estimate lands within the sketch's expected error
    (~1.04/sqrt(512) ≈ 4.6%; assert a generous 10%) of the exact distinct
    count for every group."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.profile import hll_explicit
    from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    est = {r.event_type: r.est_distinct for r in hll_explicit(ev, "event_type", "user_id").collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n <= 0.10, (k, n, est[k])


def test_cms_estimates_upper_bound_and_exactness(spark):
    """CMS contract: est >= exact for every key; with width >> distinct
    keys the estimates are exact for (nearly) all keys."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.profile import cms_estimates
    from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events")
    exact = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r.user_id: r.est_count for r in cms_estimates(ev, "user_id").collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits / len(exact) >= 0.9


def test_cms_join_size_empty_side_estimates_zero(spark, duck):
    """ADVICE r11: with one side empty, the inner-product MIN aggregates
    zero rows — the estimate must coalesce to 0 (matching the exact
    companion) so the documented est >= true guarantee holds on the empty
    boundary; both engines pinned."""
    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        cms_join_size,
        cms_join_size_sql,
    )
    from tests.helpers import compare_spark_duckdb

    a = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    b = spark.createDataFrame([], "k long")
    row = cms_join_size(a, "k", b, "k").collect()[0]
    assert (row.est_join_size, row.true_join_size) == (0, 0)
    duck.execute("CREATE OR REPLACE TEMP TABLE cjs_a (k BIGINT)")
    duck.execute("INSERT INTO cjs_a VALUES (1),(2),(2)")
    duck.execute("CREATE OR REPLACE TEMP TABLE cjs_b (k BIGINT)")
    compare_spark_duckdb(
        cms_join_size(a, "k", b, "k"),
        duck,
        cms_join_size_sql("cjs_a", "k", "cjs_b", "k"),
    )
    duck.execute("DROP TABLE cjs_a")
    duck.execute("DROP TABLE cjs_b")


def test_hll_merge_incremental_equals_direct(spark, tmp_path):
    """Sketch mergeability (rollup_ivm discipline, r7 VERDICT #6): persist
    day-1 and day-2 HLL register tables as parquet, merge them, and the
    ESTIMATES equal sketching day1 ∪ day2 directly — bit-exactly, because
    the per-register MAX commutes with the union."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        hll_estimate,
        hll_explicit,
        hll_merge,
        hll_registers,
    )
    from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events")
    cut = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    day1 = ev.filter(F.unix_micros("ts") <= cut)
    day2 = ev.filter(F.unix_micros("ts") > cut)
    p1, p2 = str(tmp_path / "regs1"), str(tmp_path / "regs2")
    hll_registers(day1, "event_type", "user_id").write.parquet(p1)
    hll_registers(day2, "event_type", "user_id").write.parquet(p2)
    merged = hll_estimate(
        hll_merge(spark.read.parquet(p1), spark.read.parquet(p2)), "event_type"
    )
    direct = hll_explicit(day1.unionByName(day2), "event_type", "user_id")
    got = {(r.event_type, r.est_distinct) for r in merged.collect()}
    want = {(r.event_type, r.est_distinct) for r in direct.collect()}
    assert got == want  # bitwise: same registers -> same IEEE expression


def test_cms_merge_incremental_equals_direct(spark, tmp_path):
    """CMS counts add: merge(sketch(day1), sketch(day2)) probes to exactly
    the same estimates as sketch(day1 ∪ day2)."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        cms_estimates,
        cms_merge,
        cms_probe,
        cms_sketch,
    )
    from datapipeline_omnichanneltobigquery_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events")
    cut = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    day1 = ev.filter(F.unix_micros("ts") <= cut)
    day2 = ev.filter(F.unix_micros("ts") > cut)
    p1, p2 = str(tmp_path / "cms1"), str(tmp_path / "cms2")
    cms_sketch(day1, "user_id").write.parquet(p1)
    cms_sketch(day2, "user_id").write.parquet(p2)
    both = day1.unionByName(day2)
    merged = cms_probe(
        cms_merge(spark.read.parquet(p1), spark.read.parquet(p2)),
        both.select("user_id").distinct(),
        "user_id",
    )
    got = {(r.user_id, r.est_count) for r in merged.collect()}
    want = {(r.user_id, r.est_count) for r in cms_estimates(both, "user_id").collect()}
    assert got == want


def test_validate_constraints_counts_violations(spark):
    """Each rule kind counts exactly its violations on a frame seeded with
    known defects; a clean frame passes everything."""
    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        validate_constraints,
    )

    rows = [
        (1, "a", 10, "X"),
        (1, "b", 20, "Y"),      # duplicate pk
        (2, None, 30, "X"),     # null name
        (3, "c", -5, "Z"),      # range + set violations
        (4, "d", 999, "X"),
    ]
    df = spark.createDataFrame(rows, ["pk", "name", "v", "cat"])
    rules = [
        ("pk_unique", "unique", "pk"),
        ("name_not_null", "not_null", "name"),
        ("v_in_range", "range", ("v", 0, 100)),
        ("cat_known", "in_set", ("cat", ["X", "Y"])),
        ("v_even", "expr", "v % 2 = 0"),
    ]
    got = {r.rule: (r.n_violations, r.passed) for r in validate_constraints(df, rules).collect()}
    assert got["pk_unique"] == (1, False)
    assert got["name_not_null"] == (1, False)
    assert got["v_in_range"] == (2, False)   # -5 and 999
    assert got["cat_known"] == (1, False)
    assert got["v_even"] == (2, False)       # -5, 999 odd


def test_isotonic_pava_matches_brute_force_and_applies(spark):
    """PAVA fit must equal the max-min isotonic-regression definition
    (f_j = max_{i<=j} min_{k>=j} weightedmean(y[i..k])), stay monotone,
    and the step-function apply must clamp below/above the fitted range."""
    import random

    from datapipeline_omnichanneltobigquery_spark.operators.calibration import (
        isotonic_apply,
        isotonic_fit,
    )

    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        for _ in range(40):
            s = round(rng.uniform(0, 1), 2)  # duplicate scores occur
            # noisy increasing relationship; group b inverted noise scale
            y = 1 if rng.random() < (0.2 + 0.6 * s if g == "a" else s * s) else 0
            rows.append((g, s, y))
    df = spark.createDataFrame(rows, "grp string, score double, label int")
    curve = isotonic_fit(df, "grp", "score", "label").collect()

    for g in ("a", "b"):
        data = sorted((s, y) for gg, s, y in rows if gg == g)
        # tie-collapse to (score, weight, mean)
        from itertools import groupby

        pts = []
        for s, it in groupby(data, key=lambda t: t[0]):
            ys = [y for _, y in it]
            pts.append((s, len(ys), sum(ys) / len(ys)))

        def wmean(i, k):
            w = sum(p[1] for p in pts[i : k + 1])
            return sum(p[1] * p[2] for p in pts[i : k + 1]) / w

        expect = [
            max(min(wmean(i, k) for k in range(j, len(pts))) for i in range(j + 1))
            for j in range(len(pts))
        ]
        got_iv = sorted(
            (r for r in curve if r.grp == g), key=lambda r: r.score_lo
        )
        # monotone nondecreasing pools
        assert all(
            got_iv[i].p_cal <= got_iv[i + 1].p_cal + 1e-12
            for i in range(len(got_iv) - 1)
        )
        # each point's fitted value equals the definition
        fitted = {}
        for r in got_iv:
            for s, _, _ in pts:
                if r.score_lo <= s <= r.score_hi:
                    fitted[s] = r.p_cal
        for (s, _, _), e in zip(pts, expect):
            assert abs(fitted[s] - e) < 1e-9, (g, s, fitted[s], e)

    # apply: in-range lookup + clamping at both ends
    probe = spark.createDataFrame(
        [("a", -5.0), ("a", 5.0), ("a", 0.5)], "grp string, score double"
    )
    out = {
        r.score: r.p_cal
        for r in isotonic_apply(
            probe, isotonic_fit(df, "grp", "score", "label"), "grp", "score"
        ).collect()
    }
    a_iv = sorted((r for r in curve if r.grp == "a"), key=lambda r: r.score_lo)
    assert out[-5.0] == a_iv[0].p_cal and out[5.0] == a_iv[-1].p_cal
    mid = [r for r in a_iv if r.score_lo <= 0.5][-1]
    assert out[0.5] == mid.p_cal


def test_drift_ks_nullable_values_match_oracle(spark):
    """NULL contract (r8 ADVICE): with NULLs in the value column both
    engines must agree — the Spark decomposition's bucket join would drop
    the NULL group while totals kept it, diverging from the definitional
    global-window oracle; both now filter NULLs before counting."""
    import duckdb
    import pandas as pd

    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        drift_ks,
        drift_ks_sql,
    )
    from tests.helpers import compare_spark_duckdb

    ref = [(float(i % 7),) for i in range(40)] + [(None,)] * 5
    cur = [(float(i % 5),) for i in range(30)] + [(None,)] * 3
    sref = spark.createDataFrame(ref, "value double")
    scur = spark.createDataFrame(cur, "value double")
    con = duckdb.connect()
    con.register("ref_t", pd.DataFrame(ref, columns=["value"]))
    con.register("cur_t", pd.DataFrame(cur, columns=["value"]))
    out = drift_ks(sref, scur, "value", 0.0, 10.0, n_buckets=4)
    compare_spark_duckdb(out, con, drift_ks_sql("ref_t", "cur_t", "value"))
    row = out.collect()[0]
    assert (row.n_ref, row.n_cur) == (40, 30)  # NULLs excluded from totals


def test_isotonic_apply_preserves_rows_and_types(spark):
    """Row identity (r8 ADVICE): a NULL score in a group WITH a curve must
    surface as p_cal = NULL, not vanish; a group with no curve keeps its
    rows; a non-string group column (int version id) round-trips through
    isotonic_fit's applyInPandas schema.  And the apply must not shuffle
    per-row: no Window, no exchange keyed by a synthetic row id."""
    from datapipeline_omnichanneltobigquery_spark.operators.calibration import (
        isotonic_apply,
        isotonic_fit,
    )

    train = spark.createDataFrame(
        [(1, 0.1, 0), (1, 0.5, 1), (1, 0.9, 1)],
        "ver int, score double, label int",
    )
    curve = isotonic_fit(train, "ver", "score", "label")
    assert dict(curve.dtypes)["ver"] == "int"

    probe = spark.createDataFrame(
        [(1, 0.5), (1, None), (2, 0.5), (2, None)], "ver int, score double"
    )
    out = isotonic_apply(probe, curve, "ver", "score")
    rows = {(r.ver, r.score): r.p_cal for r in out.collect()}
    assert len(rows) == 4  # every input row survives
    assert rows[(1, 0.5)] is not None
    assert rows[(1, None)] is None  # NULL score in a fitted group
    assert rows[(2, 0.5)] is None   # no curve for this group
    assert rows[(2, None)] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "monotonically_increasing_id" not in plan


def test_qsketch_degenerate_and_boundary_groups(spark):
    """A single-valued group must report every quantile inside its own
    bin (width-bounded error), and values exactly on bin edges must bin
    identically to the SQL twin's integer arithmetic (no float edges)."""
    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        qsketch_quantiles_direct,
    )

    args = dict(lo=0.0, hi=100.0, n_bins=100)  # bin width 1.0
    rows = [("const", 42.5)] * 50 + [("edge", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, v double")
    qs = [("p50", 1, 2), ("p99", 99, 100)]
    out = {
        (r.grp, r.quantile): r.est_value
        for r in qsketch_quantiles_direct(df, "grp", "v", qs, **args).collect()
    }
    # all mass in bin [42, 43): estimates stay inside it
    assert 42.0 <= out[("const", "p50")] <= 43.0
    assert 42.0 <= out[("const", "p99")] <= 43.0
    # one value per bin: p50 -> 50th of 100 ranked values (bin 49), p99 -> bin 98
    assert 49.0 <= out[("edge", "p50")] <= 50.0
    assert 98.0 <= out[("edge", "p99")] <= 99.0


def test_benford_audit_counts_and_spine(spark):
    """First-digit extraction, <1 exclusion, and the 9-row spine: digits
    with no observations report 0 with a well-defined chi2 term."""
    from datapipeline_omnichanneltobigquery_spark.operators.profile import (
        BENFORD_P,
        benford_audit,
    )

    vals = [1.2, 19.0, 123.4, 2.5, 0.7, 900.0]  # digits 1,1,1,2,excluded,9
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert len(out) == 9
    assert out[1].n_obs == 3 and out[2].n_obs == 1 and out[9].n_obs == 1
    assert all(out[d].n_obs == 0 for d in (3, 4, 5, 6, 7, 8))
    assert abs(out[1].expected_n - 5 * BENFORD_P[0]) < 1e-6
    assert out[3].chi2_term == round(5 * BENFORD_P[2], 6)  # (0-e)^2/e = e


def test_hll_overlap_inclusion_exclusion(spark):
    """hll_overlap: the union estimate comes from per-register max (no
    third pass), inclusion-exclusion lands within HLL tolerance of the
    exact overlap, and the exact companion is exact."""
    import pyspark.sql.functions as F

    from datapipeline_omnichanneltobigquery_spark.operators.profile import hll_overlap

    # A = 0..599, B = 400..999 -> |A|=600 |B|=600 |A∩B|=200 |A∪B|=1000
    rows = [("a", str(i)) for i in range(600)] + [("b", str(i)) for i in range(400, 1000)]
    df = spark.createDataFrame(rows, "grp string, v string")
    r = hll_overlap(df, "grp", F.col("v"), "a", "b").collect()[0]
    assert r.true_overlap == 200
    assert abs(r.est_a - 600) / 600 <= 0.10
    assert abs(r.est_b - 600) / 600 <= 0.10
    assert abs(r.est_union - 1000) / 1000 <= 0.10
    # inclusion-exclusion compounds the three errors; 25% is ~5 sigma here
    assert abs(r.est_overlap - 200) / 200 <= 0.25
    assert r.est_overlap == round(r.est_a + r.est_b - r.est_union, 6)
