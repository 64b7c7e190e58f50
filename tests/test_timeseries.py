"""Semantics tests for time-series resampling (operators/timeseries.py)
beyond oracle parity."""

from __future__ import annotations

import datetime as dt

from datapipeline_omnichanneltobigquery_spark.operators.timeseries import resample_ffill


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_resample_fills_gaps_forward(spark):
    """Obs at 00:30 and 03:30; hourly samples 01:00-03:00 — the gap hours
    carry the last value forward."""
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:30:00"), 10.0), (1, _ts("2024-01-01 03:30:00"), 99.0)],
        ["uid", "ts", "v"],
    )
    rows = sorted(
        (r.sample_ts, r.value) for r in resample_ffill(df, "uid", "ts", "v", 3600).collect()
    )
    assert rows == [
        (_ts("2024-01-01 01:00:00"), 10.0),
        (_ts("2024-01-01 02:00:00"), 10.0),
        (_ts("2024-01-01 03:00:00"), 10.0),
    ]


def test_resample_grid_bounds_are_ceil_floor(spark):
    """Grid = ceil(min) .. floor(max): an obs exactly on a boundary is its
    own first sample; a single mid-bucket obs yields an empty grid."""
    on_boundary = spark.createDataFrame(
        [(1, _ts("2024-01-01 02:00:00"), 5.0), (1, _ts("2024-01-01 04:00:00"), 7.0)],
        ["uid", "ts", "v"],
    )
    rows = sorted(
        (r.sample_ts, r.value)
        for r in resample_ffill(on_boundary, "uid", "ts", "v", 3600).collect()
    )
    assert rows[0] == (_ts("2024-01-01 02:00:00"), 5.0)  # boundary obs sampled
    assert rows[-1] == (_ts("2024-01-01 04:00:00"), 7.0)

    lone = spark.createDataFrame([(1, _ts("2024-01-01 02:30:00"), 5.0)], ["uid", "ts", "v"])
    assert resample_ffill(lone, "uid", "ts", "v", 3600).count() == 0


def test_resample_same_tick_collapses_to_max(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 01:00:00"), 3.0),
            (1, _ts("2024-01-01 01:00:00"), 8.0),
            (1, _ts("2024-01-01 02:00:00"), 1.0),
        ],
        ["uid", "ts", "v"],
    )
    rows = sorted(
        (r.sample_ts, r.value) for r in resample_ffill(df, "uid", "ts", "v", 3600).collect()
    )
    assert rows[0] == (_ts("2024-01-01 01:00:00"), 8.0)


def test_resample_keys_are_independent(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 1.0),
            (1, _ts("2024-01-01 02:00:00"), 2.0),
            (2, _ts("2024-01-01 00:00:00"), 100.0),
            (2, _ts("2024-01-01 01:00:00"), 200.0),
        ],
        ["uid", "ts", "v"],
    )
    out = resample_ffill(df, "uid", "ts", "v", 3600)
    by_uid = {}
    for r in out.collect():
        by_uid.setdefault(r.uid, []).append((r.sample_ts, r.value))
    assert sorted(by_uid[1]) == [
        (_ts("2024-01-01 00:00:00"), 1.0),
        (_ts("2024-01-01 01:00:00"), 1.0),  # uid 2's 200.0 must not leak in
        (_ts("2024-01-01 02:00:00"), 2.0),
    ]
    assert sorted(by_uid[2]) == [
        (_ts("2024-01-01 00:00:00"), 100.0),
        (_ts("2024-01-01 01:00:00"), 200.0),
    ]


def test_interp_midpoint_and_boundary(spark):
    """Linear interpolation hits the exact midpoint between bracketing
    observations; a boundary-coincident obs (including the FINAL one, whose
    backward window is empty) yields its own value."""
    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import resample_interp

    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 01:00:00"), 10.0),  # on-boundary
            (1, _ts("2024-01-01 01:30:00"), 20.0),
            (1, _ts("2024-01-01 02:30:00"), 40.0),
            (1, _ts("2024-01-01 04:00:00"), 70.0),  # FINAL obs on-boundary
        ],
        ["uid", "ts", "v"],
    )
    rows = dict(
        (r.sample_ts, r.value)
        for r in resample_interp(df, "uid", "ts", "v", 3600).collect()
    )
    assert rows[_ts("2024-01-01 01:00:00")] == 10.0
    assert rows[_ts("2024-01-01 02:00:00")] == 30.0  # midpoint of 20@1:30, 40@2:30
    assert rows[_ts("2024-01-01 03:00:00")] == 50.0  # 40 + (70-40)*(30/90)
    assert rows[_ts("2024-01-01 04:00:00")] == 70.0  # empty backward frame


def test_interp_windows_share_one_sort(spark):
    """The forward and backward bracketing windows must ride ONE sort (same
    partitioning and ordering) — a second sort would double the dominant
    cost of the fill stage."""
    import re

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import resample_interp

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:00:00"), 1.0), (1, _ts("2024-01-01 03:00:00"), 2.0)],
        ["uid", "ts", "v"],
    )
    plan = resample_interp(df, "uid", "ts", "v", 3600)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bSort ", plan)) == 1


def test_resample_grid_guard_raises_diagnosably(spark):
    """One key spanning far more grid points than max_points_per_key must
    fail with an error naming the key and the point count — not OOM a task
    materializing a giant sequence() array."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [
            (7, _ts("2020-01-01 00:00:00"), 1.0),
            (7, _ts("2024-01-01 00:00:00"), 2.0),  # 4 years at 1 s step
        ],
        ["uid", "ts", "v"],
    )
    with pytest.raises(Exception, match=r"key 7 spans .*max_points_per_key=1000"):
        resample_ffill(df, "uid", "ts", "v", 1, max_points_per_key=1000).collect()
    # and the same span is fine when the cap allows it
    n = resample_ffill(
        df, "uid", "ts", "v", 86400 * 30, max_points_per_key=1000
    ).count()
    assert n > 0


def test_ewma_smooth_known_series(spark):
    """EWMA with dyadic weights on a known series: exact rational results
    at the boundary (normalizer adapts to available history) and in steady
    state; constant series is a fixed point."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import ewma_smooth

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, "a", t0 + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate([4.0, 8.0, 16.0])
    ] + [(10 + i, "c", t0 + dt.timedelta(minutes=i), 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    got = {
        r.uid: r.ewma
        for r in ewma_smooth(df, "user_id", "ts", "value", "event_id", n_taps=4).collect()
    }
    assert got[0] == 4.0                      # lone first point
    assert got[1] == (8.0 + 0.5 * 4.0) / 1.5  # two points, renormalized
    assert got[2] == (16.0 + 0.5 * 8.0 + 0.25 * 4.0) / 1.75
    for i in range(5):
        assert got[10 + i] == 7.0             # constant series fixed point


def test_ohlc_bars_picks_endpoints_deterministically(spark):
    """OHLC: open/close come from the (ts, unique) total order — including
    a tie on ts where the smaller event_id is the open — high/low are
    value extremes, totals are DECIMAL-exact."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import ohlc_bars

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (2, "a", t0, 5.0),                                   # ts tie: id 1 wins open
        (1, "a", t0, 3.0),
        (3, "a", t0 + dt.timedelta(minutes=10), 9.5),        # high
        (4, "a", t0 + dt.timedelta(minutes=20), 0.5),        # low
        (5, "a", t0 + dt.timedelta(minutes=30), 7.0),        # close
        (6, "a", t0 + dt.timedelta(hours=2), 4.0),           # separate bar
        (7, "b", t0, 1.0),                                   # separate key
    ]
    df = spark.createDataFrame(rows, "event_id long, key string, ts timestamp, v double")
    out = {
        (r.key, r.win_start): r
        for r in ohlc_bars(df, "key", "ts", "v", "event_id", 3600).collect()
    }
    bar = out[("a", int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000)]
    assert (bar.open, bar.high, bar.low, bar.close) == (3.0, 9.5, 0.5, 7.0)
    assert bar.n_events == 5 and bar.total_value == 25.0
    assert len(out) == 3


def test_cusum_matches_sequential_reference(spark):
    """The windowed closed form (prefix sum minus running extremum) equals
    the classic sequential CUSUM recurrences on a series with a known
    level shift — both sides flag, in the right halves."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import (
        cusum_changepoints,
    )

    t0 = dt.datetime(2024, 3, 1)
    vals = [10.0] * 10 + [20.0] * 10
    rows = [
        (i, "a", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "event_id long, key string, ts timestamp, v double")
    out = {
        r.event_id: r
        for r in cusum_changepoints(
            df, "key", "ts", "v", "event_id", slack=2.0, threshold=20.0
        ).collect()
    }
    # sequential reference in the same integer micro-unit space
    n = len(vals)
    xm = [int(v * 1_000_000) for v in vals]
    s_total = sum(xm)
    k = 2_000_000
    sp = sn = 0
    for i in range(n):
        centered = n * xm[i] - s_total  # n-scaled (x - mu)
        sp = max(0, sp + centered - n * k)
        sn = min(0, sn + centered + n * k)
        r = out[i]
        assert r.cusum_pos == round(sp / n / 1e6, 6), i
        assert r.cusum_neg == round(sn / n / 1e6, 6), i
        assert r.is_change == (sp > n * 20_000_000 or sn < -n * 20_000_000), i
    # the shift is detected: flags exist and only after the level change
    # (the negative side accumulates during the LOW half)
    flagged = [i for i in range(n) if out[i].is_change]
    assert flagged and min(flagged) >= 5


def test_burstiness_separates_periodic_from_bursty(spark):
    """A perfectly periodic arrival process scores B < 0 (→ -1 with n);
    a heavy-burst process scores B > 0; a 2-event key has 1 gap and NULL
    B (undefined sigma regime guarded)."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import burstiness

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    rows += [(i, 1, t0 + dt.timedelta(seconds=60 * i)) for i in range(30)]  # periodic
    burst_offsets = [0, 1, 2, 3, 4, 3600, 3601, 3602, 3603, 7200]          # bursty
    rows += [(100 + i, 2, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(burst_offsets)]
    rows += [(200, 3, t0), (201, 3, t0 + dt.timedelta(seconds=5))]         # 1 gap
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.user_id: r for r in burstiness(df, "user_id", "ts", "event_id").collect()}
    assert out[1].burstiness == -1.0          # zero variance, exactly -mu/+mu
    assert out[2].burstiness > 0.3            # bursts dominate
    assert out[3].burstiness is None and out[3].n_gaps == 1
    assert out[1].mean_gap_sec == 60.0


def test_twap_weighs_held_durations(spark):
    """TWAP: a value held 3/4 of the hour dominates; plain AVG would say
    the midpoint.  Last observation holds to the window end."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import twap_bars

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, "a", t0, 100.0),                               # held 45 min
        (2, "a", t0 + dt.timedelta(minutes=45), 200.0),    # held 15 min
    ]
    df = spark.createDataFrame(rows, "event_id long, key string, ts timestamp, v double")
    out = twap_bars(df, "key", "ts", "v", "event_id", 3600).collect()
    assert len(out) == 1
    r = out[0]
    # (100*45 + 200*15) / 60 = 125 — vs the naive AVG 150
    assert r.twap == 125.0 and r.n_events == 2


def test_km_survival_hand_computed_with_censoring(spark):
    """km_survival ≡ the textbook product-limit estimate on a hand-worked
    table with interleaved censoring, a censor-only time (curve carries
    forward), and a terminal d = n time (curve hits exactly 0)."""
    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import km_survival

    # t=1: n=10, d=2           -> S=0.8
    # t=2: n=8,  c=2 (only)    -> S carries at 0.8
    # t=3: n=6,  d=3, c=1      -> S=0.8*(3/6)=0.4
    # t=5: n=2,  d=2 (=n)      -> S=0.0 exactly
    rows = (
        [(1, True)] * 2
        + [(2, False)] * 2
        + [(3, True)] * 3
        + [(3, False)]
        + [(5, True)] * 2
    )
    df = spark.createDataFrame(rows, "duration long, observed boolean")
    out = {r.duration: r for r in km_survival(df, "duration", "observed").collect()}
    assert (out[1].n_at_risk, out[1].n_events, out[1].n_censored) == (10, 2, 0)
    assert abs(out[1].survival - 0.8) < 1e-6
    assert (out[2].n_events, out[2].n_censored) == (0, 2)
    assert abs(out[2].survival - 0.8) < 1e-6  # censor-only: carries forward
    assert out[3].n_at_risk == 6
    assert abs(out[3].survival - 0.4) < 1e-6
    assert out[5].n_at_risk == 2 and out[5].survival == 0.0  # d = n -> exact 0


def test_theilsen_mk_matches_bruteforce(spark):
    """theilsen_mk equals a literal python re-derivation on a series with
    an outlier, ties, and an even pair count — median of pairwise slopes,
    S, tie-corrected 18·Var, z — and a constant series reports NULL z."""
    import math

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import theilsen_mk

    series = {
        "up": [(0, 10), (1, 20), (2, 20), (3, 500), (4, 40)],  # outlier at t=3, tie 20
        "flat": [(0, 7), (1, 7), (2, 7)],                       # Var = 0 -> NULL z
    }
    df = spark.createDataFrame(
        [(g, t, y) for g, pts in series.items() for t, y in pts],
        "grp string, t long, y long",
    )
    got = {r.grp: r for r in theilsen_mk(df, "grp", "t", "y").collect()}
    for g, pts in series.items():
        slopes, s = [], 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (ti, yi), (tj, yj) = pts[i], pts[j]
                slopes.append((yj - yi) / (tj - ti))
                s += (yj > yi) - (yj < yi)
        slopes.sort()
        m = len(slopes)
        med = (slopes[(m + 1) // 2 - 1] + slopes[m // 2]) / 2.0
        n = len(pts)
        from collections import Counter

        tie18 = sum(c * (c - 1) * (2 * c + 5) for c in Counter(y for _, y in pts).values())
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        r = got[g]
        assert (r.n_points, r.s_stat, r.var18) == (n, s, var18)
        assert abs(r.slope_ts - med) < 1e-6
        if var18 > 0:
            zz = (s - 1 if s > 0 else s + 1 if s < 0 else 0) / math.sqrt(var18 / 18.0)
            assert abs(r.z_mk - zz) < 1e-6
        else:
            assert r.z_mk is None


def test_snaive_eval_hand_case(spark):
    """30-point series with period-7 structure + noise: MASE/WAPE match a
    python re-derivation; a perfectly seasonal series reports NULL MASE
    (zero train error) but a real WAPE; horizon > season raises."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import snaive_eval

    noisy = [(t, 100 + (t % 7) * 10 + (3 if t % 5 == 0 else 0)) for t in range(30)]
    perfect = [(t, 50 + (t % 7)) for t in range(20)]
    df = spark.createDataFrame(
        [("noisy", t, y) for t, y in noisy] + [("perfect", t, y) for t, y in perfect],
        "grp string, t long, y long",
    )
    got = {r.grp: r for r in snaive_eval(df, "grp", "t", "y").collect()}

    for name, pts in (("noisy", noisy), ("perfect", perfect)):
        d = dict(pts)
        tmax = max(d)
        terms = [(t, abs(y - d[t - 7])) for t, y in pts if t - 7 in d]
        tr = [(t, e) for t, e in terms if t <= tmax - 7]
        te = [(t, e) for t, e in terms if t > tmax - 7]
        r = got[name]
        assert (r.n_train, r.n_test) == (len(tr), len(te))
        sae_te, sae_tr = sum(e for _, e in te), sum(e for _, e in tr)
        assert r.sae_test == sae_te
        if sae_tr > 0:
            assert abs(r.mase - (sae_te * len(tr)) / (len(te) * sae_tr)) < 1e-6
        else:
            assert r.mase is None
        say = sum(abs(d[t]) for t, _ in te)
        assert abs(r.wape - sae_te / say) < 1e-6 if say else r.wape is None

    with pytest.raises(ValueError):
        snaive_eval(df, "grp", "t", "y", season=7, horizon=8)


def test_holt_eval_matches_recursion_and_guards(spark):
    """holt_eval's compile-time weight vectors reproduce the literal Holt
    recursion run in python (the linearity claim, end to end through the
    micro-unit error sums); a perfectly linear series gives near-zero
    Holt error and beats seasonal-naive; a gappy series raises."""
    import math

    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import holt_eval

    a, b = 0.3, 0.1
    series = {
        "lin": [100 + 5 * t for t in range(30)],
        "noisy": [200 + 3 * t + ((t * 7) % 11 - 5) for t in range(30)],
    }
    df = spark.createDataFrame(
        [(g, t, y) for g, ys in series.items() for t, y in enumerate(ys)],
        "grp string, t long, y long",
    )
    got = {r.grp: r for r in holt_eval(df, "grp", "t", "y").collect()}

    for g, ys in series.items():
        train, test = ys[:23], ys[23:]
        l, bb = float(train[0]), float(train[1] - train[0])
        for t in range(1, 23):
            l_new = a * train[t] + (1 - a) * (l + bb)
            bb = b * (l_new - l) + (1 - b) * bb
            l = l_new
        # the engine uses half-up micro weights, so compare via the same
        # quantized dot products
        from datapipeline_omnichanneltobigquery_spark.operators.timeseries import (
            _holt_weights,
        )

        w = _holt_weights(23, 3000, 1000)
        lu = sum(train[t - 1] * wl for t, wl, _ in w)
        bu = sum(train[t - 1] * wb for t, _, wb in w)
        assert abs(lu / 1e6 - l) < 1e-3 and abs(bu / 1e6 - bb) < 1e-3  # linearity
        eh = sum(abs(y * 1_000_000 - (lu + h * bu)) for h, y in enumerate(test, 1))
        en = sum(abs(test[h - 1] - ys[15 + h]) * 1_000_000 for h in range(1, 8))
        r = got[g]
        assert (r.err_holt_micro, r.err_naive_micro) == (eh, en)
        if en > 0:
            assert abs(r.rel_mae - eh / en) < 1e-6
    assert got["lin"].holt_better  # a trend model must beat lag-7 on a line

    gappy = spark.createDataFrame(
        [("g", t, 1) for t in range(29)] + [("g", 40, 1)], "grp string, t long, y long"
    )
    with pytest.raises(Exception, match="dense"):
        holt_eval(gappy, "grp", "t", "y").collect()

    # loud-guard discipline (r12 ADVICE): train_days < 2 would hit the
    # trd[1] seed out of range; bps outside [0,10000] is a unit mistake.
    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import holt_eval_sql

    tiny = spark.createDataFrame([("g", 0, 1)], "grp string, t long, y long")
    with pytest.raises(ValueError, match="train_days must be >= 2"):
        holt_eval(tiny, "grp", "t", "y", train_days=1)
    with pytest.raises(ValueError, match="train_days must be >= 2"):
        holt_eval_sql("SELECT 1", "grp", "t", "y", train_days=0)
    with pytest.raises(ValueError, match="alpha_bps"):
        holt_eval(tiny, "grp", "t", "y", alpha_bps=10001)
    with pytest.raises(ValueError, match="beta_bps"):
        holt_eval_sql("SELECT 1", "grp", "t", "y", beta_bps=-1)


def test_lateness_audit_hand_case(spark):
    """Hand-checked lateness semantics (operators/lateness.py): first
    arrival per key never late; strict inequality at exactly the delay;
    lag measured against the PREFIX max (not the global max); window
    drops fire only when the window END has passed the watermark."""
    import datetime as dt

    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.lateness import (
        late_window_drops,
        lateness_audit,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    # key A arrivals (arrival, event_time_s):
    #  a1 -> 1000 (first: never late)
    #  a2 -> 880  (lag vs wm=1000-120=880: 0, NOT late — strict)
    #  a3 -> 879  (late by 1 s)
    #  a4 -> 2000 (advances the max)
    #  a5 -> 100  (late by 2000-120-100 = 1780 s)
    rows = [
        ("A", "a1", at(1000)), ("A", "a2", at(880)), ("A", "a3", at(879)),
        ("A", "a4", at(2000)), ("A", "a5", at(100)),
        ("B", "b1", at(50)),  # singleton key: n_late 0
    ]
    df = spark.createDataFrame(rows, "k string, arrival string, ts timestamp")
    got = {r.k: r for r in lateness_audit(df, "k", "arrival", "ts", 120).collect()}
    assert (got["A"].n_rows, got["A"].n_late) == (5, 2)
    assert got["A"].max_lag_us == 1780 * 1_000_000
    assert abs(got["A"].late_share - round(2 / 5, 6)) < 1e-9
    assert (got["B"].n_rows, got["B"].n_late, got["B"].max_lag_us) == (1, 0, 0)

    # window drops (600 s windows): a5 (t=100, window [0,600) ends 600)
    # vs wm at arrival 2000-120=1880 -> dropped; a3 (t=879, window ends
    # 1200) vs wm 880 -> kept (1200 > 880) even though the ROW is late.
    drops = {
        (r.k, r.window_start_us): (r.n_rows, r.n_dropped)
        for r in late_window_drops(df, "k", "arrival", "ts", 120, 600).collect()
    }
    base = 1704067200 * 1_000_000  # 2024-01-01T00:00:00Z epoch micros
    s = 1_000_000
    assert drops[("A", base + 0)] == (1, 1)        # a5: closed window, dropped
    assert drops[("A", base + 600 * s)] == (3, 0)  # a1-a3: late row a3 still KEPT
    assert drops[("A", base + 1800 * s)] == (1, 0)
    assert drops[("B", base + 0)] == (1, 0)
    assert len(drops) == 4
    with pytest.raises(ValueError, match="delay_seconds"):
        lateness_audit(df, "k", "arrival", "ts", -1)
    with pytest.raises(ValueError, match="window_seconds"):
        late_window_drops(df, "k", "arrival", "ts", 120, 0)


def test_late_window_drops_pre_epoch_floor(spark):
    """r13 review regression: window starts use TRUE floor, not
    truncate-toward-zero — a pre-1970 event time lands in ITS OWN
    window [-3600, 0), not in [0, 3600); and its drop test compares
    against the real window end."""
    import datetime as dt

    from datapipeline_omnichanneltobigquery_spark.operators.lateness import (
        late_window_drops,
    )

    rows = [
        ("A", "a1", dt.datetime(1970, 1, 1, 2, 0, 0)),    # advances max to +2h
        ("A", "a2", dt.datetime(1969, 12, 31, 23, 59, 0)),  # m = -60e6 us
    ]
    df = spark.createDataFrame(rows, "k string, arrival string, ts timestamp")
    drops = {
        r.window_start_us: (r.n_rows, r.n_dropped)
        for r in late_window_drops(df, "k", "arrival", "ts", 120, 3600).collect()
    }
    # the 1969 row's window is [-3600s, 0) and it IS dropped (end 0 <=
    # wm = 7200-120 s); truncation toward zero would misfile it at 0
    assert drops[-3600 * 1_000_000] == (1, 1)
    assert drops[7200 * 1_000_000] == (1, 0)
    assert len(drops) == 2


def test_lateness_sql_twins_guard_like_dataframe_faces(spark):
    """r13 review regression: the SQL builders validate like their
    DataFrame twins (the holt_eval_sql loud-guard discipline)."""
    import pytest

    from datapipeline_omnichanneltobigquery_spark.operators.lateness import (
        late_window_drops_sql,
        lateness_audit_sql,
    )

    with pytest.raises(ValueError, match="delay_seconds"):
        lateness_audit_sql("events", "k", "a", "ts", -1)
    with pytest.raises(ValueError, match="window_seconds"):
        late_window_drops_sql("events", "k", "a", "ts", 120, 0)


def test_streaming_lateness_null_ts_matches_batch(spark):
    """r13 review regression: a NULL event time must not crash the
    streaming auditor — like the batch face it scores lag 0, counts in
    n_rows, and never advances the running max (MAX/GREATEST skip
    NULLs in both engines)."""
    import datetime as dt

    import pandas as pd

    from datapipeline_omnichanneltobigquery_spark.operators.lateness import (
        lateness_audit,
    )
    from datapipeline_omnichanneltobigquery_spark.streaming.lateness import _auditor

    class _FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists, self._v = True, v

    t0 = dt.datetime(2024, 1, 1)
    us = 1_000_000

    def m(s):
        return int((t0 + dt.timedelta(seconds=s)).timestamp()) * us

    # arrival order: t=1000, NULL, t=100 (late by 1000-120-100=780 s)
    pdf = pd.DataFrame(
        {"arrival": ["a1", "a2", "a3"], "m": pd.array([m(1000), None, m(100)], dtype="Int64")}
    )
    st = _FakeState()
    out = list(_auditor(120 * us)(("A",), iter([pdf]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.n_rows, row.n_late, row.max_lag_us) == (3, 1, 780 * us)
    assert st.get == (1, m(1000))  # NULL never advanced the max

    # and the batch face agrees on the same rows
    rows = [("A", "a1", t0 + dt.timedelta(seconds=1000)),
            ("A", "a2", None),
            ("A", "a3", t0 + dt.timedelta(seconds=100))]
    df = spark.createDataFrame(rows, "k string, arrival string, ts timestamp")
    b = lateness_audit(df, "k", "arrival", "ts", 120).collect()[0]
    assert (b.n_rows, b.n_late, b.max_lag_us) == (3, 1, 780 * us)

    # all-null batch: state never materializes, emitted lags all 0
    st2 = _FakeState()
    pdf2 = pd.DataFrame({"arrival": ["x"], "m": pd.array([None], dtype="Int64")})
    out2 = list(_auditor(120 * us)(("B",), iter([pdf2]), st2))
    assert out2[0].iloc[0].n_late == 0 and not st2.exists


def test_acf_counts_matches_numpy_free_bruteforce(spark):
    """acf_counts equals the textbook r_k on a hand series (zeros filled
    for missing buckets); a constant series surfaces NULL r; lags past
    n-1 emit no rows."""
    from datetime import datetime, timezone

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import (
        acf_counts,
    )

    # key 'a': counts per hour h0..h5 = [2, 1, 0, 3, 1, 2] (h2 missing ->
    # zero-filled); key 'flat': constant 1 per hour -> zero variance
    def ts(h):
        return datetime(2024, 1, 1, h, 30, tzinfo=timezone.utc)

    rows = [("a", ts(0))] * 2 + [("a", ts(1))] + [("a", ts(3))] * 3 + [
        ("a", ts(4))
    ] + [("a", ts(5))] * 2
    rows += [("flat", ts(h)) for h in range(4)]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {(r.k, r.lag): r for r in acf_counts(df, "k", "ts", max_lag=3).collect()}

    x = [2, 1, 0, 3, 1, 2]
    n = len(x)
    mean = sum(x) / n
    den = sum((v - mean) ** 2 for v in x)
    for k in (1, 2, 3):
        num = sum((x[t] - mean) * (x[t + k] - mean) for t in range(n - k))
        r = got[("a", k)]
        assert r.n == 6
        assert abs(r.r - round(num / den, 6)) < 1e-9, (k, r.r, num / den)
    assert got[("flat", 1)].r is None  # zero variance: undefined, surfaced
    assert ("a", 6) not in got  # no pairs past n-1


def test_acf_counts_omits_all_null_ts_key(spark):
    """r14 review regression: a key whose timestamps are all NULL is
    OMITTED (NULL bounds filtered, matching the SQL twin's empty
    generate_series) instead of crashing the job with a misleading
    grid-size error."""
    from datetime import datetime, timezone

    from datapipeline_omnichanneltobigquery_spark.operators.timeseries import (
        acf_counts,
    )

    rows = [
        ("ok", datetime(2024, 1, 1, 0, tzinfo=timezone.utc)),
        ("ok", datetime(2024, 1, 1, 1, tzinfo=timezone.utc)),
        ("ok", datetime(2024, 1, 1, 2, tzinfo=timezone.utc)),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = acf_counts(df, "k", "ts", max_lag=2).collect()
    assert {r.k for r in got} == {"ok"}
