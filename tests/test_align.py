"""Alignment semantics (series/seriesslice.go Align, rra_series.go Next).

Slot-by-slot known answers in the style of the reference's
seriesslice_test.go / rra_series grouping behavior.
"""

from __future__ import annotations

from tgres_spark.operators import align as al


def _mk(spark, rows):
    return spark.createDataFrame(rows, "name string, t long, value double")


def test_lcm_step():
    assert al.lcm_step(1200, 1800) == 3600
    assert al.lcm_step(10, 60, 3600) == 3600
    assert al.lcm_step(7, 3) == 21


def test_align_to_nan_skip_average(spark):
    # 60s slots -> 180s: group {60,120,180} has one NULL slot (120),
    # which contributes NOTHING to the average (rra_series.go:104-117
    # skips NaN in sum/cnt), not a zero.
    df = _mk(
        spark,
        [("a", 60, 2.0), ("a", 120, None), ("a", 180, 4.0), ("a", 240, 6.0)],
    )
    out = {r["t"]: r["value"] for r in al.align_to(df, 180).collect()}
    assert out[180] == 3.0  # (2+4)/2, NULL skipped
    assert out[360] == 6.0  # lone slot in its bucket


def test_align_lcm_buckets_end_labeled(spark):
    # mixed steps 120/180 -> LCM 360; end-of-interval labels: the 120s
    # slot at t=360 belongs to bucket (0,360], t=480 to (360,720].
    a = _mk(spark, [("x", 120, 1.0), ("x", 240, 2.0), ("x", 360, 3.0), ("x", 480, 9.0)])
    b = _mk(spark, [("y", 180, 10.0), ("y", 360, 20.0)])
    out = al.align_lcm([(a, 120), (b, 180)]).collect()
    got = {(r["name"], r["t"]): r["value"] for r in out}
    assert got[("x", 360)] == 2.0  # avg(1,2,3)
    assert got[("x", 720)] == 9.0
    assert got[("y", 360)] == 15.0  # avg(10,20)


def test_maxpoints_partial_tail_dropped(spark):
    # 10 dense 60s slots, maxPoints=3 over (0,600] -> groupBy=200s,
    # moves=round(200/60)=3 -> 3 full groups of 3, the 1-slot tail is
    # DISCARDED (Next() returns false when advance fails mid-group).
    rows = [("s", 60 * (i + 1), float(i + 1)) for i in range(10)]
    out = al.maxpoints_group(_mk(spark, rows), 0, 600, 3, 60).collect()
    got = {r["t"]: r["value"] for r in sorted(out, key=lambda r: r["t"])}
    assert got == {180: 2.0, 360: 5.0, 540: 8.0}  # t = last slot in group


def test_maxpoints_dense_grid_fills_missing_slots(spark):
    # A missing slot (no row at t=120) is a NaN slot in the RRA walk:
    # still occupies a position (the grid densifies), contributes
    # nothing to the average.
    rows = [("s", 60, 3.0), ("s", 180, 9.0), ("s", 240, 5.0)]
    out = al.maxpoints_group(_mk(spark, rows), 0, 240, 2, 60).collect()
    got = {r["t"]: r["value"] for r in out}
    # groupBy=120 -> moves=2: group1={60,120missing}->3.0, group2={180,240}->7.0
    assert got == {120: 3.0, 240: 7.0}


def test_maxpoints_moves_leq_one_is_range_filter(spark):
    rows = [("s", 60, 1.0), ("s", 120, 2.0), ("s", 180, 3.0)]
    out = al.maxpoints_group(_mk(spark, rows), 60, 180, 100, 60).collect()
    assert {r["t"] for r in out} == {120, 180}  # t > from, t <= to


def test_seasonal_decompose_linear_series(spark):
    """On a pure linear hourly series: interior trend equals the
    value (a centered average of a linear ramp is its midpoint),
    seasonal/resid vanish, edges (first/last 12 slots) have no trend,
    and value == trend + seasonal + resid holds identically."""
    from tgres_spark.operators.align import seasonal_decompose

    t0 = 1704067200
    rows = [("m", t0 + i * 3600, 10.0 + 2.0 * i) for i in range(72)]
    sf = spark.createDataFrame(rows, "name string, t long, value double")
    out = sorted(seasonal_decompose(sf, step=3600, period=24).collect(),
                 key=lambda r: r["t"])
    assert len(out) == 72
    for i, r in enumerate(out):
        if i < 12 or i >= 72 - 12:
            assert r["trend"] is None and r["resid"] is None
        else:
            assert abs(r["trend"] - r["value"]) < 1e-6
            assert abs(r["resid"]) < 1e-5
        if r["trend"] is not None:
            assert abs(r["value"] - (r["trend"] + r["seasonal"] + r["resid"])) < 1e-12


def test_series_correlate_signs_and_ranking(spark):
    """A scaled copy correlates at ~+1, an inverted copy at ~-1, a
    constant series is excluded (zero variance), and the query series
    itself never appears."""
    from tgres_spark.operators.align import series_correlate

    t0 = 1704067200
    rows = []
    for i in range(48):
        t = t0 + i * 3600
        v = float((i * 7) % 13)
        rows += [("q", t, v), ("scaled", t, 3.0 * v + 5.0),
                 ("inv", t, -2.0 * v + 1.0), ("flat", t, 4.0)]
    sf = spark.createDataFrame(rows, "name string, t long, value double")
    out = {r["name"]: r["corr"] for r in
           series_correlate(sf, "q", step=3600, k=10).collect()}
    assert set(out) == {"scaled", "inv"}  # flat filtered, q excluded
    assert abs(out["scaled"] - 1.0) < 1e-9
    assert abs(out["inv"] + 1.0) < 1e-9


def test_series_xcorr_recovers_planted_lag(spark):
    """A series that is the query shifted 2 steps into the future is
    found at best_lag = +2 with corr ~ 1 (it LEADS the query); the
    reversed shift lands at -2."""
    from tgres_spark.operators.align import series_xcorr

    t0 = 1704067200
    rows = []
    vals = [float((i * 7) % 13) for i in range(60)]
    for i in range(60):
        t = t0 + i * 3600
        rows.append(("q", t, vals[i]))
        # "leads": its value at t equals q's value at t+2 steps
        if i >= 2:
            rows.append(("leader", t0 + (i - 2) * 3600, vals[i]))
        if i + 2 < 60:
            rows.append(("lagger", t0 + (i + 2) * 3600, vals[i]))
    sf = spark.createDataFrame(rows, "name string, t long, value double")
    out = {r["name"]: r for r in
           series_xcorr(sf, "q", step=3600, max_lag=3).collect()}
    assert out["leader"]["best_lag"] == 2
    assert abs(out["leader"]["corr"] - 1.0) < 1e-9
    assert out["lagger"]["best_lag"] == -2
    assert abs(out["lagger"]["corr"] - 1.0) < 1e-9


def test_series_cusum_matches_sequential_recursion(spark):
    """The prefix-min closed form must equal the textbook sequential
    s_t = max(0, s_{t-1} + (x_t - mu - k)) recursion, and a planted
    level shift must raise a persistent alarm."""
    from tgres_spark.operators.align import series_cusum

    t0 = 1704067200
    series = {
        # level shift at i=30; first term negative
        "m": [10.0] * 30 + [13.0] * 18,
        # starts ABOVE mu+k: every prefix sum is positive, so the
        # min must include the empty prefix P_0=0 (without it s_1 is
        # clamped to 0 and every s_t is under-reported — the round-5
        # closed-form bug)
        "hi": [30.0] + [10.0] * 20 + [14.0] * 6,
    }
    rows = [(n, t0 + i * 3600, v)
            for n, vals in series.items() for i, v in enumerate(vals)]
    sf = spark.createDataFrame(rows, "name string, t long, value double")
    res = series_cusum(sf, step=3600, drift_k=0.5).collect()
    for name, vals in series.items():
        out = sorted((r for r in res if r["name"] == name),
                     key=lambda r: r["t"])
        mu = sum(vals) / len(vals)
        s, want = 0.0, []
        for v in vals:
            # mirror micro6 quantization of the per-point term
            q = __import__("math").floor((v - mu - 0.5) * 1e6 + 0.5)
            s = max(0.0, s + q)
            want.append(s / 1e6)
        got = [r["cusum"] for r in out]
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, want)), name
    m = sorted((r for r in res if r["name"] == "m"), key=lambda r: r["t"])
    assert m[-1]["alarm"] == 1 and m[0]["alarm"] == 0
    # the high-start series' very first point must carry its positive
    # excursion, not a clamped zero
    hi = sorted((r for r in res if r["name"] == "hi"), key=lambda r: r["t"])
    assert hi[0]["cusum"] > 0


def test_series_trend_slope_recovers_planted_slopes(spark):
    """Exact linear series recover their slopes (per step) exactly up
    to micro6 quantization, ranked fastest first; a flat series gets
    slope 0, a denominator-zero single-point series is excluded."""
    from tgres_spark.operators.align import series_trend_slope

    t0 = 1704067200
    rows = []
    for i in range(48):
        t = t0 + i * 3600
        rows += [("up2", t, 5.0 + 2.0 * i), ("up1", t, 100.0 + 1.0 * i),
                 ("down", t, 50.0 - 0.5 * i), ("flat", t, 7.0)]
    rows.append(("single", t0, 3.0))
    sf = spark.createDataFrame(rows, "name string, t long, value double")
    out = series_trend_slope(sf, step=3600, k=10).collect()
    assert [r["name"] for r in out] == ["up2", "up1", "flat", "down"]
    got = {r["name"]: r["slope"] for r in out}
    assert abs(got["up2"] - 2.0) < 1e-9
    assert abs(got["up1"] - 1.0) < 1e-9
    assert got["flat"] == 0.0
    assert abs(got["down"] + 0.5) < 1e-9
