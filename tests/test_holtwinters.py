"""Holt-Winters semantics on synthetic seasonal data
(series/holtwinters.go behavior)."""

from __future__ import annotations

import math

import numpy as np

from tgres_spark.operators.holtwinters import (
    holt_winters_confidence_bands,
    holt_winters_forecast,
    hw_fit,
    hw_initial_seasonal,
    hw_initial_trend,
    hw_smooth,
)


def _seasonal_data(n_seasons=6, slen=12, base=100.0, amp=20.0, slope=0.5):
    i = np.arange(n_seasons * slen)
    return base + slope * i + amp * np.sin(2 * np.pi * i / slen)


def test_initial_trend_matches_nist_definition():
    data = _seasonal_data()
    # pure linear + periodic: season-over-season mean step = slope
    assert math.isclose(hw_initial_trend(data, 12), 0.5, rel_tol=1e-9)


def test_initial_seasonal_factors_average_to_one():
    data = _seasonal_data()
    fac = hw_initial_seasonal(data, 12)
    assert len(fac) == 12
    assert math.isclose(fac.mean(), 1.0, rel_tol=0.05)


def test_smooth_rejects_out_of_range_factors():
    data = _seasonal_data()
    _, _, sse = hw_smooth(data, 12, 0.5, np.ones(12), 0, 1.5, 0.5, 0.5)
    assert sse > 1e18


def test_fit_forecast_tracks_seasonality():
    data = _seasonal_data(n_seasons=8)
    smooth, dev = hw_fit(data, 12, 12)
    assert len(smooth) == len(data) + 12
    # forecast season should stay within sane bounds of the signal
    fc = smooth[len(data):]
    assert fc.min() > data.min() - 50 and fc.max() < data.max() + 50
    # in-sample fit should be reasonably tight
    err = np.abs(smooth[24 : len(data)] - data[24:]).mean()
    assert err < 10.0


def test_spark_forecast_extends_series(spark):
    data = _seasonal_data(n_seasons=6)
    rows = [("s", int(3600 * i), float(v)) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = holt_winters_forecast(df, 12, 12).collect()
    assert len(out) == len(data) + 12
    assert all(r["name"] == "holtWintersForecast(s)" for r in out)
    ts = sorted(r["t"] for r in out)
    assert ts[-1] == 3600 * (len(data) + 11)


def test_spark_bands_bracket_forecast(spark):
    data = _seasonal_data(n_seasons=6)
    rows = [("s", int(3600 * i), float(v)) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = holt_winters_confidence_bands(df, 12, 6, dev_scale=10.0).collect()
    up = {r["t"]: r["value"] for r in out if "Upper" in r["name"]}
    lo = {r["t"]: r["value"] for r in out if "Lower" in r["name"]}
    assert up.keys() == lo.keys()
    assert all(up[t] >= lo[t] for t in up)


def test_nm1_winner_never_worse_than_initial_best():
    """One Nelder-Mead iteration must produce a winner whose exact
    integer SSE is <= the best initial simplex point's (the new
    simplex always retains the previous best), and strictly improves
    on data where the simplex's reflection helps; all winner
    coordinates stay q6-quantized."""
    from tgres_spark.operators.holtwinters import (
        _NM_SIMPLEX,
        _hw_init_state,
        _hw_nm1_winner,
        _hw_sse_int,
        _q6,
    )

    data = _seasonal_data(n_seasons=6, slen=12)
    vals = [_q6(float(v)) for v in data]
    trend0, seasonal0 = _hw_init_state(vals, 12)

    def f(p):
        return _hw_sse_int(vals, 12, trend0, seasonal0, *p)

    f_init_best = min(f(p) for p in _NM_SIMPLEX)
    win = _hw_nm1_winner(vals, 12)
    assert f(win) <= f_init_best
    for c in win:
        assert c == _q6(c)


def test_nm1_spark_forecast_shape(spark):
    """hw_nm1_forecast emits n + n_pred rows per series with the
    family name, like the fixed variant."""
    from tgres_spark.operators.holtwinters import hw_nm1_forecast

    data = _seasonal_data(n_seasons=6)
    rows = [("s", int(3600 * i), float(v)) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "name string, t long, value double")
    out = hw_nm1_forecast(df, 12, 12).collect()
    assert len(out) == len(data) + 12
    assert all(r["name"] == "holtWintersForecast(s)" for r in out)


def test_nm2_composes_and_never_worse_than_nm1():
    """The second Nelder-Mead iteration starts from iteration 1's
    pool simplex, so its winner's exact integer SSE is <= the NM1
    winner's (the pool always retains the running best); coordinates
    stay q6-quantized and candidate pids never collide across
    iterations (14-19 vs 4-9)."""
    from tgres_spark.operators.holtwinters import (
        _hw_init_state,
        _hw_nm_winner,
        _hw_sse_int,
        _q6,
    )

    data = _seasonal_data(n_seasons=6, slen=12)
    vals = [_q6(float(v)) for v in data]
    trend0, seasonal0 = _hw_init_state(vals, 12)

    def f(p):
        return _hw_sse_int(vals, 12, trend0, seasonal0, *p)

    w1 = _hw_nm_winner(vals, 12, 1)
    w2 = _hw_nm_winner(vals, 12, 2)
    assert f(w2) <= f(w1)
    for c in w2:
        assert c == _q6(c)
