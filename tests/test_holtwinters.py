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
