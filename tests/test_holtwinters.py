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


def _float_nm_decisions(f, simplex, steps):
    """Branch decisions of the ADAPTIVE optimizer's (nelder_mead's)
    first ``steps`` iterations — the exact float control flow of
    nelder_mead(), instrumented. Also reports whether the tol break
    fired within ``steps``."""
    s = [np.asarray(p, dtype=float) for p in simplex]
    fv = [f(p) for p in s]
    dec, converged = [], False
    for _ in range(steps):
        order = np.argsort(fv)
        s = [s[j] for j in order]
        fv = [fv[j] for j in order]
        if abs(fv[-1] - fv[0]) < 1e-8:
            converged = True
            break
        centroid = np.mean(s[:-1], axis=0)
        refl = centroid + (centroid - s[-1])
        fr = f(refl)
        if fv[0] <= fr < fv[-2]:
            s[-1], fv[-1] = refl, fr
            dec.append("refl")
        elif fr < fv[0]:
            exp = centroid + 2 * (centroid - s[-1])
            fe = f(exp)
            if fe < fr:
                s[-1], fv[-1] = exp, fe
                dec.append("exp")
            else:
                s[-1], fv[-1] = refl, fr
                dec.append("refl")
        else:
            contr = centroid + 0.5 * (s[-1] - centroid)
            fc = f(contr)
            if fc < fv[-1]:
                s[-1], fv[-1] = contr, fc
                dec.append("contr")
            else:
                for j in range(1, len(s)):
                    s[j] = s[0] + 0.5 * (s[j] - s[0])
                    fv[j] = f(s[j])
                dec.append("shrink")
    return dec, converged


def _int_nm_decisions(vals, slen, steps):
    """Branch decisions of the ORACLED micro6-integer NM chain (the
    _nm1/_nm2/_nm3 prefix), read off the candidate pid that entered
    each iteration's pool."""
    from tgres_spark.operators.holtwinters import (
        _NM_SIMPLEX,
        _hw_init_state,
        _hw_nm_iter,
        _hw_sse_int,
    )

    trend0, seasonal0 = _hw_init_state(vals, slen)

    def f(p):
        return _hw_sse_int(vals, slen, trend0, seasonal0, *p)

    pts = [(pid, _NM_SIMPLEX[pid], f(_NM_SIMPLEX[pid])) for pid in range(4)]
    pts.sort(key=lambda r: (r[2], r[0]))
    dec = []
    for k in range(steps):
        new = _hw_nm_iter(f, pts, 10 * k + 4)
        fresh = {p[0] for p in new} - {p[0] for p in pts}
        P = 10 * k + 4
        if {P + 3, P + 4, P + 5} & fresh:
            dec.append("shrink")
        elif P + 1 in fresh:
            dec.append("exp")
        elif P + 2 in fresh:
            dec.append("contr")
        else:
            dec.append("refl")
        pts = new
    return dec


def test_nm3_is_the_adaptive_fits_exact_prefix_on_driver_fixture():
    """The rows-only adaptive holtWintersForecast is 'the oracled nm3
    chain continued': on EVERY series of the driver's sf0.01 fixture
    (the same _nm1_base window the attested queries run on) the
    adaptive float optimizer's first three branch decisions equal the
    hash-checked integer chain's — and the adaptive loop does NOT hit
    its tol break within 3 iterations (measured 137-200 on this
    fixture), which is exactly why the full fit stays declared
    rows-only: only iterations > 3 are unoracled."""
    import os

    import pytest

    from tgres_spark.operators.holtwinters import (
        _q6,
        hw_initial_seasonal,
        hw_initial_trend,
        hw_smooth,
    )
    from tgres_spark.operators.queries_dsl import _nm1_base
    from tests.conftest import SF_ORACLE

    if not os.path.isdir(SF_ORACLE):
        pytest.skip("driver testdata absent")
    from tgres_spark.session import get_spark

    spark = get_spark("test")
    rows = _nm1_base(spark, SF_ORACLE).orderBy("name", "t").collect()
    series: dict[str, list[float]] = {}
    for r in rows:
        series.setdefault(r["name"], []).append(r["value"])
    assert len(series) >= 3
    start = [[0.1, 0.01, 0.9], [0.9, 0.1, 0.1], [0.5, 0.2, 0.5], [0.1, 0.9, 0.1]]
    for name, v in series.items():
        data = np.asarray(v, float)
        trend = hw_initial_trend(data, 24)
        seasonal = hw_initial_seasonal(data, 24)

        def f(x):
            return hw_smooth(data, 24, trend, seasonal, 12, *x)[2]

        fdec, converged = _float_nm_decisions(f, start, 3)
        idec = _int_nm_decisions([_q6(float(x)) for x in v], 24, 3)
        assert not converged, name  # adaptive tail really is adaptive
        assert fdec == idec, name   # oracled prefix = adaptive prefix
