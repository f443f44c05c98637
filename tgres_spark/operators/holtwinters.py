"""Holt-Winters triple exponential smoothing (multiplicative).

Reference: series/holtwinters.go (NIST-handbook initialization,
smoothing recurrence at holtwinters.go:100-133, Nelder-Mead SSE
minimization at holtwinters.go:143-162) and dsl/funcs.go
dslHoltWintersForecast/ConfidenceBands/Aberration (funcs.go:2441+).

Spark shape: the recurrence is inherently sequential per series, so
this is the canonical applyInPandas case — Arrow-batched, one Python
call per series group, parallel across series. At 100 TB the fan-out
is across millions of series; each group is one RRA's points (small).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE

_BIG = float(2**62)


def hw_initial_trend(data: np.ndarray, slen: int) -> float:
    if len(data) < slen * 2:
        return float("nan")
    return float(np.mean((data[slen : 2 * slen] - data[:slen]) / slen))


def hw_initial_seasonal(data: np.ndarray, slen: int) -> np.ndarray:
    n_seasons = len(data) // slen
    if n_seasons == 0:
        return np.array([])
    seasons = data[: n_seasons * slen].reshape(n_seasons, slen)
    averages = seasons.mean(axis=1, keepdims=True)
    return (seasons / averages).mean(axis=0)


def hw_smooth(
    data: np.ndarray,
    slen: int,
    trend: float,
    seasonal: np.ndarray,
    n_pred: int,
    a: float,
    b: float,
    g: float,
):
    """Returns (smoothed+forecast, deviations, sse); out-of-range
    smoothing factors yield a huge SSE so the optimizer backs off."""
    if not (0 < a < 1 and 0 < b < 1 and 0 < g < 1):
        return np.array([]), np.array([]), _BIG
    seasonal = seasonal.copy()
    n = len(data)
    total = n + n_pred
    result = np.zeros(total)
    dev = np.zeros(total)
    seasonal_dev = np.zeros(slen)
    level = 0.0
    sse = 0.0
    for i in range(total):
        if i == 0:
            level = data[0]
            result[0] = data[0]
            continue
        si = i % slen
        if i >= n:
            m = i - n + 1
            result[i] = (level + m * trend) * seasonal[si]
        else:
            val = data[i]
            last_level, level = level, a * val / seasonal[si] + (1 - a) * (level + trend)
            trend = b * (level - last_level) + (1 - b) * trend
            seasonal[si] = g * val / level + (1 - g) * seasonal[si]
            result[i] = (level + trend) * seasonal[si]
            if i > 2:
                factor = result[i] / val if val != 0 else 1.0
                if factor > 1:
                    factor = 1 / factor
                seasonal_dev[si] = g * (1 - factor) + (1 - g) * seasonal_dev[si]
                diff = result[i] - val
                sse += diff * diff
        dev[i] = seasonal_dev[si]
    return result, dev, sse


def nelder_mead(f, simplex, max_iter=200, tol=1e-8):
    """Minimal downhill-simplex minimizer (standard coefficients
    α=1 reflect, γ=2 expand, ρ=0.5 contract, σ=0.5 shrink)."""
    s = [np.asarray(p, dtype=float) for p in simplex]
    fv = [f(p) for p in s]
    for _ in range(max_iter):
        order = np.argsort(fv)
        s = [s[i] for i in order]
        fv = [fv[i] for i in order]
        if abs(fv[-1] - fv[0]) < tol:
            break
        centroid = np.mean(s[:-1], axis=0)
        refl = centroid + (centroid - s[-1])
        fr = f(refl)
        if fv[0] <= fr < fv[-2]:
            s[-1], fv[-1] = refl, fr
        elif fr < fv[0]:
            exp = centroid + 2 * (centroid - s[-1])
            fe = f(exp)
            if fe < fr:
                s[-1], fv[-1] = exp, fe
            else:
                s[-1], fv[-1] = refl, fr
        else:
            contr = centroid + 0.5 * (s[-1] - centroid)
            fc = f(contr)
            if fc < fv[-1]:
                s[-1], fv[-1] = contr, fc
            else:
                for i in range(1, len(s)):
                    s[i] = s[0] + 0.5 * (s[i] - s[0])
                    fv[i] = f(s[i])
    order = np.argsort(fv)
    return s[order[0]]


def hw_fit(data: np.ndarray, slen: int, n_pred: int, a=0.0, b=0.0, g=0.0):
    """Full pipeline: init factors, optionally optimize α/β/γ by SSE."""
    trend = hw_initial_trend(data, slen)
    seasonal = hw_initial_seasonal(data, slen)
    if np.isnan(trend) or len(seasonal) == 0:
        return None
    if a == 0.0 or b == 0.0 or g == 0.0:
        start = [[0.1, 0.01, 0.9], [0.9, 0.1, 0.1], [0.5, 0.2, 0.5], [0.1, 0.9, 0.1]]
        best = nelder_mead(
            lambda x: hw_smooth(data, slen, trend, seasonal, n_pred, *x)[2],
            start,
        )
        a, b, g = best
    smooth, dev, _ = hw_smooth(data, slen, trend, seasonal, n_pred, a, b, g)
    return smooth, dev


def _apply_hw(df: DataFrame, slen: int, n_pred: int, mode: str, dev_scale: float):
    step_df = df  # expects a dense fixed-step SeriesFrame

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        name = pdf["name"].iloc[0]
        vals = pdf["value"].astype(float).to_numpy()
        ts = pdf["t"].to_numpy()
        vals = np.nan_to_num(vals, nan=float(np.nanmean(vals) if np.isfinite(np.nanmean(vals)) else 0.0))
        fit = hw_fit(vals, slen, n_pred)
        if fit is None:
            return pd.DataFrame({"name": [], "t": [], "value": []})
        smooth, dev = fit
        step = int(ts[1] - ts[0]) if len(ts) > 1 else 1
        all_t = np.concatenate([ts, ts[-1] + step * np.arange(1, n_pred + 1)])
        if mode == "forecast":
            out = {"name": f"holtWintersForecast({name})", "t": all_t, "value": smooth}
            return pd.DataFrame(out)
        if mode == "bands":
            up = smooth + smooth * dev * dev_scale
            lo = smooth - smooth * dev * dev_scale
            return pd.DataFrame(
                {
                    "name": [f"holtWintersConfidenceUpper({name})"] * len(all_t)
                    + [f"holtWintersConfidenceLower({name})"] * len(all_t),
                    "t": np.concatenate([all_t, all_t]),
                    "value": np.concatenate([up, lo]),
                }
            )
        # aberration: how far the actual value pokes outside the bands
        up = smooth + smooth * dev * dev_scale
        lo = smooth - smooth * dev * dev_scale
        n = len(vals)
        ab = np.zeros(n)
        over = vals > up[:n]
        under = vals < lo[:n]
        ab[over] = (vals - up[:n])[over]
        ab[under] = (vals - lo[:n])[under]
        return pd.DataFrame(
            {"name": f"holtWintersAberration({name})", "t": ts, "value": ab}
        )

    return step_df.groupBy(NAME).applyInPandas(
        fn, schema="name string, t long, value double"
    )


def holt_winters_forecast(df, season_points: int, n_pred: int) -> DataFrame:
    return _apply_hw(df, season_points, n_pred, "forecast", 0.0)


def holt_winters_confidence_bands(df, season_points: int, n_pred: int, dev_scale: float = 10.0) -> DataFrame:
    return _apply_hw(df, season_points, n_pred, "bands", dev_scale)


def holt_winters_aberration(df, season_points: int, dev_scale: float = 10.0) -> DataFrame:
    return _apply_hw(df, season_points, 0, "aberration", dev_scale)
