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


def _q6(x: float) -> float:
    """floor(x*1e6+0.5)/1e6 — the repo's cross-engine quantization."""
    import math

    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def hw_fixed_forecast(
    df: DataFrame,
    slen: int = 24,
    n_pred: int = 12,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
) -> DataFrame:
    """Fixed-parameter HW forecast with a hash-checkable DuckDB twin.

    Triple exponential smoothing is a linear-ish recursion; with α/β/γ
    PINNED (no Nelder-Mead) it is expressible as a DuckDB recursive
    CTE (hw_fixed_forecast_sql below), so this variant carries a real
    oracle while the fitted variants stay rows-only. Cross-engine
    bit-equality is by construction: inputs and every recursion state
    (level, trend, seasonal[si], result) are quantized to 6 decimals
    (floor(x*1e6+0.5)/1e6) after each step, initialization sums
    accumulate micro6 int64 units (order-free), and the step
    expressions are written with identical IEEE op order on both
    sides — so by induction each engine sees identical doubles at
    every step. Same recurrence as hw_smooth / the reference
    (series/holtwinters.go:100-133), minus deviations.

    Pure-Python sequential loops on purpose: numpy's pairwise
    summation would diverge from DuckDB's sequential HUGEINT sums."""
    import math

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        name = pdf["name"].iloc[0]
        vals = [_q6(float(v)) for v in pdf["value"]]
        ts = [int(t) for t in pdf["t"]]
        n = len(vals)
        if n < 2 * slen:
            return pd.DataFrame({"name": [], "t": [], "value": []})
        # init trend / seasonal: micro6 int sums (order-free, exact)
        acc = 0
        for j in range(slen):
            acc += math.floor((vals[slen + j] - vals[j]) / slen * 1000000.0 + 0.5)
        trend = _q6(float(acc) / 1000000.0 / float(slen))
        ns = n // slen
        savg = []
        for s in range(ns):
            m = 0
            for j in range(slen):
                m += math.floor(vals[s * slen + j] * 1000000.0 + 0.5)
            savg.append(float(m) / 1000000.0 / float(slen))
        seasonal = []
        for si in range(slen):
            m = 0
            for s in range(ns):
                m += math.floor(vals[s * slen + si] / savg[s] * 1000000.0 + 0.5)
            seasonal.append(_q6(float(m) / 1000000.0 / float(ns)))
        # recursion, every state q6-quantized
        level = vals[0]
        result = [vals[0]]
        for i in range(1, n):
            si = i % slen
            val = vals[i]
            new_level = _q6(a * val / seasonal[si] + (1 - a) * (level + trend))
            trend = _q6(b * (new_level - level) + (1 - b) * trend)
            seasonal[si] = _q6(g * val / new_level + (1 - g) * seasonal[si])
            level = new_level
            result.append(_q6((level + trend) * seasonal[si]))
        step = ts[1] - ts[0]
        out_t = list(ts)
        for m in range(1, n_pred + 1):
            gi = (n - 1) + m
            out_t.append(ts[-1] + step * m)
            result.append(_q6((level + m * trend) * seasonal[gi % slen]))
        return pd.DataFrame(
            {
                "name": f"holtWintersForecast({name})",
                "t": out_t,
                "value": result,
            }
        )

    return (
        df.where(F.col(VALUE).isNotNull())
        .groupBy(NAME)
        .applyInPandas(fn, schema="name string, t long, value double")
    )


def hw_fixed_forecast_sql(
    base: str,
    slen: int = 24,
    n_pred: int = 12,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
) -> str:
    """DuckDB twin of hw_fixed_forecast: recursive CTE carrying
    (level, trend, seasonal LIST) per series, list_transform updating
    seasonal[si] in place, identical quantization at every step."""
    A, B, G = repr(a), repr(b), repr(g)
    IA, IB, IG = repr(1 - a), repr(1 - b), repr(1 - g)

    def q6(e: str) -> str:
        return f"FLOOR(({e}) * 1000000.0 + 0.5) / 1000000.0"

    SI = f"((r.i + 1) % {slen}) + 1"  # 1-based list index
    L = q6(f"{A} * d.value / r.seasonal[{SI}] + {IA} * (r.level + r.trend)")
    TR = q6(f"{B} * (({L}) - r.level) + {IB} * r.trend")
    SE = q6(f"{G} * d.value / ({L}) + {IG} * r.seasonal[{SI}]")
    RES = q6(f"(({L}) + ({TR})) * ({SE})")
    return f"""
WITH RECURSIVE
idx AS (
  SELECT name, t, {q6('value')} AS value,
         row_number() OVER (PARTITION BY name ORDER BY t) - 1 AS i
  FROM (SELECT * FROM ({base}) b WHERE b.value IS NOT NULL)
),
cnt AS (
  SELECT name, COUNT(*) AS n, COUNT(*) // {slen} AS ns
  FROM idx GROUP BY name HAVING COUNT(*) >= {2 * slen}
),
tr AS (
  SELECT a.name,
         {q6(f"CAST(SUM(CAST(FLOOR((b.value - a.value) / {slen} * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / {float(slen)!r}")} AS trend
  FROM idx a JOIN idx b ON b.name = a.name AND b.i = a.i + {slen}
  WHERE a.i < {slen} GROUP BY a.name
),
savg AS (
  SELECT idx.name, idx.i // {slen} AS s,
         CAST(SUM(CAST(FLOOR(idx.value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / {float(slen)!r} AS avg
  FROM idx JOIN cnt ON cnt.name = idx.name
  WHERE idx.i < cnt.ns * {slen}
  GROUP BY idx.name, idx.i // {slen}
),
seas AS (
  SELECT idx.name, idx.i % {slen} AS si,
         {q6("CAST(SUM(CAST(FLOOR(idx.value / savg.avg * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / CAST(ANY_VALUE(cnt.ns) AS DOUBLE)")} AS sv
  FROM idx
  JOIN cnt ON cnt.name = idx.name
  JOIN savg ON savg.name = idx.name AND savg.s = idx.i // {slen}
  WHERE idx.i < cnt.ns * {slen}
  GROUP BY idx.name, idx.i % {slen}
),
sl AS (SELECT name, list(sv ORDER BY si) AS seasonal FROM seas GROUP BY name),
stp AS (
  SELECT name,
         MAX(CASE WHEN i = 1 THEN t END) - MAX(CASE WHEN i = 0 THEN t END) AS st
  FROM idx WHERE i < 2 GROUP BY name
),
rec AS (
  SELECT d.name, 0 AS i, d.value AS level, tr.trend AS trend,
         sl.seasonal AS seasonal, d.value AS result, d.t AS t
  FROM idx d
  JOIN cnt ON cnt.name = d.name
  JOIN tr ON tr.name = d.name
  JOIN sl ON sl.name = d.name
  WHERE d.i = 0
  UNION ALL
  SELECT r.name, r.i + 1,
         {L} AS level,
         {TR} AS trend,
         list_transform(r.seasonal,
                        (x, k) -> CASE WHEN k = {SI} THEN {SE} ELSE x END) AS seasonal,
         {RES} AS result,
         d.t
  FROM rec r JOIN idx d ON d.name = r.name AND d.i = r.i + 1
),
fin AS (
  SELECT r.* FROM rec r JOIN cnt c ON c.name = r.name AND r.i = c.n - 1
),
fc AS (
  SELECT f.name, f.t + m.m * s.st AS t,
         {q6(f"(f.level + m.m * f.trend) * f.seasonal[((f.i + m.m) % {slen}) + 1]")} AS value
  FROM fin f
  JOIN stp s ON s.name = f.name
  CROSS JOIN (SELECT unnest(range(1, {n_pred + 1})) AS m) m
)
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(result AS DOUBLE) AS value FROM rec
UNION ALL
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(value AS DOUBLE) AS value FROM fc
"""


def holt_winters_forecast(df, season_points: int, n_pred: int) -> DataFrame:
    return _apply_hw(df, season_points, n_pred, "forecast", 0.0)


def holt_winters_confidence_bands(df, season_points: int, n_pred: int, dev_scale: float = 10.0) -> DataFrame:
    return _apply_hw(df, season_points, n_pred, "bands", dev_scale)


def holt_winters_aberration(df, season_points: int, dev_scale: float = 10.0) -> DataFrame:
    return _apply_hw(df, season_points, 0, "aberration", dev_scale)
