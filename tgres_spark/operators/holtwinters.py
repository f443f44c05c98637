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


def _hw_fixed_series(vals, ts, slen, n_pred, a, b, g):
    """Shared fixed-(α,β,γ) recursion for one sorted series.

    Returns (out_t, result, dev) over n + n_pred points, or None when
    the series is too short. Every recursion state (level, trend,
    seasonal[si], sdev[si], result) is q6-quantized after each step and
    the init sums accumulate micro6 int64 units, so the DuckDB twin
    (_hw_fixed_ctes) sees bit-identical doubles at every step. The
    deviation chain mirrors hw_smooth / series/holtwinters.go:118-127
    (factor fold-down, update only past the 3rd point).

    Pure-Python sequential loops on purpose: numpy's pairwise
    summation would diverge from DuckDB's sequential HUGEINT sums."""
    import math

    n = len(vals)
    if n < 2 * slen:
        return None
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
    sdev = [0.0] * slen
    dev = [0.0]
    for i in range(1, n):
        si = i % slen
        val = vals[i]
        new_level = _q6(a * val / seasonal[si] + (1 - a) * (level + trend))
        trend = _q6(b * (new_level - level) + (1 - b) * trend)
        seasonal[si] = _q6(g * val / new_level + (1 - g) * seasonal[si])
        level = new_level
        res_i = _q6((level + trend) * seasonal[si])
        result.append(res_i)
        if i > 2:
            factor = res_i / val if val != 0 else 1.0
            if factor > 1:
                factor = 1.0 / factor
            sdev[si] = _q6(g * (1.0 - factor) + (1 - g) * sdev[si])
        dev.append(sdev[si])
    step = ts[1] - ts[0]
    out_t = list(ts)
    for m in range(1, n_pred + 1):
        gi = (n - 1) + m
        out_t.append(ts[-1] + step * m)
        result.append(_q6((level + m * trend) * seasonal[gi % slen]))
        dev.append(sdev[gi % slen])
    return out_t, result, dev


# the production fit's initial simplex (hw_fit), frozen for the
# fixed-iteration NM sibling — every coordinate is exact at micro6
_NM_SIMPLEX = (
    (0.1, 0.01, 0.9),
    (0.9, 0.1, 0.1),
    (0.5, 0.2, 0.5),
    (0.1, 0.9, 0.1),
)
_NM_BIG = 1 << 62  # out-of-range-parameter SSE sentinel (hw_smooth's _BIG)


def _hw_init_state(vals, slen):
    """(trend, seasonal) q6 initialization shared by the fixed and
    NM-fixed paths — exactly _hw_fixed_series's init block."""
    import math

    n = len(vals)
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
    return trend, seasonal


def _hw_sse_int(vals, slen, trend0, seasonal0, a, b, g):
    """Exact integer SSE (micro6 units) of the q6-quantized recursion
    at (a, b, g) — the NM objective. Out-of-range parameters return
    the _NM_BIG sentinel (hw_smooth's guard). Integer accumulation is
    what lets the DuckDB twin make identical branch decisions: both
    engines compare the same int, never a float."""
    import math

    if not (0.0 < a < 1.0 and 0.0 < b < 1.0 and 0.0 < g < 1.0):
        return _NM_BIG
    n = len(vals)
    level = vals[0]
    trend = trend0
    seasonal = list(seasonal0)
    sse = 0
    for i in range(1, n):
        si = i % slen
        val = vals[i]
        new_level = _q6(a * val / seasonal[si] + (1.0 - a) * (level + trend))
        trend = _q6(b * (new_level - level) + (1.0 - b) * trend)
        seasonal[si] = _q6(g * val / new_level + (1.0 - g) * seasonal[si])
        level = new_level
        res_i = _q6((level + trend) * seasonal[si])
        if i > 2:
            d = res_i - val
            sse += math.floor(d * d * 1000000.0 + 0.5)
    return sse


def _hw_nm_iter(f, pts, pid_base):
    """ONE Nelder-Mead update on a sorted 4-point simplex ``pts``
    (list of (pid, point, sse) ordered by (sse, pid)); candidate
    point ids are pid_base+0..5 (refl, exp, contr, shrinks by rank)
    so pids stay unique across iterations and the (sse, pid)
    tie-break is never ambiguous. Returns the NEXT simplex, sorted —
    which is also the relation the SQL twin's ``pool`` CTE holds."""
    import math

    def m6(x):
        return math.floor(x * 1000000.0 + 0.5)

    def cmean(j):
        return _q6(
            float(sum(m6(pts[i][1][j]) for i in range(3))) / 1000000.0 / 3.0
        )

    c = tuple(cmean(j) for j in range(3))
    w = pts[3][1]
    best = pts[0][1]
    refl = tuple(_q6(c[j] + (c[j] - w[j])) for j in range(3))
    expa = tuple(_q6(c[j] + 2.0 * (c[j] - w[j])) for j in range(3))
    contr = tuple(_q6(c[j] + 0.5 * (w[j] - c[j])) for j in range(3))
    shr = [
        tuple(_q6(best[j] + 0.5 * (pts[i][1][j] - best[j])) for j in range(3))
        for i in (1, 2, 3)
    ]
    P = pid_base
    cand = {
        P: refl, P + 1: expa, P + 2: contr,
        P + 3: shr[0], P + 4: shr[1], P + 5: shr[2],
    }
    fcand = {pid: f(p) for pid, p in cand.items()}
    f0, f3rd, fworst = pts[0][2], pts[2][2], pts[3][2]
    fr, fe, fc = fcand[P], fcand[P + 1], fcand[P + 2]
    if f0 <= fr < f3rd:
        newpid = P
    elif fr < f0:
        newpid = P + 1 if fe < fr else P
    elif fc < fworst:
        newpid = P + 2
    else:
        newpid = -1  # shrink
    if newpid != -1:
        pool = [(p[0], p[1], p[2]) for p in pts[:3]]
        pool.append((newpid, cand[newpid], fcand[newpid]))
    else:
        pool = [pts[0]] + [
            (pid, cand[pid], fcand[pid]) for pid in (P + 3, P + 4, P + 5)
        ]
    pool.sort(key=lambda r: (r[2], r[0]))
    return pool


def _hw_nm_winner(vals, slen, iters=1):
    """``iters`` Nelder-Mead iterations (standard coefficients:
    reflect 1, expand 2, contract 0.5, shrink 0.5) from the
    production simplex over the exact-integer SSE objective; returns
    the winning (a, b, g). Control flow is made relational-friendly:
    ALL candidate points are evaluated unconditionally with
    deterministic point ids (originals 0-3; iteration k's refl/exp/
    contr/shrinks = 10k+4..10k+9), the branch is chosen per
    nelder_mead()'s exact condition order, and the winner is min by
    (sse, pid) — the SQL twin computes the same ints and the same
    CASEs, so both engines pick the same point. iters=1 is the
    original hash-checked NM1; iters=2 proves the update step
    COMPOSES (the ann_ivf_lloyd2 pattern)."""
    trend0, seasonal0 = _hw_init_state(vals, slen)

    def f(p):
        return _hw_sse_int(vals, slen, trend0, seasonal0, *p)

    pts = [
        (pid, _NM_SIMPLEX[pid], f(_NM_SIMPLEX[pid]))
        for pid in range(len(_NM_SIMPLEX))
    ]
    pts.sort(key=lambda r: (r[2], r[0]))
    for k in range(iters):
        pts = _hw_nm_iter(f, pts, 10 * k + 4)
    return pts[0][1]


def _hw_nm1_winner(vals, slen):
    return _hw_nm_winner(vals, slen, 1)


def _hw_nm1_apply(df, slen, n_pred, mode, dev_scale, iters=1):
    """applyInPandas assembly for the NM family — identical output
    shaping to _hw_fixed_apply (shared _hw_mode_rows), with the
    per-series (α, β, γ) coming from ``iters`` hash-checked
    Nelder-Mead iterations instead of fixed literals."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        name = pdf["name"].iloc[0]
        vals = [_q6(float(v)) for v in pdf["value"]]
        ts = [int(t) for t in pdf["t"]]
        if len(vals) < 2 * slen:
            return pd.DataFrame({"name": [], "t": [], "value": []})
        a, b, g = _hw_nm_winner(vals, slen, iters)
        fit = _hw_fixed_series(vals, ts, slen, n_pred, a, b, g)
        out_t, result, dev = fit
        return _hw_mode_rows(name, vals, ts, out_t, result, dev, mode, dev_scale)

    return (
        df.where(F.col(VALUE).isNotNull())
        .groupBy(NAME)
        .applyInPandas(fn, schema="name string, t long, value double")
    )


def hw_nm1_forecast(df: DataFrame, slen: int = 24, n_pred: int = 12) -> DataFrame:
    """holtWintersForecast after ONE hash-checked Nelder-Mead
    iteration — the optimizer-layer sibling of hw_fixed_forecast:
    hw_fixed proves the RECURSION is cross-engine exact, this proves
    the NM UPDATE STEP (order, centroid, reflect/expand/contract/
    shrink, accept) is too, leaving only the adaptive iteration count
    of the full fits rows-only. Same applyInPandas fan-out shape as
    every HW variant (one small group per series)."""
    return _hw_nm1_apply(df, slen, n_pred, "forecast", 0.0)


def hw_nm2_forecast(df: DataFrame, slen: int = 24, n_pred: int = 12) -> DataFrame:
    """holtWintersForecast after TWO hash-checked Nelder-Mead
    iterations — nm1 proves the update STEP, this proves the step
    COMPOSES (the ann_ivf_lloyd2 pattern): iteration 2 starts from
    iteration 1's pool simplex, so only the full fit's ADAPTIVE
    iteration count remains rows-only."""
    return _hw_nm1_apply(df, slen, n_pred, "forecast", 0.0, iters=2)


def hw_nm2_bands(
    df: DataFrame, slen: int = 24, n_pred: int = 12, dev_scale: float = 10.0
) -> DataFrame:
    """holtWintersConfidenceBands over the two-iteration NM fit."""
    return _hw_nm1_apply(df, slen, n_pred, "bands", dev_scale, iters=2)


def hw_nm2_aberration(
    df: DataFrame, slen: int = 24, dev_scale: float = 10.0
) -> DataFrame:
    """holtWintersAberration over the two-iteration NM fit."""
    return _hw_nm1_apply(df, slen, 0, "aberration", dev_scale, iters=2)


def hw_nm3_forecast(df: DataFrame, slen: int = 24, n_pred: int = 12) -> DataFrame:
    """holtWintersForecast after THREE hash-checked Nelder-Mead
    iterations — one more unrolled step of the same generated chain
    (candidate pids 24-29). On the driver fixture the adaptive fit's
    first three branch decisions match this oracled prefix exactly
    (pinned in tests/test_holtwinters.py), so the full
    holtWintersForecast (series/neldermead.go:1) is 'this chain
    continued': only iterations > 3 of the adaptive loop remain
    unoracled."""
    return _hw_nm1_apply(df, slen, n_pred, "forecast", 0.0, iters=3)


def hw_nm3_bands(
    df: DataFrame, slen: int = 24, n_pred: int = 12, dev_scale: float = 10.0
) -> DataFrame:
    """holtWintersConfidenceBands over the three-iteration NM fit."""
    return _hw_nm1_apply(df, slen, n_pred, "bands", dev_scale, iters=3)


def hw_nm3_aberration(
    df: DataFrame, slen: int = 24, dev_scale: float = 10.0
) -> DataFrame:
    """holtWintersAberration over the three-iteration NM fit."""
    return _hw_nm1_apply(df, slen, 0, "aberration", dev_scale, iters=3)


def hw_nm1_bands(
    df: DataFrame, slen: int = 24, n_pred: int = 12, dev_scale: float = 10.0
) -> DataFrame:
    """holtWintersConfidenceBands over the NM1-fitted parameters —
    the deviation chain runs at the per-series winning (α, β, γ);
    same oracle construction as hw_nm1_forecast with the sdev state
    carried through the final recursion."""
    return _hw_nm1_apply(df, slen, n_pred, "bands", dev_scale)


def hw_nm1_aberration(
    df: DataFrame, slen: int = 24, dev_scale: float = 10.0
) -> DataFrame:
    """holtWintersAberration over the NM1-fitted parameters."""
    return _hw_nm1_apply(df, slen, 0, "aberration", dev_scale)


def _hw_mode_rows(name, vals, ts, out_t, result, dev, mode, dev_scale):
    """Shared output shaping for the fixed and NM1 families:
    forecast rows, upper/lower bands, or aberration distances."""
    if mode == "forecast":
        return pd.DataFrame(
            {"name": f"holtWintersForecast({name})", "t": out_t, "value": result}
        )
    up = [r + r * d * dev_scale for r, d in zip(result, dev)]
    lo = [r - r * d * dev_scale for r, d in zip(result, dev)]
    if mode == "bands":
        return pd.DataFrame(
            {
                "name": [f"holtWintersConfidenceUpper({name})"] * len(out_t)
                + [f"holtWintersConfidenceLower({name})"] * len(out_t),
                "t": out_t + out_t,
                "value": up + lo,
            }
        )
    # aberration: actual region only, value poking outside the bands
    n = len(vals)
    ab = []
    for i in range(n):
        if vals[i] > up[i]:
            ab.append(vals[i] - up[i])
        elif vals[i] < lo[i]:
            ab.append(vals[i] - lo[i])
        else:
            ab.append(0.0)
    return pd.DataFrame(
        {"name": f"holtWintersAberration({name})", "t": ts, "value": ab}
    )


def _hw_fixed_apply(df, slen, n_pred, a, b, g, mode, dev_scale):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        name = pdf["name"].iloc[0]
        vals = [_q6(float(v)) for v in pdf["value"]]
        ts = [int(t) for t in pdf["t"]]
        fit = _hw_fixed_series(vals, ts, slen, n_pred, a, b, g)
        if fit is None:
            return pd.DataFrame({"name": [], "t": [], "value": []})
        out_t, result, dev = fit
        return _hw_mode_rows(name, vals, ts, out_t, result, dev, mode, dev_scale)

    return (
        df.where(F.col(VALUE).isNotNull())
        .groupBy(NAME)
        .applyInPandas(fn, schema="name string, t long, value double")
    )


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
    bit-equality is by construction — see _hw_fixed_series. Same
    recurrence as hw_smooth / the reference
    (series/holtwinters.go:100-133)."""
    return _hw_fixed_apply(df, slen, n_pred, a, b, g, "forecast", 0.0)


def hw_fixed_bands(
    df: DataFrame,
    slen: int = 24,
    n_pred: int = 12,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
    dev_scale: float = 10.0,
) -> DataFrame:
    """Fixed-parameter holtWintersConfidenceBands (funcs.go:2441+ via
    series/holtwinters.go deviations): smoothed ± smoothed·dev·scale,
    upper and lower as two series. Hash-checked — the deviation chain
    is part of the recursive-CTE oracle (hw_fixed_bands_sql)."""
    return _hw_fixed_apply(df, slen, n_pred, a, b, g, "bands", dev_scale)


def hw_fixed_aberration(
    df: DataFrame,
    slen: int = 24,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
    dev_scale: float = 10.0,
) -> DataFrame:
    """Fixed-parameter holtWintersAberration: how far each actual value
    pokes outside the confidence bands (0 inside). Hash-checked."""
    return _hw_fixed_apply(df, slen, 0, a, b, g, "aberration", dev_scale)


def _hw_init_sql(base: str, slen: int) -> str:
    """The init CTE chain (idx…stp) shared verbatim by the fixed and
    NM-fixed oracles: q6 inputs, micro6-int trend/seasonal sums.

    ``idx`` is MATERIALIZED: the recursive members join it every
    iteration, and DuckDB otherwise INLINES the whole consolidate
    base into each iteration — measured 305 s → 3.5 s on the bounded
    NM1 oracle from this one hint (same rows, same values)."""

    def q6(e: str) -> str:
        return f"FLOOR(({e}) * 1000000.0 + 0.5) / 1000000.0"

    return f"""idx AS MATERIALIZED (
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
)"""


def _hw_fixed_ctes(
    base: str,
    slen: int,
    n_pred: int,
    a: float,
    b: float,
    g: float,
) -> str:
    """DuckDB twin of _hw_fixed_series: recursive CTE carrying
    (level, trend, seasonal LIST, sdev LIST) per series,
    list_transform updating seasonal[si] / sdev[si] in place,
    identical quantization at every step. Exposes `rec`
    (name, i, t, result, devv) for the actual region and `fc`
    (name, t, value, devv) for the forecast region; a final SELECT is
    appended per mode by the *_sql wrappers below."""
    A, B, G = repr(a), repr(b), repr(g)
    IA, IB, IG = repr(1 - a), repr(1 - b), repr(1 - g)

    def q6(e: str) -> str:
        return f"FLOOR(({e}) * 1000000.0 + 0.5) / 1000000.0"

    # The recursive member computes each intermediate ONCE in a
    # layered subquery chain (x1 → x5). The first cut inlined L
    # textually into TR/SE/RES and RES into FACTOR/SDUP — the
    # expression tree expanded L ~30× per step and the three HW
    # oracles took 49/63/20 s at sf0.01; this form computes the same
    # quantized values (identical q6 points, identical IEEE order) in
    # a few seconds. Deviation chain per series/holtwinters.go:118-127:
    # factor folded into (0,1], update only past the 3rd point;
    # 1.0/(res/val) — NOT val/res — to match the Python fold's IEEE
    # op order exactly.
    SI = f"((r.i + 1) % {slen}) + 1"  # 1-based list index
    L = q6(f"{A} * d.value / r.seasonal[{SI}] + {IA} * (r.level + r.trend)")
    TR = q6(f"{B} * (lv - level) + {IB} * trend")
    SE = q6(f"{G} * dv / lv + {IG} * seasonal[si]")
    RES = q6("(lv + trv) * sev")
    FACTOR = (
        "CASE WHEN dv = 0 THEN 1.0 "
        "WHEN resv / dv > 1 THEN 1.0 / (resv / dv) "
        "ELSE resv / dv END"
    )
    SDUP = q6(f"{G} * (1.0 - factorv) + {IG} * sdev[si]")
    REC_STEP = f"""
  SELECT name, i + 1 AS i, lv AS level, trv AS trend,
         list_transform(seasonal,
                        (x, k) -> CASE WHEN k = si THEN sev ELSE x END) AS seasonal,
         CASE WHEN i + 1 > 2 THEN list_transform(sdev,
                (x, k) -> CASE WHEN k = si THEN sdup ELSE x END)
              ELSE sdev END AS sdev,
         CASE WHEN i + 1 > 2 THEN sdup ELSE sdev[si] END AS devv,
         resv AS result, dt AS t
  FROM (
    SELECT x4.*, {SDUP} AS sdup FROM (
      SELECT x3.*, {FACTOR} AS factorv FROM (
        SELECT x2.*, {RES} AS resv FROM (
          SELECT x1.*, {TR} AS trv, {SE} AS sev FROM (
            SELECT r.name, r.i, r.level, r.trend, r.seasonal, r.sdev,
                   d.value AS dv, d.t AS dt, {SI} AS si, {L} AS lv
            FROM rec r JOIN idx d ON d.name = r.name AND d.i = r.i + 1
          ) x1
        ) x2
      ) x3
    ) x4
  ) x5"""
    return f"""
WITH RECURSIVE
{_hw_init_sql(base, slen)},
rec AS (
  SELECT d.name, 0 AS i, d.value AS level, tr.trend AS trend,
         sl.seasonal AS seasonal,
         list_transform(range({slen}), x -> CAST(0.0 AS DOUBLE)) AS sdev,
         CAST(0.0 AS DOUBLE) AS devv,
         d.value AS result, d.t AS t
  FROM idx d
  JOIN cnt ON cnt.name = d.name
  JOIN tr ON tr.name = d.name
  JOIN sl ON sl.name = d.name
  WHERE d.i = 0
  UNION ALL
{REC_STEP}
),
fin AS (
  SELECT r.* FROM rec r JOIN cnt c ON c.name = r.name AND r.i = c.n - 1
),
fc AS (
  SELECT f.name, f.t + m.m * s.st AS t,
         {q6(f"(f.level + m.m * f.trend) * f.seasonal[((f.i + m.m) % {slen}) + 1]")} AS value,
         f.sdev[((f.i + m.m) % {slen}) + 1] AS devv
  FROM fin f
  JOIN stp s ON s.name = f.name
  CROSS JOIN (SELECT unnest(range(1, {n_pred + 1})) AS m) m
)
"""


def hw_fixed_forecast_sql(
    base: str,
    slen: int = 24,
    n_pred: int = 12,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
) -> str:
    return _hw_fixed_ctes(base, slen, n_pred, a, b, g) + """
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(result AS DOUBLE) AS value FROM rec
UNION ALL
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(value AS DOUBLE) AS value FROM fc
"""


def hw_fixed_bands_sql(
    base: str,
    slen: int = 24,
    n_pred: int = 12,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
    dev_scale: float = 10.0,
) -> str:
    DS = repr(dev_scale)
    return _hw_fixed_ctes(base, slen, n_pred, a, b, g) + f""",
allpts AS (
  SELECT name, t, result, devv FROM rec
  UNION ALL
  SELECT name, t, value AS result, devv FROM fc
)
SELECT 'holtWintersConfidenceUpper(' || name || ')' AS name, t,
       CAST(result + result * devv * {DS} AS DOUBLE) AS value FROM allpts
UNION ALL
SELECT 'holtWintersConfidenceLower(' || name || ')' AS name, t,
       CAST(result - result * devv * {DS} AS DOUBLE) AS value FROM allpts
"""


def hw_fixed_aberration_sql(
    base: str,
    slen: int = 24,
    a: float = 0.4,
    b: float = 0.1,
    g: float = 0.2,
    dev_scale: float = 10.0,
) -> str:
    DS = repr(dev_scale)
    UP = f"r.result + r.result * r.devv * {DS}"
    LO = f"r.result - r.result * r.devv * {DS}"
    return _hw_fixed_ctes(base, slen, 0, a, b, g) + f"""
SELECT 'holtWintersAberration(' || r.name || ')' AS name, r.t,
       CAST(CASE WHEN i.value > {UP} THEN i.value - ({UP})
                 WHEN i.value < {LO} THEN i.value - ({LO})
                 ELSE 0.0 END AS DOUBLE) AS value
FROM rec r JOIN idx i ON i.name = r.name AND i.i = r.i
"""


def _hw_sse_rec_sql(rec: str, pts: str, join_on: str, slen: int) -> str:
    """Recursive exact-integer SSE evaluation of the q6 recursion at
    every point of ``pts``(name?, pid, a, b, g) — the NM objective,
    layered like _hw_fixed_ctes's member (each intermediate once).
    Out-of-(0,1) points are excluded at the anchor; the consumer
    COALESCEs their SSE to the _NM_BIG sentinel."""

    def q6(e: str) -> str:
        return f"FLOOR(({e}) * 1000000.0 + 0.5) / 1000000.0"

    SI = f"((r.i + 1) % {slen}) + 1"
    L = q6(f"r.a * d.value / r.seasonal[{SI}] + (1.0 - r.a) * (r.level + r.trend)")
    TR = q6("b * (lv - level) + (1.0 - b) * trend")
    SE = q6("g * dv / lv + (1.0 - g) * seasonal[si]")
    RES = q6("(lv + trv) * sev")
    return f"""{rec} AS (
  SELECT p.pid, p.a, p.b, p.g, d.name, 0 AS i, d.value AS level,
         tr.trend AS trend, sl.seasonal AS seasonal,
         CAST(0 AS HUGEINT) AS sse
  FROM idx d
  JOIN cnt ON cnt.name = d.name
  JOIN tr ON tr.name = d.name
  JOIN sl ON sl.name = d.name
  JOIN {pts} p ON {join_on}
  WHERE d.i = 0 AND p.a > 0 AND p.a < 1 AND p.b > 0 AND p.b < 1
        AND p.g > 0 AND p.g < 1
  UNION ALL
  SELECT pid, a, b, g, name, i + 1 AS i, lv AS level, trv AS trend,
         list_transform(seasonal,
                        (x, k) -> CASE WHEN k = si THEN sev ELSE x END) AS seasonal,
         sse + CASE WHEN i + 1 > 2
           THEN CAST(FLOOR((resv - dv) * (resv - dv) * 1000000.0 + 0.5) AS HUGEINT)
           ELSE CAST(0 AS HUGEINT) END AS sse
  FROM (
    SELECT x2.*, {RES} AS resv FROM (
      SELECT x1.*, {TR} AS trv, {SE} AS sev FROM (
        SELECT r.pid, r.a, r.b, r.g, r.name, r.i, r.level, r.trend,
               r.seasonal, r.sse, d.value AS dv, {SI} AS si, {L} AS lv
        FROM {rec} r JOIN idx d ON d.name = r.name AND d.i = r.i + 1
      ) x1) x2) x3
)"""


def _hw_nm1_ctes(
    base: str, slen: int = 24, n_pred: int = 12, iters: int = 1
) -> str:
    """DuckDB CTE chain for the NM family: ``iters`` whole NM
    iterations run relationally — every SSE recursion compares the
    SAME exact micro6-int SSEs, the ordering ties to pid (candidate
    pids 10k+4..10k+9 per iteration k, unique across iterations so
    the tie-break is never ambiguous), centroid coordinates fold
    micro6 ints (order-free), every candidate is evaluated
    unconditionally, and each branch CASE mirrors nelder_mead()'s
    condition order — so both engines walk the same simplex chain
    (each iteration's ``pool{k}`` IS the next simplex) before the
    final recursion. Exposes ``rec``/``fin``/``fc`` with the SAME
    column contract as _hw_fixed_ctes (incl. the sdev/devv deviation
    chain), so the three mode tails are shared verbatim."""

    def q6(e: str) -> str:
        return f"FLOOR(({e}) * 1000000.0 + 0.5) / 1000000.0"

    def m6sum(col: str) -> str:
        return (
            f"FLOOR((CAST(SUM(CAST(FLOOR({col} * 1000000.0 + 0.5) AS BIGINT)) "
            "AS DOUBLE) / 1000000.0 / 3.0) * 1000000.0 + 0.5) / 1000000.0"
        )

    pts0_rows = ", ".join(
        f"({pid}, {a!r}, {b!r}, {g!r})"
        for pid, (a, b, g) in enumerate(_NM_SIMPLEX)
    )
    shr = {c: q6(f"b_{c} + 0.5 * (o.{c} - b_{c})") for c in ("a", "b", "g")}
    refl = {c: q6(f"c_{c} + (c_{c} - w_{c})") for c in ("a", "b", "g")}
    expa = {c: q6(f"c_{c} + 2.0 * (c_{c} - w_{c})") for c in ("a", "b", "g")}
    contr = {c: q6(f"c_{c} + 0.5 * (w_{c} - c_{c})") for c in ("a", "b", "g")}

    def _iter_block(k: int) -> str:
        """One relational NM iteration: rank the 4-point simplex,
        evaluate ALL candidates (pids 10k+4..10k+9 — unique across
        iterations so the (sse, pid) tie-break is never ambiguous),
        branch per nelder_mead()'s condition order, emit the next
        simplex as pool{k}. Iteration 0's input is sim0; iteration
        k's is the previous pool."""
        src = "sim0" if k == 0 else f"pool{k - 1}"
        P = 10 * k + 4
        return f"""ord{k} AS MATERIALIZED (
  SELECT s.name, s.pid, s.sse, s.a, s.b, s.g,
         ROW_NUMBER() OVER (PARTITION BY s.name
                            ORDER BY s.sse, s.pid) AS rk
  FROM {src} s
),
cent{k} AS (
  SELECT name, {m6sum('a')} AS c_a, {m6sum('b')} AS c_b, {m6sum('g')} AS c_g
  FROM ord{k} WHERE rk <= 3 GROUP BY name
),
wb{k} AS (
  SELECT name,
         MAX(CASE WHEN rk = 4 THEN a END) AS w_a,
         MAX(CASE WHEN rk = 4 THEN b END) AS w_b,
         MAX(CASE WHEN rk = 4 THEN g END) AS w_g,
         MAX(CASE WHEN rk = 1 THEN a END) AS b_a,
         MAX(CASE WHEN rk = 1 THEN b END) AS b_b,
         MAX(CASE WHEN rk = 1 THEN g END) AS b_g
  FROM ord{k} GROUP BY name
),
cand{k} AS MATERIALIZED (
  SELECT c.name, {P} AS pid, {refl['a']} AS a, {refl['b']} AS b, {refl['g']} AS g
  FROM cent{k} c JOIN wb{k} USING (name)
  UNION ALL
  SELECT c.name, {P + 1}, {expa['a']}, {expa['b']}, {expa['g']}
  FROM cent{k} c JOIN wb{k} USING (name)
  UNION ALL
  SELECT c.name, {P + 2}, {contr['a']}, {contr['b']}, {contr['g']}
  FROM cent{k} c JOIN wb{k} USING (name)
  UNION ALL
  SELECT o.name, o.rk + {P + 1}, {shr['a']}, {shr['b']}, {shr['g']}
  FROM ord{k} o JOIN wb{k} USING (name) WHERE o.rk >= 2
),
{_hw_sse_rec_sql(f'recc{k}', f'cand{k}', 'p.name = d.name', slen)},
f2{k} AS MATERIALIZED (
  SELECT c.name, c.pid, c.a, c.b, c.g,
         COALESCE(r2.sse, CAST({_NM_BIG} AS HUGEINT)) AS sse
  FROM cand{k} c LEFT JOIN (
    SELECT r.name, r.pid, r.sse FROM recc{k} r
    JOIN cnt ct ON ct.name = r.name AND r.i = ct.n - 1
  ) r2 ON r2.name = c.name AND r2.pid = c.pid
),
sc{k} AS (
  SELECT name,
         MAX(CASE WHEN rk = 1 THEN sse END) AS f0,
         MAX(CASE WHEN rk = 3 THEN sse END) AS f3rd,
         MAX(CASE WHEN rk = 4 THEN sse END) AS fworst
  FROM ord{k} GROUP BY name
),
cf{k} AS (
  SELECT name,
         MAX(CASE WHEN pid = {P} THEN sse END) AS fr,
         MAX(CASE WHEN pid = {P + 1} THEN sse END) AS fe,
         MAX(CASE WHEN pid = {P + 2} THEN sse END) AS fc
  FROM f2{k} GROUP BY name
),
br{k} AS (
  SELECT name,
         CASE WHEN fr >= f0 AND fr < f3rd THEN {P}
              WHEN fr < f0 AND fe < fr THEN {P + 1}
              WHEN fr < f0 THEN {P}
              WHEN fc < fworst THEN {P + 2}
              ELSE -1 END AS newpid
  FROM sc{k} JOIN cf{k} USING (name)
),
pool{k} AS MATERIALIZED (
  SELECT o.name, o.pid, o.sse, o.a, o.b, o.g
  FROM ord{k} o JOIN br{k} USING (name)
  WHERE (br{k}.newpid <> -1 AND o.rk <= 3) OR (br{k}.newpid = -1 AND o.rk = 1)
  UNION ALL
  SELECT f.name, f.pid, f.sse, f.a, f.b, f.g
  FROM f2{k} f JOIN br{k} USING (name)
  WHERE f.pid = br{k}.newpid
     OR (br{k}.newpid = -1 AND f.pid IN ({P + 3}, {P + 4}, {P + 5}))
)"""
    SI = f"((r.i + 1) % {slen}) + 1"
    L = q6(f"r.a * d.value / r.seasonal[{SI}] + (1.0 - r.a) * (r.level + r.trend)")
    TR = q6("b * (lv - level) + (1.0 - b) * trend")
    SE = q6("g * dv / lv + (1.0 - g) * seasonal[si]")
    RES = q6("(lv + trv) * sev")
    FACTOR = (
        "CASE WHEN dv = 0 THEN 1.0 "
        "WHEN resv / dv > 1 THEN 1.0 / (resv / dv) "
        "ELSE resv / dv END"
    )
    SDUP = q6("g * (1.0 - factorv) + (1.0 - g) * sdev[si]")
    blocks = ",\n".join(_iter_block(k) for k in range(iters))
    return f"""
WITH RECURSIVE
{_hw_init_sql(base, slen)},
pts0 AS (SELECT * FROM (VALUES {pts0_rows}) p(pid, a, b, g)),
{_hw_sse_rec_sql('recs', 'pts0', 'TRUE', slen)},
f1 AS (
  SELECT r.name, r.pid, r.sse FROM recs r
  JOIN cnt c ON c.name = r.name AND r.i = c.n - 1
),
sim0 AS (
  SELECT f1.name, f1.pid, f1.sse, p.a, p.b, p.g
  FROM f1 JOIN pts0 p ON p.pid = f1.pid
),
{blocks},
win AS (
  SELECT name, a, b, g FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY name
                                 ORDER BY sse, pid) AS rk2 FROM pool{iters - 1}
  ) WHERE rk2 = 1
),
rec AS (
  SELECT d.name, w.a, w.b, w.g, 0 AS i, d.value AS level,
         tr.trend AS trend, sl.seasonal AS seasonal,
         list_transform(range({slen}), x -> CAST(0.0 AS DOUBLE)) AS sdev,
         CAST(0.0 AS DOUBLE) AS devv,
         d.value AS result, d.t AS t
  FROM idx d
  JOIN cnt ON cnt.name = d.name
  JOIN tr ON tr.name = d.name
  JOIN sl ON sl.name = d.name
  JOIN win w ON w.name = d.name
  WHERE d.i = 0
  UNION ALL
  SELECT name, a, b, g, i + 1 AS i, lv AS level, trv AS trend,
         list_transform(seasonal,
                        (x, k) -> CASE WHEN k = si THEN sev ELSE x END) AS seasonal,
         CASE WHEN i + 1 > 2 THEN list_transform(sdev,
                (x, k) -> CASE WHEN k = si THEN sdup ELSE x END)
              ELSE sdev END AS sdev,
         CASE WHEN i + 1 > 2 THEN sdup ELSE sdev[si] END AS devv,
         resv AS result, dt AS t
  FROM (
    SELECT x4.*, {SDUP} AS sdup FROM (
      SELECT x3.*, {FACTOR} AS factorv FROM (
        SELECT x2.*, {RES} AS resv FROM (
          SELECT x1.*, {TR} AS trv, {SE} AS sev FROM (
            SELECT r.name, r.a, r.b, r.g, r.i, r.level, r.trend,
                   r.seasonal, r.sdev, d.value AS dv, d.t AS dt,
                   {SI} AS si, {L} AS lv
            FROM rec r JOIN idx d ON d.name = r.name AND d.i = r.i + 1
          ) x1) x2) x3) x4) x5
),
fin AS (
  SELECT r.* FROM rec r JOIN cnt c ON c.name = r.name AND r.i = c.n - 1
),
fc AS (
  SELECT f.name, f.t + m.m * s.st AS t,
         {q6(f"(f.level + m.m * f.trend) * f.seasonal[((f.i + m.m) % {slen}) + 1]")} AS value,
         f.sdev[((f.i + m.m) % {slen}) + 1] AS devv
  FROM fin f
  JOIN stp s ON s.name = f.name
  CROSS JOIN (SELECT unnest(range(1, {n_pred + 1})) AS m) m
)
"""


def hw_nm2_forecast_sql(base: str, slen: int = 24, n_pred: int = 12) -> str:
    return _hw_nm1_ctes(base, slen, n_pred, iters=2) + """
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(result AS DOUBLE) AS value FROM rec
UNION ALL
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(value AS DOUBLE) AS value FROM fc
"""


def hw_nm3_forecast_sql(base: str, slen: int = 24, n_pred: int = 12) -> str:
    return _hw_nm1_ctes(base, slen, n_pred, iters=3) + """
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(result AS DOUBLE) AS value FROM rec
UNION ALL
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(value AS DOUBLE) AS value FROM fc
"""


def hw_nm1_forecast_sql(base: str, slen: int = 24, n_pred: int = 12) -> str:
    return _hw_nm1_ctes(base, slen, n_pred) + """
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(result AS DOUBLE) AS value FROM rec
UNION ALL
SELECT 'holtWintersForecast(' || name || ')' AS name, t,
       CAST(value AS DOUBLE) AS value FROM fc
"""


def hw_nm1_bands_sql(
    base: str, slen: int = 24, n_pred: int = 12, dev_scale: float = 10.0,
    iters: int = 1,
) -> str:
    DS = repr(dev_scale)
    return _hw_nm1_ctes(base, slen, n_pred, iters) + f""",
allpts AS (
  SELECT name, t, result, devv FROM rec
  UNION ALL
  SELECT name, t, value AS result, devv FROM fc
)
SELECT 'holtWintersConfidenceUpper(' || name || ')' AS name, t,
       CAST(result + result * devv * {DS} AS DOUBLE) AS value FROM allpts
UNION ALL
SELECT 'holtWintersConfidenceLower(' || name || ')' AS name, t,
       CAST(result - result * devv * {DS} AS DOUBLE) AS value FROM allpts
"""


def hw_nm1_aberration_sql(
    base: str, slen: int = 24, dev_scale: float = 10.0, iters: int = 1
) -> str:
    DS = repr(dev_scale)
    UP = f"r.result + r.result * r.devv * {DS}"
    LO = f"r.result - r.result * r.devv * {DS}"
    return _hw_nm1_ctes(base, slen, 0, iters) + f"""
SELECT 'holtWintersAberration(' || r.name || ')' AS name, r.t,
       CAST(CASE WHEN i.value > {UP} THEN i.value - ({UP})
                 WHEN i.value < {LO} THEN i.value - ({LO})
                 ELSE 0.0 END AS DOUBLE) AS value
FROM rec r JOIN idx i ON i.name = r.name AND i.i = r.i
"""


def holt_winters_forecast(df, season_points: int, n_pred: int) -> DataFrame:
    return _apply_hw(df, season_points, n_pred, "forecast", 0.0)


def holt_winters_confidence_bands(df, season_points: int, n_pred: int, dev_scale: float = 10.0) -> DataFrame:
    return _apply_hw(df, season_points, n_pred, "bands", dev_scale)


def holt_winters_aberration(df, season_points: int, dev_scale: float = 10.0) -> DataFrame:
    return _apply_hw(df, season_points, 0, "aberration", dev_scale)
