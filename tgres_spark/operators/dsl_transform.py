"""Graphite DSL transform functions — per-point and per-series.

Reference: dsl/funcs.go TRANSFORM block (funcs.go:269-287) and the
series wrappers behind it (seriesDerivative funcs.go:1196, etc.).
Each function has a Spark form `f(df, ...)` and an oracle generator
`f_sql(base_sql, ...)` producing the exact-same-semantics DuckDB SQL;
keeping them adjacent is the parity contract.

All per-series ordered ops use a window partitioned by name — on a
name-bucketed table this is a single co-partitioned pass, no shuffle
of the full data beyond the hash by name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE, micro6

def _w():
    # lazy: Window specs need an active SparkContext in Spark 4, and
    # these modules import before the test session exists
    return Window.partitionBy(NAME).orderBy(T)


def _wall():
    return Window.partitionBy(NAME)


def _relabel(df: DataFrame, fmt: str, *, value: Column) -> DataFrame:
    return df.select(
        F.format_string(fmt, F.col(NAME)).alias(NAME),
        F.col(T),
        value.cast("double").alias(VALUE),
    )


def _map_sql(base: str, fmt: str, vexpr: str) -> str:
    # fmt is a printf with one %s for the series name
    name = "printf('" + fmt.replace("'", "''") + "', name)"
    return f"SELECT {name} AS name, t, CAST(({vexpr}) AS DOUBLE) AS value FROM ({base})"


# --- pointwise -------------------------------------------------------------

def absolute(df):  # funcs.go dslAbsolute
    return _relabel(df, "absolute(%s)", value=F.abs(F.col(VALUE)))


def absolute_sql(base):
    return _map_sql(base, "absolute(%s)", "ABS(value)")


def scale(df, factor: float):
    return _relabel(df, f"scale(%s,{factor:g})", value=F.col(VALUE) * F.lit(float(factor)))


def scale_sql(base, factor: float):
    return _map_sql(base, f"scale(%s,{factor:g})", f"value * {float(factor)!r}")


def offset(df, amount: float):
    return _relabel(df, f"offset(%s,{amount:g})", value=F.col(VALUE) + F.lit(float(amount)))


def offset_sql(base, amount: float):
    return _map_sql(base, f"offset(%s,{amount:g})", f"value + {float(amount)!r}")


def invert(df):
    v = F.when(F.col(VALUE) != 0.0, F.lit(1.0) / F.col(VALUE))
    return _relabel(df, "invert(%s)", value=v)


def invert_sql(base):
    return _map_sql(base, "invert(%s)", "CASE WHEN value <> 0.0 THEN 1.0 / value END")


def pow_(df, exp: float):
    # small integer exponents: exact multiply chain (identical IEEE ops
    # in both engines); libm pow differs in the last ulp and round()
    # can't mask values that straddle a rounding boundary
    if float(exp).is_integer() and 1 <= exp <= 4:
        v = F.col(VALUE)
        for _ in range(int(exp) - 1):
            v = v * F.col(VALUE)
    else:
        v = F.round(F.pow(F.col(VALUE), F.lit(float(exp))), 6)
    return _relabel(df, f"pow(%s,{exp:g})", value=v)


def pow_sql(base, exp: float):
    if float(exp).is_integer() and 1 <= exp <= 4:
        v = " * ".join(["value"] * int(exp))
    else:
        v = f"ROUND(POW(value, {float(exp)!r}), 6)"
    return _map_sql(base, f"pow(%s,{exp:g})", v)


def square_root(df):
    v = F.when(F.col(VALUE) >= 0.0, F.sqrt(F.col(VALUE)))
    return _relabel(df, "squareRoot(%s)", value=v)


def square_root_sql(base):
    return _map_sql(base, "squareRoot(%s)", "CASE WHEN value >= 0.0 THEN SQRT(value) END")


def logarithm(df, base_n: float = 10.0):
    # libm log differs across engines in the last ulp — round(9)
    v = F.when(
        F.col(VALUE) > 0.0, F.round(F.log(float(base_n), F.col(VALUE)), 9)
    )
    return _relabel(df, f"logarithm(%s,{base_n:g})", value=v)


def logarithm_sql(base, base_n: float = 10.0):
    return _map_sql(
        base,
        f"logarithm(%s,{base_n:g})",
        f"CASE WHEN value > 0.0 THEN ROUND(LN(value) / LN({float(base_n)!r}), 9) END",
    )


def transform_null(df, default: float = 0.0):
    return _relabel(
        df,
        f"transformNull(%s,{default:g})",
        value=F.coalesce(F.col(VALUE), F.lit(float(default))),
    )


def transform_null_sql(base, default: float = 0.0):
    return _map_sql(
        base, f"transformNull(%s,{default:g})", f"COALESCE(value, {float(default)!r})"
    )


def is_non_null(df):  # per-point 1/0 indicator (funcs.go dslIsNonNull)
    return _relabel(
        df,
        "isNonNull(%s)",
        value=F.when(F.col(VALUE).isNotNull(), 1.0).otherwise(0.0),
    )


def is_non_null_sql(base):
    return _map_sql(base, "isNonNull(%s)", "CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END")


def remove_above_value(df, n: float):
    v = F.when(F.col(VALUE) <= float(n), F.col(VALUE))
    return _relabel(df, f"removeAboveValue(%s,{n:g})", value=v)


def remove_above_value_sql(base, n: float):
    return _map_sql(
        base, f"removeAboveValue(%s,{n:g})", f"CASE WHEN value <= {float(n)!r} THEN value END"
    )


def remove_below_value(df, n: float):
    v = F.when(F.col(VALUE) >= float(n), F.col(VALUE))
    return _relabel(df, f"removeBelowValue(%s,{n:g})", value=v)


def remove_below_value_sql(base, n: float):
    return _map_sql(
        base, f"removeBelowValue(%s,{n:g})", f"CASE WHEN value >= {float(n)!r} THEN value END"
    )


# --- per-series ordered ----------------------------------------------------

def derivative(df):  # diff vs previous point (funcs.go:1178-1203)
    v = F.col(VALUE) - F.lag(VALUE).over(_w())
    return _relabel(df, "derivative(%s)", value=v)


def derivative_sql(base):
    return _map_sql(
        base, "derivative(%s)", "value - LAG(value) OVER (PARTITION BY name ORDER BY t)"
    )


def non_negative_derivative(df, max_value: float | None = None):
    """Delta to the previous point, NULL when negative — unless
    ``max_value`` marks a wrapping counter, in which case a negative
    delta yields (max - prev) + cur + 1 (seriesNonNegativeDerivative,
    funcs.go:1261-1269; we keep graphite-web's >= 0, the Go port's
    strict > 0 drops flat counters)."""
    prev = F.lag(VALUE).over(_w())
    d = F.col(VALUE) - prev
    v = F.when(d >= 0.0, d)
    if max_value is not None:
        mv = float(max_value)
        v = v.when(
            F.lit(mv) > F.col(VALUE),
            F.lit(mv) - prev + F.col(VALUE) + F.lit(1.0),
        )
    return _relabel(df, "nonNegativeDerivative(%s)", value=v)


def non_negative_derivative_sql(base, max_value: float | None = None):
    d = "value - LAG(value) OVER (PARTITION BY name ORDER BY t)"
    wrap = ""
    if max_value is not None:
        mv = repr(float(max_value))
        wrap = (
            f" WHEN {mv} > value THEN "
            f"{mv} - LAG(value) OVER (PARTITION BY name ORDER BY t) + value + 1.0"
        )
    return _map_sql(
        base,
        "nonNegativeDerivative(%s)",
        f"CASE WHEN ({d}) >= 0.0 THEN ({d}){wrap} END",
    )


def per_second(df):
    # rate vs wall-clock gap between points (Graphite perSecond)
    dt = (F.col(T) - F.lag(T).over(_w())).cast("double")
    d = F.col(VALUE) - F.lag(VALUE).over(_w())
    v = F.when((d >= 0.0) & (dt > 0.0), d / dt)
    return _relabel(df, "perSecond(%s)", value=v)


def per_second_sql(base):
    d = "value - LAG(value) OVER (PARTITION BY name ORDER BY t)"
    dt = "CAST(t - LAG(t) OVER (PARTITION BY name ORDER BY t) AS DOUBLE)"
    return _map_sql(
        base,
        "perSecond(%s)",
        f"CASE WHEN ({d}) >= 0.0 AND ({dt}) > 0.0 THEN ({d}) / ({dt}) END",
    )


def integral(df):  # running sum, resets never (funcs.go:1205-1231)
    v = (
        F.sum(micro6(F.col(VALUE)))
        .over(_w().rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        / 1000000.0
    )
    return _relabel(df, "integral(%s)", value=v)


def integral_sql(base):
    run = (
        "CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) OVER "
        "(PARTITION BY name ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0"
    )
    return _map_sql(base, "integral(%s)", run)


def delay(df, steps: int):
    v = F.lag(VALUE, int(steps)).over(_w())
    return _relabel(df, f"delay(%s,{steps})", value=v)


def delay_sql(base, steps: int):
    return _map_sql(
        base, f"delay(%s,{steps})",
        f"LAG(value, {int(steps)}) OVER (PARTITION BY name ORDER BY t)",
    )


def keep_last_value(df, limit: int | None = None):
    """Fill nulls with the last known value (funcs.go dslKeepLastValue).
    ``limit`` caps how many consecutive unknowns may be filled."""
    run = _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last = F.last(VALUE, ignorenulls=True).over(run)
    if limit is None:
        v = F.coalesce(F.col(VALUE), last)
        return _relabel(df, "keepLastValue(%s)", value=v)
    # staged: rn + masked-rn first, then the running max of masked-rn
    # (window exprs can't nest inside another window's aggregate)
    s1 = df.select(
        NAME,
        T,
        VALUE,
        F.row_number().over(_w()).alias("rn"),
        F.when(F.col(VALUE).isNotNull(), F.row_number().over(_w())).alias("krn"),
    )
    s2 = s1.select(
        NAME,
        T,
        VALUE,
        "rn",
        F.last("krn", ignorenulls=True).over(run).alias("last_krn"),
        F.last(VALUE, ignorenulls=True).over(run).alias("filled"),
    )
    v = F.when(F.col(VALUE).isNotNull(), F.col(VALUE)).otherwise(
        F.when(F.col("rn") - F.col("last_krn") <= int(limit), F.col("filled"))
    )
    return _relabel(s2, "keepLastValue(%s)", value=v)


def keep_last_value_sql(base, limit: int | None = None):
    run = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    last = f"LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY name ORDER BY t {run})"
    if limit is None:
        v = f"COALESCE(value, {last})"
        return _map_sql(base, "keepLastValue(%s)", v)
    s1 = (
        "SELECT name, t, value, ROW_NUMBER() OVER (PARTITION BY name ORDER BY t) AS rn, "
        "CASE WHEN value IS NOT NULL THEN ROW_NUMBER() OVER (PARTITION BY name ORDER BY t) END AS krn "
        f"FROM ({base})"
    )
    s2 = (
        "SELECT name, t, value, rn, "
        f"LAST_VALUE(krn IGNORE NULLS) OVER (PARTITION BY name ORDER BY t {run}) AS last_krn, "
        f"LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY name ORDER BY t {run}) AS filled "
        f"FROM ({s1})"
    )
    v = f"CASE WHEN value IS NOT NULL THEN value WHEN rn - last_krn <= {int(limit)} THEN filled END"
    return f"SELECT printf('keepLastValue(%s)', name) AS name, t, CAST(({v}) AS DOUBLE) AS value FROM ({s2})"


def interpolate(df):
    """Linear interpolation across NULL gaps (graphite interpolate):
    a gap between known neighbors (t0,v0)..(t1,v1) fills with the
    line through them; leading/trailing gaps stay NULL.

    Two window passes (prev-known, next-known), both partitioned by
    name — no extra shuffle beyond the per-series hash."""
    run_b = _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run_f = _w().rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev_v = F.last(VALUE, ignorenulls=True).over(run_b)
    prev_t = F.last(
        F.when(F.col(VALUE).isNotNull(), F.col(T)), ignorenulls=True
    ).over(run_b)
    next_v = F.first(VALUE, ignorenulls=True).over(run_f)
    next_t = F.first(
        F.when(F.col(VALUE).isNotNull(), F.col(T)), ignorenulls=True
    ).over(run_f)
    frac = (F.col(T) - prev_t).cast("double") / (next_t - prev_t).cast("double")
    filled = F.when(F.col(VALUE).isNotNull(), F.col(VALUE)).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull() & (next_t > prev_t),
            prev_v + (next_v - prev_v) * frac,
        )
    )
    return _relabel(df, "interpolate(%s)", value=filled)


def interpolate_sql(base):
    run_b = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    run_f = "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    w = "PARTITION BY name ORDER BY t"
    inner = (
        "SELECT name, t, value, "
        f"LAST_VALUE(value IGNORE NULLS) OVER ({w} {run_b}) AS prev_v, "
        f"LAST_VALUE(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS) OVER ({w} {run_b}) AS prev_t, "
        f"FIRST_VALUE(value IGNORE NULLS) OVER ({w} {run_f}) AS next_v, "
        f"FIRST_VALUE(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS) OVER ({w} {run_f}) AS next_t "
        f"FROM ({base})"
    )
    v = (
        "CASE WHEN value IS NOT NULL THEN value "
        "WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t > prev_t "
        "THEN prev_v + (next_v - prev_v) * (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)) END"
    )
    return (
        f"SELECT printf('interpolate(%s)', name) AS name, t, "
        f"CAST(({v}) AS DOUBLE) AS value FROM ({inner})"
    )


def changed(df):  # 1 when value differs from previous point (funcs.go dslChanged)
    prev = F.lag(VALUE).over(_w())
    v = F.when(
        prev.isNotNull() & F.col(VALUE).isNotNull() & (F.col(VALUE) != prev), 1.0
    ).otherwise(0.0)
    return _relabel(df, "changed(%s)", value=v)


def changed_sql(base):
    prev = "LAG(value) OVER (PARTITION BY name ORDER BY t)"
    return _map_sql(
        base,
        "changed(%s)",
        f"CASE WHEN ({prev}) IS NOT NULL AND value IS NOT NULL AND value <> ({prev}) THEN 1.0 ELSE 0.0 END",
    )


def time_shift(df, shift_s: int):
    """Shift series forward in time by shift_s seconds (funcs.go
    dslTimeShift: data from the past shown at present timestamps)."""
    return df.select(
        F.format_string(f'timeShift(%s,"{shift_s}s")', F.col(NAME)).alias(NAME),
        (F.col(T) + int(shift_s)).alias(T),
        F.col(VALUE),
    )


def time_shift_sql(base, shift_s: int):
    return (
        f"SELECT printf('timeShift(%s,\"{shift_s}s\")', name) AS name, "
        f"t + {int(shift_s)} AS t, value FROM ({base})"
    )


def offset_to_zero(df):  # subtract per-series min (funcs.go dslOffsetToZero)
    v = F.col(VALUE) - F.min(VALUE).over(_wall())
    return _relabel(df, "offsetToZero(%s)", value=v)


def offset_to_zero_sql(base):
    return _map_sql(
        base, "offsetToZero(%s)", "value - MIN(value) OVER (PARTITION BY name)"
    )


def scale_to_seconds(df, seconds: int, step: int):
    """value * seconds/step — normalize per-step rates (dslScaleToSeconds)."""
    f = float(seconds) / float(step)
    return _relabel(df, f"scaleToSeconds(%s,{seconds})", value=F.col(VALUE) * f)


def scale_to_seconds_sql(base, seconds: int, step: int):
    f = float(seconds) / float(step)
    return _map_sql(base, f"scaleToSeconds(%s,{seconds})", f"value * {f!r}")


# --- re-bucketing ----------------------------------------------------------

def summarize(df, interval_s: int, func: str = "sum"):
    """Re-bucket to interval_s with sum/avg/max/min/last (dslSummarize).
    Buckets are end-labeled like consolidate()."""
    from .consolidate import consolidate

    out = consolidate(df, interval_s, cf="last" if func == "last" else func)
    return out.select(
        F.format_string(f'summarize(%s,"{interval_s}s","{func}")', F.col(NAME)).alias(NAME),
        F.col(T),
        F.col(VALUE),
    )


def summarize_sql(base, interval_s: int, func: str = "sum"):
    from .consolidate import oracle_consolidate_sql

    inner = oracle_consolidate_sql(base, interval_s, func)
    return (
        f"SELECT printf('summarize(%s,\"{interval_s}s\",\"{func}\")', name) AS name, "
        f"t, value FROM ({inner})"
    )


def hitcount(df, interval_s: int, step: int):
    """sum(value)*step per bucket — converts a rate back to a count over
    the bucket (dslHitcount)."""
    from .consolidate import consolidate

    out = consolidate(df, interval_s, cf="sum")
    return out.select(
        F.format_string(f'hitcount(%s,"{interval_s}s")', F.col(NAME)).alias(NAME),
        F.col(T),
        (F.col(VALUE) * float(step)).alias(VALUE),
    )


def hitcount_sql(base, interval_s: int, step: int):
    from .consolidate import oracle_consolidate_sql

    inner = oracle_consolidate_sql(base, interval_s, "sum")
    return (
        f"SELECT printf('hitcount(%s,\"{interval_s}s\")', name) AS name, t, "
        f"value * {float(step)!r} AS value FROM ({inner})"
    )


def time_stack(df, period_s: int, begin: int, num: int, t_to: int, ispec: str):
    """timeStack (funcs.go dslTimeStack, dslCtxFuncs table): for each
    i in [begin, num], the source series over
    (t_to-(i+1)·period, t_to-i·period] shifted FORWARD by i·period so
    every slice aligns to the request window's end — the
    compare-with-previous-N-periods function. Output names follow the
    reference exactly: ``timeShift(<name>, -<ispec>, <i>)``.

    One scan: the shift index explodes JVM-side (num-begin+1 rows per
    point, ≤ ~8 in practice) and each row keeps or drops itself by its
    own slice predicate — no per-period re-fetch (the reference
    fetches the wide range once per i; relationally the explode IS
    that loop)."""
    p = int(period_s)
    d = df.select(
        NAME, T, VALUE,
        F.explode(F.sequence(F.lit(int(begin)), F.lit(int(num)))).alias("i"),
    )
    hi = F.lit(int(t_to)) - F.col("i") * p
    return (
        d.where((F.col(T) > hi - p) & (F.col(T) <= hi))
        .select(
            F.concat(
                F.lit("timeShift("), F.col(NAME), F.lit(f", -{ispec}, "),
                F.col("i").cast("string"), F.lit(")"),
            ).alias(NAME),
            (F.col(T) + F.col("i") * p).cast("bigint").alias(T),
            F.col(VALUE),
        )
    )


def time_stack_sql(base, period_s: int, begin: int, num: int, t_to: int, ispec: str):
    p = int(period_s)
    return (
        f"SELECT 'timeShift(' || name || ', -{ispec}, ' || CAST(i AS VARCHAR) || ')' AS name, "
        f"CAST(t + i * {p} AS BIGINT) AS t, value FROM ("
        f"SELECT name, t, value, UNNEST(range({int(begin)}, {int(num) + 1})) AS i "
        f"FROM ({base})) "
        f"WHERE t > {int(t_to)} - (i + 1) * {p} AND t <= {int(t_to)} - i * {p}"
    )
