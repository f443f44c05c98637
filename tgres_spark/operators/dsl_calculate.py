"""Graphite DSL calculate functions — moving windows + per-series stats.

Reference: dsl/funcs.go movingAverage/movingMedian/stdev (point-count
windows, funcs.go:167-188,1690+) and nPercentile (funcs.go:1436).

Moving windows are point-count based (the reference's duration windows
reduce to point counts on a fixed-step RRA). Spark: window partitioned
by name ordered by t with a rowsBetween frame — per-series, no
cross-series shuffle, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE, dec6, micro6
from .dsl_combine import _quantile_agg, _quantile_agg_sql
from .dsl_transform import _map_sql, _relabel

def _frame(points: int):
    return (
        Window.partitionBy(NAME)
        .orderBy(T)
        .rowsBetween(-(int(points) - 1), Window.currentRow)
    )


def _frame_sql(points: int) -> str:
    return (
        f"OVER (PARTITION BY name ORDER BY t "
        f"ROWS BETWEEN {int(points) - 1} PRECEDING AND CURRENT ROW)"
    )


def moving_average(df, points: int):
    v = F.sum(micro6(F.col(VALUE))).over(_frame(points)).cast(
        "double"
    ) / 1000000.0 / F.count(VALUE).over(_frame(points))
    v = F.when(F.count(VALUE).over(_frame(points)) > 0, v)
    return _relabel(df, f"movingAverage(%s,{points})", value=v)


def moving_average_sql(base, points: int):
    fr = _frame_sql(points)
    v = (
        f"CASE WHEN COUNT(value) {fr} > 0 THEN "
        f"CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) {fr} AS DOUBLE) / 1000000.0 / COUNT(value) {fr} END"
    )
    return _map_sql(base, f"movingAverage(%s,{points})", v)


def moving_sum(df, points: int):
    v = (
        F.sum(micro6(F.col(VALUE))).over(_frame(points)).cast("double")
        / 1000000.0
    )
    return _relabel(df, f"movingSum(%s,{points})", value=v)


def moving_sum_sql(base, points: int):
    fr = _frame_sql(points)
    return _map_sql(
        base, f"movingSum(%s,{points})",
        f"CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) {fr} AS DOUBLE) / 1000000.0",
    )


def moving_min(df, points: int):
    return _relabel(
        df, f"movingMin(%s,{points})", value=F.min(VALUE).over(_frame(points))
    )


def moving_min_sql(base, points: int):
    return _map_sql(base, f"movingMin(%s,{points})", f"MIN(value) {_frame_sql(points)}")


def moving_max(df, points: int):
    return _relabel(
        df, f"movingMax(%s,{points})", value=F.max(VALUE).over(_frame(points))
    )


def moving_max_sql(base, points: int):
    return _map_sql(base, f"movingMax(%s,{points})", f"MAX(value) {_frame_sql(points)}")


def moving_median(df, points: int):
    """Median over the trailing window via sorted collect (the quantile
    method is the reference's go-metrics Quantile at p=0.5)."""
    arr = F.array_sort(
        F.collect_list(VALUE).over(_frame(points))
    )
    v = _quantile_from_sorted(arr, 0.5)
    return _relabel(df, f"movingMedian(%s,{points})", value=v)


def moving_median_sql(base, points: int):
    fr = _frame_sql(points)
    # DuckDB's list() keeps NULLs (Spark's collect_list drops them):
    # strip them post-window with list_filter before sorting.
    arr = f"list_sort(list_filter(list(value) {fr}, x -> x IS NOT NULL))"
    v = _quantile_from_sorted_sql(arr, 0.5)
    return _map_sql(base, f"movingMedian(%s,{points})", v)


def moving_stdev(df, points: int):
    """Trailing population stddev (dslMovingStdDev). sqrt(E[x²]−E[x]²)
    in exact decimal so both engines agree bit-for-bit."""
    fr = _frame(points)
    cnt = F.count(VALUE).over(fr)
    ex2 = F.sum(dec6((F.col(VALUE) * F.col(VALUE)))).over(fr).cast(
        "double"
    ) / cnt
    ex = F.sum(micro6(F.col(VALUE))).over(fr).cast("double") / 1000000.0 / cnt
    var = ex2 - ex * ex
    v = F.when(cnt > 0, F.sqrt(F.when(var > 0.0, var).otherwise(0.0)))
    return _relabel(df, f"stdev(%s,{points})", value=v)


def moving_stdev_sql(base, points: int):
    fr = _frame_sql(points)
    cnt = f"COUNT(value) {fr}"
    ex2 = f"CAST(SUM(CAST(FLOOR((value * value) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) {fr} AS DOUBLE) / ({cnt})"
    ex = f"CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) {fr} AS DOUBLE) / 1000000.0 / ({cnt})"
    var = f"({ex2}) - ({ex}) * ({ex})"
    v = (
        f"CASE WHEN ({cnt}) > 0 THEN "
        f"SQRT(CASE WHEN ({var}) > 0.0 THEN ({var}) ELSE 0.0 END) END"
    )
    return _map_sql(base, f"stdev(%s,{points})", v)


def _quantile_from_sorted(arr, p: float):
    n = F.size(arr)
    pos = F.lit(float(p)) * (n + 1).cast("double")
    lower = F.element_at(arr, F.floor(pos).cast("int"))
    upper = F.element_at(arr, (F.floor(pos) + 1).cast("int"))
    interp = lower + (pos - F.floor(pos)) * (upper - lower)
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.when(pos < 1.0, F.element_at(arr, 1)).otherwise(
            F.when(pos >= n.cast("double"), F.element_at(arr, n)).otherwise(interp)
        )
    )


def _quantile_from_sorted_sql(arr: str, p: float) -> str:
    n = f"len({arr})"
    pos = f"{float(p)!r} * ({n} + 1)"
    lower = f"{arr}[CAST(FLOOR({pos}) AS BIGINT)]"
    upper = f"{arr}[CAST(FLOOR({pos}) AS BIGINT) + 1]"
    interp = f"({lower}) + (({pos}) - FLOOR({pos})) * (({upper}) - ({lower}))"
    return (
        f"CASE WHEN {n} = 0 THEN NULL "
        f"WHEN ({pos}) < 1.0 THEN {arr}[1] "
        f"WHEN ({pos}) >= {n} THEN {arr}[{n}] "
        f"ELSE {interp} END"
    )


def n_percentile(df, p: float):
    """Every point replaced by the series' p-th percentile — a flat
    line per series (dslNPercentile)."""
    # round(6): the linear interpolation is a*b+c shaped — compilers
    # may fuse it (FMA) differently per engine, so full precision is
    # not portable for long series
    thr = df.groupBy(NAME).agg(
        F.round(_quantile_agg(p / 100.0), 6).alias("thr")
    )
    j = df.join(F.broadcast(thr), NAME, "left")
    return j.select(
        F.format_string(f"nPercentile(%s,{p:g})", F.col(NAME)).alias(NAME),
        F.col(T),
        F.col("thr").cast("double").alias(VALUE),
    )


def n_percentile_sql(base, p: float):
    q = f"ROUND({_quantile_agg_sql(p / 100.0)}, 6)"
    thr = f"SELECT name, {q} AS thr FROM ({base}) GROUP BY name"
    return (
        f"SELECT printf('nPercentile(%s,{p:g})', b.name) AS name, b.t AS t, "
        f"CAST(s.thr AS DOUBLE) AS value "
        f"FROM ({base}) b LEFT JOIN ({thr}) s ON b.name = s.name"
    )


def stddev_series(df, label="stddevSeries()"):
    """Cross-series population stddev at each t (Graphite stddevSeries),
    exact-decimal E[x²]−E[x]² form."""
    from .dsl_combine import _combine

    cnt = F.count(VALUE)
    ex2 = F.sum(dec6((F.col(VALUE) * F.col(VALUE)))).cast("double") / cnt
    ex = F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0 / cnt
    var = ex2 - ex * ex
    agg = F.when(cnt > 0, F.sqrt(F.when(var > 0.0, var).otherwise(0.0)))
    return _combine(df, label, agg)


def stddev_series_sql(base, label="stddevSeries()"):
    from .dsl_combine import _combine_sql

    cnt = "COUNT(value)"
    ex2 = f"CAST(SUM(CAST(FLOOR((value * value) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) AS DOUBLE) / ({cnt})"
    ex = f"CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / ({cnt})"
    var = f"({ex2}) - ({ex}) * ({ex})"
    agg = (
        f"CASE WHEN ({cnt}) > 0 THEN "
        f"SQRT(CASE WHEN ({var}) > 0.0 THEN ({var}) ELSE 0.0 END) END"
    )
    return _combine_sql(base, label, agg)


def anomaly_zscore(df, points: int = 24, k: float = 2.0):
    """(name, t, value, zscore, is_anomaly): trailing z-score anomaly
    detection — each point scored against the mean/stddev of the
    ``points`` values strictly BEFORE it (the current point never
    contaminates its own baseline). Flag when |z| > k and the baseline
    window is full. The alerting companion to the HW aberration ops:
    same per-series Window shape (partitioned by name, no cross-series
    shuffle, whole-stage codegen), micro6/dec6 sums so the score is
    cross-engine exact."""
    fr = (
        Window.partitionBy(NAME)
        .orderBy(T)
        .rowsBetween(-int(points), -1)
    )
    cnt = F.count(VALUE).over(fr)
    ex2 = F.sum(dec6(F.col(VALUE) * F.col(VALUE))).over(fr).cast("double") / cnt
    ex = F.sum(micro6(F.col(VALUE))).over(fr).cast("double") / 1000000.0 / cnt
    var = ex2 - ex * ex
    sd = F.when(var > 0.0, F.sqrt(var)).otherwise(F.lit(0.0))
    z = F.when((cnt >= int(points)) & (sd > 0.0), (F.col(VALUE) - ex) / sd)
    return df.select(
        NAME,
        T,
        VALUE,
        z.alias("zscore"),
        F.coalesce(F.abs(z) > float(k), F.lit(False)).alias("is_anomaly"),
    )


def anomaly_zscore_sql(base, points: int = 24, k: float = 2.0) -> str:
    fr = (
        f"OVER (PARTITION BY name ORDER BY t "
        f"ROWS BETWEEN {int(points)} PRECEDING AND 1 PRECEDING)"
    )
    cnt = f"COUNT(value) {fr}"
    ex2 = (
        f"CAST(SUM(CAST(FLOOR((value * value) * 1000000.0 + 0.5) / 1000000.0 "
        f"AS DECIMAL(38,6))) {fr} AS DOUBLE) / ({cnt})"
    )
    ex = (
        f"CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) {fr} "
        f"AS DOUBLE) / 1000000.0 / ({cnt})"
    )
    return f"""
WITH b AS ({base}),
s1 AS (SELECT name, t, value, {cnt} AS cnt, {ex} AS ex, {ex2} AS ex2 FROM b),
s2 AS (SELECT *, CASE WHEN ex2 - ex * ex > 0.0 THEN SQRT(ex2 - ex * ex)
                      ELSE 0.0 END AS sd FROM s1),
s3 AS (SELECT name, t, value, ex, sd, cnt FROM s2)
SELECT name, t, value,
       CASE WHEN cnt >= {int(points)} AND sd > 0.0
            THEN (value - ex) / sd END AS zscore,
       COALESCE(ABS(CASE WHEN cnt >= {int(points)} AND sd > 0.0
                         THEN (value - ex) / sd END) > {float(k)!r}, FALSE)
         AS is_anomaly
FROM s3
"""
