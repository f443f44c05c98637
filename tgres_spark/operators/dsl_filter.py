"""Graphite DSL filter/sort functions — keep or rank whole series.

Reference: dsl/funcs.go FILTER block (funcs.go:298-323).

Spark shape: compute one tiny per-series aggregate (avg/max/min/last),
then broadcast-semi-join the winners back onto the SeriesFrame. The
big side streams through unchanged; the per-series stats relation is
a few rows per series name. All rank functions break metric ties by
name so Spark and DuckDB pick the same winners.

"current" = the series' value at its latest known timestamp
(reference SeriesSlice.CurrentValue on the last fetched point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE, dec6, micro6


def _stat(df: DataFrame, stat: str) -> DataFrame:
    """Per-series scalar: avg | max | min | current | total | stddev."""
    if stat == "avg":
        agg = F.sum(micro6(F.col(VALUE))).cast(
            "double"
        ) / 1000000.0 / F.count(VALUE)
    elif stat == "max":
        agg = F.max(VALUE)
    elif stat == "min":
        agg = F.min(VALUE)
    elif stat == "total":
        agg = F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0
    elif stat == "current":
        agg = F.max_by(VALUE, F.when(F.col(VALUE).isNotNull(), F.col(T)))
    elif stat == "stddev":
        agg = F.stddev_pop(VALUE)
    else:
        raise ValueError(stat)
    return df.groupBy(NAME).agg(agg.alias("stat"))


def _stat_sql(base: str, stat: str) -> str:
    if stat == "avg":
        agg = "CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(value)"
    elif stat == "max":
        agg = "MAX(value)"
    elif stat == "min":
        agg = "MIN(value)"
    elif stat == "total":
        agg = "CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0"
    elif stat == "current":
        agg = "MAX_BY(value, CASE WHEN value IS NOT NULL THEN t END)"
    elif stat == "stddev":
        agg = "STDDEV_POP(value)"
    else:
        raise ValueError(stat)
    return f"SELECT name, {agg} AS stat FROM ({base}) GROUP BY name"


def _keep(df: DataFrame, names: DataFrame) -> DataFrame:
    return df.join(F.broadcast(names.select(NAME)), NAME, "left_semi")


def filter_by_stat(df, stat: str, op: str, n: float) -> DataFrame:
    """maximumAbove/minimumBelow/averageAbove/currentBelow... family."""
    s = _stat(df, stat)
    cond = {
        ">": F.col("stat") > float(n),
        "<": F.col("stat") < float(n),
        ">=": F.col("stat") >= float(n),
        "<=": F.col("stat") <= float(n),
    }[op]
    return _keep(df, s.where(cond))


def filter_by_stat_sql(base, stat: str, op: str, n: float) -> str:
    s = _stat_sql(base, stat)
    return (
        f"SELECT b.* FROM ({base}) b WHERE b.name IN "
        f"(SELECT name FROM ({s}) WHERE stat {op} {float(n)!r})"
    )


def rank_series(df, stat: str, n: int, highest: bool) -> DataFrame:
    """highestCurrent/highestMax/lowestAverage... family: keep n series
    by stat; ties broken by name ascending (deterministic both engines).

    orderBy().limit(n) compiles to TakeOrderedAndProject — a
    distributed partial top-k per partition then a driver merge of n
    rows. An unpartitioned row_number() window would drag every
    series' stat row into one partition (fatal at millions of series).
    """
    s = _stat(df, stat)
    order = (
        [F.col("stat").desc_nulls_last(), F.col(NAME).asc()]
        if highest
        else [F.col("stat").asc_nulls_last(), F.col(NAME).asc()]
    )
    winners = s.orderBy(*order).limit(int(n))
    return _keep(df, winners)


def rank_series_sql(base, stat: str, n: int, highest: bool) -> str:
    s = _stat_sql(base, stat)
    direction = "DESC" if highest else "ASC"
    return (
        f"SELECT b.* FROM ({base}) b WHERE b.name IN ("
        f"SELECT name FROM (SELECT name, ROW_NUMBER() OVER "
        f"(ORDER BY stat {direction} NULLS LAST, name ASC) AS rn FROM ({s})) "
        f"WHERE rn <= {int(n)})"
    )


def limit_series(df, n: int) -> DataFrame:
    """First n series by name order (dslLimit operates on the sorted
    map). Distributed top-k, not a single-partition window."""
    names = df.select(NAME).distinct()
    return _keep(df, names.orderBy(F.col(NAME).asc()).limit(int(n)))


def limit_series_sql(base, n: int) -> str:
    return (
        f"SELECT b.* FROM ({base}) b WHERE b.name IN ("
        f"SELECT name FROM (SELECT DISTINCT name FROM ({base})) "
        f"ORDER BY name ASC LIMIT {int(n)})"
    )


def exclude(df, pattern: str) -> DataFrame:
    """Drop series whose name matches the regex (dslExclude)."""
    return df.where(~F.col(NAME).rlike(pattern))


def exclude_sql(base, pattern: str) -> str:
    return f"SELECT * FROM ({base}) WHERE NOT regexp_matches(name, '{pattern}')"


def grep(df, pattern: str) -> DataFrame:
    """Keep series whose name matches the regex (Graphite grep)."""
    return df.where(F.col(NAME).rlike(pattern))


def grep_sql(base, pattern: str) -> str:
    return f"SELECT * FROM ({base}) WHERE regexp_matches(name, '{pattern}')"


def most_deviant(df, n: int) -> DataFrame:
    """n series with the highest population variance (dslMostDeviant).
    Variance computed as E[x²]−E[x]² in exact decimal in both engines —
    stddev_pop's internal algorithm differs between engines."""
    ex2 = F.sum(dec6((F.col(VALUE) * F.col(VALUE)))).cast("double") / F.count(VALUE)
    ex = F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0 / F.count(VALUE)
    s = df.groupBy(NAME).agg((ex2 - ex * ex).alias("stat"))
    winners = s.orderBy(
        F.col("stat").desc_nulls_last(), F.col(NAME).asc()
    ).limit(int(n))
    return _keep(df, winners)


def most_deviant_sql(base, n: int) -> str:
    ex2 = "CAST(SUM(CAST(FLOOR((value * value) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)"
    ex = "CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(value)"
    s = f"SELECT name, ({ex2}) - ({ex}) * ({ex}) AS stat FROM ({base}) GROUP BY name"
    return (
        f"SELECT b.* FROM ({base}) b WHERE b.name IN ("
        f"SELECT name FROM (SELECT name, ROW_NUMBER() OVER "
        f"(ORDER BY stat DESC NULLS LAST, name ASC) AS rn FROM ({s})) "
        f"WHERE rn <= {int(n)})"
    )


def use_series_above(df, n: float, search: str, replace: str) -> DataFrame:
    """Keep series with max > n, then sub(search→replace) in the name
    (dslUseSeriesAbove re-fetches the renamed series; we rename)."""
    kept = filter_by_stat(df, "max", ">", n)
    return kept.withColumn(NAME, F.regexp_replace(NAME, search, replace))


def use_series_above_sql(base, n: float, search: str, replace: str) -> str:
    inner = filter_by_stat_sql(base, "max", ">", n)
    return (
        f"SELECT regexp_replace(name, '{search}', '{replace}') AS name, t, value "
        f"FROM ({inner})"
    )


def remove_percentile(df, p: float, above: bool) -> DataFrame:
    """Null out points above/below the series' p-th percentile
    (dslRemoveAbovePercentile / dslRemoveBelowPercentile)."""
    from pyspark.sql import Window

    from .dsl_combine import _quantile_agg

    thr = df.groupBy(NAME).agg(_quantile_agg(p / 100.0).alias("thr"))
    j = df.join(F.broadcast(thr), NAME, "left")
    keep = F.col(VALUE) <= F.col("thr") if above else F.col(VALUE) >= F.col("thr")
    fname = "removeAbovePercentile" if above else "removeBelowPercentile"
    _ = Window
    return j.select(
        F.format_string(f"{fname}(%s,{p:g})", F.col(NAME)).alias(NAME),
        F.col(T),
        F.when(keep, F.col(VALUE)).cast("double").alias(VALUE),
    )


def remove_percentile_sql(base, p: float, above: bool) -> str:
    from .dsl_combine import _quantile_agg_sql

    q = _quantile_agg_sql(p / 100.0)
    thr = f"SELECT name, {q} AS thr FROM ({base}) GROUP BY name"
    cmp_ = "value <= thr" if above else "value >= thr"
    fname = "removeAbovePercentile" if above else "removeBelowPercentile"
    return (
        f"SELECT printf('{fname}(%s,{p:g})', b.name) AS name, b.t AS t, "
        f"CAST(CASE WHEN {cmp_} THEN value END AS DOUBLE) AS value "
        f"FROM ({base}) b LEFT JOIN ({thr}) s ON b.name = s.name"
    )
