"""Graphite DSL combine functions — collapse many series into one.

Reference: dsl/funcs.go COMBINE block + series/seriesslice.go
(Sum/Avg/Max/Min/Prod/Quantile/Range/Diff over the per-timestamp
"current values" of the aligned slice).

Spark shape: one `groupBy(t)` over the aligned SeriesFrame — a single
shuffle on t, partial aggregation map-side. Null values are ignored
(a NaN contributes nothing in the reference); a timestamp with no
known values yields NULL.

Determinism: sums/avgs accumulate micro6 BIGINT micro-units (exact
int64 — see model.micro6 for the bound); products fold a
sorted array so both engines multiply in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE, dec6, micro6


def _combine(df: DataFrame, out_name: str, agg: Column) -> DataFrame:
    return (
        df.groupBy(T)
        .agg(agg.cast("double").alias(VALUE))
        .select(F.lit(out_name).alias(NAME), F.col(T), F.col(VALUE))
    )


def _combine_sql(base: str, out_name: str, agg: str) -> str:
    return (
        f"SELECT '{out_name}' AS name, t, CAST(({agg}) AS DOUBLE) AS value "
        f"FROM ({base}) GROUP BY t"
    )


def sum_series(df, label="sumSeries()"):
    return _combine(df, label, (F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0))


def sum_series_sql(base, label="sumSeries()"):
    return _combine_sql(base, label, "(CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)")


def average_series(df, label="averageSeries()"):
    agg = F.when(
        F.count(VALUE) > 0,
        (F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0) / F.count(VALUE),
    )
    return _combine(df, label, agg)


def average_series_sql(base, label="averageSeries()"):
    return _combine_sql(
        base,
        label,
        "CASE WHEN COUNT(value) > 0 THEN (CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(value) END",
    )


def min_series(df, label="minSeries()"):
    return _combine(df, label, F.min(VALUE))


def min_series_sql(base, label="minSeries()"):
    return _combine_sql(base, label, "MIN(value)")


def max_series(df, label="maxSeries()"):
    return _combine(df, label, F.max(VALUE))


def max_series_sql(base, label="maxSeries()"):
    return _combine_sql(base, label, "MAX(value)")


def range_of_series(df, label="rangeOfSeries()"):
    return _combine(df, label, F.max(VALUE) - F.min(VALUE))


def range_of_series_sql(base, label="rangeOfSeries()"):
    return _combine_sql(base, label, "MAX(value) - MIN(value)")


def count_series(df, label="countSeries()"):
    # reference counts series present, not known values (dslCountSeries)
    return _combine(df, label, F.count("*").cast("double"))


def count_series_sql(base, label="countSeries()"):
    return _combine_sql(base, label, "CAST(COUNT(*) AS DOUBLE)")


def multiply_series(df, label="multiplySeries()"):
    # sorted fold → identical FP multiply order in Spark and DuckDB
    arr = F.array_sort(F.collect_list(VALUE))
    prod = F.when(
        F.size(arr) > 0,
        F.aggregate(arr, F.lit(1.0), lambda acc, x: acc * x),
    )
    return _combine(df, label, prod)


def multiply_series_sql(base, label="multiplySeries()"):
    agg = (
        "CASE WHEN COUNT(value) > 0 THEN "
        "list_reduce(list_prepend(1.0, list_sort(list(value) FILTER (WHERE value IS NOT NULL))), "
        "(acc, x) -> acc * x) END"
    )
    return _combine_sql(base, label, agg)


def percentile_of_series(df, p: float, label=None):
    """p-th percentile across series at each t, go-metrics method
    (series/seriesslice.go:241-261): pos=p*(n+1), linear interp."""
    label = label or f"percentileOfSeries({p:g})"
    return _combine(df, label, _quantile_agg(p))


def percentile_of_series_sql(base, p: float, label=None):
    label = label or f"percentileOfSeries({p:g})"
    return _combine_sql(base, label, _quantile_agg_sql(p))


def _quantile_agg(p: float) -> Column:
    """go-metrics Quantile over the known values in the group, built
    from a sorted array (deterministic in both engines)."""
    arr = F.array_sort(F.collect_list(VALUE))
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


def _quantile_agg_sql(p: float) -> str:
    arr = "list_sort(list(value) FILTER (WHERE value IS NOT NULL))"
    return (
        "CASE WHEN COUNT(value) = 0 THEN NULL "
        f"WHEN {float(p)!r} * (COUNT(value) + 1) < 1.0 THEN list_min({arr}) "
        f"WHEN {float(p)!r} * (COUNT(value) + 1) >= COUNT(value) THEN list_max({arr}) "
        f"ELSE {arr}[CAST(FLOOR({float(p)!r} * (COUNT(value) + 1)) AS BIGINT)] "
        f"+ ({float(p)!r} * (COUNT(value) + 1) - FLOOR({float(p)!r} * (COUNT(value) + 1))) "
        f"* ({arr}[CAST(FLOOR({float(p)!r} * (COUNT(value) + 1)) AS BIGINT) + 1] "
        f"- {arr}[CAST(FLOOR({float(p)!r} * (COUNT(value) + 1)) AS BIGINT)]) END"
    )


def diff_series(df, label="diffSeries()"):
    """First series minus the sum of the others at each t; 'first' =
    the GLOBAL lexicographically-smallest name (the reference iterates
    a sorted map, seriesslice.go:281-291 Diff). Pivoting on the
    explicit first name (broadcast 1-row agg, no collect) — not
    per-t min_by — so a t where the first series is absent yields
    NULL (the reference's NaN minuend), never a silent promotion of
    the second series to minuend."""
    firstn = df.groupBy().agg(F.min(NAME).alias("__first"))
    j = df.crossJoin(F.broadcast(firstn))
    minuend = F.max(F.when(F.col(NAME) == F.col("__first"), F.col(VALUE)))
    rest = (
        F.sum(
            F.when(
                F.col(NAME) != F.col("__first"),
                micro6(F.col(VALUE)),
            )
        ).cast("double")
        / 1000000.0
    )
    return _combine(j, label, minuend - F.coalesce(rest, F.lit(0.0)))


def diff_series_sql(base, label="diffSeries()"):
    first = f"(SELECT MIN(name) FROM ({base}))"
    agg = (
        f"MAX(CASE WHEN name = {first} THEN value END) - "
        f"COALESCE(CAST(SUM(CASE WHEN name <> {first} "
        "THEN CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT) END) AS DOUBLE) / 1000000.0, 0.0)"
    )
    return _combine_sql(base, label, agg)


def divide_series_pair(dividend, divisor, label="divideSeries()"):
    """dividend/divisor at each t where the sides are SEPARATE frames
    (the expression path: each side is its own glob resolution). A
    'side' tag replaces name-based pivoting, so no driver collect is
    needed to discover series names — the whole thing is one union +
    one groupBy(t). The reference's two-series arity rule
    (funcs.go:642-643 'divideSeries requires two series') is deferred
    into the plan: a per-t distinct-name count > 1 on either side
    raises at execution time."""
    tagged = dividend.select(
        F.lit("n").alias("side"), F.col(NAME), F.col(T), F.col(VALUE)
    ).unionAll(
        divisor.select(
            F.lit("d").alias("side"), F.col(NAME), F.col(T), F.col(VALUE)
        )
    )
    num = F.max(F.when(F.col("side") == "n", F.col(VALUE)))
    den = F.max(F.when(F.col("side") == "d", F.col(VALUE)))
    cnt_n = F.count_distinct(F.when(F.col("side") == "n", F.col(NAME)))
    cnt_d = F.count_distinct(F.when(F.col("side") == "d", F.col(NAME)))
    val = F.when(
        (cnt_n <= 1) & (cnt_d <= 1),
        F.when(den != 0.0, num / den),
    ).otherwise(
        F.raise_error(F.lit("divideSeries requires two series"))
    )
    return (
        tagged.groupBy(T)
        .agg(val.cast("double").alias(VALUE))
        .select(F.lit(label).alias(NAME), F.col(T), F.col(VALUE))
    )


def divide_series_pair_sql(dividend_base, divisor_base, label="divideSeries()"):
    tagged = (
        f"SELECT 'n' AS side, name, t, value FROM ({dividend_base}) "
        f"UNION ALL SELECT 'd' AS side, name, t, value FROM ({divisor_base})"
    )
    num = "MAX(CASE WHEN side = 'n' THEN value END)"
    den = "MAX(CASE WHEN side = 'd' THEN value END)"
    return (
        f"SELECT '{label}' AS name, t, "
        f"CAST(CASE WHEN ({den}) <> 0.0 THEN ({num}) / ({den}) END AS DOUBLE) AS value "
        f"FROM ({tagged}) GROUP BY t"
    )


def divide_series_auto(df, label="divideSeries()"):
    """Single-seriesList form — divideSeries(group(a, b)) — with the
    reference's exactly-two-series rule (dslDivideSeries,
    funcs.go:633-651) enforced IN the plan: a broadcast 1-row name
    agg supplies first/last names and the distinct count; != 2 raises
    at execution time (no driver collect). Dividend = first name in
    sort order (the reference flattens args in order; group preserves
    it and glob resolution is name-sorted)."""
    names = df.groupBy().agg(
        F.min(NAME).alias("__a"),
        F.max(NAME).alias("__b"),
        F.count_distinct(NAME).alias("__n"),
    )
    j = df.crossJoin(F.broadcast(names))
    num = F.max(F.when(F.col(NAME) == F.col("__a"), F.col(VALUE)))
    den = F.max(F.when(F.col(NAME) == F.col("__b"), F.col(VALUE)))
    nn = F.max(F.col("__n"))
    val = F.when(
        nn != 2,
        F.raise_error(
            F.lit("divideSeries requires exactly two series")
        ).cast("double"),
    ).otherwise(F.when(den != 0.0, num / den))
    return _combine(j, label, val)


def divide_series_auto_sql(base, label="divideSeries()"):
    names = (
        f"SELECT MIN(name) AS __a, MAX(name) AS __b, "
        f"COUNT(DISTINCT name) AS __n FROM ({base})"
    )
    num = "MAX(CASE WHEN name = __a THEN value END)"
    den = "MAX(CASE WHEN name = __b THEN value END)"
    val = (
        f"CASE WHEN MAX(__n) <> 2 THEN CAST(error('divideSeries requires exactly two series') AS DOUBLE) "
        f"WHEN ({den}) <> 0.0 THEN ({num}) / ({den}) END"
    )
    return (
        f"SELECT '{label}' AS name, t, CAST(({val}) AS DOUBLE) AS value "
        f"FROM ({base}), ({names}) GROUP BY t"
    )


def divide_series(df, dividend_name: str, divisor_name: str, label=None):
    """dividend/divisor at each t (dslDivideSeries); null divisor-0."""
    label = label or f"divideSeries({dividend_name},{divisor_name})"
    num = F.max(F.when(F.col(NAME) == dividend_name, F.col(VALUE)))
    den = F.max(F.when(F.col(NAME) == divisor_name, F.col(VALUE)))
    agg = F.when(den != 0.0, num / den)
    return _combine(df, label, agg)


def divide_series_sql(base, dividend_name: str, divisor_name: str, label=None):
    label = label or f"divideSeries({dividend_name},{divisor_name})"
    num = f"MAX(CASE WHEN name = '{dividend_name}' THEN value END)"
    den = f"MAX(CASE WHEN name = '{divisor_name}' THEN value END)"
    return _combine_sql(base, label, f"CASE WHEN ({den}) <> 0.0 THEN ({num}) / ({den}) END")


def as_percent(df, total: float | None = None, label_fmt="asPercent(%s)"):
    """Each series as percent of the per-t total (dslAsPercent), or of
    an explicit numeric ``total`` (funcs.go:99-101 argNumberOrSeries —
    the numeric form is a pure per-point map, no window at all)."""
    from pyspark.sql import Window

    if total is not None:
        t_ = float(total)
        v = (
            F.when(F.lit(t_) != 0.0, F.col(VALUE) / F.lit(t_) * 100.0)
            if t_ == 0.0
            else F.col(VALUE) / F.lit(t_) * 100.0
        )
    else:
        tot = (
            F.sum(micro6(F.col(VALUE)))
            .over(Window.partitionBy(T))
            .cast("double")
            / 1000000.0
        )
        v = F.when(tot != 0.0, F.col(VALUE) / tot * 100.0)
    return df.select(
        F.format_string(label_fmt, F.col(NAME)).alias(NAME), F.col(T),
        v.cast("double").alias(VALUE),
    )


def as_percent_sql(base, total: float | None = None, label_fmt="asPercent(%s)"):
    if total is not None:
        t_ = float(total)
        expr = (
            "CAST(NULL AS DOUBLE)"
            if t_ == 0.0
            else f"value / {t_!r} * 100.0"
        )
    else:
        tot = "(CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) OVER (PARTITION BY t) AS DOUBLE) / 1000000.0)"
        expr = f"CASE WHEN ({tot}) <> 0.0 THEN value / ({tot}) * 100.0 END"
    return (
        f"SELECT printf('{label_fmt}', name) AS name, t, "
        f"CAST(({expr}) AS DOUBLE) AS value "
        f"FROM ({base})"
    )


def weighted_average_pair(avg_df, weight_df, node: int = 0,
                          label="weightedAverage()"):
    """Reference dslWeightedAverage (funcs.go:2018-2062): the avg and
    weight series LISTS are separate arguments, paired by dot-node
    ``node`` of each name; keys present on only one side drop out
    (funcs.go:2052-2056 pairs only when the weight exists). Side tags
    replace the suffix convention — works for ANY name layout, unlike
    pairing by a hardcoded '.avg'/'.weight' suffix."""
    key = F.element_at(F.split(F.col(NAME), r"\."), node + 1)
    tagged = avg_df.select(
        F.lit("a").alias("side"), key.alias("k"), F.col(T), F.col(VALUE)
    ).unionAll(
        weight_df.select(
            F.lit("w").alias("side"), key.alias("k"), F.col(T), F.col(VALUE)
        )
    )
    # weightSum counts a key's weight only when its avg side is known
    # at that t — unpaired weight-only keys contribute nothing
    # (funcs.go:2052-2056 pairs a weight only under an avg key).
    # The a*w PRODUCT sum accumulates as DECIMAL(38,6) (dec6), not
    # micro6 int64: a product of two user-scale values can exceed the
    # int64 micro-unit bound (Σ|a·w| < 9.2e12) that plain value sums
    # respect — per the project rule, product/squared sums stay dec6.
    paired_w = F.when(F.col("a").isNotNull(), F.col("w"))
    per_key = (
        tagged.groupBy(T, "k")
        .agg(
            F.max(F.when(F.col("side") == "a", F.col(VALUE))).alias("a"),
            F.max(F.when(F.col("side") == "w", F.col(VALUE))).alias("w"),
        )
        .groupBy(T)
        .agg(
            F.when(
                (F.sum(micro6(paired_w)).cast("double") / 1000000.0) != 0.0,
                F.sum(dec6(F.col("a") * F.col("w"))).cast("double")
                / (F.sum(micro6(paired_w)).cast("double") / 1000000.0),
            ).alias(VALUE)
        )
    )
    return per_key.select(
        F.lit(label).alias(NAME),
        F.col(T),
        F.col(VALUE).cast("double").alias(VALUE),
    )


def weighted_average_pair_sql(avg_base, weight_base, node: int = 0,
                              label="weightedAverage()"):
    k = f"string_split(name, '.')[{node + 1}]"
    tagged = (
        f"SELECT 'a' AS side, {k} AS k, t, value FROM ({avg_base}) "
        f"UNION ALL SELECT 'w' AS side, {k} AS k, t, value FROM ({weight_base})"
    )
    inner = (
        "SELECT t, k, MAX(CASE WHEN side = 'a' THEN value END) AS a, "
        "MAX(CASE WHEN side = 'w' THEN value END) AS w "
        f"FROM ({tagged}) GROUP BY 1, 2"
    )
    sw = "(CAST(SUM(CAST(FLOOR((CASE WHEN a IS NOT NULL THEN w END) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"
    saw = "(CAST(SUM(CAST(FLOOR((a * w) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) AS DOUBLE))"
    return (
        f"SELECT '{label}' AS name, t, "
        f"CAST(CASE WHEN ({sw}) <> 0.0 THEN ({saw}) / ({sw}) END AS DOUBLE) AS value "
        f"FROM ({inner}) GROUP BY t"
    )


def weighted_average(df, avg_suffix: str, weight_suffix: str, node: int = 0):
    """sum(avg_i*weight_i)/sum(weight_i) pairing series by name node
    (dslWeightedAverage). Series named '<key>.<suffix>'."""
    parts = F.split(F.col(NAME), r"\.")
    key = F.element_at(parts, node + 1)
    suffix = F.element_at(parts, F.size(parts))
    avg_v = F.max(F.when(suffix == avg_suffix, F.col(VALUE)))
    wt_v = F.max(F.when(suffix == weight_suffix, F.col(VALUE)))
    per_key = (
        df.groupBy(T, key.alias("k"))
        .agg(avg_v.alias("a"), wt_v.alias("w"))
        .groupBy(T)
        .agg(
            F.when(
                (F.sum(micro6(F.col("w"))).cast("double") / 1000000.0) != 0.0,
                # product sum on dec6 — see weighted_average_pair
                F.sum(dec6(F.col("a") * F.col("w"))).cast("double")
                / (F.sum(micro6(F.col("w"))).cast("double") / 1000000.0),
            ).alias(VALUE)
        )
    )
    return per_key.select(
        F.lit(f"weightedAverage({avg_suffix},{weight_suffix})").alias(NAME),
        F.col(T),
        F.col(VALUE).cast("double").alias(VALUE),
    )


def weighted_average_sql(base, avg_suffix: str, weight_suffix: str, node: int = 0):
    inner = (
        "SELECT t, string_split(name, '.')[{n}] AS k, "
        "MAX(CASE WHEN string_split(name, '.')[len(string_split(name, '.'))] = '{a}' THEN value END) AS a, "
        "MAX(CASE WHEN string_split(name, '.')[len(string_split(name, '.'))] = '{w}' THEN value END) AS w "
        "FROM ({b}) GROUP BY 1, 2"
    ).format(n=node + 1, a=avg_suffix, w=weight_suffix, b=base)
    sw = "(CAST(SUM(CAST(FLOOR((w) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"
    saw = "(CAST(SUM(CAST(FLOOR((a * w) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) AS DOUBLE))"
    return (
        f"SELECT 'weightedAverage({avg_suffix},{weight_suffix})' AS name, t, "
        f"CAST(CASE WHEN ({sw}) <> 0.0 THEN ({saw}) / ({sw}) END AS DOUBLE) AS value "
        f"FROM ({inner}) GROUP BY t"
    )


def group_without_nodes(df, positions: list[int], func: str = "sum"):
    """sumSeriesWithWildcards/averageSeriesWithWildcards semantics:
    REMOVE the given dot-positions from each name and aggregate series
    that collapse to the same remainder (graphite's rule — the
    wildcard position is the one dropped, dslSumSeriesWithWildcards)."""
    parts = F.split(F.col(NAME), r"\.")
    n = F.size(parts)
    keep = F.filter(
        F.transform(parts, lambda x, i: F.struct(x.alias("s"), i.alias("i"))),
        lambda p: ~p["i"].isin([int(x) for x in positions]),
    )
    key = F.array_join(F.transform(keep, lambda p: p["s"]), ".")
    _ = n
    if func == "sum":
        agg = (F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0)
    elif func == "avg":
        agg = F.when(
            F.count(VALUE) > 0,
            (F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0) / F.count(VALUE),
        )
    else:
        raise ValueError(func)
    return (
        df.groupBy(key.alias(NAME), F.col(T))
        .agg(agg.cast("double").alias(VALUE))
        .select(NAME, T, VALUE)
    )


def group_without_nodes_sql(base, positions: list[int], func: str = "sum"):
    parts = "string_split(name, '.')"
    pos = ", ".join(str(int(x) + 1) for x in positions)  # 1-based
    key = (
        f"array_to_string(list_transform(list_filter("
        f"list_transform({parts}, (x, i) -> {{'s': x, 'i': i}}), "
        f"p -> p.i NOT IN ({pos})), p -> p.s), '.')"
    )
    if func == "sum":
        agg = "(CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"
    elif func == "avg":
        agg = "CASE WHEN COUNT(value) > 0 THEN (CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(value) END"
    else:
        raise ValueError(func)
    return (
        f"SELECT {key} AS name, t, CAST({agg} AS DOUBLE) AS value "
        f"FROM ({base}) GROUP BY 1, 2"
    )


def group_by_node(df, node: int, func: str = "sum"):
    """Aggregate series sharing the node-th dot-component (dslGroupByNode)."""
    key = F.element_at(F.split(F.col(NAME), r"\."), node + 1)
    if func == "sum":
        agg = (F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0)
    elif func == "avg":
        agg = F.when(
            F.count(VALUE) > 0,
            ((F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0) / F.count(VALUE)),
        )
    elif func == "max":
        agg = F.max(VALUE)
    elif func == "min":
        agg = F.min(VALUE)
    else:
        raise ValueError(func)
    return (
        df.groupBy(key.alias(NAME), F.col(T))
        .agg(agg.cast("double").alias(VALUE))
        .select(NAME, T, VALUE)
    )


def group_by_node_sql(base, node: int, func: str = "sum"):
    key = f"string_split(name, '.')[{node + 1}]"
    if func == "sum":
        agg = "(CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"
    elif func == "avg":
        agg = "CASE WHEN COUNT(value) > 0 THEN (CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(value) END"
    elif func == "max":
        agg = "MAX(value)"
    elif func == "min":
        agg = "MIN(value)"
    else:
        raise ValueError(func)
    return (
        f"SELECT {key} AS name, t, CAST({agg} AS DOUBLE) AS value "
        f"FROM ({base}) GROUP BY 1, 2"
    )


# --- mapSeries / reduceSeries / stacked (round 10) ---------------------------
# The last three `--`-marked names in the reference's COMBINE comment
# inventory (dsl/funcs.go:259,264 — "returns a list of lists
# (non-standard)" / "relies on mapSeries"). The reference never
# implemented them because its evaluator passes SeriesSlice values;
# the relational model makes them natural: mapSeries's list-of-lists
# is a GROUP KEY COLUMN, and reduceSeries is a pivot per (group, t).


def map_series(df: DataFrame, node: int) -> DataFrame:
    """(grp, name, t, value): graphite mapSeries(seriesList, mapNode)
    — series grouped by the node-th dot-component. Graphite returns a
    list of series lists; relationally that is the same frame with
    the group key materialized as a column (map-only, no shuffle).
    reduceSeries consumes the grouping; standalone it is the
    group-inspection relation."""
    key = F.element_at(F.split(F.col(NAME), r"\."), node + 1)
    return df.select(key.alias("grp"), F.col(NAME), F.col(T), F.col(VALUE))


def map_series_sql(base, node: int) -> str:
    return (
        f"SELECT string_split(name, '.')[{node + 1}] AS grp, "
        f"name, t, value FROM ({base})"
    )


def reduce_series(
    df: DataFrame, fn: str, node: int, m1: str, m2: str
) -> DataFrame:
    """graphite reduceSeries(mapSeries(...), reduceFunction,
    reduceNode, matcher1, matcher2): within each group, the series
    whose reduceNode-th name component equals matcher1 is combined
    with the matcher2 series per timestamp — asPercent / divideSeries
    / diffSeries, the documented two-matcher reducers. Output series
    are named by the group identity (the name with the reduceNode
    component removed), which is what makes the result nestable.

    The mapNode argument of the inner mapSeries is subsumed: grouping
    by "name minus the reduceNode component" is the same partition
    whenever the map/reduce node pair describes a well-formed
    hierarchy (graphite's own examples), without assuming which other
    node is the group key. One shuffle on (group, t); the pivot is
    MAX over at-most-one row per matcher; divisions guarded."""
    parts = F.split(F.col(NAME), r"\.")
    seg = F.element_at(parts, node + 1)
    key = F.array_join(
        F.filter(parts, lambda x, i: i != F.lit(node)), "."
    )
    sel = df.select(
        key.alias(NAME), seg.alias("m"), F.col(T), F.col(VALUE)
    ).where(F.col("m").isin(m1, m2))
    agg = sel.groupBy(NAME, T).agg(
        F.max(F.when(F.col("m") == m1, F.col(VALUE))).alias("a"),
        F.max(F.when(F.col("m") == m2, F.col(VALUE))).alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    if fn == "asPercent":
        v = F.when(b != 0, a / b * 100.0)
    elif fn == "divideSeries":
        v = F.when(b != 0, a / b)
    elif fn == "diffSeries":
        v = a - b
    else:
        raise ValueError(fn)
    return agg.select(NAME, T, v.cast("double").alias(VALUE))


def reduce_series_sql(base, fn: str, node: int, m1: str, m2: str) -> str:
    parts = "string_split(name, '.')"
    key = (
        f"array_to_string(list_transform(list_filter("
        f"list_transform({parts}, (x, i) -> {{'s': x, 'i': i}}), "
        f"p -> p.i <> {node + 1}), p -> p.s), '.')"
    )
    seg = f"{parts}[{node + 1}]"
    if fn == "asPercent":
        v = "CASE WHEN b <> 0 THEN a / b * 100.0 END"
    elif fn == "divideSeries":
        v = "CASE WHEN b <> 0 THEN a / b END"
    elif fn == "diffSeries":
        v = "a - b"
    else:
        raise ValueError(fn)
    return (
        f"SELECT name, t, CAST({v} AS DOUBLE) AS value FROM ("
        f"SELECT {key} AS name, t, "
        f"MAX(CASE WHEN {seg} = '{m1}' THEN value END) AS a, "
        f"MAX(CASE WHEN {seg} = '{m2}' THEN value END) AS b "
        f"FROM ({base}) WHERE {seg} IN ('{m1}', '{m2}') "
        f"GROUP BY 1, 2)"
    )


def stacked_series(df: DataFrame) -> DataFrame:
    """graphite stacked(seriesList): each series becomes the running
    sum of itself and every series BEFORE it (name order) at each
    timestamp — the data transform behind stacked rendering, renamed
    stacked(name) as graphite does when no stackName is given.

    One window partitioned BY TIMESTAMP (partition count = the time
    domain, never single-partition) ordered by name; the prefix sum
    accumulates micro6 BIGINTs so both engines add in exact integer
    arithmetic regardless of their window-sum implementation."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(T)
        .orderBy(NAME)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.sum(micro6(F.col(VALUE))).over(w).cast("double") / 1000000.0
    return df.select(
        F.concat(F.lit("stacked("), F.col(NAME), F.lit(")")).alias(NAME),
        F.col(T),
        v.alias(VALUE),
    )


def stacked_series_sql(base) -> str:
    return (
        "SELECT 'stacked(' || name || ')' AS name, t, "
        "CAST(CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) "
        "OVER (PARTITION BY t ORDER BY name "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        f"/ 1000000.0 AS DOUBLE) AS value FROM ({base})"
    )
