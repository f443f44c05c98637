"""Mergeable histogram quantiles — the at-scale percentile pattern.

The reference computes timer percentiles by sorting each flush
window's raw samples (aggregator/aggregator.go timer stats) — exact,
but only viable because flush windows are small. At 100 TB a
percentile over an unbounded group (a day of one metric, a whole
corpus column) cannot sort raw values; the standard answer is a
mergeable histogram sketch: bucket counts combine associatively, so
partial aggregation happens map-side, shuffles carry one row per
(group, bucket), and quantiles read off the cumulative distribution.

This implementation is DELIBERATELY deterministic end-to-end, unlike
t-digest (merge-order-dependent centroids) or KLL/GK (randomized or
rank-range answers): fixed-width bins use only exact double ops
(floor of a division by a power-of-two width), counts are exact
int64, and the quantile rule — smallest bin whose cumulative count
reaches ceil(q·n) — is pure integer arithmetic. The same query in
DuckDB is bit-identical, so the sketch is oracle-checkable, and any
partitioning of the input yields the same sketch (merge = +).

Accuracy is the bin width (the returned value is the bin's lower
edge); callers pick the width for their value range. Memory is
range/width buckets per group — for bounded metrics (latencies,
scores, rates) a few thousand rows per group, shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    width: float = 0.5,
) -> DataFrame:
    """(group, q, est, n): est = lower edge of the first bin whose
    cumulative count reaches ceil(q*n). ``width`` should be a
    power-of-two multiple so value/width is exact double math."""
    bin_ = F.floor(F.col(value_col) / float(width))
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"), bin_.alias("b"))
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("g").orderBy("b")
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("g"))
    )
    # ONE aggregation answers every quantile (a per-q union would
    # re-derive the whole histogram lineage per q): for each q, the
    # smallest bin whose cumulative count reaches ceil(q·n), as a
    # conditional min; unpivot after. ceil(q·n) is exact arithmetic
    # (q is a small literal, n an exact int).
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(float(q)) * F.col("n")),
                F.col("b"),
            )
        ).alias(f"qb_{i}")
        for i, q in enumerate(qs)
    ]
    wide = cum.groupBy("g", "n").agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(q)).alias("q"),
                    (F.col(f"qb_{i}") * float(width)).alias("est"),
                )
                for i, q in enumerate(qs)
            ]
        )
    )
    return wide.select(
        F.col("g").alias(group_col), pairs.alias("qe"), F.col("n")
    ).select(
        group_col, F.col("qe.q").alias("q"), F.col("qe.est").alias("est"), "n"
    )


def histogram_quantiles_sql(
    base: str,
    group_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    width: float = 0.5,
) -> str:
    """DuckDB twin — identical binning, cumulative, and pick rules."""
    hist = (
        f"SELECT {group_col} AS g, FLOOR({value_col} / {width!r}) AS b, "
        f"COUNT(*) AS c FROM ({base}) WHERE {value_col} IS NOT NULL "
        "GROUP BY 1, 2"
    )
    cum = (
        "SELECT g, b, c, "
        "SUM(c) OVER (PARTITION BY g ORDER BY b "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        "SUM(c) OVER (PARTITION BY g) AS n "
        f"FROM ({hist})"
    )
    parts = []
    for q in qs:
        parts.append(
            f"SELECT g AS {group_col}, {float(q)!r} AS q, "
            f"CAST(MIN(b) * {width!r} AS DOUBLE) AS est, CAST(n AS BIGINT) AS n "
            f"FROM ({cum}) WHERE cum >= CEIL({float(q)!r} * n) GROUP BY g, n"
        )
    return " UNION ALL ".join(parts)
