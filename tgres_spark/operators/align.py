"""Series alignment: mixed-step series → common resolution.

Reference semantics:

- ``SeriesSlice.Align()`` (series/seriesslice.go:155-171): before any
  cross-series combine, every series is re-grouped to the LCM of all
  the steps in the slice, so datapoint timestamps line up.
- ``RRASeries.Next()`` (series/rra_series.go:73-118): grouping walks
  ``moves = round(groupBy/step)`` consecutive slots and emits their
  NaN-skipping average; a partial tail group (advance fails mid-group)
  is DISCARDED, not emitted. The same path implements render-time
  ``maxDataPoints`` (rra_series.go:167-178: groupBy = (to-from)/maxPoints).

Spark shape: alignment to an exact multiple of the source step is a
pure time-bucket re-aggregation — one groupBy((name, bucket)), no
window. maxDataPoints grouping is positional over the DENSE slot grid
(an RRA has every slot, known or NaN), so the grid is generated with
``sequence()`` per series (bounded: (to-from)/step rows) and grouped by
integer slot index — still one shuffle, map-side combinable.

Determinism: the group average accumulates micro6 BIGINT micro-units
(model.micro6) and divides once after the double cast — identical IEEE
op order in DuckDB's HUGEINT mirror.
"""

from __future__ import annotations

from math import gcd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE, micro6
from .consolidate import slot_end

_MAVG = (
    "CASE WHEN COUNT({v}) > 0 THEN "
    "CAST(SUM(CAST(FLOOR(({v}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
    "/ 1000000.0 / COUNT({v}) END"
)


def align_to(df: DataFrame, to_step: int) -> DataFrame:
    """Re-group a consolidated SeriesFrame to ``to_step`` (an exact
    multiple of its step) with the reference's NaN-skipping average
    (rra_series.go:104-117 sum/cnt). Missing slots and NULL slots
    contribute identically (nothing), so the sparse frame needs no
    densification here — grouping is by time bucket, not position."""
    avg = F.when(
        F.count(VALUE) > 0,
        F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0 / F.count(VALUE),
    )
    return (
        df.groupBy(NAME, slot_end(to_step).alias("b"))
        .agg(avg.alias(VALUE))
        .select(NAME, F.col("b").alias(T), VALUE)
    )


def align_to_sql(base: str, to_step: int) -> str:
    bucket = f"CAST(FLOOR((t - 1) / {to_step}) * {to_step} + {to_step} AS BIGINT)"
    return (
        f"SELECT name, {bucket} AS t, {_MAVG.format(v='value')} AS value "
        f"FROM ({base}) GROUP BY name, {bucket}"
    )


def lcm_step(*steps: int) -> int:
    """seriesslice.go:138-148 lcm over every step in the slice."""
    out = steps[0]
    for s in steps[1:]:
        out = out * s // gcd(out, s)
    return out


def align_lcm(frames: list[tuple[DataFrame, int]]) -> DataFrame:
    """``SeriesSlice.Align()``: every frame re-grouped to the LCM of
    all steps, unioned back into one mixed SeriesFrame ready for any
    cross-series combine."""
    lcm = lcm_step(*[s for _, s in frames])
    out = None
    for df, step in frames:
        a = df if step == lcm else align_to(df, lcm)
        out = a if out is None else out.unionAll(a)
    return out


def align_lcm_sql(bases: list[tuple[str, int]]) -> str:
    lcm = lcm_step(*[s for _, s in bases])
    parts = [
        base if step == lcm else align_to_sql(base, lcm)
        for base, step in bases
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def maxpoints_group(
    df: DataFrame,
    from_t: int,
    to_t: int,
    max_points: int,
    step: int,
) -> DataFrame:
    """Render-time maxDataPoints grouping (rra_series.go:73-118,167-178).

    groupBy = (to-from)/maxPoints (integer seconds — Go duration
    division truncates); moves = round(groupBy/step); the dense slot
    grid from ``from_t`` is walked in groups of ``moves`` consecutive
    slots, each emitting the NaN-skip average labeled by its last
    slot's end time. A partial tail group is dropped (Next() returns
    false when advance() fails mid-group). Positional grouping needs
    the DENSE grid — a consolidated frame only has slots with data —
    so the grid is generated per series and values left-joined in.
    """
    group_by = (to_t - from_t) // max_points
    moves = int(group_by / step + 0.5)
    if moves <= 1:
        return df.where((F.col(T) > from_t) & (F.col(T) <= to_t))
    names = df.select(NAME).distinct()
    grid = names.select(
        NAME,
        F.explode(
            F.sequence(
                F.lit(from_t + step), F.lit(to_t), F.lit(step)
            ).cast("array<bigint>")
        ).alias(T),
    )
    dense = grid.join(df, [NAME, T], "left")
    # pure integer slot index / group id — DIV in both engines, no
    # double division (Spark CAST(double→bigint) truncates, DuckDB's
    # rounds; integer DIV sidesteps the divergence entirely)
    grp = F.expr(f"((t - {from_t} - {step}) DIV {step}) DIV {moves}")
    avg = F.when(
        F.count(VALUE) > 0,
        F.sum(micro6(F.col(VALUE))).cast("double") / 1000000.0 / F.count(VALUE),
    )
    return (
        dense.groupBy(NAME, grp.alias("g"))
        .agg(F.max(T).alias(T), avg.alias(VALUE), F.count("*").alias("n"))
        .where(F.col("n") == moves)
        .select(NAME, T, VALUE)
    )


def maxpoints_group_sql(
    base: str, from_t: int, to_t: int, max_points: int, step: int
) -> str:
    group_by = (to_t - from_t) // max_points
    moves = int(group_by / step + 0.5)
    if moves <= 1:
        return f"SELECT * FROM ({base}) WHERE t > {from_t} AND t <= {to_t}"
    grid = (
        f"SELECT n.name, g.t FROM (SELECT DISTINCT name FROM ({base})) n "
        f"CROSS JOIN (SELECT CAST(unnest(generate_series({from_t + step}, {to_t}, {step})) AS BIGINT) AS t) g"
    )
    dense = (
        f"SELECT g.name, g.t, b.value FROM ({grid}) g "
        f"LEFT JOIN ({base}) b ON g.name = b.name AND g.t = b.t"
    )
    return (
        f"SELECT name, MAX(t) AS t, {_MAVG.format(v='value')} AS value "
        f"FROM ({dense}) "
        f"GROUP BY name, ((t - {from_t} - {step}) // {step}) // {moves} "
        f"HAVING COUNT(*) = {moves}"
    )


def seasonal_decompose(
    series: DataFrame, step: int = 3600, period: int = 24
) -> DataFrame:
    """Classical additive seasonal decomposition (trend + seasonal +
    residual) of each series — the closed-form cousin of the
    Holt-Winters family (reference series/holtwinters.go fits the
    same three components recursively; this is the non-recursive
    textbook estimator, so unlike the HW fit it needs NO iteration
    and carries a full oracle):

    - slot means to ``step`` resolution (micro6, like align_to);
    - trend = centered (period+1)-point moving average, emitted only
      where the window is FULL (the classical edge rule, and the
      deterministic one — partial windows would make edge values
      depend on how much history the scan saw);
    - seasonal = per-(series, phase) mean of the detrended values,
      phase = slot-index mod period;
    - residual = detrended − seasonal (the anomaly input).

    Determinism: slot means quantize back to micro6 BIGINT before the
    window sum (exact sliding sums — double window sums are
    frame-order-dependent inside DuckDB's segment tree), one double
    division chain (/1e6/(period+1)) in the same order as the oracle,
    seasonal means micro6 again. Scale: one groupBy(name, slot), one
    per-name window, one groupBy(name, phase) — all co-keyed on the
    series name, same single-partitioning as every per-series
    transform. Returns (name, t, value, trend, seasonal, resid)."""
    from ..model import micro6

    half = period // 2
    win = period + 1
    slot = (F.col(T) - (F.col(T) % step)).alias(T)
    slots = (
        series.select(NAME, slot, F.col(VALUE).alias("v"))
        .groupBy(NAME, T)
        .agg(
            (
                F.sum(micro6(F.col("v"))).cast("double")
                / 1000000.0
                / F.count("v")
            ).alias(VALUE)
        )
    )
    w = Window.partitionBy(NAME).orderBy(T).rowsBetween(-half, half)
    trend = F.when(
        F.count(VALUE).over(w) == win,
        F.sum(micro6(F.col(VALUE))).over(w).cast("double") / 1000000.0 / win,
    )
    d = slots.select(
        NAME, T, VALUE, trend.alias("trend"),
        ((F.col(T) / step).cast("bigint") % period).alias("phase"),
    ).withColumn("detr", F.col(VALUE) - F.col("trend"))
    seas = (
        d.groupBy(NAME, "phase")
        .agg(
            F.when(
                F.count("detr") > 0,
                F.sum(micro6(F.col("detr"))).cast("double")
                / 1000000.0
                / F.count("detr"),
            ).alias("seasonal")
        )
    )
    return (
        d.join(seas, [NAME, "phase"])
        .select(
            NAME, T, VALUE, "trend",
            F.col("seasonal"),
            (F.col("detr") - F.col("seasonal")).alias("resid"),
        )
    )


def seasonal_decompose_sql(
    base: str, step: int = 3600, period: int = 24
) -> str:
    from ..model import micro6_sql

    half = period // 2
    win = period + 1
    m6 = micro6_sql("v")
    return (
        f"WITH src AS ({base}), "
        "slots AS (SELECT name, t - (t % "
        f"{step}) AS t, "
        f"CAST(SUM({m6}) AS DOUBLE) / 1000000.0 / COUNT(v) AS value "
        f"FROM (SELECT name, t, value AS v FROM src) GROUP BY 1, 2), "
        "tr AS (SELECT name, t, value, "
        "CASE WHEN COUNT(value) OVER w = "
        f"{win} THEN CAST(SUM({micro6_sql('value')}) OVER w AS DOUBLE) "
        f"/ 1000000.0 / {win} END AS trend, "
        f"CAST(t // {step} AS BIGINT) % {period} AS phase "
        "FROM slots WINDOW w AS (PARTITION BY name ORDER BY t "
        f"ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)), "
        "d AS (SELECT *, value - trend AS detr FROM tr), "
        "seas AS (SELECT name, phase, "
        "CASE WHEN COUNT(detr) > 0 THEN "
        f"CAST(SUM({micro6_sql('detr')}) AS DOUBLE) / 1000000.0 / COUNT(detr) "
        "END AS seasonal FROM d GROUP BY name, phase) "
        "SELECT d.name, t, value, trend, seasonal, detr - seasonal AS resid "
        "FROM d JOIN seas ON d.name = seas.name AND d.phase = seas.phase"
    )


def series_correlate(
    series: DataFrame, query_name: str, step: int = 3600, k: int = 10
) -> DataFrame:
    """(name, n_slots, corr): the k series most Pearson-correlated
    with ``query_name`` over their common time slots — the "what
    moved with the error rate?" scan, the cross-series counterpart of
    mostDeviant's within-series ranking. Both series consolidate to
    ``step`` slot means first, so mixed-rate series compare fairly.

    Determinism: slot means are micro6; the five moment sums quantize
    per-slot products to DECIMAL(38,6) (product-of-two-user-values
    rule), cast to double before each /n in oracle order; IEEE sqrt of
    the single variance product; zero-variance guarded by CASE; NULL
    correlations filtered before the rank so both engines order the
    same set. Scale: one groupBy(name, slot), the query series
    re-enters as a BROADCAST join on the slot key, one groupBy(name)
    of six exact accumulators, TakeOrderedAndProject top-k — the scan
    cost is one pass over the consolidated frame however many series
    exist."""
    from ..model import dec6, micro6

    slot = (F.col(T) - (F.col(T) % step)).alias(T)
    slots = (
        series.select(NAME, slot, F.col(VALUE).alias("v"))
        .groupBy(NAME, T)
        .agg(
            (
                F.sum(micro6(F.col("v"))).cast("double")
                / 1000000.0
                / F.count("v")
            ).alias("x")
        )
    )
    q = slots.where(F.col(NAME) == query_name).select(
        F.col(T), F.col("x").alias("y")
    )
    j = slots.where(F.col(NAME) != query_name).join(F.broadcast(q), T)
    m = j.groupBy(NAME).agg(
        F.count("*").alias("n"),
        (F.sum(micro6(F.col("x"))).cast("double") / 1000000.0).alias("sx"),
        (F.sum(micro6(F.col("y"))).cast("double") / 1000000.0).alias("sy"),
        F.sum(dec6(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec6(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec6(F.col("y") * F.col("y"))).alias("syy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    cov = F.col("sxy").cast("double") / F.col("n") - mx * my
    vx = F.col("sxx").cast("double") / F.col("n") - mx * mx
    vy = F.col("syy").cast("double") / F.col("n") - my * my
    corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return (
        m.select(
            NAME,
            F.col("n").cast("bigint").alias("n_slots"),
            corr.alias("corr"),
        )
        .where(F.col("corr").isNotNull())
        .orderBy(F.col("corr").desc(), F.col(NAME).asc())
        .limit(k)
    )


def series_correlate_sql(
    base: str, query_name: str, step: int = 3600, k: int = 10
) -> str:
    from ..model import dec6_sql, micro6_sql

    return (
        f"WITH src AS ({base}), "
        f"slots AS (SELECT name, t - (t % {step}) AS t, "
        f"CAST(SUM({micro6_sql('v')}) AS DOUBLE) / 1000000.0 / COUNT(v) AS x "
        "FROM (SELECT name, t, value AS v FROM src) GROUP BY 1, 2), "
        f"q AS (SELECT t, x AS y FROM slots WHERE name = '{query_name}'), "
        "m AS (SELECT name, COUNT(*) AS n, "
        f"CAST(SUM({micro6_sql('x')}) AS DOUBLE) / 1000000.0 AS sx, "
        f"CAST(SUM({micro6_sql('y')}) AS DOUBLE) / 1000000.0 AS sy, "
        f"SUM({dec6_sql('x * y')}) AS sxy, "
        f"SUM({dec6_sql('x * x')}) AS sxx, "
        f"SUM({dec6_sql('y * y')}) AS syy "
        f"FROM slots JOIN q USING (t) WHERE name <> '{query_name}' "
        "GROUP BY name), "
        "c AS (SELECT name, CAST(n AS BIGINT) AS n_slots, "
        "CASE WHEN CAST(sxx AS DOUBLE) / n - (sx / n) * (sx / n) > 0 "
        "AND CAST(syy AS DOUBLE) / n - (sy / n) * (sy / n) > 0 "
        "THEN (CAST(sxy AS DOUBLE) / n - (sx / n) * (sy / n)) "
        "/ SQRT((CAST(sxx AS DOUBLE) / n - (sx / n) * (sx / n)) "
        "* (CAST(syy AS DOUBLE) / n - (sy / n) * (sy / n))) END AS corr "
        "FROM m) "
        "SELECT name, n_slots, corr FROM c WHERE corr IS NOT NULL "
        f"ORDER BY corr DESC, name ASC LIMIT {k}"
    )


def series_xcorr(
    series: DataFrame,
    query_name: str,
    step: int = 3600,
    max_lag: int = 3,
) -> DataFrame:
    """(name, best_lag, corr, n_slots): for each series, the lag
    ∈ [-max_lag, +max_lag] (in steps) at which it best correlates
    with ``query_name`` — lead/lag attribution ("errors FOLLOW deploys
    by 2 hours"), the natural extension of series_correlate. Positive
    lag = the series LEADS the query (its value at t aligns with the
    query at t+lag·step).

    Plan: the query slots are shifted once per lag (tiny relation —
    2·max_lag+1 broadcast copies), unioned, and ONE groupBy
    (name, lag) computes the same six exact accumulators as
    series_correlate; the per-name argmax is a window over ≤
    (2·max_lag+1) rows per series. Tie rule: higher corr, then
    smaller |lag|, then lag ascending — pinned identically in both
    engines. Same determinism rules as series_correlate."""
    from ..model import dec6, micro6

    slot = (F.col(T) - (F.col(T) % step)).alias(T)
    slots = (
        series.select(NAME, slot, F.col(VALUE).alias("v"))
        .groupBy(NAME, T)
        .agg(
            (
                F.sum(micro6(F.col("v"))).cast("double")
                / 1000000.0
                / F.count("v")
            ).alias("x")
        )
    )
    qbase = slots.where(F.col(NAME) == query_name)
    shifted = None
    for lag in range(-max_lag, max_lag + 1):
        s = qbase.select(
            (F.col(T) - lag * step).alias(T),
            F.col("x").alias("y"),
            F.lit(lag).alias("lag"),
        )
        shifted = s if shifted is None else shifted.unionByName(s)
    j = slots.where(F.col(NAME) != query_name).join(
        F.broadcast(shifted), T
    )
    m = j.groupBy(NAME, "lag").agg(
        F.count("*").alias("n"),
        (F.sum(micro6(F.col("x"))).cast("double") / 1000000.0).alias("sx"),
        (F.sum(micro6(F.col("y"))).cast("double") / 1000000.0).alias("sy"),
        F.sum(dec6(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec6(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec6(F.col("y") * F.col("y"))).alias("syy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    cov = F.col("sxy").cast("double") / F.col("n") - mx * my
    vx = F.col("sxx").cast("double") / F.col("n") - mx * mx
    vy = F.col("syy").cast("double") / F.col("n") - my * my
    corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    c = m.select(
        NAME,
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_slots"),
        corr.alias("corr"),
    ).where(F.col("corr").isNotNull())
    w = Window.partitionBy(NAME).orderBy(
        F.col("corr").desc(), F.abs("lag").asc(), F.col("lag").asc()
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(NAME, F.col("lag").alias("best_lag"), "corr", "n_slots")
    )


def series_xcorr_sql(
    base: str, query_name: str, step: int = 3600, max_lag: int = 3
) -> str:
    from ..model import dec6_sql, micro6_sql

    shifts = " UNION ALL ".join(
        f"SELECT t - ({lag}) * {step} AS t, x AS y, {lag} AS lag "
        f"FROM slots WHERE name = '{query_name}'"
        for lag in range(-max_lag, max_lag + 1)
    )
    return (
        f"WITH src AS ({base}), "
        f"slots AS (SELECT name, t - (t % {step}) AS t, "
        f"CAST(SUM({micro6_sql('v')}) AS DOUBLE) / 1000000.0 / COUNT(v) AS x "
        "FROM (SELECT name, t, value AS v FROM src) GROUP BY 1, 2), "
        f"q AS ({shifts}), "
        "m AS (SELECT name, lag, COUNT(*) AS n, "
        f"CAST(SUM({micro6_sql('x')}) AS DOUBLE) / 1000000.0 AS sx, "
        f"CAST(SUM({micro6_sql('y')}) AS DOUBLE) / 1000000.0 AS sy, "
        f"SUM({dec6_sql('x * y')}) AS sxy, "
        f"SUM({dec6_sql('x * x')}) AS sxx, "
        f"SUM({dec6_sql('y * y')}) AS syy "
        f"FROM slots JOIN q USING (t) WHERE name <> '{query_name}' "
        "GROUP BY name, lag), "
        "c AS (SELECT name, CAST(lag AS BIGINT) AS lag, "
        "CAST(n AS BIGINT) AS n_slots, "
        "CASE WHEN CAST(sxx AS DOUBLE) / n - (sx / n) * (sx / n) > 0 "
        "AND CAST(syy AS DOUBLE) / n - (sy / n) * (sy / n) > 0 "
        "THEN (CAST(sxy AS DOUBLE) / n - (sx / n) * (sy / n)) "
        "/ SQRT((CAST(sxx AS DOUBLE) / n - (sx / n) * (sx / n)) "
        "* (CAST(syy AS DOUBLE) / n - (sy / n) * (sy / n))) END AS corr "
        "FROM m) "
        "SELECT name, lag AS best_lag, corr, n_slots FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY name "
        "ORDER BY corr DESC, ABS(lag) ASC, lag ASC) AS rk "
        "FROM c WHERE corr IS NOT NULL) WHERE rk = 1"
    )


def series_cusum(
    series: DataFrame,
    step: int = 3600,
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
) -> DataFrame:
    """One-sided CUSUM drift detection per series: the classic control
    chart s_t = max(0, s_{t-1} + (x_t − μ − k)) looks like an
    unavoidable sequential recursion, but it has the prefix-min closed
    form s_t = P_t − min_{0≤j≤t} P_j with P the running sum of
    (x − μ − k) and P_0 = 0 (the empty prefix — so a series whose
    prefix sums are all positive still accumulates from zero rather
    than having s_1 clamped to 0) — the whole detector is TWO running
    windows over
    each series, no iteration, no state (the same restatement trick
    as mix_unimax's water-filling). Alarms where s_t > h·σ-units.

    Determinism: x is the hourly micro6 slot mean; μ is the per-series
    micro6 mean; the per-point term quantizes to micro6 BIGINT so the
    prefix sum and running min are EXACT integers (ties in min are
    valueless — min of ints); the single /1e6 to double happens at
    the end. Returns (name, t, value, cusum, alarm).

    Scale: same one-shuffle-per-series shape as every per-series
    transform — at 10M series this is embarrassing parallelism over
    the name key; the two windows share one sort."""
    from ..model import micro6

    slot = (F.col(T) - (F.col(T) % step)).alias(T)
    slots = (
        series.select(NAME, slot, F.col(VALUE).alias("v"))
        .groupBy(NAME, T)
        .agg(
            (
                F.sum(micro6(F.col("v"))).cast("double")
                / 1000000.0
                / F.count("v")
            ).alias(VALUE)
        )
    )
    mu = slots.groupBy(NAME).agg(
        (
            F.sum(micro6(F.col(VALUE))).cast("double")
            / 1000000.0
            / F.count(VALUE)
        ).alias("mu")
    )
    d = slots.join(F.broadcast(mu), NAME).withColumn(
        "term6", micro6(F.col(VALUE) - F.col("mu") - F.lit(float(drift_k)))
    )
    wrun = (
        Window.partitionBy(NAME)
        .orderBy(T)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = d.withColumn("p6", F.sum("term6").over(wrun))
    # The recursion s_t = max(0, s_{t-1} + q_t) unrolls to
    # P_t − min(P_0..P_t) with P_0 = 0 — the empty prefix participates
    # in the min (otherwise s_1 is forced to 0 and every s_t is
    # under-reported whenever all prefix sums are positive, i.e. a
    # series that starts above μ+k never alarms).
    s = p.withColumn(
        "min6", F.least(F.lit(0).cast("bigint"), F.min("p6").over(wrun))
    ).withColumn(
        "cusum",
        (F.col("p6") - F.col("min6")).cast("double") / 1000000.0,
    )
    return s.select(
        NAME,
        T,
        VALUE,
        "cusum",
        (F.col("cusum") > float(threshold_h)).cast("bigint").alias("alarm"),
    )


def series_cusum_sql(
    base: str,
    step: int = 3600,
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
) -> str:
    from ..model import micro6_sql

    return (
        f"WITH src AS ({base}), "
        f"slots AS (SELECT name, t - (t % {step}) AS t, "
        f"CAST(SUM({micro6_sql('v')}) AS DOUBLE) / 1000000.0 / COUNT(v) AS value "
        "FROM (SELECT name, t, value AS v FROM src) GROUP BY 1, 2), "
        "mu AS (SELECT name, "
        f"CAST(SUM({micro6_sql('value')}) AS DOUBLE) / 1000000.0 / COUNT(value) AS mu "
        "FROM slots GROUP BY name), "
        "d AS (SELECT slots.name AS name, t, value, "
        f"{micro6_sql(f'value - mu - {float(drift_k)!r}')} AS term6 "
        "FROM slots JOIN mu ON slots.name = mu.name), "
        "p AS (SELECT *, CAST(SUM(term6) OVER w AS BIGINT) AS p6 FROM d "
        "WINDOW w AS (PARTITION BY name ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "s AS (SELECT *, CAST(LEAST(0, MIN(p6) OVER w) AS BIGINT) AS min6 FROM p "
        "WINDOW w AS (PARTITION BY name ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
        "SELECT name, t, value, "
        "CAST(p6 - min6 AS DOUBLE) / 1000000.0 AS cusum, "
        f"CAST(CAST(p6 - min6 AS DOUBLE) / 1000000.0 > {float(threshold_h)!r} AS BIGINT) AS alarm "
        "FROM s"
    )


def series_trend_slope(
    series: DataFrame, step: int = 3600, k: int = 10
) -> DataFrame:
    """(name, n_slots, slope): OLS trend slope per series in
    value-units per step, top-k fastest-growing first — the capacity
    question ("which metric grows fastest?") as one exact aggregate.

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with x = the series' slot
    index from ITS OWN first slot (small ints — using raw epoch
    seconds squares to ~3e18 per term and overflows even 128-bit
    sums' comfort zone) and y in micro6 units: the moment sums
    accumulate DECIMAL(38,0) on the Spark side and HUGEINT (int128)
    in the oracle — exact integers with ~1e38 headroom, so long
    series with large values (x~1e5, y6~1e10) can't overflow-throw
    under ANSI; the two casts to double and one division happen last
    in oracle order, then one /1e6 returns to value units. Scale: one
    groupBy(name, slot), a min-slot broadcast-back join, one groupBy
    of four integer accumulators, TakeOrderedAndProject."""
    from ..model import micro6

    slot = (F.col(T) - (F.col(T) % step)).alias(T)
    slots = (
        series.select(NAME, slot, F.col(VALUE).alias("v"))
        .groupBy(NAME, T)
        .agg(
            (
                F.sum(micro6(F.col("v"))).cast("double")
                / 1000000.0
                / F.count("v")
            ).alias(VALUE)
        )
    )
    t0 = slots.groupBy(NAME).agg(F.min(T).alias("t0"))
    d = slots.join(t0, NAME).select(
        NAME,
        ((F.col(T) - F.col("t0")) / step).cast("bigint").alias("x"),
        micro6(F.col(VALUE)).alias("y6"),
    )
    # Accumulate the moment sums in DECIMAL(38,0) (DuckDB twin:
    # HUGEINT): with int64, sum(x*y6) overflows near 1e5 slots at
    # values ~1e4 (x ~1e5, y6 ~1e10 → per-term 1e15, summed 1e19+) and
    # ANSI mode turns that into a runtime throw, not a wrong slope.
    # Both forms are exact integers, and an exact integer casts to
    # double identically in both engines, so the hash contract holds.
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y6").cast("decimal(38,0)")
    m = d.groupBy(NAME).agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        F.col("den") != 0,
        F.col("num").cast("double") / F.col("den").cast("double") / 1000000.0,
    )
    return (
        m.withColumn("num", num)
        .withColumn("den", den)
        .select(
            NAME,
            F.col("n").cast("bigint").alias("n_slots"),
            slope.alias("slope"),
        )
        .where(F.col("slope").isNotNull())
        .orderBy(F.col("slope").desc(), F.col(NAME).asc())
        .limit(k)
    )


def series_trend_slope_sql(base: str, step: int = 3600, k: int = 10) -> str:
    from ..model import micro6_sql

    return (
        f"WITH src AS ({base}), "
        f"slots AS (SELECT name, t - (t % {step}) AS t, "
        f"CAST(SUM({micro6_sql('v')}) AS DOUBLE) / 1000000.0 / COUNT(v) AS value "
        "FROM (SELECT name, t, value AS v FROM src) GROUP BY 1, 2), "
        "t0 AS (SELECT name, MIN(t) AS t0 FROM slots GROUP BY name), "
        "d AS (SELECT slots.name AS name, "
        f"CAST((t - t0) // {step} AS BIGINT) AS x, "
        f"{micro6_sql('value')} AS y6 "
        "FROM slots JOIN t0 ON slots.name = t0.name), "
        "m AS (SELECT name, CAST(COUNT(*) AS HUGEINT) AS n, "
        "SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y6 AS HUGEINT)) AS sy, "
        "SUM(CAST(x AS HUGEINT) * y6) AS sxy, "
        "SUM(CAST(x AS HUGEINT) * x) AS sxx FROM d GROUP BY name) "
        "SELECT name, CAST(n AS BIGINT) AS n_slots, "
        "CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE) / 1000000.0 AS slope "
        "FROM m WHERE n * sxx - sx * sx <> 0 "
        f"ORDER BY slope DESC, name ASC LIMIT {k}"
    )
