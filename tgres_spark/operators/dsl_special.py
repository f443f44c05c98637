"""Graphite DSL special functions — aliasing, generated series, sorts.

Reference: dsl/funcs.go SPECIAL block + dsl/aliasseries.go.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE


def alias(df, new_name: str) -> DataFrame:
    return df.select(
        F.lit(new_name).alias(NAME), F.col(T), F.col(VALUE)
    )


def alias_sql(base, new_name: str) -> str:
    return f"SELECT '{new_name}' AS name, t, value FROM ({base})"


def alias_by_metric(df) -> DataFrame:
    """Last dot-component of the name (dslAliasByMetric)."""
    parts = F.split(F.col(NAME), r"\.")
    return df.select(
        F.element_at(parts, F.size(parts)).alias(NAME), F.col(T), F.col(VALUE)
    )


def alias_by_metric_sql(base) -> str:
    return (
        "SELECT string_split(name, '.')[len(string_split(name, '.'))] AS name, "
        f"t, value FROM ({base})"
    )


def alias_by_node(df, *nodes: int) -> DataFrame:
    """Join the given dot-components (dslAliasByNode)."""
    parts = F.split(F.col(NAME), r"\.")
    comps = [F.element_at(parts, n + 1) for n in nodes]
    return df.select(
        F.concat_ws(".", *comps).alias(NAME), F.col(T), F.col(VALUE)
    )


def alias_by_node_sql(base, *nodes: int) -> str:
    comps = " || '.' || ".join(
        f"string_split(name, '.')[{n + 1}]" for n in nodes
    )
    return f"SELECT {comps} AS name, t, value FROM ({base})"


def _java_replacement(replace: str) -> str:
    """Graphite backref syntax → Java. Graphite writes group refs as
    \\1 (dslAliasSub, funcs.go:995-1005 — the reference's own TODO
    converts them to Go's $1); Java's Matcher wants $N and treats a
    bare $ as special, so literal dollars are escaped first."""
    import re as _re

    out = _re.sub(r"\$", r"\\$", replace)
    return _re.sub(r"\\(\d+)", r"$\1", out)


def alias_sub(df, search: str, replace: str) -> DataFrame:
    """Regex substitution on names (dslAliasSub), including \\1-style
    group backreferences. The Graphite form is canonical; it converts
    to $N for Spark (Java) while the oracle passes it through to
    DuckDB (RE2), whose native syntax already IS \\N."""
    return df.select(
        F.regexp_replace(NAME, search, _java_replacement(replace)).alias(NAME),
        F.col(T),
        F.col(VALUE),
    )


def alias_sub_sql(base, search: str, replace: str) -> str:
    return (
        f"SELECT regexp_replace(name, '{search}', '{replace}') AS name, t, value "
        f"FROM ({base})"
    )


def constant_line(spark: SparkSession, value: float, t0: int, t1: int, step: int) -> DataFrame:
    """A flat series over [t0, t1] (dslConstantLine). Generated with
    sequence() — no driver-side loop, scales to any range."""
    return spark.range(1).select(
        F.explode(F.sequence(F.lit(t0), F.lit(t1), F.lit(step))).alias(T)
    ).select(
        F.lit(f"constantLine({value:g})").alias(NAME),
        F.col(T).cast("bigint"),
        F.lit(float(value)).alias(VALUE),
    )


def constant_line_sql(value: float, t0: int, t1: int, step: int) -> str:
    return (
        f"SELECT 'constantLine({value:g})' AS name, CAST(r AS BIGINT) AS t, "
        f"CAST({float(value)!r} AS DOUBLE) AS value "
        f"FROM range({t0}, {t1 + 1}, {step}) AS _(r)"
    )


def _distributed_rank(s, order) -> DataFrame:
    """Total-order rank WITHOUT a single-partition window: range-
    partition on the sort keys, row_number within each partition, then
    add each partition's cumulative predecessor count. The only global
    window runs over the per-partition counts — #shuffle-partitions
    rows, bounded by cluster width, not by series count. Ranks are
    invariant to where the (sampled) range boundaries land because the
    order is total (name tiebreak)."""
    from pyspark.sql import Window

    part = s.repartitionByRange(*order).withColumn(
        "pid", F.spark_partition_id()
    )
    local = part.withColumn(
        "lrank",
        F.row_number().over(Window.partitionBy("pid").orderBy(*order)),
    )
    wcum = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("pid")
        .count()
        .withColumn("offset", F.coalesce(F.sum("count").over(wcum), F.lit(0)))
        .select("pid", "offset")
    )
    return local.join(F.broadcast(offsets), "pid").select(
        NAME, (F.col("lrank") + F.col("offset")).cast("int").alias("rank")
    )


def sort_by(df, stat: str, ascending: bool = False) -> DataFrame:
    """sortByTotal/sortByMaxima/sortByMinima/sortByName: deterministic
    series ordering surfaced as a rank prefix (a relation has no row
    order; the rank materializes the reference's sort for comparison).
    Ranking is distributed (see _distributed_rank) — at 10M+ series
    the stats relation never funnels through one partition."""
    from .dsl_filter import _stat

    if stat == "name":
        s = df.select(NAME).distinct().withColumn("stat", F.lit(0.0))
    else:
        s = _stat(df, stat)
    order = (
        [F.col("stat").asc_nulls_last(), F.col(NAME).asc()]
        if ascending
        else [F.col("stat").desc_nulls_last(), F.col(NAME).asc()]
    )
    if stat == "name":
        order = [F.col(NAME).asc()]
    ranked = _distributed_rank(s, order)
    return (
        df.join(F.broadcast(ranked), NAME)
        .select(
            F.format_string("%d:%s", F.col("rank"), F.col(NAME)).alias(NAME),
            F.col(T),
            F.col(VALUE),
        )
    )


def sort_by_sql(base, stat: str, ascending: bool = False) -> str:
    from .dsl_filter import _stat_sql

    if stat == "name":
        s = f"SELECT DISTINCT name, 0.0 AS stat FROM ({base})"
        order = "name ASC"
    else:
        s = _stat_sql(base, stat)
        direction = "ASC" if ascending else "DESC"
        order = f"stat {direction} NULLS LAST, name ASC"
    ranked = f"SELECT name, ROW_NUMBER() OVER (ORDER BY {order}) AS rank FROM ({s})"
    return (
        f"SELECT printf('%d:%s', r.rank, b.name) AS name, b.t AS t, b.value AS value "
        f"FROM ({base}) b JOIN ({ranked}) r ON b.name = r.name"
    )


def sinusoid(spark: SparkSession, amplitude: float, t0: int, t1: int, step: int) -> DataFrame:
    """sin over wall-clock (dslSinusoid). round(9) absorbs the ulp-level
    libm sin differences between engines (SURVEY §6)."""
    return spark.range(1).select(
        F.explode(F.sequence(F.lit(t0), F.lit(t1), F.lit(step))).alias(T)
    ).select(
        F.lit(f"sinusoid({amplitude:g})").alias(NAME),
        F.col(T).cast("bigint"),
        F.round(
            F.lit(float(amplitude)) * F.sin(F.col(T).cast("double") / 3600.0), 9
        ).alias(VALUE),
    )


def sinusoid_sql(amplitude: float, t0: int, t1: int, step: int) -> str:
    return (
        f"SELECT 'sinusoid({amplitude:g})' AS name, CAST(r AS BIGINT) AS t, "
        f"ROUND({float(amplitude)!r} * SIN(CAST(r AS DOUBLE) / 3600.0), 9) AS value "
        f"FROM range({t0}, {t1 + 1}, {step}) AS _(r)"
    )


def random_walk(spark: SparkSession, name: str, t0: int, t1: int, step: int) -> DataFrame:
    """Deterministic pseudo-random walk (dslRandomWalk uses rand; we
    derive increments from md5(t) so runs are reproducible AND
    cross-engine: the increment is the ascii-sum of the first 4 hex
    chars scaled to [-0.5, 0.5)-ish, exact in both engines; the
    cumulative sum runs in t-order so the FP sequence is identical."""
    from pyspark.sql import Window

    ts = spark.range(1).select(
        F.explode(F.sequence(F.lit(t0), F.lit(t1), F.lit(step))).alias(T)
    )
    h = F.md5(F.col(T).cast("string"))
    asum = sum(
        (F.ascii(F.substring(h, i + 1, 1)) for i in range(1, 4)),
        F.ascii(F.substring(h, 1, 1)),
    )
    inc = asum.cast("double") / 408.0 - 0.5  # ascii sums span ~[192, 408]
    stepped = ts.select(F.col(T).cast("bigint").alias(T), inc.alias("inc"))
    w = Window.orderBy(T).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return stepped.select(
        F.lit(name).alias(NAME),
        F.col(T),
        F.sum("inc").over(w).alias(VALUE),
    )


def random_walk_sql(name: str, t0: int, t1: int, step: int) -> str:
    h = "md5(CAST(r AS VARCHAR))"
    asum = " + ".join(f"ascii(substr({h}, {i}, 1))" for i in range(1, 5))
    return (
        f"SELECT '{name}' AS name, CAST(r AS BIGINT) AS t, "
        f"SUM(CAST(({asum}) AS DOUBLE) / 408.0 - 0.5) OVER "
        f"(ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value "
        f"FROM range({t0}, {t1 + 1}, {step}) AS _(r)"
    )


def cacti_style(df) -> DataFrame:
    """Append "Current/Max/Min" stats to each series name
    (funcs.go:329 marks cactiStyle TODO "should be easy" — it is):
    one broadcast join of the tiny per-series stats relation."""
    from .dsl_filter import _stat

    cur = _stat(df, "current").withColumnRenamed("stat", "cur")
    mx = _stat(df, "max").withColumnRenamed("stat", "mx")
    mn = _stat(df, "min").withColumnRenamed("stat", "mn")
    stats = cur.join(mx, NAME).join(mn, NAME)
    j = df.join(F.broadcast(stats), NAME)
    # round BEFORE formatting: Java %.2f rounds half-up, C printf
    # half-even — pre-rounded values format identically
    label = F.format_string(
        "%s Current:%.2f Max:%.2f Min:%.2f",
        F.col(NAME), F.round("cur", 2), F.round("mx", 2), F.round("mn", 2),
    )
    return j.select(label.alias(NAME), F.col(T), F.col(VALUE))


def cacti_style_sql(base) -> str:
    from .dsl_filter import _stat_sql

    cur = _stat_sql(base, "current").replace(" AS stat", " AS cur", 1)
    mx = _stat_sql(base, "max").replace(" AS stat", " AS mx", 1)
    mn = _stat_sql(base, "min").replace(" AS stat", " AS mn", 1)
    return (
        "SELECT printf('%s Current:%.2f Max:%.2f Min:%.2f', b.name, ROUND(s.cur, 2), ROUND(s.mx, 2), ROUND(s.mn, 2)) AS name, "
        "b.t AS t, b.value AS value "
        f"FROM ({base}) b "
        f"JOIN (SELECT c.name, c.cur, x.mx, n.mn FROM ({cur}) c "
        f"JOIN ({mx}) x ON c.name = x.name JOIN ({mn}) n ON c.name = n.name) s "
        "ON b.name = s.name"
    )


def substr_name(df, start: int, stop: int = 0) -> "DataFrame":
    """graphite substr(seriesList, start, stop): rename each series
    to dot-components [start:stop) (python slice semantics; stop=0
    means to the end). Data unchanged; pure name algebra in-row.
    The last `--`-marked SPECIAL name in the reference's comment
    inventory (dsl/funcs.go)."""
    parts = F.split(F.col(NAME), r"\.")
    if stop and stop > 0:
        length = F.lit(int(stop) - int(start))
    else:
        length = F.size(parts) - int(start)
    return df.select(
        F.array_join(F.slice(parts, int(start) + 1, length), ".").alias(NAME),
        F.col(T),
        F.col(VALUE),
    )


def substr_name_sql(base, start: int, stop: int = 0) -> str:
    parts = "string_split(name, '.')"
    hi = str(int(stop)) if stop and stop > 0 else f"len({parts})"
    return (
        f"SELECT array_to_string({parts}[{int(start) + 1} : {hi}], '.') "
        f"AS name, t, value FROM ({base})"
    )
