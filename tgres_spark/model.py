"""SeriesFrame: the canonical long-format time-series relation.

The reference (tgres) models a series as a DS with RRAs holding a
round-robin ``map[slot]value`` (rrd/rra.go:68-74). Spark-first, a
series set is ONE long relation::

    name: string   -- series identity (reference serde.Ident "name")
    t:    bigint   -- epoch seconds, end-of-interval label
    value: double  -- NaN/NULL = unknown (reference uses NaN)

Why long format: one partitioning scheme `(date(t), hash(name) % B)`
serves every operator — per-series window functions never shuffle
across series, cross-series combines shuffle only on `t` after
partition pruning. At 100 TB this is the difference between a
map-side-heavy plan and a full-table shuffle.

Columns are BIGINT epochs (not timestamps) end-to-end so results hash
identically across Spark and the DuckDB oracle regardless of timezone
or timestamp-precision handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NAME, T, VALUE = "name", "t", "value"


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The driver hands us ITS session, which lacks our session.py confs;
    # nanos timestamps are unreadable without this (runtime-settable).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def series_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet → SeriesFrame: event_type is the series name.

    Mirrors how tgres receives one datapoint per (ident, time, value)
    (receiver/receiver.go QueueDataPoint) — with one relational twist:
    the reference REJECTS a datapoint whose timestamp is <= the DS's
    lastUpdate (rrd/ds.go updateRange), i.e. at most one point per
    (series, second), ordered by arrival. A relation has no arrival
    order, so same-timestamp points are merged with an exact decimal
    mean instead — deterministic and partition-order-free where
    "keep the first" is not. Without this, every lag()-based pass
    downstream (wmean durations, derivative, heartbeat) is ordered by
    (name, t) with TIES, and Spark and DuckDB break ties differently
    — latent at sf0.01 (3 duplicate pairs), a real divergence at
    sf0.1 (383)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias(NAME),
        epoch_s("ts", ev).alias(T),
        F.col("value").cast("double").alias(VALUE),
    )
    return pts.groupBy(NAME, T).agg(
        (
            F.sum(micro6(F.col(VALUE))).cast("double")
            / 1000000.0
            / F.count(VALUE)
        ).alias(VALUE)
    )


def epoch_s(col: str, df: DataFrame | None = None) -> Column:
    """Time column → epoch seconds bigint.

    The driver regenerates testdata between rounds and the time
    encoding has already changed once (TIMESTAMP(NANOS) → micros
    TIMESTAMP_NTZ broke every events query in round 3), so this
    resolves the actual column type and handles all three parquet
    flavors:

    - bigint (nanosAsLong nanos): exact integer DIV.
    - timestamp_ntz: wall-clock micros since the NTZ epoch via
      ``timestampdiff`` — pure field arithmetic, no timezone anywhere.
      DuckDB's naive TIMESTAMP + ``epoch_ns(ts)//1e9`` computes the
      same wall-clock epoch, so the two engines agree under ANY
      session timezone.  (``to_utc_timestamp``/``unix_micros`` on an
      NTZ input implicitly casts through the session zone — measured
      off by the UTC offset under America/New_York; never use them
      on NTZ.)
    - timestamp (LTZ): instant-based ``unix_micros``, timezone-free
      by construction.

    DIV truncates toward zero (pre-1970 instants would differ from
    DuckDB's floor ``//``); testdata is all post-2020."""
    if df is not None:
        dt = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col]
        if dt == "timestamp_ntz":
            return F.expr(
                f"CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`) "
                "DIV 1000000 AS BIGINT)"
            )
        if dt == "date":
            # calendar-day arithmetic, timezone-free; DuckDB's
            # epoch_ns(DATE) computes the same midnight-UTC epoch
            return F.expr(
                f"CAST(datediff(`{col}`, DATE'1970-01-01') AS BIGINT) * 86400"
            )
        if dt.startswith("timestamp"):
            return F.expr(f"CAST(unix_micros(`{col}`) DIV 1000000 AS BIGINT)")
    return F.expr(f"CAST(`{col}` DIV 1000000000 AS BIGINT)")


# DuckDB-side equivalent of series_from_events, spliced into oracle SQL.
# epoch_ns → bigint nanos; // is exact integer division, matching epoch_s.
EVENTS_SERIES_SQL = (
    "SELECT name, t, CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
    "/ 1000000.0 / COUNT(value) AS value FROM ("
    "SELECT event_type AS name, epoch_ns(ts) // 1000000000 AS t, "
    "CAST(value AS DOUBLE) AS value FROM events) GROUP BY name, t"
)


def sanitize_name(col: Column) -> Column:
    r"""misc.SanitizeName (misc/misc.go:33-37): whitespace runs → '_',
    '/' → '-', strip every other char outside [a-zA-Z_\-0-9.]. Applied
    at every ingest edge the reference sanitizes (graphite text,
    statsd, pixel)."""
    c = F.regexp_replace(col, r"\s+", "_")
    c = F.regexp_replace(c, "/", "-")
    return F.regexp_replace(c, r"[^a-zA-Z_\-0-9.]", "")


def sanitize_name_sql(expr: str) -> str:
    """DuckDB twin of sanitize_name — NOTE the 'g' flag: DuckDB's
    regexp_replace replaces only the first match by default, Spark's
    replaces all."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '\\s+', '_', 'g'), '/', '-', 'g'), "
        r"'[^a-zA-Z_\-0-9.]', '', 'g')"
    )


def dec6(col: Column) -> Column:
    """Tie-free DECIMAL(38,6) conversion: quantize with plain double
    arithmetic FIRST — floor(x*1e6 + 0.5)/1e6, identical IEEE ops in
    both engines — then cast. A raw double exactly halfway between
    two scale-6 decimals rounds HALF_UP in Spark but HALF_EVEN in
    DuckDB (observed: 23.8153125 → .815313 vs .815312), so casting
    unquantized doubles is a latent cross-engine coin flip whenever a
    value is dyadic (any output of a double division can be). |x|
    must stay below ~9e12: Spark's floor() yields a BIGINT under
    ANSI. See [[spark-duckdb-determinism]]."""
    q = F.floor(col * 1000000.0 + F.lit(0.5)) / 1000000.0
    return q.cast("decimal(38,6)")


def dec6_sql(expr: str) -> str:
    """DuckDB twin of dec6 — same double quantization, same cast."""
    return f"CAST(FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))"


def micro6(col: Column) -> Column:
    """dec6's quantization WITHOUT the decimal: scale-6 micro-units as
    BIGINT (floor() yields LongType). Summing micro-units in int64 is
    exact and order-independent like the decimal path but stays inside
    whole-stage codegen as long adds — measured 0.63s → 0.45s on the
    sf0.1 sumSeries shape vs DECIMAL(38,6) accumulation (plain
    nondeterministic double sum: 0.38s).

    Validity bound: the per-group micro-unit sum must fit int64, i.e.
    Σ|x| < 9.2e12 per aggregation group (ANSI overflow THROWS — a
    fail-stop, never a silent wrong answer; DuckDB's HUGEINT side
    cannot overflow first). Every consumer below groups per slot /
    per window / per series, far inside the bound. Use dec6/dsum for
    unbounded global sums or squared terms."""
    return F.floor(col * 1000000.0 + F.lit(0.5))


def micro6_sql(expr: str) -> str:
    """DuckDB twin of micro6. DuckDB's FLOOR returns DOUBLE, so the
    BIGINT cast makes the sum exact HUGEINT arithmetic (the cast is
    exact: quantized integral double < 2^63)."""
    return f"CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)"


def dsum(col: str | Column) -> Column:
    """Order-independent sum: exact DECIMAL(38,6) accumulation.

    Double summation order differs between Spark and DuckDB (and across
    partitionings of the same Spark job); decimal accumulation is exact,
    so the result is bit-identical everywhere. Use for every additive
    aggregate that feeds a correctness-checked output.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec6(c))


def fsum(col: str | Column) -> Column:
    """dsum cast back to double (matches oracle CAST(SUM(...) AS DOUBLE))."""
    return dsum(col).cast("double")


def favg(col: str | Column) -> Column:
    """Order-independent mean: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c).cast("double") / F.count(c)


def oracle_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
    )


def r6(col: Column) -> Column:
    """Round a double output to 6 decimals — the cross-engine contract for
    any value produced by non-associative float math (stddev, products)."""
    return F.round(col, 6)


_SPREAD_MEMO: dict = {}


def spread_small(df: DataFrame) -> DataFrame:
    """Round-robin repartition a LOW-parallelism relation up to the
    session's default parallelism before per-row-heavy work (regex
    tokenization, shingle/passage explodes, k×d higher-order-function
    distance folds). Scale-adaptive by construction: an input already
    carrying >= defaultParallelism partitions passes through UNTOUCHED
    — at cluster scale the scan supplies the parallelism and this is a
    no-op; locally a single sub-MB parquet file yields ONE scan task,
    and without the spread the whole per-row stage runs single-threaded
    on a 32-core box (measured r12 at sf0.1: dedup_semdedup 17.9 s →
    3.4 s, pipeline_prep_full 13.8 s → ~6 s). Round-robin repartition
    is deterministic under retries (sort-before-repartition,
    SPARK-23207) and every consumer is row-independent, so results are
    unchanged at any partitioning.

    Planning cost (optimization round 13, r12 VERDICT): the
    ``df.rdd.getNumPartitions()`` probe forces PHYSICAL planning of the
    input once per call site per query build — cheap on a local scan,
    but on 100 TB plans with thousands of files it doubles analysis
    work on every spread base. The probe result is therefore memoized
    per (application, parallelism, analyzed-plan semantic hash): the
    first build of a query shape pays the probe, every rebuild (bench
    warmup + timed runs, repeated driver invocations) reuses the
    decision. Same path + same conf => same partition count, so the
    memo can never change which plan a repeat build gets."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        key = (sc.applicationId, target, df.semanticHash())
    except Exception:  # semanticHash is a developer API; never fail the build
        key = None
    spread = _SPREAD_MEMO.get(key) if key is not None else None
    if spread is None:
        spread = df.rdd.getNumPartitions() < target
        if key is not None:
            _SPREAD_MEMO[key] = spread
    return df.repartition(target) if spread else df


def literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A small LITERAL relation as a SINGLE-slice Python RDD
    (optimization round 12). spark.createDataFrame(list) parallelizes
    even a 1-row literal into defaultParallelism slices, and EVERY
    evaluation of the plan — each broadcast build, each coalesce(1)
    codebook write — pays a Python-worker round per slice (mostly
    EMPTY slices); a 16-row codebook coalesce(1) parquet write
    measured 5.4 s on an idle 32-core box vs 0.31 s single-slice, and
    a noop evaluation 0.51 s vs 0.25 s. One slice is semantically
    identical (same pickled-row path, same toInternal conversions,
    doubles cross bit-exactly) — only the slice count changes, and a
    literal this small never needs partition parallelism. (A pure-JVM
    F.lit struct-explode plan was measured too: zero Python workers
    but ~3 s of PLANNING per evaluation for a 16×64-double tree —
    worse. See OPTIMIZATION_r12.md.)"""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
