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
    hist = histogram_bins(df, group_col, value_col, width=width)
    return quantiles_from_bins(hist, group_col, qs=qs, width=width)


def histogram_bins(
    df: DataFrame, group_col: str, value_col: str, width: float = 0.5
) -> DataFrame:
    """(g, b, c): the bin-count relation — counts merge by +, so this
    is also a valid streaming aggregation (any batching of the input
    sums to the same histogram)."""
    bin_ = F.floor(F.col(value_col) / float(width))
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"), bin_.alias("b"))
        .agg(F.count("*").alias("c"))
    )


def quantiles_from_bins(
    hist: DataFrame,
    group_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    width: float = 0.5,
) -> DataFrame:
    """Quantile read-off from a (g, b, c) bin relation (see
    histogram_quantiles for the determinism rules)."""
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


# --- Deterministic HyperLogLog distinct-count sketch ------------------------

_HLL_P = 8               # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # Flajolet et al. alpha_256
_HEX = "0123456789abcdef"


def hll_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Mergeable COUNT(DISTINCT) estimate per group — the scale path
    for cardinalities over groups too big to shuffle raw keys.

    Exact distinct needs every key on one reducer; the HLL register
    relation is 256 rows per group, max-merged map-side, so partial
    aggregation does almost all the work and re-aggregation over any
    partitioning is identical (max is associative+commutative). This
    implementation is DELIBERATELY cross-engine deterministic, unlike
    builtin approx_count_distinct (engine-specific HLL++ internals):

    - hash = md5 hex (identical in Spark/DuckDB), bucket = first two
      hex chars, rho = leading-zero count of the next 13 hex chars
      (52 bits) + 1 — computed by STRING algebra (strip leading '0'
      hex digits, CASE on the first surviving digit), no float log2;
    - each register term 2^-M is an exact double (integer exponent),
      summed over the SORTED register array so both engines fold in
      one order; empty registers contribute exactly 1.0 each;
    - the small-range branch (linear counting, E <= 2.5m and V > 0)
      rounds its libm ln at 9 decimals per the project rule.

    Output: (group, n_registers, est_distinct, exact_distinct,
    rel_err) — the exact count rides along as the accuracy dial, like
    dedup_minhash_est for minhash; the REGISTER relation is what a
    100 TB job would persist and merge."""
    regs = hll_registers(df, group_col, key_col)
    return hll_estimate(regs, df, group_col, key_col)


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(g, bucket, m): the max-merged register relation — the state a
    100 TB job persists; merging two register tables is max-by-key,
    which also makes it a valid STREAMING aggregation (any batching
    of the input max-folds to the same registers)."""
    g = F.col(group_col).alias("g")
    h = F.md5(F.col(key_col).cast("string"))
    base = df.select(g, h.alias("h"))
    b = base.select(
        "g",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.expr("trim(LEADING '0' FROM substring(h, 3, 13))").alias("st"),
    )
    d1 = F.substring("st", 1, 1)
    lz_in_digit = (
        F.when(d1.isin(*list("89abcdef")), 0)
        .when(d1.isin(*list("4567")), 1)
        .when(d1.isin(*list("23")), 2)
        .otherwise(3)
    )
    rho = F.when(F.col("st") == "", F.lit(53)).otherwise(
        (13 - F.length("st")) * 4 + lz_in_digit + 1
    )
    return (
        b.select("g", "bucket", rho.alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate(
    regs: DataFrame, df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Estimate + exact accuracy column from a register relation (see
    hll_distinct for the determinism rules)."""
    per_g = regs.groupBy("g").agg(
        F.array_sort(F.collect_list("m")).alias("arr")
    )
    v = F.lit(_HLL_M) - F.size("arr")  # empty registers
    s = (
        F.aggregate(
            F.col("arr"), F.lit(0.0), lambda acc, m: acc + F.pow(F.lit(2.0), -m)
        )
        + v.cast("double")
    )
    e_raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * _HLL_M)) & (v > 0),
        F.lit(float(_HLL_M))
        * F.round(F.log(F.lit(float(_HLL_M)) / v.cast("double")), 9),
    ).otherwise(e_raw)
    sk = per_g.select(
        "g",
        F.size("arr").cast("bigint").alias("n_registers"),
        est.alias("est_distinct"),
    )
    exact = df.groupBy(F.col(group_col).alias("g2")).agg(
        F.count_distinct(F.col(key_col)).cast("bigint").alias("exact_distinct")
    )
    return (
        sk.join(exact, sk["g"] == exact["g2"])
        .select(
            F.col("g").alias(group_col),
            "n_registers",
            "est_distinct",
            "exact_distinct",
            (
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_err"),
        )
    )


def hll_distinct_sql(base: str, group_col: str, key_col: str) -> str:
    """DuckDB twin — identical bucket/rho string algebra, sorted fold,
    and correction-branch rules (hex->int differs syntactically:
    strpos on the hex alphabet here, conv() in Spark — same value)."""
    m, alpha = _HLL_M, _HLL_ALPHA
    d1 = "substr(st, 1, 1)"
    lz = (
        f"CASE WHEN {d1} IN ('8','9','a','b','c','d','e','f') THEN 0 "
        f"WHEN {d1} IN ('4','5','6','7') THEN 1 "
        f"WHEN {d1} IN ('2','3') THEN 2 ELSE 3 END"
    )
    fold = (
        "list_reduce(list_prepend(0.0, list_transform(arr, "
        "m -> POWER(2.0, -m))), (acc, x) -> acc + x)"
    )
    return f"""
WITH e AS (
  SELECT {group_col} AS g, md5(CAST({key_col} AS VARCHAR)) AS h FROM ({base})
), b AS (
  SELECT g,
    16 * (strpos('{_HEX}', substr(h, 1, 1)) - 1)
       + (strpos('{_HEX}', substr(h, 2, 1)) - 1) AS bucket,
    ltrim(substr(h, 3, 13), '0') AS st
  FROM e
), r AS (
  SELECT g, bucket,
    MAX(CASE WHEN st = '' THEN 53
        ELSE (13 - len(st)) * 4 + {lz} + 1 END) AS m
  FROM b GROUP BY g, bucket
), pg AS (
  SELECT g, list_sort(list(m)) AS arr FROM r GROUP BY g
), est AS (
  SELECT g, CAST(len(arr) AS BIGINT) AS n_registers,
    CASE WHEN {alpha * m * m!r} / ({fold} + ({m} - len(arr)))
              <= {2.5 * m!r}
          AND {m} - len(arr) > 0
         THEN {float(m)!r} * ROUND(LN({float(m)!r} / ({m} - len(arr))), 9)
         ELSE {alpha * m * m!r} / ({fold} + ({m} - len(arr))) END
      AS est_distinct
  FROM pg
), ex AS (
  SELECT {group_col} AS g, CAST(COUNT(DISTINCT {key_col}) AS BIGINT)
    AS exact_distinct
  FROM ({base}) GROUP BY {group_col}
)
SELECT est.g AS {group_col}, n_registers, est_distinct, exact_distinct,
  (est_distinct - exact_distinct) / exact_distinct AS rel_err
FROM est JOIN ex ON est.g = ex.g
"""


# --- Deterministic count-min sketch -----------------------------------------

CMS_D = 4                # hash rows
CMS_W = 256              # counters per row (first two md5 hex chars)


def _cms_cells(key):
    """The CMS_D (row, column) cells a key maps to, as an array of
    structs: column = first two hex chars of md5(row ':' key) — the
    same engine-portable hex-bucket trick as the HLL sketch above."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(r), key)), 1, 2
                    ),
                    16,
                    10,
                )
                .cast("int")
                .alias("col"),
            )
            for r in range(CMS_D)
        ]
    )


def cms_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """(r, col, c): the count-min register relation — CMS_D x CMS_W
    exact int64 counters, the third mergeable sketch next to the
    histogram (+) and the HLL (max). Counters add, so partial
    aggregation collapses each map partition to <= 1024 rows before
    the shuffle, two sketches merge by summing cell-wise, and any
    batching of the input (streaming micro-batches included) sums to
    the identical sketch. Everything is integer arithmetic on md5-
    derived cells — deterministic in any engine, unlike hash sketches
    keyed on an engine-private hash function."""
    pairs = df.select(
        F.explode(_cms_cells(F.col(key_col).cast("string"))).alias("rc")
    )
    return pairs.groupBy(
        F.col("rc.r").alias("r"), F.col("rc.col").alias("col")
    ).agg(F.count("*").alias("c"))


def cms_heavy_hitters(df: DataFrame, key_col: str, topk: int = 20) -> DataFrame:
    """(key, est, exact, overcount) for the topk keys by CMS-estimated
    frequency: est = min over the CMS_D counters the key hashes into —
    the classic point query, always >= the true count (collisions only
    inflate; the pytest invariant). The exact count rides along as the
    accuracy dial, like hll_distinct's exact_distinct.

    Scale shape: the sketch is <= CMS_D*CMS_W rows however large the
    input, so it BROADCASTS to the key side; the only full-data
    shuffles are the two counting groupBys on the key itself, and the
    top-k is an orderBy().limit() — TakeOrderedAndProject heads per
    partition, never a global sort. (At 100 TB the exact column is
    the part you'd drop; the sketch path alone never shuffles more
    than distinct-keys rows.) Ties break on the key string so both
    engines pick the same topk rows."""
    return cms_estimate(cms_sketch(df, key_col), df, key_col, topk)


def cms_estimate(
    sk: DataFrame, df: DataFrame, key_col: str, topk: int = 20
) -> DataFrame:
    """Heavy-hitter read-off from an existing (r, col, c) sketch
    relation — the entry point for sketches folded elsewhere (the
    streaming sum-merge); see cms_heavy_hitters for the rules."""
    keys = df.select(F.col(key_col).cast("string").alias("k")).distinct()
    cells = keys.select(
        "k", F.explode(_cms_cells(F.col("k"))).alias("rc")
    ).select("k", F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    est = (
        cells.join(F.broadcast(sk), ["r", "col"])
        .groupBy("k")
        .agg(F.min("c").alias("est"))
    )
    exact = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count("*").alias("exact")
    )
    return (
        est.join(exact, "k")
        .select(
            F.col("k").alias(key_col),
            F.col("est").cast("bigint").alias("est"),
            F.col("exact").cast("bigint").alias("exact"),
            (F.col("est") - F.col("exact")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("est").desc(), F.col(key_col).asc())
        .limit(topk)
    )


def cms_heavy_hitters_sql(
    base: str, key_col: str, topk: int = 20
) -> str:
    """DuckDB twin — identical md5 cell derivation (strpos on the hex
    alphabet instead of conv()), min-over-rows point query, and
    tie-break rules."""
    def col_expr(r: str, key: str) -> str:
        h = f"md5({r} || ':' || {key})"
        return (
            f"16 * (strpos('{_HEX}', substr({h}, 1, 1)) - 1)"
            f" + (strpos('{_HEX}', substr({h}, 2, 1)) - 1)"
        )

    cells_rows = " UNION ALL ".join(
        f"SELECT k, {r} AS r, {col_expr(str(r), 'k')} AS col FROM keys"
        for r in range(CMS_D)
    )
    sketch_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {col_expr(str(r), 'k')} AS col FROM e"
        for r in range(CMS_D)
    )
    return f"""
WITH e AS (
  SELECT CAST({key_col} AS VARCHAR) AS k FROM ({base})
), sk AS (
  SELECT r, col, COUNT(*) AS c FROM ({sketch_rows}) GROUP BY r, col
), keys AS (
  SELECT DISTINCT k FROM e
), cells AS (
  {cells_rows}
), est AS (
  SELECT k, MIN(c) AS est
  FROM cells JOIN sk USING (r, col) GROUP BY k
), ex AS (
  SELECT k, COUNT(*) AS exact FROM e GROUP BY k
)
SELECT est.k AS {key_col}, CAST(est AS BIGINT) AS est,
  CAST(exact AS BIGINT) AS exact,
  CAST(est - exact AS BIGINT) AS overcount
FROM est JOIN ex ON est.k = ex.k
ORDER BY est DESC, est.k ASC LIMIT {topk}
"""


# --- Deterministic Bloom filter --------------------------------------------

BLOOM_K = 4              # hash functions
BLOOM_M = 4096           # bits (3 md5 hex chars = exactly 16^3)
_BLOOM_WORD = 32         # bits packed per BIGINT word: DuckDB raises on
                         # 1::BIGINT << 63 (sign bit), so words stay in
                         # the positive half — 128 words per filter


def _bloom_bits(key):
    """The BLOOM_K bit positions a key sets, as an array of structs
    (w = word index, m = single-bit mask): position = first three hex
    chars of md5(i ':' key) — 0..4095 exactly, the same engine-
    portable hex-bucket trick as the HLL/CMS sketches above."""
    out = []
    for i in range(BLOOM_K):
        h = F.md5(F.concat_ws(":", F.lit(i), key))
        pos = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
        out.append(
            F.struct(
                (pos / _BLOOM_WORD).cast("int").alias("w"),
                # 2^b exact in double for b <= 31 (pyspark's shiftleft
                # only takes a literal bit count, not a column)
                F.pow(F.lit(2.0), pos % _BLOOM_WORD)
                .cast("bigint")
                .alias("m"),
            )
        )
    return F.array(*out)


def bloom_sketch(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(g, w, bits): the Bloom-filter register relation per group —
    the FOURTH mergeable sketch beside the histogram (+), the HLL
    (max), and the CMS (+): words merge by bitwise OR, which is
    idempotent AND commutative, so partial aggregation collapses each
    map partition to <= 128 rows/group before the shuffle, two
    filters union by OR-ing words, re-adding a key is a no-op, and
    any batching of the input (streaming micro-batches included) ORs
    to the identical filter. "Have we seen this key?" in 1 KB/group
    with no key retention — the pre-filter shape for contamination
    checks, dedup candidate pruning, and semi-join pushdown when the
    key set is too big to broadcast exactly."""
    pairs = df.select(
        F.col(group_col).alias("g"),
        F.explode(_bloom_bits(F.col(key_col).cast("string"))).alias("b"),
    )
    return pairs.groupBy("g", F.col("b.w").alias("w")).agg(
        F.bit_or("b.m").alias("bits")
    )


def bloom_membership(
    sk: DataFrame, probes: DataFrame, exact: DataFrame
) -> DataFrame:
    """(g, probe, in_bloom, in_exact, false_positive) — the point
    query over an existing (g, w, bits) filter: a probe is 'present'
    iff ALL BLOOM_K of its bits are set. ``probes`` = (g, probe) rows;
    ``exact`` = (g, probe) rows that are truly present (the accuracy
    dial, like hll_distinct's exact count — no false negatives ever,
    false positives measured not asserted). The filter is <= 128
    rows/group, so it broadcasts; probes shuffle only on (g, w)."""
    cells = probes.select(
        "g",
        "probe",
        F.explode(_bloom_bits(F.col("probe").cast("string"))).alias("b"),
    ).select("g", "probe", F.col("b.w").alias("w"), F.col("b.m").alias("m"))
    hit = (
        cells.join(F.broadcast(sk), ["g", "w"], "left")
        .withColumn(
            "bit_set",
            F.coalesce(
                F.col("bits").bitwiseAND(F.col("m")) == F.col("m"),
                F.lit(False),
            ).cast("int"),
        )
        .groupBy("g", "probe")
        .agg((F.min("bit_set") == 1).alias("in_bloom"))
    )
    return (
        hit.join(
            exact.select("g", "probe", F.lit(True).alias("in_exact")),
            ["g", "probe"],
            "left",
        )
        .select(
            "g",
            "probe",
            F.col("in_bloom").cast("int").alias("in_bloom"),
            F.coalesce(F.col("in_exact"), F.lit(False))
            .cast("int")
            .alias("in_exact"),
            (
                F.col("in_bloom")
                & ~F.coalesce(F.col("in_exact"), F.lit(False))
            )
            .cast("int")
            .alias("false_positive"),
        )
    )


def _bloom_pos_sql(i: str, key: str) -> str:
    h = f"md5({i} || ':' || {key})"
    return (
        f"(256 * (strpos('{_HEX}', substr({h}, 1, 1)) - 1)"
        f" + 16 * (strpos('{_HEX}', substr({h}, 2, 1)) - 1)"
        f" + (strpos('{_HEX}', substr({h}, 3, 1)) - 1))"
    )


def bloom_cells_sql(src: str, kcol: str, extra: str) -> str:
    """The BLOOM_K (w, m) cell rows per key of ``src`` — the SQL twin
    of _bloom_bits, shared by bloom_membership_sql and the
    bloom-prefilter decontamination oracle."""
    return " UNION ALL ".join(
        f"SELECT {extra}, CAST({_bloom_pos_sql(str(i), kcol)} // {_BLOOM_WORD} "
        f"AS INT) AS w, CAST(1 AS BIGINT) << "
        f"({_bloom_pos_sql(str(i), kcol)} % {_BLOOM_WORD}) AS m FROM {src}"
        for i in range(BLOOM_K)
    )


def bloom_membership_sql(
    base: str, group_col: str, key_col: str, probes_sql: str
) -> str:
    """DuckDB twin: identical md5 bit derivation (strpos hex algebra),
    identical 32-bit word packing, bit_or fold, all-bits-set point
    query. ``probes_sql`` must yield (g, probe) rows."""
    cells = bloom_cells_sql
    return f"""
WITH e AS (
  SELECT {group_col} AS g, CAST({key_col} AS VARCHAR) AS k FROM ({base})
), sk AS (
  SELECT g, w, bit_or(m) AS bits FROM ({cells("e", "k", "g")}) GROUP BY g, w
), probes AS (
  SELECT g, CAST(probe AS VARCHAR) AS probe FROM ({probes_sql})
), pc AS (
  {cells("probes", "probe", "g, probe")}
), hit AS (
  SELECT pc.g, pc.probe,
         MIN(CASE WHEN sk.bits IS NOT NULL AND (sk.bits & pc.m) = pc.m
                  THEN 1 ELSE 0 END) = 1 AS in_bloom
  FROM pc LEFT JOIN sk ON pc.g = sk.g AND pc.w = sk.w
  GROUP BY pc.g, pc.probe
), ex AS (
  SELECT DISTINCT g, k AS probe FROM e
)
SELECT hit.g AS g, hit.probe AS probe,
       CAST(in_bloom AS INT) AS in_bloom,
       CAST(ex.probe IS NOT NULL AS INT) AS in_exact,
       CAST(in_bloom AND ex.probe IS NULL AS INT) AS false_positive
FROM hit LEFT JOIN ex ON hit.g = ex.g AND hit.probe = ex.probe
"""
