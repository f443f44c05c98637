"""Known-answer tests for the deterministic sketches
(operators/sketch.py): HLL register string-algebra and estimate
accuracy. The histogram-quantile sketch is covered by its oracle
query + reference-parity tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_known_registers(spark):
    """Hand-checked rho math against real md5 values:
    md5('42')  = a1d0c6e83f02... -> bucket 0xa1=161, tail 'd0c6e...'
                 has no leading zeros, first digit 'd' in 8..f -> rho 1
    md5('292') = 1700002963a49da... -> bucket 0x17=23, tail
                 '00002963a49da' strips 4 zero digits (16 bits), first
                 survivor '2' adds 2 -> rho = 16 + 2 + 1 = 19."""
    from tgres_spark.operators.sketch import hll_registers

    df = spark.createDataFrame([("g", 42), ("g", 292)], "g string, k long")
    rows = hll_registers(df, "g", "k").collect()
    assert sorted((r.bucket, r.m) for r in rows) == [(23, 19), (161, 1)]


def test_hll_registers_merge_is_max(spark):
    """Two keys landing in one bucket keep the deeper rho — the merge
    rule that makes the register relation mergeable/streamable."""
    from tgres_spark.operators.sketch import hll_registers

    df = spark.createDataFrame(
        [("g", 42), ("g", 292), ("g", 292)], "g string, k long"
    )
    regs = {
        (r.bucket): r.m for r in hll_registers(df, "g", "k").collect()
    }
    assert regs == {23: 19, 161: 1}  # duplicate key changes nothing


def test_hll_estimate_close_on_range(spark):
    from tgres_spark.operators.sketch import hll_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    row = hll_distinct(df, "g", "k").collect()[0]
    assert row.exact_distinct == 5000
    assert abs(row.rel_err) < 0.15  # m=256 -> sigma ~6.5% raw branch


def test_cms_point_query_never_undercounts(spark):
    """est >= exact for every key (collisions only inflate) and the
    top of the ranking is the true heavy hitter."""
    from tgres_spark.operators.sketch import cms_heavy_hitters

    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "key string")
    out = cms_heavy_hitters(df, "key", topk=10).collect()
    assert all(r.est >= r.exact for r in out)
    assert all(r.overcount == r.est - r.exact for r in out)
    assert out[0].key == "hot" and out[0].exact == 500

def test_cms_sketch_merges_by_sum(spark):
    """Sketching two halves and summing cell-wise equals sketching the
    whole — the mergeability that makes the CMS streamable and its
    partial aggregation exact."""
    from tgres_spark.operators.sketch import cms_sketch

    rows = [(f"k{i % 37}",) for i in range(400)]
    whole = spark.createDataFrame(rows, "key string")
    h1 = spark.createDataFrame(rows[:150], "key string")
    h2 = spark.createDataFrame(rows[150:], "key string")
    full = {(r.r, r.col): r.c for r in cms_sketch(whole, "key").collect()}
    merged: dict = {}
    for half in (h1, h2):
        for r in cms_sketch(half, "key").collect():
            merged[(r.r, r.col)] = merged.get((r.r, r.col), 0) + r.c
    assert merged == full


def test_bloom_no_false_negatives_and_fp_flag(spark):
    """Every inserted key must probe present (structural — a Bloom
    filter cannot false-negative); absent probes may false-positive
    and the flag must be exactly in_bloom ∧ ¬in_exact."""
    from pyspark.sql import functions as F

    from tgres_spark.operators.sketch import bloom_membership, bloom_sketch

    rows = [("g1", i) for i in range(80)] + [("g2", i) for i in range(40, 120)]
    df = spark.createDataFrame(rows, "g string, k long")
    sk = bloom_sketch(df, "g", "k")
    probes = spark.createDataFrame(
        [(g, str(i)) for g in ("g1", "g2") for i in range(200)],
        "g string, probe string",
    )
    exact = df.select("g", F.col("k").cast("string").alias("probe")).distinct()
    out = {(r.g, r.probe): r for r in
           bloom_membership(sk, probes, exact).collect()}
    for g, lo, hi in (("g1", 0, 80), ("g2", 40, 120)):
        for i in range(200):
            r = out[(g, str(i))]
            if lo <= i < hi:
                assert r.in_bloom == 1 and r.in_exact == 1
                assert r.false_positive == 0
            else:
                assert r.in_exact == 0
                assert r.false_positive == r.in_bloom


def test_bloom_merge_is_idempotent_or(spark):
    """Word registers merge by OR: sketch(df ∪ df) == sketch(df)
    (idempotent — at-least-once replay is free), and OR-folding the
    two halves' sketches equals the whole's sketch (mergeable)."""
    from tgres_spark.operators.sketch import bloom_sketch

    rows = [("g", f"key{i}") for i in range(300)]
    whole = spark.createDataFrame(rows, "g string, k string")
    doubled = whole.union(whole)
    one = {(r.g, r.w): r.bits for r in bloom_sketch(whole, "g", "k").collect()}
    two = {(r.g, r.w): r.bits for r in bloom_sketch(doubled, "g", "k").collect()}
    assert one == two
    h1 = spark.createDataFrame(rows[:150], "g string, k string")
    h2 = spark.createDataFrame(rows[150:], "g string, k string")
    merged: dict = {}
    for half in (h1, h2):
        for r in bloom_sketch(half, "g", "k").collect():
            merged[(r.g, r.w)] = merged.get((r.g, r.w), 0) | r.bits
    assert merged == one
    # every word stays in the positive 32-bit half (DuckDB shift-safe)
    assert all(0 <= b < (1 << 32) for b in one.values())
