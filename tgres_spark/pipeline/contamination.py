"""Passage-level dedup + benchmark-contamination detection.

Two decontamination ops every large training-data pipeline runs before
a corpus ships, complementing the whole-document dedup family
(dedup.py):

- ``passage_dedup``: documents often share boilerplate CHUNKS
  (headers, license blocks, templated sections) while remaining
  globally distinct, so whole-doc hashing misses them. Non-overlapping
  k-word passages are hashed and counted across documents; each doc
  reports how much of it is cross-document boilerplate.
- ``contamination_check``: the standard n-gram test-set decontamination
  (as published for GPT-2/GPT-3-style training runs): a corpus
  document is contaminated when a high fraction of its k-grams appear
  anywhere in the benchmark set.

Both are pure DataFrame algebra over md5 keys (uniform, skew-free) and
exact integer counts with one final double division — deterministic,
so both carry full DuckDB oracles.

Scale: the passage/gram relations explode ~n_words/k (passages) or
~n_words (grams) rows per doc, shuffled once on uniform hashes. The
benchmark gram set is broadcast (benchmarks are small by nature —
thousands of docs); drop the hint and the join degrades gracefully to
a hash join on the same uniform keys if a "benchmark" ever isn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import spread_small
from .dedup import WORDS_SQL, shingles_of, shingles_sql, words


def _passages_of(w, k: int):
    """Non-overlapping k-word chunks of an already-materialized words
    array (same no-CSE-in-lambda rule as shingles_of)."""
    n_chunks = F.floor(F.size(w) / k).cast("int")
    # sequence(1, 0) is DESCENDING [1, 0], not empty (see shingles_of)
    empty = F.slice(F.sequence(F.lit(1), F.lit(1)), 1, 0)
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(empty)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i * k + j + 1) for j in range(k)]
        ),
    )


def _passages_sql(c: str, k: int) -> str:
    w = WORDS_SQL.format(c=c)
    joined = " || ' ' || ".join(f"__w[i * {k} + {j + 1}]" for j in range(k))
    return (
        f"list_transform(range(0, CAST(FLOOR(len(__w) / {k}) AS BIGINT)), "
        f"i -> {joined})"
    ).replace("__w", f"({w})")


def passage_dedup(docs: DataFrame, k: int = 16) -> DataFrame:
    """(doc_id, n_passages, n_dup_passages, dup_ratio): per document,
    how many of its distinct k-word passages occur in at least one
    OTHER document (repeats inside one doc are not boilerplate)."""
    # materialize the words array FIRST — the no-CSE-in-lambda rule
    # (shingles_of docstring): an inlined words() recomputes the full
    # regex split per element inside the chunk lambda
    pas = (
        spread_small(docs).select("doc_id", words(F.col("text")).alias("w"))
        .persist()  # see span_dedup's base comment (collapse re-inlines)  # fence: returned plan reads this cache
        .select("doc_id", _passages_of(F.col("w"), k).alias("ps"))
        .select("doc_id", F.explode("ps").alias("p"))
        .select("doc_id", F.md5("p").alias("h"))
        .distinct()
    )
    spread = pas.groupBy("h").agg(F.count("*").alias("n_docs"))
    per_doc = (
        pas.join(spread, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
                "n_dup_passages"
            ),
        )
    )
    # distinct mirrors the oracle's SELECT DISTINCT doc_id — duplicate
    # doc rows otherwise emit duplicate output rows only on this side
    return docs.select("doc_id").distinct().join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_passages", F.lit(0)).alias("n_passages"),
        F.coalesce("n_dup_passages", F.lit(0)).alias("n_dup_passages"),
        F.when(
            F.coalesce("n_passages", F.lit(0)) > 0,
            F.col("n_dup_passages").cast("double") / F.col("n_passages"),
        ).alias("dup_ratio"),
    )


def passage_dedup_sql(k: int = 16) -> str:
    pas = (
        f"SELECT DISTINCT doc_id, md5(UNNEST({_passages_sql('text', k)})) AS h "
        "FROM documents"
    )
    return (
        f"WITH pas AS ({pas}), "
        "spread AS (SELECT h, COUNT(*) AS n_docs FROM pas GROUP BY h), "
        "per_doc AS (SELECT doc_id, COUNT(*) AS n_passages, "
        "SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS n_dup_passages "
        "FROM pas JOIN spread USING (h) GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(n_passages, 0) AS BIGINT) AS n_passages, "
        "CAST(COALESCE(n_dup_passages, 0) AS BIGINT) AS n_dup_passages, "
        "CASE WHEN COALESCE(n_passages, 0) > 0 "
        "THEN CAST(n_dup_passages AS DOUBLE) / n_passages END AS dup_ratio "
        "FROM (SELECT DISTINCT doc_id FROM documents) d "
        "LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id"
    )


def contamination_check(
    docs: DataFrame,
    benchmark_source: str = "src0",
    k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, n_grams, n_hit, frac, contaminated): for every NON-
    benchmark document, the fraction of its distinct k-grams that
    appear anywhere in the benchmark split; contaminated = frac ≥
    threshold. Benchmark membership is by ``source`` here; a real run
    passes the actual eval-set relation as the benchmark side."""
    grams = (
        spread_small(docs).select("doc_id", "source", words(F.col("text")).alias("w"))
        .select(
            "doc_id",
            "source",
            F.explode(shingles_of(F.col("w"), k)).alias("g"),
        )
        .select("doc_id", "source", F.md5("g").alias("h"))
    )
    bench = (
        grams.where(F.col("source") == benchmark_source).select("h").distinct()
    )
    corpus = grams.where(F.col("source") != benchmark_source).select(
        "doc_id", "h"
    ).distinct()
    hits = corpus.join(F.broadcast(bench), "h", "left_semi")
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    nhit = hits.groupBy("doc_id").agg(F.count("*").alias("n_hit"))
    frac = F.col("n_hit").cast("double") / F.col("n_grams")
    return (
        totals.join(nhit, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.coalesce(frac, F.lit(0.0)).alias("frac"),
        )
        .withColumn(
            "contaminated",
            (F.col("frac") >= float(threshold)).cast("bigint"),
        )
    )


def contamination_check_sql(
    benchmark_source: str = "src0", k: int = 8, threshold: float = 0.5
) -> str:
    grams = (
        f"SELECT doc_id, source, md5(UNNEST({shingles_sql('text', k)})) AS h "
        "FROM documents"
    )
    return (
        f"WITH grams AS ({grams}), "
        f"bench AS (SELECT DISTINCT h FROM grams WHERE source = '{benchmark_source}'), "
        f"corpus AS (SELECT DISTINCT doc_id, h FROM grams WHERE source <> '{benchmark_source}'), "
        "totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id), "
        "hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM corpus "
        "WHERE h IN (SELECT h FROM bench) GROUP BY doc_id) "
        "SELECT totals.doc_id AS doc_id, CAST(n_grams AS BIGINT) AS n_grams, "
        "CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit, "
        "COALESCE(CAST(n_hit AS DOUBLE) / n_grams, 0.0) AS frac, "
        f"CAST(COALESCE(CAST(n_hit AS DOUBLE) / n_grams, 0.0) >= {float(threshold)!r} AS BIGINT) AS contaminated "
        "FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id"
    )


def _shingles_from_w_sql(k: int) -> str:
    """Overlapping k-word grams from an existing list column ``w`` —
    the DuckDB twin of shingles_of over a pre-bound array (the
    registered oracle binds w once in a CTE, mirroring the Spark
    side's materialize-before-lambda rule)."""
    joined = " || ' ' || ".join(f"w[i + {j}]" for j in range(k))
    return (
        f"list_transform(range(1, CASE WHEN len(w) >= {k} "
        f"THEN len(w) - {k - 2} ELSE 1 END), i -> {joined})"
    )


def _shingles_from_w_slice_sql(k: int) -> str:
    """Same relation as _shingles_from_w_sql but via list slicing +
    array_to_string — the || chain binds k-deep and DuckDB's binder
    caps recursion at 128, so k=64 needs the flat form (identical
    strings: both join the k words with single spaces)."""
    return (
        f"list_transform(range(1, CASE WHEN len(w) >= {k} "
        f"THEN len(w) - {k - 2} ELSE 1 END), "
        f"i -> array_to_string(w[i : i + {k - 1}], ' '))"
    )


def span_dedup(docs: DataFrame, k: int = 16) -> DataFrame:
    """Span-level duplication profile (the metric behind substring-
    level dedup a la Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): OVERLAPPING k-word windows are
    hashed; a window whose hash occurs in >= 2 distinct documents is
    a duplicated span, and each document reports how much of its TEXT
    those spans cover — word positions under at least one duplicated
    window, as an interval-union computed by exploding the k covered
    positions of each duplicated window and counting distinct. This
    catches long shared substrings at any alignment, where the
    non-overlapping passage_dedup only sees chunk-aligned repeats.
    Returns (doc_id, n_words, n_windows, n_dup_windows, covered_words,
    covered_frac).

    Scale: the window relation is ~n_words rows/doc shuffled once on
    uniform md5 keys (same shape as contamination_check's gram
    relation); the position explode is k x the DUPLICATED windows
    only — the spread filter runs first, so clean corpora explode
    almost nothing. No all-pairs anything."""
    # persist pins the window arrays as CONCRETE data: binding w/gs in
    # a select is NOT enough — Catalyst's projection collapse re-inlines
    # words(text) into the shingle lambda under the downstream Generate,
    # re-running the regex split per array element (O(words·windows)
    # per doc; measured 42 s vs 0.3 s for the bare explode at sf0.1,
    # round 11). The cache is (doc_id, counts, window arrays) ≈ 3× text
    # — MEMORY_AND_DISK, the prep_full persisted-corpus class.
    # spread_small: the 1-task local scan would otherwise run the
    # regex split + shingle build single-threaded (no-op at scale).
    base = spread_small(docs).select(
        "doc_id", words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.size("w").alias("n_words"),
        shingles_of(F.col("w"), k).alias("gs"),
    ).persist()  # fence: returned plan reads this cache
    spans = base.select(
        "doc_id", F.posexplode("gs").alias("p", "g")
    ).select("doc_id", (F.col("p") + 1).alias("s"), F.md5("g").alias("h"))
    spread = (
        spans.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("h")
    )
    dup = spans.join(spread, "h", "left_semi")
    cov = (
        dup.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("covered_words"))
    )
    dups = dup.groupBy("doc_id").agg(F.count("*").alias("n_dup_windows"))
    ids = docs.select("doc_id").distinct()
    # n_windows is ARITHMETIC from n_words (max(0, n_words - k + 1)) —
    # counting it from the span relation would re-run the whole
    # explode lineage a second time just to recount rows
    nw = base.groupBy("doc_id").agg(F.max("n_words").alias("n_words"))
    n_windows = F.when(
        F.coalesce("n_words", F.lit(0)) >= k, F.col("n_words") - (k - 1)
    ).otherwise(0)
    return (
        ids.join(nw, "doc_id", "left")
        .join(dups, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            n_windows.cast("bigint").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("bigint")
            .alias("n_dup_windows"),
            F.coalesce("covered_words", F.lit(0))
            .cast("bigint")
            .alias("covered_words"),
            F.when(
                F.coalesce("n_words", F.lit(0)) > 0,
                F.coalesce("covered_words", F.lit(0)).cast("double")
                / F.col("n_words"),
            ).alias("covered_frac"),
        )
    )


def span_dedup_sql(k: int = 16) -> str:
    w = WORDS_SQL.format(c="text")
    return (
        f"WITH base AS (SELECT doc_id, ({w}) AS w FROM documents), "
        "sp AS (SELECT doc_id, "
        f"UNNEST(range(1, CASE WHEN len(w) >= {k} THEN len(w) - {k - 2} ELSE 1 END)) AS s, "
        f"md5(UNNEST({_shingles_from_w_sql(k)})) AS h FROM base), "
        "spread AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sp) "
        "GROUP BY h HAVING COUNT(*) >= 2), "
        "dup AS (SELECT doc_id, s FROM sp WHERE h IN (SELECT h FROM spread)), "
        "cov AS (SELECT doc_id, COUNT(*) AS covered_words FROM ("
        f"SELECT DISTINCT doc_id, UNNEST(range(s, s + {k})) AS pos FROM dup) "
        "GROUP BY doc_id), "
        "dups AS (SELECT doc_id, COUNT(*) AS n_dup_windows FROM dup GROUP BY doc_id), "
        "nw AS (SELECT doc_id, MAX(len(w)) AS n_words FROM base GROUP BY doc_id) "
        "SELECT ids.doc_id, "
        "CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words, "
        f"CAST(CASE WHEN COALESCE(n_words, 0) >= {k} "
        f"THEN n_words - {k - 1} ELSE 0 END AS BIGINT) AS n_windows, "
        "CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows, "
        "CAST(COALESCE(covered_words, 0) AS BIGINT) AS covered_words, "
        "CASE WHEN COALESCE(n_words, 0) > 0 "
        "THEN CAST(COALESCE(covered_words, 0) AS DOUBLE) / n_words END "
        "AS covered_frac "
        "FROM (SELECT DISTINCT doc_id FROM documents) ids "
        "LEFT JOIN nw USING (doc_id) "
        "LEFT JOIN dups USING (doc_id) "
        "LEFT JOIN cov USING (doc_id)"
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark_source: str = "src0",
    k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """contamination_check with the Bloom filter as the gram
    pre-filter — the 100 TB decontamination shape: a real benchmark
    suite's distinct-gram set (billions of rows across eval sets)
    can't broadcast exactly, but its Bloom filter is 128 int64 words
    REGARDLESS of gram count. Corpus grams probe the broadcast filter
    map-side; only the survivors (true hits + measured-not-assumed
    false positives) reach the exact semi-join. No false negatives is
    STRUCTURAL, so (n_hit, frac, contaminated) are provably identical
    to the exact contamination_check — the pytest pins that equality,
    and n_bloom_pass rides along as the pruning dial (n_hit ≤
    n_bloom_pass ≪ n_grams). Returns (doc_id, n_grams, n_bloom_pass,
    n_hit, frac, contaminated)."""
    from ..operators.sketch import _bloom_bits, bloom_sketch

    grams = (
        spread_small(docs).select("doc_id", "source", words(F.col("text")).alias("w"))
        .select(
            "doc_id",
            "source",
            F.explode(shingles_of(F.col("w"), k)).alias("g"),
        )
        .select("doc_id", "source", F.md5("g").alias("h"))
    )
    bench = (
        grams.where(F.col("source") == benchmark_source).select("h").distinct()
    )
    corpus = grams.where(F.col("source") != benchmark_source).select(
        "doc_id", "h"
    ).distinct()
    sk = bloom_sketch(
        bench.select(F.lit("b").alias("g"), "h"), "g", "h"
    ).select("w", "bits")
    cells = corpus.select(
        "doc_id", "h", F.explode(_bloom_bits(F.col("h"))).alias("b")
    ).select("doc_id", "h", F.col("b.w").alias("w"), F.col("b.m").alias("m"))
    flag = (
        cells.join(F.broadcast(sk), "w", "left")
        .withColumn(
            "bit_set",
            F.coalesce(
                F.col("bits").bitwiseAND(F.col("m")) == F.col("m"),
                F.lit(False),
            ).cast("int"),
        )
        .groupBy("doc_id", "h")
        .agg((F.min("bit_set") == 1).alias("in_bloom"))
    )
    passed = flag.where(F.col("in_bloom")).select("doc_id", "h")
    hits = passed.join(F.broadcast(bench), "h", "left_semi")
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    npass = passed.groupBy("doc_id").agg(F.count("*").alias("n_bloom_pass"))
    nhit = hits.groupBy("doc_id").agg(F.count("*").alias("n_hit"))
    frac = F.col("n_hit").cast("double") / F.col("n_grams")
    return (
        totals.join(npass, "doc_id", "left")
        .join(nhit, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_bloom_pass", F.lit(0)).alias("n_bloom_pass"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.coalesce(frac, F.lit(0.0)).alias("frac"),
        )
        .withColumn(
            "contaminated",
            (F.col("frac") >= float(threshold)).cast("bigint"),
        )
    )


def bloom_decontaminate_sql(
    benchmark_source: str = "src0", k: int = 8, threshold: float = 0.5
) -> str:
    from ..operators.sketch import bloom_cells_sql

    grams = (
        f"SELECT doc_id, source, md5(UNNEST({shingles_sql('text', k)})) AS h "
        "FROM documents"
    )
    return (
        f"WITH grams AS ({grams}), "
        f"bench AS (SELECT DISTINCT h FROM grams WHERE source = '{benchmark_source}'), "
        f"corpus AS (SELECT DISTINCT doc_id, h FROM grams WHERE source <> '{benchmark_source}'), "
        "bsk AS (SELECT w, bit_or(m) AS bits FROM ("
        + bloom_cells_sql("bench", "h", "1 AS one")
        + ") GROUP BY w), "
        "pc AS (" + bloom_cells_sql("corpus", "h", "doc_id, h") + "), "
        "flag AS (SELECT doc_id, h, "
        "MIN(CASE WHEN bits IS NOT NULL AND (bits & m) = m THEN 1 ELSE 0 END) = 1 "
        "AS in_bloom FROM pc LEFT JOIN bsk USING (w) GROUP BY doc_id, h), "
        "totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id), "
        "np AS (SELECT doc_id, COUNT(*) AS n_bloom_pass FROM flag WHERE in_bloom GROUP BY doc_id), "
        "nh AS (SELECT doc_id, COUNT(*) AS n_hit FROM flag "
        "WHERE in_bloom AND h IN (SELECT h FROM bench) GROUP BY doc_id) "
        "SELECT totals.doc_id AS doc_id, CAST(n_grams AS BIGINT) AS n_grams, "
        "CAST(COALESCE(n_bloom_pass, 0) AS BIGINT) AS n_bloom_pass, "
        "CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit, "
        "COALESCE(CAST(n_hit AS DOUBLE) / n_grams, 0.0) AS frac, "
        f"CAST(COALESCE(CAST(n_hit AS DOUBLE) / n_grams, 0.0) >= {float(threshold)!r} AS BIGINT) AS contaminated "
        "FROM totals LEFT JOIN np USING (doc_id) LEFT JOIN nh USING (doc_id)"
    )


# --- incremental decontamination (round 9) ----------------------------------

def contamination_index(
    docs: DataFrame, benchmark_source: str = "src0", k: int = 8
) -> DataFrame:
    """(h): the distinct benchmark k-gram hash set — the relation a
    decontamination service builds ONCE per benchmark release and
    persists; every subsequent crawl increment is scored against it
    without ever re-reading benchmark text (the dedup_incremental
    pattern applied to contamination; reference analogue: the
    create-on-first-write dscache, receiver/dscache.go:1)."""
    return (
        docs.where(F.col("source") == benchmark_source)
        .select(words(F.col("text")).alias("w"))
        .select(F.explode(shingles_of(F.col("w"), k)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )


def contamination_incremental(
    spark,
    index_path: str,
    increment: DataFrame,
    k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """contamination_check for a NEW crawl increment against the
    PERSISTED benchmark gram index — (doc_id, n_grams, n_hit, frac,
    contaminated), the exact relation a full contamination_check run
    would emit for these docs (per-doc output depends only on the
    doc's own grams and the benchmark set, so incremental ≡ full-run-
    filtered; the oracle states that equivalence directly).

    Scale shape: only the increment's text is read and shingled; the
    benchmark side enters as a parquet scan of md5 hashes (32 bytes a
    gram, no text) that BROADCASTS into the increment's gram relation
    — a real benchmark suite's distinct-gram set is millions of rows,
    broadcastable forever, and when it isn't the Bloom pre-filter
    variant (bloom_decontaminate) takes over. The only shuffles are
    increment-sized (the per-doc distinct + the two counts)."""
    bench = spark.read.parquet(index_path)
    grams = (
        increment.select("doc_id", words(F.col("text")).alias("w"))
        .select("doc_id", F.explode(shingles_of(F.col("w"), k)).alias("g"))
        .select("doc_id", F.md5("g").alias("h"))
        .distinct()
    )
    hits = grams.join(F.broadcast(bench), "h", "left_semi")
    totals = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    nhit = hits.groupBy("doc_id").agg(F.count("*").alias("n_hit"))
    frac = F.col("n_hit").cast("double") / F.col("n_grams")
    return (
        totals.join(nhit, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.coalesce(frac, F.lit(0.0)).alias("frac"),
        )
        .withColumn(
            "contaminated",
            (F.col("frac") >= float(threshold)).cast("bigint"),
        )
    )


def contamination_incremental_sql(
    mod: int,
    benchmark_source: str = "src0",
    k: int = 8,
    threshold: float = 0.5,
) -> str:
    # the claimed equivalence stated directly: the FULL-corpus
    # contamination run, filtered to the increment's doc_ids
    return (
        "SELECT doc_id, n_grams, n_hit, frac, contaminated FROM ("
        + contamination_check_sql(benchmark_source, k, threshold)
        + f") WHERE doc_id % {mod} = 0"
    )


def _boiler_parts(docs: DataFrame, k: int, min_docs: int):
    """Shared internals of the boilerplate family: returns
    (stats, cleaned) — per-doc chunk counts and the reassembled
    cleaned text relation (doc_id, cleaned)."""
    # persist: see span_dedup's base comment (projection collapse
    # re-inlines words(text) into the passage lambda under Generate).
    # spread_small first: the documents scan is ONE task locally and
    # the regex split + passage explode are per-row (model.spread_small
    # docstring has the measurements; no-op at cluster scale).
    base = spread_small(docs).select(
        "doc_id", words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        "w",
        F.floor(F.size("w") / k).cast("bigint").alias("nch"),
    ).persist()  # fence: returned plan reads this cache
    ch = (
        base.select(
            "doc_id", F.posexplode(_passages_of(F.col("w"), k)).alias("i", "p")
        )
        .select("doc_id", F.col("i").cast("bigint").alias("i"), "p",
                F.md5("p").alias("h"))
    )
    spread = (
        ch.select("doc_id", "h").distinct()
        .groupBy("h").agg(F.count("*").alias("n_docs"))
    )
    judged = ch.join(spread, "h").select(
        "doc_id", "i", "p", (F.col("n_docs") < min_docs).alias("keep")
    )
    stats = judged.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept_chunks"),
    )
    tail = base.where(F.size("w") % k != 0).select(
        "doc_id",
        F.col("nch").alias("i"),
        F.array_join(
            F.slice(
                F.col("w"),
                (F.col("nch") * k + 1).cast("int"),
                (F.size("w") - F.col("nch") * k).cast("int"),
            ),
            " ",
        ).alias("p"),
    )
    cleaned = (
        judged.where(F.col("keep")).select("doc_id", "i", "p")
        .unionByName(tail)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "p"))),
                    lambda st: st["p"],
                ),
                " ",
            ).alias("cleaned")
        )
    )
    return stats, cleaned


def boilerplate_clean_docs(
    docs: DataFrame, k: int = 16, min_docs: int = 2
) -> DataFrame:
    """The cleaned CORPUS as a documents-shaped relation (doc_id,
    text, lang, source, n_chars) — boilerplate_strip's transform with
    the text carried instead of hashed, so downstream operators
    (quality gates, dedup, packing) can run ON the cleaned corpus.
    Same shuffle shape as boilerplate_strip."""
    _, cleaned = _boiler_parts(docs, k, min_docs)
    return (
        docs.select("doc_id", "lang", "source").distinct()
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cleaned", F.lit("")).alias("text"),
            "lang",
            "source",
            F.length(F.coalesce("cleaned", F.lit(""))).cast("bigint").alias(
                "n_chars"
            ),
        )
    )


def boilerplate_strip(docs: DataFrame, k: int = 16, min_docs: int = 2) -> DataFrame:
    """CCNet-style cross-document boilerplate REMOVAL (the cleaning
    step whose profile passage_dedup measures): every non-overlapping
    k-word chunk that occurs in >= ``min_docs`` DISTINCT documents is
    stripped, and each document is reassembled in chunk order from its
    surviving chunks plus the (<k-word) tail, which is always kept.
    Output: (doc_id, n_chunks, kept_chunks, removed_frac, clean_hash,
    clean_chars) — the hash/length of the CLEANED text stand in for
    shipping the text itself through the correctness gate.

    Scale shape: the only non-doc-keyed shuffle is the chunk-hash
    groupBy, bounded by the DISTINCT chunk domain (boilerplate is by
    definition low-cardinality); reassembly shuffles (i, chunk) rows
    co-keyed by doc_id — linear in corpus words / k, no all-pairs
    anywhere. Reference analogue: none (the reference has no corpus
    ops); this is the CCNet dedup deployment shape.
    """
    stats, cleaned = _boiler_parts(docs, k, min_docs)
    return (
        docs.select("doc_id").distinct()
        .join(stats, "doc_id", "left")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("kept_chunks", F.lit(0)).cast("bigint").alias(
                "kept_chunks"
            ),
            F.when(
                F.coalesce("n_chunks", F.lit(0)) > 0,
                (F.col("n_chunks") - F.col("kept_chunks")).cast("double")
                / F.col("n_chunks"),
            ).alias("removed_frac"),
            F.md5(F.coalesce("cleaned", F.lit(""))).alias("clean_hash"),
            F.length(F.coalesce("cleaned", F.lit(""))).cast("bigint").alias(
                "clean_chars"
            ),
        )
    )


def _boiler_ctes(k: int = 16, min_docs: int = 2) -> str:
    """Shared CTE chain (base…cleaned) of the boilerplate family —
    reads the `documents` relation in scope (view or shadowing CTE)."""
    w = WORDS_SQL.format(c="text")
    joined = " || ' ' || ".join(f"w[i * {k} + {j + 1}]" for j in range(k))
    return f"""base AS (
  SELECT doc_id, ({w}) AS w,
         CAST(FLOOR(len(({w})) / {k}) AS BIGINT) AS nch
  FROM documents
),
ch AS (
  SELECT doc_id,
         UNNEST(range(0, nch)) AS i,
         UNNEST(list_transform(range(0, nch), i -> {joined})) AS p
  FROM base
),
ch2 AS (SELECT doc_id, i, p, md5(p) AS h FROM ch),
spread AS (
  SELECT h, COUNT(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, h FROM ch2) GROUP BY h
),
judged AS (
  SELECT c.doc_id, c.i, c.p, (s.n_docs < {min_docs}) AS keep
  FROM ch2 c JOIN spread s USING (h)
),
stats AS (
  SELECT doc_id, COUNT(*) AS n_chunks,
         SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS kept_chunks
  FROM judged GROUP BY doc_id
),
tail AS (
  SELECT doc_id, nch AS i,
         array_to_string(w[CAST(nch * {k} + 1 AS BIGINT):], ' ') AS p
  FROM base WHERE len(w) % {k} <> 0
),
cleaned AS (
  SELECT doc_id, COALESCE(string_agg(p, ' ' ORDER BY i), '') AS cleaned
  FROM (SELECT doc_id, i, p FROM judged WHERE keep
        UNION ALL SELECT doc_id, i, p FROM tail)
  GROUP BY doc_id
)"""


def boilerplate_clean_docs_sql(k: int = 16, min_docs: int = 2) -> str:
    """The cleaned corpus as a documents-shaped relation."""
    return f"""
WITH {_boiler_ctes(k, min_docs)}
SELECT d.doc_id, COALESCE(cl.cleaned, '') AS text, d.lang, d.source,
       CAST(length(COALESCE(cl.cleaned, '')) AS BIGINT) AS n_chars
FROM (SELECT DISTINCT doc_id, lang, source FROM documents) d
LEFT JOIN cleaned cl ON cl.doc_id = d.doc_id
"""


def boilerplate_strip_sql(k: int = 16, min_docs: int = 2) -> str:
    return f"""
WITH {_boiler_ctes(k, min_docs)}
SELECT d.doc_id,
       CAST(COALESCE(st.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(st.kept_chunks, 0) AS BIGINT) AS kept_chunks,
       CASE WHEN COALESCE(st.n_chunks, 0) > 0
            THEN CAST(st.n_chunks - st.kept_chunks AS DOUBLE) / st.n_chunks
       END AS removed_frac,
       md5(COALESCE(cl.cleaned, '')) AS clean_hash,
       CAST(length(COALESCE(cl.cleaned, '')) AS BIGINT) AS clean_chars
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN stats st ON st.doc_id = d.doc_id
LEFT JOIN cleaned cl ON cl.doc_id = d.doc_id
"""


def span_dedup2(
    docs: DataFrame, k_short: int = 16, k_long: int = 64
) -> DataFrame:
    """Two-granularity span duplication profile (round 10, span_dedup
    one step deeper): the k=16 window catches any alignment of short
    shared substrings but reads boilerplate phrases and whole
    duplicated paragraphs IDENTICALLY — a doc sprinkled with common
    16-word idioms and a doc containing a verbatim 64-word paragraph
    can show the same covered_frac. Lee et al.'s metric reads
    differently at paragraph scale, so this runs the same interval-
    union machinery at BOTH granularities and reconciles per doc:

      (doc_id, n_words, covered_short, covered_long, frac_short,
       frac_long, long_share)

    where long_share = covered_long / covered_short is the fraction of
    the doc's short-window coverage attributable to paragraph-scale
    duplication (a k_long duplicate makes all its k_short subwindows
    duplicates too, so covered_long ⊆ covered_short structurally —
    long_share ∈ [0,1] and the pytest pins both extremes). A prep run
    cuts on frac_long for paragraph dedup and on frac_short −
    frac_long for boilerplate.

    Scale: ONE text scan — the words array materializes once and both
    window relations derive from it; each granularity's span relation
    shuffles once on uniform md5 keys; position explodes run on
    DUPLICATED windows only (the spread filter first). Division
    guards per the CLAUDE.md rule."""
    # Persist the WORDS array only (VERDICT r11 finding 1's exact
    # prescription): 1x text, never the two shingle arrays (~80x text,
    # the r11 regression). The persist is NOT optional: with w left
    # lazy, any consumer that needs the full row (the oracle's collect,
    # prep_weights' frac_long projection, a noop sink) lets Catalyst
    # collapse the projection and re-inline words(text) into the
    # shingles_of lambdas — the regex split re-runs PER ARRAY ELEMENT
    # and the query goes quadratic in words-per-doc (measured r12:
    # 87 s for prep_weights' pruned consumer at sf0.1, 18.7 s for the
    # oracle's sf0.01 collect, vs ~1 s with w concrete; bench's
    # count() timing hid it because count-pruning keeps the Generates
    # separate). A cached (doc_id, w) row is the smallest barrier that
    # blocks the re-inline for EVERY consumer shape.
    wrel = spread_small(docs).select(
        "doc_id", words(F.col("text")).alias("w")
    ).persist()  # fence: returned plan reads this cache
    base = wrel.select(
        "doc_id",
        F.size("w").alias("n_words"),
        shingles_of(F.col("w"), k_short).alias("gs"),
        shingles_of(F.col("w"), k_long).alias("gl"),
    )

    def covered(col, k):
        spans = base.select(
            "doc_id", F.posexplode(col).alias("p", "g")
        ).select("doc_id", (F.col("p") + 1).alias("s"), F.md5("g").alias("h"))
        spread = (
            spans.select("doc_id", "h")
            .distinct()
            .groupBy("h")
            .agg(F.count("*").alias("n_docs"))
            .where(F.col("n_docs") >= 2)
            .select("h")
        )
        dup = spans.join(spread, "h", "left_semi")
        return (
            dup.select(
                "doc_id",
                F.explode(
                    F.sequence(F.col("s"), F.col("s") + F.lit(k - 1))
                ).alias("pos"),
            )
            .distinct()
            .groupBy("doc_id")
            .agg(F.count("*").alias(f"cov{k}"))
        )

    ids = docs.select("doc_id").distinct()
    nw = base.select("doc_id", "n_words")
    cs = covered(F.col("gs"), k_short)
    cl = covered(F.col("gl"), k_long)
    covs = F.coalesce(F.col(f"cov{k_short}"), F.lit(0)).cast("bigint")
    covl = F.coalesce(F.col(f"cov{k_long}"), F.lit(0)).cast("bigint")
    return (
        ids.join(nw, "doc_id", "left")
        .join(cs, "doc_id", "left")
        .join(cl, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            covs.alias("covered_short"),
            covl.alias("covered_long"),
            F.when(
                F.coalesce("n_words", F.lit(0)) > 0,
                covs.cast("double") / F.col("n_words"),
            ).alias("frac_short"),
            F.when(
                F.coalesce("n_words", F.lit(0)) > 0,
                covl.cast("double") / F.col("n_words"),
            ).alias("frac_long"),
            F.when(covs > 0, covl.cast("double") / covs).alias("long_share"),
        )
    )


def span_dedup2_sql(k_short: int = 16, k_long: int = 64) -> str:
    w = WORDS_SQL.format(c="text")

    def cov_cte(k: int, name: str) -> str:
        return (
            f"sp{name} AS (SELECT doc_id, "
            f"UNNEST(range(1, CASE WHEN len(w) >= {k} "
            f"THEN len(w) - {k - 2} ELSE 1 END)) AS s, "
            f"md5(UNNEST({_shingles_from_w_slice_sql(k)})) AS h FROM base), "
            f"spread{name} AS (SELECT h FROM "
            f"(SELECT DISTINCT doc_id, h FROM sp{name}) "
            f"GROUP BY h HAVING COUNT(*) >= 2), "
            f"dup{name} AS (SELECT doc_id, s FROM sp{name} "
            f"WHERE h IN (SELECT h FROM spread{name})), "
            f"cov{name} AS (SELECT doc_id, COUNT(*) AS cov{name} FROM ("
            f"SELECT DISTINCT doc_id, UNNEST(range(s, s + {k})) AS pos "
            f"FROM dup{name}) GROUP BY doc_id)"
        )

    return (
        f"WITH base AS (SELECT doc_id, ({w}) AS w FROM documents), "
        f"{cov_cte(k_short, 's')}, {cov_cte(k_long, 'l')}, "
        "nw AS (SELECT doc_id, len(w) AS n_words FROM base) "
        "SELECT ids.doc_id, "
        "CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words, "
        "CAST(COALESCE(covs, 0) AS BIGINT) AS covered_short, "
        "CAST(COALESCE(covl, 0) AS BIGINT) AS covered_long, "
        "CASE WHEN COALESCE(n_words, 0) > 0 THEN "
        "CAST(COALESCE(covs, 0) AS DOUBLE) / n_words END AS frac_short, "
        "CASE WHEN COALESCE(n_words, 0) > 0 THEN "
        "CAST(COALESCE(covl, 0) AS DOUBLE) / n_words END AS frac_long, "
        "CASE WHEN COALESCE(covs, 0) > 0 THEN "
        "CAST(COALESCE(covl, 0) AS DOUBLE) / covs END AS long_share "
        "FROM (SELECT DISTINCT doc_id FROM documents) ids "
        "LEFT JOIN nw USING (doc_id) "
        "LEFT JOIN covs USING (doc_id) "
        "LEFT JOIN covl USING (doc_id)"
    )


# --- span-dedup REMOVAL transform (round 11) ----------------------------------


def span_scrub(docs: DataFrame, k: int = 16) -> DataFrame:
    """Span-level dedup EXECUTE step (round 11): span_dedup /
    span_dedup2 MEASURE cross-document span duplication; this one
    EXCISES it, the way Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") actually delete duplicated
    substrings rather than discount whole documents. Rule:
    keep-first-occurrence — for every k-word window whose hash occurs
    in >= 2 DISTINCT documents, the corpus-min doc_id is the authority
    and keeps its text; every LATER document cuts the union of its
    covered word ranges (the same interval-union machinery as
    span_dedup, but consumed as a removal mask instead of a coverage
    count). Output mirrors boilerplate_strip's hash-checked transform
    contract: (doc_id, n_words, removed_words, removed_frac,
    clean_hash, clean_chars) where clean_hash = md5 of the CLEANED
    text (surviving words in original order, space-joined) — the
    transform itself is what the correctness gate hashes.

    Scale shape: ONE text scan feeds the words array; the only
    non-doc-keyed shuffle is the span-hash groupBy (uniform md5 keys,
    bounded by the distinct window domain); the authority relation is
    pre-filtered to multi-doc hashes BEFORE joining back so the
    removal join is duplicated-spans-sized, not corpus-sized;
    reassembly shuffles (pos, word) rows co-keyed by doc_id — linear
    in corpus words, no all-pairs anywhere. Reference analogue: none
    (the reference has no corpus ops); this is the ExactSubstr
    deployment shape. Division guarded per the CLAUDE.md rule."""
    # persist: see span_dedup's base comment (projection collapse
    # re-inlines words(text) into the shingle lambda under Generate)
    base = spread_small(docs).select(
        "doc_id", words(F.col("text")).alias("w")
    ).persist()  # fence: returned plan reads this cache
    spans = base.select(
        "doc_id", F.posexplode(shingles_of(F.col("w"), k)).alias("p", "g")
    ).select("doc_id", (F.col("p") + 1).alias("s"), F.md5("g").alias("h"))
    auth = (
        spans.groupBy("h")
        .agg(
            F.min("doc_id").alias("min_doc"),
            F.count_distinct("doc_id").alias("nd"),
        )
        .where(F.col("nd") >= 2)
        .select("h", "min_doc")
    )
    rem = spans.join(auth, "h").where(F.col("doc_id") > F.col("min_doc"))
    cov = rem.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("s"), F.col("s") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()
    widx = base.select(
        "doc_id", F.posexplode("w").alias("p", "word")
    ).select("doc_id", (F.col("p") + 1).alias("pos"), "word")
    kept = widx.join(cov, ["doc_id", "pos"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "word"))),
                lambda st: st["word"],
            ),
            " ",
        ).alias("cleaned"),
        F.count("*").alias("kept_words"),
    )
    nw = base.select("doc_id", F.size("w").alias("n_words"))
    ids = docs.select("doc_id").distinct()
    nwc = F.coalesce("n_words", F.lit(0)).cast("bigint")
    keptc = F.coalesce("kept_words", F.lit(0)).cast("bigint")
    return (
        ids.join(nw, "doc_id", "left")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            nwc.alias("n_words"),
            (nwc - keptc).alias("removed_words"),
            F.when(
                nwc > 0, (nwc - keptc).cast("double") / F.col("n_words")
            ).alias("removed_frac"),
            F.md5(F.coalesce("cleaned", F.lit(""))).alias("clean_hash"),
            F.length(F.coalesce("cleaned", F.lit(""))).cast("bigint").alias(
                "clean_chars"
            ),
        )
    )


def span_scrub_sql(k: int = 16) -> str:
    w = WORDS_SQL.format(c="text")
    return f"""
WITH base AS (SELECT doc_id, ({w}) AS w FROM documents),
sp AS (
  SELECT doc_id,
         UNNEST(range(1, CASE WHEN len(w) >= {k}
                       THEN len(w) - {k - 2} ELSE 1 END)) AS s,
         md5(UNNEST({_shingles_from_w_slice_sql(k)})) AS h
  FROM base
),
auth AS (
  SELECT h, MIN(doc_id) AS min_doc
  FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
rem AS (SELECT doc_id, s FROM sp JOIN auth USING (h) WHERE doc_id > min_doc),
cov AS (SELECT DISTINCT doc_id, UNNEST(range(s, s + {k})) AS pos FROM rem),
widx AS (
  SELECT doc_id, UNNEST(range(1, len(w) + 1)) AS pos, UNNEST(w) AS word
  FROM base
),
kept AS (
  SELECT wi.doc_id, wi.pos, wi.word
  FROM widx wi LEFT JOIN cov c ON c.doc_id = wi.doc_id AND c.pos = wi.pos
  WHERE c.pos IS NULL
),
cleaned AS (
  SELECT doc_id, COALESCE(string_agg(word, ' ' ORDER BY pos), '') AS cleaned,
         COUNT(*) AS kept_words
  FROM kept GROUP BY doc_id
),
nw AS (SELECT doc_id, len(w) AS n_words FROM base)
SELECT ids.doc_id,
       CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(n_words, 0) - COALESCE(kept_words, 0) AS BIGINT)
         AS removed_words,
       CASE WHEN COALESCE(n_words, 0) > 0
            THEN CAST(COALESCE(n_words, 0) - COALESCE(kept_words, 0)
                      AS DOUBLE) / n_words
       END AS removed_frac,
       md5(COALESCE(cleaned, '')) AS clean_hash,
       CAST(length(COALESCE(cleaned, '')) AS BIGINT) AS clean_chars
FROM (SELECT DISTINCT doc_id FROM documents) ids
LEFT JOIN nw USING (doc_id)
LEFT JOIN cleaned USING (doc_id)
"""
