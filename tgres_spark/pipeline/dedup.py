"""Deduplication operators for large-scale document corpora.

Beyond the reference's surface (SURVEY §2.8): exact hash dedup,
MinHash+LSH banding, SimHash hamming buckets, n-gram Jaccard joins.

Cross-engine determinism trick used throughout: md5 hex strings are
identical in Spark and DuckDB, and the lexicographic MIN of fixed-
width lowercase hex equals the numeric min — so MinHash signatures,
band keys and fingerprints never need hex→int conversion.

Scale posture: everything is explode → groupBy/join on hashed keys.
The LSH band join is the classic way to avoid the O(n²) pair blowup:
candidates only form within a band bucket. Band keys are md5s —
uniformly distributed, so the shuffle is skew-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..model import literal_df, spread_small

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = 4


# --- shared text prep ------------------------------------------------------

def words(col):
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != ""
    )


WORDS_SQL = "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), x -> x <> '')"


def shingles_of(w, k: int = 3):
    """k-word shingles from an ALREADY-MATERIALIZED words array column.

    Critical: pass a bound column, not the words() expression — Spark
    does not common-subexpression-eliminate inside higher-order-function
    lambdas, so an inlined split would recompute the full regex split
    for every element (O(words²) per doc; measured 12s vs 1s at sf0.1).
    """
    n = F.size(w)
    # the empty branch must be a real empty array: sequence(1, 0)
    # steps DOWNWARD to [1, 0] (Spark auto-negates the step), and the
    # phantom indices then drive element_at out of bounds under ANSI
    # for any doc shorter than k words
    empty = F.slice(F.sequence(F.lit(1), F.lit(1)), 1, 0)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(empty)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(k)]
        ),
    )


def shingles(col, k: int = 3):
    """Convenience wrapper for small inputs; hot paths should project
    words() to a column and call shingles_of (see docstring there)."""
    return shingles_of(words(col), k)


def _sized_shingle_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, shs): each doc's DISTINCT shingle ARRAY — the shared
    base of every exact-Jaccard verification join, persisted as ONE
    1x-text-sized row per doc (the span_dedup2 words-array rule).
    Without the fence each of the three consumers (the doc-size
    relation and both explode sides of the intersection join) re-ran
    the tokenize + shingle + array_distinct chain from the raw corpus
    scan. Callers derive, via _shd_sizes: shd = explode(shs)
    (identical rows) and sizes = size(shs) filtered to > 0 (identical
    to count-by-doc of shd, which only saw docs with >= 1 shingle) —
    the groupBy exchange the old sizes paid comes free from the array.
    The persist must outlive the caller's action (returned plans read
    it); the sweep harnesses clearCache() between queries."""
    return (
        spread_small(docs)
        .select("doc_id", words(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.array_distinct(shingles_of(F.col("w"))).alias("shs"),
        )
        .persist()  # fence: returned plan reads this cache
    )


def _shd_sizes(sha: DataFrame):
    """(shd, sizes) derived from a _sized_shingle_arrays relation:
    the exploded (doc_id, sh) rows and the (doc_id, nsh) doc sizes,
    both reading the one cached array column."""
    shd = sha.select("doc_id", F.explode("shs").alias("sh"))
    sizes = sha.where(F.size("shs") > 0).select(
        "doc_id", F.size("shs").cast("bigint").alias("nsh")
    )
    return shd, sizes


def shingles_sql(c: str, k: int = 3) -> str:
    w = WORDS_SQL.format(c=c)
    joined = " || ' ' || ".join(f"__w[i + {j}]" for j in range(k))
    return (
        f"list_transform(range(1, CASE WHEN len(__w) >= {k} THEN len(__w) - {k - 2} ELSE 1 END), "
        f"i -> {joined})".replace("__w", f"({w})")
    )


# --- exact dedup -----------------------------------------------------------

def dedup_exact(docs: DataFrame) -> DataFrame:
    """Group identical texts by md5; keeper = lowest doc_id.
    One groupBy — at 100 TB this is a single skew-free shuffle on a
    uniform 128-bit key."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(
            F.count("*").cast("bigint").alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
        )
        .select("h", "n_dups", "keeper_id")
    )


DEDUP_EXACT_SQL = (
    "SELECT md5(text) AS h, COUNT(*) AS n_dups, MIN(doc_id) AS keeper_id "
    "FROM documents GROUP BY md5(text)"
)


# --- MinHash + LSH ---------------------------------------------------------

def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig array<string>): 16 32-bit minhash components.

    Hash budget: 4 salted md5s per shingle, each sliced into 4
    8-hex-char (32-bit) pieces — 16 independent-enough components at a
    quarter of the hashing cost of 16 full md5s (the standard 32-bit
    minhash construction). Lexicographic min of fixed-width hex is
    numeric min, so Spark and DuckDB agree with no hex→int step.

    No dedup of (doc, shingle) pairs: MIN is idempotent under
    duplicates, and skipping the distinct removes an entire shuffle of
    the exploded shingle relation — the largest intermediate in the
    whole pipeline. Map-side partial aggregation collapses each
    partition to one 16-column row per doc before the only shuffle."""
    sh = spread_small(docs).select("doc_id", words(F.col("text")).alias("w")).select(
        "doc_id", F.explode(shingles_of(F.col("w"))).alias("sh")
    )
    salts = ["", "a:", "b:", "c:"]
    # The 4 salted md5s are materialized as columns BEFORE the agg:
    # Spark does not CSE across aggregate expressions, so inlining the
    # md5 into each of the 16 min()s would hash every shingle 16×
    # instead of 4× (measured ~2× on the whole signature pass).
    hx = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(salt), F.col("sh"))).alias(f"m{j}")
            for j, salt in enumerate(salts)
        ],
    )
    aggs = []
    for i in range(N_HASHES):
        piece = i % 4
        aggs.append(
            F.min(
                F.substring(F.col(f"m{i // 4}"), piece * 8 + 1, 8)
            ).alias(f"h{i}")
        )
    sig = hx.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(N_HASHES)]).alias("sig")
    )


def minhash_signatures_sql(rel: str = "documents") -> str:
    sh = (
        f"SELECT DISTINCT doc_id, UNNEST({shingles_sql('text')}) AS sh FROM {rel}"
    )
    salts = ["", "a:", "b:", "c:"]
    aggs = []
    for i in range(N_HASHES):
        salt, piece = salts[i // 4], i % 4
        aggs.append(
            f"MIN(substr(md5('{salt}' || sh), {piece * 8 + 1}, 8)) AS h{i}"
        )
    cols = ", ".join(f"h{i}" for i in range(N_HASHES))
    return (
        f"SELECT doc_id, [{cols}] AS sig FROM "
        f"(SELECT doc_id, {', '.join(aggs)} FROM ({sh}) GROUP BY doc_id)"
    )


def dedup_minhash_lsh(docs: DataFrame) -> DataFrame:
    """LSH-banded candidate pairs with estimated Jaccard = fraction of
    matching minhash components. Returns (doc_a, doc_b, est_sim).

    The signature relation is persisted: it feeds the band explode AND
    both sides of the similarity rejoin — without it the whole
    shingle→md5 pipeline runs three times. Signatures are tiny
    (16 hex strings per doc), so this caches gigabytes per 100 TB of
    raw text, not terabytes."""
    sig = minhash_signatures(docs).persist()  # fence: returned plan reads this cache
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * ROWS_PER_BAND + j + 1)
                                    for j in range(ROWS_PER_BAND)
                                ],
                            )
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.sequence(F.lit(1), F.lit(N_HASHES)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(F.element_at("sig_a", i) == F.element_at("sig_b", i), 1).otherwise(0),
    ) / float(N_HASHES)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.cast("double").alias("est_sim"))
    )


def dedup_minhash_lsh_sql(rel: str = "documents") -> str:
    sig = minhash_signatures_sql(rel)
    sep = " || '|' || "
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5({sep.join(f'sig[{b * ROWS_PER_BAND + j + 1}]' for j in range(ROWS_PER_BAND))}) AS key "
        f"FROM s"
        for b in range(N_BANDS)
    )
    est = (
        f"list_sum(list_transform(range(1, {N_HASHES + 1}), "
        f"i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / {float(N_HASHES)!r}"
    )
    return (
        f"WITH s AS ({sig}), bands AS ({band_rows}), "
        "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key "
        "WHERE a.doc_id < b.doc_id) "
        f"SELECT p.doc_a AS doc_a, p.doc_b AS doc_b, CAST({est} AS DOUBLE) AS est_sim "
        "FROM pairs p JOIN s sa ON p.doc_a = sa.doc_id JOIN s sb ON p.doc_b = sb.doc_id"
    )


def dedup_minhash_est(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, est_sim, jaccard, abs_err): minhash estimation
    accuracy on the LSH candidate pairs — the signature-agreement
    estimate next to the EXACT shingle Jaccard it approximates, plus
    the absolute error. The accuracy half of the minhash dial, like
    ann_lsh_recall for the hyperplane index.

    Scale shape: exact Jaccard is computed ONLY for LSH candidates
    (bucket-local, ~linear in corpus size), never all pairs; the pair
    list is the small side of both shingle joins, and the intersection
    count groups on uniform (doc_a, doc_b) keys. Determinism: integer
    set sizes, one double division with identical op order, ABS of
    identical doubles."""
    pairs = dedup_minhash_lsh(docs)
    shd, sizes = _shd_sizes(_sized_shingle_arrays(docs))
    a = shd.select(F.col("doc_id").alias("doc_a"), "sh")
    b = shd.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    ni = F.coalesce(F.col("ni"), F.lit(0))
    jacc = ni.cast("double") / (F.col("na") + F.col("nb") - ni)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "est_sim",
            jacc.alias("jaccard"),
            F.abs(F.col("est_sim") - jacc).alias("abs_err"),
        )
    )


def dedup_minhash_est_sql() -> str:
    sh = f"SELECT DISTINCT doc_id, UNNEST({shingles_sql('text')}) AS sh FROM documents"
    jacc = "CAST(COALESCE(i.ni, 0) AS DOUBLE) / (sa.na + sb.nb - COALESCE(i.ni, 0))"
    return f"""
WITH p AS (SELECT * FROM ({dedup_minhash_lsh_sql()}) q),
shd AS ({sh}),
sz AS (SELECT doc_id, COUNT(*) AS nsh FROM shd GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS ni
  FROM p
  JOIN shd a ON a.doc_id = p.doc_a
  JOIN shd b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b
)
SELECT p.doc_a, p.doc_b, p.est_sim,
       {jacc} AS jaccard,
       ABS(p.est_sim - {jacc}) AS abs_err
FROM p
JOIN (SELECT doc_id AS doc_a, nsh AS na FROM sz) sa USING (doc_a)
JOIN (SELECT doc_id AS doc_b, nsh AS nb FROM sz) sb USING (doc_b)
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
"""


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4          # pigeonhole tables: 4 × 16-bit chunks
CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word md5s, materialized as FOUR 16-bit
    chunks (doc_id, q0..q3): bit b of the hash is the sign of the
    count-weighted sum of +/-1 over tokens (bit b of the token md5's
    first 16 hex chars). Chunked storage sidesteps signed-64-bit
    assembly (1<<63 overflows a BIGINT in both engines) AND is exactly
    the shape the pigeonhole blocking join needs;
    hamming(a,b) = sum_j bit_count(xor(a.qj, b.qj)).

    Bit indexing (shared with the oracle SQL): bit b lives in hex char
    c = b//4 at nibble position k = b%4, i.e. at shift (7 - c%8)*4 + k
    of the big-endian 32-bit half h[c//8], parsed with two conv()
    calls per distinct word (occurrences are pre-collapsed to
    (doc, word, count); the sign sum weights by count, integer-exact
    vs per-occurrence, so the oracle SQL needs no change).

    Shape note: an earlier version computed the 64 sign sums as 64
    wide CASE aggregates in one groupBy — semantically identical, but
    whole-stage codegen took ~5s to COMPILE the plan (measured: first
    run 7.8s, warm 2.3s at sf0.1). This version explodes bit 0..63 as
    rows and uses two tiny-expression groupBys instead: same
    O(64 * words) arithmetic, near-zero compile time, and both
    shuffles hash on doc_id-prefixed keys with map-side combine (the
    (doc_id, bit) relation collapses to 64 rows/doc per partition
    before it moves)."""
    w = spread_small(docs).select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    wc = w.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("cnt"))
    hx = wc.select("doc_id", "cnt", F.md5("w").alias("h"))
    halves = hx.select(
        "doc_id",
        "cnt",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("v0"),
        F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("v1"),
    )
    # bit b: c = b//4 (hex char), k = b%4 (nibble bit); shift within
    # the 32-bit half is (7 - c%8)*4 + k and the half index is c//8.
    b = F.col("b")
    # Python's F.shiftright/left require a literal shift; the SQL
    # functions take expressions, hence F.expr for the two shifts.
    sign = F.expr(
        "CAST((shiftright(CASE WHEN b < 32 THEN v0 ELSE v1 END, "
        "CAST((7 - ((b DIV 4) % 8)) * 4 + b % 4 AS INT)) & 1) * 2 - 1 AS BIGINT)"
    )
    per_bit = (
        halves.select(
            "doc_id",
            "cnt",
            "v0",
            "v1",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum(sign * F.col("cnt")).alias("s"))
    )
    chunk = (b / CHUNK_BITS).cast("int")
    weight = F.when(
        F.col("s") > 0,
        F.expr(f"shiftleft(1, CAST(b % {CHUNK_BITS} AS INT))".format(CHUNK_BITS=CHUNK_BITS)),
    ).otherwise(F.lit(0))
    chunks = [
        F.sum(F.when(chunk == j, weight).otherwise(0)).cast("int").alias(f"q{j}")
        for j in range(SIMHASH_CHUNKS)
    ]
    return per_bit.groupBy("doc_id").agg(*chunks).select("doc_id", *[f"q{j}" for j in range(SIMHASH_CHUNKS)])


def simhash_sql() -> str:
    w = f"SELECT doc_id, UNNEST({WORDS_SQL.format(c='text')}) AS w FROM documents"
    hx = f"SELECT doc_id, md5(w) AS h FROM ({w})"
    nib_exprs = ", ".join(
        f"(CASE WHEN ascii(substr(h, {c + 1}, 1)) >= 97 "
        f"THEN ascii(substr(h, {c + 1}, 1)) - 87 "
        f"ELSE ascii(substr(h, {c + 1}, 1)) - 48 END) AS n{c}"
        for c in range(SIMHASH_BITS // 4)
    )
    nibs = f"SELECT doc_id, {nib_exprs} FROM ({hx})"
    bit_aggs = ", ".join(
        f"SUM(CASE WHEN ((n{b // 4} >> {b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    chunk_exprs = ", ".join(
        "CAST("
        + " + ".join(
            f"CASE WHEN b{j * CHUNK_BITS + i} > 0 THEN {1 << i} ELSE 0 END"
            for i in range(CHUNK_BITS)
        )
        + f" AS INTEGER) AS q{j}"
        for j in range(SIMHASH_CHUNKS)
    )
    return (
        f"SELECT doc_id, {chunk_exprs} FROM "
        f"(SELECT doc_id, {bit_aggs} FROM ({nibs}) GROUP BY doc_id)"
    )


def _simhash_keys(sh: DataFrame) -> DataFrame:
    """Blocking-key relation: one row per (doc, table) carrying ALL
    four chunks — table j keys on chunk q_j. Carrying the chunks
    through the explode lets the candidate self-join compute hamming
    directly (no rejoin against the signature relation, no persist);
    Spark's ReusedExchange evaluates the relation once for both join
    sides."""
    return sh.select(
        "doc_id",
        *[F.col(f"q{j}") for j in range(SIMHASH_CHUNKS)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("tbl"), F.col(f"q{j}").alias("key")
                    )
                    for j in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("tk"),
    ).select("doc_id", *[f"q{j}" for j in range(SIMHASH_CHUNKS)], "tk.tbl", "tk.key")


def simhash_candidates(sh: DataFrame) -> DataFrame:
    """Distinct candidate pairs from 4-table pigeonhole blocking over
    the chunked simhash relation: table j keys on chunk q_j. Any pair
    within hamming ≤ 3 of the 64-bit hash differs in at most 3 of the
    4 chunks, so at least one chunk matches exactly and the pair lands
    in that table's bucket — the candidate set PROVABLY contains every
    true pair (no recall loss, unlike prefix bucketing).

    Scale: each join key is (table, 16-bit chunk) — 4 × 65536 uniform
    buckets (md5-derived sign sums), a 256× finer blocking than the
    old 256-bucket scheme; expected bucket size N/65536 per table."""
    keys = _simhash_keys(sh)
    return (
        keys.alias("a")
        .join(keys.alias("b"), ["tbl", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def chunk_hamming_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with 64-bit hamming ≤ max_hamming
    over ANY (doc_id, q0..q3) 4×16-bit signature relation — the
    shared pigeonhole engine: exact for max_hamming ≤ 3 (a pair
    differing in ≤3 of 4 chunks matches at least one chunk exactly),
    one self-join shuffle on the uniform (table, chunk) key. Used by
    dedup_simhash (text) and mm_phash_dedup (image fingerprints) —
    the blocking doesn't care what hashed the bits."""
    keys = _simhash_keys(sig)
    ham = None
    for j in range(SIMHASH_CHUNKS):
        term = F.bit_count(F.col(f"a.q{j}").bitwiseXOR(F.col(f"b.q{j}")))
        ham = term if ham is None else ham + term
    return (
        keys.alias("a")
        .join(keys.alias("b"), ["tbl", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
    )


def dedup_simhash(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs with 64-bit simhash hamming ≤ max_hamming.

    Exact over the hash for max_hamming ≤ 3 (pigeonhole blocking, see
    simhash_candidates). One self-join shuffle on the uniform
    (table, chunk) key + one distinct; hamming is computed in the join
    projection from the carried chunks, and the hamming filter runs
    BEFORE the distinct so the dedup shuffle only carries true pairs."""
    return chunk_hamming_pairs(simhash(docs), max_hamming)


def dedup_simhash_sql(max_hamming: int = 3) -> str:
    sh = simhash_sql()
    cols = ", ".join(f"q{j}" for j in range(SIMHASH_CHUNKS))
    key_rows = " UNION ALL ".join(
        f"SELECT doc_id, {cols}, {j} AS tbl, q{j} AS key FROM s"
        for j in range(SIMHASH_CHUNKS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.q{j}, b.q{j}))" for j in range(SIMHASH_CHUNKS)
    )
    return (
        f"WITH s AS ({sh}), keys AS ({key_rows}) "
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"CAST({ham} AS BIGINT) AS hamming "
        "FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key "
        f"WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}"
    )


# --- n-gram Jaccard --------------------------------------------------------

def dedup_ngram_jaccard(
    docs: DataFrame, threshold: float = 0.2, max_df: int = 100
) -> DataFrame:
    """Word-bigram Jaccard similarity join, blocked by language, over
    the gram universe restricted to grams appearing in ≤ ``max_df``
    documents. Returns (doc_a, doc_b, jaccard ≥ threshold).

    Why the df cap: a gram appearing in d documents contributes d²
    candidate pairs — stop-bigrams ("of the") are hot keys that make
    the self-join near-quadratic AND skew a handful of shuffle
    partitions at 100 TB. Capping document frequency bounds every
    join key's fanout at max_df², turning worst-case quadratic into
    linear-in-docs. Semantics (documented deviation): Jaccard is
    computed over surviving grams only — per-doc sizes AND
    intersections both exclude capped grams, so it remains a true
    Jaccard on the restricted universe; ubiquitous grams carry no
    near-dup signal anyway. The df relation is computed in the same
    pass and joined on the (lang, g) key the self-join already
    shuffles on — co-partitioned, no extra exchange."""
    grams = (
        spread_small(docs).select("doc_id", "lang", words(F.col("text")).alias("w"))
        .select(
            "doc_id", "lang", F.explode(shingles_of(F.col("w"), k=2)).alias("g")
        )
        .distinct()
    )
    dfreq = (
        grams.groupBy("lang", "g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("lang", "g")
    )
    kept = grams.join(dfreq, ["lang", "g"])
    counts = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        kept.alias("a")
        .join(kept.alias("b"), ["lang", "g"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", jac.cast("double").alias("jaccard"))
    )


def dedup_ngram_jaccard_sql(threshold: float = 0.2, max_df: int = 100) -> str:
    grams = (
        f"SELECT DISTINCT doc_id, lang, UNNEST({shingles_sql('text', 2)}) AS g "
        "FROM documents"
    )
    return (
        f"WITH grams AS ({grams}), "
        "dfreq AS (SELECT lang, g FROM grams GROUP BY lang, g "
        f"HAVING COUNT(*) <= {max_df}), "
        "kept AS (SELECT grams.* FROM grams JOIN dfreq USING (lang, g)), "
        "counts AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter "
        "FROM kept a JOIN kept b ON a.lang = b.lang AND a.g = b.g "
        "WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, "
        "CAST(inter / (na.n + nb.n - inter) AS DOUBLE) AS jaccard "
        "FROM inter JOIN counts na ON inter.doc_a = na.doc_id "
        "JOIN counts nb ON inter.doc_b = nb.doc_id "
        f"WHERE inter / (na.n + nb.n - inter) >= {float(threshold)!r}"
    )


# --- connected components: pairs → clusters --------------------------------

def dedup_components(
    docs: DataFrame, threshold: float = 0.5, max_iter: int = 50
) -> DataFrame:
    """Cluster near-duplicate pairs into components: every doc gets
    (doc_id, root_id) where root = MIN doc_id reachable through
    minhash-LSH pairs with est_sim ≥ threshold (singletons are their
    own root). This is the dedup completion step — the keeper of each
    cluster is its root.

    Spark-first iteration: min-label propagation. labels start as own
    id; each round takes the min over neighbors; labels are monotone
    non-increasing, so the SUM of labels strictly decreases until the
    fixpoint — convergence is detected by an O(1) aggregate, no
    row-level diff join. Each round localCheckpoints to truncate the
    lineage (iterative joins otherwise stack plans). Rounds needed =
    component diameter; near-dup clusters are shallow (dups of dups of
    one root), so this is a handful of co-partitioned joins on doc_id
    at any scale. For adversarial chain-shaped graphs switch to
    large-star/small-star; near-dup components don't need it.

    Oracle: a DuckDB recursive CTE computes min-over-reachable-set —
    the same fixpoint by definition."""
    pairs = dedup_minhash_lsh(docs).where(F.col("est_sim") >= threshold)
    return propagate_components(
        docs.select("doc_id"), pairs.select("doc_a", "doc_b"), max_iter
    )


def propagate_components(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iter: int = 50,
    driver_threshold: int = 10_000_000,
) -> DataFrame:
    """Min-label propagation WITH pointer doubling: (doc_id) nodes +
    (doc_a, doc_b) edges → (doc_id, root_id), root = component min.

    Each round takes the min over graph neighbors AND jumps one level
    up the label forest (root := root(root), a self-join on the label
    relation) — path halving turns worst-case chain convergence from
    O(diameter) rounds into O(log diameter): a 200-node chain settles
    in ~10 rounds, not 200. Labels stay monotone non-increasing, so
    the O(1) sum-aggregate convergence test is unchanged. See
    dedup_components for the shuffle/keying discussion."""
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))

    # Size-gated driver shortcut: the EDGE list (never the corpus) is
    # the LSH near-dup pair set — measured 477 edges at sf0.1, where
    # each distributed round still costs full job overhead (3 joins +
    # localCheckpoint + a collect for ~2.5 s/round on ~500 rows).
    # Below the threshold (10M edges ≈ 160 MB driver RAM) an exact
    # union-find on the collected pairs is strictly faster and yields
    # the identical min-root labeling; the distributed loop below is
    # the authority above it (pinned by a forced-distributed test).
    # The gate counts the raw pair list — no shuffle spent deciding —
    # and e1 is persisted FIRST: pairs is the expensive LSH similarity
    # join, and without the persist the count, the collect (driver
    # branch) and the edges union (distributed branch) would each
    # recompute it from scratch.
    e1 = e1.persist()
    n_edges = e1.count()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                nxt = parent[x]
                parent[x] = r
                x = nxt
            return r

        edge_rows = e1.collect()
        e1.unpersist()  # everything below is driver-local / node-list only
        for row in edge_rows:
            ra, rb = find(row["a"]), find(row["b"])
            if ra != rb:
                # attach the larger root under the smaller: the
                # component root stays its minimum member
                parent[max(ra, rb)] = min(ra, rb)
        touched = {p for r in edge_rows for p in (r["a"], r["b"])}
        lab = [(d, find(d)) for d in sorted(touched)]
        spark = nodes.sparkSession
        touched_df = literal_df(spark,
            [(d,) for d in sorted(touched)], "doc_id long"
        )
        singles = nodes.join(touched_df, "doc_id", "left_anti").select(
            "doc_id", F.col("doc_id").alias("root_id")
        )
        if lab:
            return literal_df(spark,
                lab, "doc_id long, root_id long"
            ).unionAll(singles)
        return singles

    edges = (
        e1.union(e1.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    edges.count()  # materialize so e1's cache can go
    e1.unpersist()
    # Iterate ONLY over edge-connected nodes: singletons (the vast
    # majority of a corpus — anything without a near-dup pair) can
    # never change label, so hauling them through every round's joins
    # is pure waste. At 100 TB this shrinks the per-round relations
    # from |corpus| to |near-dup subset| (typically a few percent);
    # singletons rejoin as their own root after the fixpoint.
    conn = edges.select(F.col("a").alias("doc_id")).distinct().persist()
    labels = conn.select("doc_id", F.col("doc_id").alias("root_id"))
    # sentinel, not None: an EMPTY node set sums to NULL (None) and
    # must still converge on the second pass (None == None)
    prev_sum = object()
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("b"), F.col("root_id").alias("nl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_min"))
            .withColumnRenamed("a", "doc_id")
        )
        stepped = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("root_id"), F.coalesce("nbr_min", "root_id")
            ).alias("root_id"),
        )
        # pointer doubling: follow the label one hop (roots only ever
        # decrease, so least() keeps monotonicity exact)
        hop = stepped.select(
            F.col("doc_id").alias("root_id"), F.col("root_id").alias("rr")
        )
        labels = (
            stepped.join(hop, "root_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("root_id"), F.coalesce("rr", "root_id")
                ).alias("root_id"),
            )
            .localCheckpoint()
        )
        cur = labels.agg(
            F.sum(F.col("root_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    # singletons anti-join against the CHECKPOINTED labels (which
    # cover exactly the connected nodes) — not against conn, whose
    # cache is released below; an unpersisted conn in the returned
    # plan would silently recompute the whole LSH pair derivation on
    # every downstream action.
    singletons = nodes.join(labels, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("root_id")
    )
    out = labels.select(
        "doc_id", F.col("root_id").cast("bigint")
    ).unionAll(singletons.select("doc_id", F.col("root_id").cast("bigint")))
    edges.unpersist()
    conn.unpersist()
    return out


def dedup_components_sql(threshold: float = 0.5, rel: str = "documents") -> str:
    mh = dedup_minhash_lsh_sql(rel)
    return (
        f"WITH RECURSIVE nodes AS (SELECT DISTINCT doc_id FROM {rel}), "
        f"p AS (SELECT doc_a, doc_b FROM ({mh}) WHERE est_sim >= {float(threshold)!r}), "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM p "
        "UNION SELECT doc_b, doc_a FROM p), "
        "reach AS (SELECT doc_id AS a, doc_id AS b FROM nodes "
        "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) "
        "SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS root_id "
        "FROM reach GROUP BY a"
    )


def corpus_dedup_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus health: (source, n_docs, n_unique, dup_rate,
    tot_chars) — the monitoring relation every dedup pipeline reports
    before/after a run (duplication concentrated in one source is the
    usual crawl pathology). One scan, two-phase COUNT(DISTINCT) on
    the md5 text hash (uniform keys, partial distinct map-side — the
    raw texts never shuffle), exact integer arithmetic until the one
    final double division."""
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct(F.md5(F.col("text")))
            .cast("bigint")
            .alias("n_unique"),
            F.sum(F.col("n_chars")).cast("bigint").alias("tot_chars"),
        )
        .select(
            "source", "n_docs", "n_unique",
            (
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs")
            ).alias("dup_rate"),
            "tot_chars",
        )
    )


CORPUS_DEDUP_STATS_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)
    AS dup_rate,
  CAST(SUM(n_chars) AS BIGINT) AS tot_chars
FROM documents GROUP BY source
"""


def dedup_keep_best(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Canonicalization — the step AFTER clustering: inside every
    near-dup component, keep the highest-QUALITY member rather than
    the arbitrary min-id root (what a production dedup actually ships:
    of N crawls of the same page, keep the cleanest). Composes
    dedup_components (min-label propagation) with text_quality's
    integer-derived score; winner per cluster by (score DESC, doc_id)
    so ties are deterministic. Output per doc: its cluster, score,
    cluster size, whether it is the keeper, and the cluster's keeper
    id (the replacement pointer a rewrite join would broadcast).

    Scale shape: quality is map-only; the join and both windows are
    keyed by doc_id/root_id (components output is already root-keyed)
    — no new shuffle class beyond dedup_components itself."""
    from pyspark.sql import Window

    from .textstats import text_quality

    comp = dedup_components(docs, threshold)
    q = text_quality(docs).select("doc_id", "score")
    w = Window.partitionBy("root_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        comp.join(q, "doc_id")
        .select(
            "doc_id",
            "root_id",
            "score",
            F.count("*").over(Window.partitionBy("root_id"))
            .cast("bigint")
            .alias("cluster_size"),
            (F.row_number().over(w) == 1).alias("keep"),
            F.first_value("doc_id").over(w).cast("bigint").alias("keeper_id"),
        )
    )


def dedup_keep_best_sql(
    threshold: float = 0.5, rel: str = "documents"
) -> str:
    from .textstats import text_quality_sql

    return (
        f"WITH comp AS ({dedup_components_sql(threshold, rel)}), "
        f"q AS (SELECT doc_id, score FROM ({text_quality_sql(rel)})) "
        "SELECT c.doc_id, c.root_id, q.score, "
        "CAST(COUNT(*) OVER (PARTITION BY c.root_id) AS BIGINT) "
        "AS cluster_size, "
        "(ROW_NUMBER() OVER (PARTITION BY c.root_id "
        "ORDER BY q.score DESC, c.doc_id) = 1) AS keep, "
        "CAST(FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.root_id "
        "ORDER BY q.score DESC, c.doc_id) AS BIGINT) AS keeper_id "
        "FROM comp c JOIN q ON q.doc_id = c.doc_id"
    )


# (bands, rows) layouts of the 16 minhash components for the band
# parameter sweep; candidate sets are NESTED (2x8 ⊆ 4x4 ⊆ 8x2 ⊆ 16x1
# — a longer matching band contains every aligned shorter one), which
# is what makes the 16x1 candidate domain a valid truth universe.
_SWEEP_CONFIGS = ((2, 8), (4, 4), (8, 2), (16, 1))


def dedup_minhash_band_sweep(
    docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """The LSH tuning relation (round 8): candidate volume, recall,
    and precision of every (bands × rows) layout of the 16 minhash
    components against exact-Jaccard truth — the table a production
    dedup reads to pick its banding (more bands = higher recall, more
    candidate volume to verify). Returns one row per layout:
    (cfg, bands, rows_per_band, n_candidates, n_true_pairs, n_hits,
    recall, precision).

    Truth = exact shingle Jaccard >= threshold over the 16x1 candidate
    domain (single-component collision) — a SUPERSET of every other
    layout's candidates by band nesting, and near-complete for real
    dups (a J >= 0.5 pair misses all 16 components with probability
    (1-J)^16 ≈ 1.5e-5). Exact Jaccard is computed ONLY on that
    bucket-local domain, never all pairs; per-layout joins stay on
    (cfg, band, key) and (doc_a, doc_b) keys. Determinism: integer
    counts, double divisions with identical op order.

    The sig/cand persists must outlive the caller's action (the
    returned plan references both), so they are NOT unpersisted here —
    like dedup_minhash_lsh's signature persist, the leak is bounded
    (16 hex strings / two ids per row) and the sweep harnesses
    (bench.py, tools/check_oracle.py) clearCache() between queries."""
    sig = minhash_signatures(docs).persist()  # fence: returned plan reads this cache

    def band_rel(bands: int, rows: int):
        return sig.select(
            F.lit(f"{bands}x{rows}").alias("cfg"),
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[
                                        F.element_at("sig", b * rows + j + 1)
                                        for j in range(rows)
                                    ],
                                )
                            ).alias("key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select("cfg", "doc_id", "bk.band", "bk.key")

    allbands = band_rel(*_SWEEP_CONFIGS[0])
    for cfgp in _SWEEP_CONFIGS[1:]:
        allbands = allbands.unionByName(band_rel(*cfgp))
    cand = (
        allbands.alias("a")
        .join(allbands.alias("b"), ["cfg", "band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "cfg",
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .persist()  # fence: returned plan reads this cache
    )
    base_pairs = (
        cand.where(F.col("cfg") == "16x1").select("doc_a", "doc_b")
    )
    # NO _sized_shingle_arrays fence here (round-13 A/B, the fix-9
    # per-consumer rule): band_sweep's three shd passes run
    # CONCURRENTLY inside the one truth job and the persist only
    # serialized a materialization barrier in front of them — quiet
    # interleaved A/B measured 3.87 s inline vs 4.90 s fenced. The
    # sibling sweeps (k_sweep, simhash_sweep, est, containment) keep
    # the fence, where it measures flat-to-better.
    shd = spread_small(docs).select("doc_id", words(F.col("text")).alias("w")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles_of(F.col("w")))).alias("sh"),
    )
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    inter = (
        base_pairs.join(
            shd.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a"
        )
        .join(shd.select(F.col("doc_id").alias("doc_b"), "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    ni = F.coalesce(F.col("ni"), F.lit(0))
    jacc = ni.cast("double") / (F.col("na") + F.col("nb") - ni)
    truth = (
        base_pairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb")),
            "doc_b",
        )
        .join(inter, ["doc_a", "doc_b"], "left")
        .where(jacc >= threshold)
        .select("doc_a", "doc_b")
    )
    n_truth = truth.agg(F.count("*").alias("n_true_pairs"))
    per_cfg = (
        cand.join(truth.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left")
        .groupBy("cfg")
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )
    return per_cfg.crossJoin(F.broadcast(n_truth)).select(
        "cfg",
        F.split("cfg", "x")[0].cast("bigint").alias("bands"),
        F.split("cfg", "x")[1].cast("bigint").alias("rows_per_band"),
        "n_candidates",
        F.col("n_true_pairs").cast("bigint").alias("n_true_pairs"),
        "n_hits",
        F.when(
            F.col("n_true_pairs") > 0,
            F.col("n_hits").cast("double") / F.col("n_true_pairs"),
        ).alias("recall"),
        F.when(
            F.col("n_candidates") > 0,
            F.col("n_hits").cast("double") / F.col("n_candidates"),
        ).alias("precision"),
    )


def dedup_minhash_band_sweep_sql(threshold: float = 0.5) -> str:
    sig = minhash_signatures_sql()
    sep = " || '|' || "
    band_rows = " UNION ALL ".join(
        f"SELECT '{bands}x{rows}' AS cfg, doc_id, {b} AS band, "
        f"md5({sep.join(f'sig[{b * rows + j + 1}]' for j in range(rows))}) AS key "
        "FROM s"
        for bands, rows in _SWEEP_CONFIGS
        for b in range(bands)
    )
    sh = (
        f"SELECT DISTINCT doc_id, UNNEST({shingles_sql('text')}) AS sh "
        "FROM documents"
    )
    jacc = (
        "CAST(COALESCE(i.ni, 0) AS DOUBLE) "
        "/ (sa.na + sb.nb - COALESCE(i.ni, 0))"
    )
    return f"""
WITH s AS ({sig}),
allbands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.cfg, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM allbands a JOIN allbands b
    ON a.cfg = b.cfg AND a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
bp AS (SELECT doc_a, doc_b FROM cand WHERE cfg = '16x1'),
shd AS ({sh}),
sz AS (SELECT doc_id, COUNT(*) AS nsh FROM shd GROUP BY doc_id),
inter AS (
  SELECT bp.doc_a, bp.doc_b, COUNT(*) AS ni
  FROM bp
  JOIN shd a ON a.doc_id = bp.doc_a
  JOIN shd b ON b.doc_id = bp.doc_b AND b.sh = a.sh
  GROUP BY bp.doc_a, bp.doc_b
),
truth AS (
  SELECT bp.doc_a, bp.doc_b
  FROM bp
  JOIN (SELECT doc_id AS doc_a, nsh AS na FROM sz) sa USING (doc_a)
  JOIN (SELECT doc_id AS doc_b, nsh AS nb FROM sz) sb USING (doc_b)
  LEFT JOIN inter i ON i.doc_a = bp.doc_a AND i.doc_b = bp.doc_b
  WHERE {jacc} >= {float(threshold)!r}
),
nt AS (SELECT COUNT(*) AS n_true_pairs FROM truth),
per_cfg AS (
  SELECT cand.cfg, COUNT(*) AS n_candidates,
         SUM(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
  FROM cand LEFT JOIN truth t
    ON t.doc_a = cand.doc_a AND t.doc_b = cand.doc_b
  GROUP BY cand.cfg
)
SELECT cfg,
       CAST(string_split(cfg, 'x')[1] AS BIGINT) AS bands,
       CAST(string_split(cfg, 'x')[2] AS BIGINT) AS rows_per_band,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_hits AS BIGINT) AS n_hits,
       CASE WHEN n_true_pairs > 0
            THEN CAST(n_hits AS DOUBLE) / n_true_pairs END AS recall,
       CASE WHEN n_candidates > 0
            THEN CAST(n_hits AS DOUBLE) / n_candidates END AS precision
FROM per_cfg CROSS JOIN nt
"""


# --- incremental dedup (new crawl vs persisted signature index) -------------

# the registered query's increment split: doc_id % 5 == 0 is "today's
# crawl", the rest is the already-indexed corpus. The MODULUS is query
# plumbing, not operator semantics — dedup_incremental itself never
# sees it.
INCREMENT_MOD = 5


def _band_keys(sig: DataFrame, keep_sig: bool = False) -> DataFrame:
    """(doc_id, band, key[, sig]) — the default 4x4 banding of a
    (doc_id, sig) relation. Map-only (one explode of 4 structs per
    doc), so deriving bands from a stored signature index costs no
    shuffle — the index persists signatures, not band rows."""
    extra = ["sig"] if keep_sig else []
    return sig.select(
        "doc_id",
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * ROWS_PER_BAND + j + 1)
                                    for j in range(ROWS_PER_BAND)
                                ],
                            )
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *extra, "bk.band", "bk.key")


def dedup_incremental(
    spark, index_path: str, increment: DataFrame
) -> DataFrame:
    """Dedup a NEW crawl increment against an EXISTING corpus without
    recomputing the corpus: the prior run persisted its minhash
    signature index (doc_id, sig) to parquet; the increment is
    shingled/hashed fresh and joined INTO that index. Returns every
    LSH candidate pair touching the increment —
    (doc_a, doc_b, est_sim, cross_corpus) with doc_a < doc_b and
    cross_corpus = TRUE when the partner is an index doc — exactly the
    rows a full-corpus dedup_minhash_lsh rerun would add for these
    docs (candidate membership depends only on each doc's own band
    keys, so incremental ∪ index ≡ full rerun; the oracle hash-checks
    this). Reference analogue: the create-on-first-write dscache
    (receiver/dscache.go:1) — consult the persisted index, do new-item
    work only for what isn't in it.

    Scale shape — the whole point is what does NOT happen: the
    existing corpus is never re-shingled (its text is never even
    read; the index holds 16 hex strings per doc), and it never
    shuffles — the increment's band keys BROADCAST into a map-only
    scan of the index, and the pair relation (increment-sized)
    broadcasts back into the index scan for the signature fetch. The
    only aggregation shuffles are increment-sized (the increment's
    own signature groupBy and the pair dropDuplicates). A same-order-
    as-corpus "increment" should flip the broadcasts to a bucketed
    index join instead — but then it isn't an increment any more.

    ``index_path`` is a parquet path of (doc_id, sig) — OR an already-
    resolved index DataFrame (read_signature_index output), which is
    how the write-back lifecycle's consumers hand the multi-generation
    index in without a detour through a flattened copy."""
    idx_sig = (
        index_path
        if isinstance(index_path, DataFrame)
        else spark.read.parquet(index_path)
    ).select("doc_id", "sig")
    inc_sig = minhash_signatures(increment).persist()  # fence: returned plan reads this cache
    inc_bands = _band_keys(inc_sig, keep_sig=True)
    idx_bands = _band_keys(idx_sig, keep_sig=True)

    cross = (
        idx_bands.alias("x")
        .join(F.broadcast(inc_bands.alias("i")), ["band", "key"])
        .select(
            F.col("x.doc_id").alias("id_x"),
            F.col("x.sig").alias("sig_x"),
            F.col("i.doc_id").alias("id_i"),
            F.col("i.sig").alias("sig_i"),
            F.lit(True).alias("cross_corpus"),
        )
    )
    internal = (
        inc_bands.alias("a")
        .join(F.broadcast(inc_bands.alias("b")), ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_x"),
            F.col("a.sig").alias("sig_x"),
            F.col("b.doc_id").alias("id_i"),
            F.col("b.sig").alias("sig_i"),
            F.lit(False).alias("cross_corpus"),
        )
    )
    lo = F.col("id_x") < F.col("id_i")
    pairs = (
        cross.unionByName(internal)
        .select(
            F.when(lo, F.col("id_x")).otherwise(F.col("id_i")).alias("doc_a"),
            F.when(lo, F.col("id_i")).otherwise(F.col("id_x")).alias("doc_b"),
            F.when(lo, F.col("sig_x")).otherwise(F.col("sig_i")).alias("sig_a"),
            F.when(lo, F.col("sig_i")).otherwise(F.col("sig_x")).alias("sig_b"),
            "cross_corpus",
        )
        # several bands can collide for one pair; every duplicate row
        # is value-identical (sigs are functions of the ids), so
        # dropDuplicates on the pair key is deterministic
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.aggregate(
        F.sequence(F.lit(1), F.lit(N_HASHES)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.element_at("sig_a", i) == F.element_at("sig_b", i), 1
        ).otherwise(0),
    ) / float(N_HASHES)
    return pairs.select(
        "doc_a", "doc_b", est.cast("double").alias("est_sim"), "cross_corpus"
    )


def dedup_incremental_sql(mod: int = INCREMENT_MOD) -> str:
    # the equivalence this operator claims, stated directly: a FULL
    # corpus rerun, filtered to pairs touching the increment, with
    # cross_corpus recomputed from the split rule.
    return (
        f"SELECT doc_a, doc_b, est_sim, "
        f"(doc_a % {mod} = 0) <> (doc_b % {mod} = 0) AS cross_corpus "
        f"FROM ({dedup_minhash_lsh_sql()}) "
        f"WHERE doc_a % {mod} = 0 OR doc_b % {mod} = 0"
    )


# --- containment (asymmetric near-superset) dedup (round 9) -----------------

def dedup_containment(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """(doc_a, doc_b, jaccard, cont_a, cont_b, max_cont): CONTAINMENT
    near-dup pairs — cont_a = |shingles(A) ∩ shingles(B)| / |A| is the
    fraction of A living inside B, the asymmetric signal symmetric
    Jaccard structurally misses: a doc quoted whole inside a 10×
    larger page has Jaccard ≈ 0.1 (never crosses a dedup threshold)
    but containment ≈ 1.0 (RefinedWeb-style sub-document dedup keys
    on exactly this). Emits candidate pairs with max(cont_a, cont_b)
    >= threshold.

    Candidate generation must also be containment-shaped: the 4x4
    banding wants HIGH JACCARD to collide (all 4 components of some
    band must agree), so it is nearly blind to contained-but-diluted
    docs; here candidates come from the 16x1 layout (single-component
    collision, the band_sweep truth domain) — a contained doc agrees
    on any one component w.p. J, so P(candidate) = 1-(1-J)^16 (≈0.81
    even at J=0.1). Exact shingle intersection is computed ONLY on
    that bucket-local candidate domain, never all pairs; intersection
    counts group on uniform (doc_a, doc_b) keys. Determinism: integer
    set sizes, double divisions with fixed operand order."""
    sig = minhash_signatures(docs).persist()  # fence: returned plan reads this cache
    comp = sig.select(
        "doc_id", F.posexplode("sig").alias("i", "v")
    )
    cand = (
        comp.alias("a")
        .join(comp.alias("b"), ["i", "v"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    shd, sizes = _shd_sizes(_sized_shingle_arrays(docs))
    a = shd.select(F.col("doc_id").alias("doc_a"), "sh")
    b = shd.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    ni = F.coalesce(F.col("ni"), F.lit(0))
    jacc = ni.cast("double") / (F.col("na") + F.col("nb") - ni)
    cont_a = ni.cast("double") / F.col("na")
    cont_b = ni.cast("double") / F.col("nb")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            jacc.alias("jaccard"),
            cont_a.alias("cont_a"),
            cont_b.alias("cont_b"),
            F.greatest(cont_a, cont_b).alias("max_cont"),
        )
        .where(F.col("max_cont") >= threshold)
    )


def dedup_containment_sql(threshold: float = 0.8) -> str:
    sig = minhash_signatures_sql()
    sh = f"SELECT DISTINCT doc_id, UNNEST({shingles_sql('text')}) AS sh FROM documents"
    ni = "COALESCE(i.ni, 0)"
    jacc = f"CAST({ni} AS DOUBLE) / (sa.na + sb.nb - {ni})"
    cont_a = f"CAST({ni} AS DOUBLE) / sa.na"
    cont_b = f"CAST({ni} AS DOUBLE) / sb.nb"
    return f"""
WITH s AS ({sig}),
comp AS (SELECT doc_id, i, sig[CAST(i AS INT)] AS v
         FROM (SELECT doc_id, sig, UNNEST(range(1, 17)) AS i FROM s)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM comp a JOIN comp b ON a.i = b.i AND a.v = b.v
  WHERE a.doc_id < b.doc_id
),
shd AS ({sh}),
sz AS (SELECT doc_id, COUNT(*) AS nsh FROM shd GROUP BY doc_id),
inter AS (
  SELECT cand.doc_a, cand.doc_b, COUNT(*) AS ni
  FROM cand
  JOIN shd a ON a.doc_id = cand.doc_a
  JOIN shd b ON b.doc_id = cand.doc_b AND b.sh = a.sh
  GROUP BY cand.doc_a, cand.doc_b
)
SELECT cand.doc_a, cand.doc_b,
       {jacc} AS jaccard,
       {cont_a} AS cont_a,
       {cont_b} AS cont_b,
       GREATEST({cont_a}, {cont_b}) AS max_cont
FROM cand
JOIN (SELECT doc_id AS doc_a, nsh AS na FROM sz) sa USING (doc_a)
JOIN (SELECT doc_id AS doc_b, nsh AS nb FROM sz) sb USING (doc_b)
LEFT JOIN inter i ON i.doc_a = cand.doc_a AND i.doc_b = cand.doc_b
WHERE GREATEST({cont_a}, {cont_b}) >= {float(threshold)!r}
"""


# --- incremental scoring engine (shared by the streaming twin) --------------

def dedup_incremental_score(docs: DataFrame, index_sig: DataFrame) -> DataFrame:
    """Score a docs relation (one micro-batch of a live crawl, or any
    batch) against a STATIC minhash signature index — the scoring
    engine behind streaming_dedup_incremental. Returns one row per
    (new doc, matching index doc): (doc_id, index_doc_id, est_sim).

    Same machinery as dedup_incremental's cross-corpus half: the
    batch's signatures come from the explode+groupBy minhash engine
    (an in-row array-fold variant was measured 40x slower — Catalyst
    re-inlines the salted-md5 transforms through the 16 array_min
    lambdas, the mm_phash ProjectCollapse trap — so the aggregation
    form IS the fast form), its band keys broadcast into a map-only
    scan of the index, and duplicate band collisions collapse in the
    batch-local dropDuplicates. No state outlives the batch: a doc's
    matches depend only on its own text and the static index, which
    is what makes the streaming wrapper's micro-batching invisible
    (hash-checked against the full-corpus LSH oracle's cross pairs).
    Reference analogue: the dscache consult on every incoming
    datapoint (receiver/dscache.go:1)."""
    inc_sig = minhash_signatures(docs)
    inc_bands = _band_keys(inc_sig, keep_sig=True)
    idx_bands = _band_keys(index_sig, keep_sig=True)
    est = F.aggregate(
        F.sequence(F.lit(1), F.lit(N_HASHES)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.element_at("sig_s", i) == F.element_at("sig_i", i), 1
        ).otherwise(0),
    ) / float(N_HASHES)
    return (
        idx_bands.alias("x")
        .join(F.broadcast(inc_bands.alias("i")), ["band", "key"])
        .select(
            F.col("i.doc_id").alias("doc_id"),
            F.col("x.doc_id").alias("index_doc_id"),
            F.col("i.sig").alias("sig_s"),
            F.col("x.sig").alias("sig_i"),
        )
        .dropDuplicates(["doc_id", "index_doc_id"])
        .select("doc_id", "index_doc_id", est.cast("double").alias("est_sim"))
    )


def dedup_incremental_score_sql(mod: int = INCREMENT_MOD) -> str:
    # oracle = the full-corpus LSH rerun filtered to CROSS pairs
    # (stream doc on one side, index doc on the other), re-oriented so
    # doc_id is always the streamed one
    return (
        f"SELECT CASE WHEN doc_a % {mod} = 0 THEN doc_a ELSE doc_b END AS doc_id, "
        f"CASE WHEN doc_a % {mod} = 0 THEN doc_b ELSE doc_a END AS index_doc_id, "
        f"est_sim FROM ({dedup_minhash_lsh_sql()}) "
        f"WHERE (doc_a % {mod} = 0) <> (doc_b % {mod} = 0)"
    )


def dedup_incremental_components(
    spark,
    index_path: str,
    roots_path: str,
    increment: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Update the corpus-wide near-dup clustering for a NEW crawl
    increment WITHOUT recomputing the existing corpus (round 9 —
    dedup_incremental's completion step, as dedup_components is
    dedup_minhash_lsh's): the prior run persisted its signature index
    AND its (doc_id, root_id) component assignment; the increment's
    new candidate pairs come from dedup_incremental (index joined, no
    re-shingling), and the closure re-runs over the assignment-as-
    edges graph — each existing doc contributes ONE (doc, root) edge,
    which encodes its entire old component, so
    components(old_roots ∪ new_pairs) ≡ components(full pair set):
    the old pairs are never touched again. Returns the full
    (doc_id, root_id) relation, hash-checked against a FULL-corpus
    rerun's recursive-CTE oracle.

    Work shape: increment-sized LSH (signatures/bands of the new docs
    only), one id-only edge per existing doc, and the shared
    propagate_components engine (min-label + pointer doubling, driver
    shortcut gated at 10M edges). The existing corpus's text is never
    read; the only corpus-proportional relation is the id-pair edge
    list — bytes per doc, not text."""
    new_pairs = dedup_incremental(spark, index_path, increment).where(
        F.col("est_sim") >= threshold
    )
    old = spark.read.parquet(roots_path)
    old_edges = old.select(
        F.col("doc_id").alias("doc_a"), F.col("root_id").alias("doc_b")
    )
    nodes = old.select("doc_id").unionByName(increment.select("doc_id"))
    return propagate_components(
        nodes,
        old_edges.unionByName(new_pairs.select("doc_a", "doc_b")),
    )


# est_sim is a count of agreeing 16-component signatures / 16, so
# these cutoffs sit ON the representable grid (k/16)
_THRESHOLD_SWEEP = (0.5, 0.625, 0.75, 0.875, 1.0)


def dedup_threshold_sweep(docs: DataFrame) -> DataFrame:
    """(threshold, n_pairs, n_docs, frac_docs): candidate-pair volume
    and touched-doc fraction at every est_sim cutoff — the OTHER half
    of the dedup tuning dial: dedup_minhash_band_sweep sizes the
    BANDING (recall vs candidate volume against exact truth); this
    sizes the VERIFICATION CUTOFF a production run applies to the
    chosen banding's pairs (how much of the corpus each threshold
    would touch). Thresholds sit on the est_sim grid (k/16) so the
    cuts are exact in both engines.

    One LSH pass: the pair relation is computed once and persisted;
    the sweep is a crossJoin against the 5-row threshold literal
    relation (the codebook pattern), one groupBy(threshold) for pair
    counts, and one distinct (threshold, doc) count over the exploded
    pair endpoints — all aggregates on tiny keys. The corpus total
    re-enters as a one-row broadcast."""
    pairs = dedup_minhash_lsh(docs).persist()  # fence: returned plan reads this cache
    spark = docs.sparkSession
    th = literal_df(spark,
        [(float(t),) for t in _THRESHOLD_SWEEP], "threshold double"
    )
    hit = pairs.crossJoin(F.broadcast(th)).where(
        F.col("est_sim") >= F.col("threshold")
    )
    per_pairs = hit.groupBy("threshold").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    per_docs = (
        hit.select(
            "threshold",
            F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("d"),
        )
        .groupBy("threshold")
        .agg(F.count_distinct("d").cast("bigint").alias("n_docs"))
    )
    tot = docs.agg(F.count("*").alias("n_total"))
    return (
        th.join(per_pairs, "threshold", "left")
        .join(per_docs, "threshold", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            (
                F.coalesce("n_docs", F.lit(0)).cast("double")
                / F.col("n_total")
            ).alias("frac_docs"),
        )
    )


def dedup_threshold_sweep_sql() -> str:
    ths = ", ".join(f"({float(t)!r})" for t in _THRESHOLD_SWEEP)
    return f"""
WITH p AS ({dedup_minhash_lsh_sql()}),
th(threshold) AS (VALUES {ths}),
hit AS (SELECT th.threshold, p.doc_a, p.doc_b
        FROM p CROSS JOIN th WHERE p.est_sim >= th.threshold),
pp AS (SELECT threshold, COUNT(*) AS n_pairs FROM hit GROUP BY threshold),
pd AS (SELECT threshold, COUNT(DISTINCT d) AS n_docs FROM (
         SELECT threshold, doc_a AS d FROM hit
         UNION ALL SELECT threshold, doc_b FROM hit)
       GROUP BY threshold),
tot AS (SELECT COUNT(*) AS n_total FROM documents)
SELECT th.threshold,
       CAST(COALESCE(pp.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(pd.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(pd.n_docs, 0) AS DOUBLE) / n_total AS frac_docs
FROM th LEFT JOIN pp ON pp.threshold = th.threshold
LEFT JOIN pd ON pd.threshold = th.threshold
CROSS JOIN tot
"""


# --- URL canonicalization dedup (round 9) ------------------------------------

URL_CLUSTER_MOD = 97


def _synth_url() -> "F.Column":
    """Deterministic per-doc URL synthesis (testdata carries no URL
    column — same honest-fake convention as the multimodal payloads,
    multimodal.py:67): docs sharing (source, doc_id % 97, doc_id % 3)
    are 'the same page recrawled', wrapped in the noise real crawl
    frontiers carry — scheme/host case, an explicit default port, a
    trailing slash, utm_* tracking params in shifting positions, and
    fragments."""
    d = F.col("doc_id")
    x = (d % URL_CLUSTER_MOD).cast("string")
    pg = (d % 3).cast("string")
    scheme = F.when(d % 3 == 0, "HTTPS://").otherwise("https://")
    host = F.concat(
        F.when(d % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com"),
    )
    port = F.when(d % 4 == 0, ":443").otherwise("")
    path = F.concat(
        F.lit("/p/"), x, F.when(d % 6 == 0, "/").otherwise("")
    )
    q = (
        F.when(d % 2 == 0, F.concat(F.lit("?utm_source=rss&page="), pg))
        .when(d % 5 == 0, F.concat(F.lit("?page="), pg, F.lit("&utm_campaign=spring")))
        .otherwise(F.concat(F.lit("?page="), pg))
    )
    frag = F.when(d % 7 == 0, F.concat(F.lit("#s"), (d % 4).cast("string"))).otherwise("")
    return F.concat(scheme, host, port, path, q, frag)


_SYNTH_URL_SQL = (
    "(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN UPPER(source) ELSE source END) || '.example.com' || "
    "(CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) || "
    f"'/p/' || CAST(doc_id % {URL_CLUSTER_MOD} AS VARCHAR) || "
    "(CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '?utm_source=rss&page=' || CAST(doc_id % 3 AS VARCHAR) "
    " WHEN doc_id % 5 = 0 THEN '?page=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=spring' "
    " ELSE '?page=' || CAST(doc_id % 3 AS VARCHAR) END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN '#s' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END)"
)


def canonical_url(url) -> "F.Column":
    """RFC-3986-style normalization as pure column algebra: drop the
    fragment, lowercase scheme+host, strip the :443 default port,
    strip the trailing slash, drop utm_* tracking params, and SORT the
    surviving query params (order-insensitive keys). Every step is a
    conservative regex/array op expressible identically in DuckDB —
    no backreferences (the replacement-escape syntax differs between
    Java regex and RE2, a cross-engine trap)."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    hostpart = F.lower(
        F.regexp_extract(nofrag, "^[a-zA-Z]+://([^/?#]+)", 1)
    )
    host = F.regexp_replace(hostpart, ":443$", "")
    rest = F.regexp_replace(nofrag, "^[a-zA-Z]+://[^/?#]+", "")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    # regexp, not the two-arg rtrim: Spark 4 deprecates the
    # two-parameter TRIM signatures (runtime warning, slated removal)
    path_c = F.regexp_replace(path, "/+$", "")
    qs = F.regexp_extract(rest, "\\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    return F.concat(
        F.lit("https://"),
        host,
        path_c,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(""),
    )


def _canonical_url_sql(url: str) -> str:
    nofrag = f"regexp_replace({url}, '#.*$', '')"
    host = (
        f"regexp_replace(lower(regexp_extract({nofrag}, '^[a-zA-Z]+://([^/?#]+)', 1)), "
        "':443$', '')"
    )
    rest = f"regexp_replace({nofrag}, '^[a-zA-Z]+://[^/?#]+', '')"
    path = f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1), '/+$', '')"
    qs = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    kept = (
        f"array_to_string(list_sort(list_filter(string_split({qs}, '&'), "
        "p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')"
    )
    return (
        f"'https://' || {host} || {path} || "
        f"(CASE WHEN ({kept}) <> '' THEN '?' || ({kept}) ELSE '' END)"
    )


def dedup_url_canonical(docs: DataFrame) -> DataFrame:
    """(doc_id, canon_url, keeper_id, is_dup): URL-keyed dedup — the
    FIRST dedup pass of every web-corpus pipeline (CommonCrawl refetches
    the same page across snapshots under cosmetically different URLs;
    URL canonicalization removes the bulk of refetch duplicates for
    the price of a string normalization, before any content hashing
    runs). keeper = min doc_id per canonical URL.

    100 TB: the normalization is map-only column algebra inside
    whole-stage codegen (regex + array sort over ~5 params, no UDF);
    the ONLY shuffle is the groupBy on the canonical-URL hash —
    uniform by construction. The keeper relation is group-domain-sized
    and joins back co-keyed on canon_url."""
    u = docs.select("doc_id", _synth_url().alias("url"))
    c = u.select("doc_id", canonical_url(F.col("url")).alias("canon_url"))
    keep = c.groupBy("canon_url").agg(F.min("doc_id").alias("keeper_id"))
    return c.join(keep, "canon_url").select(
        "doc_id",
        "canon_url",
        "keeper_id",
        (F.col("doc_id") != F.col("keeper_id")).cast("bigint").alias("is_dup"),
    )


def dedup_url_canonical_sql() -> str:
    canon = _canonical_url_sql(f"({_SYNTH_URL_SQL})")
    return (
        f"WITH c AS (SELECT doc_id, {canon} AS canon_url FROM documents), "
        "keep AS (SELECT canon_url, MIN(doc_id) AS keeper_id FROM c GROUP BY canon_url) "
        "SELECT doc_id, canon_url, keeper_id, "
        "CAST(doc_id <> keeper_id AS BIGINT) AS is_dup "
        "FROM c JOIN keep USING (canon_url)"
    )


# --- simhash hamming-radius sweep (round 9) ----------------------------------

def dedup_simhash_sweep(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(radius, n_pairs, n_docs, mean_jaccard): the simhash tuning
    relation — for every hamming cutoff 0..max_hamming, the CUMULATIVE
    pair volume, distinct docs touched, and the mean EXACT shingle
    Jaccard of the admitted pairs. This is how a production simhash
    radius is chosen: the radius/Jaccard curve says which hamming
    cutoff corresponds to which text similarity on THIS corpus
    (completing the tuning dial family: dedup_minhash_band_sweep sizes
    the banding, dedup_threshold_sweep the verification cutoff, this
    one the hamming radius).

    One pigeonhole pass (chunk_hamming_pairs, exact for radius <= 3)
    yields every candidate with its hamming; exact Jaccard is computed
    ONLY on that pair domain (never all-pairs); the 4-row radius
    relation broadcasts into the pair relation. The per-pair relation
    persists because both the per-radius count and the touched-doc
    count fold it (pair-domain-sized — bounded by the radius-3
    admission, the same bound dedup_simhash itself outputs; the sweep
    harness clearCache()s between queries). mean_jaccard sums exact
    micro-quantized decimals (unbounded pair count -> dec6, not
    micro6) and divides by the exact count, coalescing empty radii to
    0.0."""
    from ..model import dsum

    pairs = chunk_hamming_pairs(simhash(docs), max_hamming)
    shd, sizes = _shd_sizes(_sized_shingle_arrays(docs))
    a = shd.select(F.col("doc_id").alias("doc_a"), "sh")
    b = shd.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    ni = F.coalesce(F.col("ni"), F.lit(0))
    pj = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            (ni.cast("double") / (F.col("na") + F.col("nb") - ni)).alias("jacc"),
        )
        .persist()  # fence: returned plan reads this cache
    )
    radii = docs.sparkSession.range(max_hamming + 1).select(
        F.col("id").cast("bigint").alias("radius")
    )
    exp = pj.crossJoin(F.broadcast(radii)).where(
        F.col("hamming") <= F.col("radius")
    )
    stats = exp.groupBy("radius").agg(
        F.count("*").alias("n_pairs"),
        (dsum("jacc").cast("double") / F.count("jacc")).alias("mean_jaccard"),
    )
    touched = (
        exp.select(
            "radius", F.explode(F.array("doc_a", "doc_b")).alias("d")
        )
        .groupBy("radius")
        .agg(F.countDistinct("d").alias("n_docs"))
    )
    return (
        radii.join(F.broadcast(stats), "radius", "left")
        .join(F.broadcast(touched), "radius", "left")
        .select(
            "radius",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("mean_jaccard", F.lit(0.0)).alias("mean_jaccard"),
        )
    )


def dedup_simhash_sweep_sql(max_hamming: int = 3) -> str:
    from ..model import oracle_davg

    sh = simhash_sql()
    cols = ", ".join(f"q{j}" for j in range(SIMHASH_CHUNKS))
    key_rows = " UNION ALL ".join(
        f"SELECT doc_id, {cols}, {j} AS tbl, q{j} AS key FROM s"
        for j in range(SIMHASH_CHUNKS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.q{j}, b.q{j}))" for j in range(SIMHASH_CHUNKS)
    )
    return (
        f"WITH s AS ({sh}), keys AS ({key_rows}), "
        "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"CAST({ham} AS BIGINT) AS hamming "
        "FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key "
        f"WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}), "
        f"shd AS (SELECT doc_id, UNNEST(list_distinct({shingles_sql('text')})) AS sh "
        "FROM documents), "
        "sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shd GROUP BY doc_id), "
        "inter AS (SELECT doc_a, doc_b, COUNT(*) AS ni FROM pairs "
        "JOIN shd a ON a.doc_id = doc_a "
        "JOIN shd b ON b.doc_id = doc_b AND b.sh = a.sh "
        "GROUP BY doc_a, doc_b), "
        "pj AS (SELECT doc_a, doc_b, hamming, "
        "CAST(COALESCE(ni, 0) AS DOUBLE) / (sa.nsh + sb.nsh - COALESCE(ni, 0)) AS jacc "
        "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a "
        "JOIN sizes sb ON sb.doc_id = doc_b "
        "LEFT JOIN inter USING (doc_a, doc_b)), "
        f"radii AS (SELECT CAST(r.range AS BIGINT) AS radius FROM range(0, {max_hamming + 1}) r), "
        "exp AS (SELECT radius, doc_a, doc_b, jacc FROM pj CROSS JOIN radii "
        "WHERE hamming <= radius), "
        "stats AS (SELECT radius, COUNT(*) AS n_pairs, "
        + oracle_davg("jacc")
        + " AS mean_jaccard FROM exp GROUP BY radius), "
        "touched AS (SELECT radius, COUNT(DISTINCT d) AS n_docs FROM "
        "(SELECT radius, UNNEST([doc_a, doc_b]) AS d FROM exp) GROUP BY radius) "
        "SELECT radius, CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs, "
        "CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs, "
        "COALESCE(mean_jaccard, 0.0) AS mean_jaccard "
        "FROM radii LEFT JOIN stats USING (radius) LEFT JOIN touched USING (radius)"
    )


# --- minhash signature-length sweep (round 9) ---------------------------------

MINHASH_KS = (4, 8, 16)


def dedup_minhash_k_sweep(docs: DataFrame) -> DataFrame:
    """(k, n_pairs, mean_est, mean_jaccard, mean_abs_err, rmse): the
    minhash ESTIMATOR-accuracy dial — how close the k-component
    estimate sits to exact Jaccard at k = 4, 8, 16, measured on the
    16x1 candidate domain (the band_sweep truth universe). Signature
    length is the third axis of the dedup budget (band_sweep picks the
    layout, threshold_sweep the cutoff): k drives hashing cost and
    index bytes LINEARLY, and this relation prices what each halving
    costs in estimator error (the binomial Var = J(1-J)/k made
    concrete on this corpus's actual pair population).

    A k-prefix of the 16 components IS a valid k-minhash (the salted
    hashes are independent), so one signature pass serves all three
    k's. Exact Jaccard only on the bucketed candidate domain, never
    all-pairs; the 3-row k relation broadcasts; means/rmse accumulate
    dec6 decimals (unbounded pair counts) cast to double before the
    division, sqrt rounded at 6 per the libm rule."""
    from ..model import dec6

    sig = minhash_signatures(docs).persist()  # fence: returned plan reads this cache
    comp = sig.select("doc_id", F.posexplode("sig").alias("i", "v"))
    cand = (
        comp.alias("a")
        .join(comp.alias("b"), ["i", "v"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    shd, sizes = _shd_sizes(_sized_shingle_arrays(docs))
    inter = (
        cand.join(shd.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(shd.select(F.col("doc_id").alias("doc_b"), "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    ni = F.coalesce(F.col("ni"), F.lit(0))
    pj = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb")), "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "sig_a",
            "sig_b",
            (ni.cast("double") / (F.col("na") + F.col("nb") - ni)).alias("jacc"),
        )
    )
    ks = literal_df(docs.sparkSession,
        [(k,) for k in MINHASH_KS], "k int"
    )
    est = F.aggregate(
        F.sequence(F.lit(1), F.col("k")),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.element_at("sig_a", i) == F.element_at("sig_b", i), 1
        ).otherwise(0),
    ).cast("double") / F.col("k").cast("double")
    scored = pj.crossJoin(F.broadcast(ks)).select(
        "k", est.alias("est"), "jacc"
    )
    err = F.col("est") - F.col("jacc")
    n = F.count("*")
    return scored.groupBy("k").agg(
        n.cast("bigint").alias("n_pairs"),
        (F.sum(dec6(F.col("est"))).cast("double") / n).alias("mean_est"),
        (F.sum(dec6(F.col("jacc"))).cast("double") / n).alias("mean_jaccard"),
        (F.sum(dec6(F.abs(err))).cast("double") / n).alias("mean_abs_err"),
        F.round(
            F.sqrt(F.sum(dec6(err * err)).cast("double") / n), 6
        ).alias("rmse"),
    )


def dedup_minhash_k_sweep_sql() -> str:
    from ..model import dec6_sql

    sig = minhash_signatures_sql()
    ks = ", ".join(f"({k})" for k in MINHASH_KS)
    est = (
        "CAST(list_reduce(list_prepend(0, list_transform(range(1, k + 1), "
        "i -> CASE WHEN sig_a[CAST(i AS INT)] = sig_b[CAST(i AS INT)] "
        "THEN 1 ELSE 0 END)), (a, x) -> a + x) AS DOUBLE) / CAST(k AS DOUBLE)"
    )
    return (
        f"WITH s AS ({sig}), "
        "comp AS (SELECT doc_id, UNNEST(range(1, 17)) AS i, "
        "UNNEST(sig) AS v FROM s), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM comp a JOIN comp b ON a.i = b.i AND a.v = b.v "
        "AND a.doc_id < b.doc_id), "
        f"shd AS (SELECT doc_id, UNNEST(list_distinct({shingles_sql('text')})) AS sh "
        "FROM documents), "
        "sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shd GROUP BY doc_id), "
        "inter AS (SELECT doc_a, doc_b, COUNT(*) AS ni FROM cand "
        "JOIN shd a ON a.doc_id = doc_a "
        "JOIN shd b ON b.doc_id = doc_b AND b.sh = a.sh "
        "GROUP BY doc_a, doc_b), "
        "pj AS (SELECT sa.sig AS sig_a, sb.sig AS sig_b, "
        "CAST(COALESCE(ni, 0) AS DOUBLE) / "
        "(za.nsh + zb.nsh - COALESCE(ni, 0)) AS jacc "
        "FROM cand JOIN s sa ON sa.doc_id = doc_a "
        "JOIN s sb ON sb.doc_id = doc_b "
        "JOIN sizes za ON za.doc_id = doc_a "
        "JOIN sizes zb ON zb.doc_id = doc_b "
        "LEFT JOIN inter USING (doc_a, doc_b)), "
        f"ks AS (SELECT * FROM (VALUES {ks}) t(k)), "
        f"scored AS (SELECT k, {est} AS est, jacc FROM pj CROSS JOIN ks) "
        "SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(" + dec6_sql("est") + ") AS DOUBLE) / COUNT(*) AS mean_est, "
        "CAST(SUM(" + dec6_sql("jacc") + ") AS DOUBLE) / COUNT(*) AS mean_jaccard, "
        "CAST(SUM(" + dec6_sql("ABS(est - jacc)") + ") AS DOUBLE) / COUNT(*) "
        "AS mean_abs_err, "
        "ROUND(SQRT(CAST(SUM(" + dec6_sql("(est - jacc) * (est - jacc)")
        + ") AS DOUBLE) / COUNT(*)), 6) AS rmse "
        "FROM scored GROUP BY k"
    )


# --- near-dup cluster-size profile (round 9) ----------------------------------

def dedup_cluster_stats(docs: DataFrame) -> DataFrame:
    """(cluster_size, n_clusters, n_docs): the size histogram of the
    near-dup components — the skew dial for everything that windows
    per cluster (dedup_keep_best's per-root windows, the rewrite-
    pointer fanout, union-find frontier width). A corpus whose mass
    sits in a few mega-clusters needs the keeper pass salted; one
    whose clusters are pairs doesn't — this relation is how you know
    which corpus you have before running it.

    Composes the shared components engine; the histogram itself is two
    tiny map-combined groupBys (root domain, then size domain). Exact
    integers throughout."""
    comp = dedup_components(docs)
    sizes = comp.groupBy("root_id").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
    )


def dedup_cluster_stats_sql(threshold: float = 0.5) -> str:
    return (
        f"WITH comp AS ({dedup_components_sql(threshold)}), "
        "sizes AS (SELECT root_id, COUNT(*) AS cluster_size FROM comp "
        "GROUP BY root_id) "
        "SELECT CAST(cluster_size AS BIGINT) AS cluster_size, "
        "CAST(COUNT(*) AS BIGINT) AS n_clusters, "
        "CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs "
        "FROM sizes GROUP BY cluster_size"
    )


# --- signature-index write-back + compaction (round 10) ---------------------
#
# The missing half of the incremental dedup lifecycle: dedup_incremental
# CONSULTS a persisted signature index; these functions are what
# APPENDS each crawl increment's signatures back and periodically folds
# the accumulated generations, so tomorrow's increment deduplicates
# against today's docs too. Reference analogue: the create-on-first-
# write dscache plus the flusher write path (receiver/dscache.go:1,
# receiver/flusher.go:1) — consult in memory, persist on a write
# cadence. The write-once-manifest / grace-retire discipline is lifted
# from streaming_catalog_compact (streaming/catalog.py), which proved
# it under batch replay.
#
# Layout under index_dir:
#   delta/g%06d   (doc_id, gen, sig)  one increment's signatures
#   base/b%06d    (doc_id, gen, sig)  a compacted fold of gens <= N
#   manifest/g%06d, manifest/b%06d    write-once pointers, published
#                                     AFTER the data write — a crash
#                                     between data and pointer leaves
#                                     the generation unobservable, and
#                                     a replay rewrites identical
#                                     content then publishes.
# Readers resolve: newest manifested base B, plus deltas with gen > B,
# latest-wins per doc_id (a re-crawled doc's newest signature shadows
# the old one). Generation numbers are caller-supplied (crawl date /
# batch id), which is what makes replay idempotent — the same failed
# job rerun writes the same generation, never a duplicate one.

_IDX_DELTA = "delta"
_IDX_BASE = "base"
_IDX_MANIFEST = "manifest"


def _idx_manifested(spark, index_dir: str, prefix: str) -> list[int]:
    """Sorted generation numbers with a published manifest of the
    given kind ('g' deltas, 'b' bases)."""
    from ..streaming.catalog import _fs

    fs, mdir, _ = _fs(spark, f"{index_dir}/{_IDX_MANIFEST}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        n = st.getPath().getName()
        if n.startswith(prefix) and n[1:].isdigit():
            out.append(int(n[1:]))
    return sorted(out)


def _idx_publish(spark, index_dir: str, name: str) -> None:
    """Write-once pointer (catalog.py:_publish_manifest discipline):
    a single small-object create is atomic on POSIX and object
    stores; re-publishing on replay rewrites identical content.

    SINGLE-WRITER ASSUMPTION (made explicit per the round-10 advice):
    the create(overwrite=true) is safe ONLY because a generation's
    content is a pure function of its inputs — the legitimate
    re-publisher is a replayed job writing byte-identical data, so
    swapping the pointer is a no-op. A caller that re-publishes an
    existing generation number with DIFFERENT data violates the
    lifecycle's contract (generation numbers are crawl dates / batch
    ids — they never carry two payloads); nothing here detects that,
    by design: one index has one writer (the crawl loop), and a
    cross-writer CAS would buy nothing on stores without atomic
    rename anyway."""
    import json

    from ..streaming.catalog import _fs

    fs, mpath, _ = _fs(spark, f"{index_dir}/{_IDX_MANIFEST}/{name}")
    out = fs.create(mpath, True)
    try:
        out.write(bytearray(json.dumps({"name": name}).encode("utf-8")))
    finally:
        out.close()


def _idx_delete(spark, index_dir: str, name: str, kind: str) -> None:
    """Retire one generation: manifest FIRST (so it is never
    resolvable mid-delete), then the data directory."""
    from ..streaming.catalog import _fs

    fs, mpath, jvm = _fs(spark, f"{index_dir}/{_IDX_MANIFEST}/{name}")
    fs.delete(mpath, False)
    dpath = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/{kind}/{name}")
    fs.delete(dpath, True)


def dedup_index_update(
    spark,
    index_dir: str,
    increment: DataFrame,
    generation: int,
    compact_threshold: int = 4,
    snapshot_buckets: int = 8,
) -> None:
    """Append one crawl increment's minhash signatures to the
    persisted index as delta generation ``generation``, then compact
    when ``compact_threshold`` generations have accumulated.

    Idempotent per generation: a replayed job rewrites identical
    content under the same delta path and re-publishes the same
    manifest (signatures are pure functions of the docs). A crash
    between the data write and the manifest publish leaves the delta
    unobservable to every reader — the replay completes it.

    100 TB: the write is INCREMENT-sized (16 hex strings per doc —
    the corpus text never reappears); the only shuffle is the
    increment's own signature groupBy, already paid by the dedup
    consult that precedes the write-back. Deltas are hash-bucketed on
    doc_id so the read path's latest-wins resolve co-locates
    generation-over-generation. Compaction is the single index-sized
    rewrite and runs on the caller's cadence, not per increment."""
    sig = minhash_signatures(increment).select(
        "doc_id", F.lit(int(generation)).alias("gen"), "sig"
    )
    (
        sig.repartition(snapshot_buckets, F.col("doc_id"))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/{_IDX_DELTA}/g{generation:06d}")
    )
    _idx_publish(spark, index_dir, f"g{generation:06d}")
    bases = _idx_manifested(spark, index_dir, "b")
    live_deltas = [
        g
        for g in _idx_manifested(spark, index_dir, "g")
        if not bases or g > bases[-1]
    ]
    if len(live_deltas) + (1 if bases else 0) >= compact_threshold:
        dedup_index_compact(spark, index_dir, snapshot_buckets)


def read_signature_index(
    spark, index_dir: str, assume_disjoint: bool = False
) -> DataFrame:
    """The live signature index: newest manifested base + all deltas
    above it, latest generation winning per doc_id. Returns
    (doc_id, gen, sig).

    The latest-wins resolve is a groupBy over SIGNATURES (16 hex
    strings/doc — gigabytes per 100 TB of text, a maintenance-read
    cost, bucketed co-located by the write path). A deployment whose
    increments never re-crawl a doc_id (fresh ids per crawl) passes
    assume_disjoint=True and skips the shuffle entirely — the union
    is then already the resolved relation, which is what the hot
    dedup_incremental consult path wants."""
    bases = _idx_manifested(spark, index_dir, "b")
    deltas = _idx_manifested(spark, index_dir, "g")
    parts = []
    floor = -1
    if bases:
        floor = bases[-1]
        parts.append(
            spark.read.parquet(f"{index_dir}/{_IDX_BASE}/b{floor:06d}")
        )
    parts.extend(
        spark.read.parquet(f"{index_dir}/{_IDX_DELTA}/g{g:06d}")
        for g in deltas
        if g > floor
    )
    if not parts:
        raise FileNotFoundError(f"no manifested index generations in {index_dir}")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    if assume_disjoint:
        return u
    # latest-wins: max(struct(gen, sig)) — gen is distinct per doc per
    # generation, so the struct max never falls through to the array
    return (
        u.groupBy("doc_id")
        .agg(F.max(F.struct("gen", "sig")).alias("w"))
        .select("doc_id", F.col("w.gen").alias("gen"), F.col("w.sig").alias("sig"))
    )


def dedup_index_compact(
    spark, index_dir: str, snapshot_buckets: int = 8
) -> None:
    """Fold the live base + deltas into one new base generation.

    Grace-retire discipline (catalog.py:_retire_old_snapshots): the
    PREVIOUS compaction's sources (old base + deltas it folded) are
    retired first — they have been shadowed for a full cycle, so no
    in-flight reader can still hold them; the generations THIS fold
    consumes stay readable until the next compaction. Crash anywhere
    is safe: before the new base's manifest lands, readers resolve
    the old base + deltas (identical relation); a replay rewrites the
    same fold."""
    bases = _idx_manifested(spark, index_dir, "b")
    deltas = _idx_manifested(spark, index_dir, "g")
    top = max(deltas) if deltas else (bases[-1] if bases else None)
    if top is None or (bases and top == bases[-1]):
        return  # nothing new to fold
    if bases:
        prev = bases[-1]
        for g in [g for g in deltas if g <= prev]:
            _idx_delete(spark, index_dir, f"g{g:06d}", _IDX_DELTA)
        for b in bases[:-1]:
            _idx_delete(spark, index_dir, f"b{b:06d}", _IDX_BASE)
    cur = read_signature_index(spark, index_dir)
    (
        cur.repartition(snapshot_buckets, F.col("doc_id"))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/{_IDX_BASE}/b{top:06d}")
    )
    _idx_publish(spark, index_dir, f"b{top:06d}")


def dedup_index_update_sql(rel: str = "documents") -> str:
    # the lifecycle's claim, stated directly: after init + one
    # write-back + compaction, the index re-read IS the full-corpus
    # signature rerun (per-row gen records which wave brought the doc)
    return (
        f"SELECT doc_id, array_to_string(sig, '') AS sig_cat, "
        f"CAST(CASE WHEN doc_id % {INCREMENT_MOD} = 0 THEN 1 ELSE 0 END "
        f"AS BIGINT) AS gen "
        f"FROM ({minhash_signatures_sql(rel)})"
    )
