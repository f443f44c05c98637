"""Text analysis operators (SURVEY §2.8): language ID, quality
scoring, token counting, fingerprinting.

All pure column expressions — language ID and quality scores run
inside whole-stage codegen over the raw text column, no Python.
Formulas are written to be expressible identically in DuckDB so every
operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..model import literal_df, spread_small

from .dedup import WORDS_SQL, words

# tiny per-language stopword marker lists (public knowledge)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def _marker_count(wcol, markers):
    return F.size(F.filter(wcol, lambda x: x.isin(*markers)))


def text_langid(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, confidence): argmax of stopword-marker hit
    ratios; 'und' (undetermined) when nothing matches. Ties broken by
    language code order — deterministic in both engines."""
    d, best = _langid_scored(docs, "doc_id")
    return d.select(
        "doc_id",
        F.when(best["score"] > 0.0, best["lang"]).otherwise("und").alias("pred_lang"),
        best["score"].cast("double").alias("confidence"),
    )


def _langid_scored(docs: DataFrame, *carry: str):
    """(scored_df, best_struct): the marker-ratio score columns plus
    the argmax struct, with ``carry`` columns passed through — shared
    by text_langid and corpus_lang_confusion so the classifier is
    defined once."""
    w = words(F.col("text"))
    n = F.size(w)
    scores = [
        (_marker_count(w, m) / F.when(n > 0, n).otherwise(1).cast("double")).alias(
            f"s_{lang}"
        )
        for lang, m in LANG_MARKERS.items()
    ]
    d = docs.select(*carry, n.alias("n"), *scores)
    best = None
    for lang in LANG_MARKERS:
        cand = F.struct(F.col(f"s_{lang}").alias("score"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(
            (cand["score"] > best["score"]), cand
        ).otherwise(best)
    return d, best


def text_langid_sql() -> str:
    w = WORDS_SQL.format(c="text")
    score = {
        lang: (
            f"len(list_filter({w}, x -> x IN ({', '.join(repr(m) for m in ms)}))) "
            f"/ CAST(CASE WHEN len({w}) > 0 THEN len({w}) ELSE 1 END AS DOUBLE)"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best_score = f"s_{langs[0]}"
    best_lang = f"'{langs[0]}'"
    for lang in langs[1:]:
        best_lang = f"CASE WHEN s_{lang} > ({best_score}) THEN '{lang}' ELSE {best_lang} END"
        best_score = f"CASE WHEN s_{lang} > ({best_score}) THEN s_{lang} ELSE {best_score} END"
    inner = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    return (
        f"SELECT doc_id, CASE WHEN ({best_score}) > 0.0 THEN ({best_lang}) "
        f"ELSE 'und' END AS pred_lang, CAST({best_score} AS DOUBLE) AS confidence "
        f"FROM (SELECT doc_id, {inner} FROM documents)"
    )


def text_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, mean_word_len, punct_ratio, stop_ratio, score):
    the standard cheap quality signals for corpus filtering."""
    w = words(F.col("text"))
    n = F.size(w)
    nch = F.length("text")
    word_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.when(n > 0, word_chars.cast("double") / n).otherwise(0.0)
    punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    punct_ratio = F.when(nch > 0, punct.cast("double") / nch).otherwise(0.0)
    stops = _marker_count(w, LANG_MARKERS["en"])
    stop_ratio = F.when(n > 0, stops.cast("double") / n).otherwise(0.0)
    # weights sum as INTEGERS then divide once: double 0.4+0.3+0.2+0.1
    # is 0.9999999999999999 while DuckDB's decimal literals give 1.0
    score = (
        F.when((n >= 20) & (n <= 1000), 4).otherwise(0)
        + F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 3).otherwise(0)
        + F.when(punct_ratio < 0.2, 2).otherwise(0)
        + F.when(stop_ratio > 0.01, 1).otherwise(0)
    ).cast("double") / 10.0
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_wl.cast("double").alias("mean_word_len"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stop_ratio"),
        score.cast("double").alias("score"),
    )


def text_quality_sql(rel: str = "documents") -> str:
    w = WORDS_SQL.format(c="text")
    n = f"len({w})"
    word_chars = f"list_sum(list_transform({w}, x -> len(x)))"
    mean_wl = f"CASE WHEN {n} > 0 THEN CAST({word_chars} AS DOUBLE) / {n} ELSE 0.0 END"
    punct = "len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))"
    punct_ratio = (
        f"CASE WHEN len(text) > 0 THEN CAST({punct} AS DOUBLE) / len(text) ELSE 0.0 END"
    )
    en = ", ".join(repr(m) for m in LANG_MARKERS["en"])
    stops = f"len(list_filter({w}, x -> x IN ({en})))"
    stop_ratio = f"CASE WHEN {n} > 0 THEN CAST({stops} AS DOUBLE) / {n} ELSE 0.0 END"
    score = (
        f"CAST((CASE WHEN {n} >= 20 AND {n} <= 1000 THEN 4 ELSE 0 END) + "
        f"(CASE WHEN ({mean_wl}) >= 3.0 AND ({mean_wl}) <= 10.0 THEN 3 ELSE 0 END) + "
        f"(CASE WHEN ({punct_ratio}) < 0.2 THEN 2 ELSE 0 END) + "
        f"(CASE WHEN ({stop_ratio}) > 0.01 THEN 1 ELSE 0 END) AS DOUBLE) / 10.0"
    )
    return (
        f"SELECT doc_id, CAST({n} AS BIGINT) AS n_words, "
        f"CAST({mean_wl} AS DOUBLE) AS mean_word_len, "
        f"CAST({punct_ratio} AS DOUBLE) AS punct_ratio, "
        f"CAST({stop_ratio} AS DOUBLE) AS stop_ratio, "
        f"CAST({score} AS DOUBLE) AS score FROM {rel}"
    )


def text_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, sub_tokens): whitespace tokens and a BPE-ish
    upper bound — ceil(len/4) subword pieces per word (the rule of
    thumb for byte-pair vocabularies)."""
    w = words(F.col("text"))
    sub = F.aggregate(
        F.transform(w, lambda x: F.ceil(F.length(x) / 4.0)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("ws_tokens"),
        sub.cast("bigint").alias("sub_tokens"),
    )


def text_tokens_sql() -> str:
    w = WORDS_SQL.format(c="text")
    return (
        f"SELECT doc_id, CAST(len({w}) AS BIGINT) AS ws_tokens, "
        f"CAST(list_sum(list_transform({w}, x -> CAST(CEIL(len(x) / 4.0) AS BIGINT))) AS BIGINT) AS sub_tokens "
        "FROM documents"
    )


def text_fingerprint(docs: DataFrame, chunk: int = 64) -> DataFrame:
    """(doc_id, n_chunks, fingerprint): md5 per fixed-size chunk, doc
    fingerprint = lexicographic min of chunk hashes (winnowing-lite —
    stable under chunk reordering and cheap to dedup on)."""
    n_chunks = F.ceil(F.length("text") / float(chunk)).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.sequence(F.lit(0), F.lit(-1))
    )
    hashes = F.transform(
        idx, lambda i: F.md5(F.substring(F.col("text"), i * chunk + 1, chunk))
    )
    return docs.select(
        "doc_id",
        n_chunks.cast("bigint").alias("n_chunks"),
        F.array_min(hashes).alias("fingerprint"),
    )


def text_fingerprint_sql(chunk: int = 64) -> str:
    n = f"CAST(CEIL(len(text) / {float(chunk)!r}) AS INT)"
    hashes = (
        f"list_transform(range(0, {n}), i -> md5(substr(text, i * {chunk} + 1, {chunk})))"
    )
    return (
        f"SELECT doc_id, CAST({n} AS BIGINT) AS n_chunks, "
        f"list_min({hashes}) AS fingerprint FROM documents"
    )


def text_signals(docs: DataFrame) -> DataFrame:
    """Language ID + quality signals in ONE projection chain over a
    single materialized words column — Spark has no automatic scan
    sharing, so deriving text_langid and text_quality separately and
    joining them scans (and re-splits) the corpus twice; this computes
    both families in one pass. Returns (doc_id, pred_lang, score)."""
    w = words(F.col("text"))
    # optimization round 12: the words split + marker counts + length
    # folds are per-row-heavy interpreted work — spread the single-task
    # local scan first (no-op once the scan itself supplies
    # parallelism; see model.spread_small)
    prep = spread_small(docs).select(
        "doc_id", "text", w.alias("w"), F.size(w).alias("n")
    )
    wc = F.col("w")
    n = F.col("n")
    nch = F.length("text")
    score_cols = [
        (
            _marker_count(wc, m)
            / F.when(n > 0, n).otherwise(1).cast("double")
        ).alias(f"s_{lang}")
        for lang, m in LANG_MARKERS.items()
    ]
    word_chars = F.aggregate(
        F.transform(wc, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.when(n > 0, word_chars.cast("double") / n).otherwise(0.0)
    punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    punct_ratio = F.when(nch > 0, punct.cast("double") / nch).otherwise(0.0)
    stops = _marker_count(wc, LANG_MARKERS["en"])
    stop_ratio = F.when(n > 0, stops.cast("double") / n).otherwise(0.0)
    quality = (
        F.when((n >= 20) & (n <= 1000), 4).otherwise(0)
        + F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 3).otherwise(0)
        + F.when(punct_ratio < 0.2, 2).otherwise(0)
        + F.when(stop_ratio > 0.01, 1).otherwise(0)
    ).cast("double") / 10.0
    sig = prep.select(
        "doc_id", *score_cols, quality.alias("score")
    )
    best = None
    for lang in LANG_MARKERS:
        cand = F.struct(F.col(f"s_{lang}").alias("score"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(
            (cand["score"] > best["score"]), cand
        ).otherwise(best)
    return sig.select(
        "doc_id",
        F.when(best["score"] > 0.0, best["lang"]).otherwise("und").alias("pred_lang"),
        F.col("score"),
    )


def corpus_clean(
    docs: DataFrame, min_score: float = 0.5, langs: tuple = ("en", "de", "fr")
) -> DataFrame:
    """The composed training-data prep pipeline: language filter ∧
    quality gate (score ≥ min_score) ∧ exact-dedup keeper selection —
    what a real corpus-cleaning job runs before tokenization. Returns
    (doc_id, pred_lang, score, n_dups) for surviving documents.

    Shape: TWO scans of the corpus — one signal pass (text_signals
    computes language and quality together over one words split) and
    the dedup groupBy (which must see every row) — joined back on
    doc_id. The signal filter applies before the join, so the join
    input is already pruned."""
    from .dedup import dedup_exact

    # optimization round 12: filtering on pred_lang/score pushes the
    # predicate THROUGH text_signals' projection, re-inlining the
    # words() split and the marker counts into the Filter — every row
    # paid the signal chain twice (measured: corpus_clean 3.7 s vs
    # 1.0 s for text_signals + 0.3 s for dedup_exact). The persist
    # fences the 3-column signal relation (narrow: doc_id, lang,
    # score) so the filter runs on computed values.
    sig_all = text_signals(docs).persist()  # fence: returned plan reads this cache
    sig = sig_all.where(
        F.col("pred_lang").isin(*langs) & (F.col("score") >= min_score)
    )
    keep = dedup_exact(docs).select(
        F.col("keeper_id").alias("doc_id"),
        F.col("n_dups"),
    )
    return sig.join(keep, "doc_id").select(
        "doc_id", "pred_lang", F.col("score"), "n_dups"
    )


def corpus_clean_sql(
    min_score: float = 0.5, langs: tuple = ("en", "de", "fr")
) -> str:
    lang_list = ", ".join(repr(x) for x in langs)
    return (
        f"WITH lang AS (SELECT doc_id, pred_lang FROM ({text_langid_sql()})), "
        f"qual AS (SELECT doc_id, score FROM ({text_quality_sql()})), "
        "keep AS (SELECT keeper_id AS doc_id, n_dups FROM ("
        "SELECT md5(text) AS h, COUNT(*) AS n_dups, MIN(doc_id) AS keeper_id "
        "FROM documents GROUP BY md5(text))) "
        "SELECT d.doc_id, pred_lang, score, n_dups "
        "FROM (SELECT doc_id FROM documents) d "
        "JOIN lang ON d.doc_id = lang.doc_id "
        "JOIN qual ON d.doc_id = qual.doc_id "
        "JOIN keep ON d.doc_id = keep.doc_id "
        f"WHERE pred_lang IN ({lang_list}) AND score >= {float(min_score)!r}"
    )


def text_unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style unigram quality score: (doc_id, n_words, avg_logp)
    where avg_logp is the mean corpus-unigram log10-probability of the
    doc's tokens — low scores flag gibberish / OOV-heavy documents for
    the quality gate (the cheap stand-in for an LM perplexity filter).

    Shape: ONE word-frequency aggregate over the corpus (vocab-sized,
    broadcast into the scoring join), then one groupBy(doc). All
    arithmetic is deterministic: counts are exact int64, the count/
    total division and log10 are rounded at 9 digits (the libm rule —
    JVM vs C++ differ in the last ulp), and the per-doc sum uses
    micro6 BIGINT accumulation (order-free; per-group bound trivially
    satisfied: |logp| < 20 per token)."""
    from ..model import micro6

    tok = spread_small(docs).select(
        "doc_id", F.explode(words(F.col("text"))).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("tot"))
    logp = F.round(
        F.log(10.0, F.col("c").cast("double") / F.col("tot")), 9
    )
    scored = (
        tok.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(total))
        .select("doc_id", logp.alias("lp"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        (
            F.sum(micro6(F.col("lp"))).cast("double")
            / 1000000.0
            / F.count("*")
        ).alias("avg_logp"),
    )
    # distinct mirrors the oracle's SELECT DISTINCT doc_id
    return docs.select("doc_id").distinct().join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.col("avg_logp"),
    )


def text_unigram_logprob_sql() -> str:
    w = WORDS_SQL.format(c="text")
    tok = f"SELECT doc_id, UNNEST({w}) AS w FROM documents"
    return (
        f"WITH tok AS ({tok}), "
        "freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w), "
        "total AS (SELECT SUM(c) AS tot FROM freq), "
        "scored AS (SELECT doc_id, "
        "ROUND(LN(CAST(c AS DOUBLE) / tot) / LN(10.0), 9) AS lp "
        "FROM tok JOIN freq USING (w) CROSS JOIN total), "
        "per_doc AS (SELECT doc_id, COUNT(*) AS n_words, "
        "CAST(SUM(CAST(FLOOR(lp * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 / COUNT(*) AS avg_logp "
        "FROM scored GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words, "
        "avg_logp FROM (SELECT DISTINCT doc_id FROM documents) d "
        "LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id"
    )


def text_bigram_lm(docs: DataFrame, backoff: float = 0.4) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp, backoff_frac): corpus-trained
    bigram LM score with stupid backoff (Brants et al. 2007, 'Large
    Language Models in Machine Translation') — the next step up from
    text_unigram_logprob toward a perplexity filter: S(w2|w1) =
    c(w1w2)/c(w1) when the bigram was seen, else backoff·c(w2)/T.
    Low avg_logp flags incoherent token sequences unigram frequency
    can't see; backoff_frac (share of unseen bigrams) is itself a
    novelty/gibberish signal.

    The LM trains on a REFERENCE SPLIT (even doc_ids), exactly the
    CCNet deployment shape (train on the trusted corpus, score the
    crawl) — training on the full corpus would leave every scored
    doc's own bigrams 'seen' and the backoff path structurally dead.
    OOV mass gets a Laplace floor: unseen-branch probability is
    backoff·(c(w2)+1)/(T+V) so a token absent from the reference
    still scores finite. Scoring covers docs with ≥ 2 tokens
    (mirrored in the oracle).

    Shape: two reference-frequency aggregates (unigram + bigram),
    then the doc bigram stream joins both co-keyed on uniform token
    keys — the bigram table is NOT broadcast (vocab² at 100 TB; AQE
    may still choose broadcast at small SF), and only (doc_id, two
    words) rows shuffle. Determinism: exact int64 counts, the
    probability division and log10 rounded at 9 digits (the libm
    rule), per-doc micro6 BIGINT sums (order-free; |logp| < 20),
    int/int double divisions for the fractions."""
    from ..model import micro6

    # NO scan spread (optimization round 13, the fix-9 per-consumer
    # rule): this base feeds explode+AGGREGATE passes whose groupBy
    # exchanges already spread the work across cores, and the r12
    # blanket spread_small measured this key 1.2x SLOWER with the
    # spread (idle A/B 0.75 -> 0.91 s; perplexity_filter, which rides
    # this LM, 1.43 -> 1.73 s) — the extra round-robin exchange of the
    # full ws arrays cost more than the parallelism it bought.
    base = docs.select("doc_id", words(F.col("text")).alias("ws"))
    train_tok = (
        base.where(F.col("doc_id") % 2 == 0)
        .select(F.explode("ws").alias("w"))
    )
    cu = train_tok.groupBy("w").agg(F.count("*").alias("cu"))
    totals = cu.agg(
        F.sum("cu").alias("tot"), F.count("*").alias("vocab")
    )
    b2 = base.where(F.size("ws") >= 2)
    big = (
        b2.select("doc_id", "ws", F.posexplode("ws").alias("i", "w1"))
        .where(F.col("i") < F.size("ws") - 1)
        .select(
            "doc_id",
            "w1",
            F.element_at(F.col("ws"), F.col("i") + 2).alias("w2"),
        )
    )
    cb = (
        big.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
    )
    u1 = cu.select(F.col("w").alias("w1"), F.col("cu").alias("c1"))
    u2 = cu.select(F.col("w").alias("w2"), F.col("cu").alias("c2"))
    seen = F.col("cb").isNotNull()
    p = F.when(seen, F.col("cb").cast("double") / F.col("c1")).otherwise(
        F.lit(backoff)
        * (
            (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
            / (F.col("tot") + F.col("vocab"))
        )
    )
    logp = F.round(F.log(10.0, p), 9)
    scored = (
        big.join(cb, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            logp.alias("lp"),
            (~seen).cast("bigint").alias("backed"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.sum(micro6(F.col("lp"))).cast("double")
            / 1000000.0
            / F.count("*")
        ).alias("avg_logp"),
        (F.sum("backed").cast("double") / F.count("*")).alias("backoff_frac"),
    )


def text_bigram_lm_sql(backoff: float = 0.4) -> str:
    w = WORDS_SQL.format(c="text")
    return (
        f"WITH base AS (SELECT doc_id, {w} AS ws FROM documents), "
        "cu AS (SELECT w, COUNT(*) AS cu FROM "
        "(SELECT UNNEST(ws) AS w FROM base WHERE doc_id % 2 = 0) GROUP BY w), "
        "totals AS (SELECT SUM(cu) AS tot, COUNT(*) AS vocab FROM cu), "
        "b2 AS (SELECT doc_id, ws FROM base WHERE len(ws) >= 2), "
        "big AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1, "
        "ws[CAST(i AS INT) + 1] AS w2 "
        "FROM (SELECT doc_id, ws, UNNEST(range(1, len(ws))) AS i FROM b2)), "
        "cb AS (SELECT w1, w2, COUNT(*) AS cb FROM big "
        "WHERE doc_id % 2 = 0 GROUP BY w1, w2), "
        "scored AS (SELECT big.doc_id, "
        "ROUND(LN(CASE WHEN cb.cb IS NOT NULL "
        "THEN CAST(cb.cb AS DOUBLE) / u1.cu "
        f"ELSE {float(backoff)!r} * "
        "(CAST(COALESCE(u2.cu, 0) + 1 AS DOUBLE) / (tot + vocab)) END) "
        "/ LN(10.0), 9) AS lp, "
        "CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS backed "
        "FROM big "
        "LEFT JOIN cb ON big.w1 = cb.w1 AND big.w2 = cb.w2 "
        "LEFT JOIN cu u1 ON big.w1 = u1.w "
        "LEFT JOIN cu u2 ON big.w2 = u2.w "
        "CROSS JOIN totals) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
        "CAST(SUM(CAST(FLOOR(lp * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 / COUNT(*) AS avg_logp, "
        "CAST(SUM(backed) AS DOUBLE) / COUNT(*) AS backoff_frac "
        "FROM scored GROUP BY doc_id"
    )


def perplexity_filter(docs: DataFrame, backoff: float = 0.4) -> DataFrame:
    """(lang, bucket, n_docs, n_bigrams, mean_logp, logp_lo, logp_hi):
    CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §4.3) — the filter the bigram LM exists to feed: the
    reference-split LM (even doc_ids = the trusted corpus) scores the
    crawl side (odd doc_ids), and each language is cut into terciles
    by LM score; 'head' is the best-scoring third (lowest perplexity
    = highest avg log-prob). The published artifact of the real CCNet
    run is exactly these per-language cutoffs, so the output is the
    per-(lang, bucket) stats incl. the boundary scores.

    Semantics are VALUE-THRESHOLD, not rank: the per-lang cutoffs
    t_head / t_mid are the scores of the ceil(n/3)-th and
    ceil(2n/3)-th best docs, and a doc buckets by comparing its own
    score against them (ties take the better bucket) — the same rule
    CCNet applies when it reuses frozen cutoffs on new crawls.

    Scale shape: the cutoff pass runs over a (lang, micro6-score)
    HISTOGRAM, not per-doc rows — avg_logp lives in (-20, 0], so the
    quantized key domain is ≤ 2·10⁷ distinct values per language
    REGARDLESS of corpus size; the per-lang window sorts that bounded
    relation, never the doc stream. Docs then bucket via a broadcast
    join of n_langs cutoff rows — map-only. Determinism: the bucket
    compare and the cutoffs are micro6 BIGINTs (both engines compare
    the same int, never a float); per-bucket means re-fold the same
    ints; lo/hi are min/max (order-free)."""
    lm = text_bigram_lm(docs, backoff)
    # optimization round 12, examined and left alone: scored feeds the
    # cutoff broadcast build AND the final probe join, but a persist
    # fence A/B-measured SLOWER (2.86 vs 2.75 s at sf0.1, interleaved
    # same-session) — the two consumers shuffle compatibly and
    # ReuseExchange already shares the materialized scored exchange,
    # so the cache only added write overhead.
    scored = (
        lm.where(F.col("doc_id") % 2 == 1)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "lang",
            "n_bigrams",
            "avg_logp",
            F.floor(F.col("avg_logp") * 1000000.0 + F.lit(0.5))
            .cast("bigint")
            .alias("q"),
        )
    )
    from pyspark.sql import Window

    hist = scored.groupBy("lang", "q").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    h2 = hist.select(
        "lang",
        "q",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    k1 = F.floor((F.col("n") + 2) / 3)
    k2 = F.floor((2 * F.col("n") + 2) / 3)
    cuts = h2.groupBy("lang").agg(
        F.max(F.when(F.col("cum") >= k1, F.col("q"))).alias("t_head"),
        F.max(F.when(F.col("cum") >= k2, F.col("q"))).alias("t_mid"),
    )
    bucket = (
        F.when(F.col("q") >= F.col("t_head"), "head")
        .when(F.col("q") >= F.col("t_mid"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select("lang", bucket.alias("bucket"), "n_bigrams", "avg_logp", "q")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            (F.sum("q").cast("double") / 1000000.0 / F.count(F.lit(1))).alias(
                "mean_logp"
            ),
            F.min("avg_logp").alias("logp_lo"),
            F.max("avg_logp").alias("logp_hi"),
        )
    )


def perplexity_filter_sql(backoff: float = 0.4) -> str:
    lm = text_bigram_lm_sql(backoff)
    return (
        f"WITH scored AS MATERIALIZED (SELECT d.lang, lm.n_bigrams, "
        "lm.avg_logp, CAST(FLOOR(lm.avg_logp * 1000000.0 + 0.5) AS BIGINT) AS q "
        f"FROM ({lm}) lm JOIN documents d ON lm.doc_id = d.doc_id "
        "WHERE lm.doc_id % 2 = 1), "
        "hist AS (SELECT lang, q, COUNT(*) AS cnt FROM scored GROUP BY lang, q), "
        "h2 AS (SELECT lang, q, "
        "SUM(cnt) OVER (PARTITION BY lang ORDER BY q DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        "SUM(cnt) OVER (PARTITION BY lang) AS n FROM hist), "
        "cuts AS (SELECT lang, "
        "MAX(CASE WHEN cum >= (n + 2) // 3 THEN q END) AS t_head, "
        "MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN q END) AS t_mid "
        "FROM h2 GROUP BY lang) "
        "SELECT s.lang, CASE WHEN s.q >= c.t_head THEN 'head' "
        "WHEN s.q >= c.t_mid THEN 'middle' ELSE 'tail' END AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(s.n_bigrams) AS BIGINT) AS n_bigrams, "
        "CAST(SUM(s.q) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_logp, "
        "MIN(s.avg_logp) AS logp_lo, MAX(s.avg_logp) AS logp_hi "
        "FROM scored s JOIN cuts c ON s.lang = c.lang "
        "GROUP BY s.lang, bucket"
    )


def _top_run_count(arr):
    """Max multiplicity of any element of a string array: sort, then
    count the longest equal-run in ONE O(n log n) pass — the same
    integer, by definition, as the O(n·distinct) distinct×filter scan
    it replaces (optimization round 12: that scan was ~n²/2 interpreted
    comparisons per document and dominated every consumer that actually
    evaluates the repetition signals — pipeline_prep_full's gopher
    stage measured ~12 s at sf0.1, ~1 s with the run-length fold; the
    standalone gopher/repetition bench keys looked fast only because
    count() pruned the signal columns). Integer-valued, so the swap is
    bit-safe: the doubles downstream divide the identical integers."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(
            acc["prev"].isNull() | (acc["prev"] != x), F.lit(1)
        ).otherwise(acc["run"] + 1)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    # empty array -> 0 (the callers filter n >= 2, and every consumer
    # guards the division, so the NULL-vs-0 distinction of the old
    # array_max(empty) is unreachable in output)
    return F.aggregate(F.array_sort(arr), init, step, lambda a: a["best"])


def text_repetition(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, dup_word_frac, top_word_frac, top_bigram_frac):
    Gopher-style repetition signals (Rae et al. 2021 §A1.1 — excessive
    duplicate/top-fraction n-grams mark boilerplate and spam).

    Map-only on purpose: per-doc frequency maxima come from
    higher-order functions over the materialized words/bigrams arrays
    (distinct × filter counts — a few 10⁴ in-codegen comparisons for a
    typical doc), NOT from an explode + corpus-wide groupBy. At 100 TB
    that is the difference between zero shuffle and shuffling every
    token in the corpus; per-doc work is embarrassingly parallel.
    Arrays are materialized in a projection BEFORE the lambdas read
    them (Spark does no CSE inside higher-order-function lambdas).
    Docs with < 2 words are dropped (repetition undefined) — mirrored
    in the oracle. All counts are integers; each ratio is a single
    int/int double division, identical in both engines."""
    # NO scan spread (r13): identical base + per-row HOF shape as
    # gopher_filter, whose quiet-window A/B measured the spread
    # losing (0.571 vs 0.464 s) — same treatment.
    base = docs.select("doc_id", words(F.col("text")).alias("ws")).where(
        F.size("ws") >= 2
    )
    n = F.size("ws")
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("ws"), i), F.element_at(F.col("ws"), i + 1)
        ),
    )
    b = base.select("doc_id", "ws", n.alias("n"), bigrams.alias("bg"))
    top_w = _top_run_count(F.col("ws"))
    top_b = _top_run_count(F.col("bg"))
    nn = F.col("n")
    return b.select(
        "doc_id",
        nn.cast("bigint").alias("n_words"),
        ((nn - F.size(F.array_distinct("ws"))).cast("double") / nn).alias(
            "dup_word_frac"
        ),
        (top_w.cast("double") / nn).alias("top_word_frac"),
        (top_b.cast("double") / (nn - 1)).alias("top_bigram_frac"),
    )


def text_repetition_sql() -> str:
    w = WORDS_SQL.format(c="text")
    return f"""
WITH d AS (
  SELECT doc_id, ws, len(ws) AS n,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bg
  FROM (SELECT doc_id, {w} AS ws FROM documents)
  WHERE len(ws) >= 2
)
SELECT doc_id, CAST(n AS BIGINT) AS n_words,
  CAST(n - len(list_distinct(ws)) AS DOUBLE) / n AS dup_word_frac,
  CAST(list_max(list_transform(list_distinct(ws),
       x -> len(list_filter(ws, y -> y = x)))) AS DOUBLE) / n AS top_word_frac,
  CAST(list_max(list_transform(list_distinct(bg),
       x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / (n - 1) AS top_bigram_frac
FROM d
"""


# Gopher-rule thresholds (Rae et al. 2021, Table A1) adapted to the
# short synthetic docs: the corpus' n_words sit in [10, 99], so the
# word-count floor is 20 (not 50) to keep the gate non-degenerate.
GOPHER_RULES = {
    "min_words": 20,
    "max_words": 100000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_dup_word_frac": 0.60,
    "max_top_word_frac": 0.14,
    "max_top_bigram_frac": 0.08,
}


def gopher_filter(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, keep): the composite Gopher quality gate —
    word count, mean word length, and the three repetition fractions,
    ANDed. One pass: repetition signals and mean word length share the
    single materialized words array; zero shuffle (see
    text_repetition). The keep flag is pure integer/boolean algebra
    over signals that are themselves cross-engine exact."""
    r = GOPHER_RULES
    # NO scan spread (r13, fix-9 per-consumer rule): alternating
    # quiet-window A/B at <3% steal measured spread 0.571 s vs
    # no-spread 0.464 s — the per-doc HOF work is too cheap at this
    # row width to pay for the round-robin exchange of the full ws
    # arrays (the r12 checklist already had it ~1.05-1.1x slower).
    base = docs.select("doc_id", words(F.col("text")).alias("ws")).where(
        F.size("ws") >= 2
    )
    n = F.size("ws")
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("ws"), i), F.element_at(F.col("ws"), i + 1)
        ),
    )
    word_chars = F.aggregate(
        F.transform(F.col("ws"), lambda x: F.length(x)),
        F.lit(0),
        lambda a, x: a + x,
    )
    b = base.select(
        "doc_id", "ws", n.alias("n"), bigrams.alias("bg"),
        word_chars.alias("wc"),
    )
    top_w = _top_run_count(F.col("ws"))
    top_b = _top_run_count(F.col("bg"))
    nn = F.col("n")
    # every division guarded although base filters len >= 2: across a
    # persist boundary (pipeline_prep_full's cleaned corpus, which
    # contains n=0 fully-stripped docs) Catalyst can evaluate this
    # projection on rows the filter would drop, and ANSI division
    # throws where the unguarded lazy plan never evaluated it — n<2
    # rows are filtered regardless, so output is unchanged
    sig = b.select(
        "doc_id",
        nn.alias("n"),
        F.when(nn > 0, F.col("wc").cast("double") / nn).alias("mwl"),
        F.when(
            nn > 0, (nn - F.size(F.array_distinct("ws"))).cast("double") / nn
        ).alias("dwf"),
        F.when(nn > 0, top_w.cast("double") / nn).alias("twf"),
        F.when(nn > 1, top_b.cast("double") / (nn - 1)).alias("tbf"),
    )
    keep = (
        (F.col("n") >= r["min_words"])
        & (F.col("n") <= r["max_words"])
        & (F.col("mwl") >= r["min_mean_word_len"])
        & (F.col("mwl") <= r["max_mean_word_len"])
        & (F.col("dwf") <= r["max_dup_word_frac"])
        & (F.col("twf") <= r["max_top_word_frac"])
        & (F.col("tbf") <= r["max_top_bigram_frac"])
    )
    return sig.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_words"),
        keep.alias("keep"),
    )


def gopher_filter_sql(rel: str = "documents") -> str:
    # `rel` parameterizes the source relation so composed oracles
    # (prep_full_sql) can point a stage at an upstream CTE without
    # textually rewriting the generated SQL.
    r = GOPHER_RULES
    w = WORDS_SQL.format(c="text")
    return f"""
WITH d AS (
  SELECT doc_id, ws, len(ws) AS n,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bg,
         list_sum(list_transform(ws, x -> len(x))) AS wc
  FROM (SELECT doc_id, {w} AS ws FROM {rel})
  WHERE len(ws) >= 2
),
sig AS (
  SELECT doc_id, n,
    CAST(wc AS DOUBLE) / n AS mwl,
    CAST(n - len(list_distinct(ws)) AS DOUBLE) / n AS dwf,
    CAST(list_max(list_transform(list_distinct(ws),
         x -> len(list_filter(ws, y -> y = x)))) AS DOUBLE) / n AS twf,
    CAST(list_max(list_transform(list_distinct(bg),
         x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / (n - 1) AS tbf
  FROM d
)
SELECT doc_id, CAST(n AS BIGINT) AS n_words,
  (n >= {r['min_words']} AND n <= {r['max_words']}
   AND mwl >= {r['min_mean_word_len']!r} AND mwl <= {r['max_mean_word_len']!r}
   AND dwf <= {r['max_dup_word_frac']!r} AND twf <= {r['max_top_word_frac']!r}
   AND tbf <= {r['max_top_bigram_frac']!r}) AS keep
FROM sig
"""


def corpus_top_ngrams(docs: DataFrame, n: int = 3, k: int = 50) -> DataFrame:
    """(gram, n_docs, n_occurrences) for the k most frequent word
    n-grams corpus-wide — the boilerplate miner: headers, footers, and
    licence blocks surface as grams whose doc-frequency approaches
    their occurrence count.

    Scale shape: explode is map-side; the groupBy shuffles one row per
    DISTINCT gram after partial aggregation (map-side combine collapses
    within-partition repeats — boilerplate by definition repeats); the
    top-k is TakeOrderedAndProject (per-partition heads, never a global
    sort — pinned in test_plans.py). Ties break on the gram string so
    both engines pick the same k rows."""
    from .dedup import shingles_of, words

    base = spread_small(docs).select(words(F.col("text")).alias("ws"), "doc_id")
    grams = base.select(
        "doc_id", F.explode(shingles_of(F.col("ws"), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_occurrences"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)


def corpus_top_ngrams_sql(n: int = 3, k: int = 50) -> str:
    from .dedup import shingles_sql

    grams = shingles_sql("text", n)
    return (
        f"WITH g AS (SELECT doc_id, UNNEST({grams}) AS gram FROM documents) "
        "SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM g GROUP BY gram "
        f"ORDER BY n_occurrences DESC, gram ASC LIMIT {k}"
    )


def corpus_zipf_fit(docs: DataFrame, k: int = 100) -> DataFrame:
    """One-row corpus health diagnostic: OLS fit of log10(freq) vs
    log10(rank) over the top-k unigrams — natural language follows
    Zipf's law with slope ≈ −1; a much flatter slope flags synthetic
    or templated text, a much steeper one a degenerate vocabulary.
    Returns (n_terms, slope, intercept, top1_frac).

    Scale shape: the only corpus-size work is the word-count groupBy
    (map-side combined); top-k is TakeOrderedAndProject, and the rank
    window + moment sums run on k = {k} rows — a literal-bounded
    relation (declared single-partition window, the
    events_conversion_lag class). Determinism: ranks are exact ints
    with ties broken on the term string; log10 outputs round at 9
    (the libm rule); moment sums accumulate micro6 BIGINTs over
    exactly k rows (sx6² ~ 4e16 ≪ int64); the slope division casts
    to double last, in oracle order."""
    from ..model import micro6
    from .dedup import words

    base = spread_small(docs).select(F.explode(words(F.col("text"))).alias("w"))
    counts = base.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("w").asc()).limit(k)

    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("w").asc())
    ranked = top.select(
        F.row_number().over(w_rank).alias("r"), "cnt"
    ).select(
        F.round(F.log(10.0, F.col("r").cast("double")), 9).alias("x"),
        F.round(F.log(10.0, F.col("cnt").cast("double")), 9).alias("y"),
        "cnt",
        F.col("r"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(micro6(F.col("x"))).alias("sx6"),
        F.sum(micro6(F.col("y"))).alias("sy6"),
        F.sum(micro6(F.col("x") * F.col("y"))).alias("sxy6"),
        F.sum(micro6(F.col("x") * F.col("x"))).alias("sxx6"),
        F.sum("cnt").cast("bigint").alias("tot"),
        F.max(F.when(F.col("r") == 1, F.col("cnt"))).alias("c1"),
    )
    num = F.col("n") * F.col("sxy6") * 1000000 - F.col("sx6") * F.col("sy6")
    den = F.col("n") * F.col("sxx6") * 1000000 - F.col("sx6") * F.col("sx6")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        (F.col("sy6").cast("double") - slope * F.col("sx6").cast("double"))
        / 1000000.0
        / F.col("n")
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        (F.col("c1").cast("double") / F.col("tot").cast("double")).alias(
            "top1_frac"
        ),
    )


def corpus_zipf_fit_sql(k: int = 100) -> str:
    from ..model import micro6_sql

    w = WORDS_SQL.format(c="text")
    return (
        f"WITH base AS (SELECT UNNEST({w}) AS w FROM documents), "
        "counts AS (SELECT w, COUNT(*) AS cnt FROM base GROUP BY w), "
        f"top AS (SELECT w, cnt FROM counts ORDER BY cnt DESC, w ASC LIMIT {k}), "
        "ranked AS (SELECT ROUND(LN(CAST(r AS DOUBLE)) / LN(10.0), 9) AS x, "
        "ROUND(LN(CAST(cnt AS DOUBLE)) / LN(10.0), 9) AS y, cnt, r FROM ("
        "SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) AS r "
        "FROM top)), "
        "m AS (SELECT COUNT(*) AS n, "
        f"SUM({micro6_sql('x')}) AS sx6, SUM({micro6_sql('y')}) AS sy6, "
        f"SUM({micro6_sql('x * y')}) AS sxy6, "
        f"SUM({micro6_sql('x * x')}) AS sxx6, "
        "CAST(SUM(cnt) AS BIGINT) AS tot, "
        "MAX(CASE WHEN r = 1 THEN cnt END) AS c1 FROM ranked) "
        "SELECT CAST(n AS BIGINT) AS n_terms, "
        "CAST(n * sxy6 * 1000000 - sx6 * sy6 AS DOUBLE) "
        "/ CAST(n * sxx6 * 1000000 - sx6 * sx6 AS DOUBLE) AS slope, "
        "(CAST(sy6 AS DOUBLE) - CAST(n * sxy6 * 1000000 - sx6 * sy6 AS DOUBLE) "
        "/ CAST(n * sxx6 * 1000000 - sx6 * sx6 AS DOUBLE) "
        "* CAST(sx6 AS DOUBLE)) / 1000000.0 / n AS intercept, "
        "CAST(c1 AS DOUBLE) / CAST(tot AS DOUBLE) AS top1_frac "
        "FROM m"
    )


def _dsir_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bkt): the hashed bigram-feature stream —
    bucket = first 3 md5 hex chars of 'w1 w2' (string key, uniform by
    construction, no integer parse). Shared by the batch selector and
    the streaming scorer's model build."""
    from .dedup import words

    base = spread_small(docs).select("doc_id", "source", words(F.col("text")).alias("ws"))
    b2 = base.where(F.size("ws") >= 2)
    return (
        b2.select(
            "doc_id", "source", "ws", F.posexplode("ws").alias("i", "w1")
        )
        .where(F.col("i") < F.size("ws") - 1)
        .select(
            "doc_id",
            "source",
            F.substring(
                F.md5(
                    F.concat(
                        F.col("w1"),
                        F.lit(" "),
                        F.element_at(F.col("ws"), F.col("i") + 2),
                    )
                ),
                1,
                3,
            ).alias("bkt"),
        )
    )


def dsir_model_row(
    docs: DataFrame, target_source: str = "src0", n_buckets: int = 4096
) -> DataFrame:
    """ONE-row DSIR model for stream scoring: (m, lr_unseen) where m
    maps bucket → log-ratio over the FULL OUTER union of target and
    source buckets (a stream doc may hit a target-only bucket the
    batch selector never needs) and lr_unseen is the closed-form
    score of a bucket absent from BOTH splits. The map is DATA (≤
    n_buckets entries in one map value), not plan literals — the
    codebook-as-literal codegen trap does not apply — and the
    collect_list feeding it folds a ≤ n_buckets-row relation, bounded
    by the hash range at any corpus size."""
    bg = _dsir_buckets(docs)
    tgt = bg.where(F.col("source") == target_source)
    src = bg.where(F.col("source") != target_source)
    ct = tgt.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_t"))
    cs = src.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_s"))
    tot = tgt.select(F.count(F.lit(1)).alias("t_t")).crossJoin(
        src.select(F.count(F.lit(1)).alias("t_s"))
    )
    lr = (
        F.round(
            F.log(
                10.0,
                (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
                / (F.col("t_t") + n_buckets),
            ),
            9,
        )
        - F.round(
            F.log(
                10.0,
                (F.coalesce(F.col("c_s"), F.lit(0)) + 1).cast("double")
                / (F.col("t_s") + n_buckets),
            ),
            9,
        )
    )
    model = (
        ct.join(cs, "bkt", "full_outer")
        .crossJoin(F.broadcast(tot))
        .select("bkt", lr.alias("lr"))
    )
    unseen = (
        F.round(
            F.log(10.0, F.lit(1.0) / (F.col("t_t") + n_buckets)), 9
        )
        - F.round(
            F.log(10.0, F.lit(1.0) / (F.col("t_s") + n_buckets)), 9
        )
    )
    return model.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bkt"), F.col("lr")))
        ).alias("m")
    ).crossJoin(F.broadcast(tot.select(unseen.alias("lr_unseen"))))


def dsir_score_stream(df: DataFrame, model_row: DataFrame) -> DataFrame:
    """Stateless per-row DSIR scoring — the streaming deployment
    shape: the one-row model crossJoins in as a broadcast, bigrams
    derive in-row (transform over the words array, no explode → no
    per-doc aggregation state), and the weight folds the SAME micro6
    ints the batch groupBy sums (int sums are order-free, so in-array
    fold ≡ shuffled sum). Works identically on a static or streaming
    ``df`` of (doc_id, text, ...); zero streaming state, zero
    shuffle. Each derivation stage materializes as its own select
    (the no-CSE-in-HOF rule)."""
    from .dedup import words

    s1 = df.crossJoin(F.broadcast(model_row)).select(
        "doc_id", words(F.col("text")).alias("ws"), "m", "lr_unseen"
    )
    bg = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.substring(
            F.md5(
                F.concat(
                    F.element_at(F.col("ws"), i),
                    F.lit(" "),
                    F.element_at(F.col("ws"), i + 1),
                )
            ),
            1,
            3,
        ),
    )
    s2 = s1.where(F.size("ws") >= 2).select(
        "doc_id", bg.alias("bg"), "m", "lr_unseen"
    )
    lrs = F.transform(
        F.col("bg"),
        lambda b: F.coalesce(F.element_at(F.col("m"), b), F.col("lr_unseen")),
    )
    s3 = s2.select("doc_id", F.col("bg"), lrs.alias("lrs"))
    w6 = F.aggregate(
        F.col("lrs"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.floor(x * 1000000.0 + F.lit(0.5)).cast("bigint"),
    )
    return s3.select(
        "doc_id",
        F.size("bg").cast("bigint").alias("n_feats"),
        (w6.cast("double") / 1000000.0).alias("weight"),
    )


def dsir_select(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 4096,
    k: int = 100,
) -> DataFrame:
    """(doc_id, n_feats, weight): DSIR data selection (Xie et al.
    2023, 'Data Selection for Language Models via Importance
    Resampling') — the standard "pick crawl data that looks like the
    target domain" operator: every non-target doc scores the hashed
    bigram-feature log-likelihood ratio between a target-split LM
    (source = ``target_source``, the contamination convention) and
    the rest-of-corpus LM, Laplace-smoothed over ``n_buckets``
    buckets; top-k by weight are the docs to keep.

    The hashed-feature trick IS the scale story: both LMs are
    ≤ n_buckets rows REGARDLESS of corpus size, so the model
    broadcasts and scoring is one map-side join over the doc bigram
    stream + a per-doc sum — no vocab²-sized state anywhere (the
    contrast with text_bigram_lm, whose exact bigram table shuffles).
    Buckets are the first 3 md5 hex chars of 'w1 w2' (string keys,
    no integer parse — uniform by construction). Determinism: counts
    are exact ints; each log10 rounds at 9 (the libm rule) BEFORE the
    subtraction; per-doc sums fold micro6 BIGINTs; top-k ties break
    on doc_id; the (c+1)/(T+B) divisions cast to double first, in
    oracle order."""
    from ..model import micro6

    bg = _dsir_buckets(docs)
    tgt = bg.where(F.col("source") == target_source)
    src = bg.where(F.col("source") != target_source)
    ct = tgt.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_t"))
    cs = src.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_s"))
    tot = tgt.select(F.count(F.lit(1)).alias("t_t")).crossJoin(
        src.select(F.count(F.lit(1)).alias("t_s"))
    )
    model = (
        cs.join(ct, "bkt", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bkt",
            (
                F.round(
                    F.log(
                        10.0,
                        (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("t_t") + n_buckets),
                    ),
                    9,
                )
                - F.round(
                    F.log(
                        10.0,
                        (F.col("c_s") + 1).cast("double")
                        / (F.col("t_s") + n_buckets),
                    ),
                    9,
                )
            ).alias("lr"),
        )
    )
    scored = src.join(F.broadcast(model), "bkt").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        (F.sum(micro6(F.col("lr"))).cast("double") / 1000000.0).alias(
            "weight"
        ),
    )
    return scored.orderBy(
        F.col("weight").desc(), F.col("doc_id").asc()
    ).limit(k)


def _dsir_scored_sql(target_source: str, n_buckets: int) -> str:
    """Shared WITH chain through the per-doc ``scored`` relation —
    the batch selector appends a top-k, the streaming scorer hashes
    the relation as-is."""
    from ..model import micro6_sql

    w = WORDS_SQL.format(c="text")
    return (
        f"WITH base AS (SELECT doc_id, source, {w} AS ws FROM documents), "
        "b2 AS (SELECT doc_id, source, ws FROM base WHERE len(ws) >= 2), "
        "bg AS (SELECT doc_id, source, "
        "substr(md5(ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]), 1, 3) AS bkt "
        "FROM (SELECT doc_id, source, ws, UNNEST(range(1, len(ws))) AS i FROM b2)), "
        f"tgt AS (SELECT bkt FROM bg WHERE source = '{target_source}'), "
        f"src AS MATERIALIZED (SELECT doc_id, bkt FROM bg "
        f"WHERE source <> '{target_source}'), "
        "ct AS (SELECT bkt, COUNT(*) AS c_t FROM tgt GROUP BY bkt), "
        "cs AS (SELECT bkt, COUNT(*) AS c_s FROM src GROUP BY bkt), "
        "tot AS (SELECT (SELECT COUNT(*) FROM tgt) AS t_t, "
        "(SELECT COUNT(*) FROM src) AS t_s), "
        "model AS (SELECT cs.bkt, "
        f"ROUND(LN(CAST(COALESCE(c_t, 0) + 1 AS DOUBLE) / (t_t + {n_buckets})) "
        "/ LN(10.0), 9) - "
        f"ROUND(LN(CAST(c_s + 1 AS DOUBLE) / (t_s + {n_buckets})) "
        "/ LN(10.0), 9) AS lr "
        "FROM cs LEFT JOIN ct ON cs.bkt = ct.bkt CROSS JOIN tot), "
        "scored AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, "
        f"CAST(SUM({micro6_sql('lr')}) AS DOUBLE) / 1000000.0 AS weight "
        "FROM src JOIN model ON src.bkt = model.bkt GROUP BY doc_id) "
    )


def dsir_select_sql(
    target_source: str = "src0", n_buckets: int = 4096, k: int = 100
) -> str:
    return _dsir_scored_sql(target_source, n_buckets) + (
        "SELECT doc_id, n_feats, weight FROM scored "
        f"ORDER BY weight DESC, doc_id ASC LIMIT {k}"
    )


def dsir_scores_sql(target_source: str = "src0", n_buckets: int = 4096) -> str:
    return _dsir_scored_sql(target_source, n_buckets) + (
        "SELECT doc_id, n_feats, weight FROM scored"
    )


def corpus_heaps_curve(docs: DataFrame, n_points: int = 10) -> DataFrame:
    """(decile, n_docs, n_tokens, vocab): vocabulary-growth curve over
    doc_id-value prefixes — Heaps' law says vocab ~ K·tokensᵝ with
    β ≈ 0.5 for natural text; a curve that SATURATES early (vocab flat
    while tokens grow) is the cheapest corpus-level duplication signal
    there is, and the growth view corpus_dedup_stats' totals can't
    show. Prefix k covers doc_id ≤ lo−1+((hi−lo+1)·k)//n — value
    thresholds, so the curve is deterministic without ranking docs.

    Scale shape: per-doc token counts are map-only (size(words), no
    explode shuffle); the vocab side shuffles once to the
    word→min(doc_id) first-occurrence index (the text_novelty
    relation — incrementally maintainable, min merges order-free);
    both then cross the 10-row broadcast threshold relation for
    conditional sums. No windows anywhere; every output is an exact
    integer."""
    from .dedup import words

    base = spread_small(docs).select("doc_id", words(F.col("text")).alias("ws"))
    per_doc = base.select("doc_id", F.size("ws").alias("n_tok"))
    wmin = (
        base.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("md"))
    )
    bounds = per_doc.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    ks = F.explode(F.array(*[F.lit(k) for k in range(1, n_points + 1)]))
    decs = bounds.select(ks.alias("decile"), "lo", "hi").select(
        F.col("decile").cast("bigint").alias("decile"),
        (
            F.col("lo")
            - 1
            + F.floor(
                (F.col("hi") - F.col("lo") + 1)
                * F.col("decile")
                / F.lit(n_points)
            )
        ).cast("bigint").alias("thresh"),
    )
    toks = (
        per_doc.crossJoin(F.broadcast(decs))
        .groupBy("decile")
        .agg(
            F.sum(F.when(F.col("doc_id") <= F.col("thresh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs"),
            F.sum(
                F.when(
                    F.col("doc_id") <= F.col("thresh"), F.col("n_tok")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    voc = (
        wmin.crossJoin(F.broadcast(decs))
        .groupBy("decile")
        .agg(
            F.sum(F.when(F.col("md") <= F.col("thresh"), 1).otherwise(0))
            .cast("bigint")
            .alias("vocab")
        )
    )
    return toks.join(voc, "decile").select(
        "decile", "n_docs", "n_tokens", "vocab"
    )


def corpus_heaps_curve_sql(n_points: int = 10) -> str:
    w = WORDS_SQL.format(c="text")
    return (
        f"WITH base AS (SELECT doc_id, {w} AS ws FROM documents), "
        "per_doc AS (SELECT doc_id, len(ws) AS n_tok FROM base), "
        "wmin AS (SELECT w, MIN(doc_id) AS md FROM "
        "(SELECT doc_id, UNNEST(ws) AS w FROM base) GROUP BY w), "
        "bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM per_doc), "
        "decs AS (SELECT CAST(k AS BIGINT) AS decile, "
        f"CAST(lo - 1 + FLOOR((hi - lo + 1) * k / {n_points}) AS BIGINT) AS thresh "
        f"FROM bounds CROSS JOIN (SELECT UNNEST(range(1, {n_points + 1})) AS k)), "
        "toks AS (SELECT decile, "
        "CAST(SUM(CASE WHEN doc_id <= thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN doc_id <= thresh THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens "
        "FROM per_doc CROSS JOIN decs GROUP BY decile), "
        "voc AS (SELECT decile, "
        "CAST(SUM(CASE WHEN md <= thresh THEN 1 ELSE 0 END) AS BIGINT) AS vocab "
        "FROM wmin CROSS JOIN decs GROUP BY decile) "
        "SELECT toks.decile AS decile, n_docs, n_tokens, vocab "
        "FROM toks JOIN voc ON toks.decile = voc.decile"
    )


def text_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_distinct, entropy): character-level Shannon
    entropy of the lowercased text — the cheap garbage detector (runs
    of one character ≈ 0 bits; natural language ≈ 4 bits/char).

    Map-only and cross-engine exact: per-character counts come from
    length(s) - length(replace(s, ch)) (literal replace, no regex),
    each p·log2(p) term rounds its libm log to 9 decimals (the same
    rule as text_unigram_logprob — JVM and C++ log differ in the last
    ulp), and the fold runs over the SORTED distinct-character list so
    both engines sum in the identical order."""
    s = F.lower(F.col("text"))
    base = docs.select("doc_id", s.alias("s")).where(F.length("s") > 0)
    chars = F.transform(
        F.sequence(F.lit(1), F.length(F.col("s"))),
        lambda i: F.col("s").substr(i, F.lit(1)),
    )
    b = base.select(
        "doc_id", "s", F.length("s").alias("n"),
        F.array_sort(F.array_distinct(chars)).alias("dc"),
    )
    p = lambda ch: (  # noqa: E731
        (F.length(F.col("s")) - F.length(F.replace(F.col("s"), ch)))
        .cast("double")
        / F.col("n")
    )
    term = lambda ch: p(ch) * F.round(  # noqa: E731
        F.log(p(ch)) / F.log(F.lit(2.0)), 9
    )
    ent = -F.aggregate(F.col("dc"), F.lit(0.0), lambda acc, ch: acc + term(ch))
    return b.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        F.size("dc").cast("bigint").alias("n_distinct"),
        ent.alias("entropy"),
    )


def text_entropy_sql() -> str:
    cnt = "(len(s) - len(replace(s, ch, '')))"
    p = f"(CAST({cnt} AS DOUBLE) / n)"
    term = f"{p} * ROUND(LN({p}) / LN(2.0), 9)"
    return f"""
WITH d AS (SELECT doc_id, lower(text) AS s FROM documents),
c AS (
  SELECT doc_id, s, len(s) AS n,
         list_sort(list_distinct(list_transform(range(1, len(s) + 1), i -> s[i]))) AS dc
  FROM d WHERE len(s) > 0
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       CAST(len(dc) AS BIGINT) AS n_distinct,
       -(list_reduce(list_prepend(0.0, list_transform(dc, ch -> {term})),
                     (acc, x) -> acc + x)) AS entropy
FROM c
"""


# --- C4-style line-level cleaning (Raffel et al. 2020 §2.2) -----------------

# The synthetic documents table is single-line word soup, so the query
# deterministically enriches each doc with extra lines keyed on
# doc_id % 4 — one line-too-short/no-punct case, one banned-phrase
# case, one boilerplate-"javascript" case — with the IDENTICAL
# expression in the oracle. Every rule fires on some slice of the
# corpus instead of vacuously passing.
_C4_EXTRA_1 = (
    "\nThis tiny line no punct"
    "\nA perfectly fine sentence with seven words total."
)
_C4_EXTRA_2 = "\nlorem ipsum dolor sit amet consectetur adipiscing elit today."
_C4_EXTRA_3 = (
    "\nEnable javascript and cookies to continue browsing this site now."
    "\nWe value our reader privacy in this closing sentence."
)


def c4_clean(
    docs: DataFrame, min_line_words: int = 5, min_kept_lines: int = 2
) -> DataFrame:
    """(doc_id, n_lines, n_kept, keep, clean_chars): C4's public
    line-level cleaning rules — keep a line only if it ends in
    terminal punctuation, has >= min_line_words words, and contains no
    boilerplate marker ('lorem ipsum', 'javascript', 'cookie policy',
    '{'); keep the DOC only if >= min_kept_lines lines survive
    (C4 uses 3 sentences; 2 here because the fixture enrichment adds
    at most 2 good lines). Map-only: split + list_filter over each
    doc, zero shuffle — at 100 TB this is one codegen scan, the same
    shape as text_repetition. Lines array materialized before the
    filter lambdas (no CSE inside HOFs)."""
    extra = (
        F.when(F.col("doc_id") % 4 == 1, F.lit(_C4_EXTRA_1))
        .when(F.col("doc_id") % 4 == 2, F.lit(_C4_EXTRA_2))
        .when(F.col("doc_id") % 4 == 3, F.lit(_C4_EXTRA_3))
        .otherwise(F.lit(""))
    )
    enriched = F.concat(F.col("text"), F.lit("."), extra)
    d = docs.select("doc_id", F.split(enriched, "\n").alias("lines"))
    line_ok = lambda x: (  # noqa: E731
        x.rlike('[.!?"]$')
        & (F.size(F.split(F.trim(x), " +")) >= min_line_words)
        & ~F.lower(x).contains("lorem ipsum")
        & ~F.lower(x).contains("javascript")
        & ~F.lower(x).contains("cookie policy")
        & ~x.contains("{")
    )
    k = d.select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        F.filter(F.col("lines"), line_ok).alias("kept"),
    )
    return k.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.size("kept").cast("bigint").alias("n_kept"),
        (F.size("kept") >= min_kept_lines).alias("keep"),
        F.length(F.array_join("kept", "\n")).cast("bigint").alias("clean_chars"),
    )


def c4_clean_sql(min_line_words: int = 5, min_kept_lines: int = 2) -> str:
    def lit(s: str) -> str:
        # '\n'-bearing literals via chr(10) so no escape-string dialect
        parts = s.split("\n")
        return " || chr(10) || ".join("'" + p.replace("'", "''") + "'" for p in parts)

    extra = (
        f"CASE WHEN doc_id % 4 = 1 THEN {lit(_C4_EXTRA_1)} "
        f"WHEN doc_id % 4 = 2 THEN {lit(_C4_EXTRA_2)} "
        f"WHEN doc_id % 4 = 3 THEN {lit(_C4_EXTRA_3)} ELSE '' END"
    )
    ok = (
        "regexp_matches(x, '[.!?\"]$') "
        f"AND len(str_split_regex(trim(x), ' +')) >= {min_line_words} "
        "AND NOT contains(lower(x), 'lorem ipsum') "
        "AND NOT contains(lower(x), 'javascript') "
        "AND NOT contains(lower(x), 'cookie policy') "
        "AND NOT contains(x, '{')"
    )
    return f"""
WITH d AS (
  SELECT doc_id, str_split(text || '.' || {extra}, chr(10)) AS lines
  FROM documents
),
k AS (
  SELECT doc_id, len(lines) AS n_lines,
         list_filter(lines, x -> {ok}) AS kept
  FROM d
)
SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       len(kept) >= {min_kept_lines} AS keep,
       CAST(len(array_to_string(kept, chr(10))) AS BIGINT) AS clean_chars
FROM k
"""


# --- PII scrubbing ----------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, red_len): count and redact
    emails / NANP phone numbers / IPv4 addresses. The fixture corpus
    carries none, so the query plants them deterministically by
    doc_id % 3 (identical expression in the oracle) — every pattern
    both matches and redacts on a real slice. Patterns are chosen to
    parse identically under Java regex (Spark) and RE2 (DuckDB);
    replacement order email -> phone -> ip is fixed on both sides.
    Map-only, zero shuffle — the 100 TB shape is one codegen scan."""
    extra = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" Contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com for details."),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit(" Call 555-867-5309 or ping 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 today."),
            ),
        )
        .otherwise(F.lit(" Nothing sensitive here."))
    )
    d = docs.select("doc_id", F.concat(F.col("text"), extra).alias("s"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("s"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(F.col("s"), F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("s"), F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("s"), F.lit(_PII_IP)).cast("bigint").alias("n_ips"),
        F.length(red).cast("bigint").alias("red_len"),
    )


def pii_scrub_sql() -> str:
    extra = (
        "CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com for details.' "
        "WHEN doc_id % 3 = 1 THEN ' Call 555-867-5309 or ping 10.0.'"
        " || CAST(doc_id % 256 AS VARCHAR) || '.7 today.' "
        "ELSE ' Nothing sensitive here.' END"
    )
    em, ph, ip = _PII_EMAIL, _PII_PHONE, _PII_IP
    red = (
        f"regexp_replace(regexp_replace(regexp_replace(s, '{em}', '<EMAIL>', 'g'),"
        f" '{ph}', '<PHONE>', 'g'), '{ip}', '<IP>', 'g')"
    )
    return f"""
WITH d AS (SELECT doc_id, text || {extra} AS s FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{em}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s, '{ph}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(s, '{ip}')) AS BIGINT) AS n_ips,
       CAST(len({red}) AS BIGINT) AS red_len
FROM d
"""


def corpus_bpe_pairs(docs: DataFrame, k: int = 50) -> DataFrame:
    """(pair, n_words, weight) for the k highest-count adjacent symbol
    pairs in BPE initial state — the first merge-candidate table of
    byte-pair-encoding tokenizer training (each word a char sequence
    closed by an end-of-word marker '</w>').

    The BPE scale trick: pair statistics are computed over the VOCAB
    (distinct word -> corpus count), never the corpus. The corpus is
    touched once by a word count whose shuffle carries one row per
    DISTINCT word after map-side combine; the char-pair explode then
    runs over that tiny vocab relation with the count as weight. At
    100 TB the vocab is a few million rows regardless of corpus size —
    the explode cost is independent of data scale.

    weight = Σ word_count per pair occurrence (a pair occurring twice
    inside one word counts twice, as in the published BPE algorithm);
    integer sums, exact in both engines. Ties break on the pair string
    so both engines pick the same k rows.
    """
    from .dedup import words

    vocab = (
        spread_small(docs).select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.when(
            i < F.length("w"),
            F.concat(
                F.col("w").substr(i, F.lit(1)),
                F.lit(" "),
                F.col("w").substr(i + F.lit(1), F.lit(1)),
            ),
        ).otherwise(F.concat(F.col("w").substr(i, F.lit(1)), F.lit(" </w>"))),
    )
    exploded = vocab.select("w", "n", F.explode(pairs).alias("pair"))
    counts = exploded.groupBy("pair").agg(
        F.countDistinct("w").cast("bigint").alias("n_words"),
        F.sum("n").cast("bigint").alias("weight"),
    )
    return counts.orderBy(F.col("weight").desc(), F.col("pair").asc()).limit(k)


def corpus_bpe_pairs_sql(k: int = 50) -> str:
    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    return f"""
WITH t AS (SELECT UNNEST({w}) AS w FROM documents),
v AS (SELECT w, COUNT(*) AS n FROM t GROUP BY w),
p AS (
  SELECT w, n,
         UNNEST(list_transform(range(1, len(w) + 1),
                i -> CASE WHEN i < len(w) THEN w[i] || ' ' || w[i + 1]
                     ELSE w[i] || ' </w>' END)) AS pair
  FROM v
)
SELECT pair, CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
       CAST(SUM(n) AS BIGINT) AS weight
FROM p GROUP BY pair ORDER BY weight DESC, pair ASC LIMIT {k}
"""


def quality_model(docs: DataFrame) -> DataFrame:
    """(doc_id, z, prob, keep): fixed-weight logistic quality scorer —
    the shape of the fastText/CCNet classifier gate in published LLM
    pipelines (a learned linear model over cheap text features, scored
    at corpus scale). Weights here are fixed literals: the *serving*
    path is what the engine owns; training happens offline and ships
    as a constant vector, exactly like the PQ/IVF codebooks.

    Map-only: features and score in one projection, no shuffle, no
    UDF. Determinism: every feature is a ratio of exact integers, the
    weighted sum is a fixed left-associated chain of literal
    multiplies (identical IEEE sequence in both engines); only
    exp() is libm — the sigmoid rounds at 9 per the project rule.
    """
    z, prob = _quality_logit()
    return docs.select(
        "doc_id",
        F.round(z, 9).alias("z"),
        prob.alias("prob"),
        (prob >= 0.5).alias("keep"),
    )


def _quality_logit():
    """(z, prob) columns of the fixed-weight logistic scorer over
    F.col('text') — shared by quality_model and dataset_card."""
    w = words(F.col("text"))
    n = F.size(w)
    nch = F.length("text")
    word_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.when(n > 0, word_chars.cast("double") / n).otherwise(0.0)
    punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    punct_ratio = F.when(nch > 0, punct.cast("double") / nch).otherwise(0.0)
    stops = _marker_count(w, LANG_MARKERS["en"])
    stop_ratio = F.when(n > 0, stops.cast("double") / n).otherwise(0.0)
    f1 = F.least(n, F.lit(500)).cast("double") / 500.0
    f2 = mean_wl / 10.0
    f4 = F.least(stop_ratio * 10.0, F.lit(1.0))
    z = (
        F.lit(-2.0)
        + F.lit(2.0) * f1
        + F.lit(1.5) * f2
        - F.lit(3.0) * punct_ratio
        + F.lit(2.5) * f4
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    return z, prob


def _quality_logit_sql() -> tuple[str, str]:
    """DuckDB (z, prob) expression strings — twin of _quality_logit."""
    w = WORDS_SQL.format(c="text")
    n = f"len({w})"
    word_chars = f"list_sum(list_transform({w}, x -> len(x)))"
    mean_wl = f"CASE WHEN {n} > 0 THEN CAST({word_chars} AS DOUBLE) / {n} ELSE 0.0 END"
    punct = "len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))"
    punct_ratio = (
        f"CASE WHEN len(text) > 0 THEN CAST({punct} AS DOUBLE) / len(text) ELSE 0.0 END"
    )
    en = ", ".join(repr(m) for m in LANG_MARKERS["en"])
    stops = f"len(list_filter({w}, x -> x IN ({en})))"
    stop_ratio = f"CASE WHEN {n} > 0 THEN CAST({stops} AS DOUBLE) / {n} ELSE 0.0 END"
    f1 = f"CAST(least({n}, 500) AS DOUBLE) / 500.0"
    f2 = f"({mean_wl}) / 10.0"
    f4 = f"least(({stop_ratio}) * 10.0, 1.0)"
    z = f"-2.0 + 2.0 * ({f1}) + 1.5 * ({f2}) - 3.0 * ({punct_ratio}) + 2.5 * ({f4})"
    prob = f"ROUND(1.0 / (1.0 + exp(-({z}))), 9)"
    return z, prob


def quality_model_sql() -> str:
    z, prob = _quality_logit_sql()
    return (
        f"SELECT doc_id, ROUND({z}, 9) AS z, {prob} AS prob, "
        f"{prob} >= 0.5 AS keep FROM documents"
    )


def dataset_card(docs: DataFrame) -> DataFrame:
    """The dataset card: per (source, lang) — n_docs, n_unique,
    dup_rate, whitespace + BPE-ish token totals, mean quality prob,
    keep rate. The reporting relation a training-data pipeline
    publishes with every corpus snapshot; every number the other
    operators act on, in one place.

    One scan of documents: all per-doc signals are map-only
    projections of the same row (the words split is computed once per
    doc), the md5 distinct rides the same groupBy two-phase. Exact
    integer sums; the two ratios divide exact integers; mean quality
    accumulates micro6 on the already-round-9 prob."""
    from ..model import micro6

    _, prob = _quality_logit()
    w = words(F.col("text"))
    sub = F.aggregate(
        F.transform(w, lambda x: F.ceil(F.length(x) / 4.0)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    per = docs.select(
        "source",
        "lang",
        F.md5(F.col("text")).alias("h"),
        F.size(w).cast("long").alias("ws"),
        sub.alias("sub"),
        prob.alias("prob"),
    )
    g = per.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct(F.col("h")).cast("bigint").alias("n_unique"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("sub").cast("bigint").alias("sub_tokens"),
        (
            F.sum(micro6(F.col("prob"))).cast("double") / 1000000.0 / F.count("*")
        ).alias("mean_quality"),
        F.sum(F.when(F.col("prob") >= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep"),
    )
    return g.select(
        "source", "lang", "n_docs", "n_unique",
        (
            (F.col("n_docs") - F.col("n_unique")).cast("double") / F.col("n_docs")
        ).alias("dup_rate"),
        "ws_tokens", "sub_tokens", "mean_quality",
        (F.col("n_keep").cast("double") / F.col("n_docs")).alias("keep_rate"),
    )


def dataset_card_sql() -> str:
    _, prob = _quality_logit_sql()
    w = WORDS_SQL.format(c="text")
    sub = f"list_sum(list_transform({w}, x -> CAST(CEIL(len(x) / 4.0) AS BIGINT)))"
    return f"""
WITH per AS (
  SELECT source, lang, md5(text) AS h, len({w}) AS ws, {sub} AS sub,
         {prob} AS prob
  FROM documents
),
g AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
         CAST(SUM(ws) AS BIGINT) AS ws_tokens,
         CAST(SUM(sub) AS BIGINT) AS sub_tokens,
         CAST(SUM(CAST(FLOOR(prob * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000.0 / COUNT(*) AS mean_quality,
         CAST(SUM(CASE WHEN prob >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
  FROM per GROUP BY source, lang
)
SELECT source, lang, n_docs, n_unique,
       CAST(n_docs - n_unique AS DOUBLE) / n_docs AS dup_rate,
       ws_tokens, sub_tokens, mean_quality,
       CAST(n_keep AS DOUBLE) / n_docs AS keep_rate
FROM g
"""


def text_novelty(docs: DataFrame, k: int = 8) -> DataFrame:
    """(doc_id, n_grams, n_seen, novelty): how much of a document is
    NEW relative to every document before it in doc_id order — the
    contribution score behind incremental-corpus curation ("does this
    crawl snapshot add anything?") and dedup-aware curriculum
    ordering. A doc's distinct k-gram is "seen" when the gram's
    minimum doc_id over the corpus is smaller than this doc's id;
    novelty = 1 − seen/total. The first document is 100% novel by
    construction, an exact duplicate of an earlier doc is 0% novel,
    and the measure is monotone under corpus growth — appending new
    docs never changes earlier docs' scores, so the gram→min(doc_id)
    relation is an incrementally-maintainable index (min is the same
    order-free merge the HLL registers use).

    Scale: one explode (distinct grams per doc), one groupBy(h) min —
    uniform md5 keys, no skew — and one join of the gram relation
    against its own aggregate; the seen test is integer comparison.
    Same shuffle shape as passage_dedup."""
    from .dedup import shingles_of

    grams = (
        spread_small(docs).select("doc_id", words(F.col("text")).alias("w"))
        .select("doc_id", F.explode(shingles_of(F.col("w"), k)).alias("g"))
        .select("doc_id", F.md5("g").alias("h"))
        .distinct()
    )
    first = grams.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    per_doc = (
        grams.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_id") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_seen"),
        )
    )
    return (
        docs.select("doc_id")
        .distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_seen", F.lit(0)).cast("bigint").alias("n_seen"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.lit(1.0)
                - F.col("n_seen").cast("double") / F.col("n_grams"),
            ).alias("novelty"),
        )
    )


def text_novelty_sql(k: int = 8) -> str:
    from .dedup import shingles_sql

    grams = (
        f"SELECT DISTINCT doc_id, md5(UNNEST({shingles_sql('text', k)})) AS h "
        "FROM documents"
    )
    return (
        f"WITH grams AS ({grams}), "
        "first AS (SELECT h, MIN(doc_id) AS first_id FROM grams GROUP BY h), "
        "per_doc AS (SELECT doc_id, COUNT(*) AS n_grams, "
        "SUM(CASE WHEN first_id < doc_id THEN 1 ELSE 0 END) AS n_seen "
        "FROM grams JOIN first USING (h) GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams, "
        "CAST(COALESCE(n_seen, 0) AS BIGINT) AS n_seen, "
        "CASE WHEN COALESCE(n_grams, 0) > 0 "
        "THEN 1.0 - CAST(n_seen AS DOUBLE) / n_grams END AS novelty "
        "FROM (SELECT DISTINCT doc_id FROM documents) d "
        "LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id"
    )


def text_tfidf_keywords(docs: DataFrame, topn: int = 5) -> DataFrame:
    """(doc_id, word, tf, tfidf, rk): the top-``topn`` TF-IDF keywords
    per document — the classic content descriptor feeding search
    indexes, topic drift monitors, and near-dup triage (two docs whose
    keyword sets disagree are a false-positive dedup candidate).

    tfidf = tf · ln(N/df) with tf the within-doc count, df the
    document frequency, N the corpus document count. Determinism: tf /
    df / N are exact integers; the single libm ln rounds at 9 decimals
    (project rule); tf·idf multiplies an exact int by that rounded
    double — identical in both engines; ties break (tfidf desc, word
    asc). Scale: one explode → two groupBys on uniform word keys; the
    df relation re-joins on the word key (co-keyed with the tf
    relation — Catalyst reuses the exchange); the per-doc top-n is a
    WindowGroupLimit rank, never a global sort."""
    from .dedup import words

    w = spread_small(docs).select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    tf = w.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df_ = w.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.select(F.count_distinct("doc_id").alias("n"))
    idf = F.round(F.log(F.col("n").cast("double") / F.col("df")), 9)
    scored = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("word"),
            F.col("tf").cast("bigint").alias("tf"),
            (F.col("tf") * idf).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= topn)
        .select("doc_id", "word", "tf", "tfidf", F.col("rk").cast("bigint"))
    )


def text_tfidf_keywords_sql(topn: int = 5) -> str:
    w = f"SELECT doc_id, UNNEST({WORDS_SQL.format(c='text')}) AS w FROM documents"
    return (
        f"WITH wds AS ({w}), "
        "tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM wds GROUP BY 1, 2), "
        "df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM wds GROUP BY w), "
        "n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents), "
        "scored AS (SELECT doc_id, w AS word, CAST(tf AS BIGINT) AS tf, "
        "tf * ROUND(LN(CAST(n AS DOUBLE) / df), 9) AS tfidf "
        "FROM tf JOIN df USING (w) CROSS JOIN n) "
        "SELECT doc_id, word, tf, tfidf, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
        "ORDER BY tfidf DESC, word ASC) AS rk FROM scored) "
        f"WHERE rk <= {topn}"
    )


def corpus_fingerprint(docs: DataFrame) -> DataFrame:
    """One-row corpus identity: (n_docs, n_unique_texts, checksum) —
    the reproducibility receipt a training run records next to its
    shards ("exactly this data"). checksum sums the first 8 hex chars
    of each text's md5 as int64 — ORDER-FREE and MERGEABLE (+), so
    shard-level fingerprints fold to the corpus fingerprint and any
    engine, any partitioning, any replay produces the same triple;
    32-bit terms keep the int64 sum safe to billions of docs."""
    v = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    return docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct(F.md5("text")).cast("bigint").alias("n_unique_texts"),
        F.sum(v).cast("bigint").alias("checksum"),
    )


def corpus_fingerprint_sql() -> str:
    hx = "md5(text)"
    v = (
        "CAST(("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1) "
            f"* {16 ** (7 - i)}"
            for i in range(8)
        )
        + ") AS BIGINT)"
    )
    return (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts, "
        f"CAST(SUM({v}) AS BIGINT) AS checksum FROM documents"
    )


def corpus_oov_rate(docs: DataFrame, vocab_size: int = 24) -> DataFrame:
    """Tokenizer-coverage audit: build a top-``vocab_size`` word
    vocabulary from the REFERENCE split (doc_id % 2 = 0 — the same
    held-out convention as text_bigram_lm; a vocab fit on the corpus
    it scores reports optimistic coverage) and report the
    out-of-vocabulary token rate per (lang, source) over the scored
    split. The relation every tokenizer-budget decision reads: which
    corpus slices a fixed vocab fails to cover.

    Scale: the word-count groupBy is bounded by the TYPE domain (not
    corpus size), the vocab is ≤vocab_size rows and broadcasts into
    the scoring join, scoring is map-side after it; the final groupBy
    has (lang × source) keys. No doc-row sort anywhere; top-V is
    TakeOrdered, not a global window."""
    base = spread_small(docs).select(
        "doc_id", "lang", "source", words(F.col("text")).alias("ws")
    )
    vocab = _oov_vocab(base, vocab_size).select("w", F.lit(1).alias("iv"))
    tok = base.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source", F.explode("ws").alias("w")
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("lang", "source")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("tot_tokens"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("tot_oov"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "tot_tokens",
            "tot_oov",
            (F.col("tot_oov").cast("double") / F.col("tot_tokens")).alias(
                "oov_rate"
            ),
        )
    )


def corpus_oov_rate_sql(vocab_size: int = 24) -> str:
    w = WORDS_SQL.format(c="text")
    return f"""
WITH base AS (SELECT doc_id, lang, source, ({w}) AS ws FROM documents),
wcount AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT UNNEST(ws) AS w FROM base WHERE doc_id % 2 = 0
  ) GROUP BY w
),
vocab AS (
  SELECT w, 1 AS iv FROM wcount ORDER BY cnt DESC, w ASC LIMIT {vocab_size}
),
tok AS (
  SELECT doc_id, lang, source, UNNEST(ws) AS w FROM base
  WHERE doc_id % 2 = 1
)
SELECT t.lang, t.source,
       CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS tot_tokens,
       CAST(SUM(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS tot_oov,
       CAST(SUM(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS oov_rate
FROM tok t LEFT JOIN vocab v ON v.w = t.w
GROUP BY t.lang, t.source
"""


def _oov_vocab(base: DataFrame, vocab_size: int) -> DataFrame:
    """Top-``vocab_size`` words of the doc_id%2=0 reference split by
    (count DESC, word ASC) — the shared vocab relation of
    corpus_oov_rate and the streaming scorer."""
    return (
        base.where(F.col("doc_id") % 2 == 0)
        .select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w")
    )


def oov_vocab_row(docs: DataFrame, vocab_size: int = 24) -> DataFrame:
    """The vocab as ONE row holding a sorted array — like
    dsir_model_row, the constant-size artifact that broadcasts into a
    stateless stream projection (≤vocab_size entries at ANY corpus
    size)."""
    base = spread_small(docs).select("doc_id", words(F.col("text")).alias("ws"))
    return _oov_vocab(base, vocab_size).agg(
        F.array_sort(F.collect_list("w")).alias("va")
    )


def oov_score_stream(src: DataFrame, vocab_row: DataFrame) -> DataFrame:
    """Stateless per-doc OOV scoring: the one-row vocab array
    cross-joins (broadcast) into the stream and every stat derives
    IN-ROW — no explode, no aggregation, no watermark, zero streaming
    state. Works identically on a batch or streaming ``src`` with
    (doc_id, lang, source, text)."""
    ws = words(F.col("text"))
    n = F.size(ws)
    oov = F.size(F.filter(ws, lambda x: ~F.array_contains(F.col("va"), x)))
    return src.crossJoin(vocab_row).select(
        "doc_id",
        "lang",
        "source",
        n.cast("bigint").alias("n_tokens"),
        oov.cast("bigint").alias("n_oov"),
        F.when(n > 0, oov.cast("double") / n).alias("oov_rate"),
    )


def oov_doc_scores_sql(vocab_size: int = 24) -> str:
    """Per-doc oracle for the streaming scorer (the batch relation a
    zero-state stream provably appends)."""
    w = WORDS_SQL.format(c="text")
    return f"""
WITH base AS (SELECT doc_id, lang, source, ({w}) AS ws FROM documents),
wcount AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT UNNEST(ws) AS w FROM base WHERE doc_id % 2 = 0
  ) GROUP BY w
),
vocab AS (SELECT w FROM wcount ORDER BY cnt DESC, w ASC LIMIT {vocab_size}),
vl AS (SELECT list(w ORDER BY w ASC) AS va FROM vocab)
SELECT doc_id, lang, source,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(ws, x -> NOT list_contains(va, x))) AS BIGINT)
         AS n_oov,
       CASE WHEN len(ws) > 0
            THEN CAST(len(list_filter(ws, x -> NOT list_contains(va, x)))
                      AS DOUBLE) / len(ws)
       END AS oov_rate
FROM base CROSS JOIN vl
WHERE doc_id % 2 = 1
"""


def corpus_diversity(docs: DataFrame) -> DataFrame:
    """Per-source lexical diversity: (source, n_tokens, n_types, ttr,
    simpson, shannon) — the corpus-health panel (a source whose
    diversity collapses is template spam even when per-doc signals
    look fine). Complements per-doc text_entropy with corpus-level
    word statistics.

    Determinism without array folds: Simpson's index is EXACT integer
    algebra — Σ c·(c−1) in DECIMAL(38,0) (the unbounded-squared-sums
    rule: c² overflows int64 at web scale) over N·(N−1) as a double
    product, divided once; Shannon terms quantize each
    (c/N)·log2(c/N) to micro6 BIGINT units after the 9-decimal libm
    round, so the per-source sum is ORDER-FREE integer addition — no
    sorted-array materialization, plain partial aggregation all the
    way. Scale: the only shuffles are the (source, word) count
    (bounded by type domain × sources) and the per-source fold;
    source totals re-enter by broadcast join."""
    wc = (
        spread_small(docs).select("source", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = wc.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = p * F.round(F.log(p) / F.log(F.lit(2.0)), 9)
    term_m6 = F.floor(term * 1000000.0 + 0.5).cast("bigint")
    return (
        wc.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(
                F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)
            ).alias("sim_num"),
            F.sum(term_m6).alias("sh_m6"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            (F.col("n_types").cast("double") / F.col("n_tokens")).alias("ttr"),
            F.when(
                F.col("n_tokens") > 1,
                F.col("sim_num").cast("double")
                / (
                    F.col("n_tokens").cast("double")
                    * (F.col("n_tokens") - 1).cast("double")
                ),
            ).alias("simpson"),
            (-(F.col("sh_m6").cast("double")) / 1000000.0).alias("shannon"),
        )
    )


def corpus_diversity_sql() -> str:
    w = WORDS_SQL.format(c="text")
    p = "(CAST(c AS DOUBLE) / n)"
    term = f"{p} * ROUND(LN({p}) / LN(2.0), 9)"
    return f"""
WITH wc AS (
  SELECT source, w, COUNT(*) AS c FROM (
    SELECT source, UNNEST(({w})) AS w FROM documents
  ) GROUP BY source, w
),
tot AS (SELECT source, SUM(c) AS n FROM wc GROUP BY source),
agg AS (
  SELECT wc.source,
         MAX(n) AS n_tokens,
         COUNT(*) AS n_types,
         SUM(CAST(CAST(c AS HUGEINT) * (c - 1) AS DECIMAL(38,0))) AS sim_num,
         SUM(CAST(FLOOR(({term}) * 1000000.0 + 0.5) AS BIGINT)) AS sh_m6
  FROM wc JOIN tot ON tot.source = wc.source
  GROUP BY wc.source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
       CASE WHEN n_tokens > 1
            THEN CAST(sim_num AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE))
       END AS simpson,
       -(CAST(sh_m6 AS DOUBLE)) / 1000000.0 AS shannon
FROM agg
"""


def text_trigram_lm(docs: DataFrame, backoff: float = 0.4) -> DataFrame:
    """(doc_id, n_trigrams, avg_logp, bi_backoff_frac,
    uni_backoff_frac): reference-split trigram LM with TWO-level
    stupid backoff (round 8) — the n-gram generalization of
    text_bigram_lm toward the 5-gram KenLM depth real CCNet deploys:
    S(w3|w1w2) = c(w1w2w3)/c(w1w2) when the trigram was seen in the
    reference split, else 0.4·c(w2w3)/c(w2), else 0.4²·Laplace
    unigram. The two backoff fractions split "novel continuation of a
    known context" from "wholly out-of-reference vocabulary" — the
    pair of signals a gibberish filter wants separately.

    Same shape discipline as the bigram: reference-split training
    (doc_id % 2 = 0), co-keyed count joins on uniform token keys
    (the trigram table is never broadcast — vocab³ at 100 TB), log10
    rounded at 9 digits, per-doc micro6 BIGINT sums. A seen trigram
    implies its bigram prefix is seen, and a seen (w2,w3) bigram
    implies c(w2) exists, so no denominator in the chosen branch can
    be NULL/0."""
    from ..model import micro6

    # NO scan spread (r13): same explode+aggregate profile as
    # text_bigram_lm; alternating quiet-window A/B at <9% steal
    # measured spread 1.083 s vs no-spread 0.929 s.
    base = docs.select("doc_id", words(F.col("text")).alias("ws"))
    train_tok = (
        base.where(F.col("doc_id") % 2 == 0)
        .select(F.explode("ws").alias("w"))
    )
    cu = train_tok.groupBy("w").agg(F.count("*").alias("cu"))
    totals = cu.agg(F.sum("cu").alias("tot"), F.count("*").alias("vocab"))
    b2 = base.where(F.size("ws") >= 2)
    big = (
        b2.select("doc_id", "ws", F.posexplode("ws").alias("i", "w1"))
        .where(F.col("i") < F.size("ws") - 1)
        .select(
            "doc_id", "w1",
            F.element_at(F.col("ws"), F.col("i") + 2).alias("w2"),
        )
    )
    cb = (
        big.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
    )
    b3 = base.where(F.size("ws") >= 3)
    tri = (
        b3.select("doc_id", "ws", F.posexplode("ws").alias("i", "w1"))
        .where(F.col("i") < F.size("ws") - 2)
        .select(
            "doc_id", "w1",
            F.element_at(F.col("ws"), F.col("i") + 2).alias("w2"),
            F.element_at(F.col("ws"), F.col("i") + 3).alias("w3"),
        )
    )
    ct = (
        tri.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("ct"))
    )
    cb12 = cb.select("w1", "w2", F.col("cb").alias("c12"))
    cb23 = cb.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"),
        F.col("cb").alias("c23"),
    )
    cu2 = cu.select(F.col("w").alias("w2"), F.col("cu").alias("cu2"))
    cu3 = cu.select(F.col("w").alias("w3"), F.col("cu").alias("cu3"))
    seen_tri = F.col("ct").isNotNull()
    seen_bi = F.col("c23").isNotNull()
    p = (
        F.when(seen_tri, F.col("ct").cast("double") / F.col("c12"))
        .when(
            seen_bi,
            F.lit(backoff) * F.col("c23").cast("double") / F.col("cu2"),
        )
        .otherwise(
            F.lit(backoff * backoff)
            * (
                (F.coalesce(F.col("cu3"), F.lit(0)) + 1).cast("double")
                / (F.col("tot") + F.col("vocab"))
            )
        )
    )
    logp = F.round(F.log(10.0, p), 9)
    scored = (
        tri.join(ct, ["w1", "w2", "w3"], "left")
        .join(cb12, ["w1", "w2"], "left")
        .join(cb23, ["w2", "w3"], "left")
        .join(cu2, "w2", "left")
        .join(cu3, "w3", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            logp.alias("lp"),
            (~seen_tri & seen_bi).cast("bigint").alias("bi_backed"),
            (~seen_tri & ~seen_bi).cast("bigint").alias("uni_backed"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        (
            F.sum(micro6(F.col("lp"))).cast("double")
            / 1000000.0
            / F.count("*")
        ).alias("avg_logp"),
        (F.sum("bi_backed").cast("double") / F.count("*")).alias(
            "bi_backoff_frac"
        ),
        (F.sum("uni_backed").cast("double") / F.count("*")).alias(
            "uni_backoff_frac"
        ),
    )


def text_trigram_lm_sql(backoff: float = 0.4) -> str:
    w = WORDS_SQL.format(c="text")
    return (
        f"WITH base AS (SELECT doc_id, {w} AS ws FROM documents), "
        "cu AS (SELECT w, COUNT(*) AS cu FROM "
        "(SELECT UNNEST(ws) AS w FROM base WHERE doc_id % 2 = 0) GROUP BY w), "
        "totals AS (SELECT SUM(cu) AS tot, COUNT(*) AS vocab FROM cu), "
        "b2 AS (SELECT doc_id, ws FROM base WHERE len(ws) >= 2), "
        "big AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1, "
        "ws[CAST(i AS INT) + 1] AS w2 "
        "FROM (SELECT doc_id, ws, UNNEST(range(1, len(ws))) AS i FROM b2)), "
        "cb AS (SELECT w1, w2, COUNT(*) AS cb FROM big "
        "WHERE doc_id % 2 = 0 GROUP BY w1, w2), "
        "b3 AS (SELECT doc_id, ws FROM base WHERE len(ws) >= 3), "
        "tri AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1, "
        "ws[CAST(i AS INT) + 1] AS w2, ws[CAST(i AS INT) + 2] AS w3 "
        "FROM (SELECT doc_id, ws, UNNEST(range(1, len(ws) - 1)) AS i FROM b3)), "
        "ct AS (SELECT w1, w2, w3, COUNT(*) AS ct FROM tri "
        "WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3), "
        "scored AS (SELECT tri.doc_id, "
        "ROUND(LN(CASE WHEN ct.ct IS NOT NULL "
        "THEN CAST(ct.ct AS DOUBLE) / c12.cb "
        "WHEN c23.cb IS NOT NULL "
        f"THEN {float(backoff)!r} * CAST(c23.cb AS DOUBLE) / u2.cu "
        f"ELSE {float(backoff * backoff)!r} * "
        "(CAST(COALESCE(u3.cu, 0) + 1 AS DOUBLE) / (tot + vocab)) END) "
        "/ LN(10.0), 9) AS lp, "
        "CASE WHEN ct.ct IS NULL AND c23.cb IS NOT NULL THEN 1 ELSE 0 END "
        "AS bi_backed, "
        "CASE WHEN ct.ct IS NULL AND c23.cb IS NULL THEN 1 ELSE 0 END "
        "AS uni_backed "
        "FROM tri "
        "LEFT JOIN ct ON tri.w1 = ct.w1 AND tri.w2 = ct.w2 AND tri.w3 = ct.w3 "
        "LEFT JOIN cb c12 ON tri.w1 = c12.w1 AND tri.w2 = c12.w2 "
        "LEFT JOIN cb c23 ON tri.w2 = c23.w1 AND tri.w3 = c23.w2 "
        "LEFT JOIN cu u2 ON tri.w2 = u2.w "
        "LEFT JOIN cu u3 ON tri.w3 = u3.w "
        "CROSS JOIN totals) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams, "
        "CAST(SUM(CAST(FLOOR(lp * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 / COUNT(*) AS avg_logp, "
        "CAST(SUM(bi_backed) AS DOUBLE) / COUNT(*) AS bi_backoff_frac, "
        "CAST(SUM(uni_backed) AS DOUBLE) / COUNT(*) AS uni_backoff_frac "
        "FROM scored GROUP BY doc_id"
    )


def corpus_bpe_merge2(docs: DataFrame, k: int = 50) -> DataFrame:
    """Two composed BPE training steps in ONE Catalyst tree (round 9,
    the lloyd2/nm2 unrolling pattern): compute round-1 merge-candidate
    weights, APPLY the winning merge to every vocab word (greedy
    left-to-right, the published BPE apply rule), and recount adjacent
    pairs over the merged symbol sequences. Returns the round-2 top-k
    (merged_pair, pair, n_words, weight) — merged_pair is the round-1
    winner the whole relation is conditioned on.

    Scale: identical posture to corpus_bpe_pairs — the corpus is
    touched ONCE by the distinct-word count; everything downstream
    (round-1 weights, the merge fold, round-2 recount) runs on the
    vocab relation, whose size is independent of corpus scale. The
    winning pair re-enters as a one-row broadcast (the codebook
    pattern), and the merge itself is an in-row array fold — no
    shuffle beyond the two vocab-sized pair groupBys.

    Determinism: integer weights; ties break on the pair string at
    BOTH the argmax and the final top-k, so engines agree on the
    winner and the k rows. Greedy apply: the fold merges when the
    accumulator's last symbol is `a` and the current is `b`, then the
    merged token ("ab", no space) can't re-match `a` — the same
    non-overlapping left-to-right semantics as the oracle's
    leftmost-occurrence recursion (a round-1 winner's symbols are
    single chars or '</w>', so a merged token never aliases one)."""
    from .dedup import words

    vocab = (
        spread_small(docs).select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        # feeds round-1 weights AND the merge/round-2 recount in the
        # same tree; without the persist the corpus word count runs
        # twice. Vocab-sized (distinct words), tiny at any corpus
        # scale; sweep harnesses clearCache() between queries.
        .persist()  # fence: returned plan reads this cache
    )
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    s0 = vocab.select("w", "n", syms.alias("syms"))

    def adj_pairs(c):
        # adjacent-pair strings of an ALREADY-MATERIALIZED symbol
        # array column (the shingles_of CSE rule)
        return F.transform(
            F.sequence(F.lit(1), F.size(c) - 1),
            lambda i: F.concat(
                F.element_at(c, i), F.lit(" "), F.element_at(c, i + 1)
            ),
        )

    p1 = s0.select("n", F.explode(adj_pairs(F.col("syms"))).alias("pair"))
    top = (
        p1.groupBy("pair")
        .agg(F.sum("n").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("pair").asc())
        .limit(1)
        .select(
            F.col("pair").alias("merged_pair"),
            F.split(F.col("pair"), " ").getItem(0).alias("mp_a"),
            F.split(F.col("pair"), " ").getItem(1).alias("mp_b"),
        )
    )
    empty = F.slice(F.array(F.lit("")), 1, 0)
    fold = F.aggregate(
        F.col("syms"),
        empty,
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.col("mp_a"))
            & (x == F.col("mp_b")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col("mp_a"), F.col("mp_b"))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    merged = s0.crossJoin(F.broadcast(top)).select(
        "w", "n", "merged_pair", fold.alias("m")
    )
    p2 = merged.select(
        "w", "n", "merged_pair", F.explode(adj_pairs(F.col("m"))).alias("pair")
    )
    return (
        p2.groupBy("merged_pair", "pair")
        .agg(
            F.countDistinct("w").cast("bigint").alias("n_words"),
            F.sum("n").cast("bigint").alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("pair").asc())
        .limit(k)
    )


def corpus_bpe_merge2_sql(k: int = 50) -> str:
    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    # the merge apply is a leftmost-occurrence recursion over the
    # space-joined symbol string: each step rewrites exactly one
    # ' a b ' site to ' ab ' (boundary spaces preserved), terminating
    # when no site remains — equivalent to the fold's greedy
    # left-to-right pass because a rewrite never creates a new site
    # to its LEFT. Literals (the pattern/replacement) are hoisted
    # into the MATERIALIZED one-row `top` CTE and carried through the
    # recursion's columns per the recursive-CTE literal rule.
    return f"""
WITH RECURSIVE
t AS (SELECT UNNEST({w}) AS w FROM documents),
v AS (SELECT w, COUNT(*) AS n FROM t GROUP BY w),
s0 AS (
  SELECT w, n,
         list_transform(range(1, len(w) + 1), i -> w[i]) || ['</w>'] AS syms
  FROM v
),
p1 AS (
  SELECT n, UNNEST(list_transform(range(1, len(syms)),
                   i -> syms[i] || ' ' || syms[i + 1])) AS pair
  FROM s0
),
top AS MATERIALIZED (
  SELECT pair AS merged_pair,
         ' ' || pair || ' ' AS pat,
         ' ' || replace(pair, ' ', '') || ' ' AS rep
  FROM (SELECT pair, SUM(n) AS weight FROM p1 GROUP BY pair
        ORDER BY weight DESC, pair ASC LIMIT 1)
),
m AS (
  SELECT w, n, ' ' || array_to_string(syms, ' ') || ' ' AS s, pat, rep
  FROM s0 CROSS JOIN top
  UNION ALL
  SELECT w, n,
         substr(s, 1, strpos(s, pat) - 1) || rep
           || substr(s, strpos(s, pat) + len(pat)),
         pat, rep
  FROM m WHERE strpos(s, pat) > 0
),
done AS (
  SELECT w, n,
         list_filter(string_split(trim(s), ' '), x -> x <> '') AS syms
  FROM m WHERE strpos(s, pat) = 0
),
p2 AS (
  SELECT w, n, UNNEST(list_transform(range(1, len(syms)),
                      i -> syms[i] || ' ' || syms[i + 1])) AS pair
  FROM done
)
SELECT (SELECT merged_pair FROM top) AS merged_pair, pair,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
       CAST(SUM(n) AS BIGINT) AS weight
FROM p2 GROUP BY pair ORDER BY weight DESC, pair ASC LIMIT {k}
"""


def text_kenlm_proxy(
    docs: DataFrame, backoff: float = 0.4, hash_chars: int = 3
) -> DataFrame:
    """(doc_id, n_5grams, avg_logp, bo4_frac, bo3_frac, bo1_frac):
    5-gram-depth stupid-backoff LM over HASHED n-gram tables (round
    9) — the CCNet filter is a 5-gram KenLM, but an exact 5-gram
    table is vocab⁵; this combines the DSIR hashing trick (every
    n-gram keyed by the first ``hash_chars`` md5 hex chars — a fixed
    16^3 = 4096-bucket feature space) with the stupid-backoff chain,
    so the 2/3/4/5-gram tables are CONSTANT-SIZE at any corpus scale
    and all BROADCAST into the scoring stream (the exact trigram LM
    must shuffle its vocab³ table; here only the Laplace-floor
    unigram join is co-keyed). Chain, with train = the reference
    split (doc_id % 2 = 0):

      S(w5|w1..w4) = c(h(w1..w5))/c(h(w1..w4))        both buckets seen
                   | 0.4  · c(h(w2..w5))/c(h(w2..w4))  both seen
                   | 0.4² · c(h(w3..w5))/c(h(w3,w4))   both seen
                   | 0.4³ · (c(w5)+1)/(tot+V)          Laplace floor

    Hashing makes this a PROXY: bucket collisions merge counts (a
    ratio can exceed 1, a novel n-gram can look "seen"), exactly the
    count-merging a hashed-feature model accepts by design — fully
    deterministic in both engines (md5 prefix). Each branch requires
    BOTH its numerator and denominator buckets seen (with collisions,
    a seen n-gram bucket no longer implies its prefix bucket is —
    unlike the exact trigram LM); divisions therefore never see 0.
    Backoff fractions split by the depth the score fell to.
    Determinism: log10 rounded at 9, per-doc micro6 BIGINT sums."""
    from ..model import micro6
    from .dedup import words

    base = spread_small(docs).select("doc_id", words(F.col("text")).alias("ws"))
    train = base.where(F.col("doc_id") % 2 == 0)
    train_tok = train.select(F.explode("ws").alias("w"))
    cu = train_tok.groupBy("w").agg(F.count("*").alias("cu"))
    totals = cu.agg(
        F.sum("cu").alias("tot"), F.count("*").alias("vocab")
    )

    def hb(*cols):
        return F.substring(F.md5(F.concat_ws(" ", *cols)), 1, hash_chars)

    def gram_table(n: int, name: str) -> DataFrame:
        g = (
            train.where(F.size("ws") >= n)
            .select("ws", F.posexplode("ws").alias("i", "g1"))
            .where(F.col("i") < F.size("ws") - (n - 1))
            .select(
                hb(
                    *(
                        [F.col("g1")]
                        + [
                            F.element_at(F.col("ws"), F.col("i") + j + 1)
                            for j in range(1, n)
                        ]
                    )
                ).alias("bkt")
            )
        )
        return g.groupBy("bkt").agg(F.count("*").alias(name))

    h5, h4, h3, h2 = (
        gram_table(5, "c5"),
        gram_table(4, "c4"),
        gram_table(3, "c3"),
        gram_table(2, "c2"),
    )

    five = (
        base.where(F.size("ws") >= 5)
        .select("doc_id", "ws", F.posexplode("ws").alias("i", "w1"))
        .where(F.col("i") < F.size("ws") - 4)
        .select(
            "doc_id",
            "w1",
            *[
                F.element_at(F.col("ws"), F.col("i") + j + 1).alias(f"w{j+1}")
                for j in range(1, 5)
            ],
        )
    )
    keyed = five.select(
        "doc_id",
        "w5",
        hb("w1", "w2", "w3", "w4", "w5").alias("k5"),
        hb("w1", "w2", "w3", "w4").alias("k4p"),
        hb("w2", "w3", "w4", "w5").alias("k4n"),
        hb("w2", "w3", "w4").alias("k3p"),
        hb("w3", "w4", "w5").alias("k3n"),
        hb("w3", "w4").alias("k2p"),
    )
    j = (
        keyed.join(
            F.broadcast(h5.withColumnRenamed("bkt", "k5")), "k5", "left"
        )
        .join(
            F.broadcast(
                h4.select(F.col("bkt").alias("k4p"), F.col("c4").alias("c4p"))
            ),
            "k4p",
            "left",
        )
        .join(
            F.broadcast(
                h4.select(F.col("bkt").alias("k4n"), F.col("c4").alias("c4n"))
            ),
            "k4n",
            "left",
        )
        .join(
            F.broadcast(
                h3.select(F.col("bkt").alias("k3p"), F.col("c3").alias("c3p"))
            ),
            "k3p",
            "left",
        )
        .join(
            F.broadcast(
                h3.select(F.col("bkt").alias("k3n"), F.col("c3").alias("c3n"))
            ),
            "k3n",
            "left",
        )
        .join(
            F.broadcast(
                h2.select(F.col("bkt").alias("k2p"), F.col("c2").alias("c2p"))
            ),
            "k2p",
            "left",
        )
        .join(cu.select(F.col("w").alias("w5"), F.col("cu").alias("cu5")),
              "w5", "left")
        .crossJoin(F.broadcast(totals))
    )
    lvl5 = F.col("c5").isNotNull() & F.col("c4p").isNotNull()
    lvl4 = F.col("c4n").isNotNull() & F.col("c3p").isNotNull()
    lvl3 = F.col("c3n").isNotNull() & F.col("c2p").isNotNull()
    p = (
        F.when(lvl5, F.col("c5").cast("double") / F.col("c4p"))
        .when(lvl4, F.lit(backoff) * F.col("c4n").cast("double") / F.col("c3p"))
        .when(
            lvl3,
            F.lit(backoff ** 2) * F.col("c3n").cast("double") / F.col("c2p"),
        )
        .otherwise(
            F.lit(backoff ** 3)
            * (F.coalesce(F.col("cu5"), F.lit(0)) + 1).cast("double")
            / (F.col("tot") + F.col("vocab"))
        )
    )
    scored = j.select(
        "doc_id",
        F.round(F.log(10.0, p), 9).alias("lp"),
        (~lvl5 & lvl4).cast("bigint").alias("bo4"),
        (~lvl5 & ~lvl4 & lvl3).cast("bigint").alias("bo3"),
        (~lvl5 & ~lvl4 & ~lvl3).cast("bigint").alias("bo1"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_5grams"),
        (
            F.sum(micro6(F.col("lp"))).cast("double") / 1000000.0
            / F.count("*")
        ).alias("avg_logp"),
        (F.sum("bo4").cast("double") / F.count("*")).alias("bo4_frac"),
        (F.sum("bo3").cast("double") / F.count("*")).alias("bo3_frac"),
        (F.sum("bo1").cast("double") / F.count("*")).alias("bo1_frac"),
    )


def text_kenlm_proxy_sql(backoff: float = 0.4, hash_chars: int = 3) -> str:
    w = WORDS_SQL.format(c="text")

    def hb(expr: str) -> str:
        return f"substr(md5({expr}), 1, {hash_chars})"

    def cat(*cols: str) -> str:
        return " || ' ' || ".join(cols)

    def gram_cte(n: int, cname: str) -> str:
        key = hb(cat(*[f"ws[CAST(i AS INT) + {j}]" for j in range(n)]))
        return (
            f"(SELECT bkt, COUNT(*) AS {cname} FROM ("
            f"SELECT {key} AS bkt FROM ("
            "SELECT ws, UNNEST(range(1, len(ws) - "
            f"{n - 2})) AS i FROM base WHERE doc_id % 2 = 0 "
            f"AND len(ws) >= {n})) GROUP BY bkt)"
        )

    wsel = ", ".join(f"ws[CAST(i AS INT) + {j}] AS w{j+1}" for j in range(5))
    k = {
        "k5": hb(cat("w1", "w2", "w3", "w4", "w5")),
        "k4p": hb(cat("w1", "w2", "w3", "w4")),
        "k4n": hb(cat("w2", "w3", "w4", "w5")),
        "k3p": hb(cat("w2", "w3", "w4")),
        "k3n": hb(cat("w3", "w4", "w5")),
        "k2p": hb(cat("w3", "w4")),
    }
    keys = ", ".join(f"{v} AS {n}" for n, v in k.items())
    lvl5 = "c5 IS NOT NULL AND c4p IS NOT NULL"
    lvl4 = "c4n IS NOT NULL AND c3p IS NOT NULL"
    lvl3 = "c3n IS NOT NULL AND c2p IS NOT NULL"
    p = (
        f"CASE WHEN {lvl5} THEN CAST(c5 AS DOUBLE) / c4p "
        f"WHEN {lvl4} THEN {float(backoff)!r} * CAST(c4n AS DOUBLE) / c3p "
        f"WHEN {lvl3} THEN {float(backoff ** 2)!r} * CAST(c3n AS DOUBLE) / c2p "
        f"ELSE {float(backoff ** 3)!r} * "
        "CAST(COALESCE(cu5, 0) + 1 AS DOUBLE) / (tot + vocab) END"
    )
    return (
        f"WITH base AS (SELECT doc_id, {w} AS ws FROM documents), "
        "cu AS (SELECT w, COUNT(*) AS cu FROM "
        "(SELECT UNNEST(ws) AS w FROM base WHERE doc_id % 2 = 0) GROUP BY w), "
        "totals AS (SELECT SUM(cu) AS tot, COUNT(*) AS vocab FROM cu), "
        f"h5 AS {gram_cte(5, 'c5')}, h4 AS {gram_cte(4, 'c4')}, "
        f"h3 AS {gram_cte(3, 'c3')}, h2 AS {gram_cte(2, 'c2')}, "
        f"five AS (SELECT doc_id, {wsel} FROM ("
        "SELECT doc_id, ws, UNNEST(range(1, len(ws) - 3)) AS i "
        "FROM base WHERE len(ws) >= 5)), "
        f"keyed AS (SELECT doc_id, w5, {keys} FROM five), "
        "j AS (SELECT keyed.doc_id, "
        "h5.c5, p4.c4 AS c4p, n4.c4 AS c4n, p3.c3 AS c3p, n3.c3 AS c3n, "
        "p2.c2 AS c2p, cu.cu AS cu5, tot, vocab "
        "FROM keyed "
        "LEFT JOIN h5 ON h5.bkt = keyed.k5 "
        "LEFT JOIN h4 p4 ON p4.bkt = keyed.k4p "
        "LEFT JOIN h4 n4 ON n4.bkt = keyed.k4n "
        "LEFT JOIN h3 p3 ON p3.bkt = keyed.k3p "
        "LEFT JOIN h3 n3 ON n3.bkt = keyed.k3n "
        "LEFT JOIN h2 p2 ON p2.bkt = keyed.k2p "
        "LEFT JOIN cu ON cu.w = keyed.w5 "
        "CROSS JOIN totals), "
        "scored AS (SELECT doc_id, "
        f"ROUND(LN({p}) / LN(10.0), 9) AS lp, "
        f"CASE WHEN NOT ({lvl5}) AND ({lvl4}) THEN 1 ELSE 0 END AS bo4, "
        f"CASE WHEN NOT ({lvl5}) AND NOT ({lvl4}) AND ({lvl3}) "
        "THEN 1 ELSE 0 END AS bo3, "
        f"CASE WHEN NOT ({lvl5}) AND NOT ({lvl4}) AND NOT ({lvl3}) "
        "THEN 1 ELSE 0 END AS bo1 "
        "FROM j) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_5grams, "
        "CAST(SUM(CAST(FLOOR(lp * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 / COUNT(*) AS avg_logp, "
        "CAST(SUM(bo4) AS DOUBLE) / COUNT(*) AS bo4_frac, "
        "CAST(SUM(bo3) AS DOUBLE) / COUNT(*) AS bo3_frac, "
        "CAST(SUM(bo1) AS DOUBLE) / COUNT(*) AS bo1_frac "
        "FROM scored GROUP BY doc_id"
    )


def corpus_snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(source, n_added, n_removed, n_changed, n_unchanged,
    chars_delta): the crawl-over-crawl diff relation — what a corpus
    operator reads before promoting a new snapshot (a source whose
    docs silently churn wholesale is the usual re-crawl pathology,
    the batch twin of corpus_dedup_stats' duplication monitor).

    One full-outer join on doc_id comparing md5(text) — texts never
    shuffle (the hash and length project map-side before the join),
    statuses fold in one per-source aggregation. Exact integer
    output: counts and a char delta."""
    o = old.select(
        "doc_id",
        F.col("source").alias("src_o"),
        F.md5("text").alias("h_o"),
        F.length("text").cast("bigint").alias("len_o"),
    )
    n = new.select(
        "doc_id",
        F.col("source").alias("src_n"),
        F.md5("text").alias("h_n"),
        F.length("text").cast("bigint").alias("len_n"),
    )
    j = o.join(n, "doc_id", "full").select(
        F.coalesce("src_n", "src_o").alias("source"),
        F.when(F.col("h_o").isNull(), "added")
        .when(F.col("h_n").isNull(), "removed")
        .when(F.col("h_o") != F.col("h_n"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        (
            F.coalesce("len_n", F.lit(0)) - F.coalesce("len_o", F.lit(0))
        ).alias("delta"),
    )
    return j.groupBy("source").agg(
        F.sum((F.col("status") == "added").cast("bigint")).alias("n_added"),
        F.sum((F.col("status") == "removed").cast("bigint")).alias(
            "n_removed"
        ),
        F.sum((F.col("status") == "changed").cast("bigint")).alias(
            "n_changed"
        ),
        F.sum((F.col("status") == "unchanged").cast("bigint")).alias(
            "n_unchanged"
        ),
        F.sum("delta").cast("bigint").alias("chars_delta"),
    )


# the registered query's deterministic two-snapshot synthesis: the
# old crawl misses doc_id % 7 = 6, the new one misses % 7 = 5 and
# carries an edit (' rev2' appended) on every % 11 = 0 doc
_SNAP_OLD_PRED = "doc_id % 7 <> 6"
_SNAP_NEW_PRED = "doc_id % 7 <> 5"
_SNAP_EDIT_PRED = "doc_id % 11 = 0"


def corpus_snapshot_diff_sql() -> str:
    return f"""
WITH o AS (SELECT doc_id, source, md5(text) AS h_o, len(text) AS len_o
           FROM documents WHERE {_SNAP_OLD_PRED}),
n AS (SELECT doc_id, source,
             md5(CASE WHEN {_SNAP_EDIT_PRED} THEN text || ' rev2' ELSE text END) AS h_n,
             len(CASE WHEN {_SNAP_EDIT_PRED} THEN text || ' rev2' ELSE text END) AS len_n
      FROM documents WHERE {_SNAP_NEW_PRED}),
j AS (SELECT COALESCE(n.source, o.source) AS source,
             CASE WHEN h_o IS NULL THEN 'added'
                  WHEN h_n IS NULL THEN 'removed'
                  WHEN h_o <> h_n THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(len_n, 0) - COALESCE(len_o, 0) AS delta
      FROM o FULL OUTER JOIN n USING (doc_id))
SELECT source,
       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(SUM(delta) AS BIGINT) AS chars_delta
FROM j GROUP BY source
"""


def quality_calibration(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """(bin, n_docs, mean_prob, gopher_keep_rate): the reliability
    diagram of the fixed-weight logistic quality scorer against the
    Gopher rule gate — the calibration audit every learned quality
    filter ships with (a well-calibrated bin's predicted probability
    tracks the observed keep rate; a flat curve means the classifier
    threshold is doing all the work). Gopher is the proxy label here
    exactly as in published pipelines where rule-based gates
    bootstrap classifier training sets.

    Two map-only scans of the corpus (the logit projection and the
    Gopher signals) joined co-keyed on doc_id, then ONE n_bins-row
    aggregation. Determinism: prob is already round-9; mean_prob
    accumulates micro6 on it; the keep rate divides exact integers;
    bin = least(floor(prob·n_bins), n_bins−1) keeps prob=1.0 in the
    top bin identically in both engines."""
    from ..model import micro6

    _, prob = _quality_logit()
    q = docs.select("doc_id", prob.alias("prob"))
    g = gopher_filter(docs).select("doc_id", F.col("keep").alias("gkeep"))
    b = F.least(
        F.floor(F.col("prob") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        q.join(g, "doc_id")
        .groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            (
                F.sum(micro6(F.col("prob"))).cast("double")
                / 1000000.0
                / F.count("*")
            ).alias("mean_prob"),
            (
                F.sum(F.col("gkeep").cast("int")).cast("double")
                / F.count("*")
            ).alias("gopher_keep_rate"),
        )
    )


def quality_calibration_sql(n_bins: int = 10) -> str:
    from ..model import micro6_sql

    _, prob = _quality_logit_sql()
    return (
        f"WITH q AS (SELECT doc_id, {prob} AS prob FROM documents), "
        f"g AS (SELECT doc_id, keep AS gkeep FROM ({gopher_filter_sql()})), "
        "j AS (SELECT LEAST(CAST(FLOOR(prob * "
        f"{n_bins}) AS INTEGER), {n_bins - 1}) AS bin, prob, gkeep "
        "FROM q JOIN g USING (doc_id)) "
        "SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM({micro6_sql('prob')}) AS DOUBLE) / 1000000.0 / COUNT(*) "
        "AS mean_prob, "
        "CAST(SUM(CASE WHEN gkeep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) "
        "AS gopher_keep_rate "
        "FROM j GROUP BY bin"
    )


# --- token-concentration Gini (round 9) --------------------------------------

def corpus_token_gini(docs: DataFrame) -> DataFrame:
    """(source, n_docs, total_tokens, gini): the token-mass Gini
    coefficient per source — how unequally a source's token budget is
    spread across its documents (gini 0 = every doc the same length;
    -> 1 = a few megadocs carry the slice). The inequality audit a
    mixture designer reads next to pipeline_mix_*: a high-gini source
    hits token budgets with far fewer distinct documents than its
    doc count suggests, and a dedup pass that drops a megadoc swings
    the whole slice.

    One map-only token count, one window RANK PARTITIONED BY SOURCE
    (never global; a source's docs sort among themselves), one
    per-source aggregation. The sorted-rank identity
    G = (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)) runs entirely in
    exact DECIMAL(38,0) integer algebra — i and x_i pre-cast BEFORE
    the multiply (the corpus_diversity ANSI-overflow lesson: int64
    blows at ~3e9 tokens x 1e9 rank; DuckDB's side is HUGEINT) — and
    casts to double only for the final division. Ties in token count
    order by doc_id; equal x under a tie swap leaves Sum(i*x_i)
    unchanged, so the relation is tie-proof."""
    from pyspark.sql import Window

    n_tok = F.size(words(F.col("text"))).cast("bigint")
    t = docs.select("source", "doc_id", n_tok.alias("x"))
    w = Window.partitionBy("source").orderBy(
        F.col("x").asc(), F.col("doc_id").asc()
    )
    ranked = t.select(
        "source",
        F.col("x").cast("decimal(19,0)").alias("xd"),
        F.row_number().over(w).cast("decimal(19,0)").alias("i"),
    )
    agg = ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("xd")).alias("sx"),
        F.sum(F.col("i") * F.col("xd")).alias("six"),
    )
    num = (
        F.lit(2).cast("decimal(19,0)") * F.col("six")
        - (F.col("n_docs") + 1).cast("decimal(19,0)") * F.col("sx")
    ).cast("double")
    den = (
        F.col("n_docs").cast("decimal(19,0)") * F.col("sx")
    ).cast("double")
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("sx").cast("bigint").alias("total_tokens"),
        F.when(den != 0.0, num / den).otherwise(F.lit(0.0)).alias("gini"),
    )


def corpus_token_gini_sql() -> str:
    w = WORDS_SQL.format(c="text")
    return (
        f"WITH t AS (SELECT source, doc_id, CAST(len({w}) AS BIGINT) AS x "
        "FROM documents), "
        "ranked AS (SELECT source, CAST(x AS HUGEINT) AS xd, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY source "
        "ORDER BY x ASC, doc_id ASC) AS HUGEINT) AS i FROM t), "
        "agg AS (SELECT source, COUNT(*) AS n_docs, SUM(xd) AS sx, "
        "SUM(i * xd) AS six FROM ranked GROUP BY source) "
        "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
        "CAST(sx AS BIGINT) AS total_tokens, "
        "CASE WHEN CAST(CAST(n_docs AS HUGEINT) * sx AS DOUBLE) <> 0.0 "
        "THEN CAST(2 * six - (CAST(n_docs AS HUGEINT) + 1) * sx AS DOUBLE) "
        "/ CAST(CAST(n_docs AS HUGEINT) * sx AS DOUBLE) ELSE 0.0 END AS gini "
        "FROM agg"
    )


# --- quality-score drift (PSI) between crawls (round 9) ----------------------

def corpus_quality_psi(
    old: DataFrame, new: DataFrame, n_bins: int = 10
) -> DataFrame:
    """(bin, n_old, n_new, p_old, p_new, psi_term, psi_total): the
    Population Stability Index of the quality-score distribution
    between two crawl snapshots — the drift monitor a production
    pipeline alarms on before promoting a crawl (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 re-calibrate the quality model; the
    credit-scoring rule applied to corpus ops). Companion to
    corpus_snapshot_diff: that relation says WHICH docs churned, this
    one says whether the churn moved the quality distribution.

    Two map-only scored scans (the logistic prob is round-9 by
    contract), one n_bins-row count aggregation each, bins densified
    from a literal range so empty deciles participate. Laplace-
    smoothed shares p = (n + 0.5)/(tot + n_bins/2) keep every log
    finite and deterministic; the PSI term (p_new - p_old) *
    ln(p_new/p_old) rounds at 6 per the libm rule, and psi_total sums
    the ROUNDED terms in exact micro6 integers (order-free), re-
    entering as a one-row broadcast."""
    from ..model import micro6

    _, prob = _quality_logit()
    b = F.least(
        F.floor(prob * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    o = old.select(b).groupBy("bin").agg(F.count("*").alias("n_old"))
    n = new.select(b).groupBy("bin").agg(F.count("*").alias("n_new"))
    bins = (
        old.sparkSession.range(n_bins)
        .select(F.col("id").cast("int").alias("bin"))
    )
    rel = (
        bins.join(F.broadcast(o), "bin", "left")
        .join(F.broadcast(n), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
    )
    tot = rel.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    half = float(n_bins) / 2.0
    p_old = (F.col("n_old").cast("double") + 0.5) / (
        F.col("t_old").cast("double") + half
    )
    p_new = (F.col("n_new").cast("double") + 0.5) / (
        F.col("t_new").cast("double") + half
    )
    scored = rel.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        F.round(
            (p_new - p_old) * F.log(p_new / p_old), 6
        ).alias("psi_term"),
    )
    total = scored.agg(
        (F.sum(micro6(F.col("psi_term"))) / 1000000.0).alias("psi_total")
    )
    return scored.crossJoin(F.broadcast(total)).select(
        "bin", "n_old", "n_new", "p_old", "p_new", "psi_term",
        F.col("psi_total").cast("double").alias("psi_total"),
    )


def corpus_quality_psi_sql(n_bins: int = 10) -> str:
    from ..model import micro6_sql

    _, prob = _quality_logit_sql()
    half = float(n_bins) / 2.0
    newtext = (
        f"SELECT CASE WHEN {_SNAP_EDIT_PRED} THEN text || ' rev2' "
        f"ELSE text END AS text FROM documents WHERE {_SNAP_NEW_PRED}"
    )
    p_old = f"(CAST(n_old AS DOUBLE) + 0.5) / (CAST(t_old AS DOUBLE) + {half!r})"
    p_new = f"(CAST(n_new AS DOUBLE) + 0.5) / (CAST(t_new AS DOUBLE) + {half!r})"
    return (
        f"WITH ob AS (SELECT LEAST(CAST(FLOOR(({prob}) * {n_bins}) AS INTEGER), "
        f"{n_bins - 1}) AS bin FROM documents WHERE {_SNAP_OLD_PRED}), "
        f"nb AS (SELECT LEAST(CAST(FLOOR(({prob}) * {n_bins}) AS INTEGER), "
        f"{n_bins - 1}) AS bin FROM ({newtext})), "
        "oc AS (SELECT bin, COUNT(*) AS n_old FROM ob GROUP BY bin), "
        "nc AS (SELECT bin, COUNT(*) AS n_new FROM nb GROUP BY bin), "
        f"bins AS (SELECT CAST(r.range AS INTEGER) AS bin FROM range(0, {n_bins}) r), "
        "rel AS (SELECT bin, CAST(COALESCE(n_old, 0) AS BIGINT) AS n_old, "
        "CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new "
        "FROM bins LEFT JOIN oc USING (bin) LEFT JOIN nc USING (bin)), "
        "tot AS (SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM rel), "
        "scored AS (SELECT bin, n_old, n_new, "
        f"{p_old} AS p_old, {p_new} AS p_new, "
        f"ROUND((({p_new}) - ({p_old})) * ln(({p_new}) / ({p_old})), 6) AS psi_term "
        "FROM rel CROSS JOIN tot), "
        "total AS (SELECT CAST(SUM("
        + micro6_sql("psi_term")
        + ") AS DOUBLE) / 1000000.0 AS psi_total FROM scored) "
        "SELECT bin, n_old, n_new, p_old, p_new, psi_term, psi_total "
        "FROM scored CROSS JOIN total"
    )


def corpus_bpe_merge3(docs: DataFrame, k: int = 50) -> DataFrame:
    """THREE composed BPE training steps in one Catalyst tree (round
    9, extending corpus_bpe_merge2 by the nm3 pattern): round-1 merge
    -> round-2 recount -> round-2 merge -> round-3 recount. Returns
    the round-3 top-k (merged_pair, merged_pair2, pair, n_words,
    weight), conditioned on both winners.

    The within-round rewrite ' a b ' -> ' ab ' can never create a new
    merge SITE (a site to the left needs b = ab, to the right a = ab —
    both length-impossible), so the greedy fold and the oracle's
    leftmost-occurrence recursion stay equivalent at EVERY round, not
    just round 1 where symbols are single chars; round 2 just runs the
    same argument over an alphabet that now contains the round-1
    token. Scale posture unchanged: the corpus is touched once by the
    distinct-word count; both winners re-enter as one-row broadcasts;
    folds are in-row; the three pair groupBys are vocab-sized."""
    from .dedup import words

    vocab = (
        spread_small(docs).select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .persist()  # fence: returned plan reads this cache
    )
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    s0 = vocab.select("w", "n", syms.alias("syms"))

    def adj_pairs(c):
        return F.transform(
            F.sequence(F.lit(1), F.size(c) - 1),
            lambda i: F.concat(
                F.element_at(c, i), F.lit(" "), F.element_at(c, i + 1)
            ),
        )

    def top1(pairs_df, out_pair, a, b):
        return (
            pairs_df.groupBy("pair")
            .agg(F.sum("n").alias("weight"))
            .orderBy(F.col("weight").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.col("pair").alias(out_pair),
                F.split(F.col("pair"), " ").getItem(0).alias(a),
                F.split(F.col("pair"), " ").getItem(1).alias(b),
            )
        )

    def fold_merge(c, a, b):
        empty = F.slice(F.array(F.lit("")), 1, 0)
        return F.aggregate(
            c,
            empty,
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.col(a))
                & (x == F.col(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.col(a), F.col(b))),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    p1 = s0.select("n", F.explode(adj_pairs(F.col("syms"))).alias("pair"))
    t1 = top1(p1, "merged_pair", "mp_a", "mp_b")
    m1 = s0.crossJoin(F.broadcast(t1)).select(
        "w", "n", "merged_pair", fold_merge(F.col("syms"), "mp_a", "mp_b").alias("m")
    )
    p2 = m1.select("n", F.explode(adj_pairs(F.col("m"))).alias("pair"))
    t2 = top1(p2, "merged_pair2", "mp2_a", "mp2_b")
    m2 = m1.crossJoin(F.broadcast(t2)).select(
        "w",
        "n",
        "merged_pair",
        "merged_pair2",
        fold_merge(F.col("m"), "mp2_a", "mp2_b").alias("m2"),
    )
    p3 = m2.select(
        "w",
        "n",
        "merged_pair",
        "merged_pair2",
        F.explode(adj_pairs(F.col("m2"))).alias("pair"),
    )
    return (
        p3.groupBy("merged_pair", "merged_pair2", "pair")
        .agg(
            F.countDistinct("w").cast("bigint").alias("n_words"),
            F.sum("n").cast("bigint").alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("pair").asc())
        .limit(k)
    )


def corpus_bpe_merge3_sql(k: int = 50) -> str:
    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    return f"""
WITH RECURSIVE
t AS (SELECT UNNEST({w}) AS w FROM documents),
v AS (SELECT w, COUNT(*) AS n FROM t GROUP BY w),
s0 AS (
  SELECT w, n,
         list_transform(range(1, len(w) + 1), i -> w[i]) || ['</w>'] AS syms
  FROM v
),
p1 AS (
  SELECT n, UNNEST(list_transform(range(1, len(syms)),
                   i -> syms[i] || ' ' || syms[i + 1])) AS pair
  FROM s0
),
top AS MATERIALIZED (
  SELECT pair AS merged_pair,
         ' ' || pair || ' ' AS pat,
         ' ' || replace(pair, ' ', '') || ' ' AS rep
  FROM (SELECT pair, SUM(n) AS weight FROM p1 GROUP BY pair
        ORDER BY weight DESC, pair ASC LIMIT 1)
),
m AS (
  SELECT w, n, ' ' || array_to_string(syms, ' ') || ' ' AS s, pat, rep
  FROM s0 CROSS JOIN top
  UNION ALL
  SELECT w, n,
         substr(s, 1, strpos(s, pat) - 1) || rep
           || substr(s, strpos(s, pat) + len(pat)),
         pat, rep
  FROM m WHERE strpos(s, pat) > 0
),
done AS (
  SELECT w, n,
         list_filter(string_split(trim(s), ' '), x -> x <> '') AS syms
  FROM m WHERE strpos(s, pat) = 0
),
p2 AS (
  SELECT n, UNNEST(list_transform(range(1, len(syms)),
                   i -> syms[i] || ' ' || syms[i + 1])) AS pair
  FROM done
),
top2 AS MATERIALIZED (
  SELECT pair AS merged_pair2,
         ' ' || pair || ' ' AS pat2,
         ' ' || replace(pair, ' ', '') || ' ' AS rep2
  FROM (SELECT pair, SUM(n) AS weight FROM p2 GROUP BY pair
        ORDER BY weight DESC, pair ASC LIMIT 1)
),
m2 AS (
  SELECT w, n, ' ' || array_to_string(syms, ' ') || ' ' AS s, pat2, rep2
  FROM done CROSS JOIN top2
  UNION ALL
  SELECT w, n,
         substr(s, 1, strpos(s, pat2) - 1) || rep2
           || substr(s, strpos(s, pat2) + len(pat2)),
         pat2, rep2
  FROM m2 WHERE strpos(s, pat2) > 0
),
done2 AS (
  SELECT w, n,
         list_filter(string_split(trim(s), ' '), x -> x <> '') AS syms
  FROM m2 WHERE strpos(s, pat2) = 0
),
p3 AS (
  SELECT w, n, UNNEST(list_transform(range(1, len(syms)),
                      i -> syms[i] || ' ' || syms[i + 1])) AS pair
  FROM done2
)
SELECT (SELECT merged_pair FROM top) AS merged_pair,
       (SELECT merged_pair2 FROM top2) AS merged_pair2, pair,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
       CAST(SUM(n) AS BIGINT) AS weight
FROM p3 GROUP BY pair ORDER BY weight DESC, pair ASC LIMIT {k}
"""


# --- langid confusion matrix (round 9) ----------------------------------------

def corpus_lang_confusion(docs: DataFrame) -> DataFrame:
    """(lang, pred_lang, n, share): the declared-vs-predicted language
    confusion matrix — the QA relation a corpus operator reads before
    trusting EITHER signal (a source whose declared lang disagrees
    with the classifier wholesale is mislabeled metadata or a broken
    classifier; per-row disagreement feeds manual review). share is
    row-normalized within the declared lang, so the diagonal is the
    per-language agreement rate.

    ONE map-only scored scan (the classifier is the same pure column
    algebra as text_langid, defined once in _langid_scored — pred and
    the declared lang live in the same row, no join), one groupBy on
    the ≤|langs|²-key domain, row totals re-entering co-keyed on the
    declared lang (the events_transitions shape). Exact counts; share
    divides exact integers."""
    d, best = _langid_scored(docs, "lang")
    pred = F.when(best["score"] > 0.0, best["lang"]).otherwise("und")
    c = d.groupBy("lang", pred.alias("pred_lang")).agg(
        F.count("*").alias("n")
    )
    tot = c.groupBy("lang").agg(F.sum("n").alias("tot"))
    return c.join(tot, "lang").select(
        "lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
    )


def corpus_lang_confusion_sql() -> str:
    w = WORDS_SQL.format(c="text")
    score = {
        lang: (
            f"len(list_filter({w}, x -> x IN ({', '.join(repr(m) for m in ms)}))) "
            f"/ CAST(CASE WHEN len({w}) > 0 THEN len({w}) ELSE 1 END AS DOUBLE)"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best_score = f"s_{langs[0]}"
    best_lang = f"'{langs[0]}'"
    for lang in langs[1:]:
        best_lang = f"CASE WHEN s_{lang} > ({best_score}) THEN '{lang}' ELSE {best_lang} END"
        best_score = f"CASE WHEN s_{lang} > ({best_score}) THEN s_{lang} ELSE {best_score} END"
    inner = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    return (
        "WITH p AS (SELECT lang, "
        f"CASE WHEN ({best_score}) > 0.0 THEN ({best_lang}) ELSE 'und' END AS pred_lang "
        f"FROM (SELECT lang, {inner} FROM documents)), "
        "c AS (SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY lang, pred_lang), "
        "t AS (SELECT lang, SUM(n) AS tot FROM c GROUP BY lang) "
        "SELECT lang, pred_lang, CAST(n AS BIGINT) AS n, "
        "CAST(n AS DOUBLE) / tot AS share FROM c JOIN t USING (lang)"
    )


# --- quality-cutoff sweep (round 9) -------------------------------------------

QUALITY_CUTS = (0.1, 0.3, 0.5, 0.7, 0.9)


def pipeline_quality_sweep(docs: DataFrame) -> DataFrame:
    """(cutoff, n_kept, doc_share, tokens_kept, token_share): what
    each quality-probability cutoff KEEPS, in docs and in tokens — the
    relation a mixture designer reads to pick the gate (CCNet keeps
    the best-perplexity tercile; a learned filter keeps above a prob
    cutoff; either way the decision is a survival curve, and because
    long docs score differently from short ones the token curve is
    NOT the doc curve — that divergence is the point of sweeping
    both). Completes the sweep family: band/threshold/radius sweeps
    tune dedup, this one tunes the quality gate.

    ONE map-only scored scan (prob + token count in the same row), the
    5-row cutoff literal relation broadcast in, one per-cutoff fold;
    corpus totals re-enter as a one-row broadcast. Exact integer
    counts and token sums; shares divide doubles cast from exact
    integers in oracle operand order."""
    _, prob = _quality_logit()
    n_tok = F.size(words(F.col("text"))).cast("bigint")
    q = docs.select(prob.alias("prob"), n_tok.alias("ntok"))
    cuts = literal_df(docs.sparkSession,
        [(c,) for c in QUALITY_CUTS], "cutoff double"
    )
    kept = q.crossJoin(F.broadcast(cuts)).where(
        F.col("prob") >= F.col("cutoff")
    )
    per = kept.groupBy("cutoff").agg(
        F.count("*").alias("n_kept"),
        F.sum("ntok").alias("tokens_kept"),
    )
    tot = q.agg(
        F.count("*").alias("n_docs"), F.sum("ntok").alias("n_tokens")
    )
    return (
        cuts.join(F.broadcast(per), "cutoff", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "cutoff",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (
                F.coalesce("n_kept", F.lit(0)).cast("double")
                / F.col("n_docs")
            ).alias("doc_share"),
            F.coalesce("tokens_kept", F.lit(0)).cast("bigint").alias(
                "tokens_kept"
            ),
            (
                F.coalesce("tokens_kept", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("token_share"),
        )
    )


def pipeline_quality_sweep_sql() -> str:
    _, prob = _quality_logit_sql()
    w = WORDS_SQL.format(c="text")
    cuts = ", ".join(f"({c!r})" for c in QUALITY_CUTS)
    return (
        f"WITH q AS (SELECT {prob} AS prob, CAST(len({w}) AS BIGINT) AS ntok "
        "FROM documents), "
        f"cuts AS (SELECT * FROM (VALUES {cuts}) c(cutoff)), "
        "per AS (SELECT cutoff, COUNT(*) AS n_kept, SUM(ntok) AS tokens_kept "
        "FROM q CROSS JOIN cuts WHERE prob >= cutoff GROUP BY cutoff), "
        "tot AS (SELECT COUNT(*) AS n_docs, SUM(ntok) AS n_tokens FROM q) "
        "SELECT cutoff, CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept, "
        "CAST(COALESCE(n_kept, 0) AS DOUBLE) / n_docs AS doc_share, "
        "CAST(COALESCE(tokens_kept, 0) AS BIGINT) AS tokens_kept, "
        "CAST(COALESCE(tokens_kept, 0) AS DOUBLE) / n_tokens AS token_share "
        "FROM cuts LEFT JOIN per USING (cutoff) CROSS JOIN tot"
    )


# --- pairwise source overlap (round 9) ----------------------------------------

def corpus_source_overlap(docs: DataFrame, k: int = 8) -> DataFrame:
    """(src_a, src_b, n_a, n_b, n_common, jaccard, cont_a, cont_b):
    the source-level overlap matrix over distinct k-gram hashes — the
    corpus-QA relation that catches one source MIRRORING another
    (syndicated feeds, scraped mirrors, a crawl list that ingested the
    same site twice under two names). cont_a = |A∩B|/|A| is the
    asymmetric signal: a small source living wholly inside a big one
    shows jaccard ≈ 0 but cont_a ≈ 1 (the dedup_containment argument
    one level up, at source granularity).

    Scale: one distinct over (source, gram-md5) — the only corpus-
    sized shuffle, on uniform hashed keys; the self-join is GRAM-
    KEYED, and per-gram fanout is bounded by the SOURCE COUNT (tens),
    not by document count — a gram shared by s sources contributes
    C(s,2) rows, so the joined relation is O(grams × sources²) worst
    case and the pair groupBy map-combines to ≤ C(sources,2) keys.
    Exact integer counts; ratios divide doubles cast from exact ints
    in oracle operand order."""
    from .dedup import shingles_of

    g = (
        spread_small(docs).select("source", words(F.col("text")).alias("w"))
        .select("source", F.explode(shingles_of(F.col("w"), k)).alias("gr"))
        .select("source", F.md5("gr").alias("h"))
        .distinct()
    )
    sizes = g.groupBy("source").agg(F.count("*").alias("n"))
    a = g.select(F.col("source").alias("src_a"), "h")
    b = g.select(F.col("source").alias("src_b"), "h")
    inter = (
        a.join(b, "h")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    nc = F.col("n_common")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            nc.cast("bigint").alias("n_common"),
            (nc.cast("double") / (F.col("n_a") + F.col("n_b") - nc)).alias(
                "jaccard"
            ),
            (nc.cast("double") / F.col("n_a")).alias("cont_a"),
            (nc.cast("double") / F.col("n_b")).alias("cont_b"),
        )
    )


def corpus_source_overlap_sql(k: int = 8) -> str:
    from .dedup import shingles_sql

    return (
        f"WITH g AS (SELECT DISTINCT source, md5(UNNEST({shingles_sql('text', k)})) AS h "
        "FROM documents), "
        "sizes AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source), "
        "inter AS (SELECT a.source AS src_a, b.source AS src_b, "
        "COUNT(*) AS n_common FROM g a JOIN g b ON a.h = b.h "
        "AND a.source < b.source GROUP BY a.source, b.source) "
        "SELECT src_a, src_b, CAST(sa.n AS BIGINT) AS n_a, "
        "CAST(sb.n AS BIGINT) AS n_b, CAST(n_common AS BIGINT) AS n_common, "
        "CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard, "
        "CAST(n_common AS DOUBLE) / sa.n AS cont_a, "
        "CAST(n_common AS DOUBLE) / sb.n AS cont_b "
        "FROM inter JOIN sizes sa ON sa.source = src_a "
        "JOIN sizes sb ON sb.source = src_b"
    )


# --- readability (round 9) -----------------------------------------------------

def text_readability(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): the Flesch
    reading-ease panel with the standard machine proxies — sentences
    by terminal-punctuation runs (min 1), syllables by vowel-group
    count per word (min 1/word, the classic hyphenation-free
    estimate). Readability is a stock quality-model feature (too-easy
    = template spam, too-hard = OCR noise / code), and this exposes it
    as a first-class per-doc relation the quality logit could consume.

    Map-only: one words() array shared by both counts (the CSE rule),
    regexp_count for vowel groups (JVM-side), flesch = 206.835 −
    1.015·(W/S) − 84.6·(Y/W) rounded at 6 with the literal chain in
    oracle operand order; S and Y floor at 1 so the divisions are
    total."""
    w = words(F.col("text"))
    base = docs.select("doc_id", "text", w.alias("ws"))
    n_words = F.greatest(F.size("ws"), F.lit(1))
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    )
    syl = F.aggregate(
        F.transform(
            F.col("ws"),
            lambda x: F.greatest(
                F.regexp_count(x, F.lit("[aeiou]+")), F.lit(1)
            ),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("syl").cast("double") / F.col("n_words").cast("double")),
        6,
    )
    return base.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        syl.alias("syl"),
    ).select(
        "doc_id",
        "n_words",
        "n_sentences",
        F.col("syl").cast("bigint").alias("n_syllables"),
        flesch.alias("flesch"),
    )


def text_readability_sql() -> str:
    w = WORDS_SQL.format(c="text")
    syl = (
        f"list_sum(list_transform({w}, "
        "x -> GREATEST(len(regexp_extract_all(x, '[aeiou]+')), 1)))"
    )
    nw = f"GREATEST(len({w}), 1)"
    ns = "GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)"
    return (
        f"SELECT doc_id, CAST({nw} AS BIGINT) AS n_words, "
        f"CAST({ns} AS BIGINT) AS n_sentences, "
        f"CAST({syl} AS BIGINT) AS n_syllables, "
        f"ROUND(206.835 - 1.015 * (CAST({nw} AS DOUBLE) / CAST({ns} AS DOUBLE)) "
        f"- 84.6 * (CAST({syl} AS DOUBLE) / CAST({nw} AS DOUBLE)), 6) AS flesch "
        "FROM documents"
    )


# --- BPE encode: the serving path (round 10) ---------------------------------

BPE_N_MERGES = 3


def _bpe_adj_pairs(c):
    """Adjacent-pair strings of an already-materialized symbol array
    (the shingles_of CSE rule)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(c) - 1),
        lambda i: F.concat(
            F.element_at(c, i), F.lit(" "), F.element_at(c, i + 1)
        ),
    )


def _bpe_fold_merge(c, a, b):
    """Greedy left-to-right application of one merge (a, b) — the
    corpus_bpe_merge2 fold, shared by the trainer and the encoder."""
    empty = F.slice(F.array(F.lit("")), 1, 0)
    return F.aggregate(
        c,
        empty,
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.col(a))
            & (x == F.col(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col(a), F.col(b))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_vocab_encoded(
    vocab: DataFrame, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """(w, n, toks): the vocab with the first ``n_merges`` learned
    merges applied in training order — BPE's train-then-serve split
    done on the VOCAB relation, so the whole learn+encode chain is
    vocab-sized and each winner re-enters as a one-row broadcast (the
    corpus_bpe_merge2/merge3 pattern extended to the serving path).
    ``vocab`` is (w, n) word counts; greedy-fold ≡ leftmost-occurrence
    recursion per the merge2 proof (a within-round rewrite can't
    create a site to its left, at any round)."""
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    s = vocab.select("w", "n", syms.alias("toks"))
    for r in range(n_merges):
        p = s.select("n", F.explode(_bpe_adj_pairs(F.col("toks"))).alias("pair"))
        t = (
            p.groupBy("pair")
            .agg(F.sum("n").alias("weight"))
            .orderBy(F.col("weight").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.split(F.col("pair"), " ").getItem(0).alias(f"a{r}"),
                F.split(F.col("pair"), " ").getItem(1).alias(f"b{r}"),
            )
        )
        s = s.crossJoin(F.broadcast(t)).select(
            "w", "n",
            _bpe_fold_merge(F.col("toks"), f"a{r}", f"b{r}").alias("toks"),
        )
    return s


def corpus_bpe_encode(
    docs: DataFrame, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """(doc_id, n_words, n_tokens, tokens_per_word, chars_per_token):
    the BPE SERVING pass — merges 1..n learned by the trainer
    (corpus_bpe_merge2/3 compute exactly these winners) applied to
    every document, emitting the per-doc tokenization stats a corpus
    card reports (tokens/doc and the compression the tokenizer buys).
    Merges never cross the '</w>' word boundary, so a doc's token
    count is the sum of its WORDS' token counts — which is what makes
    the corpus-scale plan cheap:

    ONE corpus explode produces per-doc word counts (doc_id, w, c),
    persisted because it feeds both the vocab derivation (groupBy w)
    and the final join; the entire learn+apply chain then runs on the
    vocab relation (size independent of corpus scale, winners as
    one-row broadcasts); the encoded vocab joins BACK on w — co-keyed
    with the counts relation, vocab-sized build side. No per-document
    fold ever runs: a word occurring a million times is encoded once.

    Exact integers end-to-end; the two ratios divide exact bigints
    (one IEEE op, engine-identical); divisions guarded per the
    CLAUDE.md rule even though n_words >= 1 by construction."""
    from .dedup import words

    # NO scan spread (optimization round 13, the fix-9 per-consumer
    # rule): the explode feeds straight into a groupBy whose exchange
    # already spreads the work, and the r12 blanket spread_small
    # measured this key 1.1x SLOWER with the spread (idle A/B
    # 2.89 -> 3.12 s) — the added exchange only delayed the aggregate.
    dw = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .persist()  # fence: returned plan reads this cache
    )
    vocab = dw.groupBy("w").agg(F.sum("c").alias("n"))
    enc = bpe_vocab_encoded(vocab, n_merges).select(
        "w",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.length("w").cast("bigint").alias("n_chars"),
    )
    j = dw.join(enc, "w")
    per_doc = j.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.sum(F.col("c") * F.col("n_toks")).cast("bigint").alias("n_tokens"),
        F.sum(F.col("c") * F.col("n_chars")).cast("bigint").alias("n_chars"),
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_tokens",
        F.when(
            F.col("n_words") > 0,
            F.col("n_tokens").cast("double") / F.col("n_words"),
        ).alias("tokens_per_word"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_chars").cast("double") / F.col("n_tokens"),
        ).alias("chars_per_token"),
    )


def corpus_bpe_fertility(
    docs: DataFrame, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """(lang, n_docs, n_words, n_tokens, tokens_per_word,
    chars_per_token): the per-language fertility audit — the table a
    multilingual corpus card prints to show which languages the
    tokenizer taxes (high tokens/word = the merge table was learned
    on someone else's script; the signal behind per-language vocab
    budgets). Rides the same learn+encode scan as corpus_bpe_encode:
    one corpus explode, vocab-sized merge chain, co-keyed encode join;
    the lang rollup adds one ≤|langs|-key groupBy."""
    from .dedup import words

    dw = (
        spread_small(docs).select(
            "doc_id", "lang", F.explode(words(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "lang", "w")
        .agg(F.count("*").alias("c"))
        .persist()  # fence: returned plan reads this cache
    )
    vocab = dw.groupBy("w").agg(F.sum("c").alias("n"))
    enc = bpe_vocab_encoded(vocab, n_merges).select(
        "w",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.length("w").cast("bigint").alias("n_chars"),
    )
    j = dw.join(enc, "w")
    per_lang = j.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("c").cast("bigint").alias("n_words"),
        F.sum(F.col("c") * F.col("n_toks")).cast("bigint").alias("n_tokens"),
        F.sum(F.col("c") * F.col("n_chars")).cast("bigint").alias("n_chars"),
    )
    return per_lang.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        F.when(
            F.col("n_words") > 0,
            F.col("n_tokens").cast("double") / F.col("n_words"),
        ).alias("tokens_per_word"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_chars").cast("double") / F.col("n_tokens"),
        ).alias("chars_per_token"),
    )


def _bpe_encoded_vocab_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Recursive-CTE chain producing enc(w, n_toks, n_chars): merges
    1..n learned and applied leftmost-first in training order — the
    corpus_bpe_merge3 oracle generalized to n rounds and extended with
    the serving projection."""
    parts = [
        "t AS (SELECT doc_id, UNNEST({w}) AS w FROM documents)",
        "dw AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w)",
        "v AS (SELECT w, SUM(c) AS n FROM dw GROUP BY w)",
        "done0 AS (SELECT w, n, list_transform(range(1, len(w) + 1), "
        "i -> w[i]) || ['</w>'] AS syms FROM v)",
    ]
    for r in range(1, n_merges + 1):
        parts += [
            f"p{r} AS (SELECT n, UNNEST(list_transform(range(1, len(syms)), "
            f"i -> syms[i] || ' ' || syms[i + 1])) AS pair FROM done{r - 1})",
            f"top{r} AS MATERIALIZED (SELECT ' ' || pair || ' ' AS pat{r}, "
            f"' ' || replace(pair, ' ', '') || ' ' AS rep{r} "
            f"FROM (SELECT pair, SUM(n) AS weight FROM p{r} GROUP BY pair "
            f"ORDER BY weight DESC, pair ASC LIMIT 1))",
            f"m{r} AS (SELECT w, n, ' ' || array_to_string(syms, ' ') || ' ' "
            f"AS s, pat{r}, rep{r} FROM done{r - 1} CROSS JOIN top{r} "
            f"UNION ALL SELECT w, n, "
            f"substr(s, 1, strpos(s, pat{r}) - 1) || rep{r} "
            f"|| substr(s, strpos(s, pat{r}) + len(pat{r})), pat{r}, rep{r} "
            f"FROM m{r} WHERE strpos(s, pat{r}) > 0)",
            f"done{r} AS (SELECT w, n, "
            f"list_filter(string_split(trim(s), ' '), x -> x <> '') AS syms "
            f"FROM m{r} WHERE strpos(s, pat{r}) = 0)",
        ]
    parts.append(
        f"enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_toks, "
        f"CAST(len(w) AS BIGINT) AS n_chars FROM done{n_merges})"
    )
    return ",\n".join(parts)


def corpus_bpe_encode_sql(n_merges: int = BPE_N_MERGES) -> str:
    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    chain = _bpe_encoded_vocab_sql(n_merges).format(w=w)
    return f"""
WITH RECURSIVE
{chain},
per_doc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(SUM(c * n_toks) AS BIGINT) AS n_tokens,
         CAST(SUM(c * n_chars) AS BIGINT) AS nch
  FROM dw JOIN enc USING (w) GROUP BY doc_id
)
SELECT doc_id, n_words, n_tokens,
       CASE WHEN n_words > 0
            THEN CAST(n_tokens AS DOUBLE) / n_words END AS tokens_per_word,
       CASE WHEN n_tokens > 0
            THEN CAST(nch AS DOUBLE) / n_tokens END AS chars_per_token
FROM per_doc
"""


def corpus_bpe_fertility_sql(n_merges: int = BPE_N_MERGES) -> str:
    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    chain = _bpe_encoded_vocab_sql(n_merges).format(w=w)
    # dw carries no lang; re-derive the doc->lang map from documents
    # (one row per doc) and join it into the rollup
    return f"""
WITH RECURSIVE
{chain},
per_lang AS (
  SELECT d.lang, COUNT(DISTINCT dw.doc_id) AS n_docs,
         CAST(SUM(dw.c) AS BIGINT) AS n_words,
         CAST(SUM(dw.c * n_toks) AS BIGINT) AS n_tokens,
         CAST(SUM(dw.c * enc.n_chars) AS BIGINT) AS nch
  FROM dw JOIN enc USING (w)
  JOIN documents d ON d.doc_id = dw.doc_id
  GROUP BY d.lang
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, n_words, n_tokens,
       CASE WHEN n_words > 0
            THEN CAST(n_tokens AS DOUBLE) / n_words END AS tokens_per_word,
       CASE WHEN n_tokens > 0
            THEN CAST(nch AS DOUBLE) / n_tokens END AS chars_per_token
FROM per_lang
"""


# --- unicode anomaly scan (round 10) -----------------------------------------

_ZW_PAT = "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{2060}]"
_BIDI_PAT = "[\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}]"
_CTRL_PAT = "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]"
_REPL_PAT = "\\x{FFFD}"


def text_unicode_anomalies(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_zero_width, n_bidi_ctrl, n_c0_ctrl,
    n_replacement, anomaly_frac, suspicious): the invisible-codepoint
    scan a cleaning pipeline runs before tokenization — zero-width
    characters hide prompt-injection payloads and break dedup (two
    'identical' texts hash apart), bidi controls are the Trojan-Source
    vector, U+FFFD marks upstream mojibake, and stray C0 controls mark
    binary bleed-through. suspicious flags any doc with a nonzero
    count; anomaly_frac prices the damage for a threshold cut.

    Map-only column algebra: each count is
    length(text) − length(regexp_replace(text, class, '')) — the
    single-codepoint-class trick that works identically in Java regex
    and RE2 (\\x{...} escapes in both), no UDF, whole-stage codegen.
    Exact integers; one guarded division."""

    def ccount(pat):
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), pat, "")
        )

    n = F.length("text")
    zw, bd, ct, rp = (
        ccount(_ZW_PAT), ccount(_BIDI_PAT), ccount(_CTRL_PAT), ccount(_REPL_PAT)
    )
    bad = zw + bd + ct + rp
    # spread_small: four regex scans per row off a 1-task local scan
    # (no-op at scale); consumed for real by prep_weights/prep chains
    return spread_small(docs).select(
        "doc_id",
        n.cast("bigint").alias("n_chars"),
        zw.cast("bigint").alias("n_zero_width"),
        bd.cast("bigint").alias("n_bidi_ctrl"),
        ct.cast("bigint").alias("n_c0_ctrl"),
        rp.cast("bigint").alias("n_replacement"),
        F.when(n > 0, bad.cast("double") / n).alias("anomaly_frac"),
        (bad > 0).cast("bigint").alias("suspicious"),
    )


def text_unicode_anomalies_sql(rel: str = "documents") -> str:
    def ccount(pat):
        return (
            f"len(text) - len(regexp_replace(text, '{pat}', '', 'g'))"
        )

    zw = ccount("[\\x{200B}-\\x{200D}\\x{FEFF}\\x{2060}]")
    bd = ccount("[\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}]")
    ct = ccount(
        "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]"
    )
    rp = ccount("\\x{FFFD}")
    return (
        f"SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars, "
        f"CAST({zw} AS BIGINT) AS n_zero_width, "
        f"CAST({bd} AS BIGINT) AS n_bidi_ctrl, "
        f"CAST({ct} AS BIGINT) AS n_c0_ctrl, "
        f"CAST({rp} AS BIGINT) AS n_replacement, "
        f"CASE WHEN len(text) > 0 THEN "
        f"CAST(({zw}) + ({bd}) + ({ct}) + ({rp}) AS DOUBLE) / len(text) END "
        f"AS anomaly_frac, "
        f"CAST((({zw}) + ({bd}) + ({ct}) + ({rp})) > 0 AS BIGINT) "
        f"AS suspicious "
        f"FROM {rel}"
    )


def corpus_bpe_sweep(docs: DataFrame, n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(n_merges, vocab_size, n_words, n_tokens, tokens_per_word): the
    tokenizer TRAINING curve — corpus compression after 0..n merges,
    the dial that answers "how many merges buy how much" before a
    vocab budget is committed (the marginal token savings of each
    merge shrinks; the curve's knee is the budget). Stage 0 is the
    character baseline (every word = chars + '</w>').

    Rides the trainer's machinery: ONE corpus explode (the persisted
    word count), the same learn+fold chain as corpus_bpe_encode on the
    VOCAB relation, and one vocab-sized aggregate per stage —
    Σ n·|syms_r| — unioned into an (n+1)-row panel. Exact integers;
    one guarded ratio."""
    from .dedup import words

    vocab = (
        spread_small(docs).select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .persist()  # fence: returned plan reads this cache
    )
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    stages = [vocab.select("w", "n", syms.alias("toks"))]
    for r in range(n_merges):
        s = stages[-1]
        p = s.select("n", F.explode(_bpe_adj_pairs(F.col("toks"))).alias("pair"))
        t = (
            p.groupBy("pair")
            .agg(F.sum("n").alias("weight"))
            .orderBy(F.col("weight").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.split(F.col("pair"), " ").getItem(0).alias(f"a{r}"),
                F.split(F.col("pair"), " ").getItem(1).alias(f"b{r}"),
            )
        )
        stages.append(
            s.crossJoin(F.broadcast(t)).select(
                "w", "n",
                _bpe_fold_merge(F.col("toks"), f"a{r}", f"b{r}").alias("toks"),
            )
        )
    out = None
    for r, s in enumerate(stages):
        row = s.agg(
            F.lit(r).cast("bigint").alias("n_merges"),
            F.count("*").cast("bigint").alias("vocab_size"),
            F.sum("n").cast("bigint").alias("n_words"),
            F.sum(F.col("n") * F.size("toks")).cast("bigint").alias("n_tokens"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "n_merges",
        "vocab_size",
        "n_words",
        "n_tokens",
        F.when(
            F.col("n_words") > 0,
            F.col("n_tokens").cast("double") / F.col("n_words"),
        ).alias("tokens_per_word"),
    )


def corpus_bpe_sweep_sql(n_merges: int = BPE_N_MERGES) -> str:
    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    chain = _bpe_encoded_vocab_sql(n_merges).format(w=w)
    stage_rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS n_merges, "
        f"CAST(COUNT(*) AS BIGINT) AS vocab_size, "
        f"CAST(SUM(n) AS BIGINT) AS n_words, "
        f"CAST(SUM(n * len(syms)) AS BIGINT) AS n_tokens FROM done{r}"
        for r in range(n_merges + 1)
    )
    return f"""
WITH RECURSIVE
{chain},
panel AS ({stage_rows})
SELECT n_merges, vocab_size, n_words, n_tokens,
       CASE WHEN n_words > 0
            THEN CAST(n_tokens AS DOUBLE) / n_words END AS tokens_per_word
FROM panel
"""


# --- Naive-Bayes quality classifier bootstrap (round 12) -----------------------


def nb_quality(docs: DataFrame, n_buckets_chars: int = 3) -> DataFrame:
    """(doc_id, label, score, predicted, correct): a hashed-feature
    Bernoulli Naive-Bayes quality classifier trained on the corpus's
    OWN rule-based labels — the classifier-bootstrap move the GPT-3 /
    CCNet data pipelines published (train a cheap linear model on a
    trusted quality signal, then score everything with it; fastText
    in the papers, NB here — same hashed bag-of-words geometry as
    text_dsir_select, closed-form training so the whole train+score
    round stays one relational plan with no iteration). Train split =
    doc_id%2==0 with gopher_filter's keep as the label; per hashed
    unigram bucket (first-3-hex md5, 4096 buckets) the model is the
    smoothed log-odds w_b = log10((d_b1+1)/(N1+2)) −
    log10((d_b0+1)/(N0+2)) over train-doc PRESENCE counts; a test doc
    (doc_id%2==1) scores Σ w_b over its distinct present buckets
    (unseen buckets take the closed-form zero-count weight) plus the
    prior log-odds. predicted = score >= 0; ``correct`` compares
    against the doc's own held-out gopher label.

    Scale: one words explode per split (distinct doc-bucket pairs),
    the model is ≤4096 rows and BROADCASTS into the test scan; priors
    are a one-row broadcast; no iteration anywhere. Determinism:
    log10 rounded at 9 (the libm rule) per term, per-doc sums as
    micro6 BIGINT (bounded by 4096 terms), one IEEE addition for the
    prior."""
    from ..model import micro6
    from .dedup import words

    # optimization round 12, examined and left alone: g and wb each
    # feed several consumers (three broadcast builds + the test join),
    # but persist fences A/B-measured SLOWER (3.22 vs 2.27 s at sf0.1,
    # interleaved same-session) — both subtrees end in an exchange
    # (wb's distinct, g's consumers' shuffles) that ReuseExchange
    # already shares across the consumers, so the cache only added
    # materialization overhead.
    g = gopher_filter(docs).select(
        "doc_id", F.col("keep").cast("int").alias("label")
    )
    wb = (
        spread_small(docs).select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .select(
            "doc_id",
            F.substring(F.md5(F.col("w")), 1, n_buckets_chars).alias("bkt"),
        )
        .distinct()
    )
    train = g.where(F.col("doc_id") % 2 == 0)
    test = g.where(F.col("doc_id") % 2 == 1)
    tb = wb.join(train, "doc_id")
    counts = tb.groupBy("bkt").agg(
        F.sum((F.col("label") == 1).cast("int")).alias("d1"),
        F.sum((F.col("label") == 0).cast("int")).alias("d0"),
    )
    pri = train.agg(
        F.sum((F.col("label") == 1).cast("int")).alias("n1"),
        F.sum((F.col("label") == 0).cast("int")).alias("n0"),
    )

    def w_of(d1, d0):
        return F.round(
            F.log(
                10.0,
                (d1 + 1).cast("double") / (F.col("n1") + 2),
            ),
            9,
        ) - F.round(
            F.log(
                10.0,
                (d0 + 1).cast("double") / (F.col("n0") + 2),
            ),
            9,
        )

    model = counts.crossJoin(F.broadcast(pri)).select(
        "bkt", w_of(F.col("d1"), F.col("d0")).alias("w")
    )
    unseen = pri.select(
        w_of(F.lit(0), F.lit(0)).alias("wu"),
        F.round(
            F.log(
                10.0, (F.col("n1") + 1).cast("double") / (F.col("n0") + 1)
            ),
            9,
        ).alias("bias"),
    )
    scored = (
        wb.join(test, "doc_id")
        .join(F.broadcast(model), "bkt", "left")
        .crossJoin(F.broadcast(unseen))
        .groupBy("doc_id", "label", "bias")
        .agg(F.sum(micro6(F.coalesce(F.col("w"), F.col("wu")))).alias("s6"))
    )
    score = F.col("s6").cast("double") / 1000000.0 + F.col("bias")
    return scored.select(
        "doc_id",
        F.col("label").cast("bigint").alias("label"),
        score.alias("score"),
        (score >= 0).cast("bigint").alias("predicted"),
        ((score >= 0).cast("int") == F.col("label"))
        .cast("bigint")
        .alias("correct"),
    )


def nb_quality_sql(n_buckets_chars: int = 3) -> str:
    from ..model import micro6_sql

    def w_of(d1, d0):
        return (
            f"ROUND(LN(CAST({d1} + 1 AS DOUBLE) / (n1 + 2)) / LN(10.0), 9) "
            f"- ROUND(LN(CAST({d0} + 1 AS DOUBLE) / (n0 + 2)) / LN(10.0), 9)"
        )

    return f"""
WITH g AS ({gopher_filter_sql()}),
lab AS (SELECT doc_id, CAST(keep AS INT) AS label FROM g),
wb AS (SELECT DISTINCT doc_id,
       substr(md5(UNNEST({WORDS_SQL.format(c="text")})), 1, {n_buckets_chars})
       AS bkt FROM documents),
train AS (SELECT * FROM lab WHERE doc_id % 2 = 0),
test AS (SELECT * FROM lab WHERE doc_id % 2 = 1),
counts AS (SELECT bkt,
           SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS d1,
           SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS d0
           FROM wb JOIN train USING (doc_id) GROUP BY bkt),
pri AS (SELECT SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0 FROM train),
model AS (SELECT bkt, {w_of('d1', 'd0')} AS w FROM counts CROSS JOIN pri),
unseen AS (SELECT {w_of('0', '0')} AS wu,
           ROUND(LN(CAST(n1 + 1 AS DOUBLE) / (n0 + 1)) / LN(10.0), 9)
           AS bias FROM pri),
scored AS (SELECT t.doc_id, t.label, u.bias,
           SUM({micro6_sql('COALESCE(m.w, u.wu)')}) AS s6
           FROM wb JOIN test t USING (doc_id)
           LEFT JOIN model m ON wb.bkt = m.bkt
           CROSS JOIN unseen u
           GROUP BY t.doc_id, t.label, u.bias)
SELECT doc_id, CAST(label AS BIGINT) AS label,
       CAST(s6 AS DOUBLE) / 1000000.0 + bias AS score,
       CAST(CAST(s6 AS DOUBLE) / 1000000.0 + bias >= 0 AS BIGINT)
         AS predicted,
       CAST((CASE WHEN CAST(s6 AS DOUBLE) / 1000000.0 + bias >= 0
             THEN 1 ELSE 0 END) = label AS BIGINT) AS correct
FROM scored
"""
