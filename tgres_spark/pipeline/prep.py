"""Dataset-preparation operators: deterministic sampling and shard
packing (SURVEY §2.8 — the steps between cleaning and tokenization).

Both are seeded-hash-ordered so any engine, any partitioning, any
replay produces the same choice — the property the IVF sample and the
dedup band keys already rely on ([[spark-duckdb-determinism]]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_stratified(
    docs: DataFrame, n_per_lang: int = 50, seed: int = 42
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_lang`` docs with
    the lowest md5(seed:doc_id) per language — dataset-mixture
    construction that replays identically anywhere (an unordered
    limit() is partition-layout-dependent; a hash rank is not).
    Returns (lang, doc_id, rk).

    Scale: the rank window partitions by lang; languages are few and
    the per-lang sort is a shuffle on uniform hash keys. For a top-n
    ≪ docs-per-lang, Spark's WindowGroupLimit pushes the n cutoff
    into the sort (rank filter on a window = partial top-n, not a
    full per-lang sort at the executor)."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_per_lang)
        .select("lang", "doc_id", F.col("rk").cast("bigint"))
    )


def sample_stratified_sql(n_per_lang: int = 50, seed: int = 42) -> str:
    h = f"md5({seed} || ':' || doc_id)"
    return (
        "SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT lang, doc_id, ROW_NUMBER() OVER ("
        f"PARTITION BY lang ORDER BY {h} ASC, doc_id ASC) AS rk "
        f"FROM documents) WHERE rk <= {n_per_lang}"
    )


def token_pack(docs: DataFrame, budget: int = 2048, seed: int = 42) -> DataFrame:
    """Pack documents into token-budget shards: per language, walk the
    docs in seeded-hash order accumulating whitespace-token counts;
    shard = floor(exclusive-prefix-sum / budget). A doc whose tokens
    straddle a boundary goes to the shard its FIRST token lands in —
    the standard streaming-pack rule, and a pure prefix-sum (no
    sequential loop; token counts are integers so the running sum is
    order-exact in both engines). Returns (lang, doc_id, n_tokens,
    shard).

    Scale: one window per lang over integer sums — same shape as
    sessionize's per-user running sum; shard counts stay balanced
    because hash order decorrelates document length from position."""
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id")))
    w = (
        Window.partitionBy("lang")
        .orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select("lang", "doc_id", toks.cast("bigint").alias("n_tokens"))
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "lang",
        "doc_id",
        "n_tokens",
        F.floor(before / budget).cast("bigint").alias("shard"),
    )


def token_pack_sql(
    budget: int = 2048, seed: int = 42, base: str = "documents"
) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    h = f"md5({seed} || ':' || doc_id)"
    return (
        "SELECT lang, doc_id, n_tokens, "
        f"CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang "
        f"ORDER BY h ASC, doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {budget}) AS BIGINT) AS shard FROM ("
        f"SELECT lang, doc_id, CAST({toks} AS BIGINT) AS n_tokens, {h} AS h "
        f"FROM {base})"
    )


def mix_rebalance(
    docs: DataFrame, total_tokens: int = 50_000, seed: int = 42
) -> DataFrame:
    """Deterministic dataset-mixture rebalancing: select documents per
    language so every language contributes ≈ ``total_tokens/n_langs``
    whitespace tokens — the "data mixing" stage that reweights a
    scraped corpus toward a target distribution before training.

    Per language the docs are walked in seeded-hash order (the same
    replay-stable order sample_stratified/token_pack use) and taken
    while the running token prefix-sum stays under the language's
    budget, plus the one straddling doc (so every language reaches its
    budget rather than stopping short). Integer prefix sums → the
    chosen set is exact and identical in both engines. Returns
    (lang, doc_id, n_tokens, cum_tokens).

    Scale: one per-lang window over integer sums — no collect, no
    iteration; budgets are a broadcast 1-row-per-lang relation."""
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    # NULL langs drop out on BOTH engines up front (Spark's distinct
    # counts a NULL group, DuckDB's COUNT(DISTINCT) ignores it — a
    # silent cross-engine budget divergence otherwise)
    d = docs.where(F.col("lang").isNotNull()).select(
        "lang", "doc_id", toks.cast("bigint").alias("n_tokens")
    )
    n_langs = d.select("lang").distinct().groupBy().count()
    # integer division on both engines: a double-divide then cast
    # truncates in Spark but ROUNDS in DuckDB's CAST; GREATEST guards
    # the empty-corpus zero divisor (ANSI throws, DuckDB returns NULL)
    budgets = n_langs.select(
        F.expr(
            f"CAST({int(total_tokens)} DIV GREATEST(count, 1) AS BIGINT)"
        ).alias("budget")
    )
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id")))
    w = (
        Window.partitionBy("lang")
        .orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.crossJoin(F.broadcast(budgets))
        .withColumn("before", before)
        .where(F.col("before") < F.col("budget"))
        .select(
            "lang",
            "doc_id",
            "n_tokens",
            (F.col("before") + F.col("n_tokens")).alias("cum_tokens"),
        )
    )


def mix_rebalance_sql(total_tokens: int = 50_000, seed: int = 42) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    h = f"md5({seed} || ':' || doc_id)"
    return (
        "WITH d AS ("
        f"SELECT lang, doc_id, CAST({toks} AS BIGINT) AS n_tokens, {h} AS h "
        "FROM documents WHERE lang IS NOT NULL), "
        "b AS (SELECT CAST("
        f"{int(total_tokens)} // GREATEST(COUNT(DISTINCT lang), 1) AS BIGINT) AS budget "
        "FROM d), "
        "pref AS (SELECT lang, doc_id, n_tokens, "
        # CAST: DuckDB window SUM promotes to HUGEINT -> float on fetch
        "CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h ASC, "
        "doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS before FROM d) "
        "SELECT lang, doc_id, n_tokens, "
        "CAST(before + n_tokens AS BIGINT) AS cum_tokens "
        "FROM pref CROSS JOIN b WHERE before < budget"
    )


def prep_e2e(
    docs: DataFrame,
    budget: int = 2048,
    seed: int = 42,
    benchmark_source: str = "src0",
) -> DataFrame:
    """The whole training-data prep path as ONE Spark plan:
    quality gate (Gopher rules) → exact dedup (md5 keepers) →
    benchmark decontamination (8-gram overlap + drop the benchmark
    split itself) → token-budget shard packing. Returns
    (lang, doc_id, n_tokens, shard) for the surviving training docs.

    Composition IS the point: every stage is the already-verified
    operator, chained relationally so Catalyst sees one tree — the
    quality signals never leave the JVM, the dedup keeper set and
    contaminated set are semi/anti joins on doc_id (co-keyed, no
    re-shuffle of text), and the final pack windows per language.
    Contamination is judged against the FULL benchmark split (the
    bench gram set must not shrink because quality/dedup dropped a
    benchmark doc)."""
    from .contamination import contamination_check
    from .dedup import dedup_exact
    from .textstats import gopher_filter

    keep_ids = gopher_filter(docs).where(F.col("keep")).select("doc_id")
    kept = docs.join(keep_ids, "doc_id")
    keepers = dedup_exact(kept).select(F.col("keeper_id").alias("doc_id"))
    clean = kept.join(keepers, "doc_id")
    bad = (
        contamination_check(docs, benchmark_source)
        .where(F.col("contaminated") == 1)
        .select("doc_id")
    )
    train = clean.where(F.col("source") != benchmark_source).join(
        bad, "doc_id", "left_anti"
    )
    return token_pack(train, budget, seed)


def prep_e2e_sql(
    budget: int = 2048, seed: int = 42, benchmark_source: str = "src0"
) -> str:
    from .contamination import contamination_check_sql
    from .textstats import gopher_filter_sql

    return (
        f"WITH gf AS (SELECT * FROM ({gopher_filter_sql()}) g), "
        "keep AS (SELECT doc_id FROM gf WHERE keep), "
        "kept AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)), "
        "keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)), "
        "clean AS (SELECT kept.* FROM kept JOIN keepers USING (doc_id)), "
        f"cc AS (SELECT * FROM ({contamination_check_sql(benchmark_source)}) c), "
        "bad AS (SELECT doc_id FROM cc WHERE contaminated = 1), "
        "train AS (SELECT clean.* FROM clean "
        f"WHERE source <> '{benchmark_source}' "
        "AND doc_id NOT IN (SELECT doc_id FROM bad)) "
        + token_pack_sql(budget, seed, base="train")
    )


def mix_temperature(
    docs: DataFrame, total_tokens: int = 50_000, seed: int = 42
) -> DataFrame:
    """Temperature-weighted dataset mixture at α = 0.5: language l
    gets budget ∝ sqrt(tokens_l) — the standard multilingual sampling
    rule that upweights low-resource languages relative to
    proportional sampling (α=1) without flattening to uniform (α=0).

    Determinism: language token totals are exact integer sums; the
    sqrt weights are quantized to micro6 int64 units (IEEE sqrt is
    correctly rounded in BOTH engines, so the quantized weights are
    identical — this is why the op pins α=0.5 rather than a generic
    pow, whose libm results differ in the last ulp); budgets are pure
    integer arithmetic (total·w DIV Σw); selection is the replay-
    stable seeded-hash prefix walk of mix_rebalance. Returns
    (lang, doc_id, n_tokens, cum_tokens, budget).

    Scale: two tiny aggregates (1 row per language) broadcast back;
    one per-lang window over integer sums; no collect."""
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    d = docs.where(F.col("lang").isNotNull()).select(
        "lang", "doc_id", toks.cast("bigint").alias("n_tokens")
    )
    lt = d.groupBy("lang").agg(F.sum("n_tokens").alias("lt"))
    w = lt.select(
        "lang",
        F.floor(F.sqrt(F.col("lt").cast("double")) * 1000000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("w"),
    )
    sw = w.agg(F.sum("w").alias("sw"))
    budgets = w.crossJoin(F.broadcast(sw)).select(
        "lang",
        F.expr(f"CAST({int(total_tokens)} * w DIV sw AS BIGINT)").alias(
            "budget"
        ),
    )
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id")))
    win = (
        Window.partitionBy("lang")
        .orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return (
        d.join(F.broadcast(budgets), "lang")
        .withColumn("before", before)
        .where(F.col("before") < F.col("budget"))
        .select(
            "lang",
            "doc_id",
            "n_tokens",
            (F.col("before") + F.col("n_tokens")).alias("cum_tokens"),
            "budget",
        )
    )


def mix_temperature_sql(
    total_tokens: int = 50_000, seed: int = 42, rel: str = "documents"
) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    h = f"md5({seed} || ':' || doc_id)"
    return (
        "WITH d AS ("
        f"SELECT lang, doc_id, CAST({toks} AS BIGINT) AS n_tokens, {h} AS h "
        f"FROM {rel} WHERE lang IS NOT NULL), "
        "lt AS (SELECT lang, SUM(n_tokens) AS lt FROM d GROUP BY lang), "
        "w AS (SELECT lang, CAST(FLOOR(SQRT(CAST(lt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w FROM lt), "
        "sw AS (SELECT SUM(w) AS sw FROM w), "
        "budgets AS (SELECT lang, "
        f"CAST({int(total_tokens)} * w // sw AS BIGINT) AS budget "
        "FROM w CROSS JOIN sw), "
        "pref AS (SELECT lang, doc_id, n_tokens, "
        "CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h ASC, "
        "doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS before FROM d) "
        "SELECT pref.lang, doc_id, n_tokens, "
        "CAST(before + n_tokens AS BIGINT) AS cum_tokens, budget "
        "FROM pref JOIN budgets ON pref.lang = budgets.lang "
        "WHERE before < budget"
    )


def mix_unimax(
    docs: DataFrame, total_tokens: int = 120_000, epochs: int = 2
) -> DataFrame:
    """UniMax language allocation (Chung et al. 2023): give every
    language as close to a uniform share of the token budget as its
    corpus allows, capped at ``epochs`` passes over the language —
    the closed-form alternative to temperature sampling that never
    over-repeats a low-resource language. Complements mix_temperature
    (α=0.5 sqrt weights) with the budget-capped end of the mixture
    design space. Returns the per-language allocation PLAN
    (lang, cap_tokens, epoch_cap, alloc_tokens, capped, rk).

    UniMax is usually stated as a greedy loop over languages; sorted
    by epoch capacity u = epochs·tokens ascending it has a water-
    filling closed form, so the whole thing is ONE Catalyst tree with
    no driver iteration: lang i (ascending u, rank rk_i, exclusive
    prefix sum cum_i) is fully allocated iff
    cum_i + u_i·(n − rk_i + 1) <= B, a condition MONOTONE in i (the
    difference between consecutive LHS values is (n−i)(u_{i+1}−u_i)
    >= 0), so the capped set is a prefix; everyone else gets the
    water level θ = (B − Σ_capped u) / (n − n_capped).

    Determinism: capacities/prefix sums/cap tests are exact integer
    arithmetic; θ is ONE division of two exact bigints (IEEE-identical
    across engines). Scale: the heavy work is one groupBy(lang) over
    the corpus; the window/aggregate run on the per-LANGUAGE relation
    (hundreds of rows at any corpus size — declared single-partition
    in plan_audit, like dedup_components' bounded driver gate)."""
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    d = docs.where(F.col("lang").isNotNull()).select(
        "lang", toks.cast("bigint").alias("n_tokens")
    )
    caps = d.groupBy("lang").agg(F.sum("n_tokens").alias("cap_tokens"))
    base = caps.select(
        "lang",
        "cap_tokens",
        (F.col("cap_tokens") * int(epochs)).alias("u"),
    )
    nn = base.groupBy().count().select(F.col("count").alias("n"))
    wo = Window.orderBy(F.col("u").asc(), F.col("lang").asc())
    r = base.select(
        "lang",
        "cap_tokens",
        "u",
        F.row_number().over(wo).alias("rk"),
        F.coalesce(
            F.sum("u").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_excl"),
    )
    B = int(total_tokens)
    c = r.crossJoin(F.broadcast(nn)).withColumn(
        "capped",
        (
            (F.col("cum_excl") + F.col("u") * (F.col("n") - F.col("rk") + 1))
            <= B
        ).cast("int"),
    )
    t = c.agg(
        F.sum("capped").alias("n_capped"),
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("u"))), F.lit(0)
        ).alias("cum_capped"),
    )
    theta = F.when(
        F.col("n_capped") < F.col("n"),
        (F.lit(B) - F.col("cum_capped")).cast("double")
        / (F.col("n") - F.col("n_capped")),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "cap_tokens",
        F.col("u").alias("epoch_cap"),
        F.when(F.col("capped") == 1, F.col("u").cast("double"))
        .otherwise(theta)
        .alias("alloc_tokens"),
        F.col("capped").cast("bigint").alias("capped"),
        F.col("rk").cast("bigint").alias("rk"),
    )


def mix_unimax_sql(total_tokens: int = 120_000, epochs: int = 2) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    B = int(total_tokens)
    return (
        "WITH d AS ("
        f"SELECT lang, CAST({toks} AS BIGINT) AS n_tokens "
        "FROM documents WHERE lang IS NOT NULL), "
        "caps AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS cap_tokens "
        "FROM d GROUP BY lang), "
        f"base AS (SELECT lang, cap_tokens, CAST(cap_tokens * {int(epochs)} AS BIGINT) AS u "
        "FROM caps), "
        "nn AS (SELECT COUNT(*) AS n FROM base), "
        "r AS (SELECT lang, cap_tokens, u, "
        "ROW_NUMBER() OVER (ORDER BY u ASC, lang ASC) AS rk, "
        "CAST(COALESCE(SUM(u) OVER (ORDER BY u ASC, lang ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
        "AS cum_excl FROM base), "
        "c AS (SELECT r.*, n, "
        f"CASE WHEN cum_excl + u * (n - rk + 1) <= {B} THEN 1 ELSE 0 END "
        "AS capped FROM r CROSS JOIN nn), "
        "t AS (SELECT CAST(SUM(capped) AS BIGINT) AS n_capped, "
        "CAST(COALESCE(SUM(CASE WHEN capped = 1 THEN u END), 0) AS BIGINT) "
        "AS cum_capped FROM c) "
        "SELECT lang, cap_tokens, u AS epoch_cap, "
        "CASE WHEN capped = 1 THEN CAST(u AS DOUBLE) "
        f"WHEN n_capped < n THEN CAST({B} - cum_capped AS DOUBLE) / (n - n_capped) "
        "END AS alloc_tokens, "
        "CAST(capped AS BIGINT) AS capped, CAST(rk AS BIGINT) AS rk "
        "FROM c CROSS JOIN t"
    )


def shard_manifest(
    docs: DataFrame, budget: int = 2048, seed: int = 42
) -> DataFrame:
    """(lang, shard, n_docs, n_tokens, checksum): the per-shard
    receipt a trainer records next to each packed shard — doc count,
    exact token count, and an ORDER-FREE membership checksum (sum of
    md5(doc_id)-derived 32-bit terms, the corpus_fingerprint rule), so
    shard receipts fold to the dataset receipt and a re-pack that
    moved any document is detected without reading text. Built on the
    already-verified token_pack walk; one extra groupBy(lang, shard)."""
    packed = token_pack(docs, budget, seed)
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return packed.groupBy("lang", "shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(v).cast("bigint").alias("checksum"),
    )


def shard_manifest_sql(budget: int = 2048, seed: int = 42) -> str:
    hx = "md5(CAST(doc_id AS VARCHAR))"
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
        f"WITH packed AS ({token_pack_sql(budget, seed)}) "
        "SELECT lang, shard, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, "
        f"CAST(SUM({v}) AS BIGINT) AS checksum "
        "FROM packed GROUP BY lang, shard"
    )


def prep_full(docs: DataFrame, k: int = 16) -> DataFrame:
    """The round-8 prep path — prep_e2e's successor with the modern
    cleaning stages, still ONE Spark plan: CCNet boilerplate removal
    (cross-doc chunk strip, docs reassembled) → Gopher quality gate ON
    THE CLEANED TEXT (cleaning changes the signals — a doc can pass
    only after its boilerplate is gone, or stop passing once the
    boilerplate that padded its word count is removed) → near-dup
    clustering with quality-ranked canonicalization (dedup_keep_best:
    keep the BEST member, not the min id). Returns the surviving
    training set as (doc_id, lang, source, n_tokens, root_id).

    Every stage is the already-hash-checked operator; the composition
    chains them relationally so Catalyst sees one tree — stage
    boundaries are semi-joins on doc_id (co-keyed, the cleaned text
    shuffles once into the quality/dedup stages, never again).
    """
    from .contamination import boilerplate_clean_docs
    from .dedup import dedup_keep_best
    from .textstats import gopher_filter, words

    # The cleaned corpus feeds MANY consumers (the Gopher gate, the
    # minhash signatures, the quality score, the semi-joins, the final
    # projection) — without the persist each one re-runs the whole
    # chunk-explode/spread/reassembly pipeline from the raw corpus
    # (measured 155s → 8s at sf0.1 for this one persist pair). Like
    # dedup_minhash_lsh's signature persist: the cleaned relation is
    # one text row per doc — megabytes per 100 TB of chunk explode.
    # Both persists must outlive the caller's action (the returned
    # plan reads them), so they are not unpersisted here; the sweep
    # harnesses (bench.py, tools/check_oracle.py) clearCache()
    # between queries to keep long sessions bounded.
    cleaned = boilerplate_clean_docs(docs, k).persist()  # fence: returned plan reads this cache
    gf = gopher_filter(cleaned).where(F.col("keep")).select("doc_id")
    kept = cleaned.join(gf, "doc_id").persist()  # fence: returned plan reads this cache
    kb = (
        dedup_keep_best(kept)
        .where(F.col("keep"))
        .select("doc_id", "root_id")
    )
    return kept.join(kb, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        F.size(words(F.col("text"))).cast("bigint").alias("n_tokens"),
        "root_id",
    )


def prep_full_sql(k: int = 16) -> str:
    from .contamination import boilerplate_clean_docs_sql
    from .dedup import dedup_keep_best_sql
    from .textstats import WORDS_SQL, gopher_filter_sql

    # stage oracles take their source relation as a parameter (rel=),
    # so the composition points each stage at the upstream CTE
    # directly — no textual rewriting of generated SQL, which would
    # also clobber string literals that merely contain the word
    # 'documents' (a DuckDB CTE literally named `documents` is not an
    # option either: the binder rejects it as circular).
    w = WORDS_SQL.format(c="text")
    return (
        f"WITH cleaned AS ({boilerplate_clean_docs_sql(k)}), "
        "gf AS (SELECT doc_id FROM ("
        f"{gopher_filter_sql(rel='cleaned')}) gx WHERE keep), "
        "kept AS (SELECT c.* FROM cleaned c JOIN gf USING (doc_id)), "
        "kb AS (SELECT doc_id, root_id FROM ("
        f"{dedup_keep_best_sql(rel='kept')}) kx WHERE keep) "
        "SELECT kept.doc_id, kept.lang, kept.source, "
        f"CAST(len({w}) AS BIGINT) AS n_tokens, kb.root_id "
        "FROM kept JOIN kb USING (doc_id)"
    )


def mix_after_dedup(
    docs: DataFrame, total_tokens: int = 10_000, seed: int = 42
) -> DataFrame:
    """Dedup-aware mixture: temperature mixing whose language budgets
    come from KEEPER tokens only (dedup_keep_best survivors), not raw
    corpus counts — the ordering a production mix must use: duplicated
    languages otherwise buy budget with tokens the dedup pass then
    deletes, and the realized mixture under-delivers exactly the
    languages that were over-duplicated. Same deterministic machinery
    as mix_temperature (micro6 sqrt weights, integer DIV budgets,
    seeded-hash prefix walk) over the canonicalized corpus."""
    from .dedup import dedup_keep_best

    keepers = (
        dedup_keep_best(docs).where(F.col("keep")).select("doc_id")
    )
    return mix_temperature(docs.join(keepers, "doc_id"), total_tokens, seed)


def mix_after_dedup_sql(total_tokens: int = 10_000, seed: int = 42) -> str:
    from .dedup import dedup_keep_best_sql

    # the mixer reads the keeper join via its rel= parameter (the
    # prep_full composition pattern — no textual SQL rewriting)
    inner = mix_temperature_sql(total_tokens, seed, rel="survivors")
    # mix_temperature_sql starts with "WITH d AS ..." — prepend our
    # CTEs into the same WITH list
    assert inner.startswith("WITH ")
    return (
        "WITH kb AS (SELECT doc_id FROM ("
        f"{dedup_keep_best_sql()}) kx WHERE keep), "
        "survivors AS (SELECT d.* FROM documents d JOIN kb USING (doc_id)), "
        + inner[len("WITH "):]
    )


def prep_funnel(docs: DataFrame, k: int = 16) -> DataFrame:
    """(stage, n_docs, n_tokens): per-stage survival through the
    modern prep path — raw → boilerplate-cleaned → Gopher-kept →
    dedup keepers — the funnel every production prep run logs next to
    its dataset card (a stage that suddenly eats 40% of the corpus is
    the first thing an operator looks for after a crawl change).
    Same stage machinery and composition discipline as prep_full
    (cleaned corpus persisted once, stage boundaries doc_id
    semi-joins); output is four exact-integer rows, one aggregation
    per stage over relations the prep job materializes anyway."""
    from .contamination import boilerplate_clean_docs
    from .dedup import dedup_keep_best
    from .textstats import gopher_filter, words

    toks = F.size(words(F.col("text"))).cast("bigint")

    def stage(rel: DataFrame, name: str) -> DataFrame:
        return rel.agg(
            F.lit(name).alias("stage"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(toks).cast("bigint").alias("n_tokens"),
        )

    cleaned = boilerplate_clean_docs(docs, k).persist()  # fence: returned plan reads this cache
    gf = gopher_filter(cleaned).where(F.col("keep")).select("doc_id")
    kept = cleaned.join(gf, "doc_id").persist()  # fence: returned plan reads this cache
    kb = dedup_keep_best(kept).where(F.col("keep")).select("doc_id")
    final = kept.join(kb, "doc_id")
    return (
        stage(docs, "0_raw")
        .unionByName(stage(cleaned, "1_cleaned"))
        .unionByName(stage(kept, "2_gopher"))
        .unionByName(stage(final, "3_dedup"))
    )


def prep_funnel_sql(k: int = 16) -> str:
    from .contamination import boilerplate_clean_docs_sql
    from .dedup import dedup_keep_best_sql
    from .textstats import WORDS_SQL, gopher_filter_sql

    toks = f"CAST(len({WORDS_SQL.format(c='text')}) AS BIGINT)"

    def stage(rel: str, name: str) -> str:
        return (
            f"SELECT '{name}' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            f"CAST(SUM({toks}) AS BIGINT) AS n_tokens FROM {rel}"
        )

    return (
        f"WITH cleaned AS ({boilerplate_clean_docs_sql(k)}), "
        "gf AS (SELECT doc_id FROM ("
        f"{gopher_filter_sql(rel='cleaned')}) gx WHERE keep), "
        "kept AS (SELECT c.* FROM cleaned c JOIN gf USING (doc_id)), "
        "kb AS (SELECT doc_id FROM ("
        f"{dedup_keep_best_sql(rel='kept')}) kx WHERE keep), "
        "fin AS (SELECT kept.* FROM kept JOIN kb USING (doc_id)) "
        + stage("documents", "0_raw")
        + " UNION ALL " + stage("cleaned", "1_cleaned")
        + " UNION ALL " + stage("kept", "2_gopher")
        + " UNION ALL " + stage("fin", "3_dedup")
    )


# --- incremental prep: the daily-crawl path (round 9) -------------------------

INC_DUP_THRESHOLD = 0.5


def prep_increment(
    spark,
    sig_index_path: str,
    bench_index_path: str,
    increment: DataFrame,
    threshold: float = INC_DUP_THRESHOLD,
) -> DataFrame:
    """(doc_id, gopher_keep, contaminated, dup_corpus, dup_increment,
    keep): the INCREMENTAL prep verdict — a new crawl increment
    through the Gopher gate, decontamination against the PERSISTED
    benchmark gram index, and near-dup screening against the PERSISTED
    corpus signature index plus itself, in one relation. This is the
    daily-crawl production path the incremental family exists for:
    pipeline_prep_full recomputes the corpus; this touches ONLY
    increment text and two hash indexes (benchmark grams broadcast;
    corpus signatures consulted map-only — dedup_incremental's plan).

    Flag semantics, all per-doc and therefore oracle-checkable against
    the full-corpus runs filtered to the increment: gopher_keep from
    the per-doc gate; contaminated from the benchmark gram fraction;
    dup_corpus when ANY index doc pairs at est_sim >= threshold (a
    cross pair names exactly one increment doc — identified by the
    increment id rule); dup_increment when a SMALLER-id increment doc
    pairs at est_sim >= threshold (min-id keeper, the dedup_exact
    convention — deterministic and order-free). keep = gopher AND NOT
    contaminated AND NOT either dup."""
    from .contamination import contamination_incremental
    from .dedup import INCREMENT_MOD, dedup_incremental
    from .textstats import gopher_filter

    g = gopher_filter(increment).select(
        "doc_id", F.col("keep").alias("gkeep")
    )
    c = contamination_incremental(
        spark, bench_index_path, increment
    ).select("doc_id", "contaminated")
    strong = dedup_incremental(spark, sig_index_path, increment).where(
        F.col("est_sim") >= float(threshold)
    )
    inc_side = F.when(
        F.col("doc_a") % INCREMENT_MOD == 0, F.col("doc_a")
    ).otherwise(F.col("doc_b"))
    dupc = (
        strong.where(F.col("cross_corpus"))
        .select(inc_side.alias("doc_id"))
        .distinct()
        .withColumn("dc", F.lit(1))
    )
    dupi = (
        strong.where(~F.col("cross_corpus"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("di", F.lit(1))
    )
    base = increment.select("doc_id")
    gopher_keep = F.coalesce(F.col("gkeep").cast("bigint"), F.lit(0))
    contaminated = F.coalesce(F.col("contaminated"), F.lit(0))
    dup_corpus = F.coalesce(F.col("dc"), F.lit(0)).cast("bigint")
    dup_increment = F.coalesce(F.col("di"), F.lit(0)).cast("bigint")
    return (
        base.join(g, "doc_id", "left")
        .join(F.broadcast(c), "doc_id", "left")
        .join(F.broadcast(dupc), "doc_id", "left")
        .join(F.broadcast(dupi), "doc_id", "left")
        .select(
            "doc_id",
            gopher_keep.alias("gopher_keep"),
            contaminated.alias("contaminated"),
            dup_corpus.alias("dup_corpus"),
            dup_increment.alias("dup_increment"),
            (
                (gopher_keep == 1)
                & (contaminated == 0)
                & (dup_corpus == 0)
                & (dup_increment == 0)
            )
            .cast("bigint")
            .alias("keep"),
        )
    )


def prep_increment_sql(threshold: float = INC_DUP_THRESHOLD) -> str:
    from .contamination import contamination_incremental_sql
    from .dedup import INCREMENT_MOD, dedup_minhash_lsh_sql
    from .textstats import gopher_filter_sql

    mod = INCREMENT_MOD
    inc_pred = f"doc_id % {mod} = 0 AND source <> 'src0'"
    return (
        f"WITH inc AS (SELECT * FROM documents WHERE {inc_pred}), "
        f"g AS (SELECT * FROM ({gopher_filter_sql(rel='inc')})), "
        f"c AS (SELECT * FROM ({contamination_incremental_sql(mod)})), "
        f"pairs AS (SELECT * FROM ({dedup_minhash_lsh_sql()}) "
        f"WHERE est_sim >= {float(threshold)!r}), "
        "incids AS (SELECT doc_id FROM inc), "
        f"idxids AS (SELECT doc_id FROM documents WHERE doc_id % {mod} <> 0), "
        "dupc AS (SELECT DISTINCT CASE WHEN doc_a IN (SELECT doc_id FROM incids) "
        "THEN doc_a ELSE doc_b END AS doc_id FROM pairs "
        "WHERE (doc_a IN (SELECT doc_id FROM incids) "
        "AND doc_b IN (SELECT doc_id FROM idxids)) "
        "OR (doc_b IN (SELECT doc_id FROM incids) "
        "AND doc_a IN (SELECT doc_id FROM idxids))), "
        "dupi AS (SELECT DISTINCT doc_b AS doc_id FROM pairs "
        "WHERE doc_a IN (SELECT doc_id FROM incids) "
        "AND doc_b IN (SELECT doc_id FROM incids)) "
        "SELECT inc.doc_id AS doc_id, "
        "CAST(COALESCE(CAST(g.keep AS BIGINT), 0) AS BIGINT) AS gopher_keep, "
        "CAST(COALESCE(c.contaminated, 0) AS BIGINT) AS contaminated, "
        "CAST(inc.doc_id IN (SELECT doc_id FROM dupc) AS BIGINT) AS dup_corpus, "
        "CAST(inc.doc_id IN (SELECT doc_id FROM dupi) AS BIGINT) AS dup_increment, "
        "CAST(COALESCE(CAST(g.keep AS BIGINT), 0) = 1 "
        "AND COALESCE(c.contaminated, 0) = 0 "
        "AND inc.doc_id NOT IN (SELECT doc_id FROM dupc) "
        "AND inc.doc_id NOT IN (SELECT doc_id FROM dupi) AS BIGINT) AS keep "
        "FROM inc LEFT JOIN g ON g.doc_id = inc.doc_id "
        "LEFT JOIN c ON c.doc_id = inc.doc_id"
    )


# --- DoReMi-shaped domain reweighting (round 9) --------------------------------

MIX_ETA = 1.0


def mix_excess_loss(docs: DataFrame, eta: float = MIX_ETA) -> DataFrame:
    """(source, n_docs, tokens, base_share, mean_logp, excess, weight):
    DoReMi-shaped domain reweighting — each source's mixture weight is
    its token share UPWEIGHTED by exp(eta x excess loss), where excess
    loss is how much worse the source scores under the reference
    bigram LM than the corpus average (max(0, .)). DoReMi proper
    iterates this with a trained proxy model; this is the one-step
    closed form over the repo's own reference-split LM — the standard
    'hard domains get more weight' reweighting, with the published
    algorithm's structure (baseline x exponentiated excess,
    renormalized).

    Determinism end-to-end: per-doc avg_logp is already round-9; the
    per-source mean accumulates micro6 BIGINTs; the corpus reference
    re-enters as a one-row broadcast; excess rounds at 9 before the
    libm exp, which rounds at 9 again; the raw weight (an exact-int
    token share times that) quantizes to micro6 BIGINT so the
    normalizing SUM is order-free integer addition and every share
    divides exact integers. One corpus scan for the LM scores, one
    for token counts, then all algebra on the source-domain relation."""
    from ..model import micro6
    from .dedup import words
    from .textstats import text_bigram_lm

    lm = text_bigram_lm(docs).select("doc_id", "avg_logp")
    src = docs.select(
        "doc_id", "source", F.size(words(F.col("text"))).cast("bigint").alias("ntok")
    )
    per_doc = src.join(lm, "doc_id")
    per_src = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ntok").alias("tokens"),
        (F.sum(micro6(F.col("avg_logp"))).cast("double") / 1000000.0
         / F.count("*")).alias("mean_logp"),
    )
    ref = per_doc.agg(
        (F.sum(micro6(F.col("avg_logp"))).cast("double") / 1000000.0
         / F.count("*")).alias("ref_logp"),
        F.sum("ntok").alias("tot_tokens"),
    )
    excess = F.round(
        F.greatest(F.lit(0.0), F.col("ref_logp") - F.col("mean_logp")), 9
    )
    base_share = F.col("tokens").cast("double") / F.col("tot_tokens")
    raw6 = micro6(base_share * F.round(F.exp(F.lit(float(eta)) * excess), 9))
    scored = per_src.crossJoin(F.broadcast(ref)).select(
        "source",
        "n_docs",
        F.col("tokens").cast("bigint").alias("tokens"),
        base_share.alias("base_share"),
        "mean_logp",
        excess.alias("excess"),
        raw6.alias("raw6"),
    )
    norm = scored.agg(F.sum("raw6").alias("tot6"))
    return scored.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "tokens",
        "base_share",
        "mean_logp",
        "excess",
        (F.col("raw6").cast("double") / F.col("tot6")).alias("weight"),
    )


def mix_excess_loss_sql(eta: float = MIX_ETA) -> str:
    from ..model import micro6_sql
    from .textstats import text_bigram_lm_sql

    from .dedup import WORDS_SQL

    w = WORDS_SQL.format(c="text")
    excess = "ROUND(GREATEST(0.0, ref_logp - mean_logp), 9)"
    base = "CAST(tokens AS DOUBLE) / tot_tokens"
    raw6 = micro6_sql(
        f"({base}) * ROUND(EXP({float(eta)!r} * {excess}), 9)"
    )
    return (
        f"WITH lm AS ({text_bigram_lm_sql()}), "
        f"src AS (SELECT doc_id, source, CAST(len({w}) AS BIGINT) AS ntok "
        "FROM documents), "
        "pd AS (SELECT src.source, src.ntok, lm.avg_logp "
        "FROM src JOIN lm ON lm.doc_id = src.doc_id), "
        "ps AS (SELECT source, COUNT(*) AS n_docs, SUM(ntok) AS tokens, "
        "CAST(SUM(" + micro6_sql("avg_logp") + ") AS DOUBLE) / 1000000.0 "
        "/ COUNT(*) AS mean_logp FROM pd GROUP BY source), "
        "ref AS (SELECT CAST(SUM(" + micro6_sql("avg_logp") + ") AS DOUBLE) "
        "/ 1000000.0 / COUNT(*) AS ref_logp, SUM(ntok) AS tot_tokens FROM pd), "
        "scored AS (SELECT source, n_docs, CAST(tokens AS BIGINT) AS tokens, "
        f"{base} AS base_share, mean_logp, {excess} AS excess, "
        f"{raw6} AS raw6 FROM ps CROSS JOIN ref), "
        "norm AS (SELECT SUM(raw6) AS tot6 FROM scored) "
        "SELECT source, n_docs, tokens, base_share, mean_logp, excess, "
        "CAST(raw6 AS DOUBLE) / tot6 AS weight FROM scored CROSS JOIN norm"
    )


# --- weight-proportional sampling execute step (round 11) ----------------------

SAMPLE_W_SEED = 17


def sample_by_weight(
    weights: DataFrame, seed: int = SAMPLE_W_SEED
) -> DataFrame:
    """(doc_id, weight, expected_copies, n_copies): the CONSUMER of
    the prep_weights relation — pipeline_prep_weights produces "the
    per-document sampling-weight table a mixture/curriculum run
    consumes", and this is that consumption: each doc's training-set
    multiplicity, drawn proportional to weight with DETERMINISTIC
    stochastic rounding (the epoch-multiplicity construction real
    pipelines use instead of with-replacement draws, which don't
    distribute):

        expected = weight / mean(weight)          (mean copies = 1)
        n_copies = floor(expected + u(doc))       u = hash-unit float

    Stochastic rounding by the doc's own seeded hash makes
    E[n_copies] = expected exactly while staying replay-stable on any
    engine/partitioning (the sample_stratified hash-order property,
    applied to rounding instead of ranking); zero-weight docs get
    u < 1 + 0 -> 0 copies structurally.

    Determinism: the mean is a micro6 BIGINT sum / 1e6 / N (bounded-
    group rule); expected is ONE IEEE division (guarded); u =
    first-8-hex-of-md5 / 2^32 — exact dyadic rational, identical in
    both engines (Spark conv(,16,10); DuckDB CAST('0x'||hex)). One
    corpus-scan input, one one-row broadcast, map-only otherwise."""
    from ..model import micro6

    tot = weights.agg(
        F.sum(micro6(F.col("weight"))).alias("w6"),
        F.count(F.lit(1)).alias("n"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    mean_w = F.col("w6").cast("double") / 1000000.0 / F.col("n")
    expected = F.when(mean_w > 0, F.col("weight") / mean_w)
    return weights.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "weight",
        expected.alias("expected_copies"),
        F.floor(F.coalesce(expected, F.lit(0.0)) + u)
        .cast("bigint")
        .alias("n_copies"),
    )


def sample_by_weight_sql(seed: int = SAMPLE_W_SEED) -> str:
    """Oracle over the composed prep-weights CTE; u's hex parse is
    CAST('0x' || substr(md5, 1, 8) AS BIGINT) — same 32-bit integer
    as Spark's conv(, 16, 10), same dyadic division."""
    from ..model import micro6_sql
    from .graph import pipeline_prep_weights_sql

    u = (
        f"CAST('0x' || substr(md5({seed} || ':' || doc_id), 1, 8) AS BIGINT)"
        " / 4294967296.0"
    )
    return f"""
WITH w AS ({pipeline_prep_weights_sql()}),
tot AS (SELECT SUM({micro6_sql('weight')}) AS w6, COUNT(*) AS n FROM w)
SELECT doc_id, weight,
       CASE WHEN CAST(w6 AS DOUBLE) / 1000000.0 / n > 0
            THEN weight / (CAST(w6 AS DOUBLE) / 1000000.0 / n)
       END AS expected_copies,
       CAST(FLOOR(COALESCE(CASE WHEN CAST(w6 AS DOUBLE) / 1000000.0 / n > 0
                    THEN weight / (CAST(w6 AS DOUBLE) / 1000000.0 / n)
               END, 0.0) + {u}) AS BIGINT) AS n_copies
FROM w CROSS JOIN tot
"""


def pack_weighted(
    docs: DataFrame, budget: int = 2048, seed: int = SAMPLE_W_SEED
) -> DataFrame:
    """(lang, doc_id, copy_id, n_tokens, shard): the END of the prep
    pipeline — the training-shard table a dataloader actually reads.
    Composes the whole round-10/11 weighting story into its final
    artifact: pipeline_prep_weights scores every doc (centrality ×
    dup-discount, quality+unicode gated), sample_by_weight turns the
    scores into integer multiplicities (epoch-multiplicity, mean one
    copy), and this explodes each doc into its copies and packs them
    into token-budget shards per language with token_pack's exact
    prefix-sum rule (seeded-hash order over (doc_id, copy_id) so
    copies of the same doc scatter across shards instead of
    clumping — the property epoch-replication needs for i.i.d.-ish
    batches). Zero-weight docs never appear (n_copies = 0
    structurally).

    Scale: the explode multiplies rows by mean ≈ 1 (Σ copies ≈ N by
    construction), so the pack window runs over a corpus-sized
    relation per lang — token_pack's audited shape; everything
    upstream is the already-audited prep_weights/sampler plan. Exact
    integers end-to-end (token counts, prefix sums, floor-div
    shards)."""
    from .graph import pipeline_prep_weights
    from pyspark.sql import Window

    # double broadcast-fence (CLAUDE.md rule, the r9 emb_pca2_deflate
    # race): the weights relation feeds the sampler's one-row totals
    # build AND the sampler output feeds this function's join's
    # broadcast build — unfenced, the concurrent builds re-ran the
    # whole prep_weights subtree serially (~6x: measured 92 s warm at
    # sf0.1; 5.7 s with the fences).
    # Optimization round 13 (r12 VERDICT Next 2): both fences are
    # localCheckpoints — persist kept prep_weights' full composed
    # lineage under every cache-scan node and the downstream plan
    # exploded to ~89k formatted lines (planning cost, guide §3.3);
    # the checkpoint materializes the same rows once and truncates
    # the lineage to a leaf scan. Values byte-identical.
    pw = pipeline_prep_weights(docs).localCheckpoint()
    w = sample_by_weight(pw, seed=seed).localCheckpoint()
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    rep = (
        w.where(F.col("n_copies") > 0)
        .join(toks, "doc_id")
        .select(
            "lang",
            "doc_id",
            "n_tokens",
            F.explode(
                F.sequence(F.lit(1), F.col("n_copies").cast("int"))
            ).alias("copy_id"),
        )
    )
    h = F.md5(
        F.concat_ws(":", F.lit(seed), F.col("doc_id"), F.col("copy_id"))
    )
    win = (
        Window.partitionBy("lang")
        .orderBy(h.asc(), F.col("doc_id").asc(), F.col("copy_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return rep.select(
        "lang",
        "doc_id",
        F.col("copy_id").cast("bigint").alias("copy_id"),
        "n_tokens",
        F.floor(before / budget).cast("bigint").alias("shard"),
    )


def pack_weighted_sql(budget: int = 2048, seed: int = SAMPLE_W_SEED) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    h = f"md5({seed} || ':' || doc_id || ':' || copy_id)"
    return f"""
WITH sw AS ({sample_by_weight_sql(seed)}),
toks AS (SELECT doc_id, lang, CAST({toks} AS BIGINT) AS n_tokens
         FROM documents),
rep AS (
  SELECT lang, doc_id, n_tokens,
         UNNEST(range(1, n_copies + 1)) AS copy_id
  FROM sw JOIN toks USING (doc_id) WHERE n_copies > 0
)
SELECT lang, doc_id, CAST(copy_id AS BIGINT) AS copy_id, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
            ORDER BY {h} ASC, doc_id ASC, copy_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {budget}) AS BIGINT) AS shard
FROM rep
"""


def pack_increment_sql(
    n_gens: int = 4, budget: int = 2048, seed: int = SAMPLE_W_SEED
) -> str:
    """DuckDB twin of the frozen-generation streaming pack
    (streaming/refresh.py run_generation_pack): documents partition
    into n_gens doc_id-quartile generations (the same floor rule the
    stream's batch files use: generation i holds 1-based ranks in
    ((n*i)//n_gens, (n*(i+1))//n_gens]), each generation packs
    INDEPENDENTLY via the full pack_weighted chain computed on that
    generation's docs alone (the per-generation weight normalization
    is the documented mixture-drift tradeoff), and generation g's
    shards offset by the sum of prior generations' per-lang shard
    widths (max relative shard + 1 — identical to the stream's
    max(absolute)+1 chaining). Each generation shadows ``documents``
    with a scoped CTE so the whole pack_weighted oracle replays
    unmodified on the subset."""
    inner = pack_weighted_sql(budget, seed).strip()
    assert inner.startswith("WITH ")
    inner_body = inner[len("WITH "):]
    cases = " ".join(
        f"WHEN r <= (n * {i + 1}) // {n_gens} THEN {i}"
        for i in range(n_gens - 1)
    )
    g_ctes = ",\n".join(
        f"g{g} AS (WITH documents AS "
        f"(SELECT b.* FROM basedocs b JOIN gens ON b.doc_id = gens.doc_id "
        f"WHERE gens.gen = {g}),\n{inner_body})"
        for g in range(n_gens)
    )
    widths = " UNION ALL ".join(
        f"SELECT {g} AS gen, lang, MAX(shard) + 1 AS w FROM g{g} GROUP BY lang"
        for g in range(n_gens)
    )
    packed = " UNION ALL ".join(
        f"SELECT {g} AS gen, * FROM g{g}" for g in range(n_gens)
    )
    return f"""
WITH basedocs AS (SELECT * FROM main.documents),
gens AS (SELECT doc_id, CASE {cases} ELSE {n_gens - 1} END AS gen FROM
  (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
          COUNT(*) OVER () AS n FROM basedocs)),
{g_ctes},
widths AS ({widths}),
offs AS (SELECT gen, lang,
         COALESCE(SUM(w) OVER (PARTITION BY lang ORDER BY gen
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         FROM widths),
packed AS ({packed})
SELECT p.lang, p.doc_id, p.copy_id, p.n_tokens,
       CAST(p.shard + o.off AS BIGINT) AS shard
FROM packed p JOIN offs o ON p.gen = o.gen AND p.lang = o.lang
"""
