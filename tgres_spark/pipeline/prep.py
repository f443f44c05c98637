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


def token_pack_sql(budget: int = 2048, seed: int = 42) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    h = f"md5({seed} || ':' || doc_id)"
    return (
        "SELECT lang, doc_id, n_tokens, "
        f"CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang "
        f"ORDER BY h ASC, doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {budget}) AS BIGINT) AS shard FROM ("
        f"SELECT lang, doc_id, CAST({toks} AS BIGINT) AS n_tokens, {h} AS h "
        "FROM documents)"
    )
