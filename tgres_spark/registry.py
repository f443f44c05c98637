"""Query registry: every SURVEY §2 line registers (spark_fn, oracle_sql).

The driver contract (__spark_entry__.py) exposes ``queries()`` and
``oracle_sql()``; modules register here at import time via
``@register("key", sql=...)``. Keys mirror SURVEY §2 exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, sql: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query; ``sql`` is the
    DuckDB oracle (None → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if sql is not None:
            ORACLES[key] = sql
        return fn

    return deco


# Frozen attestation-priority order (round 9). The driver attests a
# fixed-size prefix (50 entries) of the registry each round. Round 8
# cleared the entire backlog (every oracle-backed key's LATEST driver
# row is green — VERDICT r8 rebuilt the ledger r01-r08 and confirmed),
# so from round 9 onward the window is simply: every NEW operator the
# round it ships (first driver exposure), then the oldest-green
# re-attestation rotation — keys whose latest green row is the oldest,
# refreshed oldest-round-first (r1 keys, then the r3 tranche, then the
# leading r4 keys in deterministic order). Rows-only keys stay pinned
# in _ATTEST_TAIL. This tuple is a constant — registry order is a pure
# function of the code, independent of artifact files.
_ATTEST_PRIORITY: tuple[str, ...] = (
    # -- new round-11 operators (first driver exposure this round) --
    "pipeline_span_scrub", "ann_ivf_compact", "ann_ivf_refit_warm",
    "graph_pagerank2_weighted", "streaming_prep_increment",
    "pipeline_sample_weighted", "ann_ivf_split",
    # -- round-10 operators (driver-r10 green; rotate next) --
    "dedup_index_update", "streaming_index_update",
    "streaming_attribution_delta", "streaming_funnel_delta",
    "corpus_bpe_encode", "corpus_bpe_fertility",
    "graph_pagerank2_fixed", "graph_hits2_fixed",
    "pipeline_rank_quality", "streaming_pagerank",
    "pipeline_span_dedup2", "emb_matryoshka_eval",
    "text_unicode_anomalies", "mm_phash_sweep",
    "ann_ivf_tombstone", "pipeline_prep_weights", "events_cohort_ltv",
    "corpus_bpe_sweep", "events_activity_histogram",
    "dsl_mapSeries", "dsl_reduceSeries", "dsl_stacked", "dsl_substr",
    # -- oldest-green rotation: the 2 remaining r1 keys, then the full
    #    r3 tranche, then the leading r4 keys (deterministic order)
    "dsl_timeStack", "dsl_transformNull",
    "ann_cosine_topk", "ann_lsh_topk", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "events_props_extract", "mm_frame_sample", "text_fingerprint",
    "text_langid", "text_quality", "text_tokens",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "dedup_components", "dedup_embedding", "dedup_embedding_lsh",
    "dsl_absolute", "dsl_asPercent", "dsl_asPercent_total",
    "dsl_averageSeriesWithWildcards", "dsl_averageSeries_gaps",
    "dsl_countSeries",
    # (the remaining r4 tranche rotates forward next round)
)

# Declared rows-only iterative fits (no DuckDB oracle exists): forced
# to the very END of the registry order so a fixed-size attestation
# prefix can never burn a slot on an `err: no_oracle` row (as
# ann_ivf_search did in r2/r3). Each has a hash-checked
# fixed-parameter sibling earlier in the registry.
_ATTEST_TAIL: tuple[str, ...] = (
    "dsl_holtWintersForecast", "dsl_holtWintersConfidenceBands",
    "dsl_holtWintersAberration", "ann_ivf_search",
)


_QUERY_MODULES = [
    "tgres_spark.operators.queries_rrd",
    "tgres_spark.operators.queries_dsl",
    "tgres_spark.operators.queries_ingest",
    "tgres_spark.operators.queries_pipeline",
    "tgres_spark.tpch",
    "tgres_spark.tpch2",
    "tgres_spark.operators.queries_dslparse",
    "tgres_spark.operators.queries_dsspec",
]


def _family(key: str) -> str:
    """Coarse query family for registration-order interleaving."""
    if key.startswith("dsl_expression"):
        return "expr"
    for p in (
        "rrd", "dsl", "graphite", "statsd", "dedup", "ann",
        "text", "mm", "tpch", "events", "find",
    ):
        if key.startswith(p + "_"):
            return p
    return "ingest"  # paced_metric, streaming_ingest_pipeline, ...


def _interleave() -> None:
    """Reorder QUERIES/ORACLES: priority keys first, then round-robin
    across families.

    ``_ATTEST_PRIORITY`` (a frozen constant, see above) lists the keys
    that lack green driver-side correctness evidence; they come first
    so the driver's fixed-size attestation prefix covers them.
    ``_ATTEST_TAIL`` (rows-only iterative fits) is forced to the very
    end so no window slot is spent on a key that cannot hash-match.
    Every remaining key sits between them in a family-interleaved
    order so any window samples the whole operator surface (rrd, dsl,
    ingest, dedup, ann, text, tpch, ...) rather than whichever module
    imported first. Deterministic, artifact-independent, and a pure
    permutation — same keys, same functions, same SQL.
    """
    global QUERIES, ORACLES
    pri = [k for k in _ATTEST_PRIORITY if k in QUERIES]
    tail = [k for k in _ATTEST_TAIL if k in QUERIES]
    seen = set(pri) | set(tail)
    buckets: dict[str, list[str]] = {}
    for k in QUERIES:
        if k not in seen:
            buckets.setdefault(_family(k), []).append(k)
    order: list[str] = list(pri)
    queues = [list(v) for v in buckets.values()]
    while queues:
        nxt = []
        for q in queues:
            order.append(q.pop(0))
            if q:
                nxt.append(q)
        queues = nxt
    order.extend(tail)
    QUERIES = {k: QUERIES[k] for k in order}
    ORACLES = {k: ORACLES[k] for k in order if k in ORACLES}


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib

    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _interleave()
