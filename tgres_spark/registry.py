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


# Frozen attestation-priority order (round 6). The driver attests a
# fixed-size prefix (50 entries) of the registry each round; these 85
# keys (everything registered in round-5 sessions 3-4: the tpch2
# shapes, the streaming suite, emb/series/corpus families, the
# sketches, asof, prep_e2e...) have never appeared in any
# CORRECTNESS_r{1..5} window. Listing them first gives the round-6
# window 50 brand-new attestations and leaves 35 for round 7;
# oracle-backed keys come first so hash checks land, the 3 declared
# rows-only iterative fits last. Afterwards the order is simply
# stable. This tuple is a constant — registry order is a pure
# function of the code, independent of any artifact files in the
# checkout.
_ATTEST_PRIORITY: tuple[str, ...] = (
    "streaming_name_catalog", "series_seasonal_decompose",
    "events_anomaly", "text_pii_scrub", "mm_resize_stub",
    "series_correlate", "text_tfidf_keywords", "mm_audio_chunks",
    "series_xcorr", "ann_ivf_assign", "text_novelty", "series_cusum",
    "dedup_minhash_est", "ann_ivf_lloyd_fixed", "text_entropy",
    "series_trend_slope", "tpch_q4", "ann_pq_encode", "text_repetition",
    "streaming_anomaly_zscore", "events_hll_distinct", "tpch_q12",
    "ann_pq_search", "events_conversion_lag", "tpch_q14",
    "ann_ivf_pq_search", "streaming_dedup_exact",
    "events_cms_heavy_hitters", "tpch_q10", "ann_lsh_recall",
    "rrd_bucketed_consolidate", "streaming_sessionize", "events_asof_join",
    "tpch_q7", "dedup_text_vs_semantic", "ann_ivf_probe_sweep",
    "streaming_hll_distinct", "events_rollup_cube", "tpch_q8",
    "dedup_embedding_cluster", "streaming_hist_quantiles",
    "events_feature_matrix", "tpch_q13", "streaming_interval_join",
    "events_transitions", "tpch_q15", "streaming_enrich_join", "tpch_q17",
    "streaming_cms_heavy_hitters", "tpch_q18", "streaming_asof_enrich",
    "tpch_q19", "emb_label_centroids", "tpch_q22", "pipeline_c4_clean",
    "tpch_q2", "corpus_top_ngrams", "tpch_q9", "corpus_bpe_pairs",
    "tpch_q16", "emb_norm_outliers", "tpch_q21", "pipeline_quality_model",
    "tpch_q11", "pipeline_dataset_card", "tpch_q20", "pipeline_prep_e2e",
    "pipeline_mix_temperature", "corpus_fingerprint",
    "pipeline_mix_unimax", "pipeline_gopher_filter", "pipeline_span_dedup",
    "corpus_dedup_stats", "emb_covariance", "emb_outliers",
    "emb_power_iter", "emb_covariance_np", "pipeline_shard_manifest",
    "dsl_holtWintersConfidenceBands_fixed",
    "dsl_holtWintersAberration_fixed", "dsl_align_lcm_sum",
    "dsl_maxDataPoints",
    # declared rows-only (iterative fits), never inside a driver window
    "dsl_holtWintersForecast", "dsl_holtWintersConfidenceBands",
    "dsl_holtWintersAberration",
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
    that lacked driver-side correctness evidence through round 4; they
    come first so the driver's fixed-size attestation prefix covers
    them. Every remaining key follows in a family-interleaved order so
    any window samples the whole operator surface (rrd, dsl, ingest,
    dedup, ann, text, tpch, ...) rather than whichever module imported
    first. Deterministic, artifact-independent, and a pure permutation
    — same keys, same functions, same SQL.
    """
    global QUERIES, ORACLES
    pri = [k for k in _ATTEST_PRIORITY if k in QUERIES]
    seen = set(pri)
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
    QUERIES = {k: QUERIES[k] for k in order}
    ORACLES = {k: ORACLES[k] for k in order if k in ORACLES}


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib

    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _interleave()
