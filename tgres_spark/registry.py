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
    # -- new round-12 operators (first driver exposure this round) --
    "ann_ivf_search_maintained", "streaming_pack_increment",
    "dedup_semdedup", "streaming_ivf_search", "emb_abtt",
    "dedup_semdedup_increment", "streaming_semdedup_increment",
    "graph_community_labelprop", "emb_isotropy",
    # -- oldest-green rotation (round 12, rebuilt ledger r01-r11):
    #    the two keys whose latest green row is still round 4
    #    (rrd_spec_rollup, text_unigram_logprob — tail of the r11
    #    window), then the r5 tranche in the ledger's deterministic
    #    order to fill the 50-slot window
    "rrd_spec_rollup", "text_unigram_logprob",
    "ann_lsh_buckets", "dsl_alias", "dsl_aliasByMetric",
    "dsl_aliasByNode", "dsl_aliasSub", "dsl_aliasSub_backref",
    "dsl_averageAbove", "dsl_averageBelow", "dsl_cactiStyle",
    "dsl_color", "dsl_constantLine", "dsl_currentAbove",
    "dsl_currentBelow", "dsl_exclude", "dsl_grep",
    "dsl_highestAverage", "dsl_highestCurrent", "dsl_highestMax",
    "dsl_holtWintersForecast_fixed", "dsl_limit",
    "dsl_lowestAverage", "dsl_lowestCurrent", "dsl_maximumAbove",
    "dsl_maximumBelow", "dsl_minimumAbove", "dsl_minimumBelow",
    "dsl_mostDeviant", "dsl_movingAverage", "dsl_movingMax",
    "dsl_movingMedian", "dsl_movingMin", "dsl_movingSum",
    "dsl_nPercentile", "dsl_randomWalk", "dsl_removeAbovePercentile",
    "dsl_removeAboveValue", "dsl_removeBelowPercentile",
    "dsl_removeBelowValue", "dsl_sinusoid",
    # (the remaining r5/r6 tranche rotates forward next round)
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
