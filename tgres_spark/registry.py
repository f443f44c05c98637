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


_QUERY_MODULES = [
    "tgres_spark.operators.queries_rrd",
    "tgres_spark.operators.queries_dsl",
    "tgres_spark.operators.queries_ingest",
    "tgres_spark.operators.queries_pipeline",
    "tgres_spark.tpch",
    "tgres_spark.operators.queries_dslparse",
    "tgres_spark.operators.queries_dsspec",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib

    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
