"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tgres_spark``; this file is plumbing only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tgres_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-RRA rollup of the events stream (tgres's core
    write path: datapoints → consolidated archives), sf0.001."""
    registry.load_all()
    return registry.QUERIES["rrd_multi_rra"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
