"""SparkSession factory tuned for the tgres_spark engine.

Single place where session-level determinism + scale knobs live:

- UTC session timezone: all epoch conversions must agree with the
  DuckDB correctness oracle, which treats parquet timestamps as naive.
- AQE on: runtime coalescing + skew-join handling stand in for the
  hand-tuned shard routing the reference does in its cluster/ package.
- Arrow on: every Pandas-UDF operator (Holt-Winters, IVF, multimodal)
  moves batches, not rows.

On a real cluster ``shuffle_partitions`` should be ~2-3x total cores
and is the one knob to revisit at 100 TB; tests pass a small value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tgres_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("TGRES_SPARK_SHUFFLE", "32"))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet stores TIMESTAMP(NANOS) which Spark refuses;
        # read as bigint nanos and convert with exact integer division
        # (model.epoch_s) — double division would lose precision >2^53.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # name-bucketed archives (bucketed.py) co-partition a
        # (name, t) series join on the name subset alone; without
        # this Spark re-shuffles both sides despite the bucketing
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.driver.memory", os.environ.get("TGRES_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
