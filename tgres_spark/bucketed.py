"""Bucketed series storage: the cluster/ + serde/ layout as Spark
bucketed tables.

Reference: cluster/cluster.go consistent-hashes series names across
nodes so every operation on one series is node-local; serde/postgres.go
keeps each RRA's slots physically together. Spark's native equivalent
is a bucketed table: `bucketBy(N, name) sortBy(name, t)` bakes the
hash distribution INTO the files, so every downstream per-series
operation — the consolidate window, the (name, slot) aggregation, a
series⋈series join between two archives bucketed the same way — reads
the partitioning off disk instead of shuffling.

Concretely (pinned in tests/test_plans.py): consolidate() over a
bucketed archive runs with ZERO Exchange operators — the window's
HashPartitioning(name) requirement and the aggregate's clustered-
distribution requirement are both satisfied by the scan, and sortBy
satisfies the window's sort. At 100 TB that deletes the single
largest cost of every re-consolidation / compaction pass (the full-
table shuffle); writes pay the hash once, every read amortizes it.

The writer repartitions by name with the SAME hash the bucketing uses
(both are Murmur3 HashPartitioning), so each task owns exactly its
bucket and emits ONE file per bucket — multiple files per bucket make
Spark distrust the sort order (it keeps the bucketing but re-sorts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .model import NAME, T


def write_bucketed_series(
    sf: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 8,
) -> None:
    """Persist a SeriesFrame as a name-bucketed, (name, t)-sorted
    parquet table at ``path`` registered as ``table``."""
    (
        sf.repartition(n_buckets, NAME)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, NAME)
        .sortBy(NAME, T)
        .saveAsTable(table)
    )


def read_bucketed_series(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
