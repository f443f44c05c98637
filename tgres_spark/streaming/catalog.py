"""Streaming name catalog: create-on-first-write for live ingest.

Reference: receiver/dscache.go — the receiver keeps a DS cache and
CREATES a DS the first time a datapoint arrives for an unseen name
(getByNameOrLoadOrCreate), so `/metrics/find` sees a series the
moment its first point lands. The batch engine derives the catalog
per query; this is the live analog: a Structured Streaming query
folds each micro-batch's names into a persistent catalog relation

    (name, first_seen bigint, last_seen bigint, n_points bigint)

where first_seen is fixed by the batch that created the entry
(create-on-first-write) and last_seen/n_points advance with traffic.

Spark-first shape: foreachBatch + snapshot-versioned parquet. Each
batch writes a NEW snapshot directory ``v<epoch_batch>`` and then
atomically advances a ``_LATEST`` pointer file — readers (find, the
DSL evaluator's glob resolution) always see a complete snapshot,
never a half-written one, and a crashed batch leaves the pointer
untouched (the checkpoint replays it). The merge itself is one
full-outer groupBy-join of the (small) catalog with the batch's
per-name aggregate.

At 100 TB the catalog is ~1 row per series (10M series ≈ a few
hundred MB of parquet) — snapshot rewrite per flush interval is
cheap relative to the point stream; a table format with row-level
merge (Iceberg/Delta) slots in behind the same API when available.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import NAME, T

_LATEST = "_LATEST"


def read_catalog(spark: SparkSession, catalog_dir: str) -> DataFrame | None:
    """Latest complete snapshot, or None before the first write."""
    ptr = os.path.join(catalog_dir, _LATEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(catalog_dir, version))


def _latest_before(
    spark: SparkSession, catalog_dir: str, batch_id: int
) -> DataFrame | None:
    """Newest snapshot with version strictly below ``batch_id``."""
    if not os.path.isdir(catalog_dir):
        return None
    versions = sorted(
        d
        for d in os.listdir(catalog_dir)
        if d.startswith("v")
        and d[1:].isdigit()
        and int(d[1:]) < batch_id
        and os.path.isdir(os.path.join(catalog_dir, d))
    )
    if not versions:
        return None
    return spark.read.parquet(os.path.join(catalog_dir, versions[-1]))


def merge_catalog_batch(
    batch: DataFrame, batch_id: int, catalog_dir: str
) -> None:
    """Fold one micro-batch of points into the catalog (foreachBatch
    target). Idempotent per batch_id: the merge base is the newest
    snapshot with version < batch_id — NOT the _LATEST pointer — so a
    batch replayed after a crash (pointer already advanced to its own
    version, checkpoint not yet committed) folds against its original
    base instead of double-counting itself into n_points."""
    spark = batch.sparkSession
    incoming = batch.groupBy(NAME).agg(
        F.min(T).alias("b_first"),
        F.max(T).alias("b_last"),
        F.count("*").alias("b_n"),
    )
    cur = _latest_before(spark, catalog_dir, batch_id)
    if cur is None:
        merged = incoming.select(
            NAME,
            F.col("b_first").alias("first_seen"),
            F.col("b_last").alias("last_seen"),
            F.col("b_n").alias("n_points"),
        )
    else:
        j = cur.join(incoming, NAME, "full")
        merged = j.select(
            NAME,
            # create-on-first-write: an existing entry KEEPS its
            # first_seen even if a late point predates it (the
            # reference's DS creation time is the arrival time too)
            F.coalesce(F.col("first_seen"), F.col("b_first")).alias("first_seen"),
            F.greatest(
                F.coalesce(F.col("last_seen"), F.lit(-(1 << 62))),
                F.coalesce(F.col("b_last"), F.lit(-(1 << 62))),
            ).alias("last_seen"),
            (
                F.coalesce(F.col("n_points"), F.lit(0))
                + F.coalesce(F.col("b_n"), F.lit(0))
            ).alias("n_points"),
        )
    version = f"v{batch_id:012d}"
    out = os.path.join(catalog_dir, version)
    merged.coalesce(1).write.mode("overwrite").parquet(out)
    tmp = os.path.join(catalog_dir, f".{_LATEST}.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(catalog_dir, _LATEST))
    _retire_old_snapshots(catalog_dir, keep=2)


def _retire_old_snapshots(catalog_dir: str, keep: int = 2) -> None:
    """Drop snapshot dirs older than the newest ``keep`` — the
    previous snapshot stays readable for any in-flight reader that
    resolved the pointer just before the swap; everything older is
    unreachable (the pointer only moves forward)."""
    import shutil

    versions = sorted(
        d for d in os.listdir(catalog_dir)
        if d.startswith("v") and os.path.isdir(os.path.join(catalog_dir, d))
    )
    for d in versions[:-keep]:
        shutil.rmtree(os.path.join(catalog_dir, d), ignore_errors=True)


def run_catalog_pipeline(
    spark: SparkSession,
    in_path: str,
    catalog_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 16,
) -> None:
    """Graphite-line file drops → per-batch catalog merge
    (availableNow; rate-limited triggers exercise multi-batch
    folding)."""
    from .ingest import read_graphite_stream

    os.makedirs(catalog_dir, exist_ok=True)
    parsed = read_graphite_stream(spark, in_path, max_files_per_trigger)
    q = (
        parsed.writeStream.foreachBatch(
            lambda df, bid: merge_catalog_batch(df, bid, catalog_dir)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
