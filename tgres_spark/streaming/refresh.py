"""Generic cumulative-refresh streaming deployment: the shape for any
relation that is NOT per-batch decomposable (forward-looking windows,
corpus-wide means, global ranks). Each micro-batch (1) lands its raw
rows idempotently in ``raw/b<id>`` (overwrite — a replayed batch
rewrites identical content, never appends twice), then (2) recomputes
the FULL relation over everything landed and publishes it as
``snap/b<id>``. The LATEST snapshot always equals the batch operator
over all input seen, so the batch oracle checks the streaming
deployment verbatim. First extracted from streaming_attribution
(streaming/attribution.py documents the shape's rationale and the
incremental-state alternative); streaming_rfm is the second instance —
RFM segments depend on corpus means and the corpus max timestamp, so
a purchase arriving in batch N can flip segment letters assigned in
batch N−1, exactly the cross-batch dependency per-batch processing
cannot express. Reference analogue: the aggregator's flush-cycle
republish (aggregator.go) — recompute the published view each cycle
from accumulated input."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def run_cumulative_refresh(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    schema,
    relation_fn: Callable[[DataFrame], DataFrame],
    files_per_trigger: int = 1,
) -> None:
    def _refresh(batch, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(
            f"{out_dir}/raw/b{batch_id:06d}"
        )
        allrows = spark.read.parquet(f"{out_dir}/raw/b*")
        relation_fn(allrows).write.mode("overwrite").parquet(
            f"{out_dir}/snap/b{batch_id:06d}"
        )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(in_dir)
    )
    q = (
        src.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_latest_snapshot(spark: SparkSession, out_dir: str) -> DataFrame:
    """The published relation: the highest-numbered snapshot only
    (a replay's transient snapshot is unobservable through this).
    Listing goes through the Hadoop FileSystem API — same abstraction
    as the write path — so out_dir works on HDFS/S3A, not just the
    local FS (catalog.py's _fs pattern)."""
    from .catalog import _fs

    fs, snapdir, _ = _fs(spark, f"{out_dir}/snap")
    snaps = sorted(
        st.getPath().getName()
        for st in fs.listStatus(snapdir)
        if st.getPath().getName().startswith("b")
    )
    return spark.read.parquet(f"{out_dir}/snap/{snaps[-1]}")
