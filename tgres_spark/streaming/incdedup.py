"""Streaming incremental dedup: score a live crawl stream against a
STATIC persisted minhash signature index — the deployment twin of the
batch dedup_incremental. foreachBatch runs the batch scoring engine
(pipeline/dedup.py dedup_incremental_score: explode+groupBy minhash,
band keys broadcast into a map-only index scan) on each micro-batch;
no state outlives a batch because a doc's matches depend only on its
own text and the static index, so any micro-batching appends exactly
the batch relation and the run hash-checks against the batch oracle
(dedup_incremental_score_sql). Output is idempotent under batch
replay: each batch OVERWRITES its own ``b<batch_id>`` subdirectory
(the snapshot-per-version discipline of streaming/catalog.py, minus
the manifest — a replayed batch rewrites identical content, never
appends twice). Reference analogue: the dscache consult on every
incoming datapoint (receiver/dscache.go:1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def run_incdedup_stream(
    spark: SparkSession,
    in_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint: str,
    schema,
    files_per_trigger: int = 1,
) -> None:
    from ..pipeline.dedup import dedup_incremental_score

    idx = spark.read.parquet(index_path)

    def _score(batch, batch_id: int) -> None:
        (
            dedup_incremental_score(batch, idx)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/b{batch_id:06d}")
        )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(in_dir)
    )
    q = (
        src.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
