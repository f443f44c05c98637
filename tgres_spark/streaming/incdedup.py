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


def run_index_update_stream(
    spark: SparkSession,
    in_dir: str,
    index_dir: str,
    checkpoint: str,
    schema,
    compact_threshold: int = 4,
    files_per_trigger: int = 1,
) -> None:
    """The LIVE write-back half of the incremental dedup lifecycle
    (round 10): each crawl micro-batch's minhash signatures are
    appended to the persisted index as delta generation = batch_id,
    compacting on the same cadence as the batch dedup_index_update —
    so tomorrow's consult (run_incdedup_stream / dedup_incremental)
    sees today's docs. Replay-idempotent by construction: the
    generation number IS the batch id, and dedup_index_update
    rewrites identical content under the same manifest on replay; a
    crash between a delta's data write and its manifest leaves the
    generation unobservable and the replay completes it (pinned in
    the batch lifecycle pytest). After the run, read_signature_index
    over the accumulated generations equals the full-corpus
    minhash_signatures rerun — micro-batching is invisible because a
    doc's signature depends only on its own text, which is what the
    batch oracle checks."""
    from ..pipeline.dedup import dedup_index_update

    def _update(batch, batch_id: int) -> None:
        dedup_index_update(
            spark, index_dir, batch, generation=batch_id,
            compact_threshold=compact_threshold,
        )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(in_dir)
    )
    q = (
        src.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
