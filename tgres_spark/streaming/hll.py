"""Streaming HyperLogLog: the deterministic HLL register relation
(operators/sketch.py) as a stateful Structured Streaming aggregation.

max(rho) per (group, bucket) is an order-independent merge — exactly
like streaming dedup's count/min state — so the register table after
ANY batching of the input (one availableNow batch, file-per-trigger
micro-batches, a kill/restart resume) is bit-identical to the batch
hll_registers() over the same rows, and the estimate computed from it
hash-matches the same DuckDB oracle as the batch operator. This is
the streaming cardinality story at 100 TB: state is <= 256 rows per
group (two ints each) regardless of how many distinct keys flow by,
vs. the unbounded per-key state exact streaming COUNT(DISTINCT)
would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import hll_registers


def run_hll_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    schema,
    group_col: str,
    key_col: str,
    files_per_trigger: int = 1,
) -> None:
    """Fold the stream into the register table (complete mode — the
    driver contract wants the final relation; an at-scale variant
    would emit register CHANGES in update mode)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(in_dir)
    )
    regs = hll_registers(src, group_col, key_col)

    def sink(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(out_dir)

    q = (
        regs.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
