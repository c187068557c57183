"""Finite-input streaming execution helpers.

``run_available_now`` drives a streaming DataFrame to completion with
``Trigger.AvailableNow`` into a memory sink, snapshots the result, and
DROPS the sink view — a plain memory sink would otherwise pin a full copy
of the result on the driver for the session lifetime, one per invocation.

``run_available_now_to_parquet`` is the durable twin: a ``foreachBatch``
parquet sink, which is how a real deployment lands streaming output in the
lake (executor-side writes, nothing collected on the driver; the
checkpoint gives exactly-once per restarted query). The memory-sink runner
stays the harness default because the oracle comparison needs a driver
snapshot anyway.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_available_now(
    stream_df: DataFrame, output_mode: str, max_rows: int = 1_000_000
) -> DataFrame:
    """Drain a finite stream through a memory sink and snapshot the result.

    DRIVER-SIDED BY DESIGN: the memory sink materializes the full result on
    the driver, so this runner is only for queries whose output is a small
    aggregate (every registered ``st_*`` query returns counts/rollups). The
    ``max_rows`` guard fires AFTER the sink has accumulated the result (the
    sink itself is the materialization point), so it cannot stop a result
    too large for the heap — what it does is fail loudly on oversized
    results that fit, before ``collect()`` doubles them, pointing misuse at
    :func:`run_available_now_to_parquet` (executor-side writes, unbounded)
    instead of letting it grow with the data until the heap genuinely OOMs.
    """
    spark = stream_df.sparkSession
    sink = f"finite_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(sink)
    try:
        n = out.count()  # rows already sit in driver memory; the count is local
        if n > max_rows:
            raise ValueError(
                f"run_available_now drained {n} rows into the driver-side memory "
                f"sink (max_rows={max_rows}); large-result streaming queries must "
                "use run_available_now_to_parquet (foreachBatch, executor-side "
                "writes) instead"
            )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.catalog.dropTempView(sink)


def run_available_now_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
) -> None:
    """Drain a finite stream into a parquet directory via ``foreachBatch``.

    Batches write with executor-side parallelism; rows never pass through
    the driver. ``update``/``complete`` streams (e.g. a windowed
    aggregation before its watermark closes) are handled by the same
    writer because each micro-batch frame is just overwritten state —
    consumers of those modes should read the LAST batch only, which the
    ``batch_id`` partition column preserves.

    Idempotent under restart: ``foreachBatch`` is at-least-once (a batch
    that crashed mid-write is re-delivered with the SAME batch_id), so the
    write is dynamic-partition-overwrite keyed by batch_id — a re-delivery
    replaces its own partition instead of appending duplicates.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
