"""Finite-input streaming execution helper.

``run_available_now`` drives a streaming DataFrame to completion with
``Trigger.AvailableNow`` into a memory sink, snapshots the result, and
DROPS the sink view — a plain memory sink would otherwise pin a full copy
of the result on the driver for the session lifetime, one per invocation.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def run_available_now(stream_df: DataFrame, output_mode: str) -> DataFrame:
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
    snapshot = spark.createDataFrame(out.collect(), out.schema)
    spark.catalog.dropTempView(sink)
    return snapshot
