"""Streaming windowed heavy hitters — per-hour top-k event types.

Structured Streaming cannot rank inside the stream (window functions over a
streaming aggregation are unsupported — the rank of a row isn't final until
the window closes), so this uses the standard two-stage shape:

1. **In the stream**: watermarked tumbling-window groupBy count — the
   stateful part, bounded by the watermark (state holds open windows only,
   shuffle keyed on (window, event_type)).
2. **At the sink**: rank each emitted window's counts and keep the top k.
   In production this runs inside ``foreachBatch`` on each closed window's
   rows (a few hundred rows per window — negligible); here it runs on the
   finite-input snapshot, which contains exactly the closed-window rows.

Over a finite input the result equals the batch groupBy + rank twin, which
the DuckDB oracle checks value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .finite import run_available_now
from .ingest import read_events_stream


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stage 1: watermarked per-hour per-type counts (streaming-legal)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").cast("string").alias("hour"), "event_type", "cnt")
    )


def rank_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """Stage 2 (batch, per closed window): top-k rows per hour, ties broken
    by event_type so the cut is deterministic."""
    w = Window.partitionBy("hour").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("hour", "event_type", "cnt", "rk")
    )


def run_topk_once(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Finite-input execution for the correctness gate: drain the windowed
    counts with AvailableNow (complete mode — append would hold the tail
    windows in state forever on a finite input), then rank the snapshot."""
    events = read_events_stream(spark, sf_dir)
    counts = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").cast("string").alias("hour"), "event_type", "cnt")
    )
    return rank_topk(run_available_now(counts, "complete"), k=k)
