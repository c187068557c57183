"""Windowed streaming rollup — the streaming twin of ``t_hourly_rollup``
(plans/analytics.py).

Two shapes:

- :func:`hourly_rollup_stream` — the production plan: event-time tumbling
  window + watermark, append mode. Late rows beyond the watermark are
  dropped; a window emits once, when the watermark passes its end. This is
  the shape that runs unbounded at scale (state store holds only open
  windows; shuffle is keyed on (window, event_type)).
- :func:`run_hourly_rollup_once` — finite-input execution used by the
  correctness gate: ``Trigger.AvailableNow`` + complete mode into a memory
  sink, which must equal the batch groupBy exactly (append mode cannot:
  nothing advances the watermark past the final window on a finite input,
  so the tail windows would stay unflushed in the state store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .finite import run_available_now
from .ingest import read_events_stream


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming events df."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("hour"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def run_hourly_rollup_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming rollup over all currently-available input and
    return the final result (equal to the batch twin by construction)."""
    events = read_events_stream(spark, sf_dir)
    rolled = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("hour"),
            "event_type",
            "cnt",
            "total_value",
        )
    )
    return run_available_now(rolled, "complete")
