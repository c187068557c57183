"""Stream-stream join: clicks joined to same-user views within a trailing
time window — the canonical watermarked two-stream join.

Both sides carry watermarks and the join condition bounds event-time skew
(``view.ts BETWEEN click.ts - window AND click.ts``), so the state store
can expire buffered rows once the watermark passes the bound — without the
time bound a stream-stream inner join would buffer both streams forever.

Over a finite input (AvailableNow) the result equals the equivalent batch
join, which the DuckDB oracle checks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .finite import run_available_now
from .ingest import read_events_stream


def clicks_with_recent_views(
    clicks: DataFrame, views: DataFrame, window_minutes: float = 10.0, watermark: str = "1 hour"
) -> DataFrame:
    """Inner stream-stream join: every (click, view) pair for the same user
    with the view at most ``window_minutes`` before (or at) the click."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    window_expr = f"INTERVAL {int(window_minutes * 60)} SECONDS"
    return c.join(
        v,
        F.expr(
            f"user_id = v_user_id AND view_ts >= click_ts - {window_expr} AND view_ts <= click_ts"
        ),
    ).select(
        "click_id",
        "user_id",
        F.col("click_ts").cast("string").alias("click_ts"),
        F.col("view_ts").cast("string").alias("view_ts"),
        F.round("view_value", 2).alias("view_value"),
    )


def run_stream_join_once(
    spark: SparkSession, sf_dir: str, window_minutes: float = 10.0
) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    clicks = events.where(F.col("event_type") == "click")
    views = events.where(F.col("event_type") == "view")
    joined = clicks_with_recent_views(clicks, views, window_minutes)
    return run_available_now(joined, "append")
