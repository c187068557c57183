"""Streaming queries in the registry.

``st_hourly_rollup`` carries the SAME oracle SQL as its batch twin
``t_hourly_rollup``: over a finite input, the windowed streaming aggregation
must equal the batch groupBy exactly — so even the streaming path is fully
value-checked by DuckDB.

``st_sessionize`` has no oracle by design: the stateful operator emits only
*closed* sessions, and which sessions have closed depends on stream progress
(tail sessions are still open when a finite input ends). Its correctness is
asserted in tests/test_streaming.py instead, by diffing against the batch
sessionizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.dedup import run_dedup_once
from ..streaming.join import run_stream_join_once
from ..streaming.rollup import run_hourly_rollup_once
from ..streaming.sessions import run_sessionize_once
from .registry import register


@register(
    "st_hourly_rollup",
    """
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
           count(*) AS cnt, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window rollup (AvailableNow over the "
    "events file source); must equal the batch twin, and the oracle checks "
    "that it does",
)
def st_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return run_hourly_rollup_once(spark, sf)


@register(
    "st_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="streaming dedup via dropDuplicatesWithinWatermark (bounded state: "
    "keys expire past the watermark); over a finite input the surviving key "
    "set equals batch DISTINCT, which the oracle checks",
)
def st_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return run_dedup_once(spark, sf, ["user_id", "event_type"])


@register(
    "st_stream_join",
    """
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    v AS (SELECT user_id, ts AS view_ts, value AS view_value
          FROM events WHERE event_type = 'view')
    SELECT click_id, c.user_id,
           CAST(click_ts AS VARCHAR) AS click_ts,
           CAST(view_ts AS VARCHAR) AS view_ts,
           round(view_value, 2) AS view_value
    FROM c JOIN v ON c.user_id = v.user_id
                 AND view_ts >= click_ts - INTERVAL 600 SECONDS
                 AND view_ts <= click_ts
    """,
    doc="watermarked stream-stream join (clicks x views within a trailing "
    "10-min window; the time bound is what lets join state expire); over a "
    "finite input it equals the batch join, which the oracle checks",
)
def st_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    return run_stream_join_once(spark, sf, window_minutes=10.0)


@register(
    "st_sessionize",
    None,  # rows-only: emission set depends on stream progress (see module doc)
    doc="stateful streaming gap-sessionization via applyInPandasWithState; "
    "emits closed sessions only — batch-equivalence asserted in tests",
)
def st_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    return run_sessionize_once(spark, sf, gap_minutes=30.0)
