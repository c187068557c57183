"""Gap-based sessionization over an event stream table.

Classic pattern: a new session starts when the gap to the previous event of
the same user exceeds ``gap``; session id = running count of session-start
flags. Two windows over the same (user, time) sort order — Catalyst executes
them in one shuffle + one sort.

The streaming twin (state-store based, no global sort) lives in
``streaming/``; this is the batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str, time_col: str, gap_minutes: float = 30.0) -> DataFrame:
    """Assign ``session_id`` (1-based per user) to every event row.

    Gap arithmetic runs on exact microseconds (``unix_micros``) — second-
    truncated casts would move session boundaries for sub-second data.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(time_col).asc())
    gap_us = F.unix_micros(F.col(time_col)) - F.lag(F.unix_micros(F.col(time_col))).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > int(gap_minutes * 60 * 1_000_000)), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).drop("_new_session")


def session_stats(df: DataFrame, user_col: str, time_col: str, gap_minutes: float = 30.0) -> DataFrame:
    """Per-session aggregate: event count + duration in integer milliseconds.

    BIGINT on purpose: a derived DOUBLE (``round(us/1e6, 3)``) hashed
    differently across engines under some canonicalizations (r1's only red
    CORRECTNESS cell); integer micros ``DIV`` 1000 is bit-identical
    everywhere.
    """
    s = sessionize(df, user_col, time_col, gap_minutes)
    span_us = F.max(F.unix_micros(F.col(time_col))) - F.min(F.unix_micros(F.col(time_col)))
    return (
        s.groupBy(user_col, "session_id")
        .agg(F.count("*").alias("n_events"), span_us.alias("_span_us"))
        .withColumn("duration_ms", F.expr("_span_us div 1000"))
        .drop("_span_us")
    )
