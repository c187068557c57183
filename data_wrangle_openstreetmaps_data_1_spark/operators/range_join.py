"""Range (interval) join: events whose timestamp falls inside an interval.

Naive Spark plans a theta-join (BroadcastNestedLoopJoin) for
``t BETWEEN s AND e`` — O(|events| x |intervals|) comparisons. The scale
form here buckets time into fixed windows: each event lands in exactly one
bucket, each interval explodes to every bucket it covers, and the join
becomes a keyed EQUI-join on the bucket id plus a residual BETWEEN filter.
Each matching pair appears exactly once (the event's single bucket is
necessarily among the interval's buckets), so no dedup is needed.

Bucket width tunes the trade: wider buckets -> fewer interval replicas but
more residual-filter work; ~the median interval length is a good default.
This is the same binning idea as the z-order geo layout (functions/geo.py)
applied to one dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Inner-join rows of ``events`` to every ``intervals`` row whose
    [start, end] (inclusive) contains the event time.

    Inner only: the residual BETWEEN filter runs after the join, which
    would silently turn an outer join back into an inner one. Inverted
    intervals (end < start) are dropped up front — ``sequence`` would
    otherwise count DOWN through every bucket between them (a one-row
    fan-out bomb on dirty data) instead of producing zero buckets.
    """
    ev = events.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(time_col)) / bucket_seconds)
    )
    intervals = intervals.where(F.col(end_col) >= F.col(start_col))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    return (
        ev.join(iv, "__b")
        .where(F.col(time_col).between(F.col(start_col), F.col(end_col)))
        .drop("__b")
    )
