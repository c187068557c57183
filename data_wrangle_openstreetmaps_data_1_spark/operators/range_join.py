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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: str,
    a_start: str = "s",
    a_end: str = "e",
    b_start: str = "s",
    b_end: str = "e",
    bin_width: int = 14,
) -> DataFrame:
    """Interval x interval OVERLAP join (the two-sided sibling of
    range_join_bucketed's point-in-interval): pairs of rows sharing ``on``
    whose [start, end] spans intersect.

    Both sides explode to the integer bins their span covers and the join
    is a keyed equi-join on (on, bin) + the exact overlap predicate. A
    pair whose spans share k bins would surface k times; instead of a
    DISTINCT exchange over the whole candidate set, each surviving pair is
    kept ONLY in the bin containing its overlap's start
    (bin == floor(max(s_a, s_b) / width)) — that bin is covered by both
    spans by construction, so every true pair appears exactly once and
    the dedup costs one codegen'd comparison, not a shuffle.

    Inverted spans (end < start) are dropped up front, same rationale as
    range_join_bucketed. Bin width tunes replication vs residual work;
    ~the median span length is a good default. At 100 TB both sides
    shuffle once on (on, bin) — AQE splits hot entities, and the
    replication factor is span/width + 1, bounded and known up front.
    """
    an = a.where(F.col(a_end) >= F.col(a_start)).select(
        F.col(on).alias("__k"),
        *[F.col(c).alias(f"a_{c}") for c in a.columns if c != on],
        F.explode(
            F.sequence(
                F.floor(F.col(a_start) / bin_width), F.floor(F.col(a_end) / bin_width)
            )
        ).alias("__bin"),
    )
    bn = b.where(F.col(b_end) >= F.col(b_start)).select(
        F.col(on).alias("__k"),
        *[F.col(c).alias(f"b_{c}") for c in b.columns if c != on],
        F.explode(
            F.sequence(
                F.floor(F.col(b_start) / bin_width), F.floor(F.col(b_end) / bin_width)
            )
        ).alias("__bin"),
    )
    sa, ea = f"a_{a_start}", f"a_{a_end}"
    sb, eb = f"b_{b_start}", f"b_{b_end}"
    return (
        an.join(bn, ["__k", "__bin"])
        .where(
            (F.col(sa) <= F.col(eb))
            & (F.col(sb) <= F.col(ea))
            & (F.col("__bin") == F.floor(F.greatest(F.col(sa), F.col(sb)) / bin_width))
        )
        .drop("__bin")
        .withColumnRenamed("__k", on)
    )
