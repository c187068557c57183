"""As-of join (point-in-time lookup) — absent from both the reference and
vanilla Spark's DataFrame API; implemented with the union + window trick so
it scales: one shuffle on (key, time), no range-join explosion.

For each left row, find the most recent right row with the same key and
``right.time <= left.time``.

Algorithm: tag both sides, union, window ``last(right_value, ignorenulls)``
over (key ORDER BY time, side) — right rows sort before left rows at equal
timestamps so "at or before" semantics hold. This is O(n log n) per key
partition vs O(n*m) for the naive range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` values at
    or before its timestamp, matched on key column ``on``.

    Output: all ``left`` columns + ``value_cols`` (null when no prior right
    row exists).
    """
    lt = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(on),
            F.col(right_time).alias("_t"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    # Align schemas: left contributes nulls for value cols; right contributes
    # nulls for left-only cols.
    for c in value_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    left_only = [c for c in left.columns if c not in {on}]
    for c in left_only:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    unioned = lt.select(on, "_t", "_side", *left_only, *value_cols).unionByName(
        rt.select(on, "_t", "_side", *left_only, *value_cols)
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        on,
        "_t",
        "_side",
        *left_only,
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.where(F.col("_side") == 1).drop("_side", "_t")
