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
    row exists). The matched right values come from ONE right row — they
    are carried through the window as a single struct, so a right row with
    NULL in one value column can never be "torn" (mixed with an older row's
    non-null value).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist on the left side; "
            "rename them before the as-of join"
        )
    rt = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rrow"),
    ).withColumn("_side", F.lit(0))
    lt = (
        left.withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
        # null struct typed from the right side so unionByName is type-exact
        .withColumn("_rrow", F.lit(None).cast(rt.schema["_rrow"].dataType))
    )
    left_only = [c for c in left.columns if c != on]
    for c in left_only:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    unioned = lt.select(on, "_t", "_side", *left_only, "_rrow").unionByName(
        rt.select(on, "_t", "_side", *left_only, "_rrow")
    )
    # _rrow as the final sort key: equal-timestamp right rows otherwise have
    # no defined order, making the picked row nondeterministic across runs.
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc_nulls_first("_rrow"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        on,
        "_t",
        "_side",
        *left_only,
        F.last(F.col("_rrow"), ignorenulls=True).over(w).alias("_rrow"),
    )
    return (
        filled.where(F.col("_side") == 1)
        .select(on, "_t", *left_only, *[F.col(f"_rrow.{c}").alias(c) for c in value_cols])
        .drop("_t")
    )
