"""As-of (nearest-event) join — absent from both the reference and vanilla
Spark's DataFrame API; implemented with the union + last-observation-
carried-forward window so it scales.

For every left row, attach the single nearest right row per key —
``backward``: latest ``right_time <= left_time`` (trades x quotes, events x
slowly-changing dims, feature-at-train-time lookups); ``forward`` mirrors
it. ``tolerance`` bounds staleness like pandas ``merge_asof``.

Why this shape at 100 TB:

- ONE shuffle of (left ∪ right), partitioned by key — the same cost as the
  best possible equi-join layout, with per-key-group skew behavior.
- No candidate blow-up: a range/interval-join formulation generates
  |left_bucket| x |right_bucket| intermediates before picking the nearest;
  the window form is strictly linear in its input.
- The within-partition sort is the only extra cost, and a deployment
  reading time-bucketed/sorted parquet gets it nearly free.

Correctness notes (pinned in tests/test_asof.py + test_review_fixes.py):

- The matched right values are carried through the window as a single
  STRUCT, so a right row with NULL in one value column can never be "torn"
  (mixed with an older row's non-null value), and the matched timestamp
  always comes from the same row as the values.
- Equal-timestamp right rows have no defined winner in a naive
  formulation; the struct participates in the sort, so the pick is
  deterministic across runs/engines (callers wanting specific tie
  semantics should pre-aggregate the right side to unique timestamps —
  DuckDB's native ASOF JOIN leaves the tie undefined too).
- A right row AT the left timestamp is visible (inclusive) in both
  directions, ordered by a side marker.

Reference anchor: extends the join tier (SURVEY.md §2 J1-J3) the way
`$near` extends filtering — nearest-neighbor semantics expressed
relationally (SURVEY.md §2.5 model).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    matched_time_alias: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the nearest
    ``right`` row per ``on`` key(s). Unmatched left rows keep nulls
    (left-outer semantics).

    ``value_cols``: right columns to attach (default: all non-key,
    non-time columns). ``tolerance``: optional interval Column (e.g.
    ``F.expr("INTERVAL 10 MINUTES")``) — matches farther than this are
    nulled out, row kept. ``matched_time_alias``: also expose the matched
    right timestamp under this name.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction={direction!r} must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, right_time)]
    out_names = list(value_cols) + ([matched_time_alias] if matched_time_alias else [])
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols/matched_time_alias {sorted(clash)} already exist on "
            "the left side; rename them before the as-of join"
        )

    # matched time + values as ONE struct: carried atomically (no tearing)
    # and a deterministic tie-break key for equal-timestamp right rows
    rt = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.struct(F.col(right_time).alias("__mt"), *[F.col(c) for c in value_cols]).alias("__r"),
    ).withColumn("__side", F.lit(0))
    lt = (
        left.withColumn("__t", F.col(left_time))
        .withColumn("__side", F.lit(1))
        # null struct typed from the right side so unionByName is type-exact
        .withColumn("__r", F.lit(None).cast(rt.schema["__r"].dataType))
    )
    left_only = [c for c in left.columns if c not in keys]
    for c in left_only:
        rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [*keys, "__t", "__side", *left_only, "__r"]
    unioned = lt.select(*cols).unionByName(rt.select(*cols))

    # side marker: right rows sort before left at equal timestamps, so
    # "at-or-before"/"at-or-after" both see the tying right row; the struct
    # is the final key so equal-timestamp right rows pick deterministically
    time_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_order, F.asc("__side"), F.asc_nulls_first("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "__t",
        "__side",
        *left_only,
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.where(F.col("__side") == 1)

    if tolerance is not None:
        mt = F.col("__r.__mt")
        gap_ok = (
            (F.col("__t") - tolerance <= mt)
            if direction == "backward"
            else (mt <= F.col("__t") + tolerance)
        )
        out = out.withColumn("__r", F.when(mt.isNotNull() & gap_ok, F.col("__r")))

    tail = []
    if matched_time_alias is not None:
        tail.append(F.col("__r.__mt").alias(matched_time_alias))
    tail.extend(F.col(f"__r.{c}").alias(c) for c in value_cols)
    return out.select(*[F.col(c) for c in left.columns], *tail)
