"""Slowly-changing-dimension type-2 maintenance (Kimball SCD2, public).

u_upsert_snapshot (plans/pipeline_ext.py) is the type-1 MERGE: updates
overwrite in place. Type 2 preserves history: applying a change batch to
a versioned dimension must (a) CLOSE the current row of every key whose
tracked attributes actually changed (set valid_to = batch id, clear
is_current), (b) INSERT the new version (valid_from = batch id), and
(c) pass every other row through untouched — including rows of keys that
appear in the batch with UNCHANGED values (no-op updates must NOT mint
spurious versions; that is the classic SCD2 bug this operator's tests
pin).

Plan shape: ONE left join dim-current × changes on the business key does
change detection (null-safe attribute comparison — NULL-to-value and
value-to-NULL transitions are real changes), then the closed/new/kept
branches project from that single joined frame and union. The history
(non-current) rows never join at all — they are filter-passthrough. At
100 TB the dimension is the big side and the change batch the small one:
the join broadcasts the batch, so the dimension never shuffles (the same
batch-side-only-moves discipline as streaming/cdc.py's bucketed merge —
with the dim stored bucketed by key, even a big batch co-locates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    batch_id: int,
) -> DataFrame:
    """Apply ``changes`` (one row per key: the new attribute values) onto a
    type-2 dimension with columns
    ``(key_col, *tracked_cols, valid_from, valid_to, is_current)``
    (``valid_to`` NULL on current rows). Returns the updated dimension.
    """
    ch = changes.select(
        F.col(key_col), *[F.col(c).alias(f"__new_{c}") for c in tracked_cols]
    )
    # the one-row-per-key contract is load-bearing: a duplicate key would
    # fan out the join below, minting duplicate closed/new dimension rows
    # silently. Fail loudly instead (same guard style as grid_knn_join /
    # segment_words); the check aggregates only the small batch side.
    dup = ch.groupBy(key_col).count().where(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"scd2_apply: changes batch has multiple rows for key "
            f"{key_col}={dup[0][key_col]!r}; SCD2 requires one row per key "
            "per batch — pre-aggregate (e.g. keep the latest) before applying"
        )
    # null-safe branch split: every dim row lands in EXACTLY one branch.
    # Plain where(is_current)/where(~is_current) would silently drop rows
    # with NULL is_current from both (NULL is not true; NOT NULL is NULL)
    # — a merge operator must never lose rows. NULL-flagged rows pass
    # through untouched as history.
    cur = dim.where(F.col("is_current").eqNullSafe(F.lit(True)))
    hist = dim.where(~F.col("is_current").eqNullSafe(F.lit(True)))
    # __hit marks key presence in the batch even when every new value is
    # NULL (checking a __new_ column for null would misread those rows)
    joined = cur.join(
        F.broadcast(ch.withColumn("__hit", F.lit(True))), key_col, "left"
    )
    # a batch row is material only if some tracked attribute actually
    # differs (null-safe compare: NULL-to-value / value-to-NULL are real
    # changes, NULL-to-NULL is not) — no-op updates must not mint versions
    differs = F.lit(False)
    for c in tracked_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    material = F.coalesce(F.col("__hit"), F.lit(False)) & differs
    closed = joined.where(material).select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col("valid_from"),
        F.lit(batch_id).cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    newv = joined.where(material).select(
        F.col(key_col),
        *[F.col(f"__new_{c}").alias(c) for c in tracked_cols],
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    kept = joined.where(~material).select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        "valid_from",
        "valid_to",
        "is_current",
    )
    return hist.select(
        key_col, *tracked_cols, "valid_from", "valid_to", "is_current"
    ).unionByName(kept).unionByName(closed).unionByName(newv)
