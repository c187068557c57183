"""Partition-layout helpers.

``spread`` exists because parallelism is bounded by input splits: a parquet
file is split at row-group granularity, so a table written as few large row
groups scans as few tasks no matter how many cores exist (locally the driver's
``documents.parquet`` is ONE row group -> one task). CPU-bound per-row stages
(shingling, per-shingle hashing, vector math) then run effectively
single-threaded.

At 100 TB the input arrives as many thousands of splits and the conditional
below is a no-op — the repartition (a full shuffle of the payload) is applied
only when the scan's own parallelism is deficient, which is exactly the local
/ small-file case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot left key over ``salt``
    sub-keys and replicate the (small) right side once per sub-key.

    The reference's user distribution is the motivating case — one user owns
    ~35% of all edits (reference readme.md:184-192); a plain shuffle join on
    such a key puts a third of the data in one task. AQE's skew-join split
    handles sort-merge joins after the fact; salting fixes the layout up
    front and also covers aggregations-after-join. Right side grows by
    ``salt``x — use only when it is broadcast-small-ish.

    Only inner/left/left_semi/left_anti types are accepted: under right or
    full outer joins every unmatched right row would survive once per salt
    replica (``salt``x duplicates).
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join does not support how={how!r} (right/full outer would duplicate unmatched right rows)")
    from pyspark.sql import functions as F

    sl = left.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt))
    )
    sr = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return sl.join(sr, [*on, "__salt"], how).drop("__salt")


def explode_nonempty(df: DataFrame, keep: list, arr: str, alias: str) -> DataFrame:
    """``explode`` of a NAMED computed array column, without the
    InferFiltersFromGenerate trap.

    ``F.explode(attr)`` makes the optimizer infer ``size(attr) > 0 AND
    isnotnull(attr)`` and push that filter below projections, exchanges,
    and unions — substituting the attribute's full defining expression into
    the filter. For a CPU-heavy array builder (shingling, minhash band
    keys) that re-evaluates the whole subtree once per input row, AND runs
    it below any ``spread`` repartition, i.e. at the scan's own (possibly
    single-task) parallelism. Measured 8x slower on the sf0.1 shingle
    pipeline. ``explode_outer`` infers no such filter; dropping the null
    rows afterwards is equivalent to inner explode for arrays with no null
    ELEMENTS (ours: concat_ws/hash outputs are never null).

    ``keep``: columns (names or Columns) carried alongside the exploded
    ``alias``.
    """
    from pyspark.sql import functions as F

    return df.select(*keep, F.explode_outer(arr).alias(alias)).where(
        F.col(alias).isNotNull()
    )


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to ``min_partitions`` (default: the cluster's
    defaultParallelism) ahead of a CPU-bound per-row stage.

    Unconditional by design: checking the scan's actual parallelism
    (``df.rdd.getNumPartitions()``) costs a full extra physical-plan compile
    per query (~1s of driver time), while the exchange itself moves each row
    once and is dwarfed by the downstream per-row work this helper guards
    (per-shingle hashing, vector math). Only use ``spread`` where that
    trade holds; plain scans/aggregations should rely on input splits.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(min_partitions or sc.defaultParallelism)
