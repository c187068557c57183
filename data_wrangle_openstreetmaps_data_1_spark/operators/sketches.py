"""Count-min sketch over a distributed corpus — the streaming/mergeable
frequency summary a training pipeline uses when the exact term table is too
big to keep (heavy-hitter tracking, frequency-capped dedup, mixture
telemetry).

Built entirely from the portable md5 hash family (functions/hashing.py), so
the sketch is BIT-IDENTICAL across engines and the registered query is
fully value-checked by the DuckDB oracle — unlike approx_count_distinct /
approx_percentile whose sketches are engine-private.

Scale design: the sketch table is O(d x w) rows no matter the corpus size;
building it is one groupBy over hashed items, and merging per-partition or
per-day sketches is the SAME groupBy-sum (count-min is an associative
monoid), so incremental maintenance costs one small shuffle. Point queries
join a broadcast of the (tiny) sketch. Estimates overcount only:
est >= true always, with err <= 2N/w at probability 1 - (1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _bucket(item_col, i: int, w: int, salt: str):
    # salt layout shared verbatim with the oracle SQL: item || ':<salt>' || i
    return F.pmod(
        portable_hash64(F.concat(item_col, F.lit(f":{salt}"), F.lit(str(i)))), F.lit(w)
    )


def countmin_build(
    counts: DataFrame, item_col: str, count_col: str, d: int = 4, w: int = 64, salt: str = "cm"
) -> DataFrame:
    """(sketch_row, bucket, bc) from an exact (item, count) table.

    Each item lands in one bucket per sketch row; bucket counts sum item
    counts. d x w rows out, regardless of input size.
    """
    rows = counts.select(
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
        F.col(item_col).alias("item"),
        F.col(count_col).alias("c"),
    )
    bucketed = rows.withColumn(
        "bucket",
        F.pmod(
            portable_hash64(F.concat(F.col("item"), F.lit(f":{salt}"), F.col("i").cast("string"))),
            F.lit(w),
        ),
    )
    return bucketed.groupBy("i", "bucket").agg(F.sum("c").alias("bc"))


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, d: int = 4, w: int = 64, salt: str = "cm"
) -> DataFrame:
    """Point-query the sketch: est(item) = min over rows of that row's
    bucket count. ``sketch`` is broadcast (d x w rows); probes never
    shuffle."""
    expanded = probes.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i")
    ).withColumn(
        "bucket",
        F.pmod(
            portable_hash64(
                F.concat(F.col(item_col), F.lit(f":{salt}"), F.col("i").cast("string"))
            ),
            F.lit(w),
        ),
    )
    joined = expanded.join(F.broadcast(sketch), ["i", "bucket"])
    group_cols = [c for c in probes.columns]
    return joined.groupBy(*group_cols).agg(F.min("bc").alias("est_cnt"))
