"""Streaming HyperLogLog: distinct counting over a stream with O(m) state.

``dropDuplicates`` on a stream keeps one state row PER KEY — unbounded
without a watermark, and still proportional to the distinct count with
one. The HLL sketch inverts that: the streaming aggregation state is at
most m=256 (bucket, rho) rows NO MATTER how many distinct items flow by,
because max() per bucket is exactly the HLL merge (a max-monoid is
trivially streaming-legal — no watermark required, nothing ever expires).
This is the standing-telemetry shape at 100 TB/day: distinct users/docs
to date, readable every micro-batch, state the size of a postcard.

The estimate itself is sink-side arithmetic over the 256-row sketch
(portable md5 hash family + exact-dyadic estimator — see
operators/sketches.py for why the double math is engine-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..operators.sketches import HLL_M, HLL_P, HLL_RHO_BITS, hll_estimate
from .finite import run_available_now
from .ingest import read_events_stream


def hll_sketch_stream(items: DataFrame, item_col: str, salt: str = "hll") -> DataFrame:
    """Streaming (bucket, rho) sketch: a complete/update-mode groupBy-max
    with state bounded by m=256 rows. Identical values to the batch
    ``hll_build`` on the same finite input."""
    h = portable_hash64(F.concat(F.col(item_col), F.lit(f":{salt}")))
    mask = (1 << HLL_RHO_BITS) - 1
    b = items.select(
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.shiftright(h, HLL_P).bitwiseAND(F.lit(mask)).alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(HLL_RHO_BITS + 1)).otherwise(
        F.length(F.bin(F.col("rem").bitwiseAND(-F.col("rem"))))
    )
    return b.select("bucket", rho.alias("rho")).groupBy("bucket").agg(F.max("rho").alias("rho"))


def run_hll_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through the sketch (AvailableNow), then
    estimate distinct user-days from the final 256-row snapshot."""
    ev = read_events_stream(spark, sf_dir)
    items = ev.select(
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.to_date("ts").cast("string")
        ).alias("item")
    )
    sketch = run_available_now(hll_sketch_stream(items, "item"), "complete")
    return hll_estimate(sketch)
