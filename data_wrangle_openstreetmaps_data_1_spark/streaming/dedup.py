"""Streaming deduplication — the streaming twin of exact dedup
(operators/dedup.py), for at-least-once upstream sources.

``dropDuplicatesWithinWatermark`` keys the state store on the dedup columns
and expires entries once the watermark passes them — bounded state, unlike
plain ``dropDuplicates`` on a stream which retains every key forever. At
100 TB/day that difference is the whole game: state is O(keys within the
watermark horizon), not O(all keys ever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .finite import run_available_now
from .ingest import read_events_stream


def dedup_stream(events: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """First-occurrence-wins dedup on ``keys`` within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_dedup_once(
    spark: SparkSession, sf_dir: str, keys: list[str], watermark: str = "36500 days"
) -> DataFrame:
    """Finite-input run: the surviving key set must equal the batch DISTINCT
    of the same keys (which the oracle checks). That equality is only
    guaranteed while dedup state lives as long as the input spans — hence
    the effectively-unbounded default watermark here: with a short one, a
    key recurring later than the horizon would legitimately re-emit once
    the input splits into multiple micro-batches, and the DISTINCT oracle
    would be wrong. Production streams pick a real horizon and accept that
    contract. Only the keys are returned — WHICH duplicate row survives
    depends on arrival order and is not part of the operator's contract."""
    deduped = dedup_stream(read_events_stream(spark, sf_dir), keys, watermark=watermark)
    return run_available_now(deduped, "append").select(*[F.col(k) for k in keys])
