"""Testdata-format canary: the engine must ingest whatever physical ``ts``
type the driver's CURRENT events.parquet actually carries, identically on
the batch and streaming paths, and independent of session timezone.

Round 4 regression this guards against: the driver changed events.ts from
TIMESTAMP(NANOS)-as-long to plain ``timestamp[us]`` NTZ and five queries
broke silently (VERDICT.md round 4, "What's wrong").
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.timeutil import (
    canonical_event_ts,
    normalize_event_ts,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table
from data_wrangle_openstreetmaps_data_1_spark.streaming.ingest import read_events_stream

SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_batch_ingest_handles_observed_physical_type(spark):
    """Whatever type the current testdata carries, load_table yields TIMESTAMP
    and the instants match DuckDB's epoch_us on the same file."""
    duckdb = pytest.importorskip("duckdb")
    df = load_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        r["event_id"]: r["us"]
        for r in df.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .limit(50)
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"select event_id, epoch_us(ts) from '{SF}/events.parquet' "
            "order by event_id limit 50"
        ).fetchall()
    )
    assert got == want


def test_stream_ingest_matches_batch_micros(spark):
    """Batch and stream paths must produce identical micros for the same file."""
    sink = f"canary_{uuid.uuid4().hex[:10]}"
    q = (
        read_events_stream(spark, SF)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {r["event_id"]: r["us"] for r in spark.table(sink).collect()}
    batch = {
        r["event_id"]: r["us"]
        for r in load_table(spark, SF, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_ntz_normalization_is_session_timezone_independent(spark):
    """The NTZ branch must not shift instants when the session tz isn't UTC
    (the driver supplies its own, untuned SparkSession)."""
    from pyspark.sql.types import TimestampNTZType

    src = spark.createDataFrame(
        [("2024-01-01 00:00:00",)], "wall string"
    ).select(F.col("wall").cast(TimestampNTZType()).alias("ts"))
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = normalize_event_ts(src).select(F.unix_micros("ts").alias("us")).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    utc = normalize_event_ts(src).select(F.unix_micros("ts").alias("us")).collect()
    # 2024-01-01 00:00:00 UTC
    assert shifted[0]["us"] == utc[0]["us"] == 1704067200000000


def test_legacy_nanos_long_form_still_supported(spark):
    """The old TIMESTAMP(NANOS)-as-long form keeps working (floor-div to us)."""
    df = spark.createDataFrame([(1704067200123456789,)], "ts long")
    out = normalize_event_ts(df).select(F.unix_micros("ts").alias("us")).collect()
    assert out[0]["us"] == 1704067200123456


def test_events_is_single_file():
    """The st_sessionize / st_topk oracles are exact only under single-
    micro-batch input (see COVERAGE.md §2.11 determinism note): the events
    table must be ONE parquet file, not a multi-part directory."""
    path = os.path.join(SF, "events.parquet")
    assert os.path.isfile(path), (
        "events.parquet became a directory/multi-file layout — the "
        "single-micro-batch determinism assumption behind the st_sessionize "
        "and st_topk oracles no longer holds; revisit streaming_queries.py"
    )


def test_unsupported_type_fails_loudly():
    from pyspark.sql.types import StringType

    with pytest.raises(TypeError):
        canonical_event_ts(StringType(), "ts")
