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


def test_all_tables_load_with_expected_columns(spark):
    """Whole-testdata canary: every table the registry depends on must load
    through load_table with its required columns in a workable type class.
    Round 4 was lost to a silent physical-type change in ONE column; this
    names the table and column on the next drift instead of surfacing as
    scattered driver reds."""
    from pyspark.sql.types import (
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    numeric = (LongType, IntegerType, DoubleType, FloatType)
    timeish = (TimestampType, TimestampNTZType, DateType)
    required = {
        "region": {"r_regionkey": numeric, "r_name": (StringType,)},
        "nation": {"n_nationkey": numeric, "n_name": (StringType,), "n_regionkey": numeric},
        "customer": {
            "c_custkey": numeric, "c_name": (StringType,),
            "c_nationkey": numeric, "c_acctbal": (DoubleType,),
            "c_mktsegment": (StringType,),
        },
        "supplier": {"s_suppkey": numeric, "s_nationkey": numeric},
        "part": {"p_partkey": numeric, "p_brand": (StringType,), "p_type": (StringType,), "p_size": numeric},
        "orders": {
            "o_orderkey": numeric, "o_custkey": numeric,
            "o_orderstatus": (StringType,), "o_totalprice": (DoubleType,),
            "o_orderdate": timeish, "o_orderpriority": (StringType,),
        },
        "lineitem": {
            "l_orderkey": numeric, "l_quantity": (DoubleType,),
            "l_extendedprice": (DoubleType,), "l_discount": (DoubleType,),
            "l_tax": (DoubleType,), "l_shipdate": timeish + (StringType,),
        },
        "events": {
            "event_id": numeric, "user_id": numeric,
            "event_type": (StringType,), "value": (DoubleType,),
            "props": (StringType,),
            # post-normalization contract: exactly TIMESTAMP
            "ts": (TimestampType,),
        },
        "documents": {"doc_id": numeric, "text": (StringType,)},
        "embeddings": {"vec_id": numeric},
    }
    problems = []
    for table, cols in required.items():
        df = load_table(spark, "/root/testdata/sf0.01", table)
        have = {f.name: f.dataType for f in df.schema.fields}
        for col, classes in cols.items():
            if col not in have:
                problems.append(f"{table}.{col}: MISSING (have {sorted(have)})")
            elif not isinstance(have[col], classes):
                problems.append(f"{table}.{col}: {have[col]} not in {[c.__name__ for c in classes]}")
    assert not problems, "\n".join(problems)
