"""Streaming correctness: every streaming operator must agree with its
batch twin on a finite input (Trigger.AvailableNow)."""

from __future__ import annotations

import uuid
from collections import Counter

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.sessionize import session_stats
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table
from data_wrangle_openstreetmaps_data_1_spark.streaming.ingest import read_events_stream
from data_wrangle_openstreetmaps_data_1_spark.streaming.rollup import run_hourly_rollup_once
from data_wrangle_openstreetmaps_data_1_spark.streaming.sessions import (
    run_sessionize_once,
    sessionize_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_ingest_schema(spark, sf_small):
    s = read_events_stream(spark, sf_small)
    assert s.isStreaming
    assert dict(s.dtypes)["ts"] == "timestamp"


def test_hourly_rollup_stream_equals_batch(spark, sf_small):
    streamed = run_hourly_rollup_once(spark, sf_small)
    batch = (
        load_table(spark, sf_small, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    cols = ["hour", "event_type", "cnt", "total_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_sessionize_stream_matches_batch_closed_sessions(spark, sf_small):
    """Every emitted streaming session must exist in the batch sessionization
    with identical (n_events, duration); per user, batch has exactly one more
    session than the stream emitted — the still-open tail session."""
    streamed = run_sessionize_once(spark, sf_small, gap_minutes=30.0).collect()
    batch = session_stats(
        load_table(spark, sf_small, "events"), "user_id", "ts", gap_minutes=30.0
    ).collect()

    bt = [(r["user_id"], r["n_events"], r["duration_ms"]) for r in batch]
    bt_count = Counter(bt)
    for r in streamed:
        t = (r["user_id"], r["n_events"], r["duration_ms"])
        assert bt_count[t] > 0, f"streamed session {t} not in batch result"
        bt_count[t] -= 1

    st_users = Counter(r["user_id"] for r in streamed)
    bt_users = Counter(t[0] for t in bt)
    for user, n_batch in bt_users.items():
        assert n_batch == st_users.get(user, 0) + 1, f"user {user}"


@pytest.fixture(scope="module")
def multi_file_events(spark, sf_small, tmp_path_factory):
    """The sf0.001 events split into 4 time-ordered files written
    sequentially (file source orders micro-batches by modification time), so
    AvailableNow + maxFilesPerTrigger=1 yields 4 in-order micro-batches."""
    out = str(tmp_path_factory.mktemp("events_multi"))
    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    )
    bounds = events.select(
        F.expr("percentile(ts_us, array(0.25, 0.5, 0.75))").alias("p")
    ).collect()[0]["p"]
    lo = float("-inf")
    for i, hi in enumerate([*bounds, float("inf")]):
        chunk = events.where((F.col("ts_us") > lo) & (F.col("ts_us") <= hi))
        chunk.coalesce(1).write.mode("append").parquet(out)
        lo = hi
    return out


def test_sessionize_multi_batch_state(spark, multi_file_events):
    """With maxFilesPerTrigger=1 the sessionizer sees 4 micro-batches;
    sessions spanning batch boundaries must still merge via the state store,
    and emitted sessions must match the batch result exactly."""
    raw = (
        spark.readStream.schema("event_id long, user_id long, event_type string, ts_us long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(multi_file_events)
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )
    sessions = sessionize_stream(raw, gap_minutes=30.0)
    sink = f"st_multi_{uuid.uuid4().hex[:10]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(sink).collect()

    batch_src = spark.read.parquet(multi_file_events).withColumn("ts", F.timestamp_micros("ts_us"))
    batch = session_stats(batch_src, "user_id", "ts", gap_minutes=30.0).collect()

    bt_count = Counter((r["user_id"], r["n_events"], r["duration_ms"]) for r in batch)
    assert len(streamed) > 0, "multi-batch stream emitted no closed sessions"
    for r in streamed:
        t = (r["user_id"], r["n_events"], r["duration_ms"])
        assert bt_count[t] > 0, f"streamed session {t} not in batch result"
        bt_count[t] -= 1


def test_gap_walk_merges_mutually_close_late_events():
    """Two cross-batch late events within gap of EACH OTHER must form one
    pre-session (as the batch twin would), not two singletons."""
    import pandas as pd

    from data_wrangle_openstreetmaps_data_1_spark.streaming.sessions import gap_walk

    closed, state = gap_walk(
        1,
        iter([pd.DataFrame({"ts_us": [45_000, 40_000, 115_000]})]),
        (100_000, 110_000, 2),
        gap_us=10_000,
    )
    # late chain [40k, 45k] merges into ONE closed session (its tail is
    # 55k before the open start — beyond gap); 115k extends the open one
    assert closed == [(1, 40_000, 45_000, 2, 5)]
    assert state == (100_000, 115_000, 3)


def test_gap_walk_splices_late_chain_into_open_session():
    import pandas as pd

    from data_wrangle_openstreetmaps_data_1_spark.streaming.sessions import gap_walk

    closed, state = gap_walk(
        1,
        iter([pd.DataFrame({"ts_us": [92_000, 95_000]})]),
        (100_000, 110_000, 2),
        gap_us=10_000,
    )
    # chain tail 95k is within gap of the open start -> extends it backwards
    assert closed == []
    assert state == (92_000, 110_000, 4)


def test_sessionize_tws_timers_close_idle_sessions(spark, multi_file_events):
    """transformWithStateInPandas upgrade: every emitted session must match
    a batch session exactly, AND the event-time timers must close MORE
    sessions than the applyInPandasWithState operator (which can only close
    a session when a later event for the same user arrives)."""
    # the TWS state-server protocol needs protobuf at runtime (not shipped
    # in this container); see streaming/sessions_tws.py module docstring
    pytest.importorskip("google.protobuf")
    from data_wrangle_openstreetmaps_data_1_spark.streaming.sessions_tws import (
        sessionize_stream_tws,
    )

    def run(build):
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts_us long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(multi_file_events)
            .withColumn("ts", F.timestamp_micros("ts_us"))
        )
        sink = f"st_tws_{uuid.uuid4().hex[:10]}"
        q = (
            build(raw)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(sink).collect()

    tws = run(lambda raw: sessionize_stream_tws(raw, gap_minutes=30.0))
    old = run(lambda raw: sessionize_stream(raw, gap_minutes=30.0))

    batch_src = spark.read.parquet(multi_file_events).withColumn("ts", F.timestamp_micros("ts_us"))
    batch = session_stats(batch_src, "user_id", "ts", gap_minutes=30.0).collect()
    bt_count = Counter((r["user_id"], r["n_events"], r["duration_ms"]) for r in batch)

    assert len(tws) > 0
    for r in tws:
        t = (r["user_id"], r["n_events"], r["duration_ms"])
        assert bt_count[t] > 0, f"TWS session {t} not in batch result"
        bt_count[t] -= 1
    # the timer path closes idle sessions the old API must keep open
    assert len(tws) > len(old), (len(tws), len(old))


def test_dedup_stream_equals_batch_distinct(spark, sf_small):
    from data_wrangle_openstreetmaps_data_1_spark.streaming.dedup import run_dedup_once

    streamed = run_dedup_once(spark, sf_small, ["user_id", "event_type"])
    batch = load_table(spark, sf_small, "events").select("user_id", "event_type").distinct()
    cols = ["user_id", "event_type"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_checkpoint_recovery_exactly_once(spark, sf_small, tmp_path):
    """File-source + file-sink + checkpoint: a restarted stream picks up only
    unseen input files — rows from the first run are not reprocessed."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    first = events.where("event_id % 2 = 0")
    second = events.where("event_id % 2 = 1")
    first.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("event_id long, user_id long, ts_us long").parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got1 = spark.read.parquet(out)
    assert got1.count() == first.count()

    second.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = spark.read.parquet(out)
    # exactly once: every event id appears once, totals add up
    assert got2.count() == first.count() + second.count()
    assert got2.select("event_id").distinct().count() == got2.count()


def test_stream_stream_join_equals_batch(spark, sf_small):
    from data_wrangle_openstreetmaps_data_1_spark.streaming.join import run_stream_join_once

    streamed = run_stream_join_once(spark, sf_small, window_minutes=10.0)
    e = load_table(spark, sf_small, "events")
    c = e.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    v = e.where("event_type = 'view'").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("view_ts"), F.col("value").alias("view_value")
    )
    batch = (
        c.join(v, (F.col("user_id") == F.col("vu"))
               & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 600 SECONDS"))
               & (F.col("view_ts") <= F.col("click_ts")))
        .select("click_id", "user_id",
                F.col("click_ts").cast("string").alias("click_ts"),
                F.col("view_ts").cast("string").alias("view_ts"),
                F.round("view_value", 2).alias("view_value"))
    )
    cols = ["click_id", "user_id", "click_ts", "view_ts", "view_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_streaming_hll_equals_batch_sketch(spark, sf_small):
    """The streaming sketch state is the same max-monoid as the batch
    build: final snapshot == batch hll_build, bounded at m=256 rows."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import HLL_M, hll_build
    from data_wrangle_openstreetmaps_data_1_spark.streaming.sketch import (
        hll_sketch_stream,
        run_hll_once,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.finite import run_available_now
    from data_wrangle_openstreetmaps_data_1_spark.streaming.ingest import read_events_stream

    def items_of(df):
        return df.select(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"), F.to_date("ts").cast("string")
            ).alias("item")
        )

    streamed = run_available_now(
        hll_sketch_stream(items_of(read_events_stream(spark, sf_small)), "item"), "complete"
    )
    batch = hll_build(items_of(load_table(spark, sf_small, "events")), "item")
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    assert s_rows == b_rows
    assert 0 < len(s_rows) <= HLL_M  # the bounded-state guarantee

    est = run_hll_once(spark, sf_small).collect()[0]
    assert est["est_distinct"] > 0


def test_memory_snapshot_guard_rejects_large_results(spark, sf_small):
    """The memory-sink runner is driver-sided by design; a large-result
    stream must fail LOUDLY with a pointer to the parquet runner, not OOM
    the driver. Also: the temp view must not leak when the guard fires."""
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.streaming.finite import run_available_now
    from data_wrangle_openstreetmaps_data_1_spark.streaming.ingest import read_events_stream

    raw = read_events_stream(spark, sf_small).select("event_id", "user_id")
    with pytest.raises(ValueError, match="run_available_now_to_parquet"):
        run_available_now(raw, "append", max_rows=10)
    assert not [t.name for t in spark.catalog.listTables() if t.name.startswith("finite_")]
