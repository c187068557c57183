"""Round-16 streaming late-data contracts: the WATERMARKED sessionizer and
transition counter (streaming/sessions.py:sessionize_stream_watermarked,
streaming/transitions.py:transition_stream_watermarked).

What is pinned:

- **in-order equivalence**: on a time-ordered multi-batch replay with no
  late rows, the watermarked sessionizer's 'session' rows are a SUPERSET
  of the unwatermarked stream's emissions (timer eviction additionally
  closes idle tails) and every emitted row appears in the batch
  ``session_stats`` result; the watermarked transition matrix equals the
  unbounded form exactly (no 'LATE' rows, no TTL evictions at a long TTL).
- **late routing**: an event older than the watermark lands in the side
  output (kind='late' / prev_type='LATE') and leaves the already-emitted
  sessions/chains untouched — the r15 "documented approximation" is now a
  stated, observable guarantee.
- **timer eviction**: a session idle past watermark+gap is emitted by
  TIMER with exactly the rows a later in-order event would have produced,
  and its state is gone (the bounded-state requirement at 100 TB).
"""

from __future__ import annotations

import uuid
from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.sessionize import session_stats
from data_wrangle_openstreetmaps_data_1_spark.streaming.sessions import (
    sessionize_stream,
    sessionize_stream_watermarked,
)
from data_wrangle_openstreetmaps_data_1_spark.streaming.transitions import (
    transition_stream,
    transition_stream_watermarked,
)

SCHEMA = "event_id long, user_id long, event_type string, ts_us long, value double"


def _write_files(spark, out, batches):
    """Write each batch (list of (event_id, user_id, event_type, ts_us))
    as one parquet file, sequentially — the file source then replays them
    as in-order micro-batches under maxFilesPerTrigger=1."""
    for rows in batches:
        spark.createDataFrame(
            [(e, u, t, ts, 0.0) for (e, u, t, ts) in rows], SCHEMA
        ).coalesce(1).write.mode("append").parquet(out)


def _drain(spark, df):
    sink = f"wm_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).collect()


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )


MIN = 60 * 1_000_000  # one minute in us


def test_watermarked_sessionizer_inorder_superset_and_batch_subset(
    spark, tmp_path
):
    """In-order replay: no late rows; 'session' rows ⊇ the unwatermarked
    emissions and ⊆ the batch session set."""
    t0 = 1_700_000_000_000_000
    batches = [
        [(1, 1, "a", t0), (2, 1, "a", t0 + MIN), (3, 2, "a", t0 + 2 * MIN)],
        [(4, 1, "a", t0 + 90 * MIN), (5, 2, "a", t0 + 95 * MIN)],
        [(6, 1, "a", t0 + 500 * MIN), (7, 2, "a", t0 + 505 * MIN)],
    ]
    out = str(tmp_path / "ev")
    _write_files(spark, out, batches)
    wm = _drain(
        spark, sessionize_stream_watermarked(_stream(spark, out), 30.0, "10 minutes")
    )
    assert all(r["kind"] == "session" for r in wm), "in-order replay made late rows"
    plain = _drain(spark, sessionize_stream(_stream(spark, out), 30.0))
    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"]
    )
    assert Counter(key(r) for r in plain) <= Counter(key(r) for r in wm)
    batch_src = spark.read.parquet(out).withColumn("ts", F.timestamp_micros("ts_us"))
    batch = {
        (r["user_id"], r["n_events"], r["duration_ms"])
        for r in session_stats(batch_src, "user_id", "ts", gap_minutes=30.0).collect()
    }
    for r in wm:
        assert (r["user_id"], r["n_events"], r["duration_ms"]) in batch


def test_watermarked_sessionizer_timer_evicts_idle_session(spark, tmp_path):
    """User 1 goes quiet; user 2's much-later events advance the watermark
    past user 1's last event + gap -> user 1's session is emitted by TIMER
    (the unwatermarked form would hold it open forever)."""
    t0 = 1_700_000_000_000_000
    batches = [
        [(1, 1, "a", t0), (2, 1, "a", t0 + MIN)],
        [(3, 2, "a", t0 + 1000 * MIN)],
        [(4, 2, "a", t0 + 2000 * MIN)],
    ]
    out = str(tmp_path / "ev")
    _write_files(spark, out, batches)
    wm = _drain(
        spark, sessionize_stream_watermarked(_stream(spark, out), 30.0, "10 minutes")
    )
    u1 = [r for r in wm if r["user_id"] == 1]
    assert len(u1) == 1
    assert (u1[0]["session_start_us"], u1[0]["session_end_us"], u1[0]["n_events"]) == (
        t0, t0 + MIN, 2
    )
    plain = _drain(spark, sessionize_stream(_stream(spark, out), 30.0))
    assert [r for r in plain if r["user_id"] == 1] == []  # held open forever


def test_watermarked_sessionizer_routes_late_rows_to_side_output(spark, tmp_path):
    """A row older than the watermark (advanced by another user's far-
    future event) lands in the side output and does not perturb sessions."""
    t0 = 1_700_000_000_000_000
    late_ts = t0 + 2 * MIN
    with_late = [
        [(1, 1, "a", t0), (2, 1, "a", t0 + MIN), (3, 2, "a", t0 + 5000 * MIN)],
        [(4, 2, "a", t0 + 6000 * MIN), (5, 1, "a", late_ts)],  # < wm by far
    ]
    without_late = [with_late[0], [with_late[1][0]]]
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_files(spark, out_a, with_late)
    _write_files(spark, out_b, without_late)
    wm_a = _drain(
        spark, sessionize_stream_watermarked(_stream(spark, out_a), 30.0, "10 minutes")
    )
    wm_b = _drain(
        spark, sessionize_stream_watermarked(_stream(spark, out_b), 30.0, "10 minutes")
    )
    late = [r for r in wm_a if r["kind"] == "late"]
    assert [(r["user_id"], r["session_start_us"]) for r in late] == [(1, late_ts)]
    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"]
    )
    assert Counter(key(r) for r in wm_a if r["kind"] == "session") == Counter(
        key(r) for r in wm_b if r["kind"] == "session"
    )


def test_watermarked_transitions_inorder_equals_unbounded(spark, tmp_path):
    t0 = 1_700_000_000_000_000
    batches = [
        [(1, 1, "a", t0), (2, 1, "b", t0 + MIN), (3, 2, "a", t0 + 2 * MIN)],
        [(4, 1, "c", t0 + 3 * MIN), (5, 2, "b", t0 + 4 * MIN)],
    ]
    out = str(tmp_path / "ev")
    _write_files(spark, out, batches)

    def matrix(df):
        rows = _drain(spark, df)
        agg: Counter = Counter()
        for r in rows:
            agg[(r["prev_type"], r["next_type"])] += r["n"]
        return agg

    wm = matrix(
        transition_stream_watermarked(
            _stream(spark, out), delay="10 minutes", idle_ttl_minutes=100000.0
        )
    )
    plain = matrix(transition_stream(_stream(spark, out)))
    assert wm == plain
    assert not any(p == "LATE" for p, _ in wm)


def test_watermarked_transitions_late_side_output_and_ttl_eviction(spark, tmp_path):
    """A late row becomes a ('LATE', type) count; a user idle past the TTL
    is evicted, so their next event chains from START, not the stale
    frontier."""
    t0 = 1_700_000_000_000_000
    batches = [
        [(1, 1, "a", t0), (2, 2, "x", t0 + 5000 * MIN)],
        # user 1's event is late (wm ~ t0+4990min); user 2 advances time
        [(3, 1, "b", t0 + MIN), (4, 2, "y", t0 + 9000 * MIN)],
        # user 3 advances the watermark past y + ttl; the timer fires in
        # the NEXT batch (timers check the previous batch's watermark) and
        # only for groups WITHOUT data in it — so the eviction lands in
        # the second user-3 batch, and z must arrive after that (exactly
        # how a live stream behaves)
        [(6, 3, "w", t0 + 15000 * MIN)],
        [(7, 3, "w", t0 + 16000 * MIN)],
        # user 2's frontier was evicted at ttl=60min; z chains from START
        [(5, 2, "z", t0 + 20000 * MIN)],
    ]
    out = str(tmp_path / "ev")
    _write_files(spark, out, batches)
    rows = _drain(
        spark,
        transition_stream_watermarked(
            _stream(spark, out), delay="10 minutes", idle_ttl_minutes=60.0
        ),
    )
    agg: Counter = Counter()
    for r in rows:
        agg[(r["prev_type"], r["next_type"])] += r["n"]
    assert agg[("LATE", "b")] == 1  # routed, not chained
    assert agg[("START", "z")] == 1  # frontier evicted between y and z
    assert agg[("y", "z")] == 0
    assert agg[("START", "x")] == 1 and agg[("x", "y")] == 1


def test_watermarked_sessionizer_on_real_events_multibatch(
    spark, sf_small, tmp_path
):
    """The batch-equivalence oracle on REAL data: sf0.001 events split
    into 4 time-ordered files (in-order replay, so zero late rows), the
    watermarked stream's sessions ⊆ the batch sessionizer's and ⊇ the
    unwatermarked stream's emissions."""
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"),
        F.lit(0.0).alias("value"),
    )
    bounds = events.select(
        F.expr("percentile(ts_us, array(0.25, 0.5, 0.75))").alias("p")
    ).collect()[0]["p"]
    out = str(tmp_path / "ev")
    lo = float("-inf")
    for hi in [*bounds, float("inf")]:
        events.where((F.col("ts_us") > lo) & (F.col("ts_us") <= hi)).coalesce(
            1
        ).write.mode("append").parquet(out)
        lo = hi
    wm = _drain(
        spark, sessionize_stream_watermarked(_stream(spark, out), 30.0, "30 minutes")
    )
    assert wm and all(r["kind"] == "session" for r in wm)
    plain = _drain(spark, sessionize_stream(_stream(spark, out), 30.0))
    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"]
    )
    assert Counter(key(r) for r in plain) <= Counter(key(r) for r in wm)
    batch_src = spark.read.parquet(out).withColumn("ts", F.timestamp_micros("ts_us"))
    batch = Counter(
        (r["user_id"], r["n_events"], r["duration_ms"])
        for r in session_stats(batch_src, "user_id", "ts", gap_minutes=30.0).collect()
    )
    got = Counter((r["user_id"], r["n_events"], r["duration_ms"]) for r in wm)
    assert got <= batch
