"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the streaming twin of ``session_stats``
(operators/sessionize.py / ``sessionize_gap`` in plans/analytics.py).

Per user, events accumulate into an open session held in the state store;
a session closes (and is emitted) when a later event arrives more than
``gap`` after the session's last event. Sessions still open when the input
ends stay in state — only *closed* sessions are ever emitted, so every
emitted row is final (exactly-once semantics downstream need no retraction).

Scale notes: state is shuffled by user_id (keyed state store, RocksDB on a
real cluster); per-batch work is one Arrow exchange per group batch. The
Pandas function touches only each group's new events plus a 3-field state
tuple — state size is O(open sessions), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from .finite import run_available_now
from .ingest import read_events_stream

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def gap_walk(
    user_id: int,
    pdf_iter: Iterator[pd.DataFrame],
    open_state: tuple[int, int, int] | None,
    gap_us: int,
) -> tuple[list[tuple[int, int, int, int, int]], tuple[int, int, int] | None]:
    """Pure sessionization core shared by BOTH stateful APIs
    (applyInPandasWithState here, transformWithStateInPandas in
    sessions_tws.py): consume this batch's events, return (closed session
    rows, new open-session state).

    Concatenates ALL Arrow chunks before sorting: a group larger than
    arrow.maxRecordsPerBatch arrives as multiple chunks, and sorting each
    chunk independently would let chunk-boundary out-of-order events
    corrupt session boundaries.

    Cross-micro-batch out-of-order events (older than the open session's
    start — each batch arrives sorted, so only carried-over state can be
    ahead of them) run through the SAME gap walk as a pre-session chain:
    mutually-close late events merge with each other exactly as the batch
    twin would, then the chain's tail either splices into the open session
    (within gap of its start, extending it backwards) or closes. Already-
    emitted sessions stay final: a still-later batch bringing an event for
    one of them is the inherent no-watermark approximation, documented on
    sessionize_stream.
    """
    if open_state is not None:
        start_us, last_us, n = open_state
    else:
        start_us = last_us = None
        n = 0

    closed: list[tuple[int, int, int, int, int]] = []

    def close(st: int, en: int, cnt: int) -> None:
        closed.append((user_id, st, en, cnt, (en - st) // 1000))

    chunks = [pdf["ts_us"] for pdf in pdf_iter]
    if chunks:
        all_ts = pd.concat(chunks).sort_values() if len(chunks) > 1 else chunks[0].sort_values()
        pre_start = pre_last = None
        pre_n = 0

        def splice_pre() -> None:
            nonlocal pre_start, pre_last, pre_n, start_us, n
            if pre_last is None:
                return
            if start_us - pre_last <= gap_us:
                start_us = pre_start
                n += pre_n
            else:
                close(pre_start, pre_last, pre_n)
            pre_start = pre_last = None
            pre_n = 0

        for ts_us in all_ts:
            ts_us = int(ts_us)
            if last_us is not None and ts_us < start_us:
                if pre_last is None:
                    pre_start, pre_last, pre_n = ts_us, ts_us, 1
                elif ts_us - pre_last > gap_us:
                    close(pre_start, pre_last, pre_n)
                    pre_start, pre_last, pre_n = ts_us, ts_us, 1
                else:
                    pre_last = ts_us
                    pre_n += 1
                continue
            splice_pre()
            if last_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap_us:
                close(start_us, last_us, n)
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us = max(last_us, ts_us)
                n += 1
        splice_pre()

    new_state = None if last_us is None else (start_us, last_us, n)
    return closed, new_state


def _sessionize_group(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed, new_state = gap_walk(
        user_id, pdf_iter, tuple(state.get) if state.exists else None, gap_us
    )
    if new_state is not None:
        state.update(new_state)
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "duration_ms"],
        )


def sessionize_stream(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Streaming gap-sessionization: emits each session once, when closed.

    Late-data contract (the no-watermark approximation): cross-batch
    out-of-order events older than the OPEN session's start are handled
    exactly — they run through the same gap walk as a pre-session chain and
    either splice into the open session or close on their own (gap_walk
    above). What cannot be handled is an event belonging to a session that
    was already emitted: emitted rows are final (append mode), so such an
    event starts a fresh session instead of retracting the old one. The
    standard alternative is to bound lateness explicitly —
    ``events.withWatermark("ts", "<delay>")`` ahead of the groupBy, which
    DROPS events older than the watermark and makes the approximation a
    stated guarantee instead of a silent one; we keep the unbounded form
    here because the harness replays finite in-order files where the case
    cannot arise (tests/test_streaming.py pins the multi-batch late-chain
    behavior), and the TWS variant (sessions_tws.py) closes idle sessions
    with event-time timers, which is the watermark-native design.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prepared = events.select(
        "user_id", (F.unix_micros(F.col("ts"))).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        lambda key, it, state: _sessionize_group(key, it, state, gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_once(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: float = 30.0,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the streaming sessionizer over all currently-available input and
    return the emitted (closed) sessions, formatted like ``sessionize_gap``'s
    output minus the still-open tail sessions."""
    events = read_events_stream(spark, sf_dir, max_files_per_trigger)
    sessions = sessionize_stream(events, gap_minutes)
    return run_available_now(sessions, "append").select(
        "user_id",
        F.timestamp_micros(F.col("session_start_us")).cast("string").alias("session_start"),
        F.timestamp_micros(F.col("session_end_us")).cast("string").alias("session_end"),
        "n_events",
        "duration_ms",
    )
