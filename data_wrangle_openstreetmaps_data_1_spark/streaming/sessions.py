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


def _sessionize_group(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = None
        n = 0

    closed: list[tuple[int, int, int, int, int]] = []
    # Concatenate ALL Arrow chunks before sorting: a group larger than
    # arrow.maxRecordsPerBatch arrives as multiple chunks, and sorting each
    # chunk independently would let chunk-boundary out-of-order events
    # corrupt session boundaries.
    chunks = [pdf["ts_us"] for pdf in pdf_iter]
    if chunks:
        all_ts = pd.concat(chunks).sort_values() if len(chunks) > 1 else chunks[0].sort_values()
        for ts_us in all_ts:
            ts_us = int(ts_us)
            if last_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us < start_us:
                # Cross-micro-batch out-of-order: an event older than the open
                # session's start (each batch is sorted, so only carried-over
                # state can be ahead of it). Within gap of the start it extends
                # the session backwards; further out it is a standalone session
                # that wholly precedes the open one and can never merge with
                # anything later — emit it closed immediately.
                if start_us - ts_us <= gap_us:
                    start_us = ts_us
                    n += 1
                else:
                    closed.append((user_id, ts_us, ts_us, 1, 0))
            elif ts_us - last_us > gap_us:
                closed.append(
                    (user_id, start_us, last_us, n, (last_us - start_us) // 1000)
                )
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us = max(last_us, ts_us)
                n += 1

    state.update((start_us, last_us, n))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "duration_ms"],
        )


def sessionize_stream(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Streaming gap-sessionization: emits each session once, when closed."""
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
