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
    StringType,
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

# watermarked variant: sessions plus the LATE side output, as a tagged
# union (kind = 'session' | 'late') — the Beam/Flink side-output pattern
# flattened into one append stream; split downstream with where(kind=...)
TAGGED_SESSION_SCHEMA = StructType(
    [StructField("kind", StringType())] + list(SESSION_SCHEMA.fields)
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


_TAG_COLS = [
    "kind", "user_id", "session_start_us", "session_end_us", "n_events", "duration_ms",
]


def _sessionize_group_wm(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    """Watermarked sessionizer core: event-time timer EVICTION (a session
    whose end + gap the watermark has passed can never be extended — no
    in-contract event can reach it — so it closes and its state is
    removed) and an explicit LATE side output (rows older than the
    operator-visible watermark are excluded from sessionization and
    emitted tagged 'late', one row per event, start == end == ts). The
    engine's own late filtering is deliberately bypassed — the event-time
    column is projected away before the stateful operator — because a
    silently dropped row cannot be reconciled downstream; a side-output
    row can."""
    (user_id,) = key
    if state.hasTimedOut:
        st, en, n = tuple(state.get)
        state.remove()
        yield pd.DataFrame(
            [("session", user_id, st, en, n, (en - st) // 1000)], columns=_TAG_COLS
        )
        return
    wm_ms = state.getCurrentWatermarkMs()
    chunks = [pdf[["ts_us"]] for pdf in pdf_iter]
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    if wm_ms > 0:
        late_mask = pdf["ts_us"] < wm_ms * 1000
        late, ok = pdf[late_mask], pdf[~late_mask]
    else:
        late, ok = pdf.iloc[0:0], pdf
    closed, new_state = gap_walk(
        user_id, iter([ok]), tuple(state.get) if state.exists else None, gap_us
    )
    rows = [("late", user_id, int(t), int(t), 1, 0) for t in late["ts_us"]]
    rows += [("session",) + c for c in closed]
    if new_state is not None:
        state.update(new_state)
        # fire once the watermark passes last_event + gap; clamp above the
        # current watermark (Spark rejects a timer at or before it — can
        # happen when restored state is already past-horizon, in which
        # case the next batch's timer fires immediately, which is right)
        gap_ms = gap_us // 1000
        state.setTimeoutTimestamp(max(new_state[1] // 1000 + gap_ms + 1, wm_ms + 1))
    if rows:
        yield pd.DataFrame(rows, columns=_TAG_COLS)


def sessionize_stream_watermarked(
    events: DataFrame, gap_minutes: float = 30.0, delay: str = "1 hour"
) -> DataFrame:
    """Gap sessionization with a REAL late-data bound (r15 verdict task 6):
    ``withWatermark(ts, delay)`` + event-time timers make the
    no-watermark form's documented approximation a stated guarantee —

    - **state eviction**: an open session is emitted (closed) by TIMER
      once the watermark passes its last event + gap: no event within the
      lateness bound can extend it, so the row is final and the state
      slot is freed. State is O(sessions open within the lateness
      horizon), bounded at any corpus size — the 100 TB requirement the
      unbounded form lacks.
    - **late side output**: events older than the watermark are NOT
      silently dropped (the engine default) — they come back tagged
      ``kind='late'`` for downstream reconciliation; sessions come back
      ``kind='session'``.

    Batch equivalence on in-order replays holds: rows are never late
    (each batch's min ts >= the previous max - delay by orderedness), and
    timer-evicted sessions are exactly those a later in-order event would
    have closed (any such event is > watermark > last + gap). Pinned in
    tests/test_streaming_r16.py alongside the late-routing semantics.

    Output: TAGGED_SESSION_SCHEMA, append mode.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    # the watermarked ts column must survive into the operator input
    # (EventTimeTimeout's analyzer requirement); the group fn reads ts_us
    prepared = events.withWatermark("ts", delay).select(
        "user_id", "ts", (F.unix_micros(F.col("ts"))).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        lambda key, it, state: _sessionize_group_wm(key, it, state, gap_us),
        outputStructType=TAGGED_SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
    stated guarantee instead of a silent one. That bounded form now
    EXISTS: :func:`sessionize_stream_watermarked` (r16) adds the
    watermark, event-time timer eviction, and a late-row side output.
    This unbounded form remains the registered st_sessionize surface
    because the harness replays finite in-order files where the case
    cannot arise (tests/test_streaming.py pins the multi-batch late-chain
    behavior); pick the watermarked twin when the input can actually be
    late or the corpus is unbounded.
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
