"""Stateful streaming event-transition counting — the streaming twin of
``a_transition_matrix`` (plans/curation_ext.py).

Per user, the state store holds only the FRONTIER event — (ts_us,
event_id, event_type) of the latest event seen — and each micro-batch
emits pre-aggregated (prev_type, next_type, n) rows for its own events,
chaining from the stored frontier (or the synthetic START state for a
user's first-ever event). State is O(users) regardless of event volume;
per-batch output is at most (|types|+1)² rows per user per batch.

Late-data contract (same no-watermark approximation as
sessions.sessionize_stream): emitted pair counts are final. A cross-batch
out-of-order event — older than the stored frontier — is counted as a
transition FROM the frontier rather than spliced into already-emitted
history (the batch twin would re-thread it). When input files split on
time boundaries (the harness case; pinned by the multi-batch test) the
stream is exactly equal to the batch matrix; under genuine disorder,
use ``transition_stream_watermarked`` (r16): watermark + TTL eviction +
a ('LATE', type, n) side output make the approximation a stated
guarantee with bounded state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .finite import run_available_now
from .ingest import read_events_stream

TRANS_SCHEMA = StructType(
    [
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)

# state: the frontier event
STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def transition_walk(
    pdf_iter: Iterator[pd.DataFrame],
    frontier: tuple[int, int, str] | None,
) -> tuple[list[tuple[str, str, int]], tuple[int, int, str] | None]:
    """Pure per-user core: consume this batch's events in (ts_us,
    event_id) order, return (pair-count rows, new frontier). Chunks are
    concatenated before sorting — a group bigger than the Arrow batch
    size arrives split, and per-chunk sorting would corrupt the chain at
    chunk boundaries (same hazard gap_walk documents)."""
    chunks = list(pdf_iter)
    if not chunks:
        return [], frontier
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values(["ts_us", "event_id"])
    prev = frontier[2] if frontier is not None else "START"
    counts: dict[tuple[str, str], int] = {}
    last_ts = frontier[0] if frontier is not None else None
    last_id = frontier[1] if frontier is not None else None
    for ts_us, event_id, et in zip(pdf["ts_us"], pdf["event_id"], pdf["event_type"]):
        key = (prev, et)
        counts[key] = counts.get(key, 0) + 1
        prev = et
        last_ts, last_id = int(ts_us), int(event_id)
    rows = [(a, b, n) for (a, b), n in counts.items()]
    return rows, (last_ts, last_id, prev)


def _transition_group(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows, new_frontier = transition_walk(
        pdf_iter, tuple(state.get) if state.exists else None
    )
    if new_frontier is not None:
        state.update(new_frontier)
    if rows:
        yield pd.DataFrame(rows, columns=["prev_type", "next_type", "n"])


def _transition_group_wm(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_us: int,
) -> Iterator[pd.DataFrame]:
    """Watermarked transition core: rows older than the operator-visible
    watermark are routed to the side output as ('LATE', event_type, n)
    pseudo-transitions (reserved prev state, like 'START') instead of
    silently corrupting the chain; an event-time timer EVICTS a user's
    frontier once the watermark passes last_event + ttl (bounded state —
    the next event after eviction counts START -> type, the documented
    TTL trade)."""
    if state.hasTimedOut:
        state.remove()  # forget the frontier; emit nothing
        return
    wm_ms = state.getCurrentWatermarkMs()
    chunks = list(pdf_iter)
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    if wm_ms > 0:
        late_mask = pdf["ts_us"] < wm_ms * 1000
        late, ok = pdf[late_mask], pdf[~late_mask]
    else:
        late, ok = pdf.iloc[0:0], pdf
    frontier = tuple(state.get) if state.exists else None
    if len(ok):
        rows, new_frontier = transition_walk(iter([ok]), frontier)
    else:  # every row late: chain untouched (transition_walk would
        rows, new_frontier = [], frontier  # fabricate a None frontier)
    rows += [
        ("LATE", et, int(n)) for et, n in late["event_type"].value_counts().items()
    ]
    if new_frontier is not None:
        state.update(new_frontier)
        state.setTimeoutTimestamp(
            max(new_frontier[0] // 1000 + ttl_us // 1000 + 1, wm_ms + 1)
        )
    if rows:
        yield pd.DataFrame(rows, columns=["prev_type", "next_type", "n"])


def transition_stream_watermarked(
    events: DataFrame, delay: str = "1 hour", idle_ttl_minutes: float = 1440.0
) -> DataFrame:
    """Transition counting with a REAL late-data bound (r15 verdict task
    6): ``withWatermark`` + event-time timers. Late rows surface as
    ('LATE', event_type, n) side-output rows — reconcilable downstream,
    never silently dropped or mis-chained; frontiers of users idle past
    ``idle_ttl_minutes`` are EVICTED (state stays bounded at any corpus
    size; a post-eviction event counts from START — the explicit TTL
    contract, vs the unbounded form's grow-forever state). On in-order
    replays with gaps under the TTL the emitted matrix equals the
    unbounded form's exactly (pinned in tests/test_streaming_r16.py)."""
    ttl_us = int(idle_ttl_minutes * 60 * 1_000_000)
    # the watermarked ts column must survive into the operator input
    # (EventTimeTimeout's analyzer requirement); the group fn reads ts_us
    prepared = events.withWatermark("ts", delay).select(
        "user_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        lambda key, it, state: _transition_group_wm(key, it, state, ttl_us),
        outputStructType=TRANS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def transition_stream(events: DataFrame) -> DataFrame:
    """Per-micro-batch (prev_type, next_type, n) rows, chained across
    batches through the per-user frontier state."""
    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _transition_group,
        outputStructType=TRANS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_transitions_once(spark: SparkSession, sf_dir: str, **stream_kwargs) -> DataFrame:
    """Drain the events stream and aggregate the emitted per-batch pair
    counts to the corpus transition matrix (tiny final groupBy)."""
    snap = run_available_now(
        transition_stream(read_events_stream(spark, sf_dir, **stream_kwargs)), "append"
    )
    return snap.groupBy("prev_type", "next_type").agg(F.sum("n").alias("n"))
