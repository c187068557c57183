"""Unit coverage for the TWS sessionizer's processor logic WITHOUT the
protobuf transport.

The container ships no ``google.protobuf``, so the real
``transformWithStateInPandas`` wiring cannot run here
(tests/test_streaming.py importorskips it). But everything this repo
WROTE — ``GapSessionProcessor``'s input handling, timer re-arming, idle
expiry, the stale-timer guard — is plain Python over the StatefulProcessor
interface, and the state server behind it is Spark's, not ours. Driving
the processor through a fake handle/state/timer double exercises every
line of sessions_tws.py's logic; the protobuf transport remains the one
documented environment boundary (sessions_tws.py module docstring).

No SparkSession needed: these tests are pure-Python fast.
"""

from __future__ import annotations

import pandas as pd

from data_wrangle_openstreetmaps_data_1_spark.streaming.sessions_tws import (
    GapSessionProcessor,
)

GAP_MIN = 30.0
GAP_US = int(GAP_MIN * 60 * 1_000_000)
GAP_MS = GAP_US // 1000


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, expiry_ms):
        self.timers.append(int(expiry_ms))


class FakeExpiredTimer:
    def __init__(self, expiry_ms: int):
        self._e = int(expiry_ms)

    def getExpiryTimeInMs(self):
        return self._e


def _batch(ts_us: list[int]) -> "iter":
    return iter([pd.DataFrame({"ts_us": ts_us})])


def _mk() -> tuple[GapSessionProcessor, FakeHandle]:
    p = GapSessionProcessor(GAP_US)
    h = FakeHandle()
    p.init(h)
    return p, h


def test_input_rows_accumulate_and_arm_timer():
    p, h = _mk()
    out = list(p.handleInputRows((7,), _batch([0, 60_000_000]), None))
    assert out == []  # nothing closed yet
    assert h.state.get() == (0, 60_000_000, 2)
    # single idle timer at last_event + gap (+1ms strict-pass margin)
    assert h.timers == [60_000 + GAP_MS + 1]


def test_gap_exceeded_closes_and_rearms_single_timer():
    p, h = _mk()
    list(p.handleInputRows((7,), _batch([0, 60_000_000]), None))
    far = 4_000_000_000  # 4000 s >> 30 min gap
    out = list(p.handleInputRows((7,), _batch([far]), None))
    # first session emitted closed, exactly once, with ms duration
    assert [tuple(r) for r in out[0].itertuples(index=False)] == [
        (7, 0, 60_000_000, 2, 60_000)
    ]
    # state rolled to the new session; old timer deleted, ONE new timer
    assert h.state.get() == (far, far, 1)
    assert h.timers == [far // 1000 + GAP_MS + 1]


def test_expired_timer_closes_idle_session_and_clears_state():
    p, h = _mk()
    list(p.handleInputRows((7,), _batch([0, 60_000_000]), None))
    (expiry,) = h.timers
    out = list(p.handleExpiredTimer((7,), None, FakeExpiredTimer(expiry)))
    assert [tuple(r) for r in out[0].itertuples(index=False)] == [
        (7, 0, 60_000_000, 2, 60_000)
    ]
    assert not h.state.exists()  # state deleted -> O(active sessions)


def test_stale_timer_is_ignored():
    """A timer armed for an older last-event must not close a session that
    has since seen new events (defense in depth: input processing deletes
    + re-arms, but the guard makes correctness not depend on that)."""
    p, h = _mk()
    list(p.handleInputRows((7,), _batch([0]), None))
    stale = h.timers[0]
    # new event extends the session past the stale timer's justification
    list(p.handleInputRows((7,), _batch([GAP_US - 1]), None))
    out = list(p.handleExpiredTimer((7,), None, FakeExpiredTimer(stale)))
    assert out == []
    assert h.state.get() == (0, GAP_US - 1, 2)  # survives the stale fire


def test_expired_timer_without_state_is_noop():
    p, h = _mk()
    out = list(p.handleExpiredTimer((7,), None, FakeExpiredTimer(123)))
    assert out == []
