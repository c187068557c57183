"""The registry rotation is part of the driver contract (the external
correctness gate checks exactly the first 50 ``queries()`` entries), so its
ordering logic is pinned here: red/never-checked queries must always lead,
changed queries must re-enter the window, and stable-green queries must
cycle stalest-first so every query re-earns a driver row every ~2 rounds.
No Spark needed — the core is pure."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from rotate_registry import compute_order  # noqa: E402

FPS = {n: f"fp_{n}" for n in "abcdefg"}


def hist_entry(last, green=True, rows_only=False):
    return (last, green, rows_only)


def test_never_checked_and_red_lead():
    names = list("abcd")
    hist = {
        "a": hist_entry(2),                # stable green, fresh
        "b": hist_entry(2, green=False),   # red at last check
        "d": hist_entry(1),                # stable green, stale
    }                                       # c: never checked
    order = compute_order(names, hist, {n: True for n in names}, FPS, FPS)
    # tier 0 leads (never-checked sorts before red: last=0 < last=2)
    assert order[:2] == ["c", "b"]
    assert order[2:] == ["d", "a"]  # green: stalest first


def test_rows_only_row_does_not_vouch_once_oracle_exists():
    names = ["a", "b"]
    hist = {"a": hist_entry(2, rows_only=True), "b": hist_entry(1)}
    # a was rows-only checked but NOW has an oracle: its value check never ran
    order = compute_order(names, hist, {"a": True, "b": True}, FPS, FPS)
    assert order == ["a", "b"]
    # without an oracle the rows-only row is the best it can get: stays green
    order = compute_order(names, hist, {"a": False, "b": True}, FPS, FPS)
    assert order == ["b", "a"]


def test_changed_fingerprint_outranks_stable_green():
    names = list("abc")
    hist = {n: hist_entry(2) for n in names}
    prev = dict(FPS)
    prev["b"] = "something-older"
    order = compute_order(names, hist, {n: True for n in names}, FPS, prev)
    assert order[0] == "b"


def test_round_robin_self_rotation():
    # queries checked this round sink below the ones the window missed:
    # the CORRECTNESS history itself is the cursor
    names = list("abcd")
    hist = {"a": hist_entry(3), "b": hist_entry(3), "c": hist_entry(2), "d": hist_entry(2)}
    order = compute_order(names, hist, {n: True for n in names}, FPS, FPS)
    assert order == ["c", "d", "a", "b"]


def test_empty_prev_fingerprints_never_forces_tier1():
    # first adoption: no stored fingerprints must not mark everything changed
    names = list("ab")
    hist = {"a": hist_entry(1), "b": hist_entry(2)}
    order = compute_order(names, hist, {n: True for n in names}, FPS, {})
    assert order == ["a", "b"]


def test_force_head_outranks_organic_tier0():
    # a builder-asserted must-check (green driver history, red locally)
    # must lead even a crowded organic tier 0 — that's its whole purpose
    names = list("abcde")
    hist = {"e": hist_entry(2)}  # a-d never checked -> organic tier 0
    order = compute_order(
        names, hist, {n: True for n in names}, FPS, FPS, force_head=["e"]
    )
    assert order[0] == "e"
    # and names not in the registry are filtered by the caller, so an
    # unknown name in the file cannot break ordering here
    order2 = compute_order(
        names, hist, {n: True for n in names}, FPS, FPS, force_head=[]
    )
    assert order2[-1] == "e"  # without forcing, its green row sinks it
