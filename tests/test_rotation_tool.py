"""The registry rotation is part of the driver contract (the external
correctness gate checks exactly the first 50 ``queries()`` entries), so its
ordering logic is pinned here: red/never-checked queries must always lead,
changed queries must re-enter the window, and stable-green queries must
cycle stalest-first so every query re-earns a driver row every ~2 rounds.
No Spark needed — the core is pure."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from rotate_registry import carry_vouched, compute_order, reachable_source  # noqa: E402

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


def test_tier1_cap_demotes_overflow_below_stale_tier2():
    """r16 consolidation dial: with a cap, preferred tier-1 names keep the
    head, capped-out tier-1 overflow sinks BELOW every tier-2 row (the
    stale cohort drains first), and tier 0 still leads everything."""
    names = list("abcdefg")
    hist = {
        "a": hist_entry(9),   # stale green
        "b": hist_entry(15),  # fresh green, changed
        "c": hist_entry(15),  # fresh green, changed
        "d": hist_entry(15),  # fresh green, changed
        "e": hist_entry(10),  # stale green
        "f": hist_entry(2, green=False),  # red: tier 0
    }                          # g: never checked: tier 0
    prev = dict(FPS)
    for n in "bcd":
        prev[n] = "older"
    order = compute_order(
        names, hist, {n: True for n in names}, FPS, prev,
        tier1_cap=1, tier1_prefer=["c"],
    )
    assert set(order[:2]) == {"f", "g"}            # tier 0 first
    assert order[2] == "c"                          # preferred tier-1 head
    assert order[3:5] == ["a", "e"]                # stale tier 2, stalest first
    assert set(order[5:]) == {"b", "d"}            # overflow below tier 2
    # cap=None keeps the original semantics: all changed lead tier 2
    order = compute_order(names, hist, {n: True for n in names}, FPS, prev)
    assert set(order[2:5]) == {"b", "c", "d"}


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


def test_no_oracle_query_pinned_to_bottom():
    """r19 (the r18 verdict's 98%): a by-design rows-only query must NEVER
    occupy an oracle-window slot — not when its module changed (tier 1),
    not when it was never driver-checked (tier 0), not even when forced.
    Its value signal is its oracle-backed twin plus the local sweep."""
    names = list("abcd")
    has_oracle = {"a": True, "b": False, "c": True, "d": True}
    # b never checked (organic tier 0 for an oracle query) -> still last
    hist = {n: hist_entry(2) for n in "acd"}
    order = compute_order(names, hist, has_oracle, FPS, FPS)
    assert order[-1] == "b"
    # b changed since its last green row (tier 1 for an oracle query) -> last
    hist = {n: hist_entry(2, rows_only=(n == "b")) for n in names}
    prev = dict(FPS)
    prev["b"] = "older"
    order = compute_order(names, hist, has_oracle, FPS, prev)
    assert order[-1] == "b"
    # even force_head cannot spend a window slot on it
    order = compute_order(names, hist, has_oracle, FPS, prev, force_head=["b"])
    assert order[-1] == "b"


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


def test_vouched_fingerprint_sticky_until_new_driver_row():
    # An edit keeps the query tier 1 across ANY number of rotation rewrites
    # until the DRIVER re-checks it — the pre-round-6 behavior consumed the
    # changed-marker on every write, so an edited query could silently drop
    # back to tier 2 before the driver ever saw it.
    names = ["q"]
    hist = {"q": hist_entry(5)}
    # pass 1: q was edited (current fp "new" vs stored "old"); driver last
    # round seen by the previous pass was also 5 -> no new driver row
    vouched, last = carry_vouched(names, hist, {"q": "old"}, {"q": "old"}, {"q": 5})
    assert vouched == {"q": "old"} and last == {"q": 5}
    order = compute_order(["x", "q"], {**hist, "x": hist_entry(5)},
                          {"q": True, "x": True}, {"q": "new", "x": "fx"},
                          {**vouched, "x": "fx"})
    assert order[0] == "q"  # tier 1
    # pass 2 (rotation rewritten, fingerprints now store "new", but STILL no
    # new driver row): vouched must carry "old" forward, q stays tier 1
    vouched2, _ = carry_vouched(names, hist, {"q": "new"}, vouched, {"q": 5})
    assert vouched2 == {"q": "old"}
    # driver round 6 lands a row for q: the pass that sees it adopts the
    # fingerprint the driver ran against ("new") -> q returns to tier 2
    vouched3, last3 = carry_vouched(names, {"q": hist_entry(6)}, {"q": "new"}, vouched2, {"q": 5})
    assert vouched3 == {"q": "new"} and last3 == {"q": 6}
    order3 = compute_order(["x", "q"], {"q": hist_entry(6), "x": hist_entry(6)},
                           {"q": True, "x": True}, {"q": "new", "x": "fx"},
                           {**vouched3, "x": "fx"})
    assert order3 == ["x", "q"]  # both tier 2, tie broken by registration


# ---------------------------------------------------------------------------
# Transitive fingerprints (round 6): a helper rewrite must re-tier callers.
# Round 4's silent staleness was exactly this hole — dd_groups_cc's green row
# kept vouching after ngram_jaccard_pairs (a helper it calls) was rewritten,
# and only a hand-maintained force_head list papered over it.
# ---------------------------------------------------------------------------


def test_reachable_source_covers_registry_helpers():
    # the real criterion: ngram_jaccard_pairs (and ITS helpers, two modules
    # away) are inside dd_groups_cc's fingerprint closure, so editing any of
    # them alone flips the fingerprint -> tier 1 in compute_order
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry

    registry._load_all()
    src = reachable_source(registry.QUERIES["dd_groups_cc"].spark)
    assert "def ngram_jaccard_pairs" in src  # direct callee (operators/dedup.py)
    assert "def _shingle_sets" in src  # callee-of-callee
    assert "def explode_nonempty" in src  # cross-module helper (partitioning.py)
    assert "def dedup_groups" in src  # operators/components.py
    # and an UNRELATED operator module is NOT dragged in (precision: a
    # sketches.py edit must not re-tier every dedup query)
    assert "def bloom_member" not in src


def test_reachable_source_sees_in_function_imports():
    # tx_url_canonicalize does `from ..functions.text import canonical_url`
    # INSIDE the function body — binds locally, invisible to co_names-in-
    # globals resolution; the AST import walk must catch it
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry

    registry._load_all()
    src = reachable_source(registry.QUERIES["tx_url_canonicalize"].spark)
    assert "def canonical_url" in src


def _write_tpkg(root, helper_body, const_val=5):
    (root / "tpkg" / "sub").mkdir(parents=True, exist_ok=True)
    (root / "tpkg" / "__init__.py").write_text("")
    (root / "tpkg" / "sub" / "__init__.py").write_text("")
    (root / "tpkg" / "sub" / "helper.py").write_text(
        f"K = {const_val}\n\n\ndef g():\n    return {helper_body}\n"
    )
    (root / "tpkg" / "caller.py").write_text(
        "from .sub.helper import K, g\n\n\ndef f():\n    return g() + K\n"
    )


def test_helper_edit_alone_changes_caller_fingerprint(tmp_path):
    import importlib
    import linecache

    sys.path.insert(0, str(tmp_path))
    try:
        _write_tpkg(tmp_path, "1")
        caller = importlib.import_module("tpkg.caller")
        fp1 = reachable_source(caller.f)
        assert "def g" in fp1 and "const:K=5" in fp1

        # edit ONLY the helper function body; caller.py untouched
        _write_tpkg(tmp_path, "2")
        linecache.clearcache()
        importlib.reload(sys.modules["tpkg.sub.helper"])
        caller = importlib.reload(caller)
        fp2 = reachable_source(caller.f)
        assert fp1 != fp2

        # edit ONLY the shared constant
        _write_tpkg(tmp_path, "2", const_val=7)
        linecache.clearcache()
        importlib.reload(sys.modules["tpkg.sub.helper"])
        caller = importlib.reload(caller)
        fp3 = reachable_source(caller.f)
        assert fp3 != fp2 and "const:K=7" in fp3

        # and a changed fingerprint is exactly what re-tiers the caller to 1
        hist = {"f": hist_entry(2), "x": hist_entry(2)}
        fps = {"f": fp3, "x": "fp_x"}
        prev = {"f": fp2, "x": "fp_x"}
        order = compute_order(["x", "f"], hist, {"f": True, "x": True}, fps, prev)
        assert order[0] == "f"
    finally:
        sys.path.remove(str(tmp_path))
        for m in [m for m in sys.modules if m == "tpkg" or m.startswith("tpkg.")]:
            del sys.modules[m]


def test_r17_overrides_are_cap_free():
    """r17 backlog-retirement: the r16 consolidation cap deliberately held 48
    re-tiered tier-1 queries out of the driver window (sticky vouch); its own
    note said REMOVE once they lead a round. r17 removed it — pin the file so
    a future consolidation round must re-justify a cap in a fresh note rather
    than silently inheriting one, and pin the cap-free ordering: every sticky
    tier-1 row outranks every stable-green tier-2 row, stalest-first within
    the tier."""
    import json
    import os

    ov = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tools", "rotation_overrides.json"))
    )
    assert "tier1_cap" not in ov and "tier1_prefer" not in ov
    assert ov.get("force_head") == []

    # cap-free ordering: tier 1 (changed since last driver row) leads ALL of
    # tier 2 regardless of how fresh its last driver row is; tier 2 cycles
    # stalest-first behind it (the r17 window shape: 48 tier-1 + stalest tier-2)
    names = list("abcde")
    hist = {
        "a": hist_entry(15),  # fresh green, changed -> tier 1
        "b": hist_entry(14),  # fresh green, changed -> tier 1
        "c": hist_entry(10),  # stale green -> tier 2
        "d": hist_entry(12),  # green -> tier 2
        "e": hist_entry(15),  # fresh green -> tier 2
    }
    prev = dict(FPS)
    prev["a"] = "older"
    prev["b"] = "older"
    order = compute_order(names, hist, {n: True for n in names}, FPS, prev)
    assert order == ["b", "a", "c", "d", "e"]


def test_unimportable_module_falls_back_to_file_source(tmp_path):
    """r17: a closure module that RAISES on import (real case:
    operators/grouped_agg.py's module-level pandas_udf needs a live
    SparkContext; this tool runs Spark-free) must still be fingerprinted —
    via its source file — so editing it re-tiers its callers. The pre-r17
    walk swallowed the ImportError and silently dropped the module from
    the closure: the round-4 silent-staleness class inside the import
    walk itself."""
    import importlib
    import linecache

    def write(body: str) -> None:
        (tmp_path / "tpkg2").mkdir(exist_ok=True)
        (tmp_path / "tpkg2" / "__init__.py").write_text("")
        (tmp_path / "tpkg2" / "needs_ctx.py").write_text(
            f"raise RuntimeError('no context')\n\n\ndef h():\n    return {body}\n"
        )
        (tmp_path / "tpkg2" / "caller.py").write_text(
            "def f():\n    from .needs_ctx import h\n    return h()\n"
        )

    sys.path.insert(0, str(tmp_path))
    try:
        write("1")
        caller = importlib.import_module("tpkg2.caller")
        fp1 = reachable_source(caller.f)
        assert "modsrc:tpkg2.needs_ctx" in fp1
        assert "raise RuntimeError('no context')" in fp1

        write("2")  # edit ONLY the unimportable module's body
        linecache.clearcache()
        caller = importlib.reload(caller)
        fp2 = reachable_source(caller.f)
        assert fp1 != fp2 and "return 2" in fp2
    finally:
        sys.path.remove(str(tmp_path))
        for m in [m for m in sys.modules if m == "tpkg2" or m.startswith("tpkg2.")]:
            del sys.modules[m]
