"""Committed-rotation sync gate (r17).

The driver checks exactly the FIRST 50 ``queries()`` entries, and the
registry orders them from the committed ``plans/rotation.json``. The
rotation workflow ("run tools/rotate_registry.py after editing any
query, commit the refresh") was enforced only by discipline: editing a
query (or any helper in its transitive closure) without re-running the
tool leaves rotation.json's fingerprints silently stale, so the edited
query keeps its old tier and can miss the driver window it must re-earn
a row in — round 4's silent-staleness class, which the transitive
fingerprint was built to kill.

This test makes the ritual load-bearing: it recomputes every registered
query's transitive fingerprint (~3 s) and diffs against the committed
map. It deliberately checks ONLY edit-synced state — never CORRECTNESS
history — so a new driver correctness drop at round start does NOT
redden the suite; only an un-rotated source edit does.

The recompute runs in a SUBPROCESS with no SparkContext, because the
committed fingerprints are defined as "what tools/rotate_registry.py
produces when run as a script" — always Spark-free. In a sessionful
process (this suite) the closure walk sees MORE: modules whose import
needs a live context (operators/grouped_agg.py's module-level
pandas_udf) import fine and contribute object-level chunks instead of
the tool's file-source fallback chunk, shifting 2 fingerprints — the
exact asymmetry that exposed the fallback gap in r17.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

ROTATION = os.path.join(
    "/root/repo", "data_wrangle_openstreetmaps_data_1_spark", "plans", "rotation.json"
)

_CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from rotate_registry import fingerprints
from data_wrangle_openstreetmaps_data_1_spark.plans import registry
registry._load_all()
print("FPS:" + json.dumps(fingerprints(registry)))
"""


def _load():
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry

    registry._load_all()
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, f"fingerprint subprocess crashed:\n{proc.stderr[-2000:]}"
    payload = [l for l in proc.stdout.splitlines() if l.startswith("FPS:")]
    fresh = json.loads(payload[0][len("FPS:"):])
    return registry, fresh, json.load(open(ROTATION))


def test_rotation_names_cover_registry_exactly():
    """Every registered query is in the committed order and vice versa —
    a query added (or renamed) without re-running the rotation would
    otherwise sink to the order's tail by registry fallback, invisible
    to the driver until someone noticed."""
    registry, _, stored = _load()
    assert sorted(stored["order"]) == sorted(registry.QUERIES), (
        "rotation.json order and the registry disagree — run "
        "tools/rotate_registry.py and commit the refresh"
    )


def test_rotation_fingerprints_match_source():
    """The committed fingerprint map equals a fresh recompute. A mismatch
    means a registered query (or something in its transitive closure) was
    edited after the last rotation pass — its tier is stale and the edit
    may be hidden from the driver window. Fix: python
    tools/rotate_registry.py && commit plans/rotation.json."""
    _, fresh, stored = _load()
    committed = stored["fingerprints"]
    drifted = sorted(
        n for n in fresh if committed.get(n) != fresh[n]
    )
    assert drifted == [], (
        f"{len(drifted)} queries' transitive source changed since the last "
        f"rotation pass (first 10: {drifted[:10]}) — run "
        "tools/rotate_registry.py and commit the refreshed rotation.json"
    )
