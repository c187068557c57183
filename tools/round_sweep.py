"""Standing round-end sweep (VERDICT r11 item 8).

The per-round `tools/r{N}_sf1_recheck.py` scripts cover operators TOUCHED
in round N; the reference surface (XML -> reshape -> clean -> store ->
readme battery) used to be re-asserted only when touched. This runs the
OSM 10x scale rehearsal every round so its evidence (conservation
invariant at 1x and 10x, split-reader ratio, auto scan-path selection)
never goes stale, ledgered as `r{N}_osm_scale` in BENCH_sf1_local.json.

Usage: python tools/round_sweep.py <round>     e.g. python tools/round_sweep.py 12

Extend with additional standing entries here as they are promoted from
per-round scripts.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    steps = [
        [sys.executable, os.path.join(REPO, "tools", "r11_osm_scale.py"),
         "266875", f"r{rnd}_osm_scale"],
        # r16 promotion: the J2 relation->way->node ring path (order
        # golden + sublinear reconstruction + PIP e2e at 10x relations)
        [sys.executable, os.path.join(REPO, "tools", "r16_rings_scale.py"),
         "1000", f"r{rnd}_rings_scale"],
    ]
    for cmd in steps:
        print("round_sweep:", " ".join(cmd), flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
