"""Record a calibrated quiet-window bench ledger entry.

The driver's per-round BENCH_r{N}.json can run on a loaded host (r9 and
r12 both did), so each round also records a local bench taken in a quiet
window, with the bench's own JVM/python calibration probes as the
honesty check: an entry only counts as calibrated when pre/post
calib_jvm drift stays under ~20% and loadavg is low. Compare core11 +
calibration across rounds — totals grow with the headline set.

Usage: python tools/quiet_window.py <round> [n_runs]
Runs bench.py n_runs times (default 3), picks the run with the smallest
pre/post calib_jvm drift, and merges it into BENCH_sf1_local.json as
'r{N}_quiet_window' (core11_best_of_n across all runs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd = int(sys.argv[1])
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs = []
    for i in range(n_runs):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        doc = json.loads(line)
        calib = doc["calibration"]
        drift = abs(calib["post"]["calib_jvm_sec"] - calib["pre"]["calib_jvm_sec"]) / max(
            calib["pre"]["calib_jvm_sec"], 1e-9
        )
        runs.append((drift, doc))
        print(
            f"run {i + 1}/{n_runs}: total {doc['value']}s core11 {doc['core11_value']}s "
            f"calib drift {drift:.0%} loadavg {calib['pre']['loadavg_1m']}",
            flush=True,
        )
    drift, best = min(runs, key=lambda t: t[0])
    entry = {
        "comment": f"r{rnd} quiet-window reference: best-calibrated of {n_runs} "
        f"bench.py runs (pre/post calib_jvm drift {drift:.0%}). Compare core11 + "
        "calibration across rounds; totals are NOT comparable (the headline set "
        "grows).",
        "total": best["value"],
        "core11": best["core11_value"],
        f"core11_best_of_{n_runs}": min(d["core11_value"] for _, d in runs),
        "calibration": best["calibration"],
        "queries": best["queries"],
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc[f"r{rnd}_quiet_window"] = entry
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(entry)[:400])
    return 0


if __name__ == "__main__":
    sys.exit(main())
