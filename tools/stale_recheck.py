"""Run the FULL-registry oracle sweep and write STALE_RECHECK_r{N}.json.

Automates the round-end ritual that was hand-assembled through r17: run
tools/check_oracle.py over every registered query at sf0.01, parse its
log, and write the standing compensating-evidence ledger the rotation
policy cites (every query outside the driver's 50-slot window is
value-green HERE while it waits for its next driver row).

Usage: python tools/stale_recheck.py <round> [sf_dir] [note]
  e.g. python tools/stale_recheck.py 18 /root/testdata/sf0.01 \
         "r18 ran the deferred r16 advice fixes; closure re-tiered."

Exit code is check_oracle's: nonzero if ANY query fails, in which case
no ledger is written (a red sweep is a fix-now signal, not a ledger).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    note = sys.argv[3] if len(sys.argv) > 3 else ""

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), sf_dir],
        capture_output=True, text=True, cwd=REPO,
    )
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        print(f"\nstale_recheck: sweep FAILED (rc={proc.returncode}) — no ledger written")
        return proc.returncode

    txt = proc.stdout.replace("\r", "\n")
    passes = re.findall(r"PASS ([a-z0-9_]+) \((\d+) rows, spark ([0-9.]+)s", txt)
    rows_only = re.findall(r"ROWS-ONLY ([a-z0-9_]+)", txt)
    slowest = dict(
        sorted(((n, float(s)) for n, _, s in passes), key=lambda t: -t[1])[:8]
    )
    doc = {
        "comment": f"round-{rnd} FULL-registry local oracle sweep "
        f"(tools/check_oracle.py at {sf_dir}, every registered query): the "
        "standing compensating evidence for queries outside the driver's "
        "50-slot window — all value-green locally while they wait for their "
        "next driver row.",
        "total": len(passes) + len(rows_only),
        "pass": len(passes),
        "fail": 0,
        "rows_only": rows_only,
        "slowest": slowest,
    }
    if note:
        doc["rotation_note"] = note
    out = os.path.join(REPO, f"STALE_RECHECK_r{rnd}.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"\nwrote {out}: {doc['pass']} pass / {len(rows_only)} rows-only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
