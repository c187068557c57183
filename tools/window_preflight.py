"""Pre-driver gate: oracle-check exactly the 50-query driver window.

The driver value-checks the FIRST 50 ``queries()`` entries (the committed
rotation order). Before closing a round — especially one that reshuffled
the rotation — run THIS to replay precisely those 50 against the DuckDB
oracle at sf0.01, so a red driver row is never the first time a window
composition is executed end-to-end. (r17 ran this by hand before
committing the cap removal; this tool is that ritual, kept.)

Usage: python tools/window_preflight.py [sf_dir]
Exit code is check_oracle's (nonzero on any failure).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROTATION = os.path.join(
    REPO, "data_wrangle_openstreetmaps_data_1_spark", "plans", "rotation.json"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    window = json.load(open(ROTATION))["order"][:50]
    print(f"window_preflight: {len(window)} queries, head {window[:5]}")
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), sf_dir]
        + window,
        cwd=REPO,
    )


if __name__ == "__main__":
    sys.exit(main())
