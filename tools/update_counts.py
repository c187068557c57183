"""Regenerate registry-count lines in README.md / COVERAGE.md from the
registry itself, so doc counts can't drift from ``len(queries())`` (they did
twice when hand-maintained).

Rewrites the text between ``<!-- counts -->`` and ``<!-- /counts -->``
markers in each file. Run after adding/removing registered queries; commit
the result.

Usage: python tools/update_counts.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry

    registry._load_all()
    total = len(registry.QUERIES)
    rows_only = sorted(n for n, s in registry.QUERIES.items() if s.oracle is None)
    checked = total - len(rows_only)
    line = (
        f"{total} registered queries: {checked} DuckDB-oracle value-checked, "
        f"{len(rows_only)} rows-only ({', '.join(rows_only)} — see their rows)"
    )
    print(line)
    for fname in ("README.md", "COVERAGE.md"):
        path = os.path.join(REPO, fname)
        text = open(path).read()
        new, n = re.subn(
            r"(<!-- counts -->).*?(<!-- /counts -->)",
            rf"\g<1>{line}\g<2>",
            text,
            flags=re.S,
        )
        if n != 1:
            print(f"ERROR: expected exactly one counts marker in {fname}, found {n}")
            return 1
        open(path, "w").write(new)
        print(f"updated {fname}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
