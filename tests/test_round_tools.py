"""Guards for the round-process tools the ledgers depend on (r17).

tools/stale_recheck.py and tools/window_preflight.py are now the
round-end rituals (verify skill §Round-end); their value rests on two
fragile couplings this file pins:

- stale_recheck's log parser must track check_oracle's print format —
  a silent format drift would ledger pass=0 and look like a wipeout (or
  worse, a clean file with nothing in it);
- window_preflight must select exactly the registry's first-50 driver
  window from the COMMITTED rotation, not a recomputed one.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

# the exact patterns stale_recheck.py greps, kept importable would be nicer,
# but the tool is a script; duplicate the literals and pin BOTH against a
# canned sample of check_oracle's real output format below
PASS_RE = r"PASS ([a-z0-9_]+) \((\d+) rows, spark ([0-9.]+)s"
ROWS_ONLY_RE = r"ROWS-ONLY ([a-z0-9_]+)"

SAMPLE = (
    "PASS tpch_q1_pricing (4 rows, spark 0.4s / duck 0.0s (12.3x))\n"
    "[Stage 12:>        (0 + 1) / 1]\r"
    "PASS tx_bm25_topk (30 rows, spark 17.5s / duck 0.1s (136.9x))\n"
    "ROWS-ONLY dd_minhash_lsh_fast: 118 rows (3.2s)\n"
    "FAIL tx_broken (5 rows, spark 1.0s / duck 0.1s (10.0x))\n"
    "\n242 pass, 0 fail, 1 rows-only\n"
)


def test_stale_recheck_parser_patterns_match_check_oracle_format():
    txt = SAMPLE.replace("\r", "\n")
    passes = re.findall(PASS_RE, txt)
    assert [(n, r) for n, r, _ in passes] == [
        ("tpch_q1_pricing", "4"),
        ("tx_bm25_topk", "30"),
    ]
    assert re.findall(ROWS_ONLY_RE, txt) == ["dd_minhash_lsh_fast"]
    # the FAIL line must NOT be swallowed into passes
    assert not any(n == "tx_broken" for n, _, _ in passes)


def test_stale_recheck_patterns_are_the_ones_the_tool_uses():
    """The literals above must equal the tool's source — if stale_recheck's
    regexes change, this file's format sample must be re-validated too."""
    src = open("/root/repo/tools/stale_recheck.py").read()
    assert PASS_RE in src
    assert ROWS_ONLY_RE.replace("\\", "\\") in src


def test_check_oracle_print_format_is_what_the_parser_expects():
    """check_oracle.py's PASS/ROWS-ONLY f-strings still produce lines the
    parser patterns match — pins the producer side of the coupling."""
    src = open("/root/repo/tools/check_oracle.py").read()
    assert 'f"PASS {name} ({len(sdf)} rows, {timing})"' in src
    assert 'f"spark {spark_s:.1f}s / duck {duck_s:.1f}s ({ratio:.1f}x)"' in src
    assert 'f"ROWS-ONLY {name}:' in src


def test_window_preflight_uses_committed_rotation_head():
    import window_preflight

    window = json.load(open(window_preflight.ROTATION))["order"][:50]
    assert len(window) == 50

    from data_wrangle_openstreetmaps_data_1_spark.plans import registry

    registry._load_all()
    # the registry serves queries() in rotation order, so the driver's
    # first-50 == the committed order's first-50; preflight must target
    # exactly these names
    assert list(registry.QUERIES)[:50] == window
