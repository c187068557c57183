"""sf1 rehearsal for the round-14b surface (standing discipline: every
new/edited operator gets a 10x-data measurement before review).

All five queries read only the documents table and rank by term
frequency, so the fixture is /tmp/sf1_freq (frequency-faithful 10x
replication — the probed terms match 10x the docs; the suffix-scheme
corpus would leave the probed buckets sf0.1-sized). Built here if
missing (same construction as tools/r11_sf1_recheck.py).

Queries: tx_term_wildcard (dictionary-scan expansion + pruned postings),
tx_bm25_filtered (pre+post strategies in one row), tx_bm25_diverse
(two stacked windows), tx_mlt (seed term selection + batched rank),
tx_bm25_tiered (3 segment builds + planned merge + 2 probes — the
build-dominated one).

Best of 2 reps, clearCache between; merges into BENCH_sf1_local.json
under 'r14b_new_ops'.

Usage: python tools/r14b_sf1_recheck.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FREQ_DIR = "/tmp/sf1_freq"

NAMES = [
    "tx_term_wildcard",
    "tx_bm25_filtered",
    "tx_bm25_diverse",
    "tx_mlt",
    "tx_bm25_tiered",
    "tx_bm25_msm",
    "tx_bm25_synonyms",
    "tx_bm25_statsfacet",
    "tx_bm25_statsbyfacet",
    "tx_bm25_snippets",
]


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tools.filterplan_win import ensure_freq_fixture

    ensure_freq_fixture()
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r14b_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or NAMES
    table: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name].spark
        row = {"fixture": FREQ_DIR}
        for label, d in (("sf01", sf01), ("sf1", FREQ_DIR)):
            best = float("inf")
            n = 0
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                n = len(fn(spark, d).collect())
                best = min(best, time.time() - t0)
            row[label] = round(best, 2)
            row[f"{label}_rows"] = n
        row["ratio"] = round(row["sf1"] / max(row["sf01"], 1e-9), 2)
        table[name] = row
        print(
            f"{name}: sf0.1 {row['sf01']}s  sf1 {row['sf1']}s  x{row['ratio']}",
            flush=True,
        )

    payload = {
        "comment": "round-14b rehearsal, best of 2 reps, local[32]; "
        "/tmp/sf1_freq = frequency-faithful 10x documents (probed terms "
        "match 10x docs)",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    if sys.argv[1:]:
        # subset run: always MERGE into the section (creating it if absent)
        # — overwriting would silently drop the other operators' recorded
        # rehearsal rows (r14 ADVICE)
        doc.setdefault("r14b_new_ops", payload)["queries"].update(table)
    else:
        doc["r14b_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r14b_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
