"""sf1 rehearsal for every operator round 9 touched (the standing
discipline: every new/edited operator gets a 10x-data measurement before
review).

Queries: dd_jaccard_prefix (codegen-hash + positional-filter rewrite —
the r8 weak item; root-cause note in BENCH_sf1_local.json
r9_prefix_rootcause), dd_jaccard_auto (new adaptive rule; on the
rehearsal fixture the df pre-pass picks a side and the wall includes that
scalar pre-pass), a_pattern_chunked (new; chunk_size=64 keeps boundary
logic hot), st_cdc_manifest (new; changed-bucket-only rewrite),
dd_groups_cc / dd_groups_minhash / tx_bpe_merges (truncate_lineage
refactor — must be a rename-level no-op on wall).

Best of 2 reps at sf0.1 and /tmp/sf1; merges into BENCH_sf1_local.json
under 'r9_new_ops'.

Usage: python tools/r9_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "dd_jaccard_prefix",
    "dd_jaccard_auto",
    "a_pattern_chunked",
    "st_cdc_manifest",
    "dd_groups_cc",
    "dd_groups_minhash",
    "tx_bpe_merges",
]


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        print(f"sf1 dir {sf1} missing; run tools/gen_scale_rehearsal.py first")
        return 1

    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r9_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    table: dict[str, dict] = {}
    for name in NAMES:
        fn = registry.QUERIES[name].spark
        row = {}
        for label, d in (("sf01", sf01), ("sf1", sf1)):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                n = len(fn(spark, d).collect())
                best = min(best, time.time() - t0)
            row[label] = round(best, 2)
            row[f"{label}_rows"] = n
        row["ratio"] = round(row["sf1"] / max(row["sf01"], 1e-9), 2)
        table[name] = row
        print(f"{name}: sf0.1 {row['sf01']}s  sf1 {row['sf1']}s  x{row['ratio']}")

    payload = {
        "comment": "round-9 touched-operator rehearsal, best of 2 reps, "
        "local[32], /tmp/sf1 = gen_scale_rehearsal 10x replication. "
        "Context for reading the ratios: the prefix/auto joins are "
        "candidate-bound and this fixture densifies candidates 200x at "
        "10x data (bigram artifact, see r9_prefix_rootcause); "
        "a_pattern_chunked adds one key-window + one (key, chunk) agg "
        "over events; st_cdc_manifest is a single AvailableNow batch at "
        "this shape so its trigger-pruning win shows in "
        "CDCMANIFEST_WIN.json, not here.",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r9_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r9_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
