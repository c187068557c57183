"""sf1 rehearsal for every operator round 8 touched (the r7 discipline:
every new/edited operator gets a 10x-data measurement before review).

Queries: tx_bpe_encode (new), tx_bpe_merges (per-round localCheckpoint),
a_event_pattern_match (count-only skew-guard pre-pass), dd_jaccard_prefix
(cache lifecycle + internal localCheckpoint), sim_neardup_cosine (same),
st_cdc_apply (bucketed snapshot versions). TPC-H q4/q11/q15 are covered by
tpch_sf1_sweep_r8. Best of 2 reps at sf0.1 and /tmp/sf1; merges into
BENCH_sf1_local.json under 'r8_new_ops'.

Usage: python tools/r8_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "tx_bpe_merges",
    "tx_bpe_encode",
    "a_event_pattern_match",
    "dd_jaccard_prefix",
    "sim_neardup_cosine",
    "st_cdc_apply",
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
    spark = get_spark("r8_sf1_recheck")
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
        "comment": "round-8 touched-operator rehearsal, best of 2 reps, "
        "local[32], /tmp/sf1 = gen_scale_rehearsal 10x replication. "
        "Expectations: BPE rounds are vocab-bounded (distinct words grow "
        "sublinearly in this replicated corpus), pattern match adds a "
        "count-only guard pass, the prefix join carries its internal "
        "localCheckpoint materialization, CDC is per-batch O(batch + "
        "snapshot-rewrite) with only the batch side shuffling.",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r8_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r8_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
