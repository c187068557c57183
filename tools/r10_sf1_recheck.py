"""sf1 rehearsal for the round-10 operators (the standing discipline:
every new/edited operator gets a 10x-data measurement before review).

Queries: dq_profile (one-scan multi-distinct profiler — Expand-form cost
should scale linearly), a_transition_matrix (one keyed window + tiny
rollup), tx_shard_manifest (map-side-partial groupBy on a 3-bit key),
tx_html_extract (map-only regex cascade — the purest should-be-linear
case), sim_pq (codebook train + encode + ADC: train cost is
sample-bounded by design, encode/ADC scale with the corpus).

Fixture: /tmp/sf1v2 (gen_scale_rehearsal suffix scheme — the FAITHFUL
10x fixture, see BENCH_sf1_local.json r9_faithful_fixture). None of
these five are match-structure-sensitive, but using the faithful fixture
keeps the ledger on one comparable baseline. Note its embeddings table
is 4x sf0.1 (20k vs 5k), not 10x — sim_pq's ratio is read against 4x.

Best of 2 reps at sf0.1 and the fixture; merges into
BENCH_sf1_local.json under 'r10_new_ops'.

Usage: python tools/r10_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "dq_profile",
    "a_transition_matrix",
    "tx_shard_manifest",
    "tx_html_extract",
    "sim_pq",
    "tx_unigram_vocab",
    "tx_unigram_segment",
    "tx_collocations",
    "a_heavy_hitters",
    "u_scd2_apply",
    "j_interval_overlap",
    "sim_ivf_pq",
    "st_transition_matrix",
    "g_knn_join",
]


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1v2"
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        print(f"sf1 dir {sf1} missing; run tools/gen_scale_rehearsal.py first")
        return 1

    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r10_sf1_recheck")
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
        "comment": "round-10 new-operator rehearsal, best of 2 reps, "
        "local[32], /tmp/sf1v2 = faithful suffix-scheme 10x fixture "
        "(embeddings table is 4x, so sim_pq's data-dependent half reads "
        "against 4x; its train half is constant-size by design — the "
        "collect loop moves k*dsub scalars regardless of corpus).",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r10_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r10_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
