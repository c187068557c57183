"""sf1 rehearsal for the round-12 surface (the standing discipline:
every new/edited operator gets a 10x-data measurement before review).

Queries:
- dd_lsh_fast_equiv — NEW: full-outer join of the fast (xxhash64) and
  portable (md5) MinHash tiers' verified pair sets + pinned-invariant
  aggregate. Both tiers are individually rehearsal-proven (banded
  equi-joins, no all-pairs); the equivalence adds one pair-keyed join
  over two pair sets, linear in their size.
- sim_ivf_pq_drift_recall — NEW: base-corpus training + stored write +
  drifted add + pruned probes + per-query exact-L2 top-k over base+adds.
  The exact branches scan the corpus once per query (3 queries, k-bounded
  TakeOrderedAndProject) — linear per query by design.
- sim_ivf_pq_stored / tx_bm25_stored / st_ivf_index / st_bm25_index —
  REFRESH after this round's lifecycle edits (drift-baseline write,
  malformed-vector guard expressions in _assign_encode, staged terms
  merge + incremental stats in bm25_index_add): confirms no wall
  regression from the hardening.

Fixture: /tmp/sf1v2 (faithful suffix-scheme 10x; NOTE its embeddings
table is 4x sf0.1 — vector-query ratios read against 4x). Best of 2
reps; merges into BENCH_sf1_local.json under 'r12_new_ops'.

Usage: python tools/r12_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "dd_lsh_fast_equiv",
    "sim_ivf_pq_drift_recall",
    "sim_ivf_pq_stored",
    "tx_bm25_stored",
    "st_ivf_index",
    "st_bm25_index",
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
    spark = get_spark("r12_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    table: dict[str, dict] = {}
    for name in NAMES:
        fn = registry.QUERIES[name].spark
        row = {}
        for label, d in (("sf01", sf01), ("sf1", sf1)):
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
        print(f"{name}: sf0.1 {row['sf01']}s  sf1 {row['sf1']}s  x{row['ratio']}", flush=True)

    payload = {
        "comment": "round-12 rehearsal, best of 2 reps, local[32], "
        "/tmp/sf1v2 faithful 10x fixture (embeddings table is 4x sf0.1, "
        "so vector-query ratios read against 4x; document-table ratios "
        "read against 10x)",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r12_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r12_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
