"""sf1 rehearsal for the round-12 LATE additions (the queries that landed
after tools/r12_sf1_recheck.py ran — same standing discipline: every
new/edited operator gets a 10x-data measurement before review).

Queries:
- tx_bm25_lifecycle — delete -> stale probe -> FULL-postings-rewrite
  compact -> exact probe. The compact is the expected O(index) cost (a
  doc's postings land in every bucket its terms hash to — the Lucene
  whole-segment-merge analogy documented in text_index.py); the point of
  rehearsing is to pin that it stays LINEAR in the postings table.
- sim_ivf_pq_del_lifecycle — delete -> stale probe -> partition-selective
  compact -> exact probe; compact rewrites only dirty clusters, so the
  wall should track the probe cost, not the index size.
- sim_hybrid_stored — both index builds + both pruned probes + RRF
  fusion; the builds dominate (one postings shuffle + one encode pass,
  both linear), the fusion is O(queries x 20).
- tx_vocab_drift — two tokenize+count passes and one O(vocabulary)
  term-keyed full-outer join; sublinear-to-linear expected.
- sim_ivf_pq_batched — train + write + the batched probe (one scan
  pruned to the union of probed clusters, broadcast fan-out + LUT
  joins, one window top-k); the build dominates, linear in vectors.

Fixture: /tmp/sf1v2 (faithful suffix-scheme 10x; its embeddings table is
4x sf0.1, so vector-heavy ratios read against 4x; the suffix scheme also
GROWS the vocabulary ~10x, which makes tx_vocab_drift's term join a
stress case, not a flattering one). Best of 2 reps; merges into
BENCH_sf1_local.json under 'r12_late_ops'.

Usage: python tools/r12_late_ops.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "tx_bm25_lifecycle",
    "sim_ivf_pq_del_lifecycle",
    "sim_hybrid_stored",
    "tx_vocab_drift",
    # batched serving probe: one pruned scan + broadcast LUT joins; the
    # interesting ratio is the scan side (embeddings 4x in this fixture)
    "sim_ivf_pq_batched",
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
    spark = get_spark("r12_late_ops")
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
        "comment": "round-12 late additions, best of 2 reps, local[32], "
        "/tmp/sf1v2 faithful 10x fixture (embeddings 4x sf0.1 -> vector "
        "ratios read against 4x; suffix scheme grows the vocabulary ~10x "
        "-> tx_vocab_drift's term join is stressed, not flattered)",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r12_late_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r12_late_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
