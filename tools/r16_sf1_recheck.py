"""sf1 rehearsal for the round-16 surface (standing discipline: every
edited operator path gets a 10x-data measurement before review).

Round 16 edited the ranked-probe plumbing, not the query surface — so the
rehearsal re-measures the EXISTING queries whose hot path changed:

- sim_knn_brute / sim_hybrid_rrf (/tmp/sf1v2, 4x embeddings + 10x-class
  documents) — the topk_per_key cost fallback's main beneficiaries: the
  footer-count bound must pick single-stage here too (4x embeddings is
  still far under SINGLE_STAGE_MAX_CANDIDATES) without losing the two-
  stage safety valve at true scale (shards re-derive from the bound).
- tx_bm25_topk (/tmp/sf1_freq) — scan-form BM25 with the doc-count bound.
- tx_bm25_maxscore (/tmp/sf1_freq) — the registered form FORCES the
  Block-Max WAND machinery (min_docs_for_pruning=0), so this row prices
  the pruning path itself at 10x postings; the auto-dispatch wall parity
  is ledgered in WAND_WIN.json.
- tx_maintain_cycle (/tmp/sf1_freq) — the full lifecycle now maintains
  the blockmax/ sidecar through add/compact/merge; near-linear is the
  honest expectation (the cycle rewrites data), and this row bounds what
  the sidecar added to it.
- st_sessionize / st_transition_matrix (/tmp/sf1v2 events) — the
  sessions/transitions modules changed (watermarked twins added beside
  the registered unbounded forms); these rows pin that the registered
  paths' cost didn't move.

Best of 2 reps, clearCache between; merges into BENCH_sf1_local.json
under 'r16_new_ops' (subset runs MERGE).

Usage: python tools/r16_sf1_recheck.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PLAN = {
    "sim_knn_brute": "/tmp/sf1v2",
    "sim_hybrid_rrf": "/tmp/sf1v2",
    "tx_bm25_topk": "/tmp/sf1_freq",
    "tx_bm25_maxscore": "/tmp/sf1_freq",
    "tx_maintain_cycle": "/tmp/sf1_freq",
    "st_sessionize": "/tmp/sf1v2",
    "st_transition_matrix": "/tmp/sf1v2",
}


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r16_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PLAN)
    table: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name].spark
        sf1 = PLAN[name]
        if name.startswith("sim_"):
            need = "embeddings.parquet"
        elif name.startswith("st_"):
            need = "events.parquet"
        else:
            need = "documents.parquet"
        if not os.path.exists(os.path.join(sf1, need)):
            print(f"fixture {sf1} missing {need}; run tools/gen_scale_rehearsal.py")
            return 1
        row = {"fixture": sf1}
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
        print(
            f"{name}: sf0.1 {row['sf01']}s  sf1 {row['sf1']}s  x{row['ratio']}",
            flush=True,
        )

    payload = {
        "comment": "round-16 rehearsal, best of 2 reps, local[32]; "
        "/tmp/sf1_freq = frequency-faithful 10x documents; /tmp/sf1v2 = "
        "4x embeddings + 10x-class events (vector ratios cite 4x). "
        "tx_bm25_maxscore forces the BMW machinery; its auto-dispatch "
        "parity is WAND_WIN.json's wall_maxscore_s",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    if sys.argv[1:]:
        doc.setdefault("r16_new_ops", payload)["queries"].update(table)
    else:
        doc["r16_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r16_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
