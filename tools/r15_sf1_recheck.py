"""sf1 rehearsal for the round-15 surface (standing discipline: every
new/edited operator gets a 10x-data measurement before review).

Queries and their fixtures:
- tx_bm25_maxscore (/tmp/sf1_freq) — MaxScore probe at 10x postings per
  probed term (frequency-faithful fixture: query terms match 10x docs).
  The candidate-generation row cut is ledgered separately (WAND_WIN.json,
  built on the corpus's own most-skewed term); this row reads the
  end-to-end wall ratio.
- tx_bm25_composed (/tmp/sf1_freq) — 3-dial synonyms x filter x
  search_after, both pages.
- tx_bm25_snippets_stored (/tmp/sf1_freq) — build + docstore sidecar +
  lifecycle add + stored-snippet page.
- tx_maintain_cycle (/tmp/sf1_freq) — two segment builds + ~14% deletes
  + the full maintenance cycle (trigger compactions + tiered merge to one
  segment) + the ranked probe. The heaviest r15 row by construction: the
  cycle REWRITES data, so near-linear scaling is the honest expectation;
  boundedness (bytes rewritten ~ victims' vocabulary for compaction,
  one pass for the merge) is what the cycle guarantees, not sublinearity.
- sim_ivf_pq_filtered_auto (/tmp/sf1v2) — cost-based filtered ANN
  against the 4x embeddings table (cite the ratio against 4x, per the
  r11 discipline; the crossover cost model is VECFILTERPLAN_WIN.json).

Best of 2 reps, clearCache between; merges into BENCH_sf1_local.json
under 'r15_new_ops' (subset runs MERGE — the r14 ADVICE fix).

Usage: python tools/r15_sf1_recheck.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> sf1-equivalent fixture dir (embeddings only exist in sf1v2, 4x)
PLAN = {
    "tx_bm25_maxscore": "/tmp/sf1_freq",
    "tx_bm25_composed": "/tmp/sf1_freq",
    "tx_bm25_snippets_stored": "/tmp/sf1_freq",
    "tx_maintain_cycle": "/tmp/sf1_freq",
    "sim_ivf_pq_filtered_auto": "/tmp/sf1v2",
}


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r15_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PLAN)
    table: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name].spark
        sf1 = PLAN[name]
        need = "embeddings.parquet" if name.startswith("sim_") else "documents.parquet"
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
        "comment": "round-15 rehearsal, best of 2 reps, local[32]; "
        "/tmp/sf1_freq = frequency-faithful 10x documents; /tmp/sf1v2 = "
        "faithful suffix corpus with the 4x embeddings table (vector "
        "ratios cite 4x)",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    if sys.argv[1:]:
        doc.setdefault("r15_new_ops", payload)["queries"].update(table)
    else:
        doc["r15_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r15_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
