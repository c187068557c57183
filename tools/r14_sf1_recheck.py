"""sf1 rehearsal for the round-14 surface (standing discipline: every
new/edited operator gets a 10x-data measurement before review).

Queries and their fixtures:
- tx_term_suffix_lifecycle (/tmp/sf1_freq) — build 80% + ADD + suffix
  probe through the lifecycle-rebuilt reversed dictionary, then DELETE +
  bucket-SELECTIVE compact + probe. Plain replication keeps the
  vocabulary invariant (suffix expansion is O(vocab)), so the ratio
  reads the corpus-sized parts: index build, add, compact rewrite.
- tx_phrase_paged (/tmp/sf1_freq) — two chained search_after pages on
  the phrase ranking; phrase counts are token-frequency quantities, so
  the frequency-faithful fixture applies (answer set invariant, counts
  x10).
- tx_bm25_facets_stored (/tmp/sf1_freq) — build + sidecar + add + stored
  facet rollup (facet counts x10 under replication, ranking invariant).
- sim_hybrid_filtered (/tmp/sf1v2) — both filtered index probes + RRF.
  sf1v2 is the faithful suffix-scheme corpus and the ONLY fixture with a
  scaled embeddings table (4x sf0.1 — cite ratios against 4x for the
  vector leg, 10x for the documents side, per the r11 discipline).

Best of 2 reps, clearCache between; merges into BENCH_sf1_local.json
under 'r14_new_ops'.

Usage: python tools/r14_sf1_recheck.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> sf1-equivalent fixture dir
PLAN = {
    "tx_term_suffix_lifecycle": "/tmp/sf1_freq",
    "tx_phrase_paged": "/tmp/sf1_freq",
    "tx_bm25_facets_stored": "/tmp/sf1_freq",
    "sim_hybrid_filtered": "/tmp/sf1v2",
}


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r14_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PLAN)
    table: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name].spark
        sf1 = PLAN[name]
        if not os.path.exists(os.path.join(sf1, "documents.parquet")):
            print(f"fixture {sf1} missing; run tools/gen_scale_rehearsal.py")
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
        "comment": "round-14 rehearsal, best of 2 reps, local[32]; "
        "/tmp/sf1_freq = plain-replication 10x (frequency-faithful), "
        "/tmp/sf1v2 = suffix-scheme 10x docs + 4x embeddings (the vector "
        "leg's ratio reads against 4x data)",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    if sys.argv[1:] and "r14_new_ops" in doc:  # subset run: merge
        doc["r14_new_ops"]["queries"].update(table)
    else:
        doc["r14_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r14_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
