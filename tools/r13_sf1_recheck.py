"""sf1 rehearsal for the round-13 surface (the standing discipline:
every new/edited operator gets a 10x-data measurement before review).

Queries (all on the documents table only):
- tx_phrase_batch8 — NEW: the batched phrase probe (one pruned
  positions/ scan + broadcast fan-out + generic fold). Build-dominated:
  the positional build shuffles every (term, doc) pair once; the probe
  reads only the phrases' buckets.
- tx_phrase_lifecycle — NEW: full-corpus build + delete + COMPACT (full
  postings + positions rewrite — the corpus-proportional step by
  design, Lucene's segment-merge analogue) + re-add + three probes.
- st_phrase_index — NEW: 3-micro-batch streamed build of postings +
  positional sidecar, then the batched probe.
- tx_phrase_stored / tx_proximity_stored — REFRESH after the probes
  moved to the batched forms (plan constant in query count).

Fixture: /tmp/sf1_freq (plain 10x replication, NOT the suffix scheme —
phrase/proximity counts are token-frequency operators, and the suffix
scheme flattens token frequencies; under plain replication the answer
SET is invariant while per-doc counts replicate, the honest frequency
rehearsal per the round-11 discipline). Best of 2 reps; merges into
BENCH_sf1_local.json under 'r13_new_ops'.

Usage: python tools/r13_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "tx_phrase_batch8",
    "tx_phrase_lifecycle",
    "st_phrase_index",
    "tx_phrase_stored",
    "tx_proximity_stored",
    # late round-13 additions (same documents-only fixture):
    # - tx_phrase_bm25: matched set + pruned-postings dl join + stats
    # - tx_term_prefix: dictionary expansion is O(vocab) BY DESIGN — the
    #   fixture's vocabulary is replication-invariant, so the ratio reads
    #   the corpus-sized parts (index build + pruned postings)
    # - tx_term_fuzzy: neighborhood join is O(vocab x len), also
    #   replication-invariant past the index build
    "tx_phrase_bm25",
    "tx_term_prefix",
    "tx_term_fuzzy",
    # latest additions: multi-term ranked retrieval + highlighter
    "tx_bm25_multiterm",
    "tx_phrase_snippets",
]

# pass query names after the fixture dir to re-measure a subset, e.g.
#   python tools/r13_sf1_recheck.py /tmp/sf1_freq tx_bm25_multiterm
# (subset runs MERGE into the existing r13_new_ops table)


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_freq"
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        print(f"sf1 dir {sf1} missing; run tools/gen_scale_rehearsal.py first")
        return 1

    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    spark = get_spark("r13_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[2:] or NAMES
    table: dict[str, dict] = {}
    for name in names:
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
        "comment": "round-13 rehearsal, best of 2 reps, local[32], "
        "/tmp/sf1_freq plain-replication 10x fixture (frequency-faithful: "
        "phrase/proximity answer sets are replication-invariant, counts "
        "x10; document-table ratios read against 10x)",
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    if sys.argv[2:] and "r13_new_ops" in doc:  # subset run: merge
        doc["r13_new_ops"]["queries"].update(table)
    else:
        doc["r13_new_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"r13_new_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
