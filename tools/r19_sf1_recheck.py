"""sf1 (10x) rehearsal for the round-19 OPTIMIZATION surface — the standing
discipline: every operator whose internals changed gets a 10x-data
measurement before review.

Round 19 changed EXECUTION shape only (results oracle-pinned unchanged):

- write_bm25_index fuses the optional sidecars (positions / docstore /
  reversed terms / facets) into the pooled write phase, sharing ONE
  tokenize scan (guide §2.3 + §2.6); the query layer's independent
  per-shard segment builds overlap via partitioning.overlap_jobs;
- the BPE trainer and both connected-components loops ride their
  per-round convergence aggregate on a LAZY checkpoint
  (truncate_lineage_lazy): 1 job/round instead of 2;
- sim_hybrid_stored / sim_hybrid_filtered overlap the lexical build with
  the train->vector-build chain;
- minhash_lsh_join's fresh-both-sides build is re-adjudicated
  (SPARK_GRAFT_INCR_BUILD union vs pool; the winner is the default).

Queries below cover every changed path at sf0.1 vs the faithful suffix-
scheme 10x fixture (/tmp/sf1v2). Best of 2 reps per cell; merges into
BENCH_sf1_local.json under 'r19_opt_ops'.

Usage: python tools/r19_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    # fused-sidecar builds (positions / rterms / facets / docstore)
    "tx_phrase_lifecycle",
    "tx_term_suffix_lifecycle",
    "tx_bm25_facets_stored",
    "tx_bm25_snippets_stored",
    # overlapped per-shard segment builds
    "tx_bm25_tiered",
    "tx_maintain_cycle",
    "tx_bm25_merged",
    # streaming first-batch fused build
    "st_phrase_index",
    # overlapped hybrid build chains
    "sim_hybrid_stored",
    # lazy-checkpoint round fusion (trainer + both CC loops)
    "tx_bpe_merges",
    "dd_groups_cc",
    "dd_groups_cc_star",
    # incremental-join build adjudication
    "dd_incremental",
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
    spark = get_spark("r19_sf1_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    la0 = os.getloadavg()[0]
    table: dict[str, dict] = {}
    for name in NAMES:
        fn = registry.QUERIES[name].spark
        row: dict = {}
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
        "comment": "round-19 OPTIMIZATION rehearsal: every operator whose "
        "execution shape changed this round, sf0.1 vs the faithful "
        "suffix-scheme 10x fixture, best of 2 reps, local[32]. Sub-linear "
        "ratios are expected where fixed job overhead dominates at sf0.1; "
        "the gate is NO super-linear blowup on the changed paths.",
        "loadavg_pre": round(la0, 2),
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r19_opt_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"r19_opt_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
