"""sf1 (10x) rehearsal for the round-18 OPTIMIZATION surface — the standing
discipline: every operator whose internals changed gets a 10x-data
measurement before review.

Round 18 changed EXECUTION shape only (results oracle-pinned unchanged):

- eager materialization of multi-consumer intermediates
  (partitioning.eager_cache; dedup/lmscore/passages/sketch/triangle sites) —
  kills the AQE concurrent-stage cache race that recomputed corpus-scale
  subtrees once per consumer stage;
- connected_components iterates over edge ENDPOINTS only (+ eager sym);
- minhash_lsh_join builds both fresh sides in ONE materialization job;
- write_bm25_index / write_ivf_pq_index / run_hybrid_index_stream submit
  their independent artifact writes from a thread pool (guide §2.6);
- ivf_pq_probe_batched reads the cluster histogram from a signature-keyed
  cache instead of one Spark job per probe call;
- bpe_encode truncates lineage every 3rd rule instead of every rule.

Queries below cover every changed path at sf0.1 vs the faithful suffix-
scheme 10x fixture (/tmp/sf1v2; NOTE embeddings there are 10x rows of
sf0.1's 2k). Best of 2 reps per cell; merges into BENCH_sf1_local.json
under 'r18_opt_ops'.

Usage: python tools/r18_sf1_recheck.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    # eager_cache + CC endpoint restriction + one-job union build
    "dd_minhash_lsh",
    "dd_groups_minhash",
    "dd_groups_cc",
    "dd_incremental",
    # thread-pooled index writers + histogram cache
    "tx_bm25_stored",
    "sim_ivf_pq_stored",
    # other eager_cache conversions
    "tx_lm_score",
    "tx_passage_scrub",
    "g_triangle_count",
    # encoder checkpoint cadence
    "tx_bpe_encode",
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
    spark = get_spark("r18_sf1_recheck")
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
        "comment": "round-18 OPTIMIZATION rehearsal: every operator whose "
        "execution shape changed this round, sf0.1 vs the faithful "
        "suffix-scheme 10x fixture, best of 2 reps, local[32]. Sub-linear "
        "ratios are expected where fixed job overhead dominates at sf0.1; "
        "the gate is NO super-linear blowup on the changed paths.",
        "loadavg_pre": round(la0, 2),
        "queries": table,
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc["r18_opt_ops"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"r18_opt_ops": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
