"""All-22 TPC-H sf0.1 -> sf1 scaling sweep in one artifact (r7 review #6).

Runs every TPC-H-shaped query in the registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and at the sf1-equivalent rehearsal dataset
(default /tmp/sf1 — regenerate with tools/gen_scale_rehearsal.py), best of
2 reps each, and records wall + the 10x-data scaling ratio. A ratio well
above the data growth means a super-linear plan (the q21 Expand class);
ratios are expected <= ~2.5 on local[32] because sf0.1 walls are mostly
fixed overhead (session + planning) that does not scale with data.

Merges the table into BENCH_sf1_local.json under 'tpch_sf1_sweep_<label>'
(label defaults to r8 so historical keys stay stable) and prints it as one
JSON line.

Usage: python tools/tpch_sf1_sweep.py [sf1_dir] [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    label = sys.argv[2] if len(sys.argv) > 2 else "r8"
    if not os.path.exists(os.path.join(sf1, "lineitem.parquet")):
        print(f"sf1 dir {sf1} missing; run tools/gen_scale_rehearsal.py first")
        return 1

    from data_wrangle_openstreetmaps_data_1_spark.plans import registry
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    registry._load_all()
    names = sorted(
        (n for n in registry.QUERIES if n.startswith("tpch_q")),
        key=lambda n: int(n.split("_")[1][1:]),
    )
    spark = get_spark("tpch_sf1_sweep")
    table: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name].spark
        walls = {}
        for point, d in (("sf01", sf01), ("sf1", sf1)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n_rows = len(fn(spark, d).collect())
                best = min(best, time.time() - t0)
            walls[point] = round(best, 2)
            walls[f"{point}_rows"] = n_rows
        walls["ratio"] = round(walls["sf1"] / max(walls["sf01"], 1e-9), 2)
        table[name] = walls
        print(f"{name}: sf0.1 {walls['sf01']}s  sf1 {walls['sf1']}s  x{walls['ratio']}")

    payload = {
        "comment": "all-22 TPC-H scaling sweep, best of 2 reps per point, "
        "local[32]; sf1 = tools/gen_scale_rehearsal.py replication of sf0.1 "
        "(FK-consistent 10x). Ratios <= ~2.5 expected: sf0.1 walls are "
        "dominated by fixed planning/launch overhead.",
        "queries": table,
        "worst_ratio": max(v["ratio"] for v in table.values()),
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc[f"tpch_sf1_sweep_{label}"] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({f"tpch_sf1_sweep_{label}": payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
