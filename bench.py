"""Driver bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() action (no driver-side materialization
of result rows — mirrors how the plan would execute on a cluster). A short
warm-up runs one trivial action first so JVM/codegen startup isn't billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import bench_queries
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads, not billed to any query
    spark.range(1000).selectExpr("sum(id)").collect()

    # best-of-2: this host (a shared VM) shows multi-second wall-clock noise;
    # the min of two runs reflects the plan's actual cost. clearCache between
    # repetitions so a repeat never reads the previous run's persisted data
    # (CacheManager matches canonicalized plans) — each rep does full work.
    timings: dict[str, float] = {}
    for name, fn in bench_queries().items():
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
