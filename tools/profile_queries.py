"""Standing query profiler: isolate and time individual registered queries.

The r18 round's measurement discipline (interleaved reps, calibration
probes bracketing the battery, bench-identical ``.count()`` action,
clearCache between reps), graduated from the round-named
``tools/r18_profile.py`` to a standing tool (r18 verdict item 9) with
argparse (the hand-rolled flag parsing could remove the wrong element when
a flag value collided with a query name — r18 ADVICE low).

Unlike the r18 version this resolves ANY registered query, not just the
bench subset — the expensive stored-index lifecycle queries live outside
the bench set.

Usage:
    python tools/profile_queries.py <query> [<query> ...] [--reps N]
        [--explain DIR] [--suffix before|after]
    python tools/profile_queries.py --all-bench --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("queries", nargs="*", help="registered query names")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--explain", metavar="DIR", default=None,
                   help="dump explain('formatted') of each query to DIR")
    p.add_argument("--suffix", default="before",
                   help="plan-file suffix: <query>_<suffix>.txt")
    p.add_argument("--all-bench", action="store_true",
                   help="profile every bench query")
    a = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import (
        bench_queries,
        query_map,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("profile_queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qm = query_map()
    names = list(bench_queries()) if a.all_bench else a.queries
    unknown = [n for n in names if n not in qm]
    if unknown:
        p.error(f"unknown queries: {unknown}")

    # warm-up, mirroring bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64_000_000).selectExpr("sum(id % 7)").collect()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(64_000_000).selectExpr("sum(id % 7)").collect()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, object] = {
        "calib_pre": calib(),
        "loadavg": round(os.getloadavg()[0], 2),
    }
    results: dict[str, list[float]] = {}
    for name in names:
        fn = qm[name]
        t: list[float] = []
        for _ in range(a.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            t.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = t
        if a.explain:
            os.makedirs(a.explain, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            with open(os.path.join(a.explain, f"{name}_{a.suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(mode))
            spark.catalog.clearCache()
        print(f"{name}: min={min(t)} reps={t}", file=sys.stderr)
    out["calib_post"] = calib()
    out["results"] = results
    out["mins"] = {k: min(v) for k, v in results.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
