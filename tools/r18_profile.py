"""r18 optimization round: isolate and time individual bench queries.

Usage:
    python tools/r18_profile.py <query> [<query> ...] [--reps N] [--explain DIR]
    python tools/r18_profile.py --all-bench --reps 3

Times each query with the same ``.count()`` action as bench.py (so numbers
are comparable to BENCH_r*.json), best-of-N with clearCache between reps,
and can dump ``explain("formatted")`` to a directory (plans/r18/). Prints a
calibration probe (bench.py's fixed JVM job) before and after so a noisy
host is visible in the artifact itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    explain_dir = None
    suffix = "before"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reps":
            reps = int(argv[i + 1])
            args.remove(argv[i + 1])
        if a == "--explain":
            explain_dir = argv[i + 1]
            args.remove(argv[i + 1])
        if a == "--suffix":
            suffix = argv[i + 1]
            args.remove(argv[i + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import bench_queries
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("r18_profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bq = bench_queries()
    if "--all-bench" in argv:
        args = list(bq.keys())

    # warm-up, mirroring bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64_000_000).selectExpr("sum(id % 7)").collect()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(64_000_000).selectExpr("sum(id % 7)").collect()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, object] = {"calib_pre": calib(), "loadavg": round(os.getloadavg()[0], 2)}
    results: dict[str, list[float]] = {}
    for name in args:
        fn = bq[name]
        t: list[float] = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r18_profile:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            t.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = t
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(mode))
            spark.catalog.clearCache()
        print(f"{name}: min={min(t)} reps={t}", file=sys.stderr)
    out["calib_post"] = calib()
    out["results"] = results
    out["mins"] = {k: min(v) for k, v in results.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
