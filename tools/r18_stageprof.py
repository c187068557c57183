"""Stage-level profile of one registered query via the Spark event log.

Runs the query once (count action, bench-identical), then parses the event
log to report per-job/per-stage wall time, task counts, and total task time
— the empirical view the guide (§1.1, §7.1) asks for, with the UI disabled
in this sandbox.

Usage: python tools/r18_stageprof.py <query_name>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    logdir = "/tmp/r18_eventlog"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import bench_queries, query_map

    spark = (
        SparkSession.builder.appName("r18_stageprof")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", logdir)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = query_map()[name] if name not in bench_queries() else bench_queries()[name]
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64_000_000).selectExpr("sum(id % 7)").collect()

    # one warm rep (uncounted), then the measured rep
    spark.catalog.clearCache()
    fn(spark, sf_dir).count()
    spark.catalog.clearCache()
    mark = time.time() * 1000.0
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    spark.stop()

    logfiles = []
    for root, _dirs, files in os.walk(logdir):
        for f in files:
            if "appstatus" not in f and not f.startswith("."):
                logfiles.append(os.path.join(root, f))
    stages = {}
    jobs = []
    lines = []
    for lf in logfiles:
        with open(lf) as fh:
            lines.extend(fh.readlines())
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub is None or com is None or com < mark:
                    continue
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "ms": com - sub,
                    "tasks": si["Number of Tasks"],
                    "sub": sub,
                }
            elif e == "SparkListenerJobStart":
                if ev.get("Submission Time", 0) >= mark:
                    jobs.append(ev["Job ID"])
    total_stage_ms = sum(s["ms"] for s in stages.values())
    print(f"query={name} wall={wall:.3f}s jobs={len(jobs)} stages={len(stages)} sum_stage_ms={total_stage_ms}")
    for sid in sorted(stages, key=lambda s: -stages[s]["ms"])[:25]:
        s = stages[sid]
        print(f"  stage {sid:>4} {s['ms']:>6}ms tasks={s['tasks']:>3}  {s['name']}")
    # gaps: time not covered by any stage (driver-side planning, AQE, action overhead)
    iv = sorted((s["sub"], s["sub"] + s["ms"]) for s in stages.values())
    covered = 0
    cur_s, cur_e = None, None
    for a, b in iv:
        if cur_s is None:
            cur_s, cur_e = a, b
        elif a <= cur_e:
            cur_e = max(cur_e, b)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = a, b
    if cur_s is not None:
        covered += cur_e - cur_s
    print(f"stage-covered wall: {covered}ms of {wall*1000:.0f}ms -> driver/plan gaps ~{wall*1000 - covered:.0f}ms")


if __name__ == "__main__":
    main()
