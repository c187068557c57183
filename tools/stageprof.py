"""Standing stage-level profiler for one registered query (event-log based).

Runs the query once warm + once measured (count action, bench-identical),
then parses the Spark event log to report per-stage wall time, task counts
and the stage-covered fraction of the query wall — the empirical view of
guide §1.1/§7.1 with the UI disabled in this sandbox. Graduated from the
round-named ``tools/r18_stageprof.py`` (r18 verdict item 9).

Usage: python tools/stageprof.py <query_name> [--top N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query")
    p.add_argument("--top", type=int, default=25, help="stages to print")
    a = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    logdir = f"/tmp/stageprof_eventlog_{os.getpid()}"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    spark = (
        SparkSession.builder.appName("stageprof")
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
    fn = query_map()[a.query]
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

    lines: list[str] = []
    for root, _dirs, files in os.walk(logdir):
        for f in files:
            if "appstatus" not in f and not f.startswith("."):
                with open(os.path.join(root, f)) as fh:
                    lines.extend(fh.readlines())
    stages: dict[int, dict] = {}
    jobs: list[int] = []
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
    print(
        f"query={a.query} wall={wall:.3f}s jobs={len(jobs)} "
        f"stages={len(stages)} sum_stage_ms={total_stage_ms}"
    )
    for sid in sorted(stages, key=lambda s: -stages[s]["ms"])[: a.top]:
        s = stages[sid]
        print(f"  stage {sid:>4} {s['ms']:>6}ms tasks={s['tasks']:>3}  {s['name']}")
    # gaps: wall not covered by any stage (driver planning, AQE, action overhead)
    iv = sorted((s["sub"], s["sub"] + s["ms"]) for s in stages.values())
    covered = 0
    cur_s, cur_e = None, None
    for b, e2 in iv:
        if cur_s is None:
            cur_s, cur_e = b, e2
        elif b <= cur_e:
            cur_e = max(cur_e, e2)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = b, e2
    if cur_s is not None:
        covered += cur_e - cur_s
    print(
        f"stage-covered wall: {covered}ms of {wall*1000:.0f}ms -> "
        f"driver/plan gaps ~{wall*1000 - covered:.0f}ms"
    )
    shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
