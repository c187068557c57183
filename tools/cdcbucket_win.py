"""Measure the CDC snapshot-bucketing win (round-7 review item #4).

The per-batch CDC merge is a full-outer join of the compacted batch against
snapshot version N. With plain-parquet snapshots BOTH sides shuffle every
micro-batch — O(snapshot) data movement per trigger forever. With bucketed
snapshots (streaming/cdc.py: write_snapshot_version) the snapshot scan
carries its hash distribution, and the batch side's single explicit
repartition to the bucket spec serves both the compact window and the join,
so the steady-state merge plan has EXACTLY ONE exchange — batch-side only.

This tool replays one steady-state merge at $SPARK_GRAFT_SF_DIR scale in
both modes and records, from the executed plan's own metrics, the exchange
count and shuffle bytes/records each plan actually moved, plus the wall
time of the full merge+write. Emits ONE JSON line and writes
CDCBUCKET_WIN.json at the repo root.

Usage: python tools/cdcbucket_win.py   [writes under /tmp/cdcbucket_win]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bucketjoin_win import shuffle_stats  # executed-plan Exchange walker

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/cdcbucket_win"


def steady_state_merge(spark, sf_dir: str, bucketed: bool) -> dict:
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table
    from data_wrangle_openstreetmaps_data_1_spark.streaming.cdc import (
        SNAPSHOT_BUCKETS,
        compact_changes,
        merge_snapshot,
        read_snapshot,
        write_snapshot_version,
    )

    mode = "bucketed" if bucketed else "plain"
    workdir = os.path.join(WORK, mode)
    os.makedirs(workdir, exist_ok=True)
    # WIDE-key changelog (key = event_id): the snapshot grows to the full
    # key space (~100k rows at sf0.1) the way a real CDC table does — the
    # sf events table's 1500 user_ids would make the snapshot side
    # trivially small and hide the data-sized re-shuffle being measured
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("user_id"), "event_type", "value", "ts", "event_id"
    )
    # batch 1 (96% of the log) builds snapshot v1; batch 2 (4%) is the
    # steady-state micro-batch whose merge we measure
    b1 = ev.where(F.col("event_id") % 25 != 0)
    b2 = ev.where(F.col("event_id") % 25 == 0)
    c1 = compact_changes(b1.repartition(SNAPSHOT_BUCKETS, "user_id"))
    empty = spark.createDataFrame([], merge_snapshot(c1, c1).schema)
    v1 = write_snapshot_version(merge_snapshot(empty, c1), workdir, 1, bucketed)

    snapshot = read_snapshot(spark, v1)
    changes = compact_changes(b2.repartition(SNAPSHOT_BUCKETS, "user_id"))
    merged = merge_snapshot(snapshot, changes)

    # exchange metrics: drive the merge subtree with an action on ITS OWN
    # QueryExecution (a .count() would plan a different query whose metrics
    # never populate merged's plan) and read the executed counters; the
    # write adds no exchange — bucketed writes hash rows into bucket files
    # task-locally
    t0 = time.time()
    n = len(merged.collect())
    metrics_wall = time.time() - t0
    stats = shuffle_stats(merged)

    t0 = time.time()
    v2 = write_snapshot_version(merged, workdir, 2, bucketed)
    write_wall = time.time() - t0
    out_rows = read_snapshot(spark, v2).count()

    for t in (v1, v2):
        if os.path.sep not in t:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return {
        "mode": mode,
        "merged_rows": n,
        "snapshot_rows_out": out_rows,
        "exchanges": stats["exchanges"],
        "shuffle_bytes": stats["shuffleBytesWritten"],
        "shuffle_records": stats["shuffleRecordsWritten"],
        "merge_wall_sec": round(metrics_wall, 3),
        "merge_plus_write_wall_sec": round(metrics_wall + write_wall, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("cdcbucket_win")
    plain = steady_state_merge(spark, sf_dir, bucketed=False)
    bucketed = steady_state_merge(spark, sf_dir, bucketed=True)
    assert bucketed["merged_rows"] == plain["merged_rows"], (bucketed, plain)
    assert bucketed["exchanges"] == 1, (
        f"bucketed steady-state merge must have exactly ONE exchange "
        f"(batch side), got {bucketed['exchanges']}"
    )
    out = {
        "metric": "cdc_snapshot_bucketing_win",
        "sf_dir": sf_dir,
        "plain": plain,
        "bucketed": bucketed,
        "shuffle_bytes_ratio": round(
            plain["shuffle_bytes"] / max(1, bucketed["shuffle_bytes"]), 2
        ),
        "note": "per steady-state micro-batch merge; plain mode re-shuffles "
        "the whole snapshot every batch, bucketed shuffles only the batch",
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "CDCBUCKET_WIN.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
