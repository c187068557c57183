"""CDC apply (streaming/cdc.py): multi-batch replay and merge semantics.

The registry oracle (st_cdc_apply) checks the single-batch drain; these
tests pin what the oracle can't see — merge behavior ACROSS micro-batches
when the changelog arrives out of event-time order, and the tombstone
rules.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table
from data_wrangle_openstreetmaps_data_1_spark.streaming.cdc import (
    _SNAPSHOT_SCHEMA,
    compact_changes,
    merge_snapshot,
    run_cdc_apply_once,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def interleaved_events_dir(spark, tmp_path_factory):
    """sf0.001 events split into 3 files by event_id % 3: every file spans
    the WHOLE time range, so with maxFilesPerTrigger=1 each micro-batch
    carries changes both older and newer than what the snapshot already
    holds — the out-of-order case the (ts, event_id) merge rule exists for."""
    import glob
    import shutil

    parent = tmp_path_factory.mktemp("cdc_src")
    events = load_table(spark, SF, "events")
    for i in range(3):
        staging = str(parent / f"_staging{i}")
        events.where(F.col("event_id") % 3 == i).coalesce(1).write.parquet(staging)
        # the stream's pathGlobFilter matches leaf FILES named
        # events*.parquet, so surface each chunk as a single such file
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.move(part, str(parent / f"events{i}.parquet"))
        shutil.rmtree(staging)
    return str(parent)


def test_cdc_multi_batch_out_of_order_equals_batch(spark, interleaved_events_dir):
    streamed = run_cdc_apply_once(spark, interleaved_events_dir, max_files_per_trigger=1)
    got = {(r["user_id"], r["last_event_type"], r["last_value"], r["last_ts"])
           for r in streamed.collect()}

    events = load_table(spark, SF, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    expected = {
        (r["user_id"], r["last_event_type"], r["last_value"], r["last_ts"])
        for r in (
            events.withColumn("rk", F.row_number().over(w))
            .where((F.col("rk") == 1) & (F.col("event_type") != "error"))
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.round("value", 2).alias("last_value"),
                F.col("ts").cast("string").alias("last_ts"),
            )
            .collect()
        )
    }
    assert got == expected


def _snap(spark, rows):
    return spark.createDataFrame(rows, _SNAPSHOT_SCHEMA)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_late_update_cannot_resurrect_tombstone(spark):
    snapshot = _snap(spark, [(1, "error", 0.0, _ts("2024-01-01T00:10:00"), 100, "D")])
    late_update = _snap(spark, [(1, "click", 5.0, _ts("2024-01-01T00:05:00"), 50, "U")])
    merged = merge_snapshot(snapshot, late_update).collect()
    assert len(merged) == 1 and merged[0]["op"] == "D"


def test_later_update_resurrects_deleted_key(spark):
    snapshot = _snap(spark, [(1, "error", 0.0, _ts("2024-01-01T00:10:00"), 100, "D")])
    re_insert = _snap(spark, [(1, "view", 7.0, _ts("2024-01-01T00:20:00"), 200, "U")])
    merged = merge_snapshot(snapshot, re_insert).collect()
    assert len(merged) == 1 and merged[0]["op"] == "U" and merged[0]["value"] == 7.0


def test_equal_ts_resolved_by_event_id(spark):
    snapshot = _snap(spark, [(1, "view", 1.0, _ts("2024-01-01T00:10:00"), 100, "U")])
    same_ts = _snap(spark, [(1, "click", 2.0, _ts("2024-01-01T00:10:00"), 99, "U")])
    merged = merge_snapshot(snapshot, same_ts).collect()
    assert merged[0]["event_id"] == 100  # lower event_id loses at equal ts


def test_compact_keeps_only_latest_change_per_key(spark):
    batch = spark.createDataFrame(
        [
            (1, "click", 1.0, _ts("2024-01-01T00:01:00"), 10),
            (1, "view", 2.0, _ts("2024-01-01T00:03:00"), 11),
            (2, "error", 0.0, _ts("2024-01-01T00:02:00"), 12),
        ],
        "user_id long, event_type string, value double, ts timestamp, event_id long",
    )
    out = {r["user_id"]: r for r in compact_changes(batch).collect()}
    assert out[1]["event_id"] == 11 and out[1]["op"] == "U"
    assert out[2]["op"] == "D"


def test_bucketed_snapshot_merge_shuffles_batch_side_only(spark, tmp_path):
    """The steady-state merge plan over a BUCKETED snapshot has exactly ONE
    exchange — the batch side's explicit bucket-spec repartition; the
    snapshot scan satisfies its distribution from the bucket metadata. The
    plain-parquet snapshot costs a second, snapshot-sized exchange every
    micro-batch (measured at sf0.1 in CDCBUCKET_WIN.json: 26x the shuffle
    bytes). Counted from the EXECUTED plan so AQE can't hide one."""
    from data_wrangle_openstreetmaps_data_1_spark.streaming.cdc import (
        SNAPSHOT_BUCKETS,
        read_snapshot,
        write_snapshot_version,
    )

    def n_exchanges(df):
        total = 0
        stack = [df._jdf.queryExecution().executedPlan()]
        while stack:
            node = stack.pop()
            name = node.nodeName()
            if name.startswith("Exchange"):
                total += 1
            if "QueryStage" in name:
                stack.append(node.plan())
                continue
            if name.startswith("AdaptiveSparkPlan"):
                stack.append(node.executedPlan())
                continue
            ch = node.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
        return total

    base = _snap(
        spark,
        [(i, "view", float(i), _ts("2024-01-01T00:10:00"), i, "U") for i in range(200)],
    )
    for bucketed, want in ((True, 1), (False, 2)):
        workdir = str(tmp_path / ("b" if bucketed else "p"))
        import os as _os

        _os.makedirs(workdir)
        ref = write_snapshot_version(base, workdir, 1, bucketed=bucketed)
        batch = _snap(
            spark,
            [(7, "click", 9.0, _ts("2024-01-01T01:00:00"), 1000, "U")],
        ).repartition(SNAPSHOT_BUCKETS, "user_id")
        merged = merge_snapshot(read_snapshot(spark, ref), batch)
        assert merged.count() == 200
        assert n_exchanges(merged) == want, f"bucketed={bucketed}"
        if _os.path.sep not in ref:
            spark.sql(f"DROP TABLE IF EXISTS {ref}")


def test_cdc_manifest_multi_batch_equals_batch(spark, interleaved_events_dir):
    """Manifest mode (changed-bucket-only rewrite) under the same
    out-of-order 3-batch replay: result must equal the batch window-argmax
    — a green run proves the file-pruned path loses no key and the
    (ts, event_id) merge rule survives bucket pruning."""
    from data_wrangle_openstreetmaps_data_1_spark.streaming.cdc import (
        run_cdc_apply_manifest,
    )

    stats: dict = {}
    streamed = run_cdc_apply_manifest(
        spark, interleaved_events_dir, max_files_per_trigger=1, stats_out=stats
    )
    got = {
        (r["user_id"], r["last_event_type"], r["last_value"], r["last_ts"])
        for r in streamed.collect()
    }
    events = load_table(spark, SF, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    expected = {
        (r["user_id"], r["last_event_type"], r["last_value"], r["last_ts"])
        for r in (
            events.withColumn("rk", F.row_number().over(w))
            .where((F.col("rk") == 1) & (F.col("event_type") != "error"))
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.round("value", 2).alias("last_value"),
                F.col("ts").cast("string").alias("last_ts"),
            )
            .collect()
        )
    }
    assert got == expected
    assert len(stats["batches"]) == 3  # one entry per micro-batch
    import shutil

    shutil.rmtree(stats["workdir"], ignore_errors=True)


def test_cdc_manifest_rewrites_only_changed_buckets(spark, tmp_path):
    """A second batch touching ONE key must rewrite only that key's bucket:
    the other manifest entries keep pointing at version-1 files (no read,
    no rewrite), and the untouched keys' rows still come back exact."""
    import glob
    import os
    import shutil

    from data_wrangle_openstreetmaps_data_1_spark.streaming.cdc import (
        run_cdc_apply_manifest,
    )

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: 40 keys spread over the bucket space; batch 2: key 7 only
    b1 = spark.createDataFrame(
        [(k, 100 + k, "view", float(k)) for k in range(40)],
        "user_id long, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    b2 = spark.createDataFrame(
        [(7, 1000, "purchase", 99.0)],
        "user_id long, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-02 00:00:00")))
    for i, b in enumerate((b1, b2)):
        staging = str(tmp_path / f"_st{i}")
        b.select("user_id", "event_type", "value", "ts", "event_id").coalesce(
            1
        ).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.move(part, str(src / f"events{i}.parquet"))
        shutil.rmtree(staging)

    stats: dict = {}
    got = {
        (r["user_id"], r["last_event_type"], r["last_value"])
        for r in run_cdc_apply_manifest(
            spark, str(src), max_files_per_trigger=1, stats_out=stats
        ).collect()
    }
    want = {(k, "view", float(k)) for k in range(40) if k != 7} | {(7, "purchase", 99.0)}
    assert got == want
    # batch 2 changed exactly one bucket, out of the buckets batch 1 filled
    (n1, total1), (n2, total2) = stats["batches"]
    assert n2 == 1 and total2 == total1 and n1 >= 4
    # and version 2 on disk holds ONLY that bucket's directory
    v2_dirs = [d for d in os.listdir(os.path.join(stats["workdir"], "v2")) if d.startswith("__b=")]
    assert len(v2_dirs) == 1
    shutil.rmtree(stats["workdir"], ignore_errors=True)
