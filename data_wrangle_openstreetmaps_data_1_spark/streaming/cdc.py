"""Streaming CDC apply: a changelog stream merged into a keyed snapshot.

``events`` is treated as a CDC changelog on ``user_id``: every event is an
upsert of (event_type, value, ts), except ``event_type = 'error'`` which is
the tombstone (retraction) for its key. Draining the stream must leave the
snapshot equal to the batch window-argmax over the full log with
tombstoned keys removed — the registered oracle pins exactly that.

Out-of-order tolerance — the property that makes this CDC apply and not
last-write-wins-by-arrival: micro-batches are file-discovery-ordered, NOT
event-time-ordered, so a later batch may carry an *earlier* change for a
key. The merge therefore resolves each key by the CHANGE ORDER
``(ts, event_id)`` — the incoming change wins only if its (ts, event_id)
is greater than the snapshot row's — and tombstones are RETAINED as rows
(op='D') rather than deleted, so a late earlier-update cannot resurrect a
deleted key. The final read filters tombstones out.

Scale design (100 TB changelog):
- each micro-batch first COMPACTS to the latest change per key within the
  batch (one row_number over the batch — batch-sized, not corpus-sized),
  then merges via ONE full-outer equi-join on the key against the current
  snapshot: cost per batch is O(|batch| + |snapshot|) with both sides
  hash-partitioned on user_id, never a rescan of the log;
- snapshot versions are immutable BUCKETED parquet tables (v1, v2, ...,
  hash-bucketed on user_id via sources/layout.py:write_bucketed): the
  merge reads version N and writes version N+1, which is exactly the
  copy-on-write table pattern (Delta/Iceberg MERGE INTO). Because the
  snapshot scan carries its bucket distribution, the per-batch full-outer
  merge shuffles ONLY the (compacted) batch side — the snapshot is never
  re-exchanged (round-7 review item; measured from executed-plan metrics
  in tools/cdcbucket_win.py → CDCBUCKET_WIN.json, plan pinned in
  tests/test_streaming_cdc.py). Per-batch cost is O(batch-shuffle +
  snapshot-rewrite); the remaining O(snapshot) write term — rewriting
  only CHANGED buckets instead of all of them — is closed by the
  MANIFEST mode (:func:`run_cdc_apply_manifest`, round 9): a per-version
  bucket→files manifest stands in for a table format's commit log and
  the copy-on-write step touches only buckets containing batch keys;
- nothing data-sized touches the driver during the stream; the harness
  return path collects the final snapshot under a row guard purely because
  the oracle comparison needs a driver-side result (same trade as
  streaming/finite.py, documented there).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .ingest import read_events_stream

TOMBSTONE_EVENT = "error"
_MAX_DRIVER_ROWS = 200_000
# snapshot bucket count: fixed across versions so every merge sees the same
# distribution; at cluster scale size it to snapshot_bytes / target_file_size
SNAPSHOT_BUCKETS = 8

_SNAPSHOT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("op", StringType()),  # 'U' upsert | 'D' tombstone
    ]
)


def compact_changes(batch_df: DataFrame) -> DataFrame:
    """Latest change per key WITHIN a batch, by change order (ts, event_id).

    Runs before the snapshot merge so a key touched k times in one batch
    costs one snapshot-join row, not k.
    """
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        batch_df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            "user_id",
            "event_type",
            "value",
            "ts",
            "event_id",
            F.when(F.col("event_type") == TOMBSTONE_EVENT, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
    )


def merge_snapshot(snapshot: DataFrame, changes: DataFrame) -> DataFrame:
    """One full-outer equi-join on the key; per key the row with the
    greater (ts, event_id) wins. Both inputs carry _SNAPSHOT_SCHEMA."""
    s = snapshot.select([F.col(c).alias(f"s_{c}") for c in snapshot.columns])
    c = changes.select([F.col(c_).alias(f"c_{c_}") for c_ in changes.columns])
    joined = s.join(c, s.s_user_id == c.c_user_id, "full_outer")
    change_wins = F.col("s_user_id").isNull() | (
        (F.col("c_ts") > F.col("s_ts"))
        | ((F.col("c_ts") == F.col("s_ts")) & (F.col("c_event_id") > F.col("s_event_id")))
    )
    take_change = F.col("c_user_id").isNotNull() & change_wins
    pick = lambda f: F.when(take_change, F.col(f"c_{f}")).otherwise(F.col(f"s_{f}")).alias(f)  # noqa: E731
    return joined.select(*[pick(f.name) for f in _SNAPSHOT_SCHEMA.fields])


def write_snapshot_version(
    df: DataFrame, workdir: str, version: int, bucketed: bool = True
) -> str:
    """Persist snapshot version ``version``; returns the table name (bucketed
    mode) or parquet path (plain mode) to hand to :func:`read_snapshot`.

    Bucketed mode hash-buckets on ``user_id`` (SNAPSHOT_BUCKETS) so the NEXT
    merge's full-outer join satisfies the snapshot side's distribution from
    the scan — the whole point of the copy-on-write rewrite. Plain mode is
    kept for the A/B measurement in tools/cdcbucket_win.py."""
    path = os.path.join(workdir, f"v{version}")
    if not bucketed:
        df.write.parquet(path)
        return path
    from ..sources.layout import write_bucketed

    table = f"cdc_{os.path.basename(workdir).lower()}_v{version}"
    write_bucketed(df, table, path, ["user_id"], SNAPSHOT_BUCKETS)
    return table


def read_snapshot(spark: SparkSession, ref: str) -> DataFrame:
    """Read a snapshot version written by :func:`write_snapshot_version` —
    a catalog table name (bucketed; scan carries the bucket distribution)
    or a parquet path (plain mode)."""
    return spark.read.parquet(ref) if os.path.sep in ref else spark.table(ref)


def run_cdc_apply_once(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    bucketed: bool = True,
) -> DataFrame:
    """Drain the events changelog into a snapshot and return the live rows.

    Each micro-batch: compact → merge with snapshot version N → write
    version N+1 (immutable bucketed parquet; only the batch side shuffles —
    module docstring). The returned DataFrame is the final version with
    tombstones filtered, shaped for the oracle comparison.
    """
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger)
    workdir = tempfile.mkdtemp(prefix="cdc_apply_")
    state: dict = {"ref": None, "version": 0, "tables": []}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # ONE batch-side exchange serves the whole merge: repartitioning to
        # the snapshot's bucket spec satisfies BOTH the compact window's
        # clustering and the join's co-partitioning with the bucketed scan
        # (an explicit numPartitions repartition is AQE-stable), so the
        # steady-state plan has zero snapshot-side exchanges
        changes = compact_changes(
            batch_df.repartition(SNAPSHOT_BUCKETS, "user_id")
        )
        if state["ref"] is None:
            snapshot = spark.createDataFrame([], _SNAPSHOT_SCHEMA)
        else:
            snapshot = read_snapshot(spark, state["ref"])
        state["version"] += 1
        ref = write_snapshot_version(
            merge_snapshot(snapshot, changes), workdir, state["version"], bucketed
        )
        state["ref"] = ref
        if os.path.sep not in ref:
            state["tables"].append(ref)

    # start/awaitTermination INSIDE the try: a stream failure (or an
    # exception raised in process_batch) must still reach the finally's
    # DROP TABLE loop + rmtree, else the uniquely-named saveAsTable
    # entries and the tempfile workdir accumulate across failed runs
    # (ADVICE r8).
    try:
        q = (
            stream.writeStream.foreachBatch(process_batch)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["ref"] is None:
            return spark.createDataFrame([], "user_id long, last_event_type string, last_value double, last_ts string")
        final = (
            read_snapshot(spark, state["ref"])
            .where(F.col("op") != "D")
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.round("value", 2).alias("last_value"),
                F.col("ts").cast("string").alias("last_ts"),
            )
        )
        rows = final.collect()
        if len(rows) > _MAX_DRIVER_ROWS:
            raise ValueError(
                f"run_cdc_apply_once snapshot has {len(rows)} rows "
                f"(max {_MAX_DRIVER_ROWS}); keep the parquet snapshot and read "
                "it directly instead of collecting"
            )
        return spark.createDataFrame(rows, final.schema)
    finally:
        # the returned rows are materialized, so the version chain can go
        for t in state["tables"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(workdir, ignore_errors=True)


def _bucket_of(col, n_buckets: int = SNAPSHOT_BUCKETS):
    """Manifest-mode bucket id: pmod(xxhash64(key), n) computed by US (not
    Spark's table bucketing), so it is stable across versions and
    recomputable from any row without file metadata."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def run_cdc_apply_manifest(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    stats_out: dict | None = None,
    n_buckets: int = SNAPSHOT_BUCKETS,
) -> DataFrame:
    """CDC apply with a per-version BUCKET MANIFEST: copy-on-write rewrites
    only buckets containing batch keys — the last O(snapshot) per-trigger
    term of :func:`run_cdc_apply_once` removed.

    The snapshot is a driver-side dict ``bucket_id -> parquet dir`` (at
    most SNAPSHOT_BUCKETS entries — scalars, never data). Per micro-batch:

    1. compact the batch (one batch-sized window);
    2. ``changed`` = distinct bucket ids of batch keys — a <=
       SNAPSHOT_BUCKETS-row collect;
    3. read ONLY the changed buckets' current files, merge with the batch
       (same full-outer (ts, event_id)-ordered merge as the bucketed-table
       mode — tombstones retained, out-of-order safe);
    4. write the merged rows partitioned by bucket id under ``v{N}/`` and
       repoint ONLY the changed manifest entries; unchanged buckets keep
       their existing files untouched — no read, no rewrite.

    Every output row hashes to a changed bucket (old rows were read only
    from changed buckets; batch rows define them), so unchanged entries
    stay exact.

    Scale: per-trigger cost is O(|batch| + |changed buckets| ×
    bucket_size); with bucket count sized to snapshot_bytes /
    target_file_size (the same rule the bucketed mode documents), bucket
    size is a constant and the trigger is O(batch) — the Iceberg/Delta
    MERGE file-pruning pattern, with the manifest standing in for the
    commit log. Honest trade vs the bucketed-table mode: raw parquet
    scans carry no bucket metadata, so the merge join exchanges BOTH
    sides of the CHANGED SUBSET (O(changed) — still strictly less than
    the full-snapshot rewrite it replaces at steady state); a
    transactional table format recovers the exchange-free snapshot side
    on top of this same manifest idea. Measured: tools/cdc_manifest_win.py
    -> CDCMANIFEST_WIN.json (bytes/files rewritten per trigger vs the
    full-rewrite mode).

    ``stats_out``: optional dict; filled with per-batch
    ``[(n_changed_buckets, n_manifest_buckets)]`` for the win artifact.
    """
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger)
    workdir = tempfile.mkdtemp(prefix="cdc_manifest_")
    state: dict = {"manifest": {}, "version": 0}
    if stats_out is not None:
        stats_out["batches"] = []
        stats_out["workdir"] = workdir

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist: TWO actions consume the compacted batch (the changed-
        # bucket distinct collect below, then the merge+write) — without a
        # cache the batch re-reads its source files and re-runs the compact
        # window per trigger, doubling the O(batch) work this mode exists
        # to minimize (review r9). Unpersisted in the finally below.
        changes = (
            compact_changes(batch_df.repartition(n_buckets, "user_id"))
            .withColumn("__b", _bucket_of(F.col("user_id"), n_buckets))
            .persist()
        )
        try:
            changed = sorted(
                r["__b"] for r in changes.select("__b").distinct().collect()
            )  # bounded: <= n_buckets scalar rows
            if not changed:
                return
            old_paths = [
                state["manifest"][b] for b in changed if b in state["manifest"]
            ]
            snapshot_part = (
                spark.read.schema(_SNAPSHOT_SCHEMA).parquet(*old_paths)
                if old_paths
                else spark.createDataFrame([], _SNAPSHOT_SCHEMA)
            )
            merged = merge_snapshot(snapshot_part, changes.drop("__b"))
            state["version"] += 1
            outdir = os.path.join(workdir, f"v{state['version']}")
            (
                merged.withColumn("__b", _bucket_of(F.col("user_id"), n_buckets))
                .repartition(len(changed), "__b")
                .write.partitionBy("__b")
                .parquet(outdir)
            )
        finally:
            # advice r9: a merge/write failure must not leak the cached
            # batch — unpersist on every exit path, not just success
            changes.unpersist()
        for b in changed:
            state["manifest"][b] = os.path.join(outdir, f"__b={b}")
        if stats_out is not None:
            stats_out["batches"].append((len(changed), len(state["manifest"])))

    ok = False
    try:
        q = (
            stream.writeStream.foreachBatch(process_batch)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not state["manifest"]:
            ok = True
            return spark.createDataFrame(
                [], "user_id long, last_event_type string, last_value double, last_ts string"
            )
        final = (
            spark.read.schema(_SNAPSHOT_SCHEMA)
            .parquet(*state["manifest"].values())
            .where(F.col("op") != "D")
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.round("value", 2).alias("last_value"),
                F.col("ts").cast("string").alias("last_ts"),
            )
        )
        rows = final.collect()
        if len(rows) > _MAX_DRIVER_ROWS:
            raise ValueError(
                f"run_cdc_apply_manifest snapshot has {len(rows)} rows "
                f"(max {_MAX_DRIVER_ROWS}); keep the parquet snapshot and "
                "read it directly instead of collecting"
            )
        ok = True
        return spark.createDataFrame(rows, final.schema)
    finally:
        # stats mode keeps the workdir ONLY on success (caller measures
        # file sizes, then removes it); on failure remove it regardless so
        # an exception never strands temp parquet (advice r9)
        if stats_out is None or not ok:
            shutil.rmtree(workdir, ignore_errors=True)
