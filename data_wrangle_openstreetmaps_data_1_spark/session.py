"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the config choices below are the ones that
matter on a real multi-executor cluster at 100 TB:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting —
  the reference's `created.user` distribution is heavily skewed: one user
  owns ~35% of all edits, reference readme.md:184-192).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  would be ~2-3x total cores and AQE coalesces down.
- Arrow enabled for the few pandas_udf paths (geo ray-casting, multimodal
  stubs) — Arrow batch transfer beats row-at-a-time pickling by 10-100x.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "data_wrangle_openstreetmaps_data_1_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Production knobs (guide §6/§9), env-parameterized so the bench
        # stays methodology-comparable across rounds while a cluster
        # deployment can flip them without code edits:
        # - shuffle/spill codec: lz4 default locally; zstd trades CPU for
        #   ratio — the win appears when shuffle bytes cross a real NIC,
        #   which local[N] never shows (r19 sf1 A/B in OPTIMIZATION_r19.md)
        # - scan split size: 128m default locally (the sf fixtures are
        #   single-row-group files anyway); 512m-1g cuts task-scheduling
        #   overhead and map-task count on large sequential cluster scans
        .config("spark.io.compression.codec", os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"))
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # The driver's events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as long and convert in the
        # loader (sources/tables.py) — truncation to micros matches what
        # DuckDB/pandas do natively.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
