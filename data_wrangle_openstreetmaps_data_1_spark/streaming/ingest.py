"""Streaming ingest of the ``events`` table (file source).

A streaming scan needs an explicit schema (file sources refuse inference),
but the driver's testdata has shipped ``ts`` in two physical forms across
generations: TIMESTAMP(NANOS) (read as long under
``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]`` NTZ.
The schema is therefore probed from the parquet footer with a one-off
batch read (metadata only — no data scan), and the observed form is
normalized to canonical TIMESTAMP by the same type-aware converter the
batch loader uses (functions/timeutil.py), so batch and stream produce
identical micros for the same file.

Scale notes: the parquet file source discovers new files per micro-batch
and tracks processed ones in the checkpoint — at 100 TB/day this is the
standard landing-zone pattern (upstream writers drop immutable files, the
stream picks them up). ``maxFilesPerTrigger`` bounds batch size. The
footer probe reads one footer once at stream definition, not per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.timeutil import normalize_event_ts


def _events_raw_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """Probe the events parquet footer for the physical ``ts`` type.

    Column order must match the file exactly — the parquet streaming source
    binds by name but we keep the declared order identical to the footer's
    to stay robust across Spark versions.
    """
    probed = spark.read.parquet(os.path.join(sf_dir, "events*.parquet")).schema
    # The footer type passes through as-is (epoch long, timestamp_ntz, or a
    # future format) — normalize_event_ts rejects unsupported types loudly
    # downstream, so no coercion happens here.
    ts_type = probed["ts"].dataType
    fields = {
        "event_id": LongType(),
        "user_id": LongType(),
        "event_type": StringType(),
        "value": DoubleType(),
        "props": StringType(),
    }
    return StructType(
        [
            StructField(f.name, ts_type if f.name == "ts" else fields.get(f.name, f.dataType))
            for f in probed.fields
        ]
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over the events parquet, ts normalized to TIMESTAMP."""
    # Required to read the legacy TIMESTAMP(NANOS) form; harmless otherwise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(_events_raw_schema(spark, sf_dir))
        .format("parquet")
        # the file source requires a *directory* to monitor; select just the
        # events table out of the shared sf_dir with a glob filter (the
        # wildcard admits multi-file landings — events0.parquet,
        # events1.parquet, ... — which is how the multi-batch tests feed
        # the source; the driver's testdata has exactly events.parquet)
        .option("pathGlobFilter", "events*.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    return normalize_event_ts(df, "ts")
