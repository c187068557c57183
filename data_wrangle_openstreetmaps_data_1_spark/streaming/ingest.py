"""Streaming ingest of the ``events`` table (file source).

A streaming scan needs an explicit schema (file sources refuse inference),
so the batch loader's nanos-handling is replicated here: ``ts`` arrives as
TIMESTAMP(NANOS) parquet, is read as long under
``spark.sql.legacy.parquet.nanosAsLong``, and converted to a microsecond
timestamp.

Scale notes: the parquet file source discovers new files per micro-batch
and tracks processed ones in the checkpoint — at 100 TB/day this is the
standard landing-zone pattern (upstream writers drop immutable files, the
stream picks them up). ``maxFilesPerTrigger`` bounds batch size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over the events parquet, ts converted to timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        # the file source requires a *directory* to monitor; select just the
        # events table out of the shared sf_dir with a glob filter
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
