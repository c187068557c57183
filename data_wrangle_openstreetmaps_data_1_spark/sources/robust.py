"""Ingest robustness + storage hygiene: quarantined JSONL reads, schema
evolution, and small-file compaction.

Real landing zones are messy: malformed JSON lines, producers whose schema
grew a column mid-stream, and thousands of tiny files from micro-batch
writers. These helpers make the engine's behavior under each explicit and
tested, instead of whatever the default happened to be.

100 TB notes: quarantine is a PERMISSIVE read + one filter — corrupt rows
never abort the job and are preserved for replay (the alternative,
FAILFAST, turns one bad line in TB of input into a dead pipeline;
DROPMALFORMED silently loses data). Compaction is one repartition-by-size
shuffle; target partition count derives from the measured input bytes, so
output files land near the target size whatever the input fragmentation.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


class QuarantinedRead(NamedTuple):
    """good/bad splits plus the cached parsed parent — call
    ``raw.unpersist()`` once both splits are consumed, or the parse stays
    pinned in storage memory for the session lifetime."""

    good: DataFrame
    bad: DataFrame
    raw: DataFrame


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> QuarantinedRead:
    """PERMISSIVE JSONL read with an explicit schema: returns
    ``(good_rows, quarantine, raw)`` — unpersist ``raw`` when done.

    Good rows have the declared columns; quarantine rows carry the raw
    offending line in ``_corrupt_record`` for offline replay. The schema
    must be explicit — inference over corrupt input is both slow (extra
    pass) and unstable (the inferred shape depends on which lines are
    broken today).
    """
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark disallows referencing ONLY the corrupt column of a raw
        # file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented fix
        # is materializing the parsed frame first. cache() keeps the parse
        # single-pass for the two consumers (good + quarantine); for a
        # landing zone too large to cache, land the full PERMISSIVE frame
        # to parquet once and split from there instead.
        .cache()
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return QuarantinedRead(good, bad, df)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema: ``mergeSchema`` unions
    the footers' schemas; files missing a newer column yield nulls for it.
    The default (first-footer schema) silently DROPS later columns — at
    100 TB a schema-widened producer would lose its new field for every
    reader that forgot this option, which is why it is a named helper and
    not an inline read."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Compact a fragmented parquet directory into ~``target_mb`` files;
    returns the output file count.

    Partition count = ceil(input_bytes / target). ``sort_by`` re-sorts
    within output partitions (repartitionByRange + local sort) so min/max
    row-group stats stay selective after compaction — compacting WITHOUT
    re-sorting destroys the clustering that made pruning work on the
    originals.
    """
    df = spark.read.parquet(src)
    # input size from filesystem metadata (no data scan); on a real object
    # store this would come from the catalog / file listing the same way
    total_bytes = _dir_bytes(src)
    n_parts = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n_parts, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_parts)
    out.write.mode("overwrite").parquet(dst)
    import glob as _glob

    return len(_glob.glob(f"{dst}/part-*.parquet"))


def _dir_bytes(path: str) -> int:
    import glob as _glob
    import os

    return sum(
        os.path.getsize(p) for p in _glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(p) and p.endswith(".parquet")
    )
