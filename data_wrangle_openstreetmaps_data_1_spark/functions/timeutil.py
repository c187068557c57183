"""Timestamp-dtype-robust event-time normalization.

The driver's synthetic ``events.parquet`` has shipped ``ts`` in two
different physical forms across testdata generations:

- TIMESTAMP(NANOS), which Spark reads as ``long`` under
  ``spark.sql.legacy.parquet.nanosAsLong`` (Spark has no nanosecond type);
- plain ``timestamp[us]`` with no timezone, which Spark reads as
  ``TIMESTAMP_NTZ``.

Every downstream operator (sessionization gap arithmetic, watermarked
windows, stream-stream join bands) wants one canonical type: ``TIMESTAMP``
(with-timezone instant) whose instant equals the file's wall-clock value
interpreted as UTC — exactly what DuckDB's ``epoch_us(ts)`` yields on the
same parquet, so the SQL oracle and the engine agree bit-for-bit.

The NTZ branch must NOT depend on ``spark.sql.session.timeZone`` (the
driver supplies its own, untuned SparkSession): a plain
``cast("timestamp")`` re-interprets the wall clock in the session zone and
would shift every instant on a non-UTC host.  ``timestampdiff`` against an
NTZ epoch literal is timezone-free, so micros-since-epoch come out
identical on any session configuration.

Reference anchor: the events table is the engine's stand-in for the
reference's ``created.timestamp`` attribute (reference ProjectCodeUsed/data.py:20
stores ISO-8601 strings; SURVEY.md §1.2), upgraded here to real
timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, LongType, TimestampNTZType, TimestampType

#: timezone-free micros-since-epoch for a TIMESTAMP_NTZ column.
_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ntz_micros(col: str) -> Column:
    """Micros since epoch for an NTZ column, independent of session timezone."""
    return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})")


def canonical_event_ts(dtype: DataType, col: str) -> Column:
    """Expression converting ``col`` of observed ``dtype`` to TIMESTAMP.

    - ``LongType``: legacy TIMESTAMP(NANOS)-as-long form → floor-divide to
      micros (same truncation DuckDB applies reading nanos parquet).
    - ``TimestampNTZType``: current ``timestamp[us]`` form → wall clock
      interpreted as UTC, session-timezone-independent.
    - ``TimestampType``: already canonical.
    """
    if isinstance(dtype, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if isinstance(dtype, TimestampNTZType):
        return F.timestamp_micros(ntz_micros(col))
    if isinstance(dtype, TimestampType):
        return F.col(col)
    raise TypeError(f"unsupported event-time physical type for {col!r}: {dtype}")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize ``df[col]`` to canonical TIMESTAMP, whatever form it arrived in."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, TimestampType):
        return df
    return df.withColumn(col, canonical_event_ts(dtype, col))
