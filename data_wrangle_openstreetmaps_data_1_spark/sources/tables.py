"""Parquet table loaders for the driver's synthetic tables (TESTDATA.md).

Collection-scan equivalent of the reference's ``docs.find(...)`` root
(reference readme.md:121-139): ``spark.read.parquet`` gives us the columnar
scan with predicate pushdown + column pruning that MongoDB's COLLSCAN never
had (SURVEY.md §3.2).

Scale notes: parquet scans split by row-group; at 100 TB the same code runs
with one task per ~128 MB split (``spark.sql.files.maxPartitionBytes``).
Filters/projections composed on top of these DataFrames reach the scan as
``PushedFilters`` / pruned ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.timeutil import normalize_event_ts

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from ``sf_dir`` as a DataFrame.

    ``events.ts`` has shipped in multiple physical forms across testdata
    generations (TIMESTAMP(NANOS)-as-long, ``timestamp[us]`` NTZ); whatever
    arrives is normalized to a canonical TIMESTAMP whose instant equals the
    wall clock interpreted as UTC — see functions/timeutil.py.
    """
    if name == "events":
        # Must work under ANY caller-provided SparkSession (the driver builds
        # its own, without our session.py tuning), so set the runtime conf
        # here rather than relying on the builder.  Harmless for non-nanos
        # files; required to read the legacy nanos form at all.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df, "ts")
    return df


def table_row_bound(sf_dir: str, name: str) -> int | None:
    """Exact row count of one synthetic table from parquet FOOTER metadata —
    driver-side pyarrow, zero Spark jobs. This is the "free upper bound"
    operators/topk.py's cost-based shard sizing asks for: per-key candidate
    counts of the scan-form retrieval/similarity probes are bounded by the
    table size. Returns None (caller keeps the scale-safe two-stage
    default) if the path is missing or unreadable — never raises, because a
    missing estimate must only cost performance, not correctness."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.read_metadata(os.path.join(root, f)).num_rows
            return total
        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table (lazy — nothing is scanned until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can use them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
