"""S3/S4: JSONL sink + parquet canonical store.

The reference wrote line-delimited JSON for ``mongoimport``
(ProjectCodeUsed/data.py:188-201). Here JSONL is an interchange sink;
parquet is the canonical at-rest format (columnar, stats, pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S3: one JSON document per line (the ``pretty`` flag of the reference
    is cosmetic and has no distributed analog)."""
    df.write.mode(mode).json(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """S4: canonical parquet store. ``partition_by=['type']`` mirrors the
    node/way discriminator layout (SURVEY §1.2); geo tables should be
    range-sorted by a geohash-like key before write so lat/lon predicates
    prune row groups (G2 replacement)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)
