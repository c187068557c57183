"""A8: street-name audit as a distributed groupBy (SURVEY.md §2.4 A8).

Reference form: a single-threaded ``defaultdict(set)`` keyed by street-type
suffix, collecting offending full street names
(Lesson6Quizes/audit.py:33-55; ProjectCodeUsed/data_streetnames.py:37-65).

Spark form: extract suffix -> anti-filter against the expected list ->
``groupBy(street_type).agg(collect_set(street_name))``. Partial aggregation
(map-side set union) happens for free; the only shuffle is on the tiny
street_type key domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import EXPECTED_STREET_TYPES, street_type


def audit_street_types(df: DataFrame, street_col: Column, expected: list[str] | None = None) -> DataFrame:
    """Return (street_type, street_names sorted-array) for every street whose
    type suffix is not in ``expected``.

    Output columns: ``street_type string``, ``street_names array<string>``
    (sorted for deterministic comparison — the reference's Python ``set`` has
    no order either).
    """
    expected = expected if expected is not None else EXPECTED_STREET_TYPES
    return (
        df.select(street_col.alias("street_name"))
        .where(street_col.isNotNull())
        .withColumn("street_type", street_type(F.col("street_name")))
        .where(~F.col("street_type").isin(expected) & (F.col("street_type") != ""))
        .groupBy("street_type")
        .agg(F.array_sort(F.collect_set("street_name")).alias("street_names"))
    )
