"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's query registry
(``data_wrangle_openstreetmaps_data_1_spark/plans/registry.py``). Every implemented
operator from SURVEY.md §2 (plus the LLM-pipeline extensions) registers a
Spark callable and, where SQL-expressible, a DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# import-safe regardless of the driver's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_wrangle_openstreetmaps_data_1_spark.plans.registry import oracle_sql_map, query_map

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's 'Top 10 contributors'
    (reference readme.md:161-171) — group-count + desc sort + limit over the
    events table (A2+O1+O2)."""
    return query_map()["a2_top_users"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops; those get rows-only checks)."""
    return oracle_sql_map()
