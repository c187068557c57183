"""Query registry backing ``__spark_entry__.py`` (the driver contract).

Every entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string for the DuckDB oracle. Keys are prefixed with the
SURVEY.md §2 operator ids they cover (e.g. ``a2_`` = §2.4 A2 group-count) so
coverage can be checked line-by-line against the inventory.

Cross-engine determinism rules applied throughout (see tools/check_oracle.py):
- every float output is ``round()``-ed to a fixed precision on BOTH sides
- every top-k has a unique tie-break key
- temporal outputs are cast to strings
- identical literal constants / regexes are shared between the Spark code
  and the generated SQL (single source of truth in functions/ modules)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => driver records rows-only check
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(name=name, spark=fn, oracle=oracle, bench=bench, doc=doc)
        return fn

    return deco


def _release_caches_first(fn: SparkQuery) -> SparkQuery:
    """Driver-contract wrapper: drop any persisted intermediates left by the
    PREVIOUS query (LSH/minhash/winnow persist hashed stages) so cached blocks
    don't accumulate across a 70+-query battery on an external session that
    never calls ``clearCache`` itself."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    wrapped.__module__ = fn.__module__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def query_map() -> dict[str, SparkQuery]:
    _load_all()
    return {k: _release_caches_first(v.spark) for k, v in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in QUERIES.items() if v.oracle is not None}


def bench_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {k: v.spark for k, v in QUERIES.items() if v.bench}


_loaded = False


def _load_all() -> None:
    """Import every plans module for its registration side effects, then
    apply the rotation order from ``rotation.json``.

    The external driver checks exactly the FIRST 50 ``queries()`` entries — a
    hard cap, not a time budget — so with well over that many registered
    queries (see COVERAGE.md's generated count) a static order permanently
    hides most of them from the hard correctness signal.
    ``tools/rotate_registry.py`` regenerates rotation.json each round from
    the accumulated CORRECTNESS_r*.json files: never-checked/red queries
    first, then stalest-green first, so every query re-earns a driver row at
    least every other round. Queries registered after the last rotation pass
    (absent from the file) lead the order — they have no driver row yet.

    Dtype contract for every oracle in this registry (enforced by
    tools/check_oracle.py's DTYPE-PARITY gate): the driver hashes VALUES, so
    a column must come back from DuckDB's ``fetchdf()`` with the same
    int-vs-float kind as Spark's ``toPandas()``. Known hazards — DuckDB
    integer ``sum()`` returns HUGEINT which pandas materializes as float64
    (CAST it to BIGINT in the SQL; Spark's long sum is int64), and any
    arithmetic DuckDB widens to HUGEINT inherits the same drift. ``count``,
    ``//`` on BIGINT, ``len()``, and double aggregates are safe. ``round()``
    ties differ (Spark HALF_UP vs DuckDB half-even) — keep rounding at >=4dp
    where tie collisions are improbable, or use ``floor(x*10^k)`` integer
    forms for exactness.
    """
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        analytics,
        cleaning_geo,
        core,
        curation_ext,
        pipeline,
        pipeline_ext,
        serving_ext,
        streaming_queries,
        tpch_suite,
    )

    import json
    import os

    rot_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rotation.json")
    if os.path.exists(rot_path):
        with open(rot_path) as f:
            pos = {n: i for i, n in enumerate(json.load(f)["order"])}
        # (name in pos) == False sorts first: new, never-rotated queries lead
        ordered = sorted(QUERIES.items(), key=lambda kv: (kv[0] in pos, pos.get(kv[0], 0)))
        QUERIES.clear()
        QUERIES.update(ordered)
    _loaded = True
