"""Generic one-scan column profiler (data-quality reconnaissance).

For each requested column: row count, null count, exact distinct count,
min/max rendered as strings, and mean string-rendered length in
hundredths (exact integer arithmetic — no float averages to drift
between engines). The per-table profile every ingestion pipeline runs
before writing expectations (dq_expectations is the CONTRACT gate; this
is the discovery pass that tells you what to expect).

Plan shape: ONE aggregation over ONE scan for all columns. The multiple
``count(DISTINCT ...)`` aggregates compile to Spark's Expand node —
k distinct columns replicate each row k times into the partial
aggregation, which is the standard single-pass relational form (DuckDB
plans the same). That is the honest exact-profile cost; at 100 TB flip
``approximate=True`` and the distinct counts become mergeable HLL
sketches (``approx_count_distinct``) with no Expand and no extra
shuffle — the approximate path is NOT oracle-checked (sketch estimates
are engine-specific) and exists for the scale story, covered by its own
unit test instead.

Length metric: ``sum(length(cast(c AS string))) * 100 div count(c)`` —
integer sums are map-side-partial monoids and the division is exact
int64, so the profile hashes identically across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str], approximate: bool = False) -> DataFrame:
    """Profile ``cols`` of ``df`` in one aggregation pass.

    Output: (col_name, n_rows, n_nulls, n_distinct, min_repr, max_repr,
    avg_len_x100), one row per requested column.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        nd = (
            F.approx_count_distinct(c) if approximate else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(c).alias(f"nn{i}"),
            nd.alias(f"nd{i}"),
            F.min(c).cast("string").alias(f"mn{i}"),
            F.max(c).cast("string").alias(f"mx{i}"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"sl{i}"),
        ]
    wide = df.agg(*aggs)
    rows = ", ".join(
        f"'{c}', n_rows - nn{i}, nd{i}, mn{i}, mx{i}, "
        f"coalesce(sl{i}, 0L) * 100L div greatest(nn{i}, 1L)"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {rows}) AS "
        "(col_name, n_nulls, n_distinct, min_repr, max_repr, avg_len_x100)",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr", "avg_len_x100"
    )


def profile_columns_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle twin, generated from the same column list."""
    sel = ["count(*) AS n_rows"]
    for i, c in enumerate(cols):
        sel += [
            f"count({c}) AS nn{i}",
            f"count(DISTINCT {c}) AS nd{i}",
            f"CAST(min({c}) AS VARCHAR) AS mn{i}",
            f"CAST(max({c}) AS VARCHAR) AS mx{i}",
            f"CAST(sum(length(CAST({c} AS VARCHAR))) AS BIGINT) AS sl{i}",
        ]
    branches = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, n_rows, n_rows - nn{i} AS n_nulls, "
        f"nd{i} AS n_distinct, mn{i} AS min_repr, mx{i} AS max_repr, "
        f"coalesce(sl{i}, 0) * 100 // greatest(nn{i}, 1) AS avg_len_x100 FROM s"
        for i, c in enumerate(cols)
    )
    return f"WITH s AS (SELECT {', '.join(sel)} FROM {table}) {branches}"
