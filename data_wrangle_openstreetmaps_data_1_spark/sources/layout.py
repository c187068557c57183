"""Generic multi-column Z-order write layout.

functions/geo.py:write_geo_layout localizes lat/lon specifically; this is
the general form: interleave the bits of ANY numeric columns so each
parquet file covers a compact cell of the N-dimensional key space, making
min/max row-group statistics selective for predicates on EVERY layout
column at once — the thing a single-column sort can only do for its
leading column. The standard lakehouse layout trade: one write-time
shuffle that every subsequent multi-dimension filter amortizes.

The per-column normalization ranges come from one tiny 2N-scalar
aggregate (driver-side, one-time); keys are pure integer expressions in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(ranges: list[tuple[str, float, float]], bits: int = 8) -> str:
    """SQL expression interleaving ``bits`` bits per column, given
    (col, min, max) normalization ranges. Bit i of column j lands at
    position i*N + j — neighbors in any dimension stay close in key order."""
    n = len(ranges)
    if bits * n > 63:
        # the interleaved key must fit a signed bigint: bit i*N+j set for
        # i*N+j >= 63 would overflow into the sign bit and silently destroy
        # the locality ordering the layout exists to provide
        raise ValueError(
            f"bits={bits} x {n} columns = {bits * n} interleaved bits "
            "exceeds the 63 available in a signed bigint key; lower bits "
            f"(max {63 // n} for {n} columns) or drop layout columns"
        )
    norms = []
    for col, lo, hi in ranges:
        span = (hi - lo) or 1.0
        norms.append(
            f"least({(1 << bits) - 1}, greatest(0, cast(floor(({col} - {lo!r})"
            f" / {span!r} * {1 << bits}) as bigint)))"
        )
    terms = []
    for i in range(bits):
        for j, norm in enumerate(norms):
            # fully parenthesized: SQL's + binds TIGHTER than <<, so an
            # unwrapped `x << 15 + y << 14` parses as `x << (15 + y) << 14`
            terms.append(f"((shiftright({norm}, {i}) & 1) << {i * n + j})")
    return "(" + " + ".join(terms) + ")"


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
    ranges: list[tuple[str, float, float]] | None = None,
) -> None:
    """Range-partition by the interleaved key and sort within partitions
    before writing — each output file covers a compact N-dim cell, so
    min/max stats prune row groups for predicates on any layout column.

    ``ranges``: explicit (col, lo, hi) normalization bounds; omitted, they
    come from one 2N-scalar aggregate over the data. Callers with a known
    domain (e.g. lat/lon) pass fixed bounds and skip the stats pass.
    """
    if "__zkey" in df.columns:
        raise ValueError(
            "write_zorder_layout uses '__zkey' as its internal key column; "
            "rename the existing '__zkey' column first (it would be "
            "silently overwritten and dropped)"
        )
    if ranges is None:
        stats = df.agg(
            *[
                f
                for c in cols
                for f in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))
            ]
        ).collect()[0]
        missing = [c for c in cols if stats[f"lo_{c}"] is None]
        if missing:
            raise ValueError(
                f"cannot derive z-order ranges for {missing}: column is "
                "all-null or the DataFrame is empty — pass explicit `ranges`"
            )
        ranges = [(c, float(stats[f"lo_{c}"]), float(stats[f"hi_{c}"])) for c in cols]
    keyed = df.withColumn("__zkey", F.expr(zorder_key_expr(ranges, bits)))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Hash-bucketed (optionally bucket-sorted) external parquet table.

    Z-order (above) optimizes SCAN pruning; bucketing optimizes JOIN and
    AGGREGATION placement: rows are hash-partitioned into ``n_buckets``
    files per write-partition AT WRITE TIME, and the catalog records the
    bucketing spec, so every subsequent equi-join or groupBy on the bucket
    columns between co-bucketed tables satisfies its distribution
    requirement from the scan — NO shuffle exchange at read time.
    ``sort_cols`` orders rows within each bucket file (scan-pruning help);
    sort-merge joins still run their per-task sorts because Spark only
    trusts bucket sort order when each bucket is exactly one file — the
    elided EXCHANGE is the data-sized win, the leftover sorts are
    bucket-local. This is the standard warehouse trade for fact-fact
    joins repeated every run (orders x lineitem on the order key at 100 TB:
    one write-time shuffle each, then every daily join runs exchange-free);
    both sides must agree on bucket count and key.

    Exchange-free join + aggregation plans are asserted in
    tests/test_bucketed_join.py.
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
