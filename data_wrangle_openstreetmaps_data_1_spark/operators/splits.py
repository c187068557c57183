"""Leakage-safe train/validation/test splitting for training-data pipelines.

The naive split — hash each doc_id into a residue range — silently leaks:
duplicate and near-duplicate CLUSTERS straddle the boundary, so the "held
out" set contains copies of training documents and every eval metric on it
is inflated. The fix is to split by GROUP, not by document: hash a stable
group key (exact-dup fingerprint, MinHash connected-component root,
URL-canonical domain — whatever dedup already computed) and let every
member inherit its group's split. Same content-hash determinism contract
as operators/sampling.py: the decision is a pure function of the row, so
splits are rerun-, partitioning-, and engine-stable, and the DuckDB oracle
reproduces them exactly.

Scale notes (100 TB):

- ``split_column`` is a stateless per-row projection — a md5 + one CASE
  chain, whole-stage-codegen'd, pushes through scans, NO shuffle and no
  join (the group key is already on the row; upstream dedup put it there).
  Assigning a 100 TB corpus is a map-only pass.
- ``leakage_audit`` never materializes dup pairs: within a group of n docs
  split into per-split counts c_s, the straddling pair count is
  (n^2 - sum c_s^2) / 2 — so the audit is ONE groupBy on the 16-byte group
  key plus int64 combinatorics, identical cost to the exact-dedup pass
  itself, while a pairwise self-join would be quadratic in the hottest
  group. int64 is safe far past any real group size (n <= 3M pairs fit;
  the count itself would overflow only past ~4.3e9 docs in ONE group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _validate_splits(splits: list[tuple[str, int]]) -> None:
    if not splits:
        raise ValueError("splits must be non-empty")
    bps = [bp for _, bp in splits]
    if any(bp <= 0 for bp in bps):
        raise ValueError(f"every split weight must be positive, got {splits}")
    if sum(bps) != 10_000:
        raise ValueError(
            f"split weights must sum to 10000 basis points, got {sum(bps)} "
            f"({splits}); fractions of the corpus must be exhaustive"
        )
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names in {names}")


def split_column(key: Column, splits: list[tuple[str, int]], salt: str = "split1") -> Column:
    """Deterministic split assignment for ``key``: a CASE chain over residue
    ranges of ``portable_hash64(key || ':' || salt) mod 10000``.

    ``splits`` is ``[(name, basis_points), ...]`` summing to 10000 — e.g.
    ``[("train", 9000), ("val", 500), ("test", 500)]``. Pass a doc-level
    key for a naive split, or a GROUP key (dedup fingerprint, component
    root) for the leakage-safe split: every row sharing the key lands in
    the same split by construction. Different salts draw independent
    splits from the same keys.
    """
    _validate_splits(splits)
    r = F.pmod(
        portable_hash64(F.concat(key.cast("string"), F.lit(":" + salt))), F.lit(10_000)
    )
    out = None
    cum = 0
    for name, bp in splits:
        cum += bp
        cond = r < F.lit(cum)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    # cum == 10000 and r in [0, 10000), so the chain is exhaustive; the
    # otherwise() is unreachable but keeps the column non-nullable-honest.
    return out.otherwise(F.lit(splits[-1][0]))


def group_aware_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, int]],
    salt: str = "split1",
    out_col: str = "split",
) -> DataFrame:
    """Attach ``out_col``: the split every member of ``group_col`` shares."""
    return df.withColumn(out_col, split_column(F.col(group_col), splits, salt))


def split_summary(
    df: DataFrame,
    id_col: str,
    group_col: str,
    splits: list[tuple[str, int]],
    salt: str = "split1",
) -> DataFrame:
    """Per-split census of a group-aware split: (split, n_docs, n_groups).

    One groupBy on the group key (docs + distinct-group counts ride the
    same small-key shuffle), then a broadcast-sized re-aggregate.
    """
    assigned = group_aware_split(
        df.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("g")),
        "g",
        splits,
        salt,
    )
    per_group = assigned.groupBy("split", "g").agg(F.count("*").alias("n"))
    return per_group.groupBy("split").agg(
        F.sum("n").alias("n_docs"), F.count("*").alias("n_groups")
    )


def leakage_audit(
    df: DataFrame,
    id_col: str,
    group_col: str,
    splits: list[tuple[str, int]],
    salt: str = "split1",
) -> DataFrame:
    """Compare the naive doc-key split against the group-aware split on the
    SAME corpus and grouping: per strategy, how many intra-group pairs
    straddle a split boundary (each one is a train/eval contamination).

    Output (2 rows): (strategy, dup_pairs, straddling_pairs,
    groups_straddling). ``dup_pairs`` = sum over groups of C(n, 2) —
    identical for both strategies; group_aware straddling is 0 BY
    CONSTRUCTION, and this audit proves it from the data rather than
    asserting it. No pair is ever materialized: per (group, split) counts
    feed (n^2 - sum c_s^2) / 2.
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("g"))
    out = None
    for strategy, key in (("naive_by_doc", F.col("doc_id")), ("group_aware", F.col("g"))):
        assigned = base.withColumn("split", split_column(key, splits, salt))
        per = assigned.groupBy("g", "split").agg(F.count("*").alias("c"))
        grp = per.groupBy("g").agg(
            F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("sq")
        )
        # integer div: n*(n-1) and n^2 - sum c^2 are always even, so the
        # per-group halves are exact int64 — no float in the counting path
        # (package convention: exact integer moments, IEEE only at the end)
        row = grp.agg(
            F.sum(F.expr("n * (n - 1) div 2")).alias("dup_pairs"),
            F.sum(F.expr("(n * n - sq) div 2")).alias("straddling_pairs"),
            F.sum(F.when(F.col("sq") < F.col("n") * F.col("n"), 1).otherwise(0))
            .cast("long")
            .alias("groups_straddling"),
        ).select(F.lit(strategy).alias("strategy"), "*")
        out = row if out is None else out.unionByName(row)
    return out
