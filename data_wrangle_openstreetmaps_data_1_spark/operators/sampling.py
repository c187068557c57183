"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-and-partitioning dependent — rerun the job with a
different split and the sample changes, which is unacceptable for
reproducible training mixes. These operators sample by CONTENT hash
(portable md5 tier, functions/hashing.py), so the decision for a row is a
pure function of the row: stable across runs, partitionings, engines — and
exactly reproducible by the DuckDB oracle.

Scale notes: hash_sample is a stateless filter (pushes through scans, no
shuffle). stratified_sample shuffles once on the stratum key for the
per-stratum top-N window — the standard shape; heavy skew in stratum sizes
is AQE-splittable because the hash order is uniform within a stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def hash_sample(df: DataFrame, key_col: str, rate_bp: int, salt: str = "s1") -> DataFrame:
    """Keep ~``rate_bp`` basis points (1/10000) of rows, decided by
    ``portable_hash64(key || ':' || salt) mod 10000``.

    Different salts give independent samples from the same keys; with the
    SAME salt, a larger rate strictly extends a smaller one (nested
    samples), and disjoint residue ranges would partition the keys into
    provably non-overlapping splits (e.g. train vs held-out).
    """
    if not 0 <= rate_bp <= 10_000:
        raise ValueError(f"rate_bp={rate_bp} must be in [0, 10000]")
    h = portable_hash64(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    return df.where(F.pmod(h, F.lit(10_000)) < rate_bp)


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int, salt: str = "s1"
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by content-hash
    order (ties broken by key) — a deterministic per-group reservoir.

    Adds ``sample_rank`` (1-based within the stratum) to the output.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum={n_per_stratum} must be >= 1")
    h = portable_hash64(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def mixture_sample(df: DataFrame, key_col: str, rate_bp_col, salt: str = "mx1") -> DataFrame:
    """Per-row sampling rate (basis points, may differ per source/stratum):
    the mixture-weighting step of a training-data recipe ("keep 10% of
    crawl, 50% of books, 100% of reference"). ``rate_bp_col`` is a Column
    evaluated per row; the keep decision is the same content-hash rule as
    ``hash_sample``, so mixes are rerun/partitioning/engine stable, and the
    same salt nests mixes across recipe revisions (raising a source's rate
    strictly extends its kept set).

    A stateless filter — pushes through scans, no shuffle.
    """
    h = portable_hash64(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    return df.where(F.pmod(h, F.lit(10_000)) < rate_bp_col)


def shuffle_order(df: DataFrame, key_col: str, n_shards: int, salt: str = "sh1") -> DataFrame:
    """Deterministic global training shuffle WITHOUT a global sort: every row
    gets a (shard, pos) address from its content hash — shard =
    ``hash mod n_shards``, pos = hash-order rank within the shard.

    Reading shards in any order and each shard by ``pos`` yields the same
    permutation on every run, partitioning, and engine (the hash is the
    portable md5 tier). The plan is one shuffle on the shard key plus a
    per-shard sort — no total ordering is ever materialized, so it scales
    linearly; a seeded ``orderBy(rand())`` would need a global range
    exchange AND would not be rerun-stable.

    Different salts give independent permutations (fresh data order per
    epoch).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards} must be >= 1")
    h = portable_hash64(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)))
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )


def weighted_hash_sample(
    df: DataFrame, key_col: str, weight_col: str, max_weight: int, salt: str = "w1"
) -> DataFrame:
    """Per-row weighted deterministic sampling: keep a row with probability
    ``weight / max_weight``, decided by the same portable content-hash rule
    as :func:`hash_sample` — so the decision is a pure function of (key,
    salt, weight), stable across runs, partitionings, and engines.

    The pretraining use: quality-weighted corpus downsampling (keep
    high-quality documents with higher probability) without any RNG state,
    so a re-run on re-sharded data keeps EXACTLY the same documents.
    ``weight_col`` must be integral and in [0, max_weight]; weights are
    quantized to basis points (floor of weight*10000/max_weight), so a
    max_weight that does not divide 10000 loses sub-bp precision only.

    Delegates to :func:`mixture_sample` — ONE content-hash keep rule in
    this module, not two near-copies to keep in sync.
    """
    if max_weight <= 0:
        raise ValueError(f"max_weight={max_weight} must be positive")
    rate_bp = F.expr(f"cast({weight_col} as bigint) * 10000 div {max_weight}")
    return mixture_sample(df, key_col, rate_bp, salt=salt)
