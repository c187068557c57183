"""Deduplication operators over a document table (BASELINE.json north star).

Five tiers, all DataFrame-native:

- exact          : md5(text) groupBy — one shuffle on the hash key
- fingerprint    : md5(sorted distinct tokens) — catches token reordering
- ngram_jaccard  : exact n-gram Jaccard on candidate pairs that share a
                   shingle (explode -> equi-join -> ratio filter)
- minhash_lsh    : MinHash signature + LSH banding -> candidates -> exact
                   Jaccard verify (the 100 TB path: candidate generation is
                   an equi-join on band keys, never an all-pairs product)
- simhash        : 32-bit SimHash + hamming radius on band-bucketed pairs

Scale notes: every pairwise step is gated by an equi-join on a bucket key
(shingle, band key, or simhash band), so the shuffle is keyed and AQE can
split skewed buckets. Nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    minhash_bands,
    minhash_signature_from_hashes,
    portable_hash64,
    portable_hash_p,
    simhash_from_hashes,
)
from ..functions.text import fingerprint, tokens, word_shingles


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by md5(text): (keeper id, dup count).

    Hashing first means the shuffle moves 16-byte keys, not full documents —
    the difference between shuffling 100 TB of text and ~2 TB of hashes.
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def fingerprint_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups under the sorted-distinct-token fingerprint."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_shingles(tokens(F.col(text_col)), n)).alias("shingles"),
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    explode(shingles) -> self-equi-join on shingle -> per-pair intersection
    count -> Jaccard = inter / (|A| + |B| - inter). Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded to 6.
    """
    sh = _shingle_sets(df, id_col, text_col, n)
    sized = sh.select("doc_id", F.size("shingles").alias("n_shingles"), "shingles")
    ex = sized.select("doc_id", "n_shingles", F.explode("shingles").alias("shingle"))
    a = ex.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"), "shingle"
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Candidate pairs = docs sharing any of ``bands`` band keys (equi-join on
    the band key — this is what makes 100 TB feasible: candidates are
    generated without an all-pairs product). Candidates are then verified
    with exact Jaccard over the shingle sets.
    """
    rows_per_band = k // bands
    sh = _shingle_sets(df, id_col, text_col, n)
    # Materialize the md5 hashes ONCE: the k permutation expressions (and
    # the x/y self-join branches below) would otherwise each re-evaluate
    # the md5-per-shingle subtree — higher-order functions get no codegen
    # CSE. At cluster scale this stage would be written to a table;
    # locally persist() is the same materialization point.
    hashed = sh.select(
        "doc_id",
        "shingles",
        F.size("shingles").alias("n_shingles"),
        F.transform("shingles", lambda s: portable_hash_p(s)).alias("hs"),
    ).persist()
    sig = hashed.select(
        "doc_id",
        minhash_bands(
            minhash_signature_from_hashes(F.col("hs"), k), bands, rows_per_band
        ).alias("band_keys"),
    )
    banded = sig.select("doc_id", F.explode("band_keys").alias("band_key"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "band_key")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = hashed.select("doc_id", "shingles", "n_shingles")
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"), F.col("n_shingles").alias("na")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"), F.col("n_shingles").alias("nb")), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def simhash_table(df: DataFrame, id_col: str, text_col: str, n: int = 3, bits: int = 32) -> DataFrame:
    """Per-document SimHash (over distinct n-gram shingles); hashes
    materialized once before the per-bit vote expressions (see
    minhash_lsh_pairs for why)."""
    sh = _shingle_sets(df, id_col, text_col, n)
    hashed = sh.select(
        "doc_id", F.transform("shingles", lambda s: portable_hash64(s)).alias("hs64")
    ).persist()
    return hashed.select("doc_id", simhash_from_hashes(F.col("hs64"), bits).alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3, bits: int = 32, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation via band bucketing (split the hash into 4 bytes —
    pigeonhole: any pair within hamming<=3*bits/32 shares at least one exact
    byte), then exact hamming verify. Keyed equi-join, no all-pairs.
    """
    t = simhash_table(df, id_col, text_col, n, bits)
    n_bands = 4
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bandkeys = t.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(str(i)), F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(F.lit(mask)).cast("string"))
                for i in range(n_bands)
            ])
        ).alias("band_key"),
    )
    cand = (
        bandkeys.alias("x")
        .join(bandkeys.alias("y"), "band_key")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return cand
