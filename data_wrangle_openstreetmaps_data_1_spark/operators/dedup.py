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

Cache lifecycle: the LSH operators ``persist()`` their hashed intermediate
(the result DataFrame references it from several branches, so it must
outlive this call — there is no safe point to unpersist inside the
operator). Callers running many operators in one session should
``spark.catalog.clearCache()`` between them (bench.py and
tools/check_oracle.py do).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread
from ..functions.hashing import (
    HASH64_SQL,
    HASH_P_SQL,
    MERSENNE_P,
    minhash_band_keys_sql,
    simhash_sql,
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
    # Shingling + per-shingle hashing is the CPU-bound stage of every
    # operator below; make sure it isn't serialized by a row-group-bound scan
    # (see partitioning.spread).
    df = spread(df)
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
    hash_tier: str = "portable",
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Candidate pairs = docs sharing any of ``bands`` band keys (equi-join on
    the band key — this is what makes 100 TB feasible: candidates are
    generated without an all-pairs product). Candidates are then verified
    with exact Jaccard over the shingle sets.

    Shape note: the band join moves doc IDS only; hash arrays are re-joined
    afterwards for the (tiny) candidate set. The alternative — carrying the
    hash arrays through the band join to skip the verify joins — is faster
    cold locally but shuffles every hash array once per band key (4x the
    payload) at scale, so the id-only join wins at 100 TB.

    ``hash_tier``: ``"portable"`` (md5-derived, bit-identical in DuckDB — the
    oracle-checkable default) or ``"fast"`` (xxhash64, Spark-native — the
    100 TB hot path; same plan shape, no cross-engine parity, so its
    registered query is rows-only checked). The verified Jaccard values are
    hash-independent (Jaccard over distinct collision-free hashes == Jaccard
    over shingles); only the candidate sample differs between tiers.
    """
    if bands < 1 or k % bands != 0:
        raise ValueError(
            f"bands={bands} must divide k={k} exactly (otherwise part of the "
            "signature is silently never banded, or band keys degenerate)"
        )
    if hash_tier not in ("portable", "fast"):
        raise ValueError(f"hash_tier={hash_tier!r} must be 'portable' or 'fast'")
    # xxhash64 is signed 64-bit; reduce into [0, p) with the same Mersenne
    # modulus so the affine-permutation family applies unchanged. pmod keeps
    # negative hashes in range.
    hash_sql = (
        HASH_P_SQL if hash_tier == "portable" else f"pmod(xxhash64({{x}}), {MERSENNE_P})"
    )
    sh = _shingle_sets(df, id_col, text_col, n)
    # Materialize the md5 hashes ONCE: the k permutation expressions (and
    # the x/y self-join branches below) would otherwise each re-evaluate
    # the md5-per-shingle subtree — higher-order functions get no codegen
    # CSE. At cluster scale this stage would be written to a table;
    # locally persist() is the same materialization point. Only the bigint
    # hash arrays are persisted — caching the shingle *strings* costs more
    # in object overhead than recomputing them, and the verify stage works
    # on hash sets anyway (Jaccard over distinct hashes == Jaccard over
    # distinct shingles for a shared hash function; the oracle mirrors this).
    # Docs with no shingles (fewer than n tokens) are excluded: the MinHash
    # signature is undefined on an empty set, and two such docs would
    # otherwise collide on the sentinel signature and divide 0/0 in the
    # Jaccard verify (ANSI mode makes that a hard error).
    hashed = (
        sh.select(
            "doc_id",
            F.size("shingles").alias("n_shingles"),
            F.expr(f"transform(shingles, s -> {hash_sql.format(x='s')})").alias("hs"),
        )
        .where(F.col("n_shingles") > 0)
        .persist()
    )
    # Band keys straight from the hash arrays: each of the k permutations is
    # evaluated exactly once (the earlier form inlined the full k-perm
    # signature into every band key, costing bands*k array scans per row).
    sig = hashed.select(
        "doc_id",
        F.expr(minhash_band_keys_sql("hs", k, bands)).alias("band_keys"),
    )
    banded = sig.select("doc_id", F.explode("band_keys").alias("band_key"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "band_key")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = hashed.select("doc_id", "hs", "n_shingles")
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n_shingles").alias("na")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n_shingles").alias("nb")), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the classic rolling-hash scheme:
    Schleimer/Wilkerson/Aiken, SIGMOD 2003): k-gram hashes in document
    order, take the min of every ``window`` consecutive hashes, keep the
    distinct mins. Guarantees any match of length >= window+n-1 shares a
    fingerprint — the standard plagiarism/near-dup sketch.

    Output: (doc_id, n_fingerprints, fp_digest) where fp_digest is the md5
    of the sorted fingerprint set (compact, exactly comparable).

    Implementation note: the windowed min is ``array_min(slice(hs, i, w))``
    inside a lambda — legal ONLY because ``hs`` is a persisted column
    (a bound attribute). If it were an inline expression the lambda would
    re-evaluate the whole hash array per window position (O(n^2) md5s).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # ordered (non-distinct!) shingle hashes — winnowing is positional
    sh = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.when(F.size(toks) < n, F.array().cast("array<string>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
        .alias("shingles"),
    )
    hashed = sh.select(
        "doc_id",
        F.expr(f"transform(shingles, s -> {HASH_P_SQL.format(x='s')})").alias("hs"),
    ).persist()
    mins = (
        f"array_distinct(case when size(hs) < {window} then hs else "
        f"transform(sequence(1, size(hs) - {window - 1}), i -> array_min(slice(hs, i, {window}))) end)"
    )
    return hashed.select(
        "doc_id",
        F.expr(f"size({mins})").alias("n_fingerprints"),
        F.expr(f"md5(concat_ws(',', array_sort({mins})))").alias("fp_digest"),
    )


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, bits: int = 32, skip_empty: bool = False
) -> DataFrame:
    """Per-document SimHash (over distinct n-gram shingles); hashes
    materialized once before the per-bit vote expressions (see
    minhash_lsh_pairs for why). ``skip_empty`` drops docs with no shingles
    (their simhash degenerates to 0) — pairing callers want that."""
    sh = _shingle_sets(df, id_col, text_col, n)
    if skip_empty:
        sh = sh.where(F.size("shingles") > 0)
    hashed = sh.select(
        "doc_id", F.expr(f"transform(shingles, s -> {HASH64_SQL.format(x='s')})").alias("hs64")
    ).persist()
    return hashed.select("doc_id", F.expr(simhash_sql("hs64", bits)).alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3, bits: int = 32, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation via band bucketing (split the hash into 4 bytes),
    then exact hamming verify. Keyed equi-join, no all-pairs. Pigeonhole
    bound: a pair differing in <= 3 bits must share one of the 4 bands, so
    recall is complete only for ``max_hamming <= n_bands - 1`` — larger
    values are rejected rather than silently missing pairs.
    """
    # skip_empty: simhash(∅) = 0 for every shingle-less doc, which would
    # otherwise pair all short docs with each other at hamming 0.
    t = simhash_table(df, id_col, text_col, n, bits, skip_empty=True)
    n_bands = 4
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {n_bands}-band recall "
            f"bound ({n_bands - 1}); pairs at larger distances would be "
            "silently missed"
        )
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
