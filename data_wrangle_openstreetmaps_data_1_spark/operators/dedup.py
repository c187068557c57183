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

Cache lifecycle: ``winnow_fingerprints`` persists its hash array (the
windowed-min lambda needs a bound column), and since round 6
``minhash_lsh_pairs`` persists its exploded (doc_id, hash) row table —
it feeds three consumers with three DIFFERENT shuffle keys, so
ReusedExchange cannot deduplicate the tokenize+shingle+md5 pipeline and
the cache saves two full recomputes of the CPU-heaviest stage (measured
at the sf1 rehearsal: 14.2s -> 7.9s). ``persist()`` defaults to
MEMORY_AND_DISK, so skinny hash rows spill rather than OOM at corpus
scale. ``ngram_jaccard_pairs`` makes the same cache OPT-IN
(``cache_exploded``) — see its docstring for the measured trade — and
the simhash path stays cache-free (one consumer). Callers running many
operators in one session should ``spark.catalog.clearCache()`` between
them (bench.py, tools/check_oracle.py, and the registry wrapper do).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import (
    eager_cache,
    explode_nonempty,
    overlap_jobs,
    spread,
    truncate_lineage,
)
from ..functions.hashing import (
    HASH64_SQL,
    HASH_P_SQL,
    MERSENNE_P,
    minhash_coeffs,
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


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    cache_exploded: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    explode(shingles) -> self-equi-join on shingle -> per-pair intersection
    count -> Jaccard = inter / (|A| + |B| - inter). Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded to 6.

    ``cache_exploded`` persists the exploded (doc_id, hash) rows, saving
    two recomputes of the tokenize+shingle pipeline (three consumers on
    three shuffle keys). Measured at the sf1 rehearsal: standalone pairs
    29.5s -> 21.9s WITH the cache, but dd_groups_cc (pairs + iterative CC
    on top) 34.1s -> 38.2s — the resident cache competes with the CC
    rounds for executor memory. Default off: the composed pipeline is the
    common case, and xxhash64 shingling is ~3x cheaper to recompute than
    the minhash path's md5 (which is why minhash_lsh_pairs persists
    unconditionally).
    """
    sh = _shingle_sets(df, id_col, text_col, n)
    # explode_nonempty: a plain explode of the named `shingles` column
    # infers a size>0 filter that pushes the whole tokenize+shingle
    # subtree below the spread() exchange — re-evaluated per input row at
    # the scan's own parallelism (measured 8x slower at sf0.1).
    ex = explode_nonempty(sh, ["doc_id"], "shingles", "shingle").select(
        # join/shuffle on an 8-byte hash, not the ~n-word shingle string;
        # Jaccard over distinct collision-free hashes == Jaccard over
        # distinct shingles (same argument as minhash_lsh_pairs' verify)
        "doc_id",
        F.xxhash64("shingle").alias("sh_h"),
    )
    if cache_exploded:
        ex = ex.persist()
    # Set sizes live in a TINY (doc_id, n) aggregate joined onto the
    # POST-aggregation pair table — the same shape as minhash_lsh_pairs'
    # verify. The earlier form carried n_shingles through the big self-join
    # via a count window, which shuffles AND SORTS every exploded row by
    # doc_id before the sh_h join even starts (measured: the sort was the
    # single largest stage of dd_groups_cc at the 10x rehearsal scale) and
    # widens every joined row by two longs. AQE picks the join build side:
    # locally `sizes` broadcasts; at corpus scale the FILTERED pair table
    # is the small side.
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "sh_h")
    b = ex.select(F.col("doc_id").alias("doc_b"), "sh_h")
    inter = (
        a.join(b, "sh_h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    pairs = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")), "doc_a"
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")), "doc_b"
        )
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def jaccard_truth_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.4
) -> DataFrame:
    """ALL pairs with exact Jaccard >= threshold — the ground truth the LSH
    tiers are measured against (dd_lsh_tier_audit). Same shape as
    ngram_jaccard_pairs but over the PORTABLE md5-derived mod-p hash with
    explicit (doc_id, h) dedup, so set sizes and intersections are counts
    of DISTINCT hash values — bit-identical to the DuckDB twin
    (list_distinct + unnest) including any mod-p collision behavior, with
    no reliance on collision-freeness.
    """
    sh = _shingle_sets(df, id_col, text_col, n)
    ex = (
        explode_nonempty(sh, ["doc_id"], "shingles", "shingle")
        .select("doc_id", F.expr(HASH_P_SQL.format(x="shingle")).alias("h"))
        .distinct()
    )
    # sizes joined post-aggregation, not carried through the self-join via
    # a count window — see ngram_jaccard_pairs for the measured rationale
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_h"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "h")
    b = ex.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_h").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_h").alias("nb")), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


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

    Shape note: the band join moves doc IDS only; hash rows are re-joined
    afterwards for the (tiny) candidate set. The alternative — carrying the
    signatures through the band join to skip the verify joins — shuffles
    every signature once per band key (bands x the payload) at scale, so
    the id-only join wins at 100 TB.

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
    # FULL-WIDTH hash per shingle (60-bit md5-derived portable / raw signed
    # 64-bit xxhash64). The signature permutations reduce it mod p (Mersenne
    # 2^31-1, pmod keeps signed xxhash in range) so the affine family's
    # arithmetic stays in int64; the VERIFY joins on the full-width value,
    # where distinct shingles collide with probability ~2^-60 per pair — so
    # a plain count(*) is the distinct intersection size and the verify
    # needs no dedup at all. The earlier form hashed mod p up front, which
    # made within-doc collisions likely enough that the verify needed
    # count_distinct — a second exchange on (doc_a, doc_b, h) that the
    # round-6 bench measured as the dd_minhash_lsh regression.
    hash_sql = HASH64_SQL if hash_tier == "portable" else "xxhash64({x})"
    # Fully row-relational shape — no hash ARRAYS anywhere. The earlier
    # array form computed the k permutations inside transform() lambdas,
    # which run interpreted (higher-order functions get no whole-stage
    # codegen): ~4.5s at sf0.1. Exploding to (doc_id, h) rows keeps md5 and
    # all permutation arithmetic inside codegen, the k MinHash values
    # become k min() aggregates with map-side partial aggregation, and at
    # 100 TB no executor ever materializes a per-doc array — only skinny
    # (id, hash) rows shuffle. Measured 2.5x faster end-to-end locally.
    #
    # Docs with no shingles (fewer than n tokens) never reach the groupBy
    # (explode emits nothing), which is the old n_shingles > 0 filter: the
    # MinHash signature is undefined on an empty set, and two such docs
    # would otherwise collide on the sentinel signature and divide 0/0 in
    # the Jaccard verify.
    rows_per_band = k // bands
    coeffs = minhash_coeffs(k)
    sh = _shingle_sets(df, id_col, text_col, n)
    # eager_cache: the exploded hash table feeds THREE consumers with three
    # different shuffle keys (signature groupBy on doc_id, verify joins on
    # doc_a and on (doc_b, h)), so without a cache the tokenize+shingle+md5
    # pipeline — the CPU-heaviest stage — runs three times (ReusedExchange
    # can't help across differing keys). Measured at the sf1 rehearsal:
    # 14.2s -> 7.9s. persist() default is MEMORY_AND_DISK, so at corpus
    # scale the skinny (id, hash) rows spill rather than OOM. The cache is
    # materialized EAGERLY (r18): a lazy persist still let AQE's concurrent
    # stage submission recompute the subtree once per consumer stage — see
    # partitioning.eager_cache for the measured stage profile.
    ex = eager_cache(
        explode_nonempty(sh, ["doc_id"], "shingles", "shingle").select(
            "doc_id", F.expr(hash_sql.format(x="shingle")).alias("h")
        )
    )
    # one shuffle: per-doc signature columns + set size, all in one pass.
    # pmod(h, p) inside the min() — identical signature values to the old
    # hash-mod-p-up-front form, so band keys (and the candidate set) are
    # byte-identical across the verify-hash widening.
    hp = F.pmod(F.col("h"), F.lit(MERSENNE_P))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * hp + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
        F.count("*").alias("n_shingles"),
    )
    # band key string layout shared with the generated oracle SQL
    # (_minhash_oracle): '<band>,<min>,...,<min>'
    band_cols = [
        F.concat_ws(
            ",",
            F.lit(str(bi)),
            *[F.col(f"m{bi * rows_per_band + j}").cast("string") for j in range(rows_per_band)],
        )
        for bi in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band_key"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "band_key")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # Exact-Jaccard verify as a candidate-restricted hash equi-join:
    # |A ∩ B| = count of shared h per candidate pair (Jaccard over distinct
    # collision-free hashes == Jaccard over shingles). Candidate pairs with
    # zero shared hashes drop out of the inner join — their jaccard is 0,
    # below any sane threshold, so the result is unchanged.
    ea = ex.select(F.col("doc_id").alias("doc_a"), "h")
    eb = ex.select(F.col("doc_id").alias("doc_b"), "h")
    sizes = sig.select("doc_id", "n_shingles")
    # count(*) is safe here BECAUSE h is full-width: distinct shingles map
    # to distinct h (collision odds ~2^-60 per pair; a hit would surface as
    # an oracle hash mismatch, loudly), so (doc_id, h) rows are unique and
    # the raw join-match count IS the distinct intersection size. The
    # mod-p-hash form needed count_distinct — a second aggregate exchange
    # on (doc_a, doc_b, h). n_shingles stays count(*) over the exploded
    # distinct-shingle rows = len(shingles), matching the oracle's n_sh.
    inter = (
        cand.join(ea, "doc_a")
        .join(eb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    verified = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")), "doc_a"
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")), "doc_b"
        )
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
    """Per-document SimHash (over distinct n-gram shingles).

    Row-relational shape (see minhash_lsh_pairs): explode to (doc_id, h)
    rows — md5 stays in whole-stage codegen instead of an interpreted
    per-array lambda — then the per-bit votes are ``bits`` sum() aggregates
    in ONE groupBy pass with map-side partial aggregation; no per-doc hash
    array ever materializes. ``skip_empty`` drops docs with no shingles
    (their simhash degenerates to 0) — pairing callers want that; the
    table form keeps them via a left join (simhash 0, as before)."""
    sh = _shingle_sets(df, id_col, text_col, n)
    ex = explode_nonempty(sh, ["doc_id"], "shingles", "shingle").select(
        "doc_id", F.expr(HASH64_SQL.format(x="shingle")).alias("h64")
    )
    vote = lambda b: F.sum(
        F.when(F.shiftright(F.col("h64"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
    )
    votes = ex.groupBy("doc_id").agg(*[vote(b).alias(f"v{b}") for b in range(bits)])
    sim = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
                for b in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    if skip_empty:
        return sim
    # docs with no shingles voted nowhere; restore them with simhash 0
    return (
        sh.select("doc_id")
        .join(sim, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


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
    if bits % n_bands != 0 or bits < n_bands:
        # review r9: bits=30 would leave bits 28-29 UNBANDED (30//4 = 7-bit
        # bands cover only bits 0-27), so a pair differing only in the top
        # bits shares no band key and the pigeonhole recall guarantee the
        # ValueError above exists to protect silently breaks; bits < 4
        # degenerates to band_bits=0 (one bucket = full cross product).
        raise ValueError(
            f"bits={bits} must be a positive multiple of n_bands={n_bands}: "
            "the band split must cover every bit or the <= max_hamming "
            "recall guarantee does not hold"
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


def _minhash_sig_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, k: int, bands: int,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(ex, sizes, banded) for one side of an asymmetric MinHash join —
    the same row-relational shape as minhash_lsh_pairs (portable hash
    tier), factored so the incremental path can build each side
    independently. ``ex`` is persisted: it feeds the signature groupBy
    and the cross-side verify join (two different shuffle keys)."""
    ex = _ex_rows(df, id_col, text_col, n)
    if persist:
        # eager: the signature groupBy and the cross-side verify join are
        # submitted concurrently by AQE under one action — a lazy persist
        # recomputes the shingle+hash subtree once per consumer stage
        # (see partitioning.eager_cache)
        ex = eager_cache(ex)
    sizes, banded = _sig_from_ex(ex, k, bands)
    return ex, sizes, banded


def _ex_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Exploded (doc_id, h) rows under the full-width portable hash — the
    shared build of every portable-tier MinHash side. Permutations reduce
    mod p later, inside the min() (see minhash_lsh_pairs — same
    verify-needs-no-dedup argument)."""
    sh = _shingle_sets(df, id_col, text_col, n)
    return explode_nonempty(sh, ["doc_id"], "shingles", "shingle").select(
        "doc_id", F.expr(HASH64_SQL.format(x="shingle")).alias("h")
    )


def _sig_from_ex(ex: DataFrame, k: int, bands: int) -> tuple[DataFrame, DataFrame]:
    """(sizes, banded) derived from exploded (doc_id, h) rows: one groupBy
    computes the k MinHash values + set size; band keys explode from it."""
    coeffs = minhash_coeffs(k)
    rows_per_band = k // bands
    hp = F.pmod(F.col("h"), F.lit(MERSENNE_P))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * hp + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
        F.count("*").alias("n_shingles"),
    )
    band_cols = [
        F.concat_ws(
            ",",
            F.lit(str(bi)),
            *[F.col(f"m{bi * rows_per_band + j}").cast("string") for j in range(rows_per_band)],
        )
        for bi in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band_key"))
    return sig.select("doc_id", "n_shingles"), banded


class MinhashIndex(NamedTuple):
    """Prepared index-side artifacts plus the signature parameters they
    were built with — carried along so a join can refuse artifacts whose
    band keys could never match its own (wrong n/k/bands silently yields
    an empty candidate set, i.e. every duplicate admitted as unique)."""

    ex: DataFrame
    sizes: DataFrame
    banded: DataFrame
    n: int
    k: int
    bands: int


def minhash_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 16, bands: int = 4
) -> MinhashIndex:
    """Precompute (and pin) the stored-index artifacts for repeated
    incremental joins: the exploded (doc, hash) rows, the per-doc set
    sizes, and the banded signature table — all persisted and eagerly
    materialized, so a stream deduping many micro-batches against the same
    index hashes the corpus ONCE, not once per batch. On disk at 100 TB
    these would be bucketed by band_key (banded) and doc_id (ex/sizes);
    see tests/test_streaming_incremental.py for the bucketed-plan assert."""
    if bands < 1 or k % bands != 0:
        raise ValueError(f"bands={bands} must divide k={k} exactly")
    ex, sizes, banded = _minhash_sig_rows(df, id_col, text_col, n, k, bands)
    sizes = sizes.persist()
    banded = banded.persist()
    banded.count()  # materializes ex -> sizes -> banded in one pass
    return MinhashIndex(ex, sizes, banded, n, k, bands)


def minhash_lsh_join(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.4,
    index_artifacts: MinhashIndex | None = None,
    persist_new: bool = True,
) -> DataFrame:
    """INCREMENTAL dedup: match a new ingest batch against an existing
    corpus index without ever generating index×index (or batch×batch)
    pairs — the shape a continuously-ingesting 100 TB pipeline actually
    runs, where the index side's signatures are a stored, band-bucketed
    table and only the (much smaller) new batch is hashed per run.

    Candidates = (new, index) doc pairs sharing any MinHash band key —
    an equi-join of the new batch's band rows against the index's band
    rows; with the index banded table pre-bucketed by band_key on disk,
    the join is co-located and the per-run cost is driven by batch size,
    not corpus size. Verify = exact Jaccard restricted to candidates,
    via the cross-side (doc, hash) equi-join (count of DISTINCT shared
    hashes — same collision-safe argument as minhash_lsh_pairs).

    Output: (new_id, index_id, jaccard) with jaccard >= threshold.
    """
    if bands < 1 or k % bands != 0:
        raise ValueError(f"bands={bands} must divide k={k} exactly")
    if index_artifacts is not None:
        if (index_artifacts.n, index_artifacts.k, index_artifacts.bands) != (n, k, bands):
            raise ValueError(
                f"index_artifacts were built with (n={index_artifacts.n}, "
                f"k={index_artifacts.k}, bands={index_artifacts.bands}) but the "
                f"join requested (n={n}, k={k}, bands={bands}) — mismatched "
                "band keys would silently produce an empty candidate set"
            )
        # persist_new=False for per-micro-batch streaming callers: the batch
        # side is small enough to recompute (2 consumers) and an
        # un-unpersisted cache entry per micro-batch would accumulate for
        # the stream lifetime.
        ex_n, sizes_n, banded_n = _minhash_sig_rows(
            new_df, id_col, text_col, n, k, bands, persist=persist_new
        )
        ex_i, sizes_i, banded_i = (
            index_artifacts.ex,
            index_artifacts.sizes,
            index_artifacts.banded,
        )
    elif persist_new:
        import os as _os

        if _os.environ.get("SPARK_GRAFT_INCR_BUILD", "union") == "pool":
            # A/B variant (r18 verdict item 3): each side's exploded hash
            # table materialized as its OWN eager job, the two jobs
            # submitted together (§2.6) — restores the two independent
            # materializations the union build serialized into one job's
            # critical path, without the r17 lazy form's AQE recompute race
            sides = overlap_jobs([
                lambda: eager_cache(_ex_rows(new_df, id_col, text_col, n)),
                lambda: eager_cache(_ex_rows(index_df, id_col, text_col, n)),
            ])
            ex_n, ex_i = sides[0], sides[1]
        else:
            # Both sides built fresh: materialize BOTH exploded hash tables
            # in ONE job (union with a side tag) instead of one eager job
            # per side (r18) — halves the materialization barriers and lets
            # the two sides' tokenize+shingle+hash CPU run in the same
            # stage. The side filters below are cheap predicates over the
            # materialized blocks.
            both = eager_cache(
                _ex_rows(new_df, id_col, text_col, n).select(
                    F.lit(True).alias("__new"), "doc_id", "h"
                ).unionByName(
                    _ex_rows(index_df, id_col, text_col, n).select(
                        F.lit(False).alias("__new"), "doc_id", "h"
                    )
                )
            )
            ex_n = both.where(F.col("__new")).select("doc_id", "h")
            ex_i = both.where(~F.col("__new")).select("doc_id", "h")
        sizes_n, banded_n = _sig_from_ex(ex_n, k, bands)
        sizes_i, banded_i = _sig_from_ex(ex_i, k, bands)
    else:
        ex_n, sizes_n, banded_n = _minhash_sig_rows(
            new_df, id_col, text_col, n, k, bands, persist=False
        )
        ex_i, sizes_i, banded_i = _minhash_sig_rows(index_df, id_col, text_col, n, k, bands)
    cand = (
        banded_n.select(F.col("doc_id").alias("new_id"), "band_key")
        .join(banded_i.select(F.col("doc_id").alias("index_id"), "band_key"), "band_key")
        .select("new_id", "index_id")
        .distinct()
    )
    # count(*): h is the full-width collision-free hash (see
    # minhash_lsh_pairs), so raw match count == distinct intersection size
    inter = (
        cand.join(ex_n.select(F.col("doc_id").alias("new_id"), "h"), "new_id")
        .join(ex_i.select(F.col("doc_id").alias("index_id"), "h"), ["index_id", "h"])
        .groupBy("new_id", "index_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes_n.select(F.col("doc_id").alias("new_id"), F.col("n_shingles").alias("nn")),
            "new_id",
        )
        .join(
            sizes_i.select(F.col("doc_id").alias("index_id"), F.col("n_shingles").alias("ni")),
            "index_id",
        )
        .withColumn(
            "jaccard", F.round(F.col("inter") / (F.col("nn") + F.col("ni") - F.col("inter")), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "index_id", "jaccard")
    )


def prefix_candidates(
    ex: DataFrame,
    sizes: DataFrame,
    t_num: int,
    t_den: int,
    freq: DataFrame | None = None,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs sharing an element of BOTH docs'
    rarest-first prefixes (see :func:`jaccard_prefix_pairs` for the bound
    and the integer-arithmetic rationale), with two lossless pre-verify
    filters applied in the same pass:

    - AllPairs SIZE filter, inside the join: J >= t forces
      inter >= t·max(|A|,|B|) and inter <= min(|A|,|B|), so t·max <= min —
      size-incompatible pairs never join.
    - PPJoin POSITIONAL filter (Xiao et al. WWW'08, public literature), on
      the per-pair aggregate that replaces the old ``.distinct()`` (same
      shuffle, two extra int columns): every doc's shingle list is ranked
      by ONE global total order (ascending df, sh_h tie-break), so rank
      within a doc is monotone in that order. Let t₀ be the prefix-matched
      shared token with the minimum ranks (i in A, j in B) — minima over
      matches are achieved simultaneously because of the shared order.
      EVERY shared token is globally >= t₀: a prefix-prefix shared token
      by t₀'s minimality, and any token in either side's SUFFIX is
      globally larger than that side's last prefix token, hence > t₀
      (which sits inside the prefix). So all shared tokens have rank >= i
      in A and >= j in B, giving inter <= 1 + min(|A| - i, |B| - j); pairs
      whose bound cannot reach the threshold (J >= t ⇔
      inter·(t_num + t_den) >= t_num·(|A| + |B|)) are dropped before the
      expensive array verify. Measured on the r9 sf1 rehearsal fixture:
      45.6M -> 23.1M candidates (49% pruned; 65% at sf0.1), zero output
      change (the verify would reject every pruned pair anyway).

    ``ex``: distinct (doc_id, sh_h) rows; ``sizes``: (doc_id, n_sh);
    ``freq``: optional precomputed (sh_h, df_) table — jaccard_pairs_auto
    already materialized it for the decision pre-pass and passes it in so
    the ranking join reuses that cache instead of re-aggregating ex."""
    if freq is None:
        freq = ex.groupBy("sh_h").agg(F.count("*").alias("df_"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df_"), F.asc("sh_h"))
    prefix_len = (
        F.col("n_sh")
        - ((F.lit(t_num) * F.col("n_sh") + F.lit(t_den - 1)) / F.lit(t_den)).cast("long")
        + 1
    )
    pref = (
        ex.join(freq, "sh_h")
        .withColumn("rk", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(F.col("rk") <= prefix_len)
        .select("doc_id", "sh_h", "rk", "n_sh")
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        "sh_h",
        F.col("rk").alias("rk_a"),
        F.col("n_sh").alias("na"),
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        "sh_h",
        F.col("rk").alias("rk_b"),
        F.col("n_sh").alias("nb"),
    )
    pairs = (
        a.join(b, "sh_h")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                F.lit(t_num) * F.greatest("na", "nb")
                <= F.lit(t_den) * F.least("na", "nb")
            )
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.min("rk_a").alias("i"),
            F.min("rk_b").alias("j"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    ub = F.lit(1) + F.least(F.col("na") - F.col("i"), F.col("nb") - F.col("j"))
    return pairs.where(
        ub * F.lit(t_num + t_den) >= F.lit(t_num) * (F.col("na") + F.col("nb"))
    ).select("doc_a", "doc_b")


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """Prefix-filtered exact Jaccard join (the AllPairs/PPJoin candidate
    rule; Bayardo et al. WWW'07, public literature).

    ``ngram_jaccard_pairs`` above generates a candidate row per SHARED
    SHINGLE — on a corpus with hot shingles that join emits O(df²) rows
    per hot shingle before any threshold applies. This variant joins only
    on each document's PREFIX: order the set by ascending document
    frequency (rarest first, sh_h tie-break); for Jaccard >= t a
    qualifying pair must share an element inside BOTH sides' first
    ``|d| - ceil(t·|d|) + 1`` elements (J >= t forces inter >= t·|A| and
    >= t·|B|, so skipping a whole prefix caps inter below t·|d| — the
    filter is LOSSLESS, asserted against the brute-force join in
    tests/test_prefix_jaccard.py). Hot shingles are by definition frequent,
    so they sort to the END of each set and out of most prefixes: the
    candidate join's fanout is bounded by prefix rows, not raw df².

    Exactness: the threshold is a RATIONAL t_num/t_den applied in integer
    arithmetic on both the prefix length (``ceil(t·n) = (t_num·n +
    t_den - 1) div t_den``) and the final test (``t_den·inter >=
    t_num·(na + nb - inter)``) — an IEEE ``ceil(0.6 * 5)`` evaluates to
    ceil(3.0000000000000004) = 4 and silently SHORTENS the prefix, which
    breaks losslessness; the integer forms can't.

    Verify cost: ONE row per candidate — the candidate pair joins each
    side's hashed shingle ARRAY (doc-keyed joins, arrays bounded by doc
    size) and intersects them in a single codegen ``array_intersect``; the
    earlier exploded-verify (candidate × per-shingle rows) measured 19x
    slower than the plain join at sf0.1 from the |cand|·avg_set fanout.

    Corpus trade, MEASURED both ways (tools/prefixjoin_win.py →
    PREFIXJOIN_WIN.json, r8): on the hot-shingle-FREE sf0.1 corpus the
    plain all-shared-shingle join still wins on wall (≈3.0s vs ≈4.5s —
    its df² blowup never happens while the prefix pays its freq-join +
    per-doc ranking up front), but on the boilerplate fixture the
    operator exists for (a 64-word license-header block prepended to 10%
    of a 50k-doc corpus — the CCNet reality) the plain join's
    pre-threshold volume hits 1.10 BILLION rows, its hot shingle keys
    concentrate ~C(5000,2)-row join outputs on single straggler tasks,
    and it loses 54.2s to 25.2s — while the prefix candidates stay at
    7.9M (139x less) because frequent shingles rank out of every
    rarest-first prefix. Outputs asserted identical in every case
    (lossless). On benign corpora prefer ``ngram_jaccard_pairs``; on
    anything boilerplate-contaminated, this operator is the difference
    between linear and quadratic.
    """
    sh = _shingle_sets(df, id_col, text_col, n)
    # Persist the EXPLODED (doc_id, sh_h) rows, hashed in the row pipeline:
    # xxhash64 on a row column runs inside whole-stage codegen, where the
    # old per-doc `F.transform(shingles, xxhash64)` array build ran the
    # lambda INTERPRETED (higher-order functions get no codegen — the same
    # trap the MinHash path measured 2.5x slower and rewrote, see
    # minhash_lsh_pairs above; r9 probe: 4.5s -> 1.2s for the sf0.1 build).
    # Five consumers (freq, prefix ranking, sizes, verify ×2 sides) all
    # derive from this one cache, so tokenize+shingle+hash — the CPU-bound
    # stage (measured: the un-persisted form spent ~24s of its 38s at
    # sf0.1 re-shingling) — runs once; the verify's per-doc hash ARRAYS
    # come back via one collect_list groupBy whose identical exchange
    # subtree Spark's ReuseExchange collapses across the three array
    # consumers. persist() is MEMORY_AND_DISK: skinny (long, long) rows
    # spill rather than OOM at corpus scale. Cache lifetime is bounded to
    # THIS call: the final (small, threshold-filtered) result is eagerly
    # materialized via truncate_lineage below and the corpus-sized cache
    # released before returning — a lazily returned plan would pin the
    # cache in executor memory for the session (the similarity.py leak
    # class flagged in ADVICE r7).
    ex = eager_cache(
        explode_nonempty(sh, ["doc_id"], "shingles", "shingle")
        .select("doc_id", F.xxhash64("shingle").alias("sh_h"))
    )
    try:
        docs = ex.groupBy("doc_id").agg(
            F.collect_list("sh_h").alias("hs"), F.count("*").alias("n_sh")
        )
        sizes = docs.select("doc_id", "n_sh")
        cand = prefix_candidates(ex, sizes, t_num, t_den)
        sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
        sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
        verified = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("hs_a", "hs_b")).alias("inter"),
                F.size("hs_a").alias("na"),
                F.size("hs_b").alias("nb"),
            )
        )
        return (
            verified.where(
                F.lit(t_den) * F.col("inter")
                >= F.lit(t_num) * (F.col("na") + F.col("nb") - F.col("inter"))
            )
            .select(
                "doc_a",
                "doc_b",
                F.round(
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
                ).alias("jaccard"),
            )
            .transform(truncate_lineage)
        )
    finally:
        ex.unpersist()


def jaccard_pairs_auto(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    hot_key_rows_cutoff: int = 4_000_000,
    per_core_rows_cutoff: int = 10_000_000,
    decision_out: dict | None = None,
) -> DataFrame:
    """Adaptive exact-Jaccard join: pick the PLAIN all-shared-shingle
    candidate rule or the PREFIX (AllPairs/PPJoin) rule per corpus, from a
    one-row frequency pre-pass — the CCNet reality is you don't know
    whether a corpus is boilerplate-contaminated until you look.

    Decision signals, both read off the shingle document-frequency table
    the prefix path needs anyway (one extra scalar aggregate, one driver
    row):

    - ``hot = C(max_df, 2)``: the plain join's output for its single
      hottest shingle key. A hash equi-join sends one key to ONE task, so
      this many rows land on a single straggler no matter how many
      executors exist — skew does not parallelize. Cutoff 4M sits between
      the measured fine case (PREFIXJOIN_WIN.json, 30%-boilerplate sf0.1:
      C(1667,2) ≈ 1.4M, plain still won 2.96s vs 3.55s) and the measured
      death case (10%-boilerplate 50k docs: C(5000,2) ≈ 12.5M per hot
      shingle drove 54.2s vs prefix 25.2s).
    - ``vol = Σ C(df, 2)``: the plain join's total pre-threshold candidate
      volume, compared against ``per_core_rows_cutoff ×
      defaultParallelism`` — shuffle/join throughput scales with cores, so
      the budget is per-core (local[32] ⇒ 3.2e8, between the measured
      9.6e7 plain-win and 1.1e9 plain-loss volumes), while the ``hot``
      cutoff above stays absolute.

    Either trip ⇒ prefix. Both paths share the one persisted exploded
    (doc_id, sh_h) build and apply the SAME integer rational threshold, so
    the choice is invisible in the output (decision flip + equality with
    the brute join asserted both ways in tests/test_patterns_chunked.py);
    it only moves the candidate bound. The
    decision and its inputs are returned via ``decision_out`` (a dict the
    caller passes in) for pipeline logging.
    """
    spark = df.sparkSession
    sh = _shingle_sets(df, id_col, text_col, n)
    ex = (
        explode_nonempty(sh, ["doc_id"], "shingles", "shingle")
        .select("doc_id", F.xxhash64("shingle").alias("sh_h"))
        .persist()
    )
    try:
        freq = ex.groupBy("sh_h").agg(F.count("*").alias("df_")).persist()
        stats = freq.agg(
            F.max("df_").alias("max_df"),
            (F.sum(F.col("df_") * (F.col("df_") - 1)) / 2).cast("long").alias("vol"),
        ).collect()[0]  # ONE driver row: two scalars
        max_df = stats["max_df"] or 0
        vol = stats["vol"] or 0
        hot = max_df * (max_df - 1) // 2
        vol_cutoff = per_core_rows_cutoff * spark.sparkContext.defaultParallelism
        use_prefix = hot > hot_key_rows_cutoff or vol > vol_cutoff
        if decision_out is not None:
            decision_out.update(
                rule="prefix" if use_prefix else "plain",
                hottest_shingle_df=int(max_df),
                hot_key_join_rows=int(hot),
                plain_join_rows=int(vol),
                hot_key_rows_cutoff=hot_key_rows_cutoff,
                total_rows_cutoff=int(vol_cutoff),
            )
        if use_prefix:
            # identical subtree for sizes and the verify arrays, exactly as
            # in jaccard_prefix_pairs: ReuseExchange then computes the
            # (doc_id) aggregation once for all three consumers
            docs = ex.groupBy("doc_id").agg(
                F.collect_list("sh_h").alias("hs"), F.count("*").alias("n_sh")
            )
            sizes = docs.select("doc_id", "n_sh")
            cand = prefix_candidates(ex, sizes, t_num, t_den, freq=freq)
            sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
            sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
            verified = (
                cand.join(sa, "doc_a")
                .join(sb, "doc_b")
                .select(
                    "doc_a",
                    "doc_b",
                    F.size(F.array_intersect("hs_a", "hs_b")).alias("inter"),
                    F.size("hs_a").alias("na"),
                    F.size("hs_b").alias("nb"),
                )
            )
        else:
            sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
            a = ex.select(F.col("doc_id").alias("doc_a"), "sh_h")
            b = ex.select(F.col("doc_id").alias("doc_b"), "sh_h")
            inter = (
                a.join(b, "sh_h")
                .where(F.col("doc_a") < F.col("doc_b"))
                .groupBy("doc_a", "doc_b")
                .agg(F.count("*").alias("inter"))
            )
            verified = inter.join(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
                "doc_a",
            ).join(
                sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
                "doc_b",
            )
        return (
            verified.where(
                F.lit(t_den) * F.col("inter")
                >= F.lit(t_num) * (F.col("na") + F.col("nb") - F.col("inter"))
            )
            .select(
                "doc_a",
                "doc_b",
                F.round(
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
                ).alias("jaccard"),
            )
            .transform(truncate_lineage)
        )
    finally:
        ex.unpersist()
        freq.unpersist()
