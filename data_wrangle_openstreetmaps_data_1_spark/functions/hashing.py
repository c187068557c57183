"""Portable + fast hashing primitives for dedup operators.

Two tiers:

- **Portable tier** (md5-based): bit-identical between Spark and DuckDB, so
  MinHash/fingerprint operators built on it are fully oracle-checkable.
  md5 costs more than murmur but the oracle-parity is worth it for the
  correctness gate; both engines evaluate it JVM-/native-side.
- **Fast tier** (xxhash64): Spark's built-in 64-bit hash for the 100 TB hot
  path (no cross-engine parity — used by the rows-only-checked variants).

MinHash uses the standard single-hash + k affine permutations scheme:
``h_i(x) = (a_i * h(x) + b_i) mod p`` with p = 2^31 - 1 (Mersenne prime).
All arithmetic stays within int64 (a_i, b_i, h(x) mod p < 2^31), so Spark
and DuckDB agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Deterministic affine-permutation coefficients (seeded LCG, no runtime RNG).
def minhash_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    coeffs = []
    state = seed
    for _ in range(k):
        state = (state * 1103515245 + 12345) % MERSENNE_P
        a = 1 + state % (MERSENNE_P - 1)
        state = (state * 1103515245 + 12345) % MERSENNE_P
        b = state % MERSENNE_P
        coeffs.append((a, b))
    return coeffs


def portable_hash64(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5, as bigint.

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# SQL-string twins of the column builders above. The hot dedup operators
# assemble their big expression trees as single ``F.expr`` strings: building
# the same tree out of Column objects costs hundreds of py4j round-trips
# (~0.5s of driver time per operator), while one expr() string is a single
# JVM call parsed natively.
HASH64_SQL = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
HASH_P_SQL = f"({HASH64_SQL} % {MERSENNE_P})"


def minhash_signature_sql(hashes_col: str, k: int = 16, seed: int = 7) -> str:
    """Spark-SQL string: array of k MinHash values over a bigint-array column."""
    mins = ", ".join(
        f"coalesce(array_min(transform({hashes_col}, h -> ({a}L * h + {b}L) % {MERSENNE_P})), {MERSENNE_P})"
        for a, b in minhash_coeffs(k, seed)
    )
    return f"array({mins})"


def minhash_bands_sql(signature_sql: str, bands: int, rows_per_band: int) -> str:
    """Spark-SQL string: LSH band keys from a signature array expression."""
    keys = ", ".join(
        f"concat_ws(',', '{bi}', concat_ws(',', transform("
        f"slice({signature_sql}, {bi * rows_per_band + 1}, {rows_per_band}), v -> cast(v as string))))"
        for bi in range(bands)
    )
    return f"array({keys})"


def simhash_sql(hashes_col: str, bits: int = 32) -> str:
    """Spark-SQL string: SimHash over a bigint-array column (per-bit votes)."""
    terms = " + ".join(
        f"(case when aggregate({hashes_col}, 0, (acc, h) -> acc + "
        f"(case when (shiftright(h, {b}) & 1) = 1 then 1 else -1 end)) > 0 "
        f"then cast({2**b} as bigint) else cast(0 as bigint) end)"
        for b in range(bits)
    )
    return f"({terms})"


def portable_hash_p(col: Column) -> Column:
    """Portable hash reduced mod p for the affine-permutation family."""
    return portable_hash64(col) % MERSENNE_P


def minhash_signature_from_hashes(hashes: Column, k: int = 16, seed: int = 7) -> Column:
    """Array of k MinHash values over a PRE-HASHED bigint-array column.

    The k affine permutations are cheap arithmetic; feeding them a
    *materialized* hash column matters because higher-order-function
    expression trees are duplicated per permutation (no codegen CSE) — the
    md5 work must not sit inside them. Empty shingle sets get p as a
    sentinel (never matches a real hash).
    """
    sigs = []
    for a, b in minhash_coeffs(k, seed):
        permuted = F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P))
        sigs.append(F.coalesce(F.array_min(permuted), F.lit(MERSENNE_P)))
    return F.array(*sigs)


def minhash_signature(shingles: Column, k: int = 16, seed: int = 7) -> Column:
    """Array of k MinHash values over a string-array column. Prefer
    :func:`minhash_signature_from_hashes` over a persisted hash column when
    the signature feeds more than one downstream branch."""
    return minhash_signature_from_hashes(
        F.transform(shingles, lambda s: portable_hash_p(s)), k, seed
    )


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: split the signature into ``bands`` groups of
    ``rows_per_band`` values; each band becomes a joinable bucket key string
    ``"<band_idx>:<v1>,<v2>,..."``. Docs sharing any band key are candidate
    near-duplicates (classic MinHash-LSH banding)."""
    keys = []
    for bi in range(bands):
        segment = F.slice(signature, bi * rows_per_band + 1, rows_per_band)
        keys.append(F.concat_ws(",", F.lit(str(bi)), F.concat_ws(",", F.transform(segment, lambda v: v.cast("string")))))
    return F.array(*keys)


def simhash_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash over a PRE-HASHED bigint-array column: per bit, sum +1/-1
    votes from each shingle hash; bit set iff the vote is positive.

    Hamming-close simhashes => similar shingle sets. Like
    :func:`minhash_signature_from_hashes`, the per-bit aggregates duplicate
    their input subtree ``bits`` times — feed a materialized column.
    """
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        for b in range(bits)
    ]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash(shingles: Column, bits: int = 32) -> Column:
    """SimHash over a string-array column (convenience form)."""
    return simhash_from_hashes(F.transform(shingles, lambda s: portable_hash64(s)), bits)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 bit-vectors via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def fast_hash64(col: Column) -> Column:
    """xxhash64 — Spark-native fast path for 100 TB (no oracle parity)."""
    return F.xxhash64(col)
