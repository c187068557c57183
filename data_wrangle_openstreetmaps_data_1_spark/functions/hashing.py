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


def portable_hash_p(col: Column) -> Column:
    """Portable hash reduced mod p for the affine-permutation family."""
    return portable_hash64(col) % MERSENNE_P


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 bit-vectors via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def fast_hash64(col: Column) -> Column:
    """xxhash64 — Spark-native fast path for 100 TB (no oracle parity)."""
    return F.xxhash64(col)
