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
    """Spark-SQL string: LSH band keys from a signature array expression.

    Only safe when ``signature_sql`` is a bound column reference: an inline
    signature expression would be re-evaluated once per band (bands x k
    permutation scans). Prefer :func:`minhash_band_keys_sql`, which emits
    each permutation exactly once.
    """
    keys = ", ".join(
        f"concat_ws(',', '{bi}', concat_ws(',', transform("
        f"slice({signature_sql}, {bi * rows_per_band + 1}, {rows_per_band}), v -> cast(v as string))))"
        for bi in range(bands)
    )
    return f"array({keys})"


def minhash_band_keys_sql(hashes_col: str, k: int, bands: int, seed: int = 7) -> str:
    """Spark-SQL string: LSH band keys straight from the hash-array column.

    Emits every affine permutation exactly once (grouped into its band)
    instead of materializing the full signature per band key — the band key
    values are identical to ``minhash_bands_sql(minhash_signature_sql(...))``
    but the expression does k array scans, not bands*k.
    """
    rows_per_band = k // bands
    coeffs = minhash_coeffs(k, seed)
    keys = []
    for bi in range(bands):
        mins = ", ".join(
            f"cast(coalesce(array_min(transform({hashes_col}, h -> ({a}L * h + {b}L) % {MERSENNE_P})), {MERSENNE_P}) as string)"
            for a, b in coeffs[bi * rows_per_band : (bi + 1) * rows_per_band]
        )
        keys.append(f"concat_ws(',', '{bi}', {mins})")
    return f"array({', '.join(keys)})"


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


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 bit-vectors via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def fast_hash64(col: Column) -> Column:
    """xxhash64 — Spark-native fast path for 100 TB (no oracle parity)."""
    return F.xxhash64(col)
