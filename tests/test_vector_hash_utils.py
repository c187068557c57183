"""Unit tests for small utility functions not exercised via the registry:
hamming64, fast_hash64, l2_dist, portable hash parity with DuckDB."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.hashing import (
    fast_hash64,
    hamming64,
    portable_hash64,
    portable_hash_p,
)
from data_wrangle_openstreetmaps_data_1_spark.functions.vectors import l2_dist


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0001), (7, 7), (0, -1)], "a long, b long")
    got = [r[0] for r in df.select(hamming64(F.col("a"), F.col("b"))).collect()]
    assert got == [2, 0, 64]


def test_fast_hash64_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "s string")
    vals = [r[0] for r in df.select(fast_hash64(F.col("s"))).collect()]
    assert vals[0] == vals[1] != vals[2]


def test_l2_dist(spark):
    df = spark.createDataFrame([([0.0, 3.0], [4.0, 0.0])], "a array<double>, b array<double>")
    assert df.select(l2_dist(F.col("a"), F.col("b"))).collect()[0][0] == 5.0


def test_minhash_fast_tier_pairs_are_true_near_dups(spark, sf_small):
    """The fast (xxhash64) tier has no oracle twin; assert the
    hash-independent property instead: every emitted pair's EXACT Jaccard —
    recomputed here over the raw shingle strings, no hashing involved —
    meets the threshold, and the reported value matches."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import minhash_lsh_pairs
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table
    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens, word_shingles

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4, hash_tier="fast"
    ).collect()
    assert pairs, "fast tier produced no near-dup pairs on the sample corpus"

    sh = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", F.array_distinct(word_shingles(tokens(F.col("text")), 3)).alias("sh")
        ).collect()
    }
    for p in pairs:
        a, b = sh[p["doc_a"]], sh[p["doc_b"]]
        j = round(len(a & b) / len(a | b), 6)
        assert j >= 0.4, (p, j)
        assert abs(j - p["jaccard"]) < 1e-6, (p, j)


def test_portable_hash_matches_duckdb(spark):
    """The cross-engine parity contract every dedup oracle rests on."""
    words = ["", "a", "hello world", "Coeur d'Alene", "x" * 100]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    spark_h64 = [r[0] for r in df.select(portable_hash64(F.col("s"))).collect()]
    spark_hp = [r[0] for r in df.select(portable_hash_p(F.col("s"))).collect()]

    con = duckdb.connect()
    for w, h64, hp in zip(words, spark_h64, spark_hp):
        d64, dp = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT,"
            " ('0x' || substr(md5(?), 1, 15))::BIGINT % 2147483647",
            [w, w],
        ).fetchone()
        assert (h64, hp) == (d64, dp), w
