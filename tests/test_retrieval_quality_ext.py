"""Unit tests for the round-6 extension tier: BM25 retrieval, quality
gates, line-level dedup, incremental MinHash join, blocked fuzzy match."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.fuzzy import fuzzy_blocked_pairs
from data_wrangle_openstreetmaps_data_1_spark.operators.linedup import line_dedup
from data_wrangle_openstreetmaps_data_1_spark.operators.quality import quality_gates
from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import bm25_topk
from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import minhash_lsh_join


def test_bm25_tf_monotone_same_length(spark):
    # equal-length docs: more occurrences of the query term => higher score
    docs = spark.createDataFrame(
        [
            (1, "cat dog bird fish mouse"),
            (2, "cat cat dog bird fish"),
            (3, "cat cat cat dog bird"),
            (4, "dog bird fish mouse wolf"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, "doc_id", "text", ["cat"], k=10).orderBy("rnk").collect()
    assert [r.doc_id for r in out] == [3, 2, 1]  # doc 4 has no 'cat'
    assert out[0].score_fp > out[1].score_fp > out[2].score_fp > 0
    assert all(r.df == 3 for r in out)


def test_bm25_length_normalization(spark):
    # same tf: the shorter doc scores higher (b > 0 length normalization)
    docs = spark.createDataFrame(
        [
            (1, "cat dog"),
            (2, "cat dog bird fish mouse wolf bear lion tiger fox"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.score_fp for r in bm25_topk(docs, "doc_id", "text", ["cat"], k=10).collect()}
    assert out[1] > out[2]


def test_quality_gates_each_rule(spark):
    long_ok = " ".join(["the"] + [f"tok{i}" for i in range(49)])  # 50 tokens, varied
    docs = spark.createDataFrame(
        [
            (1, long_ok),  # passes everything
            (2, "the cat sat"),  # fails g_len (3 tokens)
            (3, " ".join(["the"] + ["a" * 12] * 49)),  # fails g_wordlen (long tokens)
            (4, " ".join([f"tok{i}" for i in range(50)])),  # fails g_stop
            (5, "the " + " ".join(["spam"] * 49)),  # fails g_rep (modal 49/50)
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in quality_gates(docs, "doc_id", "text").collect()}
    assert rows[1].passed
    assert not rows[2].g_len and not rows[2].passed
    assert not rows[3].g_wordlen and not rows[3].passed
    assert not rows[4].g_stop and not rows[4].passed
    assert not rows[5].g_rep and not rows[5].passed


def test_line_dedup_rebuild_digest(spark):
    # 10-token lines; docs 1 and 2 share their first line exactly, second
    # lines are unique; doc 3 is entirely unique.
    shared = " ".join(f"w{i}" for i in range(10))
    u1 = " ".join(f"x{i}" for i in range(10))
    u2 = " ".join(f"y{i}" for i in range(10))
    u3 = " ".join(f"z{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{shared} {u1}"), (2, f"{shared} {u2}"), (3, u3)],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in line_dedup(docs, "doc_id", "text").collect()}
    assert rows[1].n_lines == 2 and rows[1].n_kept == 1
    assert rows[1].clean_md5 == hashlib.md5(u1.encode()).hexdigest()
    assert rows[2].clean_md5 == hashlib.md5(u2.encode()).hexdigest()
    assert rows[3].n_kept == 1 and rows[3].clean_md5 == hashlib.md5(u3.encode()).hexdigest()


def test_line_dedup_all_dropped(spark):
    line = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, line), (2, line)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in line_dedup(docs, "doc_id", "text").collect()}
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in rows.values():
        assert r.n_kept == 0 and r.clean_md5 == empty_md5


def test_fuzzy_blocked_second_token_pass(spark):
    # 'red widget'/'ted widget' share only the SECOND token — single-key
    # (first-token) blocking would miss them; the multi-pass union finds it.
    df = spark.createDataFrame(
        [("red widget",), ("ted widget",), ("red wadget",), ("blue bolt",)],
        ["p_name"],
    )
    pairs = {
        (r.name_a, r.name_b): r.dist
        for r in fuzzy_blocked_pairs(df, "p_name", max_dist=2).collect()
    }
    assert pairs[("red widget", "ted widget")] == 1
    assert pairs[("red wadget", "red widget")] == 1
    # 'ted widget' vs 'red wadget': shares neither first nor second token
    # => never a candidate, even though dist would be 2
    assert ("red wadget", "ted widget") not in pairs
    assert all(d >= 1 for d in pairs.values())


def test_minhash_join_is_asymmetric(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(1, 40))  # drop one token
    other = " ".join(f"zzz{i}" for i in range(40))
    index = spark.createDataFrame([(1, base), (2, other), (3, other)], ["doc_id", "text"])
    new = spark.createDataFrame([(100, near), (101, " ".join(f"q{i}" for i in range(40)))],
                                ["doc_id", "text"])
    out = minhash_lsh_join(new, index, "doc_id", "text", threshold=0.4).collect()
    got = {(r.new_id, r.index_id): r.jaccard for r in out}
    assert (100, 1) in got and got[(100, 1)] > 0.9
    # docs 2 and 3 are exact dups WITHIN the index: an index-side pair must
    # never appear — output ids are strictly (new, index)
    assert all(n in (100, 101) and i in (1, 2, 3) for n, i in got)
    assert (101, 1) not in got


def test_weighted_sample_nested_and_bounds(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.sampling import (
        weighted_hash_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(500).select(F.col("id").alias("k"))
    zero = weighted_hash_sample(df.withColumn("w", F.lit(0)), "k", "w", 100)
    full = weighted_hash_sample(df.withColumn("w", F.lit(100)), "k", "w", 100)
    lo = {r.k for r in weighted_hash_sample(df.withColumn("w", F.lit(30)), "k", "w", 100).collect()}
    hi = {r.k for r in weighted_hash_sample(df.withColumn("w", F.lit(60)), "k", "w", 100).collect()}
    assert zero.count() == 0
    assert full.count() == 500
    assert lo <= hi  # same salt: larger weight strictly extends the sample
    assert 0 < len(lo) < len(hi) < 500


def test_upsert_snapshot_ops(spark):
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    rows = query_map()["u_upsert_snapshot"](spark, "/root/testdata/sf0.001").collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r.op, []).append(r)
    # every customer key survives; updates are exactly the %10 keys;
    # inserts live strictly ABOVE the snapshot's key range (offset derives
    # from max(c_custkey)+1 — disjoint at any scale factor)
    max_snap_key = max(r.key for ops in ("keep", "update") for r in by_op[ops])
    assert all(r.key % 10 == 0 for r in by_op["update"])
    assert all(r.key > max_snap_key for r in by_op["insert"])
    assert len(by_op["update"]) > 0 and len(by_op["insert"]) > 0
    keys = {r.key for r in rows}
    assert len(keys) == len(rows)  # merge is key-unique
