"""Unit tests for deterministic sampling and sequence packing operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.packing import pack_concat_chunks
from data_wrangle_openstreetmaps_data_1_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_sample_is_stable_and_near_rate(ids):
    a = {r["doc_id"] for r in hash_sample(ids, "doc_id", 1000).collect()}
    b = {r["doc_id"] for r in hash_sample(ids.repartition(7), "doc_id", 1000).collect()}
    assert a == b  # partitioning-independent
    assert 0.06 < len(a) / 2000 < 0.14  # ~10%


def test_hash_sample_salts_are_independent_and_ranges_nest(ids):
    s1 = {r["doc_id"] for r in hash_sample(ids, "doc_id", 1000, salt="s1").collect()}
    s2 = {r["doc_id"] for r in hash_sample(ids, "doc_id", 1000, salt="heldout").collect()}
    assert s1 != s2
    # growing the rate with the SAME salt strictly extends the sample
    wider = {r["doc_id"] for r in hash_sample(ids, "doc_id", 3000, salt="s1").collect()}
    assert s1 < wider


def test_hash_sample_rejects_bad_rate(ids):
    with pytest.raises(ValueError, match="rate_bp"):
        hash_sample(ids, "doc_id", 10_001)


def test_stratified_sample_exact_per_stratum(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    out = stratified_sample(df, "lang", "doc_id", 7).collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    assert set(per) == {"0", "1", "2"}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 8))
    # small stratum: takes everything it has
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, lang string")
    assert stratified_sample(tiny, "lang", "doc_id", 7).count() == 2


def test_pack_concat_chunks_layout_invariants(spark):
    # one shard so the stream is a single sequence we can replay by hand
    df = spark.createDataFrame(
        [(0, 100), (8, 500), (16, 30), (24, 0), (32, 700)], "doc_id long, n_tokens long"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_concat_chunks(df, "doc_id", "n_tokens", max_tokens=512, n_shards=8).collect()
    }
    # stream: [0,100) [100,600) [600,630) [630,630) [630,1330)
    assert (rows[0]["chunk_id"], rows[0]["chunk_offset"], rows[0]["n_chunks"]) == (0, 0, 1)
    assert (rows[8]["chunk_id"], rows[8]["chunk_offset"], rows[8]["n_chunks"]) == (0, 100, 2)
    assert (rows[16]["chunk_id"], rows[16]["chunk_offset"], rows[16]["n_chunks"]) == (1, 88, 1)
    assert rows[24]["n_chunks"] == 0  # empty doc occupies nothing
    assert (rows[32]["chunk_id"], rows[32]["n_chunks"]) == (1, 2)
    assert all(r["shard"] == r["doc_id"] % 8 for r in rows.values())


def test_pack_concat_chunks_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="max_tokens"):
        pack_concat_chunks(df, "doc_id", "n_tokens", max_tokens=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_concat_chunks(df, "doc_id", "n_tokens", max_tokens=512, n_shards=0)
