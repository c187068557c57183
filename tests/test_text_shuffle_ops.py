"""Unit tests for the repetition/PII/shuffle tier (round-3 additions):
properties the SQL oracle can't easily express — permutation validity,
partitioning stability, redaction semantics on crafted strings.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.text import scrub_pii, word_shingles, tokens
from data_wrangle_openstreetmaps_data_1_spark.operators.sampling import shuffle_order


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 300).select(F.col("id").alias("doc_id"))


def test_shuffle_order_is_a_permutation(spark, docs):
    out = shuffle_order(docs, "doc_id", n_shards=8).toPandas()
    assert len(out) == 300
    assert out["doc_id"].nunique() == 300
    # within every shard, pos is exactly 1..|shard| (dense rank, no gaps)
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))


def test_shuffle_order_stable_across_partitionings(spark, docs):
    a = shuffle_order(docs, "doc_id", n_shards=8).toPandas()
    b = shuffle_order(docs.repartition(13), "doc_id", n_shards=8).toPandas()
    key = lambda df: df.sort_values("doc_id", ignore_index=True)[["doc_id", "shard", "pos"]]
    pd.testing.assert_frame_equal(key(a), key(b))


def test_shuffle_order_salt_changes_permutation(spark, docs):
    a = shuffle_order(docs, "doc_id", n_shards=8, salt="sh1").toPandas()
    b = shuffle_order(docs, "doc_id", n_shards=8, salt="sh2").toPandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    # independent permutations: not every doc keeps its (shard, pos) address
    assert ((merged["shard_a"] != merged["shard_b"]) | (merged["pos_a"] != merged["pos_b"])).any()


def test_scrub_pii_redacts_all_types(spark):
    raw = (
        "write to alice.smith+x@mail.example.org or call 555-0199, "
        "backup host 10.20.30.40 and bob@corp.io again 555-0101"
    )
    df = spark.createDataFrame([(raw,)], ["text"]).select(scrub_pii(F.col("text")).alias("clean"))
    clean = df.first()["clean"]
    assert "<EMAIL>" in clean and "<PHONE>" in clean and "<IP>" in clean
    assert "@" not in clean and "555-0" not in clean and "10.20.30.40" not in clean
    # both emails and both phones hit, replacement text preserved elsewhere
    assert clean.count("<EMAIL>") == 2 and clean.count("<PHONE>") == 2
    assert clean.startswith("write to <EMAIL> or call <PHONE>,")


def test_scrub_pii_leaves_clean_text_alone(spark):
    raw = "no pii here just words and а-я unicode"
    clean = (
        spark.createDataFrame([(raw,)], ["text"])
        .select(scrub_pii(F.col("text")).alias("c"))
        .first()["c"]
    )
    assert clean == raw


def test_bigram_shingles_edges(spark):
    df = spark.createDataFrame([("a b c",), ("solo",)], ["text"]).select(
        word_shingles(tokens(F.col("text")), 2).alias("bg")
    )
    rows = [r["bg"] for r in df.collect()]
    assert rows[0] == ["a b", "b c"]
    assert rows[1] == []  # 1 token -> no bigrams, not a descending-sequence blowup


def test_mixture_sample_rates_and_nesting(spark, docs):
    from data_wrangle_openstreetmaps_data_1_spark.operators.sampling import mixture_sample

    d = docs.withColumn("rate_bp", (F.col("doc_id") % 2 * 4000 + 1000).cast("int"))
    kept = mixture_sample(d, "doc_id", F.col("rate_bp")).toPandas()
    # ~10% of the 1000bp class and ~50% of the 5000bp class survive
    lo = kept[kept.rate_bp == 1000]
    hi = kept[kept.rate_bp == 5000]
    assert len(lo) < len(hi)
    # nesting: raising every rate strictly extends the kept set
    wider = mixture_sample(d, "doc_id", F.col("rate_bp") + 2000).toPandas()
    assert set(kept["doc_id"]) <= set(wider["doc_id"])
    # determinism across partitionings
    again = mixture_sample(d.repartition(7), "doc_id", F.col("rate_bp")).toPandas()
    assert set(kept["doc_id"]) == set(again["doc_id"])


def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.functions.text import canonical_url

    cases = {
        "HTTPS://Example.COM:443/Articles/7": "https://example.com/Articles/7",
        "https://example.com/Articles/7/": "https://example.com/Articles/7",
        "https://example.com/Articles/7?utm_source=feed&utm_campaign=x": "https://example.com/Articles/7",
        "https://example.com/Articles/7#section-2": "https://example.com/Articles/7",
        # mid-query tracking strip keeps real params and the '?'
        "http://Example.com:80/a?x=1&utm_medium=m&y=2": "http://example.com/a?x=1&y=2",
        "https://example.com/a?utm_source=s": "https://example.com/a",
        # bare origin unharmed; path case preserved (case-sensitive servers)
        "https://example.com": "https://example.com",
        # :8443 is NOT a default port and must survive
        "https://example.com:8443/a": "https://example.com:8443/a",
        # a param whose name merely ENDS with a tracked name is NOT tracked
        "https://example.com/a?xgclid=1": "https://example.com/a?xgclid=1",
        "https://example.com/a?mygclid=1&y=2": "https://example.com/a?mygclid=1&y=2",
        # consecutive tracked params stripped as a run, delimiter restored
        "https://example.com/a?utm_a=1&utm_b=2&rest=3": "https://example.com/a?rest=3",
        "https://example.com/a?x=1&utm_m=2&gclid=3&y=4": "https://example.com/a?x=1&y=4",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    assert got == cases


def test_bpe_exact_greedy_merge_on_runs(spark):
    """'aaaa' must merge to [aa][aa] (greedy leftmost non-overlapping), so
    round 2's top pair is (aa, aa). A replace()-style application de-syncs
    on the shared boundary and yields [aa][a][a] — this pins the windowed
    gaps-and-islands form's exactness."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([("aaaa",)], "text string")
    rows = {r["rnd"]: r for r in bpe_merges(df, "text", rounds=2).collect()}
    assert (rows[1]["lft"], rows[1]["rgt"], rows[1]["pair_count"]) == ("a", "a", 3)
    assert (rows[2]["lft"], rows[2]["rgt"], rows[2]["pair_count"]) == ("aa", "aa", 1)


def test_bpe_merge_respects_word_frequency(spark):
    """Pair counts weight by word frequency: 3 copies of 'ab' beat one 'cd'."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([("ab ab ab cd",)], "text string")
    r1 = bpe_merges(df, "text", rounds=1).collect()[0]
    assert (r1["lft"], r1["rgt"], r1["pair_count"]) == ("a", "b", 3)
