"""Chunked anchored pattern matching (operators/patterns.py) — the
skew-guard's graceful path — and the adaptive Jaccard candidate rule
(operators/dedup.py:jaccard_pairs_auto).

Chunked-vs-unchunked equivalence is the round-9 verdict's acceptance test:
identical counts on a corpus under the cap, across chunk sizes that force
matches to straddle chunk boundaries (chunk_size 7 < a user's event count,
down to the overlap minimum).
"""

import random

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.patterns import (
    anchored_pattern_counts,
    anchored_pattern_counts_chunked,
)


def _events(spark, n_users=20, max_events=300, seed=7):
    rng = random.Random(seed)
    rows = []
    for u in range(n_users):
        for i in range(rng.randint(0, max_events)):
            rows.append((u, i, rng.choice("vcpx")))
    return spark.createDataFrame(rows, "user_id long, seq long, c string")


def test_chunked_equals_unchunked_across_chunk_sizes(spark):
    ev = _events(spark)
    ref = {
        r["user_id"]: r["n_matches"]
        for r in anchored_pattern_counts(ev, "user_id", ["seq"], "c", "vc{0,3}p").collect()
    }
    assert ref and max(ref.values()) > 1  # fixture has real multi-match keys
    for cs in (7, 64, 10_000):  # straddling-heavy, mid, single-chunk
        got = {
            r["user_id"]: r["n_matches"]
            for r in anchored_pattern_counts_chunked(
                ev, "user_id", ["seq"], "c", "vc{0,3}p", 5, chunk_size=cs
            ).collect()
        }
        assert got == ref, f"chunk_size={cs}"


def test_chunked_boundary_straddle_exact(spark):
    """A match that spans the chunk boundary exactly once: v at position
    chunk_size-1, ccp after — must be counted once, by the chunk where it
    STARTS, and not by the next chunk."""
    cs = 4
    seq = "xxxv" + "ccp" + "x"  # match starts at pos 3 (last slot of chunk 0)
    ev = spark.createDataFrame(
        [(1, i, ch) for i, ch in enumerate(seq)], "user_id long, seq long, c string"
    )
    got = anchored_pattern_counts_chunked(
        ev, "user_id", ["seq"], "c", "vc{0,3}p", 5, chunk_size=cs
    ).collect()
    assert len(got) == 1 and got[0]["n_matches"] == 1


def test_chunked_rejects_overlap_wider_than_chunk(spark):
    ev = _events(spark, n_users=1, max_events=5)
    with pytest.raises(ValueError, match="overlap"):
        anchored_pattern_counts_chunked(
            ev, "user_id", ["seq"], "c", "v{0,9}p", 11, chunk_size=8
        )


def test_jaccard_auto_picks_plain_on_clean_and_prefix_on_hot(spark):
    """The decision flips on the hot-key signal, and BOTH paths return the
    brute-force answer (output-invisible choice)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
        jaccard_pairs_auto,
        ngram_jaccard_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(500)]
    boiler = " ".join(f"b{i}" for i in range(12))
    rows = []
    for d in range(120):
        words = [rng.choice(vocab) for _ in range(30)]
        text = " ".join(words)
        if d % 2 == 0:
            text = boiler + " " + text  # hot shingles in half the docs
        rows.append((d, text))
        if d % 10 == 0:
            rows.append((d + 10_000, text))  # planted near-exact dup
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    brute = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6).collect()
    }
    # clean cutoffs: nothing trips -> plain
    d1: dict = {}
    got_plain = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs_auto(docs, "doc_id", "text", n=3, t_num=3, t_den=5, decision_out=d1).collect()
    }
    assert d1["rule"] == "plain" and got_plain == brute
    # force the hot-key cutoff under this fixture's C(max_df,2) -> prefix
    d2: dict = {}
    got_prefix = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs_auto(
            docs, "doc_id", "text", n=3, t_num=3, t_den=5,
            hot_key_rows_cutoff=10, decision_out=d2,
        ).collect()
    }
    assert d2["rule"] == "prefix" and got_prefix == brute
    assert d2["hottest_shingle_df"] >= 60  # the boilerplate shingles are hot
    assert brute  # non-empty fixture


def test_chunked_rejects_empty_matchable_pattern(spark):
    """Review-r9 finding: a zero-width-matchable pattern diverges from the
    unchunked reference by one end-of-string count per key — must be
    rejected up front, not silently miscounted."""
    ev = _events(spark, n_users=1, max_events=5)
    with pytest.raises(ValueError, match="empty string"):
        anchored_pattern_counts_chunked(
            ev, "user_id", ["seq"], "c", "c{0,2}", 3, chunk_size=8
        )
