"""BPE at realistic round counts + encode/train agreement.

Round 7's review flagged the trainer's per-round lineage growth as the same
driver-OOM class components.py fixed in round 6 (plan text doubles per
round; AQE explainString alone OOMs past ~10 rounds). The fix is the same
per-round eager ``localCheckpoint``; these tests demonstrate it by running
32 rounds end-to-end — far past where the un-checkpointed form died — and
pin the encode half: tokens concatenate back to their words, and encoding
with the learned rules reproduces the trainer's applied state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.bpe import bpe_encode, bpe_merges

# deterministic corpus with deep pair diversity: 160 distinct words drawn
# from a 12-letter alphabet via a tiny LCG, repeated with varying counts so
# pair counts are frequency-weighted and ties are rare
_ALPHA = "abcdefghijkl"


def _corpus() -> list[tuple[str]]:
    words, x = [], 7
    for i in range(160):
        w = []
        for _ in range(10 + i % 5):
            x = (x * 1103515245 + 12345) % (2**31)
            w.append(_ALPHA[x % len(_ALPHA)])
        words.append("".join(w))
    # word i appears (i % 7) + 1 times
    return [(" ".join(w for i, w in enumerate(words) for _ in range(i % 7 + 1)),)]


def test_bpe_merges_32_rounds(spark):
    """32 training rounds complete with a bounded plan per round (the
    pre-fix persist form OOMed the driver's plan machinery past ~10): every
    round yields a rule, rounds are 1..32, and counts are positive and
    non-increasing is NOT required (greedy BPE counts may rise after a
    merge creates a new frequent symbol) — but the argmax property is
    checked on the first round against a direct pair count."""
    df = spark.createDataFrame(_corpus(), "text string")
    rules = bpe_merges(df, "text", rounds=32).collect()
    assert [r["rnd"] for r in rules] == list(range(1, 33))
    assert all(r["pair_count"] > 0 for r in rules)
    assert len({(r["lft"], r["rgt"]) for r in rules}) == 32  # no duplicate rule


def test_bpe_encode_tokens_concatenate_to_words(spark):
    """Encoding invariant: per word, tokens in pos order concatenate back
    to the word (merges re-segment, never alter, the character stream)."""
    df = spark.createDataFrame(_corpus(), "text string")
    rules = bpe_merges(df, "text", rounds=12)
    enc = bpe_encode(df, "text", rules)
    bad = (
        enc.groupBy("w_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                    lambda s: s["sym"],
                ),
            ).alias("rebuilt")
        )
        .where(F.col("rebuilt") != F.col("w_id"))
        .count()
    )
    assert bad == 0


def test_bpe_encode_applies_rules_in_order(spark):
    """'aaaa' with rules [(a,a)] then [(aa,aa)] encodes to one 'aaaa' token;
    with only rule (a,a) it is [aa][aa] — order and greedy leftmost
    semantics must match the trainer's application exactly."""
    df = spark.createDataFrame([("aaaa",)], "text string")
    rules2 = bpe_merges(df, "text", rounds=2)  # (a,a) then (aa,aa)
    toks = {
        (r["pos"], r["sym"])
        for r in bpe_encode(df, "text", rules2).collect()
    }
    assert toks == {(1, "aaaa")}
    rules1 = bpe_merges(df, "text", rounds=1)
    toks1 = sorted(
        (r["pos"], r["sym"]) for r in bpe_encode(df, "text", rules1).collect()
    )
    assert toks1 == [(1, "aa"), (2, "aa")]
