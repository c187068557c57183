"""Value-check-by-proxy for the oracle-less xxhash64 LSH tier
(dd_minhash_lsh_fast — VERDICT r10 task #6).

The fast tier has no DuckDB twin (xxhash64 is not reproducible there),
so the driver records a rows-only check. This pins its VALUES to the
fully-oracle-checked portable (md5) tier on the gate corpus:

- on the pair-set intersection, verified Jaccard values must be EXACTLY
  equal (both tiers verify on full-width collision-free hash sets, so
  the value is the exact shingle Jaccard — hash-independent);
- any pair found by one tier and not the other must be a TRUE pair
  (exact Jaccard >= threshold via the ground-truth generator) — i.e.
  tier disagreement can only be banding RECALL, never a false positive
  in either direction;
- the disagreement is bounded (<= 2% of the union) — the tiers are the
  same algorithm modulo hash family, so their candidate sets nearly
  coincide (measured at sf0.01: 237 vs 238 pairs, one banding miss by
  the portable tier on a 0.875-Jaccard pair).

Together with dd_lsh_tier_audit (precision == 0 false positives, value
checked in-oracle), this makes the fast tier value-checked-by-proxy:
its values equal an oracle-checked query's values wherever they overlap,
and the non-overlap is proven-true and bounded.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
    jaccard_truth_pairs,
    minhash_lsh_pairs,
)
from data_wrangle_openstreetmaps_data_1_spark.plans.pipeline import _corpus

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tiers(spark):
    corpus = _corpus(spark, SF)
    portable = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4
        ).collect()
    }
    fast = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4, hash_tier="fast"
        ).collect()
    }
    return portable, fast


def test_values_equal_on_intersection(tiers):
    portable, fast = tiers
    shared = set(portable) & set(fast)
    assert len(shared) > 100  # the corpus has real near-dup structure
    unequal = [p for p in shared if portable[p] != fast[p]]
    assert unequal == [], f"verified Jaccard must be hash-independent: {unequal[:5]}"


def test_disagreement_is_true_pairs_only_and_bounded(spark, tiers):
    portable, fast = tiers
    sym = set(portable) ^ set(fast)
    union = set(portable) | set(fast)
    assert len(sym) <= max(1, len(union) // 50), (
        f"tiers diverged beyond banding noise: {len(sym)} of {len(union)}"
    )
    if sym:
        truth = {
            (r["doc_a"], r["doc_b"])
            for r in jaccard_truth_pairs(
                _corpus(spark, SF), "doc_id", "text", n=3, threshold=0.4
            ).collect()
        }
        outside = sym - truth
        assert outside == set(), (
            f"a tier emitted a non-true pair — verify step broken: {outside}"
        )
