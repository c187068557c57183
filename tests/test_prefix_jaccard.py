"""Prefix-filtered Jaccard join (operators/dedup.py:jaccard_prefix_pairs).

The registry oracle proves losslessness on the shared corpus; these tests
pin (1) losslessness on a hand-built corner corpus where the prefix math
is exercised at tiny set sizes, and (2) the reason the operator exists:
the prefix candidate set is strictly smaller than the all-shared-shingle
candidate set when hot shingles are present.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
    prefix_candidates,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_lossless_vs_brute_on_documents(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(300)
    pref = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_pairs(docs, "doc_id", "text", n=3, t_num=3, t_den=5).collect()
    }
    # brute force: every pair sharing a shingle, exact integer threshold
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6).collect()
        # threshold=0.6 filters on round(j,6) >= 0.6 which equals the
        # integer test except within 5e-7 of the boundary; the corner is
        # covered by the tiny corpus below
    }
    assert pref == brute


def test_lossless_on_corner_corpus(spark):
    """Small sets where ceil(t*n) float fuzz would bite: n_sh = 5 with
    t = 3/5 must keep a prefix of 3, and a planted J = 0.6-exact pair must
    survive."""
    rows = [
        (1, "a b c d e f g"),       # 5 shingles
        (2, "a b c d e f h"),       # shares 4 of 5 -> J = 4/6 >= 3/5
        (3, "z y x w v u t"),       # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs, "doc_id", "text", n=3, t_num=3, t_den=5).collect()
    }
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)] - round(4 / 6, 6)) < 1e-9


def test_prefix_candidates_fewer_than_all_shingle_candidates(spark):
    """The operator's reason to exist: with hot shingles in the corpus the
    prefix candidate set must be strictly smaller than the set of pairs
    sharing ANY shingle."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(300)
    from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import _shingle_sets
    from data_wrangle_openstreetmaps_data_1_spark.partitioning import explode_nonempty

    sh = _shingle_sets(docs, "doc_id", "text", 3)
    ex = explode_nonempty(sh, ["doc_id"], "shingles", "shingle").select(
        "doc_id", F.xxhash64("shingle").alias("sh_h")
    )
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    n_pref = prefix_candidates(ex, sizes, 3, 5).count()
    a = ex.select(F.col("doc_id").alias("doc_a"), "sh_h")
    b = ex.select(F.col("doc_id").alias("doc_b"), "sh_h")
    n_all = (
        a.join(b, "sh_h").where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").distinct().count()
    )
    assert n_pref < n_all, (n_pref, n_all)


# ---- property-based losslessness vs a pure-Python reference ----------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# tiny vocab forces hot shingles (the case the prefix filter optimizes) and
# frequent near-dups (the case it must not lose)
_words = st.sampled_from([f"w{i}" for i in range(5)])
_doc = st.lists(_words, min_size=0, max_size=15).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)


def _py_shingles(text: str, n: int = 3) -> set:
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=_corpus)
def test_prefix_join_lossless_vs_python_reference(spark, corpus):
    """For every generated corpus the prefix-filtered join must emit
    EXACTLY the pairs with Jaccard >= 3/5 — computed here by brute-force
    set arithmetic sharing no code with the operator."""
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(df, "doc_id", "text", n=3, t_num=3, t_den=5).collect()
    }
    want = {}
    for i, ta in corpus:
        sa = _py_shingles(ta)
        for j, tb in corpus:
            if j <= i:
                continue
            sb = _py_shingles(tb)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and 5 * inter >= 3 * union:
                want[(i, j)] = round(inter / union, 6)
    assert got == want
