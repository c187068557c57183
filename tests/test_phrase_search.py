"""phrase_topk unit semantics on constructed docs: exact adjacency (not
bag-of-words co-occurrence), overlapping-run counting, n-ary phrases,
and the input guards. The sf0.01 values are pinned by the DuckDB oracle
(tx_phrase_search); these pin the CONTRACT."""

import pytest

from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import phrase_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_adjacency_not_cooccurrence(spark):
    docs = _docs(
        spark,
        [
            (1, "table hash join"),          # phrase present
            (2, "hash table join"),          # both words, wrong order
            (3, "table join hash"),          # both words, not adjacent
            (4, "table hash table hash"),    # two occurrences
        ],
    )
    rows = phrase_topk(docs, "doc_id", "text", ["table hash"], k=5).collect()
    by_doc = {r["doc_id"]: (r["phrase_tf"], r["rnk"]) for r in rows}
    assert set(by_doc) == {1, 4}              # docs 2 and 3 must NOT match
    assert by_doc[4] == (2, 1)                # two runs, ranked first
    assert by_doc[1] == (1, 2)


def test_overlapping_runs_count_each_start(spark):
    # "a a a" contains the bigram "a a" at starts 1 and 2
    docs = _docs(spark, [(1, "a a a")])
    [r] = phrase_topk(docs, "doc_id", "text", ["a a"], k=5).collect()
    assert r["phrase_tf"] == 2


def test_trigram_and_short_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "slow hash batch agg"),  # trigram present
            (2, "slow hash"),            # shorter than the phrase
        ],
    )
    rows = phrase_topk(docs, "doc_id", "text", ["slow hash batch"], k=5).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in rows] == [(1, 1)]


def test_guards(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="non-empty"):
        phrase_topk(docs, "doc_id", "text", [], k=5)
    with pytest.raises(ValueError, match=">= 2 words"):
        phrase_topk(docs, "doc_id", "text", ["solo"], k=5)
