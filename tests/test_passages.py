"""Repeated-passage scrubbing (operators/passages.py).

Registry oracles value-check both modes against DuckDB at sf0.01; these
tests pin the hand-checkable semantics on a tiny corpus, including the
cases the oracle rows can't isolate: exact-dup pairs under both modes,
span merging across overlapping repeats, short-doc passthrough, and the
pipeline-form text output.
"""

import hashlib

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.passages import (
    repeated_passage_scrub,
    scrubbed_text,
)

DOCS = [
    (1, "a b c d e f g h"),          # exact dup of 5
    (2, "x y a b c d e z"),          # shares one 5-gram with 1/5
    (3, "p q r s t"),                # unique 5 tokens
    (4, "short one"),                # under k: no grams
    (5, "a b c d e f g h"),
]


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _run(spark, keep_first):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_hash"])
        for r in repeated_passage_scrub(
            df, "doc_id", "text", k=5, keep_first=keep_first
        ).collect()
    }


def test_scrub_all_removes_every_copy(spark):
    got = _run(spark, keep_first=False)
    assert got[1] == (8, 8, _md5(""))          # exact dup: fully scrubbed
    assert got[5] == (8, 8, _md5(""))
    assert got[2] == (8, 5, _md5("x y z"))     # shared 5-gram span cut
    assert got[3] == (5, 0, _md5("p q r s t"))
    assert got[4] == (2, 0, _md5("short one"))


def test_keep_first_preserves_one_copy(spark):
    got = _run(spark, keep_first=True)
    assert got[1] == (8, 0, _md5("a b c d e f g h"))  # first occurrence intact
    assert got[5] == (8, 8, _md5(""))                 # later exact dup scrubbed
    assert got[2] == (8, 5, _md5("x y z"))            # doc1's copy came first
    assert got[3][1] == 0 and got[4][1] == 0


def test_overlapping_repeats_merge_per_position(spark):
    """Two overlapping repeated 5-grams must cut the UNION of their spans,
    not double-count: '1..6' repeated gives grams at i=1 and i=2 covering
    positions 1-6 exactly once."""
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 tail1"), (2, "t1 t2 t3 t4 t5 t6 tail2")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_removed"], r["cleaned_hash"])
        for r in repeated_passage_scrub(df, "doc_id", "text", k=5).collect()
    }
    assert got[1] == (6, _md5("tail1"))
    assert got[2] == (6, _md5("tail2"))


def test_scrubbed_text_pipeline_form(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in scrubbed_text(df, "doc_id", "text", k=5).collect()
    }
    assert got[2] == "x y z" and got[1] == "" and got[4] == "short one"
    # hash form and text form agree
    hashes = {
        r["doc_id"]: r["cleaned_hash"]
        for r in repeated_passage_scrub(df, "doc_id", "text", k=5).collect()
    }
    assert all(_md5(got[d]) == hashes[d] for d in got)


def test_keep_first_self_overlapping_periodic(spark):
    """Pinned behavior (module doc): a self-overlapping periodic repeat
    keeps only the first occurrence's non-overlapped prefix — periodic
    spam collapses toward its period; aperiodic first occurrences are
    preserved byte-exact (the other keep_first tests)."""
    df = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "b c d e f g")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in repeated_passage_scrub(
            df, "doc_id", "text", k=5, keep_first=True
        ).collect()
    }
    # doc 1: gram 'a a a a a' occurs at i=1 (first, exempt) and i=2
    # (flagged, covers positions 2-6) -> only position 1 survives
    assert got[1] == (6, 5)
    assert got[2] == (6, 0)  # unique text untouched
