"""Property-based equivalence tests for the round-10 operators: each
Spark operator replays against an independent pure-Python reference over
hypothesis-generated inputs. The references share NO code with the
operators (separate comparison logic, separate arithmetic paths), so
agreement pins semantics, not implementation.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.heavy import heavy_hitters
from data_wrangle_openstreetmaps_data_1_spark.operators.range_join import (
    interval_overlap_join,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.scd import scd2_apply
from data_wrangle_openstreetmaps_data_1_spark.operators.unigram import (
    match_len_sql,
    segment_words,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ---------------------------------------------------------------------------
# interval overlap: Spark bin join == pure-Python O(n^2) sweep
# ---------------------------------------------------------------------------

_iv = st.tuples(
    st.integers(0, 3),  # entity
    st.integers(-20, 120),  # start
    st.integers(-5, 40),  # length (negative -> inverted, must be dropped)
)
_ivs = st.lists(_iv, min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(a_rows=_ivs, b_rows=_ivs, bin_width=st.sampled_from([1, 7, 14, 50]))
def test_interval_overlap_matches_python_sweep(spark, a_rows, b_rows, bin_width):
    a = spark.createDataFrame(
        [(i, e, s, s + ln) for i, (e, s, ln) in enumerate(a_rows)],
        "k long, ent long, s long, e long",
    )
    b = spark.createDataFrame(
        [(i, e, s, s + ln) for i, (e, s, ln) in enumerate(b_rows)],
        "k long, ent long, s long, e long",
    )
    got = Counter(
        (r["a_k"], r["b_k"])
        for r in interval_overlap_join(a, b, on="ent", bin_width=bin_width).collect()
    )
    want = Counter()
    for i, (ea, sa, la) in enumerate(a_rows):
        if la < 0:
            continue
        for j, (eb, sb, lb) in enumerate(b_rows):
            if lb < 0 or ea != eb:
                continue
            if sa <= sb + lb and sb <= sa + la:
                want[(i, j)] += 1
    assert got == want  # every true pair exactly once, nothing else


# ---------------------------------------------------------------------------
# SCD2: one applied batch == pure-Python row rules
# ---------------------------------------------------------------------------

_vals = st.one_of(st.none(), st.integers(0, 3))
_dim_row = st.tuples(st.integers(0, 5), _vals)  # (key, bal)
_change_row = st.tuples(st.integers(0, 7), _vals)  # may reference unknown keys


@settings(**_SETTINGS)
@given(
    dim_rows=st.lists(_dim_row, min_size=0, max_size=6, unique_by=lambda r: r[0]),
    ch_rows=st.lists(_change_row, min_size=0, max_size=6, unique_by=lambda r: r[0]),
)
def test_scd2_matches_python_rules(spark, dim_rows, ch_rows):
    dim = spark.createDataFrame(
        [(k, v, 0, None, True) for k, v in dim_rows],
        "key long, bal long, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame(ch_rows, "key long, bal long")
    def _key(t):
        return tuple((x is None, x) for x in t)

    got = sorted(
        (
            (r["key"], r["bal"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_apply(dim, ch, "key", ["bal"], batch_id=1).collect()
        ),
        key=_key,
    )
    ch_map = dict(ch_rows)
    want = []
    for k, v in dim_rows:
        if k in ch_map and ch_map[k] != v:  # material (None != x covers NULLs)
            want.append((k, v, 0, 1, False))
            want.append((k, ch_map[k], 1, None, True))
        else:
            want.append((k, v, 0, None, True))
    assert got == sorted(want, key=_key)


# ---------------------------------------------------------------------------
# unigram segmentation: fold == pure-Python greedy walker
# ---------------------------------------------------------------------------

_word = st.text(alphabet="abc", min_size=1, max_size=12)
_piece = st.text(alphabet="abc", min_size=2, max_size=4)


@settings(**_SETTINGS)
@given(
    word_list=st.lists(_word, min_size=1, max_size=6, unique=True),
    vocab=st.lists(_piece, min_size=0, max_size=10, unique=True),
)
def test_unigram_segment_matches_python_greedy(spark, word_list, vocab):
    words = spark.createDataFrame([(w, 1) for w in word_list], "word string, wc long")
    max_len = max(len(w) for w in word_list)
    got = {r["word"]: r["seg"][1:].split("|") for r in segment_words(words, vocab, max_len).collect()}
    vset = set(vocab)
    for w in word_list:
        pieces, p = [], 0
        while p < len(w):
            for plen in (4, 3, 2):
                if w[p : p + plen] in vset and p + plen <= len(w):
                    pieces.append(w[p : p + plen])
                    p += plen
                    break
            else:
                pieces.append(w[p])
                p += 1
        assert got[w] == pieces, (w, got[w], pieces)


def test_match_len_sql_quotes_pieces():
    # a piece containing a quote must not break the IN-list SQL
    sql = match_len_sql("w", "p", ["a'b"])
    assert "a''b" in sql


# ---------------------------------------------------------------------------
# heavy hitters: exactness under arbitrary corpora and thresholds
# ---------------------------------------------------------------------------

_doc = st.lists(st.sampled_from(["x", "y", "z", "q"]), min_size=0, max_size=20).map(
    " ".join
)


@settings(**_SETTINGS)
@given(texts=st.lists(_doc, min_size=1, max_size=10), k=st.sampled_from([2, 5, 30]))
def test_heavy_hitters_exact_on_random_corpora(spark, texts, k):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(df, "text", k).collect()}
    census = Counter()
    for t in texts:
        for tok in re.split(r"\s+", t.strip().lower()):
            if tok:
                census[tok] += 1
    n = sum(census.values())
    want = {(t, c) for t, c in census.items() if c * k > n}
    assert got == want
