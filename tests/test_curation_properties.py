"""Property-based equivalence tests for the round-6 curation operators:
each Spark operator is replayed against an independent pure-Python
reference over hypothesis-generated corpora. The references share NO code
with the operators (separate tokenization, separate arithmetic paths), so
agreement pins semantics, not implementation."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangle_openstreetmaps_data_1_spark.operators.linedup import line_dedup
from data_wrangle_openstreetmaps_data_1_spark.operators.lmscore import lm_score
from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import bm25_topk

# small vocab makes collisions (shared lines, shared bigrams) likely
words = st.sampled_from([f"w{i}" for i in range(8)])
doc_strategy = st.lists(words, min_size=0, max_size=40).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)

_SPLIT = re.compile(r"\s+")


def _toks(text: str) -> list[str]:
    t = text.strip().lower()
    return _SPLIT.split(t) if t else [""]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=corpus_strategy)
def test_lm_score_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.lm_score_fp) for r in lm_score(df, "doc_id", "text").collect()}

    bg = Counter()
    un = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in corpus:
        toks = _toks(text)
        pairs = list(zip(toks, toks[1:]))
        per_doc[doc_id] = pairs
        for w1, w2 in pairs:
            bg[(w1, w2)] += 1
            un[w1] += 1
    want = {}
    for doc_id, pairs in per_doc.items():
        if not pairs:
            continue
        ps = [bg[p] * 1_000_000 // un[p[0]] for p in pairs]
        want[doc_id] = (len(ps), sum(ps) // len(ps))
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=corpus_strategy)
def test_line_dedup_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_lines, r.n_kept) for r in line_dedup(df, "doc_id", "text").collect()
    }

    lines_by_doc: dict[int, list[str]] = {}
    for doc_id, text in corpus:
        toks = _toks(text)
        lines_by_doc[doc_id] = [
            " ".join(toks[i : i + 10]) for i in range(0, len(toks), 10)
        ]
    line_docs: dict[str, set[int]] = {}
    for doc_id, lines in lines_by_doc.items():
        for ln in lines:
            line_docs.setdefault(ln, set()).add(doc_id)
    want = {
        doc_id: (
            len(lines),
            sum(1 for ln in lines if len(line_docs[ln]) < 2),
        )
        for doc_id, lines in lines_by_doc.items()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=corpus_strategy, term=words)
def test_bm25_matches_python_reference(spark, corpus, term):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r.doc_id: r.score_fp
        for r in bm25_topk(df, "doc_id", "text", [term], k=100).collect()
    }

    lens = {d: len(_toks(t)) for d, t in corpus}
    n_docs = len(lens)
    avgdl_fp = sum(lens.values()) * 1000 // n_docs
    tfs = {d: _toks(t).count(term) for d, t in corpus}
    dfreq = sum(1 for v in tfs.values() if v > 0)
    want = {}
    for d, tf in tfs.items():
        if tf == 0:
            continue
        idf_fp = (n_docs - dfreq) * 1000 // (dfreq + 1) + 1000
        norm_fp = 250 + (750 * lens[d] * 1000) // avgdl_fp
        want[d] = (tf * 2200 * idf_fp) // (tf * 1000 + (1200 * norm_fp) // 1000)
    assert got == want
