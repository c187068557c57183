"""Query-dial composability matrix (COVERAGE.md, r15): every supported
cell composes value-exactly because each dial is a per-doc-independent
restriction around the same scoring model; unsupported pairs reject
loudly. One test per matrix cell the r14 verdict called untested:
filtered×msm, filtered×after, synonyms×allowed, synonyms×after,
synonyms×msm (and the 3-dial), diverse×boosts, plus the standing
mutual-exclusion rejections.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    _bm25_query_scored,
    bm25_query_page,
    bm25_query_topk,
    bm25_query_topk_diverse,
    bm25_query_topk_filtered,
    bm25_query_topk_synonyms,
    write_bm25_index,
    write_doc_facets,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NB = 16
QUERIES = ["spark hash", "window merge"]
SYNS = {"spark": ["stream"], "window": ["table"]}
BOOSTS = {"spark": 2000, "hash": 500}


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


@pytest.fixture(scope="module")
def index(spark, docs):
    path = tempfile.mkdtemp(prefix="dials_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
    write_doc_facets(spark, path, docs, ["lang", "source"])
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def eligible(spark, index):
    return (
        spark.read.parquet(f"{index}/facets")
        .where(F.col("lang").isin(["en", "zh"]))
        .select("doc_id")
        .cache()
    )


def rows_of(df):
    return sorted(map(tuple, df.collect()))


def test_topk_three_dials_boosts_msm_allowed(spark, index, eligible):
    """boosts × msm × allowed on the core probe == the same dials applied
    to the scored frame by hand."""
    got = bm25_query_topk(
        spark, index, QUERIES, k=5, boosts=BOOSTS, min_should_match=2,
        allowed=eligible,
    )
    ref = _bm25_query_scored(spark, index, QUERIES, False, BOOSTS, eligible, 2)
    w = Window.partitionBy("query").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    ref = (
        ref.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query", "doc_id", "n_terms", "score_fp", "rnk")
    )
    assert rows_of(got) == rows_of(ref)
    # and the filter really bit: some unfiltered hit is gone
    unfiltered = bm25_query_topk(
        spark, index, QUERIES, k=5, boosts=BOOSTS, min_should_match=2
    )
    assert rows_of(got) != rows_of(unfiltered)


def test_filtered_msm_pre_post_auto_equal_and_match_topk(spark, index, eligible):
    ref = rows_of(
        bm25_query_topk(
            spark, index, QUERIES, k=5, min_should_match=2, allowed=eligible
        )
    )
    for strat in ("pre", "post", "auto"):
        got = rows_of(
            bm25_query_topk_filtered(
                spark, index, QUERIES, "lang", ["en", "zh"], k=5,
                strategy=strat, min_should_match=2,
            )
        )
        assert got == ref, strat


def test_filtered_after_pages_never_skip_or_repeat(spark, index):
    """filtered × search_after: page1+page2 under the filter == the first
    2k of the filtered ranking, disjoint and in order — under BOTH
    strategies."""
    full = bm25_query_topk_filtered(
        spark, index, QUERIES, "lang", ["en", "zh"], k=6, strategy="pre"
    ).collect()
    by_q = {}
    for r in sorted(full, key=lambda r: (r["query"], r["rnk"])):
        by_q.setdefault(r["query"], []).append(r)
    cursors = {
        q: (int(rows[2]["score_fp"]), int(rows[2]["doc_id"]))
        for q, rows in by_q.items()
        if len(rows) >= 3
    }
    assert len(cursors) == len(QUERIES)  # fixture has enough eligible hits
    for strat in ("pre", "post"):
        page2 = bm25_query_topk_filtered(
            spark, index, QUERIES, "lang", ["en", "zh"], k=3,
            strategy=strat, after=cursors,
        ).collect()
        got = sorted(
            (r["query"], r["doc_id"], r["score_fp"], r["rnk"]) for r in page2
        )
        want = sorted(
            (q, rows[i]["doc_id"], rows[i]["score_fp"], i - 2)
            for q, rows in by_q.items()
            for i in range(3, min(6, len(rows)))
        )
        assert got == want, strat


def test_synonyms_allowed_composes(spark, index, eligible):
    """synonyms × allowed: every hit is eligible, and scores equal the
    unfiltered synonym scores for the surviving docs (pre-filter contract:
    the filter restricts candidates, not the scoring model)."""
    got = bm25_query_topk_synonyms(
        spark, index, QUERIES, SYNS, k=5, allowed=eligible
    )
    elig_ids = {r["doc_id"] for r in eligible.collect()}
    assert {r["doc_id"] for r in got.collect()} <= elig_ids
    unfiltered = bm25_query_topk_synonyms(spark, index, QUERIES, SYNS, k=1000)
    scores = {(r["query"], r["doc_id"]): r["score_fp"] for r in unfiltered.collect()}
    for r in got.collect():
        assert scores[(r["query"], r["doc_id"])] == r["score_fp"]


def test_synonyms_msm_allowed_after_three_dials(spark, index, eligible):
    """The tx_bm25_composed cell plus msm: page 2 == ranks p+1..2p of the
    large-k run with the same dials, re-ranked from 1."""
    p = 3
    big = bm25_query_topk_synonyms(
        spark, index, QUERIES, SYNS, k=3 * p, min_should_match=1,
        allowed=eligible,
    ).collect()
    by_q = {}
    for r in sorted(big, key=lambda r: (r["query"], r["rnk"])):
        by_q.setdefault(r["query"], []).append(r)
    cursors = {
        q: (int(rows[p - 1]["score_fp"]), int(rows[p - 1]["doc_id"]))
        for q, rows in by_q.items()
        if len(rows) >= p
    }
    assert len(cursors) == len(QUERIES)
    page2 = bm25_query_topk_synonyms(
        spark, index, QUERIES, SYNS, k=p, min_should_match=1,
        allowed=eligible, after=cursors,
    ).collect()
    got = sorted(
        (r["query"], r["doc_id"], r["n_groups"], r["score_fp"], r["rnk"])
        for r in page2
    )
    want = sorted(
        (q, rows[i]["doc_id"], rows[i]["n_groups"], rows[i]["score_fp"], i - p + 1)
        for q, rows in by_q.items()
        for i in range(p, min(2 * p, len(rows)))
    )
    assert got == want


def test_synonyms_after_rejects_unknown_cursor_key(spark, index):
    with pytest.raises(ValueError, match="unknown keys"):
        bm25_query_topk_synonyms(
            spark, index, QUERIES, SYNS, k=3, after={"nope": (1, 1)}
        )


def test_diverse_boosts_composes(spark, index):
    """diverse × boosts == the window-form reference over the boosted
    scored frame joined to the facet sidecar."""
    got = bm25_query_topk_diverse(
        spark, index, QUERIES, "lang", k=5, per_facet=2, boosts=BOOSTS
    )
    scored = _bm25_query_scored(spark, index, QUERIES, False, BOOSTS, None)
    meta = (
        spark.read.parquet(f"{index}/facets")
        .select("doc_id", F.col("lang").alias("facet"))
    )
    sf = scored.join(meta, "doc_id")
    w_f = Window.partitionBy("query", "facet").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    w_a = Window.partitionBy("query").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    ref = (
        sf.withColumn("facet_rnk", F.row_number().over(w_f))
        .where(F.col("facet_rnk") <= 2)
        .withColumn("rnk", F.row_number().over(w_a))
        .where(F.col("rnk") <= 5)
        .select(
            "query", "doc_id", "facet", "n_terms", "score_fp", "facet_rnk", "rnk"
        )
    )
    assert rows_of(got) == rows_of(ref)


def test_page_msm_boosts_composes(spark, index):
    """page × msm × boosts: page 2 == ranks k+1..2k of the dialed topk."""
    k = 3
    big = bm25_query_topk(
        spark, index, QUERIES, k=2 * k, boosts=BOOSTS, min_should_match=2
    ).collect()
    by_q = {}
    for r in sorted(big, key=lambda r: (r["query"], r["rnk"])):
        by_q.setdefault(r["query"], []).append(r)
    cursors = {
        q: (int(rows[k - 1]["score_fp"]), int(rows[k - 1]["doc_id"]))
        for q, rows in by_q.items()
        if len(rows) >= k
    }
    page2 = bm25_query_page(
        spark, index, QUERIES, k=k, after=cursors, boosts=BOOSTS,
        min_should_match=2,
    ).collect()
    got = sorted((r["query"], r["doc_id"], r["score_fp"], r["rnk"]) for r in page2)
    want = sorted(
        (q, rows[i]["doc_id"], rows[i]["score_fp"], i - k + 1)
        for q, rows in by_q.items()
        for i in range(k, min(2 * k, len(rows)))
    )
    assert got == want


def test_mutual_exclusions_reject_loudly(spark, index, eligible):
    with pytest.raises(ValueError, match="mutually exclusive"):
        bm25_query_topk(
            spark, index, QUERIES, k=5, require_all=True, min_should_match=1
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        bm25_query_topk_filtered(
            spark, index, QUERIES, "lang", ["en"], k=5,
            require_all=True, min_should_match=1,
        )
