"""Two-stage distributed top-k (operators/topk.py) — value-identity vs the
single-window form it replaced (round-14 verdict's one ``weak``: a high-df
query term funneled a corpus-sized candidate list through ONE reducer).

Every ranked probe family now routes through ``topk_per_key``; these tests
pin (a) the helper itself against the plain window form on adversarial
synthetic frames (ties, NULL salt values, k >= group size, shards=1), and
(b) the probe families end-to-end: each family's candidate frame ranked by
the helper must equal the window form, and the public probes must agree
with their pre-rewrite semantics (scores identical to bm25_query_topk for
the snippet probe; ordering contracts unchanged everywhere).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    _bm25_query_scored,
    bm25_probe,
    bm25_query_topk,
    bm25_snippet_probe,
    phrase_probe,
    proximity_probe,
    write_bm25_index,
    write_phrase_positions,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.topk import topk_per_key
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NB = 16


def window_topk(df, keys, order, k, rank_col="rnk"):
    """The retired single-window form — the reference the two-stage result
    must match exactly."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )


def assert_same(a, b):
    none_safe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    ra = sorted(map(tuple, a.collect()), key=none_safe)
    rb = sorted(map(tuple, b.collect()), key=none_safe)
    assert ra == rb
    assert a.columns == b.columns
    return ra


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


@pytest.fixture(scope="module")
def index(spark, docs):
    path = tempfile.mkdtemp(prefix="topk2_idx_")
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
    write_phrase_positions(spark, docs, path, "doc_id", "text")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _synth(spark):
    # 3 keys x 40 rows with heavy score ties (score = i % 4) so the
    # doc_id tie-break is doing real work, plus NULL salt values
    rows = [(f"q{g}", i, i % 4) for g in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "query string, doc_id long, score long")
    null_salt = spark.createDataFrame(
        [("q0", None, 99), ("q1", None, 0)], "query string, doc_id long, score long"
    )
    return df.unionByName(null_salt)


def test_helper_matches_window_form_with_ties_and_nulls(spark):
    df = _synth(spark)
    order = [F.desc("score"), F.asc_nulls_last("doc_id")]
    for k in (1, 5, 41, 100):  # 100 > any group size
        for shards in (1, 4, 32):
            got = topk_per_key(df, ["query"], order, k, "doc_id", shards=shards)
            assert_same(got, window_topk(df, ["query"], order, k))


def test_helper_rejects_bad_args(spark):
    df = _synth(spark)
    with pytest.raises(ValueError, match="k"):
        topk_per_key(df, ["query"], [F.asc("doc_id")], 0, "doc_id")
    with pytest.raises(ValueError, match="keys"):
        topk_per_key(df, [], [F.asc("doc_id")], 1, "doc_id")
    with pytest.raises(ValueError, match="shards"):
        topk_per_key(df, ["query"], [F.asc("doc_id")], 1, "doc_id", shards=0)


def test_helper_cost_fallback_matches_window_form(spark):
    """r16: approx_candidates_per_key below SINGLE_STAGE_MAX_CANDIDATES
    must produce the SINGLE-window plan (no salted exchange) and, at any
    bound, stay value-identical to the window form."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.topk import (
        SINGLE_STAGE_MAX_CANDIDATES,
    )

    df = _synth(spark)
    order = [F.desc("score"), F.asc_nulls_last("doc_id")]
    for bound in (0, 42, SINGLE_STAGE_MAX_CANDIDATES - 1):
        got = topk_per_key(
            df, ["query"], order, 5, "doc_id", approx_candidates_per_key=bound
        )
        assert_same(got, window_topk(df, ["query"], order, 5))
        # single-stage: no salted exchange anywhere in the plan
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" not in plan
    # above the threshold the salted stage comes back, sized to the bound
    big = topk_per_key(
        df,
        ["query"],
        order,
        5,
        "doc_id",
        approx_candidates_per_key=10 * SINGLE_STAGE_MAX_CANDIDATES,
    )
    assert_same(big, window_topk(df, ["query"], order, 5))
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan  # the salted stage is back
    with pytest.raises(ValueError, match="approx_candidates_per_key"):
        topk_per_key(
            df, ["query"], order, 5, "doc_id", approx_candidates_per_key=-1
        )


def test_helper_non_numeric_shuffle_partitions_degrades(spark, monkeypatch):
    """r15 ADVICE: a platform-managed non-numeric shuffle-partitions conf
    ('auto' under AQE-managed shuffle) must degrade to defaultParallelism,
    not crash every ranked probe. This runtime's conf.set validates the
    value (so the Databricks state can't be reproduced by set); intercept
    the read instead."""
    from pyspark.sql.conf import RuntimeConfig

    df = _synth(spark)
    order = [F.desc("score"), F.asc_nulls_last("doc_id")]
    real_get = RuntimeConfig.get

    def fake_get(self, key, *args, **kwargs):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(self, key, *args, **kwargs)

    monkeypatch.setattr(RuntimeConfig, "get", fake_get)
    got = topk_per_key(df, ["query"], order, 5, "doc_id")
    monkeypatch.undo()
    assert_same(got, window_topk(df, ["query"], order, 5))


def test_helper_stage2_input_is_k_bounded_per_shard(spark):
    """The scale contract: after stage 1, no (key, shard) carries more
    than k rows — the final window's input is <= shards * k per key no
    matter how many candidates a hot key has."""
    df = _synth(spark)
    shards, k = 4, 3
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(shards))
    w1 = Window.partitionBy("query", salt).orderBy(
        F.desc("score"), F.asc_nulls_last("doc_id")
    )
    survivors = (
        df.withColumn("r", F.row_number().over(w1)).where(F.col("r") <= k)
    )
    per_key = survivors.groupBy("query").count().collect()
    assert all(r["count"] <= shards * k for r in per_key)
    # and the true top-k is a subset of the survivors
    top = window_topk(
        df, ["query"], [F.desc("score"), F.asc_nulls_last("doc_id")], k
    ).select("query", "doc_id")
    missing = top.exceptAll(survivors.select("query", "doc_id"))
    assert missing.count() == 0


def test_table_row_bound_footer_count(spark, sf_small):
    """The 'free upper bound' feeding the cost fallback: pyarrow footer
    count == an actual Spark count, zero jobs; missing paths -> None."""
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import (
        table_row_bound,
    )

    n = table_row_bound(sf_small, "embeddings")
    assert n == load_table(spark, sf_small, "embeddings").count()
    assert table_row_bound("/nonexistent", "embeddings") is None


def test_bm25_query_topk_matches_window_form(spark, index):
    queries = ["spark hash", "window", "hash window spark"]
    per_doc = _bm25_query_scored(spark, index, queries, False, None, None)
    order = [F.desc("score_fp"), F.asc("doc_id")]
    ref = window_topk(per_doc, ["query"], order, 5).select(
        "query", "doc_id", "n_terms", "score_fp", "rnk"
    )
    got = bm25_query_topk(spark, index, queries, k=5)
    assert_same(got, ref)


def test_bm25_probe_matches_window_form(spark, index):
    got = bm25_probe(spark, index, ["spark", "hash"], k=7)
    # rank regenerated from the probe's own output must be self-consistent
    ref = window_topk(
        got.drop("rnk"),
        ["term"],
        [F.desc("score_fp"), F.asc("doc_id")],
        7,
    ).select(*got.columns)
    assert_same(got, ref)
    # exactly k rows per term on a corpus with more than k matches
    counts = {r["term"]: r["count"] for r in got.groupBy("term").count().collect()}
    assert set(counts.values()) == {7}


def test_phrase_and_proximity_probes_rank_consistently(spark, index):
    ph = phrase_probe(spark, index, ["spark hash"], k=5)
    ref = window_topk(
        ph.drop("rnk"), ["phrase"], [F.desc("phrase_tf"), F.asc("doc_id")], 5
    ).select(*ph.columns)
    assert_same(ph, ref)
    px = proximity_probe(spark, index, [("spark", "hash", 2)], k=5)
    refx = window_topk(
        px.drop("rnk"),
        ["w1", "w2", "slop"],
        [F.desc("prox_tf"), F.asc("doc_id")],
        5,
    ).select(*px.columns)
    assert_same(px, refx)


def test_snippet_probe_scores_equal_query_topk(spark, docs, index):
    """The single-scan rewrite (score sum + argmax term in ONE group-by)
    must keep the snippet probe's ranking identical to bm25_query_topk."""
    queries = ["spark hash", "window"]
    snip = bm25_snippet_probe(spark, index, docs, queries, k=5)
    topk = bm25_query_topk(spark, index, queries, k=5)
    a = sorted(
        (r["query"], r["doc_id"], r["score_fp"], r["rnk"]) for r in snip.collect()
    )
    b = sorted(
        (r["query"], r["doc_id"], r["score_fp"], r["rnk"]) for r in topk.collect()
    )
    assert a == b
    # best_term really is the argmax per-term contribution: recompute from
    # the per-(term, doc) scores and compare
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        _bm25_term_scores,
        read_index_meta,
    )

    nb = read_index_meta(spark, index)["n_buckets"]
    terms = sorted({w for q in queries for w in q.split()})
    ts = _bm25_term_scores(spark, index, terms, nb).collect()
    per_doc_best: dict[int, dict[str, int]] = {}
    for r in ts:
        per_doc_best.setdefault(r["doc_id"], {})[r["term"]] = r["score_fp"]
    for r in snip.collect():
        qterms = set(r["query"].split())
        scores = {
            t: s
            for t, s in per_doc_best.get(r["doc_id"], {}).items()
            if t in qterms
        }
        best = min(scores, key=lambda t: (-scores[t], t))
        assert r["best_term"] == best, (r["query"], r["doc_id"])


# ---------------------------------------------------------------------------
# property test: any bound, any shard count — identical to the window form
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # key
        st.integers(min_value=0, max_value=50),    # salt/id (ties allowed)
        st.integers(min_value=-5, max_value=5),    # score (heavy ties)
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=_rows,
    k=st.integers(min_value=1, max_value=7),
    bound=st.sampled_from([None, 0, 3, 1000, 10**7]),
    shards=st.sampled_from([None, 1, 2, 7]),
)
def test_topk_property_any_bound_matches_window(spark, rows, k, bound, shards):
    """The r16 cost fallback must be invisible: for random frames with
    heavy ties, ANY (approx_candidates_per_key, shards) combination gives
    exactly the single-window ranking. doc_id ties are broken by a unique
    rid so the order is total (the helper's documented precondition)."""
    df = spark.createDataFrame(
        [(key, doc, score, i) for i, (key, doc, score) in enumerate(rows)],
        "key long, doc_id long, score long, rid long",
    )
    order = [F.desc("score"), F.asc("doc_id"), F.asc("rid")]
    got = topk_per_key(
        df, ["key"], order, k, "rid",
        shards=shards, approx_candidates_per_key=bound,
    )
    assert_same(got, window_topk(df, ["key"], order, k))
