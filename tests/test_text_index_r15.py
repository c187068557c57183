"""Round-15 serving additions: MaxScore/WAND-lite candidate bounding
(operators/text_index.py:bm25_query_topk_maxscore) and the per-term impact
bounds (max_tf, min_dl) that ride the dictionary lifecycle.

The binding contract: the bound must NEVER change answers —
bm25_query_topk_maxscore is value-identical to bm25_query_topk on every
query shape (rare-only, common-only, mixed, sub-k corpora) and across the
add/delete/compact lifecycle (where the stored bounds go conservative, not
wrong). The existing add==one-shot-build dictionary equality test
(test_text_index.py::test_incremental_add_value_invisible) now covers the
impact columns for free because it compares every terms/ column.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    _bm25_term_scores,
    bm25_index_add,
    bm25_index_compact,
    bm25_index_delete,
    bm25_index_merge,
    bm25_query_topk,
    bm25_query_topk_maxscore,
    read_index_meta,
    rebuild_bm25_terms,
    write_bm25_index,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NB = 16
QUERIES = ["spark hash", "window", "hash window spark", "spark spark"]


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


@pytest.fixture(scope="module")
def index(spark, docs):
    path = tempfile.mkdtemp(prefix="wand_idx_")
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def rows_of(df):
    return sorted(map(tuple, df.collect()))


def test_impact_bounds_match_exact_recompute(spark, docs, index):
    """terms/ impact bounds == a direct postings aggregate (build path)."""
    terms = spark.read.parquet(f"{index}/terms")
    assert {"max_tf", "min_dl"} <= set(terms.columns)
    exact = (
        spark.read.parquet(f"{index}/postings")
        .groupBy("term")
        .agg(
            F.max("tf").cast("long").alias("max_tf"),
            F.min("dl").cast("long").alias("min_dl"),
        )
    )
    a = rows_of(terms.select("term", "max_tf", "min_dl"))
    b = rows_of(exact.select("term", "max_tf", "min_dl"))
    assert a == b


def test_ub_bounds_every_posting_score(spark, index):
    """The driver-side fixed-point upper bound really is an upper bound:
    for every scored posting of every fixture term, score_fp <= ub(term).
    (Floor-monotonicity argument, checked by brute force.)"""
    from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import B_FP, K1_FP

    nb = read_index_meta(spark, index)["n_buckets"]
    terms = [r["term"] for r in spark.read.parquet(f"{index}/terms").select("term").distinct().limit(50).collect()]
    st = spark.read.parquet(f"{index}/stats").head()
    n_docs, avgdl_fp = int(st["n_docs"]), int(st["avgdl_fp"])
    drows = {
        r["term"]: (int(r["df"]), int(r["max_tf"]), int(r["min_dl"]))
        for r in spark.read.parquet(f"{index}/terms")
        .where(F.col("term").isin(terms))
        .collect()
    }

    def ub(df_, max_tf, min_dl):
        idf_fp = (n_docs - df_) * 1000 // (df_ + 1) + 1000
        norm_fp = (1000 - B_FP) + (B_FP * min_dl * 1000) // avgdl_fp
        return (max_tf * (K1_FP + 1000) * idf_fp) // (
            max_tf * 1000 + (K1_FP * norm_fp) // 1000
        )

    scored = _bm25_term_scores(spark, index, sorted(terms), nb).collect()
    assert len(scored) > 100
    for r in scored:
        t = r["term"]
        assert r["score_fp"] <= ub(*drows[t]), (t, r["doc_id"])


def test_maxscore_value_identical_to_topk(spark, index):
    for k in (1, 5, 20):
        a = rows_of(bm25_query_topk_maxscore(spark, index, QUERIES, k=k, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, index, QUERIES, k=k))
        assert a == b, f"k={k}"


def test_maxscore_identical_after_delete_and_compact(spark, docs, index):
    """Tombstoned deletes leave the stored bounds conservative (loose,
    never tight) — answers must still match the exact path, before AND
    after compact folds the tombstones in."""
    path = tempfile.mkdtemp(prefix="wand_life_")
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        victims = [r["doc_id"] for r in bm25_query_topk(spark, path, ["spark"], k=3).collect()]
        bm25_index_delete(spark, path, victims)
        a = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a == b
        bm25_index_compact(spark, path)
        a2 = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b2 = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a2 == b2
        # compact recomputed the dirty buckets' bounds exactly
        exact = (
            spark.read.parquet(f"{path}/postings")
            .groupBy("term")
            .agg(
                F.max("tf").cast("long").alias("max_tf"),
                F.min("dl").cast("long").alias("min_dl"),
            )
        )
        assert rows_of(
            spark.read.parquet(f"{path}/terms").select("term", "max_tf", "min_dl")
        ) == rows_of(exact.select("term", "max_tf", "min_dl"))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_maxscore_identical_across_add_and_merge(spark, docs):
    path = tempfile.mkdtemp(prefix="wand_add_")
    seg_a = tempfile.mkdtemp(prefix="wand_seg_a_")
    seg_b = tempfile.mkdtemp(prefix="wand_seg_b_")
    merged = tempfile.mkdtemp(prefix="wand_merged_") + "/out"
    try:
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 3 != 0), path, "doc_id", "text", n_buckets=NB
        )
        bm25_index_add(spark, docs.where(F.col("doc_id") % 3 == 0), path, "doc_id", "text")
        a = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a == b
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 2 == 0), seg_a, "doc_id", "text", n_buckets=NB
        )
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 2 == 1), seg_b, "doc_id", "text", n_buckets=NB
        )
        bm25_index_merge(spark, merged, [seg_a, seg_b])
        am = rows_of(bm25_query_topk_maxscore(spark, merged, QUERIES, k=5, min_docs_for_pruning=0))
        bm = rows_of(bm25_query_topk(spark, merged, QUERIES, k=5))
        assert am == bm
        # merged bounds = max-of-max / min-of-min, i.e. the exact recompute
        exact = (
            spark.read.parquet(f"{merged}/postings")
            .groupBy("term")
            .agg(
                F.max("tf").cast("long").alias("max_tf"),
                F.min("dl").cast("long").alias("min_dl"),
            )
        )
        assert rows_of(
            spark.read.parquet(f"{merged}/terms").select("term", "max_tf", "min_dl")
        ) == rows_of(exact.select("term", "max_tf", "min_dl"))
    finally:
        for d in (path, seg_a, seg_b):
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(merged.rsplit("/", 1)[0], ignore_errors=True)


def test_maxscore_refuses_legacy_dictionary_and_rebuild_upgrades(spark, docs):
    path = tempfile.mkdtemp(prefix="wand_legacy_")
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        # simulate a pre-r15 dictionary: strip the impact columns
        legacy = spark.read.parquet(f"{path}/terms").select("term", "df", "bucket")
        staged = f"{path}/terms__legacy"
        legacy.repartition("bucket").write.partitionBy("bucket").parquet(staged)
        shutil.rmtree(f"{path}/terms")
        shutil.move(staged, f"{path}/terms")
        with pytest.raises(ValueError, match="rebuild_bm25_terms"):
            bm25_query_topk_maxscore(spark, path, ["spark"], k=5, min_docs_for_pruning=0)
        # legacy add keeps the legacy shape (no per-bucket schema skew)
        extra = spark.createDataFrame(
            [(10_000_000, "spark wand upgrade probe")], "doc_id long, text string"
        )
        bm25_index_add(spark, extra, path, "doc_id", "text")
        assert "max_tf" not in spark.read.parquet(f"{path}/terms").columns
        rebuild_bm25_terms(spark, path)
        a = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_maxscore_prunes_common_term_from_candidate_generation(spark):
    """On a corpus where one word is everywhere and one is rare, the
    common word must be non-essential: candidate generation reads only
    the rare term's postings. Verified structurally — the essential
    split is recomputed here with the probe's own arithmetic — and
    value-equality holds throughout."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import B_FP, K1_FP

    rows = [(i, "common " + ("rare " if i % 97 == 0 else "filler ") + f"w{i % 7}") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="wand_prune_")
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        q = ["rare common"]
        a = rows_of(bm25_query_topk_maxscore(spark, path, q, k=3, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, q, k=3))
        assert a == b and len(a) == 3
        st = spark.read.parquet(f"{path}/stats").head()
        n_docs, avgdl_fp = int(st["n_docs"]), int(st["avgdl_fp"])
        d = {
            r["term"]: (int(r["df"]), int(r["max_tf"]), int(r["min_dl"]))
            for r in spark.read.parquet(f"{path}/terms")
            .where(F.col("term").isin(["rare", "common"]))
            .collect()
        }

        def ub(df_, max_tf, min_dl):
            idf_fp = (n_docs - df_) * 1000 // (df_ + 1) + 1000
            norm_fp = (1000 - B_FP) + (B_FP * min_dl * 1000) // avgdl_fp
            return (max_tf * (K1_FP + 1000) * idf_fp) // (
                max_tf * 1000 + (K1_FP * norm_fp) // 1000
            )

        ub_rare, ub_common = ub(*d["rare"]), ub(*d["common"])
        assert ub_rare > ub_common  # rare term leads, so theta comes from it
        nb = read_index_meta(spark, path)["n_buckets"]
        kth = sorted(
            (
                r["score_fp"]
                for r in _bm25_term_scores(spark, path, ["rare"], nb).collect()
            ),
            reverse=True,
        )[2]
        # the probe's pruning condition: the common term's ub alone cannot
        # reach the rare term's kth score, so it is non-essential
        assert ub_common < kth
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stored_snippets_match_docstore_form(spark, docs):
    """The stored-fields sidecar (r15): bm25/phrase snippet probes served
    entirely from index artifacts are value-identical to the docs= forms,
    across the add/delete/compact lifecycle, and the staleness guard
    fires on a sidecar that missed an add."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_snippet_probe,
        bm25_snippet_probe_stored,
        phrase_snippet_probe,
        phrase_snippet_probe_stored,
        write_doc_store,
        write_phrase_positions,
    )

    path = tempfile.mkdtemp(prefix="docstore_idx_")
    shutil.rmtree(path, ignore_errors=True)
    base = docs.where(F.col("doc_id") % 5 != 3)
    delta = docs.where(F.col("doc_id") % 5 == 3)
    write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
    write_phrase_positions(spark, base, path, "doc_id", "text")
    write_doc_store(spark, path, base)
    queries = ["spark hash", "window"]
    a = sorted(map(tuple, bm25_snippet_probe(
        spark, path, base, queries, k=5
    ).collect()))
    b = sorted(map(tuple, bm25_snippet_probe_stored(
        spark, path, queries, k=5
    ).collect()))
    assert a == b and len(a) > 0
    # add rides the lifecycle: docstore stays fresh
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_add,
    )

    bm25_index_add(spark, delta, path, "doc_id", "text")
    a2 = sorted(map(tuple, bm25_snippet_probe(
        spark, path, docs, queries, k=5
    ).collect()))
    b2 = sorted(map(tuple, bm25_snippet_probe_stored(
        spark, path, queries, k=5
    ).collect()))
    assert a2 == b2
    # phrase twin (positions were built on base only — rebuild fresh)
    ph = sorted(map(tuple, phrase_snippet_probe(
        spark, path, base, ["spark hash"], k=5
    ).collect()))
    ps = sorted(map(tuple, phrase_snippet_probe_stored(
        spark, path, ["spark hash"], k=5
    ).collect()))
    # NOTE: positions cover base only while docstore covers base+delta —
    # both forms rank from the SAME positions sidecar, so they agree
    assert ph == ps
    # delete + compact: victims leave the docstore with the tombstones
    victims = [r["doc_id"] for r in bm25_query_topk(
        spark, path, ["spark"], k=2
    ).collect()]
    bm25_index_delete(spark, path, victims)
    bm25_index_compact(spark, path)
    live = docs.where(~F.col("doc_id").isin(victims))
    a3 = sorted(map(tuple, bm25_snippet_probe(
        spark, path, live, queries, k=5
    ).collect()))
    b3 = sorted(map(tuple, bm25_snippet_probe_stored(
        spark, path, queries, k=5
    ).collect()))
    assert a3 == b3
    stored_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{path}/docstore").select("doc_id").collect()
    }
    assert not (stored_ids & set(victims))
    # staleness guard: a sidecar that missed an add refuses loudly
    half = spark.read.parquet(f"{path}/docstore").limit(10)
    half.write.mode("overwrite").parquet(f"{path}/docstore__trunc")
    shutil.rmtree(f"{path}/docstore")
    shutil.move(f"{path}/docstore__trunc", f"{path}/docstore")
    with pytest.raises(ValueError, match="STALE"):
        bm25_snippet_probe_stored(spark, path, queries, k=5)
    shutil.rmtree(path, ignore_errors=True)


def test_docstore_merge_all_or_none(spark, docs):
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        write_doc_store,
    )

    seg_a = tempfile.mkdtemp(prefix="ds_seg_a_")
    seg_b = tempfile.mkdtemp(prefix="ds_seg_b_")
    out = tempfile.mkdtemp(prefix="ds_merged_") + "/out"
    try:
        shutil.rmtree(seg_a, ignore_errors=True)
        shutil.rmtree(seg_b, ignore_errors=True)
        da = docs.where(F.col("doc_id") % 2 == 0)
        db = docs.where(F.col("doc_id") % 2 == 1)
        write_bm25_index(spark, da, seg_a, "doc_id", "text", n_buckets=NB)
        write_bm25_index(spark, db, seg_b, "doc_id", "text", n_buckets=NB)
        write_doc_store(spark, seg_a, da)
        with pytest.raises(ValueError, match="docstore/ present on only some"):
            bm25_index_merge(spark, out, [seg_a, seg_b])
        write_doc_store(spark, seg_b, db)
        bm25_index_merge(spark, out, [seg_a, seg_b])
        from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
            bm25_snippet_probe_stored,
        )

        a = sorted(map(tuple, bm25_snippet_probe_stored(
            spark, out, ["spark hash"], k=5
        ).collect()))
        one = tempfile.mkdtemp(prefix="ds_oneshot_")
        shutil.rmtree(one, ignore_errors=True)
        write_bm25_index(spark, docs, one, "doc_id", "text", n_buckets=NB)
        write_doc_store(spark, one, docs)
        b = sorted(map(tuple, bm25_snippet_probe_stored(
            spark, one, ["spark hash"], k=5
        ).collect()))
        shutil.rmtree(one, ignore_errors=True)
        assert a == b
    finally:
        shutil.rmtree(seg_a, ignore_errors=True)
        shutil.rmtree(seg_b, ignore_errors=True)
        shutil.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)


def test_maxscore_filtered_value_identical(spark, docs, index):
    """maxscore x allowed (the filter-context WAND): identical to
    bm25_query_topk(allowed=...) on selective AND broad filters, and the
    theta that drives pruning comes from the FILTERED ranking."""
    for mod, rem in ((10, 0), (3, 1)):
        allowed = docs.where(F.col("doc_id") % mod == rem).select("doc_id")
        a = rows_of(
            bm25_query_topk_maxscore(spark, index, QUERIES, k=5, allowed=allowed, min_docs_for_pruning=0)
        )
        b = rows_of(
            bm25_query_topk(spark, index, QUERIES, k=5, allowed=allowed)
        )
        assert a == b, (mod, rem)
        # every hit eligible
        elig = {r["doc_id"] for r in allowed.collect()}
        assert {t[1] for t in a} <= elig
    # empty eligible set: both forms return nothing
    empty = docs.where(F.col("doc_id") < 0).select("doc_id")
    assert (
        bm25_query_topk_maxscore(spark, index, QUERIES, k=5, allowed=empty, min_docs_for_pruning=0).count()
        == 0
    )


def test_maxscore_filtered_theta_is_filtered(spark, docs, index):
    """The plan's theta under a filter must equal the kth FILTERED
    single-term score of the best-ub term — an unfiltered theta could
    over-bound and wrongly prune."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        maxscore_plan,
    )

    allowed = docs.where(F.col("doc_id") % 3 == 1).select("doc_id")
    k = 5
    plan_f = maxscore_plan(spark, index, ["spark hash"], k, allowed)
    plan_u = maxscore_plan(spark, index, ["spark hash"], k)
    q = "spark hash"
    # recompute the filtered kth score of the star term by brute force
    ub = plan_f["ub"]
    star = max(plan_f["present"][0], key=lambda t: (ub[t], t))
    nb = plan_f["n_buckets"]
    scores = sorted(
        (
            r["score_fp"]
            for r in _bm25_term_scores(spark, index, [star], nb, allowed).collect()
        ),
        reverse=True,
    )
    want = scores[k - 1] if len(scores) >= k else None
    assert plan_f["theta"].get(q) == want
    # and it differs from the unfiltered theta on this fixture (the
    # filter removed high scorers, so the filtered bound is lower)
    if plan_u["theta"].get(q) is not None and want is not None:
        assert want <= plan_u["theta"][q]
