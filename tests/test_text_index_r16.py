"""Round-16 serving upgrades: BLOCK-MAX WAND (the ``blockmax/`` sidecar +
block-granular candidate pruning in bm25_query_topk_maxscore) and the
single-round-trip probe (theta + the essential split computed in-plan).

Binding contracts:

- block pruning must NEVER change answers: the probe is value-identical
  with the sidecar, without it (unpruned fallback), and through the full
  add/delete/compact/merge lifecycle (r15's equality tests already rerun
  against the rewritten probe; the lifecycle indexes they build now carry
  blockmax/ automatically);
- the in-plan essential split must equal maxscore_plan's driver-side
  split exactly (the audit-twin contract);
- blockmax rows are pure postings facts: build == direct recompute, adds
  append batch maxima that aggregate to the recompute, compact
  re-canonicalizes, merge is all-or-none with agreeing block_docs.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    _BLOCK_DOCS,
    _maxscore_ess,
    _write_index_meta,
    bm25_index_add,
    bm25_index_compact,
    bm25_index_delete,
    bm25_index_merge,
    bm25_query_topk,
    bm25_query_topk_maxscore,
    maxscore_plan,
    read_index_meta,
    write_block_max,
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
    path = tempfile.mkdtemp(prefix="bmw_idx_")
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def rows_of(df):
    return sorted(map(tuple, df.collect()))


def _blockmax_recompute(spark, path):
    bs = read_index_meta(spark, path).get("block_docs", _BLOCK_DOCS)
    return (
        spark.read.parquet(f"{path}/postings")
        .withColumn("block", F.expr(f"doc_id div {bs}"))
        .groupBy("term", "block")
        .agg(
            F.max("tf").cast("long").alias("bmax_tf"),
            F.min("dl").cast("long").alias("bmin_dl"),
        )
    )


def _blockmax_canonical(spark, path):
    """Stored sidecar aggregated to one row per (term, block) — what every
    reader sees whatever mix of build/add rows is on disk."""
    return (
        spark.read.parquet(f"{path}/blockmax")
        .groupBy("term", "block")
        .agg(
            F.max("bmax_tf").cast("long").alias("bmax_tf"),
            F.min("bmin_dl").cast("long").alias("bmin_dl"),
        )
    )


def test_build_writes_blockmax_and_meta(spark, index):
    assert os.path.isdir(f"{index}/blockmax")
    meta = read_index_meta(spark, index)
    assert meta["block_docs"] == _BLOCK_DOCS
    a = rows_of(_blockmax_canonical(spark, index))
    b = rows_of(_blockmax_recompute(spark, index))
    assert a == b and len(a) > 0


def test_add_appends_batch_maxima_that_aggregate_exactly(spark, docs):
    path = tempfile.mkdtemp(prefix="bmw_add_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lo = docs.where(F.col("doc_id") % 3 != 0)
        hi = docs.where(F.col("doc_id") % 3 == 0)
        write_bm25_index(spark, lo, path, "doc_id", "text", n_buckets=NB)
        bm25_index_add(spark, hi, path, "doc_id", "text")
        # reader-view aggregation == recompute from the unioned postings
        assert rows_of(_blockmax_canonical(spark, path)) == rows_of(
            _blockmax_recompute(spark, path)
        )
        # and the probe agrees with the exact form on the grown index
        a = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compact_recanonicalizes_dirty_buckets(spark, docs):
    path = tempfile.mkdtemp(prefix="bmw_cmp_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        victims = [r["doc_id"] for r in docs.select("doc_id").limit(7).collect()]
        bm25_index_delete(spark, path, victims)
        bm25_index_compact(spark, path)
        assert rows_of(_blockmax_canonical(spark, path)) == rows_of(
            _blockmax_recompute(spark, path)
        )
        a = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_probe_exact_with_pending_tombstones(spark, docs):
    """Delete WITHOUT compact: blockmax keeps the victims' maxima (bounds
    go loose, never tight) and scoring anti-joins tombstones — the pruned
    probe must still equal the exact probe on the tombstoned index."""
    path = tempfile.mkdtemp(prefix="bmw_ts_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        victims = [r["doc_id"] for r in docs.select("doc_id").limit(9).collect()]
        bm25_index_delete(spark, path, victims)
        # no compact: tombstones pending, sidecar deliberately stale-loose
        a = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert a == b and len(a) > 0
        assert not {t[1] for t in a} & set(victims)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_merge_all_or_none_and_block_docs_agreement(spark, docs):
    base = tempfile.mkdtemp(prefix="bmw_mrg_")
    p1, p2, out = f"{base}/a", f"{base}/b", f"{base}/m"
    try:
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 2 == 0), p1, "doc_id", "text", n_buckets=NB
        )
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 2 == 1), p2, "doc_id", "text", n_buckets=NB
        )
        # all-or-none: strip one input's sidecar -> loud refusal
        shutil.rmtree(f"{p2}/blockmax")
        with pytest.raises(ValueError, match="blockmax"):
            bm25_index_merge(spark, out, [p1, p2])
        write_block_max(spark, p2)  # upgrade path restores it
        bm25_index_merge(spark, out, [p1, p2])
        assert read_index_meta(spark, out)["block_docs"] == _BLOCK_DOCS
        assert rows_of(_blockmax_canonical(spark, out)) == rows_of(
            _blockmax_recompute(spark, out)
        )
        a = rows_of(bm25_query_topk_maxscore(spark, out, QUERIES, k=5, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, out, QUERIES, k=5))
        assert a == b
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_probe_identical_without_sidecar_and_upgrade_path(spark, docs):
    """Pruned == unpruned == exact: remove blockmax/ (old-index shape,
    meta without block_docs) -> the probe serves unpruned; write_block_max
    upgrades in place -> pruned again; all three agree."""
    path = tempfile.mkdtemp(prefix="bmw_up_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        pruned = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        shutil.rmtree(f"{path}/blockmax")
        _write_index_meta(spark, path, NB, None)  # pre-r16 meta shape
        assert "block_docs" not in read_index_meta(spark, path)
        unpruned = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        write_block_max(spark, path)
        upgraded = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        exact = rows_of(bm25_query_topk(spark, path, QUERIES, k=5))
        assert pruned == unpruned == upgraded == exact
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_phantom_blockmax_rows_only_loosen(spark, docs):
    """The add path's partial-commit direction: blockmax lands BEFORE the
    postings append, so a crash in between leaves PHANTOM bound rows for
    docs that never arrived. Simulate that state and assert the probe's
    answers are untouched (phantom rows can only raise bounds)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        _block_max_rows,
        _postings_with_dl,
    )

    path = tempfile.mkdtemp(prefix="bmw_ph_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        before = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        # phantom batch: blockmax rows appended, postings never landed
        phantom = spark.createDataFrame(
            [(10_000_000, "spark hash window phantom")], "doc_id long, text string"
        )
        _block_max_rows(
            _postings_with_dl(phantom, "doc_id", "text", NB), NB, _BLOCK_DOCS
        ).repartition("bucket").write.partitionBy("bucket").mode("append").parquet(
            f"{path}/blockmax"
        )
        after = rows_of(bm25_query_topk_maxscore(spark, path, QUERIES, k=5, min_docs_for_pruning=0))
        assert after == before
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_inplan_split_equals_maxscore_plan(spark, index):
    """The audit-twin contract: _maxscore_ess (the probe's in-plan split)
    computes exactly maxscore_plan's ess_pairs when fed the plan's own
    ub/theta quantities."""
    for qs in ([QUERIES[0]], QUERIES, ["nosuchword zzz", QUERIES[1]]):
        plan = maxscore_plan(spark, index, qs, 5)
        ub_rows = [
            (q, t, int(plan["ub"][t]))
            for q, ts in zip(plan["queries"], plan["present"])
            for t in ts
        ]
        if not ub_rows:
            assert plan["ess_pairs"] == []
            continue
        ub_df = spark.createDataFrame(ub_rows, "query string, term string, ub long")
        theta_q = spark.createDataFrame(
            [(q, int(th)) for q, th in sorted(plan["theta"].items())] or [("", 0)],
            "query string, theta long",
        ).where(F.col("query") != "")
        got = sorted(map(tuple, _maxscore_ess(ub_df, theta_q).collect()))
        assert got == sorted(plan["ess_pairs"])


def test_block_pruning_is_value_invisible_on_a_skewed_corpus(spark):
    """A corpus built so one block holds the only high-impact postings of
    a common term: block pruning must fire (dead cells exist) yet the
    answers stay identical to the exact probe."""
    rows = []
    # 600 docs: 'filler' everywhere (common, low impact); 'gold' rare;
    # docs 0..9 (block 0 at 128-doc blocks) carry 'boost boost boost'
    for i in range(600):
        text = "filler alpha beta"
        if i < 10:
            text += " boost boost boost"
        if i % 97 == 0:
            text += " gold"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="bmw_skew_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        qs = ["gold filler", "boost filler", "filler"]
        a = rows_of(bm25_query_topk_maxscore(spark, path, qs, k=3, min_docs_for_pruning=0))
        b = rows_of(bm25_query_topk(spark, path, qs, k=3))
        assert a == b and len(a) > 0
    finally:
        shutil.rmtree(path, ignore_errors=True)
