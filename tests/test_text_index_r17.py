"""r17 (VERDICT r16 task 4): blockmax lifecycle-COVERAGE walk.

tests/test_text_index_r16.py pins each lifecycle op's blockmax behavior in
isolation (build writes it, add appends exact batch maxima, compact
re-canonicalizes, merge is all-or-none). What nothing asserted is the
SEGMENT-SIDECAR INVARIANT itself — the Lucene property the index mimics
(every live segment artifact set is complete: a segment that serves
postings also serves its per-block impact bounds) — walked through EVERY
entry point that can produce or grow an index:

    write_bm25_index -> bm25_index_add -> bm25_index_delete ->
    maintain_bm25_segment (compaction trigger) -> maintain_bm25 (tiered
    merge cycle) -> bm25_index_merge of MERGED outputs ->
    run_bm25_index_stream (fresh index born inside foreachBatch).

Coverage after each op means, against the postings actually on disk:

  1. meta carries block_docs (readers must prune with the sidecar's size);
  2. the sidecar's bucket partition layout equals postings/ exactly (the
     compaction dirty-bucket discipline routes by bucket dir — a bucket
     with postings but no bound rows would silently serve UNPRUNED after
     the dispatch chose the pruning path, or worse, prune on absent rows);
  3. every (term, doc-block) present in postings has a bound row, and the
     reader-view bound is CONSERVATIVE: agg max(bmax_tf) >= true block max
     tf and agg min(bmin_dl) <= true block min dl. Phantom extra rows and
     loose bounds are legal (pruning weakens); a missing key or an
     under-bound is the one wrong-answer state (a true top-k doc pruned).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.index_admin import (
    maintain_bm25,
    maintain_bm25_segment,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    _BLOCK_DOCS,
    bm25_index_add,
    bm25_index_delete,
    bm25_index_merge,
    bm25_query_topk,
    bm25_query_topk_maxscore,
    read_index_meta,
    write_bm25_index,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table
from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
    read_documents_stream,
)
from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
    run_bm25_index_stream,
)

NB = 16
QUERIES = ["spark hash", "hash window spark", "spark spark"]


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").select("doc_id", "text").cache()


def _bucket_dirs(path: str, sub: str) -> set[str]:
    return {d for d in os.listdir(f"{path}/{sub}") if d.startswith("bucket=")}


def assert_blockmax_coverage(spark, path: str, where: str) -> None:
    """The segment-sidecar invariant (module docstring) for one index."""
    assert os.path.isdir(f"{path}/blockmax"), f"{where}: no blockmax/ sidecar"
    meta = read_index_meta(spark, path)
    bs = meta.get("block_docs")
    assert bs, f"{where}: meta lacks block_docs ({meta})"
    assert _bucket_dirs(path, "blockmax") == _bucket_dirs(path, "postings"), (
        f"{where}: blockmax bucket layout diverged from postings "
        f"({sorted(_bucket_dirs(path, 'blockmax'))} vs "
        f"{sorted(_bucket_dirs(path, 'postings'))})"
    )
    true = (
        spark.read.parquet(f"{path}/postings")
        .withColumn("block", F.expr(f"doc_id div {int(bs)}"))
        .groupBy("term", "block")
        .agg(
            F.max("tf").cast("long").alias("tmax_tf"),
            F.min("dl").cast("long").alias("tmin_dl"),
        )
    )
    stored = (
        spark.read.parquet(f"{path}/blockmax")
        .groupBy("term", "block")
        .agg(
            F.max("bmax_tf").cast("long").alias("bmax_tf"),
            F.min("bmin_dl").cast("long").alias("bmin_dl"),
        )
    )
    bad = (
        true.join(stored, ["term", "block"], "left")
        .where(
            F.col("bmax_tf").isNull()
            | (F.col("bmax_tf") < F.col("tmax_tf"))
            | (F.col("bmin_dl") > F.col("tmin_dl"))
        )
        .limit(5)
        .collect()
    )
    assert bad == [], f"{where}: missing/under-bounded blocks {bad}"


def _probe_parity(spark, path: str, where: str) -> None:
    a = sorted(
        map(tuple, bm25_query_topk_maxscore(
            spark, path, QUERIES, k=5, min_docs_for_pruning=0
        ).collect())
    )
    b = sorted(map(tuple, bm25_query_topk(spark, path, QUERIES, k=5).collect()))
    assert a == b and len(a) > 0, f"{where}: pruned probe diverged from exact"


def test_lifecycle_walk_coverage_single_segment(spark, docs):
    """build -> add -> delete (tombstones pending) -> maintenance compact:
    coverage holds at every stop, and the pruned probe stays exact at the
    loosest state (pending tombstones) and the tightest (post-compact)."""
    path = tempfile.mkdtemp(prefix="bmcov_seg_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 3 != 0), path, "doc_id", "text",
            n_buckets=NB,
        )
        assert_blockmax_coverage(spark, path, "fresh build")
        bm25_index_add(spark, docs.where(F.col("doc_id") % 3 == 0), path, "doc_id", "text")
        assert_blockmax_coverage(spark, path, "after add")
        victims = [r["doc_id"] for r in docs.select("doc_id").limit(8).collect()]
        bm25_index_delete(spark, path, victims)
        assert_blockmax_coverage(spark, path, "tombstones pending")
        _probe_parity(spark, path, "tombstones pending")
        rep = maintain_bm25_segment(spark, path, force_compact=True)
        assert rep["compacted"]
        assert_blockmax_coverage(spark, path, "after maintenance compact")
        _probe_parity(spark, path, "after maintenance compact")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_maintain_cycle_outputs_carry_coverage(spark, docs):
    """maintain_bm25 (the one scheduled deployment entry): every segment in
    the post-cycle serving set — merge outputs included — satisfies the
    invariant."""
    base = tempfile.mkdtemp(prefix="bmcov_cycle_")
    try:
        segs = []
        for i in range(3):
            p = f"{base}/seg{i}"
            write_bm25_index(
                spark, docs.where(F.col("doc_id") % 3 == i), p, "doc_id", "text",
                n_buckets=NB,
            )
            segs.append(p)
        out = maintain_bm25(spark, segs, f"{base}/merged", target_segment_count=1)
        assert out["merged_out"], "tiered policy should have merged 3 tiny segments"
        for p in out["segments"]:
            assert_blockmax_coverage(spark, p, f"maintain_bm25 serving set ({p})")
        for p in out["merged_out"]:
            _probe_parity(spark, p, f"maintain_bm25 merge output ({p})")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_merge_of_merged_carries_coverage(spark, docs):
    """Second-generation merge (merged inputs that were themselves merge
    outputs): the sidecar must survive arbitrary merge depth, with
    block_docs agreement carried through meta at every generation."""
    base = tempfile.mkdtemp(prefix="bmcov_mm_")
    try:
        parts = []
        for i in range(4):
            p = f"{base}/g0_{i}"
            write_bm25_index(
                spark, docs.where(F.col("doc_id") % 4 == i), p, "doc_id", "text",
                n_buckets=NB,
            )
            parts.append(p)
        m1, m2, mm = f"{base}/m1", f"{base}/m2", f"{base}/mm"
        bm25_index_merge(spark, m1, parts[:2])
        bm25_index_merge(spark, m2, parts[2:])
        for p, w in ((m1, "gen-1 merge m1"), (m2, "gen-1 merge m2")):
            assert_blockmax_coverage(spark, p, w)
            assert read_index_meta(spark, p)["block_docs"] == _BLOCK_DOCS
        bm25_index_merge(spark, mm, [m1, m2])
        assert_blockmax_coverage(spark, mm, "merge-of-merged")
        assert read_index_meta(spark, mm)["block_docs"] == _BLOCK_DOCS
        _probe_parity(spark, mm, "merge-of-merged")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_maintainer_fresh_index_carries_coverage(spark, docs):
    """A fresh index born INSIDE run_bm25_index_stream's foreachBatch
    (first batch build + later batch adds) satisfies the invariant at
    drain — the 'streaming maintainer' entry point the r16 verdict named
    as never lifecycle-walked."""
    landing = tempfile.mkdtemp(prefix="bmcov_landing_")
    path = tempfile.mkdtemp(prefix="bmcov_stream_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        docs.repartition(3).write.mode("overwrite").parquet(landing)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text")
        run_bm25_index_stream(stream, path, "doc_id", "text", n_buckets=NB)
        assert_blockmax_coverage(spark, path, "streamed build+adds")
        _probe_parity(spark, path, "streamed build+adds")
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
