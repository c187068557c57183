"""Streaming BM25 index maintenance (streaming/index_maintenance.py).

The contract: the final index is a batching-independent function of the
corpus — however the landing-zone files split into micro-batches, the
streamed build+add chain lands bit-identical to a one-shot batch build.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    bm25_probe,
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
TERMS = ["spark", "hash", "window"]


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").select("doc_id", "text").cache()


def _stream_into(spark, docs, n_files: int) -> str:
    landing = tempfile.mkdtemp(prefix="idxstream_landing_")
    docs.repartition(n_files).write.mode("overwrite").parquet(landing)
    path = tempfile.mkdtemp(prefix="idxstream_idx_")
    shutil.rmtree(path, ignore_errors=True)
    stream = read_documents_stream(
        spark, landing, glob="*.parquet", max_files_per_trigger=1
    ).select("doc_id", "text")
    run_bm25_index_stream(stream, path, "doc_id", "text", n_buckets=NB)
    shutil.rmtree(landing, ignore_errors=True)
    return path


def test_batching_independence(spark, docs):
    """1-batch, 4-batch streamed builds and the one-shot batch build all
    land the same index content and the same probe answers."""
    oneshot = tempfile.mkdtemp(prefix="idxstream_ref_")
    try:
        write_bm25_index(spark, docs, oneshot, "doc_id", "text", n_buckets=NB)
        ref_probe = sorted(map(tuple, bm25_probe(spark, oneshot, TERMS, k=5).collect()))
        ref = {
            sub: sorted(
                tuple(r) for r in spark.read.parquet(f"{oneshot}/{sub}").collect()
            )
            for sub in ("postings", "terms", "stats")
        }
        for n_files in (1, 4):
            path = _stream_into(spark, docs, n_files)
            try:
                for sub in ("postings", "terms", "stats"):
                    got = sorted(
                        tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect()
                    )
                    assert got == ref[sub], f"{sub} diverged at n_files={n_files}"
                probe = sorted(map(tuple, bm25_probe(spark, path, TERMS, k=5).collect()))
                assert probe == ref_probe
            finally:
                shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(oneshot, ignore_errors=True)


def test_ivf_stream_batching_independence(spark, sf_small):
    """Vector twin: streamed build+adds (pre-trained meta) land the same
    codes table and probe answers as a one-shot write."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_probe,
        train_ivf_pq_meta,
        write_ivf_pq_index,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
        run_ivf_index_stream,
    )

    emb = (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=16, m=8, dsub=8, ksub=16, iters=1, round_to=6
    )
    qs = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < 3).orderBy("vec_id").collect()
    ]
    ref_path = tempfile.mkdtemp(prefix="ivfstream_ref_")
    stream_path = tempfile.mkdtemp(prefix="ivfstream_idx_")
    landing = tempfile.mkdtemp(prefix="ivfstream_landing_")
    try:
        write_ivf_pq_index(spark, emb, ref_path, meta, "vec_id", "v")
        emb.repartition(3).write.mode("overwrite").parquet(landing)
        shutil.rmtree(stream_path, ignore_errors=True)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        )
        run_ivf_index_stream(stream, stream_path, meta, "vec_id", "v")
        a = sorted(tuple(r) for r in spark.read.parquet(f"{stream_path}/codes").collect())
        b = sorted(tuple(r) for r in spark.read.parquet(f"{ref_path}/codes").collect())
        assert a == b
        pa = sorted(map(tuple, ivf_pq_probe(spark, stream_path, qs, k=5, nprobe=2).collect()))
        pb = sorted(map(tuple, ivf_pq_probe(spark, ref_path, qs, k=5, nprobe=2).collect()))
        assert pa == pb
    finally:
        for p in (ref_path, stream_path, landing):
            shutil.rmtree(p, ignore_errors=True)


def test_replayed_batch_fails_loudly(spark, docs):
    """Re-delivering already-indexed documents (the crash-replay case)
    must raise the duplicate guard, not double-count postings."""
    path = _stream_into(spark, docs, 2)
    try:
        landing = tempfile.mkdtemp(prefix="idxstream_replay_")
        docs.limit(5).write.mode("overwrite").parquet(landing)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text")
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as ei:
            run_bm25_index_stream(stream, path, "doc_id", "text", n_buckets=NB)
        assert "already indexed" in str(ei.value)
        shutil.rmtree(landing, ignore_errors=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_hybrid_stream_lockstep_and_modality_slices(spark, docs, sf_small):
    """run_hybrid_index_stream keeps both indexes in lockstep: after the
    drain, the lexical doc set and the vector id set each match exactly
    the ids that carried that modality through the landing zone — and a
    doc WITHOUT an embedding still reaches the lexical tier (the outer-
    union contract, the thing a naive inner join of the modalities would
    silently drop)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        train_ivf_pq_meta,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
        run_hybrid_index_stream,
    )

    emb = (
        load_table(spark, sf_small, "embeddings")
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        # drop some embeddings so text-only docs exist in the landing zone
        # (keep ids < 16: train_ivf_pq_meta's centroid seed contract)
        .where((F.col("doc_id") % 7 != 2) | (F.col("doc_id") < 16))
    )
    meta = train_ivf_pq_meta(
        emb, "doc_id", "v", ncent=16, m=8, dsub=8, ksub=16, iters=1, round_to=6
    )
    landing = tempfile.mkdtemp(prefix="hybst_landing_")
    joined = docs.join(emb, "doc_id", "full_outer")
    joined.repartition(3).write.mode("overwrite").parquet(landing)
    bm_path = tempfile.mkdtemp(prefix="hybst_bm_")
    ivf_path = tempfile.mkdtemp(prefix="hybst_ivf_")
    shutil.rmtree(bm_path, ignore_errors=True)
    shutil.rmtree(ivf_path, ignore_errors=True)
    try:
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text", "v")
        run_hybrid_index_stream(stream, bm_path, ivf_path, meta, n_buckets=NB)
        lex_ids = {
            r["doc_id"]
            for r in spark.read.parquet(f"{bm_path}/postings")
            .select("doc_id").distinct().collect()
        }
        vec_ids = {
            r["doc_id"]
            for r in spark.read.parquet(f"{ivf_path}/codes")
            .select("doc_id").distinct().collect()
        }
        doc_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
        emb_ids = {r["doc_id"] for r in emb.select("doc_id").collect()}
        assert lex_ids == doc_ids  # every doc searchable lexically...
        assert vec_ids == emb_ids  # ...every embedded doc searchable vectorially
        assert emb_ids < doc_ids  # and the fixture really had text-only docs
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(bm_path, ignore_errors=True)
        shutil.rmtree(ivf_path, ignore_errors=True)


def test_positions_stream_batching_independence(spark, docs):
    """with_positions=True maintains the positional sidecar in the same
    foreachBatch: however the corpus splits into micro-batches, positions/
    lands bit-identical to the one-shot build and the phrase probe answers
    the same (per-document state: adds append, zero existing bytes)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_probe,
        write_phrase_positions,
    )

    phrases = ["table hash", "merge group", "slow hash batch"]
    oneshot = tempfile.mkdtemp(prefix="idxstream_posref_")
    try:
        write_bm25_index(spark, docs, oneshot, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, oneshot, "doc_id", "text")
        ref_pos = sorted(
            tuple(r) for r in spark.read.parquet(f"{oneshot}/positions").collect()
        )
        ref_probe = sorted(
            map(tuple, phrase_probe(spark, oneshot, phrases, k=5).collect())
        )
        for n_files in (1, 3):
            landing = tempfile.mkdtemp(prefix="idxstream_poslanding_")
            docs.repartition(n_files).write.mode("overwrite").parquet(landing)
            path = tempfile.mkdtemp(prefix="idxstream_posidx_")
            shutil.rmtree(path, ignore_errors=True)
            try:
                stream = read_documents_stream(
                    spark, landing, glob="*.parquet", max_files_per_trigger=1
                ).select("doc_id", "text")
                run_bm25_index_stream(
                    stream, path, "doc_id", "text", n_buckets=NB, with_positions=True
                )
                got = sorted(
                    tuple(r) for r in spark.read.parquet(f"{path}/positions").collect()
                )
                assert got == ref_pos, f"positions diverged at n_files={n_files}"
                probe = sorted(
                    map(tuple, phrase_probe(spark, path, phrases, k=5).collect())
                )
                assert probe == ref_probe
            finally:
                shutil.rmtree(landing, ignore_errors=True)
                shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(oneshot, ignore_errors=True)
