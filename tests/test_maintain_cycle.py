"""The unified maintenance cycle (operators/index_admin.py:maintain_bm25 /
maintain_ivf, r15): ONE idempotent entry composing the tombstone-ratio
compaction trigger, the tiered merge policy, and the sidecar heals — plus
the streaming variant (run_bm25_index_stream(maintain=...)).

What a long add/delete lifecycle must keep bounded (the policy's whole
point): segment count converges to the target, segments at the size
ceiling are never rewritten again, and a cycle right after a cycle is a
no-op (idempotence). Value-invisibility throughout: the post-maintenance
serving set answers exactly like a one-shot index over the live corpus.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.index_admin import (
    bm25_index_describe,
    maintain_bm25,
    maintain_bm25_segment,
    maintain_ivf,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    bm25_index_delete,
    bm25_query_topk,
    write_bm25_index,
    write_doc_facets,
    write_facet_stats,
    write_reversed_terms,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NB = 16
QUERIES = ["spark hash", "window"]


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


def _segments(spark, docs, n, tmp_prefix):
    """n per-'day' segment builds over disjoint doc slices."""
    paths = []
    for i in range(n):
        p = tempfile.mkdtemp(prefix=f"{tmp_prefix}{i}_")
        shutil.rmtree(p, ignore_errors=True)
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % n == i), p, "doc_id", "text",
            n_buckets=NB,
        )
        paths.append(p)
    return paths


def _topk(spark, path, k=5):
    return sorted(map(tuple, bm25_query_topk(spark, path, QUERIES, k=k).collect()))


def test_maintain_bm25_full_cycle_bounded_and_value_invisible(spark, docs):
    segs = _segments(spark, docs, 5, "mt_seg")
    out_dir = tempfile.mkdtemp(prefix="mt_out_")
    ref = tempfile.mkdtemp(prefix="mt_ref_")
    try:
        # deletes: one segment crosses the 10% trigger, one stays under it
        seg0_ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{segs[0]}/postings")
            .select("doc_id").distinct().orderBy("doc_id").limit(30).collect()
        ]
        bm25_index_delete(spark, segs[0], seg0_ids)  # ~30/~100 docs: compacts
        seg1_id = [
            r["doc_id"]
            for r in spark.read.parquet(f"{segs[1]}/postings")
            .select("doc_id").distinct().orderBy("doc_id").limit(1).collect()
        ]
        bm25_index_delete(spark, segs[1], seg1_id)  # 1 doc: below trigger
        report = maintain_bm25(
            spark, segs, out_dir, tombstone_ratio=0.1,
            max_merge_at_once=3, target_segment_count=2,
        )
        # trigger fired exactly where it should
        assert report["per_segment"][segs[0]]["compacted"]
        # seg1 was under the trigger — compacted only iff a merge group
        # needed it (merge refuses pending tombstones)
        planned = {p for g in report["plan"] for p in g}
        if segs[1] in planned:
            assert report["per_segment"][segs[1]]["compacted"]
        # segment count converged per the policy
        assert len(report["segments"]) == 2
        assert all(os.path.isdir(p) for p in report["segments"])
        # no pending tombstones anywhere in the serving set
        for p in report["segments"]:
            d = bm25_index_describe(spark, p).collect()[0]
            assert d["n_tombstones"] == 0
        # idempotence at the reached target: a second cycle with the same
        # policy plans nothing and compacts nothing
        report2 = maintain_bm25(
            spark, report["segments"], tempfile.mkdtemp(prefix="mt_out2_"),
            tombstone_ratio=0.1, max_merge_at_once=3, target_segment_count=2,
        )
        assert report2["plan"] == []
        assert all(not r["compacted"] for r in report2["per_segment"].values())
        assert report2["segments"] == report["segments"]
        # multi-cycle convergence + value-invisibility: tightening the
        # target to 1 merges the survivors, and the single segment answers
        # EXACTLY like a one-shot index over the live corpus (global df/
        # avgdl — per-segment top-ks can't be compared this way, the
        # classic per-shard-IDF caveat; one segment can)
        report3 = maintain_bm25(
            spark, report["segments"], tempfile.mkdtemp(prefix="mt_out3_"),
            tombstone_ratio=0.1, max_merge_at_once=4, target_segment_count=1,
        )
        assert len(report3["segments"]) == 1
        dead = set(seg0_ids) | set(seg1_id)
        alive = docs.where(~F.col("doc_id").isin(list(dead)))
        write_bm25_index(spark, alive, ref, "doc_id", "text", n_buckets=NB)
        assert _topk(spark, report3["segments"][0], k=5) == _topk(spark, ref, k=5)
    finally:
        for p in segs + [out_dir, ref]:
            shutil.rmtree(p, ignore_errors=True)


def test_maintain_respects_size_ceiling(spark, docs):
    """A segment at max_merged_docs is never a merge input — the rewrite
    amplification bound (Lucene's tiered policy shape)."""
    segs = _segments(spark, docs, 4, "mt_ceil")
    out_dir = tempfile.mkdtemp(prefix="mt_ceil_out_")
    try:
        sizes = {
            p: int(spark.read.parquet(f"{p}/stats").collect()[0]["n_docs"])
            for p in segs
        }
        big = max(segs, key=lambda p: sizes[p])
        report = maintain_bm25(
            spark, segs, out_dir, max_merged_docs=sizes[big],
            max_merge_at_once=4, target_segment_count=1,
        )
        planned = {p for g in report["plan"] for p in g}
        assert big not in planned
        assert big in report["segments"]
    finally:
        for p in segs + [out_dir]:
            shutil.rmtree(p, ignore_errors=True)


def test_maintain_segment_heals_sidecars(spark, docs):
    path = tempfile.mkdtemp(prefix="mt_heal_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        write_doc_facets(spark, path, docs, ["lang"])
        write_facet_stats(spark, path)
        write_reversed_terms(spark, path)
        # fresh index: nothing to do
        r0 = maintain_bm25_segment(spark, path)
        assert not r0["compacted"] and r0["healed"] == []
        # simulate pre-lifecycle drift: stale rterms snapshot + lost stats
        shutil.rmtree(f"{path}/rterms__snapshot")
        shutil.rmtree(f"{path}/facet_stats")
        r1 = maintain_bm25_segment(spark, path)
        assert sorted(r1["healed"]) == ["facet_stats", "rterms"]
        # healed state is stable: next pass is a no-op again
        r2 = maintain_bm25_segment(spark, path)
        assert r2["healed"] == [] and not r2["compacted"]
        with pytest.raises(ValueError, match="tombstone_ratio"):
            maintain_bm25_segment(spark, path, tombstone_ratio=0.0)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_maintain_ivf_cycle(spark, sf_small):
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_delete,
        ivf_pq_probe_batched,
        train_ivf_pq_meta,
        write_ivf_pq_index,
    )

    emb = (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=16, m=8, dsub=8, ksub=16, iters=1, round_to=6
    )
    segs = []
    out_dir = tempfile.mkdtemp(prefix="mt_ivf_out_")
    ref = tempfile.mkdtemp(prefix="mt_ivf_ref_")
    try:
        for i in range(3):
            p = tempfile.mkdtemp(prefix=f"mt_ivf{i}_")
            shutil.rmtree(p, ignore_errors=True)
            write_ivf_pq_index(
                spark, emb.where(F.col("vec_id") % 3 == i), p, meta, "vec_id", "v"
            )
            segs.append(p)
        # delete ~half of EACH cluster (never a whole one: compact's
        # dynamic overwrite can't express an emptied partition and
        # refuses loudly — a documented limitation, not the test target)
        from pyspark.sql import Window

        w = Window.partitionBy("cluster").orderBy("vec_id")
        ranked = (
            spark.read.parquet(f"{segs[0]}/codes")
            .select("vec_id", "cluster")
            .withColumn("r", F.row_number().over(w))
        )
        victims = [
            int(r["vec_id"])
            for r in ranked.where((F.col("r") % 2 == 0)).collect()
        ]
        assert victims
        ivf_pq_index_delete(spark, segs[0], victims)
        report = maintain_ivf(
            spark, segs, out_dir, tombstone_ratio=0.1,
            max_merge_at_once=3, target_segment_count=1,
        )
        assert report["per_segment"][segs[0]]["compacted"]
        assert len(report["segments"]) == 1
        merged = report["segments"][0]
        # value-invisibility vs a one-shot index over the live vectors
        shutil.rmtree(ref, ignore_errors=True)
        write_ivf_pq_index(
            spark, emb.where(~F.col("vec_id").isin(victims)), ref, meta,
            "vec_id", "v",
        )
        qs = [
            (r["vec_id"], list(r["v"]))
            for r in emb.where(F.col("vec_id") < 3).orderBy("vec_id").collect()
        ]
        a = sorted(map(tuple, ivf_pq_probe_batched(
            spark, merged, qs, k=5, nprobe=2
        ).collect()))
        b = sorted(map(tuple, ivf_pq_probe_batched(
            spark, ref, qs, k=5, nprobe=2
        ).collect()))
        assert a == b
    finally:
        for p in segs + [out_dir, ref]:
            shutil.rmtree(p, ignore_errors=True)


def test_streaming_maintain_report(spark, docs):
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_probe,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
        read_documents_stream,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
        run_bm25_index_stream,
    )

    landing = tempfile.mkdtemp(prefix="mt_stream_landing_")
    path = tempfile.mkdtemp(prefix="mt_stream_idx_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        half_a = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        half_b = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
        half_a.repartition(2).write.mode("overwrite").parquet(landing)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text")
        rep = run_bm25_index_stream(stream, path, "doc_id", "text", n_buckets=NB,
                                    maintain={})
        assert rep is not None and not rep["compacted"]  # nothing to do yet
        # accumulate deletes past the trigger, then drain the second half
        # — the ratio is checked against the FULL post-drain corpus, so
        # size the batch at 12% of the whole docs table
        n_total = docs.count()
        victims = [
            r["doc_id"]
            for r in spark.read.parquet(f"{path}/postings")
            .select("doc_id").distinct().orderBy("doc_id")
            .limit(int(n_total * 0.12) + 1).collect()
        ]
        bm25_index_delete(spark, path, victims)
        landing2 = tempfile.mkdtemp(prefix="mt_stream_landing2_")
        half_b.repartition(2).write.mode("overwrite").parquet(landing2)
        stream2 = read_documents_stream(
            spark, landing2, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text")
        rep2 = run_bm25_index_stream(
            stream2, path, "doc_id", "text", n_buckets=NB,
            maintain={"tombstone_ratio": 0.1},
        )
        assert rep2["compacted"] and rep2["postings_rows_removed"] > 0
        assert not os.path.isdir(f"{path}/tombstones")
        # post-maintenance index answers like a one-shot over the live set
        ref = tempfile.mkdtemp(prefix="mt_stream_ref_")
        try:
            shutil.rmtree(ref, ignore_errors=True)
            write_bm25_index(
                spark,
                docs.where(~F.col("doc_id").isin(victims)).select("doc_id", "text"),
                ref, "doc_id", "text", n_buckets=NB,
            )
            a = sorted(map(tuple, bm25_probe(spark, path, ["spark"], k=5).collect()))
            b = sorted(map(tuple, bm25_probe(spark, ref, ["spark"], k=5).collect()))
            assert a == b
        finally:
            shutil.rmtree(ref, ignore_errors=True)
        shutil.rmtree(landing2, ignore_errors=True)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)


def test_streaming_ivf_maintain_report(spark, sf_small):
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_delete,
        train_ivf_pq_meta,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
        read_documents_stream,
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
    landing = tempfile.mkdtemp(prefix="mt_ivfstream_landing_")
    path = tempfile.mkdtemp(prefix="mt_ivfstream_idx_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        emb.write.mode("overwrite").parquet(landing)
        stream = (
            spark.readStream.schema(emb.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(landing)
        )
        rep = run_ivf_index_stream(stream, path, meta, maintain={})
        assert rep is not None and not rep["compacted"]
        assert rep["healed"] == []  # write path built the histogram
        # half of each cluster deleted (never a whole one), then a second
        # maintenance-only pass via an empty landing drain is pointless —
        # call the stream again with a fresh one-row batch + maintain
        from pyspark.sql import Window

        w = Window.partitionBy("cluster").orderBy("vec_id")
        ranked = (
            spark.read.parquet(f"{path}/codes")
            .select("vec_id", "cluster")
            .withColumn("r", F.row_number().over(w))
        )
        victims = [
            int(r["vec_id"]) for r in ranked.where(F.col("r") % 2 == 0).collect()
        ]
        ivf_pq_index_delete(spark, path, victims)
        landing2 = tempfile.mkdtemp(prefix="mt_ivfstream_landing2_")
        extra = spark.createDataFrame(
            [(10_000_000, [0.5] * 64)], "vec_id long, v array<double>"
        )
        extra.write.mode("overwrite").parquet(landing2)
        stream2 = (
            spark.readStream.schema(extra.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(landing2)
        )
        rep2 = run_ivf_index_stream(
            stream2, path, meta, maintain={"tombstone_ratio": 0.1}
        )
        assert rep2["compacted"] and rep2["partitions_rewritten"] > 0
        assert not os.path.isdir(f"{path}/tombstones")
        shutil.rmtree(landing2, ignore_errors=True)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
