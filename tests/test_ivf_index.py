"""Persisted IVF-PQ index lifecycle (operators/ivf_index.py).

What must hold for the stored index to be a drop-in for the in-session
composition:
- probe reads PRUNE: the executed parquet scan lists only the probed
  cluster partitions (PartitionFilters on the partition column) — the
  100 TB serving claim;
- incremental adds are value-invisible: base-write + delta-add answers
  bit-identically to a one-shot full write (meta trained once);
- duplicate adds fail loudly (the dd_incremental discipline);
- the stored probe matches the in-session sim_ivf_pq exactly.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
    ivf_pq_index_add,
    ivf_pq_probe,
    read_ivf_pq_meta,
    train_ivf_pq_meta,
    write_ivf_pq_index,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NCENT, M, DSUB, KSUB, R = 16, 8, 8, 16, 6
NQ, TOPK, NPROBE = 3, 5, 2


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


@pytest.fixture(scope="module")
def meta(emb):
    return train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=NCENT, m=M, dsub=DSUB, ksub=KSUB, iters=1, round_to=R
    )


@pytest.fixture(scope="module")
def full_index(spark, emb, meta):
    path = tempfile.mkdtemp(prefix="ivfidx_full_")
    write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _queries(emb):
    return [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    ]


def test_index_layout_partitioned_by_cluster(spark, full_index):
    codes = spark.read.parquet(f"{full_index}/codes")
    assert "cluster" in codes.columns
    # every cluster dir exists as a real partition directory
    import os

    dirs = [d for d in os.listdir(f"{full_index}/codes") if d.startswith("cluster=")]
    n_clusters = codes.select("cluster").distinct().count()
    assert len(dirs) == n_clusters > 1


def test_probe_plan_prunes_partitions(spark, emb, full_index, meta):
    """The probe's scan must carry the cluster predicate as a PARTITION
    filter (file-listing-time pruning), not a data filter."""
    qid, qvec = _queries(emb)[0]
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        _assign_clusters_driver,
    )

    clusters = _assign_clusters_driver(qvec, meta, NPROBE)
    scan = spark.read.parquet(f"{full_index}/codes").where(F.col("cluster").isin(clusters))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters", 1)[1][:200]
    # and the pruned scan materializes only the probed clusters' rows
    total = spark.read.parquet(f"{full_index}/codes").count()
    pruned = scan.count()
    per_cluster = (
        spark.read.parquet(f"{full_index}/codes")
        .groupBy("cluster").count().where(F.col("cluster").isin(clusters))
        .agg(F.sum("count")).collect()[0][0]
    )
    assert pruned == per_cluster < total


def test_incremental_add_value_invisible(spark, emb, meta, full_index):
    """base-write + delta-add == one-shot full write, bit for bit."""
    path = tempfile.mkdtemp(prefix="ivfidx_incr_")
    try:
        write_ivf_pq_index(
            spark, emb.where(F.col("vec_id") % 5 != 3), path, meta, "vec_id", "v"
        )
        ivf_pq_index_add(spark, emb.where(F.col("vec_id") % 5 == 3), path, "vec_id", "v")
        a = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/codes").collect()
        )
        b = sorted(
            tuple(r) for r in spark.read.parquet(f"{full_index}/codes").collect()
        )
        assert a == b
        qs = _queries(emb)
        pa = ivf_pq_probe(spark, path, qs, k=TOPK, nprobe=NPROBE).collect()
        pb = ivf_pq_probe(spark, full_index, qs, k=TOPK, nprobe=NPROBE).collect()
        assert sorted(map(tuple, pa)) == sorted(map(tuple, pb))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_duplicate_add_raises(spark, emb, full_index):
    dup_batch = emb.where(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="already present"):
        ivf_pq_index_add(spark, dup_batch, full_index, "vec_id", "v")


def test_meta_roundtrip(spark, full_index, meta):
    got = read_ivf_pq_meta(spark, full_index)
    assert got["m"] == M and got["dsub"] == DSUB and got["ncent"] == NCENT
    assert got["codebooks"] == meta["codebooks"]
    assert got["centroids"] == [[cid, vec] for cid, vec in meta["centroids"]]


def test_delete_compact_lifecycle(spark, emb, meta):
    """Tombstone deletes take effect immediately in probes; compaction
    rewrites ONLY dirty cluster partitions (clean clusters bit-untouched)
    and preserves probe answers exactly."""
    import os

    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_compact,
        ivf_pq_index_delete,
    )

    path = tempfile.mkdtemp(prefix="ivfidx_del_")
    try:
        write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
        qs = _queries(emb)
        before = ivf_pq_probe(spark, path, qs, k=TOPK, nprobe=NPROBE).collect()
        # delete the top neighbor of the first query: it must vanish and
        # the rank backfill must come from the same pruned candidate set
        victim = sorted(
            (r for r in before if r["query_id"] == qs[0][0]),
            key=lambda r: (r["adc_d2"], r["vec_id"]),
        )[0]["vec_id"]
        ivf_pq_index_delete(spark, path, [int(victim)])
        after_ts = ivf_pq_probe(spark, path, qs, k=TOPK, nprobe=NPROBE).collect()
        assert victim not in {r["vec_id"] for r in after_ts}
        assert all(len([r for r in after_ts if r["query_id"] == q]) == TOPK for q, _ in qs)

        # snapshot file listing per cluster dir, then compact
        def listing():
            out = {}
            for d in os.listdir(f"{path}/codes"):
                if d.startswith("cluster="):
                    full = f"{path}/codes/{d}"
                    out[d] = sorted(
                        (f, os.path.getmtime(f"{full}/{f}"))
                        for f in os.listdir(full)
                        if f.endswith(".parquet")
                    )
            return out

        pre = listing()
        codes = spark.read.parquet(f"{path}/codes")
        dirty = {
            r["cluster"]
            for r in codes.where(F.col("vec_id") == victim).select("cluster").collect()
        }
        n_rewritten = ivf_pq_index_compact(spark, path)
        assert n_rewritten == len(dirty) == 1
        post = listing()
        for d in pre:
            if d == f"cluster={next(iter(dirty))}":
                assert pre[d] != post[d]  # the dirty partition was rewritten
            else:
                assert pre[d] == post[d], f"clean partition {d} was touched"
        assert not os.path.isdir(f"{path}/tombstones")
        after_compact = ivf_pq_probe(spark, path, qs, k=TOPK, nprobe=NPROBE).collect()
        assert sorted(map(tuple, after_compact)) == sorted(map(tuple, after_ts))
        # idempotent: nothing left to fold
        assert ivf_pq_index_compact(spark, path) == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compact_refuses_emptying_a_cluster(spark, emb, meta):
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_compact,
        ivf_pq_index_delete,
    )

    path = tempfile.mkdtemp(prefix="ivfidx_empty_")
    try:
        write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
        codes = spark.read.parquet(f"{path}/codes")
        smallest = (
            codes.groupBy("cluster").count().orderBy("count", "cluster").first()
        )
        members = [
            int(r["vec_id"])
            for r in codes.where(F.col("cluster") == smallest["cluster"]).collect()
        ]
        ivf_pq_index_delete(spark, path, members)
        with pytest.raises(ValueError, match="would become empty"):
            ivf_pq_index_compact(spark, path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stored_probe_matches_in_session(spark, sf_small):
    """The full registered lifecycle equals sim_ivf_pq on the same corpus."""
    from data_wrangle_openstreetmaps_data_1_spark.plans.curation_ext import sim_ivf_pq
    from data_wrangle_openstreetmaps_data_1_spark.plans.serving_ext import (
        sim_ivf_pq_stored,
    )

    a = sorted(tuple(r) for r in sim_ivf_pq_stored(spark, sf_small).collect())
    b = sorted(tuple(r) for r in sim_ivf_pq(spark, sf_small).collect())
    assert a == b and len(a) == NQ * TOPK


def test_probe_empty_queries_raises(spark, full_index):
    """Empty query batch must fail loudly (mirrors bm25_probe's guard) —
    st_ivf_index passes caller queries through unguarded otherwise."""
    with pytest.raises(ValueError, match="non-empty"):
        ivf_pq_probe(spark, full_index, [], k=TOPK, nprobe=NPROBE)


def test_write_refuses_malformed_vectors(spark, meta):
    """A wrong-dimension or non-finite vector must be refused at write
    time: un-guarded it assigns cluster NULL and lands in
    __HIVE_DEFAULT_PARTITION__, which no probe ever reads."""
    path = tempfile.mkdtemp(prefix="ivfidx_bad_")
    d = M * DSUB
    try:
        bad_dim = spark.createDataFrame(
            [(900001, [0.0] * (d - 1))], "vec_id long, v array<double>"
        )
        with pytest.raises(Exception, match="dimension"):
            write_ivf_pq_index(spark, bad_dim, path, meta, "vec_id", "v")
        bad_nan = spark.createDataFrame(
            [(900002, [float("nan")] + [0.0] * (d - 1))], "vec_id long, v array<double>"
        )
        with pytest.raises(Exception, match="non-finite"):
            write_ivf_pq_index(spark, bad_nan, path, meta, "vec_id", "v")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_drift_report_and_guard(spark, emb, meta):
    """In-distribution adds must not trip the gauge; a shifted-distribution
    batch must (residual inflation and/or rate skew), and drift_guard=True
    must refuse the flagged batch before it lands."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_drift_report,
    )

    path = tempfile.mkdtemp(prefix="ivfidx_drift_")
    try:
        write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")

        # same vectors, new ids: the batch's landing profile is exactly the
        # training profile -> zero flags
        clone = emb.select((F.col("vec_id") + 500000).alias("vec_id"), "v")
        rep = ivf_pq_drift_report(spark, clone, path, "vec_id", "v")
        assert rep.where(F.col("retrain_flag")).count() == 0
        # and the unflagged batch passes the guard
        ivf_pq_index_add(spark, clone, path, "vec_id", "v", drift_guard=True)

        # shifted distribution: every component +2.0 -> assignment residuals
        # inflate far past resid_ratio_warn
        drifted = emb.select(
            (F.col("vec_id") + 600000).alias("vec_id"),
            F.expr("transform(v, x -> x + 2.0d)").alias("v"),
        )
        rep2 = ivf_pq_drift_report(spark, drifted, path, "vec_id", "v")
        assert rep2.where(F.col("retrain_flag")).count() > 0
        n_before = spark.read.parquet(f"{path}/codes").count()
        with pytest.raises(ValueError, match="drift guard"):
            ivf_pq_index_add(spark, drifted, path, "vec_id", "v", drift_guard=True)
        # the refused batch never landed
        assert spark.read.parquet(f"{path}/codes").count() == n_before
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_batched_probe_matches_per_query_probe(spark, emb, meta, full_index):
    """ivf_pq_probe_batched must be bit-identical to the per-query probe
    (same LUT doubles, same left-fold accumulation, same tie-breaks) while
    compiling ONE pruned scan instead of one branch per query."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_probe_batched,
    )

    qs = _queries(emb)
    looped = ivf_pq_probe(spark, full_index, qs, k=TOPK, nprobe=NPROBE)
    batched = ivf_pq_probe_batched(spark, full_index, qs, k=TOPK, nprobe=NPROBE)
    l_rows = {(r["query_id"], r["vec_id"], r["adc_d2"]) for r in looped.collect()}
    b_rows = {(r["query_id"], r["vec_id"], r["adc_d2"]) for r in batched.collect()}
    assert l_rows == b_rows and len(b_rows) == len(qs) * TOPK

    plan = batched._jdf.queryExecution().executedPlan().toString()
    # AQE prints the final plan followed by the initial plan — count scans
    # in the final section only (the initial section repeats them)
    plan = plan.split("== Initial Plan ==", 1)[0]
    # one codes scan, pruned at file-listing time to the union of probed
    # clusters; the per-query form has len(qs) scans
    assert plan.count("Scan parquet") == 1
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters", 1)[1][:200]
    # the fan-out and LUT joins must all be broadcast equi-joins
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 1 + len(meta["codebooks"])


def test_batched_probe_honors_tombstones(spark, emb, meta):
    """Deleted ids must vanish from batched probe results exactly as they
    do from the per-query probe."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_delete,
        ivf_pq_probe_batched,
    )

    path = tempfile.mkdtemp(prefix="ivfidx_batch_ts_")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
    try:
        qs = _queries(emb)
        top1 = ivf_pq_probe_batched(spark, path, qs, k=1, nprobe=NPROBE).collect()
        victims = sorted({int(r["vec_id"]) for r in top1})
        ivf_pq_index_delete(spark, path, victims)
        after = ivf_pq_probe_batched(spark, path, qs, k=TOPK, nprobe=NPROBE)
        hit = after.where(F.col("vec_id").isin(victims)).count()
        assert hit == 0
        looped = ivf_pq_probe(spark, path, qs, k=TOPK, nprobe=NPROBE)
        assert {tuple(r) for r in after.collect()} == {tuple(r) for r in looped.collect()}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_batched_probe_empty_queries_raises(spark, full_index):
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_probe_batched,
    )

    with pytest.raises(ValueError, match="non-empty"):
        ivf_pq_probe_batched(spark, full_index, [], k=TOPK, nprobe=NPROBE)


def test_drift_report_missing_baseline_is_loud(spark, emb, meta):
    """An index written before the drift gauge existed (no drift_baseline/
    snapshot) must fail the gauge with the recovery spelled out, not an
    opaque AnalysisException from the missing parquet dir."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_drift_report,
    )

    path = tempfile.mkdtemp(prefix="ivfidx_nobase_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
        shutil.rmtree(f"{path}/drift_baseline")  # simulate the old layout
        with pytest.raises(ValueError, match="predates the drift baseline"):
            ivf_pq_drift_report(
                spark, emb.limit(50), path, "vec_id", "v"
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_filtered_probe_equals_probe_on_filtered_index(spark, emb, meta, full_index):
    """Pre-filter semantics pinned by construction: assignment/encoding
    are per-vector functions of fixed meta, so the filtered probe on the
    FULL index must equal the unfiltered probe on an index built from
    ONLY the eligible vectors — same candidates, same codes, same ranks.
    And every returned neighbor satisfies the filter."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_probe_batched,
    )

    qs = _queries(emb)
    allowed = emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    got = ivf_pq_probe_batched(
        spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed
    ).collect()
    assert got and all(r["vec_id"] % 3 == 0 for r in got)

    small = tempfile.mkdtemp(prefix="ivfidx_onlyallowed_")
    shutil.rmtree(small, ignore_errors=True)
    try:
        write_ivf_pq_index(
            spark, emb.where(F.col("vec_id") % 3 == 0), small, meta, "vec_id", "v"
        )
        ref = ivf_pq_probe_batched(spark, small, qs, k=TOPK, nprobe=NPROBE).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    finally:
        shutil.rmtree(small, ignore_errors=True)


def test_ivf_merge_equals_oneshot_build(spark, emb, meta):
    """merge(shard_a, shard_b) must equal write_ivf_pq_index on the union
    corpus across codes, drift baseline, and probe answers; guards (meta
    mismatch, overlapping ids, pending tombstones) refuse loudly."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_delete,
        ivf_pq_index_merge,
        train_ivf_pq_meta,
    )

    a = tempfile.mkdtemp(prefix="ivfmrg_a_")
    b = tempfile.mkdtemp(prefix="ivfmrg_b_")
    out = tempfile.mkdtemp(prefix="ivfmrg_o_")
    ref = tempfile.mkdtemp(prefix="ivfmrg_r_")
    for p in (a, b, out, ref):
        shutil.rmtree(p, ignore_errors=True)
    try:
        ea = emb.where(F.col("vec_id") % 2 == 0)
        eb = emb.where(F.col("vec_id") % 2 == 1)
        write_ivf_pq_index(spark, ea, a, meta, "vec_id", "v")
        write_ivf_pq_index(spark, eb, b, meta, "vec_id", "v")
        ivf_pq_index_merge(spark, out, [a, b])
        write_ivf_pq_index(spark, emb, ref, meta, "vec_id", "v")
        for sub in ("codes", "drift_baseline"):
            got = sorted(tuple(r) for r in spark.read.parquet(f"{out}/{sub}").collect())
            want = sorted(tuple(r) for r in spark.read.parquet(f"{ref}/{sub}").collect())
            assert got == want, f"{sub} diverged from the one-shot build"
        qs = _queries(emb)
        pa = sorted(map(tuple, ivf_pq_probe(spark, out, qs, k=TOPK, nprobe=NPROBE).collect()))
        pb = sorted(map(tuple, ivf_pq_probe(spark, ref, qs, k=TOPK, nprobe=NPROBE).collect()))
        assert pa == pb

        # different training corpus (seed ids 0..NCENT-1 kept) -> different
        # codebooks -> canonical-JSON mismatch
        half = int(emb.agg(F.max("vec_id")).head()[0]) // 2
        other_meta = train_ivf_pq_meta(
            emb.where(F.col("vec_id") <= half), "vec_id", "v",
            ncent=NCENT, m=M, dsub=DSUB, ksub=KSUB, iters=1, round_to=R,
        )
        mm = tempfile.mkdtemp(prefix="ivfmrg_mm_")
        shutil.rmtree(mm, ignore_errors=True)
        write_ivf_pq_index(spark, eb, mm, other_meta, "vec_id", "v")
        with pytest.raises(ValueError, match="DIFFERENT meta"):
            ivf_pq_index_merge(spark, tempfile.mkdtemp(prefix="ivfmrg_x_"), [a, mm])
        shutil.rmtree(mm, ignore_errors=True)
        with pytest.raises(ValueError, match="more than one input"):
            ivf_pq_index_merge(spark, tempfile.mkdtemp(prefix="ivfmrg_y_"), [a, a])
        victim = int(ea.limit(1).collect()[0]["vec_id"])
        ivf_pq_index_delete(spark, a, [victim])
        with pytest.raises(ValueError, match="pending tombstones"):
            ivf_pq_index_merge(spark, tempfile.mkdtemp(prefix="ivfmrg_z_"), [a, b])
    finally:
        for p in (a, b, out, ref):
            shutil.rmtree(p, ignore_errors=True)
