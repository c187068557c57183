"""Round-16 IVF serving guards: the loud driver-side page cap on the
post-filter refill path, the small-corpus floor in the filter planner
(covered in test_ivf_index_r15.py's strategy test), and the
cluster-histogram staleness heal in maintain_ivf_segment (the r15 ADVICE
partial-commit observation: a crash between ivf_pq_index_add's codes
append and its histogram rewrite leaves the sidecar silently stale — it
only ever mis-costs, which is exactly why nothing else would notice)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.index_admin import (
    maintain_ivf_segment,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
    _POST_FILTER_PAGE_MAX,
    ivf_pq_probe_filtered,
    train_ivf_pq_meta,
    write_ivf_pq_index,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NCENT, M, DSUB, KSUB, R = 8, 4, 16, 16, 6


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


@pytest.fixture(scope="module")
def index(spark, emb):
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=NCENT, m=M, dsub=DSUB, ksub=KSUB, iters=1, round_to=R
    )
    path = tempfile.mkdtemp(prefix="ivfr16_")
    write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_post_filter_rejects_oversized_batch_loudly(spark, emb, index):
    """|queries| x k'_max beyond the driver-side cap must refuse up front
    (chunk / lower refill / use pre), never silently collect."""
    allowed = emb.select("vec_id")
    qrow = emb.where(F.col("vec_id") == 0).collect()[0]
    # worst page = 1 query x k x refill^(rounds+1); inflate k to cross the cap
    k_big = _POST_FILTER_PAGE_MAX // (4 ** 4) + 1
    with pytest.raises(ValueError, match="page bound exceeded"):
        ivf_pq_probe_filtered(
            spark, index, [(0, list(qrow["v"]))],
            k=k_big, nprobe=2, allowed=allowed, strategy="post",
        )
    # the pre path takes any batch size: no page assembly
    got = ivf_pq_probe_filtered(
        spark, index, [(0, list(qrow["v"]))],
        k=5, nprobe=2, allowed=allowed, strategy="pre",
    )
    assert got.count() == 5


def test_maintain_heals_stale_histogram(spark, emb, index):
    """Simulate the add-path partial commit (codes landed, histogram
    rewrite lost): corrupt the sidecar, run ONE maintenance pass, and the
    histogram must match a fresh codes aggregate again."""
    stats_dir = f"{index}/cluster_stats"
    good = sorted(
        (int(r["cluster"]), int(r["n_vecs"]))
        for r in spark.read.parquet(stats_dir).collect()
    )
    # stale state: drop one cluster's count by 1 (an unrecorded add)
    c0, n0 = good[0]
    rows = [(c0, n0 - 1)] + [(c, n) for c, n in good[1:]]
    spark.createDataFrame(rows, "cluster int, n_vecs long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stats_dir)
    rep = maintain_ivf_segment(spark, index)
    assert "cluster_stats" in rep["healed"]
    healed = sorted(
        (int(r["cluster"]), int(r["n_vecs"]))
        for r in spark.read.parquet(stats_dir).collect()
    )
    assert healed == good
    # idempotent: a second pass finds nothing stale
    rep2 = maintain_ivf_segment(spark, index)
    assert rep2["healed"] == []
