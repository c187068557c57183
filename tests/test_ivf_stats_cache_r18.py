"""r18 optimization: the cluster-histogram sidecar is collected ONCE per
(path, directory signature), not once per probe call (r16 ADVICE item on
ivf_pq_probe_batched re-collecting it every call).

Pinned here:
- the cached dict equals a fresh parquet read;
- a second call with an unchanged sidecar returns the SAME dict object
  (cache hit — no Spark job);
- a lifecycle rewrite of the sidecar (write_cluster_stats after a delta)
  invalidates the entry and the new values are served;
- a missing sidecar returns None (callers keep their scan fallbacks).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
    _CLUSTER_SIZES_CACHE,
    _cluster_sizes_cached,
    train_ivf_pq_meta,
    write_cluster_stats,
    write_ivf_pq_index,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NCENT, M, DSUB, KSUB, R = 16, 8, 8, 16, 6


@pytest.fixture(scope="module")
def indexed(spark, sf_small):
    emb = (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=NCENT, m=M, dsub=DSUB, ksub=KSUB, iters=1, round_to=R
    )
    path = tempfile.mkdtemp(prefix="ivfidx_statscache_")
    write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_cached_equals_fresh_read(spark, indexed):
    fresh = {
        int(r["cluster"]): int(r["n_vecs"])
        for r in spark.read.parquet(f"{indexed}/cluster_stats").collect()
    }
    assert _cluster_sizes_cached(spark, indexed) == fresh
    assert sum(fresh.values()) > 0


def test_second_call_is_a_cache_hit(spark, indexed):
    first = _cluster_sizes_cached(spark, indexed)
    second = _cluster_sizes_cached(spark, indexed)
    # identity, not equality: a hit returns the stored dict without any
    # Spark job; a rebuilt dict would be a fresh object
    assert second is first


def test_sidecar_rewrite_invalidates(spark, indexed):
    before = _cluster_sizes_cached(spark, indexed)
    assert before is not None
    # lifecycle rewrite: full histogram rebuild overwrites the sidecar
    # files, changing the directory signature (names/sizes/mtimes)
    write_cluster_stats(spark, indexed)
    after = _cluster_sizes_cached(spark, indexed)
    assert after == before  # same live codes -> same histogram values
    assert after is not before  # but re-read, not served stale


def test_missing_sidecar_returns_none(spark, indexed, tmp_path):
    assert _cluster_sizes_cached(spark, str(tmp_path / "nope")) is None
    _CLUSTER_SIZES_CACHE.clear()
    assert _cluster_sizes_cached(spark, indexed) is not None
