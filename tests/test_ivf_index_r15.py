"""Round-15 vector-serving additions (operators/ivf_index.py): the live
cluster-cardinality histogram sidecar and the cost-based pre/post filter
strategy with bounded-rounds refill.

The binding contracts:
- the histogram is maintained INCREMENTALLY through write/add/compact/
  merge and always equals the exact codes/ recompute;
- ivf_pq_probe_filtered is exact under EVERY strategy (pre == post ==
  auto) on selective AND broad filters — post-filtering naively changes
  ANN results, so the refill loop + probed-clusters-exhausted acceptance
  rule is what the equality actually tests;
- the refill/fallback machinery engages on adversarial settings without
  changing answers.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
    choose_vector_filter_strategy,
    ivf_pq_index_add,
    ivf_pq_index_compact,
    ivf_pq_index_delete,
    ivf_pq_index_merge,
    ivf_pq_probe_batched,
    ivf_pq_probe_filtered,
    train_ivf_pq_meta,
    write_cluster_stats,
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
    path = tempfile.mkdtemp(prefix="ivfr15_full_")
    write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _queries(emb):
    return [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    ]


def hist_of(spark, path):
    return sorted(
        (int(r["cluster"]), int(r["n_vecs"]))
        for r in spark.read.parquet(f"{path}/cluster_stats").collect()
    )


def exact_hist(spark, path):
    return sorted(
        (int(r["cluster"]), int(r["n"]))
        for r in spark.read.parquet(f"{path}/codes")
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .collect()
    )


def rows_of(df):
    return sorted(map(tuple, df.collect()))


def test_histogram_matches_codes_after_write_add_delete_compact(spark, emb, meta):
    path = tempfile.mkdtemp(prefix="ivfr15_life_")
    try:
        write_ivf_pq_index(
            spark, emb.where(F.col("vec_id") % 5 != 3), path, meta, "vec_id", "v"
        )
        assert hist_of(spark, path) == exact_hist(spark, path)
        ivf_pq_index_add(
            spark, emb.where(F.col("vec_id") % 5 == 3), path, "vec_id", "v"
        )
        assert hist_of(spark, path) == exact_hist(spark, path)
        victims = [
            int(r["vec_id"])
            for r in spark.read.parquet(f"{path}/codes")
            .select("vec_id")
            .orderBy("vec_id")
            .limit(4)
            .collect()
        ]
        ivf_pq_index_delete(spark, path, victims)
        ivf_pq_index_compact(spark, path)
        assert hist_of(spark, path) == exact_hist(spark, path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_histogram_merges_and_rebuilds(spark, emb, meta):
    seg_a = tempfile.mkdtemp(prefix="ivfr15_seg_a_")
    seg_b = tempfile.mkdtemp(prefix="ivfr15_seg_b_")
    out = tempfile.mkdtemp(prefix="ivfr15_merged_") + "/out"
    try:
        write_ivf_pq_index(
            spark, emb.where(F.col("vec_id") % 2 == 0), seg_a, meta, "vec_id", "v"
        )
        write_ivf_pq_index(
            spark, emb.where(F.col("vec_id") % 2 == 1), seg_b, meta, "vec_id", "v"
        )
        ivf_pq_index_merge(spark, out, [seg_a, seg_b])
        assert hist_of(spark, out) == exact_hist(spark, out)
        # the upgrade path: rebuild over a stripped sidecar
        shutil.rmtree(f"{out}/cluster_stats")
        write_cluster_stats(spark, out)
        assert hist_of(spark, out) == exact_hist(spark, out)
    finally:
        shutil.rmtree(seg_a, ignore_errors=True)
        shutil.rmtree(seg_b, ignore_errors=True)
        shutil.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)


def test_choose_strategy_selective_vs_broad(spark, emb, full_index):
    selective = emb.where(F.col("vec_id") % 10 == 0).select("vec_id")
    broad = emb.where(F.col("vec_id") % 10 != 0).select("vec_id")
    # r16: the small-corpus floor short-circuits to pre at this fixture
    # size, whatever the selectivity (VECFILTERPLAN_WIN measured pre
    # faster on both cells at 20k vectors); the raw selectivity model is
    # asserted with the floor disabled
    c_sel = choose_vector_filter_strategy(spark, full_index, selective)
    c_broad = choose_vector_filter_strategy(spark, full_index, broad)
    assert c_sel["strategy"] == "pre" and c_sel["estimator"] == "stored"
    assert c_broad["strategy"] == "pre" and c_broad["floor_applied"]
    u_sel = choose_vector_filter_strategy(
        spark, full_index, selective, small_corpus_floor=0
    )
    u_broad = choose_vector_filter_strategy(
        spark, full_index, broad, small_corpus_floor=0
    )
    assert u_sel["strategy"] == "pre" and not u_sel["floor_applied"]
    assert u_broad["strategy"] == "post"
    assert abs(c_sel["selectivity"] + c_broad["selectivity"] - 1.0) < 1e-9
    with pytest.raises(ValueError, match="threshold"):
        choose_vector_filter_strategy(spark, full_index, selective, threshold=1.5)


@pytest.mark.parametrize("mod,rem", [(3, 0), (10, 0)])
def test_filtered_probe_pre_post_auto_identical(spark, emb, full_index, mod, rem):
    allowed = emb.where(F.col("vec_id") % mod == rem).select("vec_id")
    qs = _queries(emb)
    got = {
        s: rows_of(
            ivf_pq_probe_filtered(
                spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
                strategy=s,
            )
        )
        for s in ("pre", "post", "auto")
    }
    assert got["pre"] == got["post"] == got["auto"]
    # and pre really is the plain batched probe with allowed=
    direct = rows_of(
        ivf_pq_probe_batched(
            spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed
        )
    )
    assert got["pre"] == direct


def test_filtered_probe_refill_and_fallback_paths(spark, emb, full_index):
    """Adversarial settings that force the refill loop and the pre
    fallback: a selective filter under FORCED post with the smallest
    refill (k'=2k) must refill, and with max_refill_rounds=0 must fall
    back — both value-identical to pre."""
    allowed = emb.where(F.col("vec_id") % 10 == 7).select("vec_id")
    qs = _queries(emb)
    pre = rows_of(
        ivf_pq_probe_filtered(
            spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
            strategy="pre",
        )
    )
    refill = rows_of(
        ivf_pq_probe_filtered(
            spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
            strategy="post", refill_factor=2, max_refill_rounds=4,
        )
    )
    fallback = rows_of(
        ivf_pq_probe_filtered(
            spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
            strategy="post", refill_factor=2, max_refill_rounds=0,
        )
    )
    assert refill == pre
    assert fallback == pre


def test_filtered_probe_empty_eligible_set(spark, emb, full_index):
    allowed = emb.where(F.col("vec_id") < 0).select("vec_id")
    qs = _queries(emb)
    out = ivf_pq_probe_filtered(
        spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
        strategy="post",
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "adc_d2"]


def test_filtered_probe_rejects_bad_args(spark, emb, full_index):
    allowed = emb.select("vec_id")
    qs = _queries(emb)
    with pytest.raises(ValueError, match="strategy"):
        ivf_pq_probe_filtered(
            spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
            strategy="maybe",
        )
    with pytest.raises(ValueError, match="refill_factor"):
        ivf_pq_probe_filtered(
            spark, full_index, qs, k=TOPK, nprobe=NPROBE, allowed=allowed,
            refill_factor=1,
        )
