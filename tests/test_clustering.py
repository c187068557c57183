"""Iterative k-means: determinism, convergence, empty-cluster handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table


def _inertia(df, vec_col, centroids):
    a = assign_clusters(df, vec_col, centroids)
    d2 = "aggregate(zip_with(embedding, c, (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (acc, v) -> acc + v)"
    cent_arr = "array(" + ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D" for x in c) + ")" for c in centroids
    ) + ")"
    return (
        a.withColumn("c", F.expr(f"element_at({cent_arr}, cluster)"))
        .select(F.expr(d2).alias("d2"))
        .agg(F.sum("d2"))
        .collect()[0][0]
    )


def test_kmeans_deterministic_and_converging(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    c1, a1 = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=2)
    c2, _ = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=2)
    assert c1 == c2  # exact determinism across runs (quantized trajectories)

    # Lloyd's guarantee: inertia after the update step never increases
    c0, _ = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1)
    assert _inertia(emb, "embedding", c1) <= _inertia(emb, "embedding", c0) + 1e-9

    # every vector assigned to a valid cluster
    n = emb.count()
    counts = a1.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in counts) == n
    assert all(1 <= r["cluster"] <= 4 for r in counts)


def test_empty_cluster_keeps_centroid(spark):
    # two far groups, k=3 seeded with the first 3 points: one seed captures
    # no members after the first update and must keep its centroid
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.05, 0.0]), (3, [10.0, 10.0]), (4, [10.1, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _ = kmeans_fit(df, "vec_id", "embedding", k=3, iters=2)
    assert len(cents) == 3
    assert all(len(c) == 2 and all(x is not None for x in c) for c in cents)


def test_semantic_dedup_greedy_keep_first(spark):
    """Constructed clusters: exact + near duplicates of the keeper are
    dropped; the smallest id in each near-dup group survives."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.clustering import semantic_dedup

    rows = [
        (0, [1.0, 0.0]),       # seed c1, keeper
        (1, [0.0, 1.0]),       # seed c2, alone
        (2, [1.0, 0.0]),       # exact dup of 0 -> dropped
        (3, [0.9999, 0.01]),   # near dup of 0 -> dropped
        (4, [0.6, 0.8]),       # same cluster as 1? distinct direction, kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["cluster"]: (r["n_members"], r["n_dropped"])
        for r in semantic_dedup(df, "vec_id", "embedding", k=2, iters=1, tau=0.99).collect()
    }
    assert sum(m for m, _ in out.values()) == 5  # every vector assigned once
    assert out[1] == (3, 2)  # ids 2 and 3 dropped, id 0 kept
    assert out[2][1] == 0    # no >= 0.99 pairs in cluster 2
