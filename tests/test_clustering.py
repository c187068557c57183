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
