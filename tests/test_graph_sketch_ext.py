"""Unit tests for round-6c operators: triangle counting on planted graphs
and HLL sketch-algebra properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
    hll_build,
    hll_estimate,
)


def _triangles(spark, edges):
    """Count triangles with the same oriented-edge join the registered
    query uses, over an explicit edge list (u < v enforced here)."""
    e = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["u", "v"]
    ).distinct()
    e2 = e.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = e.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    return (
        e.join(e2, "v")
        .join(e3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")))
        .count()
    )


def test_triangle_count_planted(spark):
    # K4 has exactly 4 triangles; adding a disjoint path adds none
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(10, 11), (11, 12), (12, 13)]
    assert _triangles(spark, k4) == 4
    assert _triangles(spark, k4 + path) == 4
    # closing the path's first gap creates exactly one new triangle
    assert _triangles(spark, k4 + path + [(10, 12)]) == 5


def test_triangle_orientation_counts_each_once(spark):
    # a single triangle given with mixed edge orientation still counts 1
    assert _triangles(spark, [(2, 1), (3, 2), (1, 3)]) == 1


def _est(spark, items):
    df = spark.createDataFrame([(x,) for x in items], ["tok"])
    return hll_estimate(hll_build(df, "tok")).collect()[0].est_distinct


def test_hll_union_merge_bounds(spark):
    a = [f"a{i}" for i in range(2000)]
    b = [f"b{i}" for i in range(2000)]
    df_a = spark.createDataFrame([(x,) for x in a], ["tok"])
    df_b = spark.createDataFrame([(x,) for x in b], ["tok"])
    sk_a = hll_build(df_a, "tok")
    sk_b = hll_build(df_b, "tok")
    union = sk_a.unionByName(sk_b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    est_a = hll_estimate(sk_a).collect()[0].est_distinct
    est_b = hll_estimate(sk_b).collect()[0].est_distinct
    est_u = hll_estimate(union).collect()[0].est_distinct
    # merge of identical sketches is idempotent: union of A with A = A
    self_u = sk_a.unionByName(sk_a).groupBy("bucket").agg(F.max("rho").alias("rho"))
    assert hll_estimate(self_u).collect()[0].est_distinct == est_a
    # disjoint sets: union estimate within 15% of 4000, and the
    # inclusion-exclusion intersection estimate is near zero relative to it
    assert abs(est_u - 4000) <= 600
    inter = est_a + est_b - est_u
    assert abs(inter) <= 600
