"""spread() and salted_join(): scale helpers must not change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.partitioning import salted_join, spread


def test_spread_preserves_rows(spark):
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    out = spread(df)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert sorted(r["v"] for r in out.collect()) == sorted(r["v"] for r in df.collect())


def test_salted_join_equals_plain_join_under_skew(spark):
    # 50k rows, 80% on one key (the reference's max-contributor shape)
    left = spark.range(50_000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(i, f"dim_{i}") for i in range(100)], "k long, label string")

    plain = left.join(right, ["k"]).groupBy("k", "label").count()
    salted = salted_join(left, right, ["k"], salt=8).groupBy("k", "label").count()

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = salted_join(left, right, ["k"], salt=4, how="left").select("k", "v", "w")
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, "a", "x"), (2, "b", "y"), (99, "c", None)]
