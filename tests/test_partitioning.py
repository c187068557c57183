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
    # 50k rows, 80% on one key (the reference's max-contributor shape):
    # key 1 has 40k rows (hot at threshold 1000), keys 0..99 ~100 each
    # (cold) — BOTH paths carry rows
    left = spark.range(50_000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(i, f"dim_{i}") for i in range(100)], "k long, label string")

    plain = left.join(right, ["k"]).groupBy("k", "label").count()
    joined = salted_join(left, right, ["k"], salt=8, hot_threshold=1000)
    salted = joined.groupBy("k", "label").count()

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the two-path shape is structural: a Union of the salted hot join and
    # the untouched cold join (the old whole-side form had no Union)
    assert "Union" in joined._jdf.queryExecution().optimizedPlan().toString()


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    # default threshold: everything cold -> pure plain-join path
    out = salted_join(left, right, ["k"], salt=4, how="left").select("k", "v", "w")
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, "a", "x"), (2, "b", "y"), (99, "c", None)]
    # threshold 1: every key hot -> the salted path must also preserve
    # unmatched left rows (99 has no right match even after replication)
    out_hot = salted_join(left, right, ["k"], salt=4, how="left", hot_threshold=1).select(
        "k", "v", "w"
    )
    assert sorted(map(tuple, out_hot.collect())) == got
