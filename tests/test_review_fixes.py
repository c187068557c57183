"""Regression tests for defects found in self-review: fractional-second
session gaps, as-of row atomicity, operator parameter validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.asof import asof_join
from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.sessionize import session_stats
from data_wrangle_openstreetmaps_data_1_spark.partitioning import salted_join


def test_sessionize_fractional_second_gap(spark):
    # gap = 1.65 s; events 1.2 s apart must stay in ONE session (a
    # whole-second truncation of the threshold to 1 s would split them)
    df = spark.createDataFrame(
        [(1, 0), (1, 1_200_000), (1, 2_400_000)], "user_id long, us long"
    ).select("user_id", F.timestamp_micros("us").alias("ts"))
    out = session_stats(df, "user_id", "ts", gap_minutes=1.65 / 60).collect()
    assert len(out) == 1 and out[0]["n_events"] == 3


def test_asof_join_does_not_tear_right_rows(spark):
    # latest right row has a NULL value; the join must return THAT row's
    # NULL, not resurrect the older row's non-null value
    left = spark.createDataFrame([("a", 30)], "k string, t int")
    right = spark.createDataFrame(
        [("a", 10, 5.0, "r1"), ("a", 20, None, "r2")], "k string, rt int, v double, tag string"
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", value_cols=["v", "tag"]).collect()
    assert len(out) == 1
    assert out[0]["tag"] == "r2" and out[0]["v"] is None


def test_asof_join_rejects_value_col_collision(spark):
    left = spark.createDataFrame([("a", 30, 1.0)], "k string, t int, v double")
    right = spark.createDataFrame([("a", 10, 5.0)], "k string, rt int, v double")
    with pytest.raises(ValueError, match="value_cols"):
        asof_join(left, right, on="k", left_time="t", right_time="rt", value_cols=["v"])


def test_minhash_rejects_nondividing_bands(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, "doc_id", "text", k=16, bands=5)


def test_simhash_rejects_unreachable_hamming(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(df, "doc_id", "text", max_hamming=6)


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(df, df, ["k"], how="full")
