"""Bucketed co-located join (sources/layout.py:write_bucketed): the
write-time shuffle must buy exchange-free joins and aggregations at read
time — the plan property that makes repeated fact-fact joins affordable at
100 TB. Asserted on the physical plan, plus value parity with the plain
shuffle join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.sources.layout import write_bucketed
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "li_bkt", str(base / "li"), ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_bkt", str(base / "o"), ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def _no_broadcast(spark):
    class Ctx:
        def __enter__(self):
            self.old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def __exit__(self, *a):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.old)

    return Ctx()


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    with _no_broadcast(spark):
        j = spark.table(li_t).join(
            spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        # NOTE: per-task sorts remain — Spark only trusts bucket sort order
        # with exactly one file per bucket, so the win here is the elided
        # exchange (the data-sized cost); the leftover sorts are bucket-local

        # value parity with the plain shuffle join
        assert j.count() == (
            load_table(spark, SF, "lineitem")
            .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, bucketed_tables, tmp_path):
    """Honesty check: co-location only holds when bucket specs agree —
    a 4-bucket copy joined to the 8-bucket table must shuffle at least one
    side (documented constraint, not silent wrong data)."""
    li_t, _ = bucketed_tables
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(o, "o_bkt4", str(tmp_path / "o4"), ["o_orderkey"], 4)
    try:
        with _no_broadcast(spark):
            j = spark.table(li_t).join(
                spark.table("o_bkt4"), F.col("l_orderkey") == F.col("o_orderkey")
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan
            assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS o_bkt4")
