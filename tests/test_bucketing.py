"""Bucketed-table co-located join: bucketBy on the join key removes the
shuffle entirely (SURVEY §1.2/§4 — the pre-partitioning strategy for
repeated 100 TB fact joins)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, sf_small):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(li_t).join(
            spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: the join needs NO exchange on either side
        assert "Exchange hashpartitioning" not in plan

        # and it returns the same result as the plain join
        li = load_table(spark, sf_small, "lineitem")
        o = load_table(spark, sf_small, "orders")
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
