"""Plan-shape gates for the TPC-H suite (plans/tpch_suite.py).

Correctness is pinned by the DuckDB oracles; these tests pin the SCALE
properties the rewrites exist for — pushdown reaching the scan, one-pass
decorrelation (no per-row correlated re-scans), and single-scan
reformulations of the EXISTS/NOT-EXISTS pairs.
"""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return query_map()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q6_every_predicate_reaches_the_scan(spark):
    # default maxMetadataStringLength=100 truncates the PushedFilters list
    # in the plan string, hiding exactly what this test asserts
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = plan_of(spark, "tpch_q6_forecast_revenue")
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, f"missing pushed filter {pushed}"
    # pruned to exactly the four referenced columns (timestamp flavor of
    # l_shipdate varies across testdata generations — don't pin it)
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:" in plan


def test_q2_decorrelates_to_one_window_no_rescan(spark):
    """The correlated MIN subquery must become a window over the cost
    aggregate — exactly one lineitem scan, no join of cost against itself."""
    plan = plan_of(spark, "tpch_q2_min_cost_supp")
    assert "Window" in plan
    assert plan.count("lineitem.parquet") == 1


def test_q4_exists_decorrelated_to_preaggregated_join(spark):
    """r8: the semi-join form fed the RAW lineitem fact into the join (AQE
    broadcast a 6M-row projection at sf1 — 3.75x at 10x data); EXISTS over
    a key group with a comparison decorrelates to max-per-key, so lineitem
    must reduce through a partial-agg max BEFORE the single join."""
    plan = plan_of(spark, "tpch_q4_order_priority")
    assert plan.count("lineitem.parquet") == 1
    assert "max(l_shipdate" in plan  # the pre-aggregation, not a raw scan
    assert "partial_max" in plan.lower() or "partial" in plan.lower()


def test_q17_correlated_avg_is_one_extra_scan_not_per_row(spark):
    """groupBy+join-back decorrelation: the brand-filtered lineitem feeds
    both the threshold aggregate and the probe — two scans total, never a
    correlated re-scan per outer row."""
    plan = plan_of(spark, "tpch_q17_small_qty_rev")
    assert plan.count("lineitem.parquet") <= 2


def test_q21_exists_pair_is_single_scan_aggregation(spark):
    """The EXISTS + NOT EXISTS correlated pair costs TWO extra fact scans in
    the literal form (the oracle runs it that way); the Spark rewrite must
    do it in ONE lineitem scan via the per-order aggregation."""
    plan = plan_of(spark, "tpch_q21_waiting_supplier")
    assert plan.count("lineitem.parquet") == 1


def test_q16_not_in_is_broadcast_anti(spark):
    plan = plan_of(spark, "tpch_q16_supplier_cnt")
    assert "LeftAnti, BuildRight" in plan or "LeftAnti" in plan


def test_q13_outer_join_preserves_customers(spark):
    """Golden semantics check on the one shape the oracle exercises thinly:
    customers with zero qualifying orders must appear in the c_count=0
    bucket, so the custdist total equals the customer count."""
    from pyspark.sql import functions as F

    df = query_map()["tpch_q13_custdist"](spark, SF)
    total = df.agg(F.sum("custdist").alias("n")).collect()[0]["n"]
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total == n_cust
