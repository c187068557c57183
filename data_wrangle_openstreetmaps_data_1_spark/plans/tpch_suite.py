"""TPC-H query-shape suite: the 16 decision-support shapes not already
covered by the bench headliners (q1/q3/q5/q10/q18/q19 live in analytics.py
and pipeline_ext.py).

The testdata is a reduced TPC-H star schema (no partsupp; fewer columns —
see TESTDATA.md), so each query here keeps the *shape* that matters — the
Catalyst capability the original exercises — re-grounded on available
columns:

- correlated scalar subqueries (q2 min-cost, q17 avg-quantity) decorrelated
  as window/agg + join-back;
- EXISTS / NOT EXISTS (q4, q21, q22) as left-semi / left-anti joins, with
  q21's double-correlated pair rewritten as a single per-order aggregation
  (the scalable form: one shuffle on the order key instead of two
  correlated self-joins);
- scalar-subquery HAVING against a global total (q11, q15) as a broadcast
  1-row aggregate cross-join — the only cross products, broadcast-small by
  construction;
- outer-join aggregation distribution (q13), conditional-aggregation
  pivots (q8, q12, q14), NOT IN as a left-anti join (q16), nested
  semi-join chain (q20), multi-dim star joins (q2, q7, q8, q9).

Scale notes (100 TB): every fact-fact join shuffles on its natural key
(orderkey / partkey / custkey); the global-scalar patterns collect exactly
one row. Broadcast HINTS appear only on tables whose size is bounded by
the schema (nation = 25 rows, region = 5, 1-row scalar aggregates) —
part/supplier/filtered slices all scale linearly with SF, so their joins
carry no hint and AQE broadcasts them exactly while they fit (a hard hint
on a scaling table is a forced OOM at some SF). No correlated per-row
re-scans survive the rewrites — each subquery becomes one keyed shuffle.

Cross-engine determinism: money sums round(2), ratios round(4) (see
registry module docstring for the tie-risk argument); l_quantity sums are
integer-valued doubles (exact at any partial-sum order), so q17/q20's
threshold comparisons are bit-deterministic; q2's unit-cost equality join
compares per-row IEEE divisions reduced by min() — exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_HIGH_PRIO = ("1-URGENT", "2-HIGH")


@register(
    "tpch_q2_min_cost_supp",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_brand, s_name, round(c.unit_cost, 4) AS best_cost
    FROM cost c JOIN part ON p_partkey = c.l_partkey JOIN supplier ON s_suppkey = c.l_suppkey
    WHERE p_size <= 10
      AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey)
    ORDER BY p_partkey, s_name LIMIT 50
    """,
    doc="TPC-H Q2 shape: correlated scalar MIN subquery decorrelated as a "
    "window-min over the per-(part,supplier) cost table; AQE broadcasts "
    "the filtered dims while they fit",
)
def tpch_q2_min_cost_supp(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(F.col("p_size") <= 10)
    s = load_table(spark, sf, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # one reshuffle on l_partkey replaces the per-row correlated re-scan
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", F.round("unit_cost", 4).alias("best_cost"))
        .orderBy("p_partkey", "s_name")
        .limit(50)
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a non-equi date predicate, "
    "DECORRELATED — EXISTS(l_shipdate > o_orderdate + 60) over a key group "
    "≡ max(l_shipdate) per order > o_orderdate + 60, so lineitem reduces "
    "FIRST to one (orderkey, max_shipdate) row via map-side partial max "
    "(4x fewer join-input rows; the r8 sweep caught the semi-join form "
    "feeding the RAW fact into the join, 3.75x at 10x data → ~2x after), "
    "then one equi-join + residual date filter; the filtered orders side "
    "broadcasts under AQE while it fits",
)
def tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li_max = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_shipdate"))
    )
    kept = o.join(li_max, o.o_orderkey == li_max.l_orderkey).where(
        F.col("max_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        kept.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
    """,
    doc="TPC-H Q6 shape: single-scan filter+agg; every predicate must reach "
    "the parquet scan (PushedFilters), ReadSchema pruned to 4 columns",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: anti-symmetric nation-pair filter via two broadcast "
    "copies of the nation dim; fact joins shuffle on orderkey/custkey",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT o_year, round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END)
           / sum(volume), 4) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: market share as conditional-sum ratio; 8-table join "
    "with every dim broadcast, one fact shuffle chain",
)
def tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").where(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    o = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit GROUP BY nation, o_year ORDER BY nation, o_year
    """,
    bench=True,
    doc="TPC-H Q9 shape: profit rollup by nation×year with a substring part "
    "filter (no partsupp in the schema: supply cost proxied as "
    "0.1*p_retailprice, same expression both engines)",
)
def tpch_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").where(F.col("p_name").contains("bolt"))
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    o = load_table(spark, sf, "orders")
    n = load_table(spark, sf, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q11_important_stock",
    """
    WITH value_by_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS pv_cents
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 7
      GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pv_cents) AS BIGINT) AS total_cents
      FROM value_by_part
    )
    SELECT l_partkey AS partkey, round(pv_cents / 100.0, 2) AS part_value
    FROM value_by_part, tot
    WHERE 2 * n * pv_cents > 3 * total_cents
    ORDER BY partkey
    """,
    doc="TPC-H Q11 shape: HAVING against a global scalar subquery — the "
    "threshold is a broadcast 1-row aggregate cross-join (lint-allowlisted "
    "scalar product), never a second scan per group. The literal q11 uses "
    "a FIXED fraction of the total, which degenerates with scale (0 rows "
    "at sf0.1); 1.5x the MEAN part value keeps the selectivity "
    "scale-invariant while exercising the identical plan shape. The "
    "threshold test runs in exact int64 cents (part_value > 1.5*avg "
    "⟺ 2·n·pv_cents > 3·total_cents): double partial-sum order differs "
    "between engines, so a float threshold can flip row MEMBERSHIP on a "
    "boundary part — sharper than an output-rounding wobble. Headroom: "
    "3·total_cents ~ 2e15 at sf1, int64-safe past sf1000",
)
def tpch_q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier").where(F.col("s_nationkey") == 7)
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    value = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("pv_cents"))
    )
    total = value.agg(F.count("*").alias("n"), F.sum("pv_cents").alias("total_cents"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.lit(2) * F.col("n") * F.col("pv_cents") > F.lit(3) * F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("pv_cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy("partkey")
    )


@register(
    "tpch_q12_priority_class",
    """
    SELECT l_returnflag AS shipclass,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape: conditional-count pivot after a fact-fact shuffle "
    "join (l_shipmode absent: l_returnflag stands in as the class key)",
)
def tpch_q12_priority_class(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    o = load_table(spark, sf, "orders")
    hi = F.col("o_orderpriority").isin(*_HIGH_PRIO)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipclass")
    )


@register(
    "tpch_q13_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: order-count-per-customer distribution — outer join "
    "with the filter INSIDE the join condition, then two aggregation levels",
)
def tpch_q13_custdist(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    # the priority filter only references the right side, so pre-filtering
    # before the outer join is identical to putting it in the ON clause
    o = load_table(spark, sf, "orders").where(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14_promo_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
           / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-06-01'
    """,
    doc="TPC-H Q14 shape: promo revenue percentage — broadcast part dim, one "
    "conditional-sum ratio in a single aggregation",
)
def tpch_q14_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("date"))
    )
    p = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(rev_cents / 100.0, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: top supplier via a scalar MAX subquery over a "
    "derived view — max is a broadcast 1-row aggregate, not a global sort. "
    "The row-selecting equality runs on exact int64 cents (per-row "
    "round-to-cents, order-free integer sum): equality on round(sum(dbl),2) "
    "can flip row MEMBERSHIP when engines' partial-sum order lands a "
    "supplier on a half-cent boundary; the integer form cannot",
)
def tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = load_table(spark, sf, "supplier")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(cents).alias("rev_cents")
    )
    mx = revenue.agg(F.max("rev_cents").alias("max_cents"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("rev_cents") == F.col("max_cents"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN as a broadcast left-anti join (the excluded "
    "supplier list is tiny), then count-distinct per part attribute",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf, "supplier").where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_qty_rev",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated per-part AVG threshold decorrelated as "
    "one groupBy + join-back; l_quantity is integer-valued so the 0.2*avg "
    "comparison is bit-deterministic on both engines",
)
def tpch_q17_small_qty_rev(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(F.col("p_brand") == "Brand#11").select("p_partkey")
    # the correlated avg runs over ALL lineitem rows of each part; restricting
    # to brand-filtered parts first is identical because the filter selects
    # whole partkeys
    brand_li = li.join(p, li.l_partkey == p.p_partkey)
    thresholds = brand_li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_li.join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "tpch_q20_excess_stock",
    """
    SELECT s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 80.0
    )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: nested IN-subquery chain — part-name filter, "
    "per-(supplier,part) HAVING, then a left-semi join into supplier; "
    "quantity sums are integer-valued doubles (exact threshold)",
)
def tpch_q20_excess_stock(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(F.col("p_name").startswith("small")).select("p_partkey")
    s = load_table(spark, sf, "supplier")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 80.0)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    bench=True,
    doc="TPC-H Q21 shape: the EXISTS + NOT EXISTS correlated pair rewritten "
    "as ONE per-order aggregation (supplier count / late-supplier count / "
    "the sole late supplier) — a single shuffle on the order key replaces "
    "two correlated self-scans of the fact table; oracle keeps the literal "
    "correlated form to pin semantic equivalence",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = load_table(spark, sf, "supplier")
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    # two-level aggregation instead of two countDistinct()s: multiple
    # distinct aggregates make Spark Expand the input 3x before the
    # shuffle (measured 3.9x wall at 10x data in the sf1 rehearsal);
    # collapsing to per-(order, supplier) lateness first keeps every stage
    # a plain partial-agg groupBy (re-measured 2.5x, BENCH_sf1_local.json)
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
        F.max(F.when(F.col("supp_late") == 1, F.col("l_suppkey"))).alias("sole_late_supp"),
    )
    sole = per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    return (
        sole.groupBy("sole_late_supp")
        .agg(F.count("*").alias("numwait"))
        .join(s, F.col("sole_late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "tpch_q22_idle_customers",
    """
    WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND c_nationkey IN (1, 5, 9, 13, 17, 21, 24)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-06-01')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape: above-global-average balance (broadcast scalar) + "
    "NOT EXISTS recent orders as a left-anti shuffle join (no phone column: "
    "c_nationkey stands in for the country code; every sf0.01 customer has "
    "SOME order, so recency makes the anti-join non-trivial)",
)
def tpch_q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").where(
        F.col("c_nationkey").isin(1, 5, 9, 13, 17, 21, 24)
    )
    recent = (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01").cast("date"))
        .select("o_custkey")
    )
    avg_bal = (
        load_table(spark, sf, "customer")
        .where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("cntrycode")
    )
