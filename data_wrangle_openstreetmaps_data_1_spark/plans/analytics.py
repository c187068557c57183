"""Analytic queries: TPC-H-style aggregation/join plans (the bench
headliners), window functions, as-of join, sessionization, time-window
rollups.

The reference has no window functions (SURVEY §2.5) — these are the natural
extensions the engine gets from Spark, registered as first-class inventory
entries. Every plan is shuffle-conscious: partial aggs, broadcast dims,
single-sort window stacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.range_join import range_join_bucketed
from ..operators.sessionize import session_stats
from ..sources.tables import load_table
from .registry import register


@register(
    "tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2024-11-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="TPC-H Q1 shape: scan-heavy partial+final hash agg; the plan should "
    "show PushedFilters on l_shipdate and a pruned ReadSchema",
)
def tpch_q1_pricing(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(F.col("l_shipdate") <= F.lit("2024-11-01").cast("date"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q3_revenue",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '2024-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    bench=True,
    doc="TPC-H Q3 shape: filter-pushdown + broadcast dim + top-k "
    "(TakeOrderedAndProject)",
)
def tpch_q3_revenue(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").where(F.col("o_orderdate") < F.lit("2024-06-01").cast("date"))
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("orderdate"))
    )


@register(
    "tpch_q5_regional",
    """
    SELECT r_name AS region,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    bench=True,
    doc="TPC-H Q5 shape: 6-table join; dims broadcast, fact joins shuffle on "
    "keys, AQE picks the final shape",
)
def tpch_q5_regional(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "w_rank_topn_per_group",
    """
    WITH ranked AS (
      SELECT c_mktsegment AS segment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT segment, o_orderkey, round(o_totalprice, 2) AS total, rk
    FROM ranked WHERE rk <= 3
    """,
    doc="window rank: top-3 orders per segment (extension of A2 per SURVEY "
    "§2.5 — reference had sort+slice only)",
)
def w_rank_topn_per_group(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_orderkey", "o_totalprice"
    )
    # two-stage top-k (operators/topk.py): 5 market segments = 5 hot keys
    # — the single-window form would route every order of a segment
    # through one reducer
    from ..operators.topk import topk_per_key

    return topk_per_key(
        j,
        ["segment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
        "o_orderkey",
        rank_col="rk",
    ).select("segment", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "rk")


@register(
    "w_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
    FROM events WHERE user_id % 10 = 0
    """,
    doc="window running sum per user over event time",
)
def w_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").where(F.col("user_id") % 10 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select("event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("run_total"))


@register(
    "a_rollup_hierarchy",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           count(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region > nation > grand total) — grouping "
    "sets are a single Expand + one aggregation, not N scans (SURVEY §2.4 "
    "note: absent in reference, native in Spark)",
)
def a_rollup_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .count()
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.col("count").alias("cnt"),
        )
    )


@register(
    "a_cube_matrix",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions — all 4 grouping sets in one pass",
)
def a_cube_matrix(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


@register(
    "a_pivot_wide",
    """
    SELECT o_orderpriority AS priority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS total_f,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS total_o,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS total_p
    FROM orders GROUP BY 1
    """,
    doc="pivot (long->wide reshape): order counts and revenue per priority x "
    "status, statuses as columns. Spark's pivot() with an EXPLICIT value "
    "list — the implicit form runs a blocking distinct scan first and "
    "hard-caps at spark.sql.pivotMaxValues; with pinned values it is one "
    "partial-agg shuffle, same cost as the plain groupBy. Oracle is the "
    "equivalent conditional aggregation",
)
def a_pivot_wide(spark: SparkSession, sf: str) -> DataFrame:
    wide = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    return wide.select(
        "priority",
        *[F.coalesce(f"{s}_cnt", F.lit(0)).alias(f"n_{s.lower()}") for s in ("F", "O", "P")],
        *[F.col(f"{s}_total").alias(f"total_{s.lower()}") for s in ("F", "O", "P")],
    )


@register(
    "w_lead_lag_delta",
    """
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 2) AS delta_prev,
           round(lead(value) OVER w - value, 2) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lead/lag deltas per user over event time — one shuffle + one sort "
    "serves both window functions",
)
def w_lead_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
    )


@register(
    "asof_join_events",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, max(value) AS value
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id,
           CAST(v.ts AS VARCHAR) AS last_view_ts,
           round(v.value, 2) AS last_view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    doc="as-of join (point-in-time lookup): for each click, the latest view "
    "at or before it — union+window implementation (operators/asof.py), "
    "DuckDB native ASOF JOIN as oracle. Views are pre-aggregated to one row "
    "per (user, ts) on BOTH sides: neither engine defines which of two "
    "equal-timestamp right rows an as-of join picks",
)
def asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.max("value").alias("view_value"))
    )
    v2 = views.select("user_id", "view_ts", F.col("view_value"), F.col("view_ts").alias("view_ts_copy"))
    out = asof_join(
        clicks,
        v2,
        on="user_id",
        left_time="ts",
        right_time="view_ts",
        value_cols=["view_ts_copy", "view_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("view_ts_copy").cast("string").alias("last_view_ts"),
        F.round("view_value", 2).alias("last_view_value"),
    )


@register(
    "w_percentiles_ntile",
    """
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           ntile(10) OVER w AS decile,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    doc="distribution window functions (percent_rank / ntile / cume_dist) "
    "over one shared global sort — completes the §2.5 window family",
)
def w_percentiles_ntile(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf, "orders")
        .where(F.col("o_custkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.ntile(10).over(w).alias("decile"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@register(
    "t_multigrain_rollup",
    """
    SELECT coalesce(CAST(CAST(date_trunc('month', ts) AS TIMESTAMP) AS VARCHAR), 'ALL') AS month,
           coalesce(CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR), 'ALL') AS day,
           coalesce(CAST(date_trunc('hour', ts) AS VARCHAR), 'ALL') AS hour,
           count(*) AS cnt, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts), date_trunc('hour', ts))
    """,
    doc="hypertable-style multi-granularity rollup: hour/day/month/total "
    "aggregates in ONE pass via ROLLUP over the truncation hierarchy — the "
    "continuous-aggregate shape, not one scan per grain",
)
def t_multigrain_rollup(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        F.date_trunc("month", "ts").alias("m"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "value",
    )
    return (
        e.rollup("m", "d", "h")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.coalesce(F.col("m").cast("string"), F.lit("ALL")).alias("month"),
            F.coalesce(F.col("d").cast("string"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("h").cast("string"), F.lit("ALL")).alias("hour"),
            "cnt",
            "total_value",
        )
    )


@register(
    "j_range_join",
    """
    WITH iv AS (SELECT o_orderkey, o_orderdate AS s,
                       o_orderdate + INTERVAL 7 DAY AS e
                FROM orders WHERE o_orderkey % 199 = 0)
    SELECT o_orderkey, count(*) AS n_shipped,
           round(sum(l_extendedprice), 2) AS total
    FROM iv JOIN lineitem ON l_shipdate BETWEEN s AND e
    GROUP BY o_orderkey
    """,
    doc="range/interval join via time-bucketed equi-join (each event hits "
    "one bucket, intervals explode to covered buckets, residual BETWEEN) — "
    "replaces the O(n x m) nested-loop theta-join a naive BETWEEN plans",
)
def j_range_join(spark: SparkSession, sf: str) -> DataFrame:
    iv = (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderkey") % 199 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("s"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
        )
    )
    li = load_table(spark, sf, "lineitem").select("l_shipdate", "l_extendedprice")
    joined = range_join_bucketed(li, iv, "l_shipdate", "s", "e")
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_shipped"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@register(
    "sessionize_gap",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             -- CAST: DuckDB integer sum() yields HUGEINT, which fetchdf()
             -- materializes as float64 (123.0) vs Spark's int64 (123) — the
             -- driver's value hash treats those as different values.
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000 AS duration_ms
    FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30 min) — batch twin of the streaming "
    "stateful operator (streaming/); one shuffle+sort per user partition",
)
def sessionize_gap(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return session_stats(e, "user_id", "ts", gap_minutes=30.0)


@register(
    "t_hourly_rollup",
    """
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
           count(*) AS cnt, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    bench=True,
    doc="tumbling-window rollup (batch twin of the streaming windowed agg)",
)
def t_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "a_retention_cohorts",
    """
    WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
    SELECT CAST(CAST(f.cw AS DATE) AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', f.cw, a.w) // 7 AS INTEGER) AS week_n,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="cohort retention matrix: users bucketed by first-seen week, "
    "distinct-user counts per (cohort, weeks-since) cell — the classic "
    "product-analytics triangle. Two partial-agg'd groupBys + one keyed "
    "join; the per-user first-week table is the small derived side (one "
    "row per user), so at 100 TB of events AQE broadcasts it. Week "
    "arithmetic stays integral (both weeks are Monday-truncated, so the "
    "day diff is an exact multiple of 7) — no float anywhere",
)
def a_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    first = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    active = e.select("user_id", F.date_trunc("week", F.col("ts")).alias("w")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            # date-render: DuckDB's date_trunc('week') yields DATE while
            # Spark's yields timestamp — both sides stringify the DATE form
            F.col("cw").cast("date").cast("string").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7).cast("int").alias("week_n"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "a_funnel_stages",
    """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts FROM events),
    s1 AS (SELECT user_id, day, event_type, ts,
                  min(CASE WHEN event_type = 'view' THEN ts END)
                    OVER (PARTITION BY user_id, day) AS fv
           FROM e),
    s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= fv THEN ts END)
                       OVER (PARTITION BY user_id, day) AS fc
           FROM s1),
    s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= fc THEN ts END)
                       OVER (PARTITION BY user_id, day) AS fp
           FROM s2),
    per_ud AS (SELECT DISTINCT user_id, day,
                      CASE WHEN fp IS NOT NULL THEN 3
                           WHEN fc IS NOT NULL THEN 2
                           WHEN fv IS NOT NULL THEN 1
                           ELSE 0 END AS stage
               FROM s3)
    SELECT stage, count(*) AS n_user_days FROM per_ud GROUP BY stage
    """,
    doc="ordered funnel analysis per user-day (view -> click-after-view -> "
    "purchase-after-that-click), the product-analytics staple: THREE "
    "stacked unordered window mins over ONE (user, day)-keyed shuffle — "
    "no self-joins, no re-shuffle (each window reuses the same "
    "partitioning, and an unbounded frame needs no sort), then a distinct "
    "per-key stage and a tiny rollup. At 100 TB the events table moves "
    "exactly once",
)
def a_funnel_stages(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "ts"
    )
    w = Window.partitionBy("user_id", "day")
    s1 = e.select(
        "*", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias("fv")
    )
    s2 = s1.select(
        "*",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("fv")), F.col("ts"))
        ).over(w).alias("fc"),
    )
    s3 = s2.select(
        "*",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("fc")), F.col("ts"))
        ).over(w).alias("fp"),
    )
    stage = (
        F.when(F.col("fp").isNotNull(), 3)
        .when(F.col("fc").isNotNull(), 2)
        .when(F.col("fv").isNotNull(), 1)
        .otherwise(0)
    )
    per_ud = s3.select("user_id", "day", stage.alias("stage")).distinct()
    return per_ud.groupBy("stage").agg(F.count("*").alias("n_user_days"))


@register(
    "w_session_window_native",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS sid
      FROM flagged
    )
    SELECT user_id, CAST(min(ts) AS VARCHAR) AS session_start,
           count(*) AS n_events,
           (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000 AS duration_ms
    FROM sess GROUP BY user_id, sid
    """,
    doc="Spark's NATIVE session_window aggregation (vs sessionize_gap's "
    "manual two-window form): groupBy(user, session_window(ts, gap)) — one "
    "shuffle, merge-on-overlap inside the aggregation, usable unchanged in "
    "Structured Streaming. Boundary semantics differ from the manual "
    "operator: the merge window is half-open, so an event EXACTLY gap "
    "after its predecessor starts a NEW session (oracle uses >=, the "
    "manual twin uses >) — documented, value-checked difference",
)
def w_session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    g = e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    return g.select(
        "user_id",
        F.col("first_ts").cast("string").alias("session_start"),
        "n_events",
        ((F.unix_micros("last_ts") - F.unix_micros("first_ts")) / 1000)
        .cast("long")
        .alias("duration_ms"),
    )
