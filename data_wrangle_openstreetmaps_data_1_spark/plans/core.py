"""Core operator inventory queries (SURVEY.md §2.1-§2.7) on the driver's
synthetic tables. Each query exercises one inventory row; the oracle SQL is
the ANSI twin run by DuckDB.

The reference executed these shapes as MongoDB ``find``/``aggregate`` calls
(file:line cites in each docstring); here they are declarative DataFrame
plans — Catalyst gets pushdown/pruning/partial-agg/top-k for free
(SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import (
    EXPECTED_STREET_TYPES,
    LOWER_COLON_RE,
    LOWER_RE,
    PROBLEMCHARS_RE,
    STREET_TYPE_RE,
)
from ..operators.audit import audit_street_types
from ..sources.tables import load_table
from .registry import register


from .synth import sq as _sq, street_synth_spark, street_synth_sql


# --------------------------------------------------------------------------
# §2.1 scans + §2.4 A1 counts
# --------------------------------------------------------------------------


@register(
    "a1_count_all",
    "SELECT count(*) AS cnt FROM lineitem",
    doc="A1 global count — reference readme.md:121 `docs.count()`",
)
def a1_count_all(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "lineitem").agg(F.count("*").alias("cnt"))


@register(
    "f_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS cnt, round(avg(value), 4) AS avg_value
    FROM events GROUP BY 1
    """,
    doc="semi-structured tail: JSON property extraction (the document-model "
    "open-tag analog on the events table) straight into an aggregation — "
    "get_json_object stays JVM-side, no UDF",
)
def f_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod"),
            "value",
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "u_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="EXCEPT set op (customers who never ordered) — completes the §2.7 "
    "category with union/intersect; plans as a left-anti aggregate",
)
def u_except(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)  # EXCEPT (distinct) semantics, matching the SQL


@register(
    "a1_filtered_counts",
    """
    SELECT o_orderstatus AS status, count(*) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
    doc="A1 filtered counts — readme.md:125-126 node/way counts, one pass",
)
def a1_filtered_counts(spark: SparkSession, sf: str) -> DataFrame:
    # The reference ran one find().count() per type (readme.md:144-145);
    # single-pass groupBy replaces N scans.
    return (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# --------------------------------------------------------------------------


@register(
    "p1_filter_eq",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
    doc="P1 equality-conjunction filter — readme.md:390-391",
)
def p1_filter_eq(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.where((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT")).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
    )


@register(
    "p2_exists_absence",
    """
    SELECT
      count(*) FILTER (WHERE nullif(c_mktsegment, 'BUILDING') IS NOT NULL) AS present,
      count(*) FILTER (WHERE nullif(c_mktsegment, 'BUILDING') IS NULL) AS absent
    FROM customer
    """,
    doc="P2 $exists:1/0 as isNotNull/isNull — readme.md:135,139 (SURVEY §1.2 "
    "absence-vs-null translation)",
)
def p2_exists_absence(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").withColumn(
        "seg", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    return c.agg(
        F.count(F.when(F.col("seg").isNotNull(), 1)).alias("present"),
        F.count(F.when(F.col("seg").isNull(), 1)).alias("absent"),
    )


@register(
    "p2_map_tail_exists",
    """
    SELECT p_partkey,
           p_size > 25 AS has_type,
           CASE WHEN p_size > 25 THEN p_type ELSE NULL END AS type_val,
           p_brand AS brand_val
    FROM part WHERE p_partkey % 10 = 0
    """,
    doc="P2 $exists over the DYNAMIC map tail (SURVEY §2.2 P2 note): a "
    "tags map built in-plan (mirroring operators/reshape.py:103-133's open "
    "tail), probed with map_contains_key + element_at; the oracle derives "
    "the same truth from the base columns, so Spark's absent-key-is-NULL "
    "semantics are value-checked, not assumed",
)
def p2_map_tail_exists(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").where(F.col("p_partkey") % 10 == 0)
    tagged = p.select(
        "p_partkey",
        F.map_concat(
            F.create_map(F.lit("brand"), F.col("p_brand")),
            F.when(
                F.col("p_size") > 25, F.create_map(F.lit("type"), F.col("p_type"))
            ).otherwise(F.expr("map()").cast("map<string,string>")),
        ).alias("tags"),
    )
    return tagged.select(
        "p_partkey",
        F.map_contains_key(F.col("tags"), F.lit("type")).alias("has_type"),
        F.element_at(F.col("tags"), F.lit("type")).alias("type_val"),
        F.element_at(F.col("tags"), F.lit("brand")).alias("brand_val"),
    )


@register(
    "p3_filter_regex",
    r"""
    SELECT c_custkey, c_name FROM customer
    WHERE regexp_matches(c_name, '0{3}[12]\d$')
    """,
    doc="P3 regex predicate — readme.md:137-138 `$regex ^99`",
)
def p3_filter_regex(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "customer")
        .where(F.col("c_name").rlike(r"0{3}[12]\d$"))
        .select("c_custkey", "c_name")
    )


@register(
    "p4_filter_in",
    """
    SELECT o_orderpriority AS priority, count(*) AS cnt
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
    GROUP BY o_orderpriority
    """,
    doc="P4 $in membership — readme.md:396-397 amenity list",
)
def p4_filter_in(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "p5_project_rename",
    """
    SELECT n_name AS Name, n_nationkey AS Id, n_regionkey AS Region
    FROM nation
    """,
    doc="P5 $project rename — readme.md:198-199",
)
def p5_project_rename(spark: SparkSession, sf: str) -> DataFrame:
    n = load_table(spark, sf, "nation")
    return n.select(
        F.col("n_name").alias("Name"),
        F.col("n_nationkey").alias("Id"),
        F.col("n_regionkey").alias("Region"),
    )


@register(
    "p6_reshape_nested",
    """
    SELECT o_orderkey AS id,
           o_orderstatus AS created_status,
           o_orderpriority AS created_priority,
           o_custkey AS pos_0,
           o_orderkey AS pos_1,
           o_orderstatus AS tag_status
    FROM orders WHERE o_orderkey % 10 = 0
    """,
    doc="P6 per-row reshape (struct/array/map build + access) — "
    "ProjectCodeUsed/data.py:170-185; nested built then flattened so the "
    "oracle checks values",
)
def p6_reshape_nested(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") % 10 == 0)
    shaped = o.select(
        F.col("o_orderkey").alias("id"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("created"),
        F.array(F.col("o_custkey"), F.col("o_orderkey")).alias("pos"),
        F.create_map(F.lit("status"), F.col("o_orderstatus")).alias("tags"),
    )
    return shaped.select(
        "id",
        F.col("created.status").alias("created_status"),
        F.col("created.priority").alias("created_priority"),
        F.element_at("pos", 1).alias("pos_0"),
        F.element_at("pos", 2).alias("pos_1"),
        F.element_at("tags", "status").alias("tag_status"),
    )


_KEY_SYNTH_SQL = """
        CASE event_id % 5
          WHEN 0 THEN event_type
          WHEN 1 THEN event_type || ':sub'
          WHEN 2 THEN upper(event_type)
          WHEN 3 THEN event_type || ' x'
          ELSE event_type || '.'
        END
"""


def _key_synth_spark():
    et = F.col("event_type")
    return (
        F.when(F.col("event_id") % 5 == 0, et)
        .when(F.col("event_id") % 5 == 1, F.concat(et, F.lit(":sub")))
        .when(F.col("event_id") % 5 == 2, F.upper(et))
        .when(F.col("event_id") % 5 == 3, F.concat(et, F.lit(" x")))
        .otherwise(F.concat(et, F.lit(".")))
    )


@register(
    "p7_key_classify",
    f"""
    WITH keys AS (SELECT {_KEY_SYNTH_SQL} AS k FROM events)
    SELECT CASE
             WHEN regexp_matches(k, '{_sq(LOWER_RE)}') THEN 'lower'
             WHEN regexp_matches(k, '{_sq(LOWER_COLON_RE)}') THEN 'lower_colon'
             WHEN regexp_matches(k, '{_sq(PROBLEMCHARS_RE)}') THEN 'problemchars'
             ELSE 'other'
           END AS key_class,
           count(*) AS cnt
    FROM keys GROUP BY 1
    """,
    doc="P7 tag-key char-class classification — Lesson6Quizes/tags.py:21-46",
)
def p7_key_classify(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.cleaning import classify_key

    e = load_table(spark, sf, "events").select(_key_synth_spark().alias("k"))
    return e.select(classify_key(F.col("k")).alias("key_class")).groupBy("key_class").agg(
        F.count("*").alias("cnt")
    )


# --------------------------------------------------------------------------
# §2.4 aggregations
# --------------------------------------------------------------------------


@register(
    "a2_top_users",
    """
    SELECT user_id, count(*) AS contributions
    FROM events GROUP BY user_id
    ORDER BY contributions DESC, user_id ASC LIMIT 10
    """,
    bench=True,
    doc="A2+O1+O2 flagship 'Top 10 contributors' — readme.md:161-171",
)
def a2_top_users(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("contributions"))
        .orderBy(F.desc("contributions"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "a3_distinct_collect",
    """
    SELECT array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events
    """,
    doc="A3 $addToSet distinct-collect — readme.md:28-29,129 (sorted+joined "
    "for deterministic comparison)",
)
def a3_distinct_collect(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types")
    )


@register(
    "a4_distinct_count",
    "SELECT count(DISTINCT user_id) AS users FROM events",
    doc="A4 distinct count — readme.md:129-130; Lesson6Quizes/users.py:18-23",
)
def a4_distinct_count(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events").agg(
        F.countDistinct("user_id").alias("users")
    )


@register(
    "a5_tag_freq",
    "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    doc="A5 tag-frequency count — Lesson6Quizes/mapparser.py:16-21",
)
def a5_tag_freq(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events").groupBy("event_type").agg(F.count("*").alias("cnt"))


@register(
    "a6_summary_stats",
    """
    WITH contrib AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           round(avg(cnt), 4) AS mean_c,
           round(stddev_samp(cnt), 4) AS std_c,
           min(cnt) AS min_c,
           round(CAST(quantile_cont(cnt, 0.25) AS DOUBLE), 4) AS p25,
           round(CAST(quantile_cont(cnt, 0.50) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(cnt, 0.75) AS DOUBLE), 4) AS p75,
           max(cnt) AS max_c
    FROM contrib
    """,
    doc="A6 describe() summary stats — readme.md:178-192",
)
def a6_summary_stats(spark: SparkSession, sf: str) -> DataFrame:
    contrib = load_table(spark, sf, "events").groupBy("user_id").agg(F.count("*").alias("cnt"))
    return contrib.agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("cnt"), 4).alias("mean_c"),
        F.round(F.stddev_samp("cnt"), 4).alias("std_c"),
        F.min("cnt").alias("min_c"),
        F.round(F.expr("percentile(cnt, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(cnt, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(cnt, 0.75)"), 4).alias("p75"),
        F.max("cnt").alias("max_c"),
    )


@register(
    "a7_group2_count",
    """
    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
    doc="A7 two-key grouped count — readme.md:400-404",
)
def a7_group2_count(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").cast("string").alias("day"))
        .agg(F.count("*").alias("cnt"))
    )


_STREET_SYNTH_SQL = street_synth_sql("s_suppkey")


def _street_synth_spark():
    return street_synth_spark("s_suppkey")


_EXPECTED_SQL = ", ".join(f"'{t}'" for t in EXPECTED_STREET_TYPES)


@register(
    "a8_audit_streets",
    f"""
    WITH streets AS (SELECT {_STREET_SYNTH_SQL} AS street_name FROM supplier),
    typed AS (
      SELECT street_name,
             regexp_extract(street_name, '{_sq(STREET_TYPE_RE)}') AS street_type
      FROM streets
    )
    SELECT street_type,
           array_to_string(list_sort(list(DISTINCT street_name)), '|') AS street_names
    FROM typed
    WHERE street_type NOT IN ({_EXPECTED_SQL}) AND street_type <> ''
    GROUP BY street_type
    """,
    doc="A8 street audit as groupBy+collect_set — Lesson6Quizes/audit.py:33-55",
)
def a8_audit_streets(spark: SparkSession, sf: str) -> DataFrame:
    streets = load_table(spark, sf, "supplier").select(_street_synth_spark().alias("street"))
    audited = audit_street_types(streets, F.col("street"))
    return audited.select(
        "street_type", F.concat_ws("|", "street_names").alias("street_names")
    )


@register(
    "a9_matrix_single_pass",
    """
    SELECT event_type,
           CASE WHEN value > 10 THEN 'high' ELSE 'low' END AS bucket,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
    doc="A9 per-group x per-region matrix in ONE pass — readme.md:532-539 "
    "(reference looped a full query per group)",
)
def a9_matrix_single_pass(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .withColumn("bucket", F.when(F.col("value") > 10, F.lit("high")).otherwise(F.lit("low")))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------


@register(
    "j2_join3_chain",
    """
    SELECT r_name AS region, count(*) AS customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    bench=True,
    doc="J2-style multi-hop dereference join chain — readme.md:488-495",
)
def j2_join3_chain(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count("*").alias("customers"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@register(
    "j1_broadcast_join",
    """
    SELECT c_mktsegment AS segment, count(*) AS orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    bench=True,
    doc="J1 broadcast dim join (the $near per-city join generalized) — "
    "readme.md:389-398",
)
def j1_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@register(
    "j_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    doc="left-semi join ($exists-style membership, SURVEY §2.3 completeness)",
)
def j_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "j_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left-anti join (customers with no orders)",
)
def j_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j_asof_backward",
    """
    SELECT c.event_id AS click_id, c.user_id,
           CAST(c.ts AS VARCHAR) AS click_ts,
           CAST(v.ts AS VARCHAR) AS view_ts,
           round(v.value, 2) AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value
                    FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    bench=True,
    doc="as-of join (nearest prior event): every click + the user's latest "
    "view at-or-before it, left-outer. Implemented as the union + "
    "last-observation-carried-forward window — ONE shuffle keyed by user, "
    "no range-join candidate blow-up (operators/asof.py); DuckDB's native "
    "ASOF LEFT JOIN is the oracle. Views pre-aggregated to unique (user, "
    "ts) — neither engine defines the equal-timestamp winner",
)
def j_asof_backward(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.asof import asof_join

    e = load_table(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = asof_join(
        clicks, views, on=["user_id"], value_cols=["value"], matched_time_alias="view_ts"
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("ts").cast("string").alias("click_ts"),
        F.col("view_ts").cast("string").alias("view_ts"),
        F.round("value", 2).alias("view_value"),
    )


@register(
    "j_asof_tolerance",
    """
    SELECT c.event_id AS click_id, c.user_id,
           CAST(CASE WHEN v.ts >= c.ts - INTERVAL 10 MINUTES THEN v.ts END AS VARCHAR) AS view_ts,
           round(CASE WHEN v.ts >= c.ts - INTERVAL 10 MINUTES THEN v.value END, 2) AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value
                    FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    doc="as-of join with tolerance (pandas merge_asof semantics): matches "
    "older than 10 minutes are nulled, rows kept — the bounded-staleness "
    "feature-lookup shape of a training pipeline",
)
def j_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.asof import asof_join

    e = load_table(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = asof_join(
        clicks,
        views,
        on=["user_id"],
        value_cols=["value"],
        matched_time_alias="view_ts",
        tolerance=F.expr("INTERVAL 10 MINUTES"),
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("view_ts").cast("string").alias("view_ts"),
        F.round("value", 2).alias("view_value"),
    )


# --------------------------------------------------------------------------
# §2.6 sort/limit + §2.7 set ops
# --------------------------------------------------------------------------


@register(
    "j_merge_factfact",
    """
    SELECT o_orderpriority AS priority, count(*) AS line_cnt,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="fact-to-fact join shape: merge hint forces the SortMergeJoin path "
    "a 100 TB lineitem-orders join would take (both sides too big to "
    "broadcast); shuffle keyed on orderkey, partial agg after",
)
def j_merge_factfact(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.hint("merge")
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("line_cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


@register(
    "o2_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    doc="O1+O2 sort desc + limit (top-20 amenities shape) — readme.md:246-249; "
    "Spark plans TakeOrderedAndProject (true top-k, no full sort)",
)
def o2_topk(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "u1_union_tag",
    """
    SELECT tag, count(*) AS cnt, round(sum(o_totalprice), 2) AS total FROM (
      SELECT 'big' AS tag, o_totalprice FROM orders WHERE o_totalprice > 50000
      UNION ALL
      SELECT 'small' AS tag, o_totalprice FROM orders WHERE o_totalprice <= 1000
    ) GROUP BY tag
    """,
    doc="U1 union with provenance tag — readme.md:400-403",
)
def u1_union_tag(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    big = o.where(F.col("o_totalprice") > 50000).select(F.lit("big").alias("tag"), "o_totalprice")
    small = o.where(F.col("o_totalprice") <= 1000).select(F.lit("small").alias("tag"), "o_totalprice")
    return (
        big.unionByName(small)
        .groupBy("tag")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "u2_intersect",
    """
    SELECT p_brand FROM part WHERE p_size < 10
    INTERSECT
    SELECT p_brand FROM part WHERE p_size > 40
    """,
    doc="U2 intersection — readme.md:541 natural-feature keys in both states",
)
def u2_intersect(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    return (
        p.where(F.col("p_size") < 10)
        .select("p_brand")
        .intersect(p.where(F.col("p_size") > 40).select("p_brand"))
    )


@register(
    "j_salted_skew",
    """
    WITH per_user AS (
      SELECT user_id, count(*) AS user_total
      FROM events GROUP BY user_id),
    top5 AS (SELECT * FROM per_user ORDER BY user_total DESC, user_id ASC LIMIT 5),
    bot5 AS (SELECT * FROM per_user ORDER BY user_total ASC, user_id ASC LIMIT 5),
    dim AS (SELECT * FROM top5 UNION SELECT * FROM bot5)
    SELECT e.user_id, e.event_type, count(*) AS cnt,
           max(d.user_total) AS user_total
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.user_id, e.event_type
    """,
    bench=True,
    doc="skew-resistant TWO-PATH salted join, value-checked equal to the "
    "plain join: keys above the frequency threshold spread over 8 salt "
    "sub-keys (right rows replicated 8x for THOSE keys only), cold keys "
    "take the plain join untouched, results union — so a key owning a "
    "third of the fact table (the reference's user distribution, "
    "readme.md:184-192) lands on 8 tasks while the cold majority pays "
    "zero replication. AQE skew-split only rescues sort-merge joins after "
    "the fact; salting fixes the layout up front and also covers the "
    "aggregation AFTER the join (partitioning.salted_join). The dim side "
    "is top-5 UNION bottom-5 users and the threshold (80) falls between "
    "the two groups' per-user counts, so BOTH paths carry rows in the "
    "checked result — the salted hot path AND the untouched cold path",
)
def j_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    from ..partitioning import salted_join

    e = load_table(spark, sf, "events").select("user_id", "event_type")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("user_total"))
    top5 = per_user.orderBy(F.desc("user_total"), F.asc("user_id")).limit(5)
    bot5 = per_user.orderBy(F.asc("user_total"), F.asc("user_id")).limit(5)
    dim = top5.unionByName(bot5).distinct()
    joined = salted_join(e, dim, ["user_id"], salt=8, hot_threshold=80)
    return joined.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"), F.max("user_total").alias("user_total")
    )
