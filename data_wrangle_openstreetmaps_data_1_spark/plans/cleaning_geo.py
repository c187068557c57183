"""Cleaning (F1-F12 / W1-W8) and geospatial (G1-G5, J1/J2) inventory queries.

Dirty values are synthesized deterministically from table keys with the SAME
expression on both engines, then cleaned with the library functions on the
Spark side and hand-expanded ANSI SQL on the DuckDB side — so the oracle
genuinely checks the cleaning semantics (update ordering, last-token-only
street mapping, epsilon box bounds, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cleaning as C
from ..functions.geo import DIVIDING_LON, EARTH_RADIUS_KM, MILES_TO_METERS, haversine_km
from ..operators.geo_queries import near, state_of
from ..sources.tables import load_table
from .registry import register
from .synth import (
    point_lat_spark,
    point_lat_sql,
    point_lon_spark,
    point_lon_sql,
    sq as _sq,
    street_synth_spark,
    street_synth_sql,
)


# --------------------------------------------------------------------------
# F1: street-suffix normalization (the reference's update_name)
# --------------------------------------------------------------------------

_DIRTY_STREET_SQL = street_synth_sql("p_partkey")

_STREET_MAP_SQL = " ".join(
    f"WHEN '{_sq(k)}' THEN '{_sq(v)}'" for k, v in C.STREET_MAPPING.items()
)


def _dirty_street_spark():
    return street_synth_spark("p_partkey")


@register(
    "f1_clean_street",
    f"""
    WITH d AS (SELECT p_partkey, {_DIRTY_STREET_SQL} AS street FROM part),
    t AS (SELECT p_partkey, street,
                 regexp_extract(street, '[^ ]+$') AS last_tok
          FROM d)
    SELECT p_partkey, street,
           left(street, length(street) - length(last_tok)) ||
           (CASE last_tok {_STREET_MAP_SQL} ELSE last_tok END) AS cleaned
    FROM t
    """,
    doc="F1 update_name: last-token street-suffix mapping — "
    "ProjectCodeUsed/data.py:98-118; 'Main Street' decoy must stay unchanged",
)
def f1_clean_street(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "part").select("p_partkey", _dirty_street_spark().alias("street"))
    return d.select("p_partkey", "street", C.normalize_street(F.col("street")).alias("cleaned"))


# --------------------------------------------------------------------------
# W1-W3: postcode repair
# --------------------------------------------------------------------------

_DIRTY_PC_SQL = """
        (['99206','WA 99206','Spokane, WA 99218','WA','189872421:189872425','99218-1929'])[c_custkey % 6 + 1]
"""
_TIGER_SQL = "CASE WHEN c_custkey % 6 = 4 THEN '99224' ELSE NULL END"
_MERGED_PC = C.MERGED_POSTCODE_RE


def _dirty_pc_spark():
    vals = F.array(*[F.lit(x) for x in ["99206", "WA 99206", "Spokane, WA 99218", "WA", "189872421:189872425", "99218-1929"]])
    return F.element_at(vals, (F.col("c_custkey") % 6 + 1).cast("int"))


@register(
    "w1_clean_postcode",
    f"""
    WITH d AS (SELECT c_custkey, {_DIRTY_PC_SQL} AS pc, {_TIGER_SQL} AS tiger FROM customer)
    SELECT c_custkey, pc,
      CASE WHEN regexp_matches(pc, '^[A-Z][A-Z]$') THEN NULL
           WHEN regexp_matches(pc, '{_sq(_MERGED_PC)}') THEN regexp_extract(pc, '{_sq(_MERGED_PC)}', 3)
           WHEN regexp_matches(pc, '^\\d+:\\d+$') THEN tiger
           ELSE pc END AS postcode,
      CASE WHEN regexp_matches(pc, '^[A-Z][A-Z]$') THEN pc
           WHEN regexp_matches(pc, '{_sq(_MERGED_PC)}')
                AND regexp_extract(pc, '{_sq(_MERGED_PC)}', 2) <> ''
             THEN regexp_extract(pc, '{_sq(_MERGED_PC)}', 2)
           ELSE NULL END AS state
    FROM d
    """,
    doc="W1/W2/W3 postcode repair: merged-string split, bare-state move, "
    "TIGER sidecar lookup; zip+4 kept — readme.md:43-67",
)
def w1_clean_postcode(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "customer").select(
        "c_custkey",
        _dirty_pc_spark().alias("pc"),
        F.when(F.col("c_custkey") % 6 == 4, F.lit("99224")).otherwise(F.lit(None).cast("string")).alias("tiger"),
    )
    return d.select(
        "c_custkey",
        "pc",
        C.clean_postcode(F.col("pc"), F.col("tiger")).alias("postcode"),
        C.state_from_postcode(F.col("pc"), F.lit(None).cast("string")).alias("state"),
    )


# --------------------------------------------------------------------------
# W4-W7: city/state repair
# --------------------------------------------------------------------------

_DIRTY_CITY_SQL = """
        (['spokane', 'Coeur d' || chr(34) || 'Alene', 'Coeur d Alene',
          'Otis Orchards, WA', 'Spokane, Washington', 'post falls'])[c_custkey % 6 + 1]
"""
_DIRTY_STATE_SQL = "(['wa','WA','ID','Washington'])[c_custkey % 4 + 1]"
_MC = C.MERGED_CITY_RE
_COEUR = r"Coeur d[^']Alene"


def _dirty_city_spark():
    vals = F.array(
        F.lit("spokane"),
        F.lit('Coeur d"Alene'),
        F.lit("Coeur d Alene"),
        F.lit("Otis Orchards, WA"),
        F.lit("Spokane, Washington"),
        F.lit("post falls"),
    )
    return F.element_at(vals, (F.col("c_custkey") % 6 + 1).cast("int"))


def _dirty_state_spark():
    vals = F.array(*[F.lit(x) for x in ["wa", "WA", "ID", "Washington"]])
    return F.element_at(vals, (F.col("c_custkey") % 4 + 1).cast("int"))


@register(
    "w4_clean_city_state",
    f"""
    WITH d AS (SELECT c_custkey, {_DIRTY_CITY_SQL} AS city, {_DIRTY_STATE_SQL} AS st FROM customer),
    fixed AS (
      SELECT c_custkey, city, st,
        CASE WHEN regexp_matches(city, '^[a-z ]+$')
               THEN list_aggregate(list_transform(string_split(city, ' '),
                      w -> upper(substr(w, 1, 1)) || substr(w, 2)), 'string_agg', ' ')
             WHEN regexp_matches(city, '{_sq(_MC)}')
               THEN regexp_extract(city, '{_sq(_MC)}', 1)
             ELSE city END AS city1,
        CASE WHEN regexp_matches(city, '{_sq(_MC)}')
                  AND regexp_extract(city, '{_sq(_MC)}', 2) IN ('WA', 'ID')
               THEN regexp_extract(city, '{_sq(_MC)}', 2)
             WHEN regexp_matches(city, '{_sq(_MC)}')
                  AND regexp_extract(city, '{_sq(_MC)}', 2) = 'Washington'
               THEN 'WA'
             ELSE st END AS st1
      FROM d)
    SELECT c_custkey, city, st,
           regexp_replace(city1, '{_sq(_COEUR)}', 'Coeur d''Alene') AS clean_city,
           CASE WHEN regexp_matches(st1, '^[a-z][a-z]$') THEN upper(st1)
                WHEN st1 = 'Washington' THEN 'WA'
                WHEN st1 = 'Idaho' THEN 'ID'
                ELSE st1 END AS clean_state
    FROM fixed
    """,
    doc="W4-W7 city/state repair: case fixes, Coeur d'Alene respellings, "
    "merged 'City, ST' split with state donation — readme.md:78-103",
)
def w4_clean_city_state(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "customer").select(
        "c_custkey", _dirty_city_spark().alias("city"), _dirty_state_spark().alias("st")
    )
    return d.select(
        "c_custkey",
        "city",
        "st",
        C.clean_city(F.col("city")).alias("clean_city"),
        C.clean_state(C.state_from_city(F.col("city"), F.col("st"))).alias("clean_state"),
    )


# --------------------------------------------------------------------------
# F6/F7/F8/G1: casts, array/struct build, GeoJSON swap
# --------------------------------------------------------------------------


@register(
    "f6_cast_geojson",
    f"""
    SELECT c_custkey,
           round({point_lat_sql("c_custkey")}, 6) AS lat,
           round({point_lon_sql("c_custkey")}, 6) AS lon,
           'Point' AS geo_type,
           round({point_lon_sql("c_custkey")}, 6) AS coord_0,
           round({point_lat_sql("c_custkey")}, 6) AS coord_1
    FROM customer WHERE c_custkey % 10 = 0
    """,
    doc="F6 string->double cast + F7 array build + G1 GeoJSON [lon,lat] swap "
    "— ProjectCodeUsed/data.py:124-127; readme.md:372-378 (vectorized, not "
    "the reference's per-doc save loop)",
)
def f6_cast_geojson(spark: SparkSession, sf: str) -> DataFrame:
    # Build string lat/lon (as the XML attribs arrive), cast, build pos
    # array + GeoJSON struct, then flatten for comparison.
    c = load_table(spark, sf, "customer").where(F.col("c_custkey") % 10 == 0)
    lat_s = point_lat_spark("c_custkey").cast("string")
    lon_s = point_lon_spark("c_custkey").cast("string")
    shaped = c.select(
        "c_custkey",
        F.array(lat_s.cast("double"), lon_s.cast("double")).alias("pos"),
    ).select(
        "c_custkey",
        "pos",
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.element_at("pos", 2), F.element_at("pos", 1)).alias("coordinates"),
        ).alias("geojson"),
    )
    return shaped.select(
        "c_custkey",
        F.round(F.element_at("pos", 1), 6).alias("lat"),
        F.round(F.element_at("pos", 2), 6).alias("lon"),
        F.col("geojson.type").alias("geo_type"),
        F.round(F.element_at("geojson.coordinates", 1), 6).alias("coord_0"),
        F.round(F.element_at("geojson.coordinates", 2), 6).alias("coord_1"),
    )


# --------------------------------------------------------------------------
# G3: $near radius query (broadcast centers + haversine + distance sort)
# --------------------------------------------------------------------------

_POINTS_SQL = f"""
      SELECT c_custkey AS point_id,
             {point_lat_sql("c_custkey")} AS lat,
             {point_lon_sql("c_custkey")} AS lon
      FROM customer
"""
_CENTERS = [
    ("Spokane", 47.6588, -117.4260),
    ("Coeur d'Alene", 47.6777, -116.7805),
    ("Post Falls", 47.7180, -116.9516),
]
_CENTERS_SQL = ", ".join(f"('{_sq(n)}', {la}, {lo})" for n, la, lo in _CENTERS)
_RADIUS_KM = 10 * MILES_TO_METERS / 1000.0


def _points_spark(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("point_id"),
        point_lat_spark("c_custkey").alias("lat"),
        point_lon_spark("c_custkey").alias("lon"),
    )


@register(
    "g3_near_radius",
    f"""
    WITH points AS ({_POINTS_SQL}),
    centers AS (SELECT * FROM (VALUES {_CENTERS_SQL}) AS t(name, c_lat, c_lon))
    SELECT name AS center_name, point_id,
           round(2 * {EARTH_RADIUS_KM} * asin(sqrt(
             pow(sin(radians(lat - c_lat) / 2), 2) +
             cos(radians(lat)) * cos(radians(c_lat)) *
             pow(sin(radians(lon - c_lon) / 2), 2)
           )), 3) AS dist_km
    FROM points, centers
    WHERE 2 * {EARTH_RADIUS_KM} * asin(sqrt(
             pow(sin(radians(lat - c_lat) / 2), 2) +
             cos(radians(lat)) * cos(radians(c_lat)) *
             pow(sin(radians(lon - c_lon) / 2), 2)
           )) <= {_RADIUS_KM}
    """,
    bench=True,
    doc="G3 $near + $maxDistance as broadcast join + haversine expression + "
    "bbox prefilter — readme.md:389-398; distance kept for the O3 implicit "
    "distance ordering",
)
def g3_near_radius(spark: SparkSession, sf: str) -> DataFrame:
    points = _points_spark(spark, sf)
    centers = spark.createDataFrame(_CENTERS, "name string, lat double, lon double")
    return near(points, centers, radius_miles=10.0).select("center_name", "point_id", "dist_km")


# --------------------------------------------------------------------------
# G4/G5: box membership + A9 single-pass state counts
# --------------------------------------------------------------------------


@register(
    "g4_box_counts",
    f"""
    WITH points AS ({_POINTS_SQL})
    SELECT CASE WHEN lon < {DIVIDING_LON} THEN 'WA' ELSE 'ID' END AS state,
           count(*) AS cnt
    FROM points GROUP BY 1
    """,
    doc="G4/G5 $geoWithin box counts via pure range predicates, single pass; "
    "WA+ID must sum to the point total (conservation invariant "
    "readme.md:519-522)",
)
def g4_box_counts(spark: SparkSession, sf: str) -> DataFrame:
    points = _points_spark(spark, sf)
    return points.withColumn("state", state_of(F.col("lon"))).groupBy("state").agg(
        F.count("*").alias("cnt")
    )


# Non-rectangular test ring (lon, lat), open form — exercises the general
# ray-cast path the reference described for relation polygons but never
# built (readme.md:488-495). Chosen to straddle the WA/ID divide.
_PENTAGON = [
    (-117.30, 47.60),
    (-117.00, 47.56),
    (-116.80, 47.70),
    (-117.05, 47.85),
    (-117.35, 47.78),
]


def _pip_case_sql(lat: str, lon: str, ring: list[tuple[float, float]]) -> str:
    """Ray-cast point-in-polygon as generated SQL — the IDENTICAL IEEE-754
    operation sequence as functions/geo.py's pandas_udf (including the
    1e-300 guard), so borderline points classify the same on both engines."""
    n = len(ring)
    crossings = []
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        crossings.append(
            f"(CASE WHEN (({y1!r} > {lat}) <> ({y2!r} > {lat})) AND "
            f"{lon} < ({x2!r} - {x1!r}) * ({lat} - {y1!r}) / ({y2!r} - {y1!r} + 1e-300) + {x1!r} "
            f"THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(crossings) + ") % 2 = 1)"


@register(
    "g4_polygon_pip",
    f"""
    WITH points AS ({_POINTS_SQL})
    SELECT count(*) AS inside_cnt
    FROM points WHERE {_pip_case_sql("lat", "lon", _PENTAGON)}
    """,
    doc="G4 general form: ray-casting point-in-polygon for a non-rectangular "
    "ring via the vectorized pandas_udf (functions/geo.py); oracle is the "
    "same crossing arithmetic generated as SQL",
)
def g4_polygon_pip(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.geo import point_in_polygon_udf

    pts = _points_spark(spark, sf)
    pip = point_in_polygon_udf(_PENTAGON)
    return pts.where(pip(F.col("lat"), F.col("lon"))).agg(F.count("*").alias("inside_cnt"))


@register(
    "g3_haversine_pairs",
    f"""
    WITH a AS (SELECT n_nationkey AS id,
                      40.0 + n_nationkey * 0.7 AS lat,
                      -120.0 + n_nationkey * 1.3 AS lon FROM nation)
    SELECT x.id AS id_a, y.id AS id_b,
           round(2 * {EARTH_RADIUS_KM} * asin(sqrt(
             pow(sin(radians(y.lat - x.lat) / 2), 2) +
             cos(radians(x.lat)) * cos(radians(y.lat)) *
             pow(sin(radians(y.lon - x.lon) / 2), 2)
           )), 3) AS dist_km
    FROM a x, a y WHERE x.id < y.id
    """,
    doc="G3 haversine as a pure column expression — all-pairs distance matrix "
    "on a small dim (readme.md:392-393 unit conversion F11 exercised "
    "elsewhere)",
)
def g3_haversine_pairs(spark: SparkSession, sf: str) -> DataFrame:
    n = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("id"),
        (F.lit(40.0) + F.col("n_nationkey") * 0.7).alias("lat"),
        (F.lit(-120.0) + F.col("n_nationkey") * 1.3).alias("lon"),
    )
    a = n.select(F.col("id").alias("id_a"), F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"))
    b = n.select(F.col("id").alias("id_b"), F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")), 3
            ).alias("dist_km"),
        )
    )


# --------------------------------------------------------------------------
# J2: ordered dereference (relation->way->node polygon reconstruction)
# --------------------------------------------------------------------------


@register(
    "j2_ring_reconstruct",
    """
    WITH coords AS (
      SELECT p_partkey,
             CAST(p_partkey % 100 AS VARCHAR) || ' ' ||
             CAST((p_partkey * 3) % 100 AS VARCHAR) AS coord
      FROM part
    )
    SELECT l_orderkey AS way_id,
           string_agg(coord, ';' ORDER BY l_linenumber, coord) AS ring
    FROM lineitem JOIN coords ON l_partkey = p_partkey
    WHERE l_orderkey % 50 = 0
    GROUP BY l_orderkey
    """,
    doc="J2 relation->way->node ordered dereference (described-not-built in "
    "the reference, readme.md:488-495): join refs to coords, regroup "
    "preserving ordinal order",
)
def j2_ring_reconstruct(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    coords = load_table(spark, sf, "part").select(
        "p_partkey",
        F.concat(
            (F.col("p_partkey") % 100).cast("string"),
            F.lit(" "),
            ((F.col("p_partkey") * 3) % 100).cast("string"),
        ).alias("coord"),
    )
    joined = li.join(coords, li.l_partkey == coords.p_partkey)
    return (
        joined.groupBy(F.col("l_orderkey").alias("way_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("l_linenumber", "coord"))),
                    lambda s: s["coord"],
                ),
                ";",
            ).alias("ring")
        )
    )


# --------------------------------------------------------------------------
# G3 extension: big x big radius join via grid cells (no cross product)
# --------------------------------------------------------------------------

_GRID_RADIUS_KM = 5.0
_GRID_CELL_DEG = 0.1


@register(
    "g_spatial_join_grid",
    f"""
    WITH a AS (
      SELECT c_custkey AS id_a,
             {point_lat_sql("c_custkey")} AS lat_a,
             {point_lon_sql("c_custkey")} AS lon_a
      FROM customer
    ),
    b AS (
      SELECT s_suppkey AS id_b,
             {point_lat_sql("(s_suppkey * 13 + 5)")} AS lat_b,
             {point_lon_sql("(s_suppkey * 13 + 5)")} AS lon_b
      FROM supplier
    )
    SELECT id_a, id_b,
           round(2 * {{EARTH}} * asin(sqrt(
             pow(sin(radians(lat_b - lat_a) / 2), 2) +
             cos(radians(lat_a)) * cos(radians(lat_b)) *
             pow(sin(radians(lon_b - lon_a) / 2), 2)
           )), 3) AS dist_km
    FROM a, b
    WHERE 2 * {{EARTH}} * asin(sqrt(
             pow(sin(radians(lat_b - lat_a) / 2), 2) +
             cos(radians(lat_a)) * cos(radians(lat_b)) *
             pow(sin(radians(lon_b - lon_a) / 2), 2)
           )) <= {_GRID_RADIUS_KM}
    """.replace("{EARTH}", str(EARTH_RADIUS_KM)),
    doc="G3 big x big form: radius join between two data-sized point sets "
    "via integer grid cells (operators/geo_queries.py:grid_spatial_join) — "
    "9-cell neighborhood equi-join + exact haversine refine, never a cross "
    "product (the oracle IS the brute-force cross join, pinning semantic "
    "equivalence); cell/radius coverage guard asserted in the operator",
)
def g_spatial_join_grid(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.geo_queries import grid_spatial_join

    a = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id_a"),
        point_lat_spark("c_custkey").alias("lat"),
        point_lon_spark("c_custkey").alias("lon"),
    )
    b = (
        load_table(spark, sf, "supplier")
        .withColumn("k", F.col("s_suppkey") * 13 + 5)
        .select(
            F.col("s_suppkey").alias("id_b"),
            point_lat_spark("k").alias("lat"),
            point_lon_spark("k").alias("lon"),
        )
    )
    return grid_spatial_join(a, b, radius_km=_GRID_RADIUS_KM, cell_deg=_GRID_CELL_DEG)


@register(
    "g_knn_join",
    f"""
    WITH a AS (
      SELECT c_custkey AS id_a,
             {point_lat_sql("c_custkey")} AS lat_a,
             {point_lon_sql("c_custkey")} AS lon_a
      FROM customer
    ),
    b AS (
      SELECT s_suppkey AS id_b,
             {point_lat_sql("(s_suppkey * 13 + 5)")} AS lat_b,
             {point_lon_sql("(s_suppkey * 13 + 5)")} AS lon_b
      FROM supplier
    ),
    d AS (
      SELECT id_a, id_b,
             2 * {EARTH_RADIUS_KM} * asin(sqrt(
               pow(sin(radians(lat_b - lat_a) / 2), 2) +
               cos(radians(lat_a)) * cos(radians(lat_b)) *
               pow(sin(radians(lon_b - lon_a) / 2), 2)
             )) AS dist
      FROM a, b
    )
    SELECT id_a, id_b, round(dist, 3) AS dist_km, rk FROM (
      SELECT id_a, id_b, dist,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY dist ASC, id_b ASC) AS rk
      FROM d)
    WHERE rk <= 3
    """,
    doc="kNN JOIN between two data-sized point sets (every customer "
    "point's 3 nearest supplier points): grid-cell candidates + per-point "
    "top-k with EXACT ring escalation "
    "(operators/geo_queries.py:grid_knn_join) — a point's 3x3 answer is "
    "final only when its kth distance beats the exact ring guarantee; "
    "sparse stragglers alone pay the 5x5 re-join, gated by one driver "
    "scalar, and an unsatisfiable point raises loudly. The oracle is the "
    "brute per-point ranked cross join (semantic pin); the Spark side "
    "never plans a product. The kNN sibling of g_spatial_join_grid's "
    "fixed-radius form",
)
def g_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.geo_queries import grid_knn_join

    a = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id_a"),
        point_lat_spark("c_custkey").alias("lat"),
        point_lon_spark("c_custkey").alias("lon"),
    )
    b = (
        load_table(spark, sf, "supplier")
        .withColumn("k", F.col("s_suppkey") * 13 + 5)
        .select(
            F.col("s_suppkey").alias("id_b"),
            point_lat_spark("k").alias("lat"),
            point_lon_spark("k").alias("lon"),
        )
    )
    return grid_knn_join(a, b, k=3, cell_deg=0.1)
