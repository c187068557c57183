"""Geospatial query operators (SURVEY.md §2.9, §2.3 J1/J2).

- ``near``: the reference's ``$near`` + ``$maxDistance`` (readme.md:389-398)
  generalized to many centers: broadcast-join the (tiny) centers table
  against the big points table, bbox pre-filter (sargable, prunes parquet
  row groups) then exact haversine, distance-sorted (O3: ``$near`` results
  are implicitly distance-ordered — made explicit here).
- ``box_counts``: the WA/ID ``$geoWithin`` polygon counts (readme.md:500-539)
  as ONE single-pass groupBy instead of the reference's per-(group, box)
  re-scan loop (A9 rewrite, SURVEY §2.4).
- ``reconstruct_rings``: the relation->way->node polygon reconstruction the
  reference describes but never built (readme.md:488-495, J2) — order-
  preserving dereference joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geo import DIVIDING_LON, MILES_TO_METERS, bbox_prefilter, haversine_km


def near(points: DataFrame, centers: DataFrame, lat_col: str = "lat", lon_col: str = "lon", radius_miles: float = 10.0) -> DataFrame:
    """All (center, point) pairs within ``radius_miles``, with distance.

    ``centers`` needs columns ``name``/``lat``/``lon`` and must be small
    (broadcast). Output adds ``center_name`` + ``dist_km`` (rounded 3);
    callers sort by distance to preserve the reference's ``$near`` ordering.
    """
    radius_km = radius_miles * MILES_TO_METERS / 1000.0
    c = F.broadcast(
        centers.select(
            F.col("name").alias("center_name"),
            F.col("lat").alias("c_lat"),
            F.col("lon").alias("c_lon"),
        )
    )
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"))
    bbox = bbox_prefilter(
        F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), radius_km
    )
    return (
        points.crossJoin(c)
        .where(bbox)
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= radius_km)
        .withColumn("dist_km", F.round("dist_km", 3))
        .drop("c_lat", "c_lon")
    )


def state_of(lon: Column, dividing_lon: float = DIVIDING_LON) -> Column:
    """WA west of the dividing longitude, ID east (readme.md:500)."""
    return F.when(lon < dividing_lon, F.lit("WA")).otherwise(F.lit("ID"))


def box_counts(points: DataFrame, lon_col: str = "lon", group_col: str | None = None) -> DataFrame:
    """Single-pass per-state (x optional group) counts — replaces the
    reference's O(groups x boxes) re-scan loop (readme.md:532-539)."""
    with_state = points.withColumn("state", state_of(F.col(lon_col)))
    keys = ["state"] + ([group_col] if group_col else [])
    return with_state.groupBy(*keys).agg(F.count("*").alias("cnt"))


def reconstruct_rings(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J2: dereference each way's ordered ``node_refs`` into an ordered
    coordinate ring (readme.md:488-495 — described, never implemented).

    ``ways``: (id, node_refs array<string>); ``nodes``: (id, lat, lon).
    ``posexplode`` keeps the ordinal so the join can restore order — the
    exact concern the reference flags ("order maintained").

    Scale notes: two shuffles (join on node id, regroup by way id) — both
    equi-hash; sort_merge at scale; no driver materialization.
    """
    edges = ways.select(F.col("id").alias("way_id"), F.posexplode("node_refs").alias("ord", "node_id"))
    joined = edges.join(
        nodes.select(F.col("id").alias("node_id"), "lat", "lon"), "node_id", "left"
    )
    return (
        joined.groupBy("way_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "lon", "lat"))),
                lambda s: F.array(s["lon"], s["lat"]),
            ).alias("ring")
        )
    )
