"""Geospatial column-expression library (SURVEY.md §2.9 G1-G5).

The reference relied on MongoDB's 2dsphere index for ``$near`` and
``$geoWithin`` (reference readme.md:381-398, 500-539). Vanilla Spark has no
spatial index, so the scale strategy is:

1. Haversine distance as a *native column expression* (trig built-ins, no
   UDF) — stays in whole-stage codegen.
2. A conjunctive lat/lon bounding-box pre-filter emitted in front of the
   exact distance predicate. On a geo-sorted/partitioned table the bbox
   predicate prunes parquet row groups via min/max stats — the same access-
   path win the 2dsphere index provided (SURVEY.md §4.2).
3. General point-in-polygon as a vectorized pandas_udf (ray casting) — the
   one place expressions can't reach; the reference's actual polygons are
   axis-aligned boxes which route through pure range predicates instead
   (reference readme.md:500-517).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

EARTH_RADIUS_KM = 6371.0
MILES_TO_METERS = 1609.344  # F11, reference readme.md:392-393
# Box-bound epsilon the reference needed to absorb precision loss
# (G5, reference readme.md:500-505).
BBOX_EPSILON = 2e-3
# WA/ID dividing longitude (reference readme.md:500).
DIVIDING_LON = -117.039971


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """G3: great-circle distance in km as a pure column expression."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def bbox_prefilter(lat: Column, lon: Column, center_lat: Column, center_lon: Column, radius_km: float) -> Column:
    """Conservative bounding-box predicate implied by ``dist <= radius_km``.

    1 deg latitude ~ 111.32 km; longitude shrinks by cos(lat). The lon
    half-width is computed PER CENTER from the worst (smallest) cos over
    the center's latitude band — |center_lat| + dlat — so the box stays
    strictly conservative at ANY latitude (review r9: the earlier fixed
    cos(60°) divisor silently dropped in-radius points for centers above
    60°; grid_spatial_join raises for the analogous violation, and a
    prefilter must never be the thing that loses rows). Near the poles
    cos → 0 and the clamped divisor widens the box toward all longitudes —
    still correct, the exact haversine refines. With literal centers the
    predicate folds to constants and reaches parquet min/max pruning,
    playing the role of the reference's 2dsphere index
    (readme.md:381-384); with column centers (the broadcast-join shape)
    it filters pairs before the haversine.
    """
    # 110.5 km/deg is BELOW the minimum true km-per-degree-latitude
    # (110.57 at the equator), so dlat is strictly conservative; the lon
    # divisor uses the band's minimum cos with the same margin.
    dlat = radius_km / 110.5
    min_cos = F.greatest(
        F.cos(F.radians(F.abs(center_lat) + F.lit(dlat))), F.lit(1e-6)
    )
    dlon = F.lit(radius_km / 110.5) / min_cos
    # Antimeridian: when the lon interval sticks out past ±180 the box
    # wraps, and a plain range test would drop in-radius points on the far
    # side (advice r9). Widen to ALL longitudes in that case — still
    # strictly conservative, the exact haversine refines; for literal
    # centers away from ±180 the wrap term folds to false and the range
    # predicate still reaches parquet min/max pruning.
    lon_wraps = (center_lon + dlon > 180.0) | (center_lon - dlon < -180.0)
    return (
        (lat >= center_lat - dlat)
        & (lat <= center_lat + dlat)
        & (
            lon_wraps
            | ((lon >= center_lon - dlon) & (lon <= center_lon + dlon))
        )
    )


def in_box(lat: Column, lon: Column, lat_min: float, lat_max: float, lon_min: float, lon_max: float, eps: float = BBOX_EPSILON) -> Column:
    """G4/G5: axis-aligned box membership with the reference's epsilon
    semantics (bounds extended by 2e-3, readme.md:500-505)."""
    return (
        (lat >= lat_min - eps)
        & (lat <= lat_max + eps)
        & (lon >= lon_min - eps)
        & (lon <= lon_max + eps)
    )


def geojson_point(lat: Column, lon: Column) -> Column:
    """G1: GeoJSON Point struct — note the [lon, lat] element order swap
    (reference readme.md:375-377)."""
    return F.struct(
        F.lit("Point").alias("type"),
        F.array(lon, lat).alias("coordinates"),
    )


def zorder_key_sql(lat_col: str, lon_col: str, bits: int = 16) -> str:
    """G2 replacement, part 1: Morton/Z-order cell id — quantize lat/lon to
    ``bits`` bits each and interleave them, as a single generated SQL
    expression (codegen'd; no UDF).

    Nearby points share key prefixes, so sorting by this key localizes both
    dimensions at once — parquet min/max stats per row group then prune
    lat/lon range predicates, which is the access-path role MongoDB's
    2dsphere index played (reference readme.md:381-384).
    """
    scale = (1 << bits) - 1
    qlat = f"cast((({lat_col} + 90.0) / 180.0) * {scale} as bigint)"
    qlon = f"cast((({lon_col} + 180.0) / 360.0) * {scale} as bigint)"
    terms = " + ".join(
        f"(shiftleft(shiftright({qlat}, {i}) & 1, {2 * i + 1}) + "
        f"shiftleft(shiftright({qlon}, {i}) & 1, {2 * i}))"
        for i in range(bits)
    )
    return f"({terms})"


def write_geo_layout(df, path: str, lat_col: str = "lat", lon_col: str = "lon", bits: int = 16, num_files: int = 8) -> None:
    """G2 replacement, part 2: range-partition by the z-order key and sort
    within partitions before writing, so each parquet file covers a compact
    spatial cell (tight lat/lon min/max stats -> row-group pruning).

    At 100 TB this is a one-time layout cost that every subsequent radius /
    box query amortizes — the same trade as building a spatial index.

    Delegates to the generic multi-column writer (sources/layout.py) with
    the fixed geographic ranges — ONE repartition/sort/write implementation
    and ONE bit-interleave generator to maintain; ``zorder_key_sql`` above
    remains the standalone lat/lon key EXPRESSION (used directly by
    queries/tests that need the key without writing).
    """
    from ..sources.layout import write_zorder_layout

    write_zorder_layout(
        df,
        path,
        [lat_col, lon_col],
        bits=bits,
        num_files=num_files,
        ranges=[(lat_col, -90.0, 90.0), (lon_col, -180.0, 180.0)],
    )


def point_in_polygon_udf(polygon: list[tuple[float, float]]):
    """G4 general form: ray-casting point-in-polygon as a vectorized
    pandas_udf over (lat, lon) Series. ``polygon`` is a closed or open ring
    of (lon, lat) pairs — GeoJSON axis order (reference references.txt cites
    the GeoJSON spec).

    Scale notes: the polygon is captured in the closure (broadcast with the
    task), the test is O(vertices) per point, Arrow-batched. For the
    reference's actual WA/ID boxes prefer :func:`in_box` (codegen, prunable).
    """
    ring = list(polygon)
    if ring and ring[0] == ring[-1]:
        ring = ring[:-1]

    @F.pandas_udf(BooleanType())
    def _pip(lat: pd.Series, lon: pd.Series) -> pd.Series:
        import numpy as np

        x = lon.to_numpy(dtype="float64")
        y = lat.to_numpy(dtype="float64")
        inside = np.zeros(len(x), dtype=bool)
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            crosses = ((y1 > y) != (y2 > y)) & (
                x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-300) + x1
            )
            inside ^= crosses
        return pd.Series(inside)

    return _pip
