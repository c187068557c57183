"""Consolidated cleaning pass: the reference's eight MongoDB update rounds
(W1-W8, reference readme.md:43-103, 372-378) as ONE idempotent ``select``.

The reference issued per-document find/save round-trips (called out as
"quite slow" at readme.md:374); this runs as a single distributed projection
— zero shuffles, fuses with the scan.

Update ordering preserved (SURVEY.md §7 "what's hard" (b)):
postcode-derived state moves (W1/W2) happen before state case-fixing (W4),
and city-derived state (W7) only fills when the postcode didn't already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cleaning as C
from ..functions.geo import geojson_point


def clean_osm(df: DataFrame) -> DataFrame:
    """Apply W1-W8 to a shaped ``osm`` DataFrame (FIXTURES.md §2 schema).

    - address.postcode: merged-string split (W1), bare-state move (W2),
      TIGER range fix via the ``tiger:zip_right`` sidecar tag (W3,
      generalized from the reference's hardcoded id update readme.md:61-64)
    - address.state: donated from postcode/city + case fixes (W2/W4/W7)
    - address.city: case fix, Coeur d'Alene respellings, merged-city split
      (W5/W6/W7)
    - pos: GeoJSON point struct derived from lat/lon (W8/G1) as a new
      ``pos_geojson`` column (original columns kept — immutably derived,
      not mutated like the reference's in-place rewrite readme.md:375-377)
    """
    postcode = F.col("address.postcode")
    state = F.col("address.state")
    city = F.col("address.city")
    tiger = F.element_at(F.col("tags"), "tiger:zip_right")

    state_after_postcode = C.state_from_postcode(postcode, state)  # W1+W2
    city_after_postcode = C.city_from_postcode(postcode, city)  # W1 (city part)
    new_city = C.clean_city(city_after_postcode)  # W5+W6+W7 (city part)
    state_after_city = C.state_from_city(city_after_postcode, state_after_postcode)  # W7 (state part)
    new_state = C.clean_state(state_after_city)  # W4 last: case/name normalize
    new_postcode = C.clean_postcode(postcode, tiger)  # W1+W2+W3

    new_address = F.struct(
        F.col("address.housenumber").alias("housenumber"),
        C.normalize_street(F.col("address.street")).alias("street"),
        new_postcode.alias("postcode"),
        new_city.alias("city"),
        new_state.alias("state"),
    )
    out = df.withColumn("address", new_address)
    if "lat" in df.columns and "lon" in df.columns:
        out = out.withColumn("pos_geojson", geojson_point(F.col("lat"), F.col("lon")))
    return out
