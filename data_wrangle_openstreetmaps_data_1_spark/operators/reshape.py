"""P6: the reference's ``shape_element`` as a single declarative ``select``
(reference ProjectCodeUsed/data.py:120-185) — no UDF.

Input: raw element rows from the XML source (see ``sources/osm_xml.py``),
with attribute columns (``_id``, ``_lat``, ...), ``nd`` child array and
``tag`` child array (structs with ``_k``/``_v``).

Output (the ``osm`` table, FIXTURES.md §2):

    id string, type string, visible string,
    lat double, lon double,
    created struct<version,changeset,timestamp,user,uid>,
    address struct<housenumber,street,postcode,city,state>,
    node_refs array<string>,
    amenity/name/place/population/natural string  (promoted hot tags),
    tags map<string,string>                        (open tail)

Semantics ported 1:1:
- only ``node``/``way`` elements survive (data.py:173,184-185)
- lat/lon -> doubles (data.py:124-127); reference keeps them in a ``pos``
  array, we store scalar columns for parquet stats/pruning (SURVEY §1.2)
- CREATED attribs -> ``created`` struct (data.py:93,129-135)
- ``addr:*`` tag keys: problem-char keys and two-colon keys dropped
  (data.py:159-162); ``addr:street`` values repaired with the street mapping
  (data.py:163-165)
- non-addr tags become the open tail; hot keys promoted to real columns
- ``nd`` children -> ordered ``node_refs`` (data.py:141-143)

Scale notes: pure projection/filter — fuses into the XML scan under
whole-stage codegen, embarrassingly parallel per input split. The reference
held the whole shaped dataset in a Python list (data.py:191-196); here
nothing materializes outside executor batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..functions.cleaning import LOWER_COLON_RE, PROBLEMCHARS_RE, normalize_street

PROMOTED_TAGS = ("amenity", "name", "place", "population", "natural")
ADDRESS_FIELDS = ("housenumber", "street", "postcode", "city", "state")
CREATED_FIELDS = ("version", "changeset", "timestamp", "user", "uid")


def _tag_entries(tag_array: Column) -> Column:
    """Normalize the XML source's tag child array to struct<k,v> entries."""
    return F.coalesce(
        F.transform(tag_array, lambda t: F.struct(t["_k"].alias("k"), t["_v"].alias("v"))),
        F.array().cast("array<struct<k:string,v:string>>"),
    )


def shape_elements(raw: DataFrame, element_type: str, fix_streets: bool = True) -> DataFrame:
    """Shape raw ``node`` or ``way`` element rows into the ``osm`` schema.

    ``element_type`` is "node" or "way" (the XML source reads one rowTag per
    pass, mirroring S2's element-filtered scan).
    """
    cols = set(raw.columns)

    def attr(name: str) -> Column:
        return F.col(name) if name in cols else F.lit(None).cast("string")

    def child(name: str) -> Column | None:
        # XML source infers a bare STRUCT when no row has >1 child of this
        # kind; normalize to array-of-struct.
        if name not in cols:
            return None
        c = F.col(name)
        if isinstance(raw.schema[name].dataType, ArrayType):
            return c
        return F.when(c.isNotNull(), F.array(c)).otherwise(F.lit(None))

    tag_arr = child("tag")
    entries = (
        _tag_entries(tag_arr) if tag_arr is not None else F.array().cast("array<struct<k:string,v:string>>")
    )

    # addr:* subkeys, with the reference's drop rules (data.py:159-162):
    # problem chars in the subkey, or a second colon -> ignored.
    addr = F.filter(
        entries,
        lambda t: t["k"].startswith("addr:")
        & ~F.substring(t["k"], 6, 1000).rlike(PROBLEMCHARS_RE)
        & ~F.substring(t["k"], 6, 1000).rlike(LOWER_COLON_RE),
    )
    addr_map = F.map_from_entries(
        F.transform(addr, lambda t: F.struct(F.substring(t["k"], 6, 1000).alias("k"), t["v"].alias("v")))
    )

    def addr_field(name: str) -> Column:
        v = F.element_at(addr_map, name)
        if name == "street" and fix_streets:
            v = normalize_street(v)  # data.py:163-165: fix applied in-flight
        return v.alias(name)

    # Open tail: every non-addr tag (two-colon non-addr keys are kept,
    # per data.py docstring "you can process it same as any other tag").
    other = F.filter(entries, lambda t: ~t["k"].startswith("addr:"))
    tags_map = F.map_from_entries(other)

    def promoted(name: str) -> Column:
        return F.element_at(tags_map, name).alias(name)

    nd_arr = child("nd")
    node_refs = (
        F.transform(nd_arr, lambda x: x["_ref"].cast("string")).alias("node_refs")
        if nd_arr is not None
        else F.lit(None).cast("array<string>").alias("node_refs")
    )

    return raw.select(
        attr("_id").cast("string").alias("id"),
        F.lit(element_type).alias("type"),
        attr("_visible").cast("string").alias("visible"),
        attr("_lat").cast("double").alias("lat"),
        attr("_lon").cast("double").alias("lon"),
        F.struct(
            attr("_version").cast("string").alias("version"),
            attr("_changeset").cast("string").alias("changeset"),
            attr("_timestamp").cast("string").alias("timestamp"),
            attr("_user").cast("string").alias("user"),
            attr("_uid").cast("string").alias("uid"),
        ).alias("created"),
        F.struct(*[addr_field(f) for f in ADDRESS_FIELDS]).alias("address"),
        node_refs,
        *[promoted(t) for t in PROMOTED_TAGS],
        F.map_filter(
            tags_map, lambda k, _: ~k.isin(*[F.lit(t) for t in PROMOTED_TAGS])
        ).alias("tags"),
    )
