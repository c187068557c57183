"""S1/S2: OSM XML scan via Spark 4's native XML source.

Reference form: a single-threaded ``xml.etree.ElementTree.iterparse`` pull
loop (ProjectCodeUsed/data.py:193, Lesson6Quizes/mapparser.py:17-20) —
streaming in the bounded-memory sense only.

Spark form: ``spark.read.format("xml").option("rowTag", ...)`` — the source
splits the file and parses per-partition on executors; the reference's
hidden "one big loop" becomes embarrassingly parallel (SURVEY §3.1).
Attributes surface as ``_attr`` columns, child elements as arrays.

Scale notes: one pass per rowTag. The native source parallelizes across
FILES but is NOT splittable within a file (one file = one task,
whatever maxPartitionBytes says — measured at 468 MB/1 partition in
BENCH_sf1_local.json r11_osm_scale). OSM planet files are single huge
XML documents, so the planet-scale ingest path is
``sources/osm_split.py:read_shaped_split`` — byte-range planning plus a
boundary-scanning extractor (the Hadoop XmlInputFormat contract) with
JVM-side ``from_xml`` parsing; identical output, N parallel tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..operators.reshape import shape_elements

OSM_ELEMENT_TAGS = ("node", "way", "relation", "bounds", "osm")


def read_elements(spark: SparkSession, path: str, row_tag: str) -> DataFrame:
    """Raw element scan for one element kind (S2: element-filtered scan).

    ``inferSchema=false``: every attribute stays a raw string, matching the
    reference's semantics (XML attribs are strings; ``created.timestamp``
    keeps its ISO form instead of being re-rendered through TimestampType).
    Typed columns (lat/lon doubles) are produced by the reshape, explicitly.
    """
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("attributePrefix", "_")
        .option("inferSchema", "false")
        .load(path)
    )


def child_array(df: DataFrame, name: str) -> Column | None:
    """Child-element column normalized to an array.

    The XML source infers a bare STRUCT when every row has at most one
    ``name`` child (e.g. a relation with a single ``tag``); downstream code
    always wants array-of-struct.
    """
    if name not in df.columns:
        return None
    col = F.col(name)
    if isinstance(df.schema[name].dataType, ArrayType):
        return col
    return F.when(col.isNotNull(), F.array(col)).otherwise(F.lit(None))


def count_tags(spark: SparkSession, path: str) -> DataFrame:
    """A5: tag-frequency count over the raw XML (mapparser.py:16-21).

    ONE pass: a text-mode tag census. ``spark.read.text`` splits the file
    by line across executors (one FileScan — the pre-round-6 form ran one
    full XML scan per rowTag kind, 4 reads of the corpus at planet scale),
    then ``regexp_extract_all`` pulls every element-START name and one
    partial-agg'd groupBy counts them. This is exactly the reference's
    iterparse start-event census: every ``<name`` opening, whatever the
    element kind — including kinds the per-rowTag form had to enumerate.

    The regex requires the char after ``<`` to be a name-start letter, so
    ``</closing``, ``<?xml``, and ``<!DOCTYPE/<!--`` never match. Known
    limit, documented: an element-like token INSIDE a comment or CDATA
    block would be counted (iterparse would not); OSM exports contain
    neither, and value parity with the reference's own goldens is pinned
    by test_count_tags_golden.

    Output: (tag string, cnt long), sorted by tag.
    """
    lines = spark.read.text(path)
    tags = lines.select(
        F.explode(
            F.expr(r"regexp_extract_all(value, '<([A-Za-z_][A-Za-z0-9_.:-]*)', 1)")
        ).alias("tag")
    )
    return tags.groupBy("tag").agg(F.count("*").alias("cnt")).orderBy("tag")


def relation_members(spark: SparkSession, path: str) -> DataFrame:
    """Ordered relation members from the raw XML (readme.md:488-495: the
    reference DESCRIBES but never builds relation parsing — 'the order would
    need to be maintained').

    Output: (relation_id, m_idx, m_type, m_ref, m_role) — ``m_idx`` is the
    member's document position (``posexplode``), the ordering a plain dict
    could not represent in the reference's sketch.
    """
    rel = read_elements(spark, path, "relation")
    arr = child_array(rel, "member")
    if arr is None:
        return spark.createDataFrame(
            [], "relation_id string, m_idx int, m_type string, m_ref string, m_role string"
        )
    return rel.select(
        F.col("_id").alias("relation_id"), F.posexplode(arr).alias("m_idx", "m")
    ).select(
        "relation_id",
        "m_idx",
        F.col("m._type").alias("m_type"),
        F.col("m._ref").alias("m_ref"),
        F.col("m._role").alias("m_role"),
    )


def way_node_refs(spark: SparkSession, path: str) -> DataFrame:
    """Ordered way->node references (F9 order preserved): one row per
    ``nd`` child, ``nd_idx`` = document position."""
    ways = read_elements(spark, path, "way")
    arr = child_array(ways, "nd")
    if arr is None:
        return spark.createDataFrame([], "way_id string, nd_idx int, node_ref string")
    return ways.select(
        F.col("_id").alias("way_id"), F.posexplode(arr).alias("nd_idx", "nd")
    ).select("way_id", "nd_idx", F.col("nd._ref").alias("node_ref"))


def read_shaped(spark: SparkSession, path: str, fix_streets: bool = True) -> DataFrame:
    """S1+P6: full shaped ``osm`` table (nodes + ways unioned), the Spark
    equivalent of ``process_map`` (ProjectCodeUsed/data.py:188-201)."""
    nodes = shape_elements(read_elements(spark, path, "node"), "node", fix_streets)
    ways = shape_elements(read_elements(spark, path, "way"), "way", fix_streets)
    return nodes.unionByName(ways)
