"""S1/S2: OSM XML scan via Spark 4's native XML source.

Reference form: a single-threaded ``xml.etree.ElementTree.iterparse`` pull
loop (ProjectCodeUsed/data.py:193, Lesson6Quizes/mapparser.py:17-20) —
streaming in the bounded-memory sense only.

Spark form: ``spark.read.format("xml").option("rowTag", ...)`` — the source
splits the file and parses per-partition on executors; the reference's
hidden "one big loop" becomes embarrassingly parallel (SURVEY §3.1).
Attributes surface as ``_attr`` columns, child elements as arrays.

Scale notes: one pass per rowTag. OSM planet files are single huge XML
documents; the native source handles splits by scanning for rowTag
boundaries, so a 100 TB ingest parallelizes without a custom reader.
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

    Counts every element tag (including nested ``tag``/``nd``/``member``)
    by reading each top-level kind once and summing child cardinalities.
    Output: (tag string, cnt long).
    """
    parts = []
    for t in ("node", "way", "relation", "bounds"):
        try:
            df = read_elements(spark, path, t)
        except Exception:
            continue
        n = df.count()
        if n == 0:
            continue
        parts.append((t, n))
        for child in ("tag", "nd", "member"):
            arr = child_array(df, child)
            if arr is not None:
                c = df.select(F.explode_outer(arr).alias("c")).where(F.col("c").isNotNull()).count()
                if c:
                    parts.append((child, c))
    agg: dict[str, int] = {}
    for tag, n in parts:
        agg[tag] = agg.get(tag, 0) + n
    agg["osm"] = 1
    return spark.createDataFrame(sorted(agg.items()), "tag string, cnt long")


def read_shaped(spark: SparkSession, path: str, fix_streets: bool = True) -> DataFrame:
    """S1+P6: full shaped ``osm`` table (nodes + ways unioned), the Spark
    equivalent of ``process_map`` (ProjectCodeUsed/data.py:188-201)."""
    nodes = shape_elements(read_elements(spark, path, "node"), "node", fix_streets)
    ways = shape_elements(read_elements(spark, path, "way"), "way", fix_streets)
    return nodes.unionByName(ways)
