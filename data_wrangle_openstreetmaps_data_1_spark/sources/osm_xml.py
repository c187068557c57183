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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.reshape import shape_elements

OSM_ELEMENT_TAGS = ("node", "way", "relation", "bounds", "osm")


def read_elements(spark: SparkSession, path: str, row_tag: str) -> DataFrame:
    """Raw element scan for one element kind (S2: element-filtered scan)."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("attributePrefix", "_")
        .load(path)
    )


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
            if child in df.columns:
                c = df.select(F.explode_outer(child).alias("c")).where(F.col("c").isNotNull()).count()
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
