"""End-to-end OSM pipeline: the whole reference workflow as one call.

Reference workflow (readme.md:1-10): XML -> shape_element ETL -> JSONL ->
mongoimport -> per-query aggregation pipelines + update rounds. Here:
XML -> declarative reshape -> consolidated clean -> partitioned parquet
store -> the notebook's query battery as DataFrames. A user of the
reference runs ``run_osm_pipeline`` and gets every readme result.

Scale notes: the ETL+clean is one fused scan->project (no shuffles); the
store is partitioned by the node/way discriminator; each battery query is
a pushdown-friendly plan over the columnar store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.geo import BBOX_EPSILON, DIVIDING_LON, point_in_polygon_udf
from .operators.clean import clean_osm
from .operators.rings import reconstruct_rings
from .sources.jsonl import write_table
from .sources.osm_xml import read_elements, read_shaped, relation_members, way_node_refs

# Reference map-area bounds (readme.md:500-505).
BBOX = {"lat_min": 47.5580, "lat_max": 47.8878, "lon_min": -117.5523, "lon_max": -116.6212}


def ingest_osm(
    spark: SparkSession, xml_path: str, out_dir: str, split_chunk_mb: int | None = None
) -> DataFrame:
    """ETL + clean + store; returns the queryable osm table.

    Scan-path selection is DATA-DRIVEN by default (``split_chunk_mb=None``):
    a single document bigger than ~2x ``spark.sql.files.maxPartitionBytes``
    ingests through the splittable byte-range reader
    (sources/osm_split.py — the planet-scale path: the native XML source
    reads one file as ONE task however big it is, the split reader
    parallelizes within the document, 8.2x measured at a 468 MB input,
    BENCH_sf1_local.json r11_osm_scale); a directory of files or a small
    single file uses the native source. Explicit overrides: a positive
    ``split_chunk_mb`` forces the split reader with that byte-range size,
    ``split_chunk_mb=0`` forces the native reader. Output is
    value-identical on every path (tests/test_osm_split.py)."""
    from .sources.osm_split import auto_split_chunk_mb, read_shaped_split

    if split_chunk_mb is None:
        split_chunk_mb = auto_split_chunk_mb(spark, xml_path)
    if split_chunk_mb:
        shaped = read_shaped_split(spark, xml_path, chunk_mb=split_chunk_mb)
    else:
        shaped = read_shaped(spark, xml_path)
    cleaned = clean_osm(shaped)
    write_table(cleaned, out_dir, partition_by=["type"])
    return spark.read.parquet(out_dir)


def query_battery(osm: DataFrame) -> dict[str, DataFrame]:
    """The readme notebook's query set (readme.md:121-561), one DataFrame per
    result. Keys cite the reference section."""
    created_user = F.col("created.user")
    # State boxes, reference geometry (readme.md:503-517): the 2e-3 epsilon
    # absorbs precision loss on the OUTER bbox bounds only; the two boxes
    # share one EXACT edge at dividing_long (WA edge-inclusive, ID exclusive)
    # — that shared edge is what makes the conservation invariant
    # wa + id == total hold. Extending both boxes by eps at the divide would
    # double-count every node in the ~4e-3-degree band around it.
    eps = BBOX_EPSILON
    lat_ok = (F.col("lat") >= BBOX["lat_min"] - eps) & (F.col("lat") <= BBOX["lat_max"] + eps)
    wa_box = lat_ok & (F.col("lon") >= BBOX["lon_min"] - eps) & (F.col("lon") <= DIVIDING_LON)
    id_box = lat_ok & (F.col("lon") > DIVIDING_LON) & (F.col("lon") <= BBOX["lon_max"] + eps)
    nodes = osm.where(F.col("type") == "node")

    return {
        # readme.md:144-146
        "counts": osm.groupBy("type").count(),
        "distinct_users": osm.select(created_user.alias("user")).distinct().agg(F.count("*").alias("users")),
        # readme.md:161-171
        "top_users": (
            osm.groupBy(created_user.alias("user"))
            .agg(F.count("*").alias("contributions"))
            .orderBy(F.desc("contributions"), F.asc("user"))
            .limit(10)
        ),
        # readme.md:178-192
        "contribution_stats": (
            osm.groupBy(created_user.alias("user"))
            .agg(F.count("*").alias("contributions"))
            .agg(
                F.count("*").alias("cnt"),
                F.round(F.avg("contributions"), 2).alias("mean"),
                F.min("contributions").alias("min"),
                F.max("contributions").alias("max"),
            )
        ),
        # readme.md:198-237
        "cities": (
            osm.where(F.col("place") == "city")
            .select(F.col("name").alias("Name"), F.col("population").alias("Population"))
        ),
        # readme.md:246-364
        "top_amenities": (
            osm.where(F.col("amenity").isNotNull())
            .groupBy("amenity")
            .count()
            .orderBy(F.desc("count"), F.asc("amenity"))
            .limit(20)
        ),
        # readme.md:500-522 (incl. the conservation invariant inputs)
        "state_boxes": nodes.select(
            F.sum(wa_box.cast("long")).alias("wa_nodes"),
            F.sum(id_box.cast("long")).alias("id_nodes"),
            F.count("*").alias("all_nodes"),
        ),
        # readme.md:528-561 — A9 as a single pass
        "naturals_by_state": (
            nodes.where(F.col("natural").isNotNull())
            # same edge ownership as the state boxes: the divide belongs to WA
            .withColumn("state", F.when(F.col("lon") <= DIVIDING_LON, "WA").otherwise("ID"))
            .groupBy("natural", "state")
            .count()
        ),
    }


def run_osm_pipeline(spark: SparkSession, xml_path: str, out_dir: str) -> dict[str, DataFrame]:
    return query_battery(ingest_osm(spark, xml_path, out_dir))


def relation_polygons(spark: SparkSession, xml_path: str, role: str = "outer") -> DataFrame:
    """readme.md:488-495 built for real: one GeoJSON-order ring per relation,
    reconstructed from the raw XML via the ordered relation->way->node
    dereference (operators/rings.py)."""
    nodes = read_elements(spark, xml_path, "node").select(
        F.col("_id").alias("node_id"),
        F.col("_lat").cast("double").alias("lat"),
        F.col("_lon").cast("double").alias("lon"),
    )
    return reconstruct_rings(
        relation_members(spark, xml_path), way_node_refs(spark, xml_path), nodes, role=role
    )


def nodes_in_relation_polygon(
    spark: SparkSession, xml_path: str, osm: DataFrame, relation_id: str
) -> DataFrame:
    """Nodes of the shaped ``osm`` table inside one relation's reconstructed
    polygon (the reference's own use case for relation parsing: state /
    boundary membership, readme.md:497-499).

    The ring is collected to the driver — it is a polygon (kilobytes), the
    same dimension-table treatment as k-means centroids — then shipped in
    the PIP pandas_udf closure; the node table itself never moves.
    """
    rows = relation_polygons(spark, xml_path).where(F.col("relation_id") == relation_id).collect()
    if not rows:
        raise ValueError(f"relation {relation_id!r} has no reconstructable ring")
    ring = [(p["lon"], p["lat"]) for p in rows[0]["ring"]]
    pip = point_in_polygon_udf(ring)
    return osm.where(F.col("type") == "node").where(pip(F.col("lat"), F.col("lon")))
