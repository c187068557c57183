"""J2 on the real XML path: relation -> way -> node polygon reconstruction.

The reference describes this but never builds it (readme.md:488-495): follow
relation members to ways, ways to nodes, extract coordinates "along the
entire shape" with order maintained, and emit a GeoJSON-style ring. Here the
two ordered dereferences are equi-joins carrying the document positions
(member index, nd index), and the ring is assembled with one grouped
``array_sort(collect_list(struct(...)))`` — order survives the shuffle
because it is DATA (the position columns), not an accident of row order.

Scale notes: relations/ways shuffle by their join keys only; the final
group-by-relation aggregate moves (relation_id, positions, lon, lat) rows —
no driver-side assembly. A planet-scale polygon build is exactly this plan
over the full tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconstruct_rings(
    members: DataFrame,
    way_nds: DataFrame,
    nodes: DataFrame,
    role: str = "outer",
) -> DataFrame:
    """Ordered relation->way->node dereference into per-relation rings.

    Inputs (see sources/osm_xml.py):
      - members: (relation_id, m_idx, m_type, m_ref, m_role)
      - way_nds: (way_id, nd_idx, node_ref)
      - nodes:   must contain (node_id, lat, lon) with numeric lat/lon

    Output: (relation_id, ring) where ring is an ordered
    ``array<struct<lon double, lat double>>`` — GeoJSON axis order —
    traversing every ``role`` way member in member order, each way's nodes
    in nd order.
    """
    wm = members.where((F.col("m_type") == "way") & (F.col("m_role") == role)).select(
        "relation_id", "m_idx", F.col("m_ref").alias("way_id")
    )
    pts = (
        wm.join(way_nds, "way_id")
        .join(nodes.select("node_id", "lat", "lon"), F.col("node_ref") == F.col("node_id"))
        .select("relation_id", "m_idx", "nd_idx", "lon", "lat")
    )
    # (m_idx, nd_idx) is unique per relation, so the lexicographic struct
    # sort reproduces document order exactly.
    ordered = F.array_sort(F.collect_list(F.struct("m_idx", "nd_idx", "lon", "lat")))
    return pts.groupBy("relation_id").agg(
        F.transform(
            ordered, lambda s: F.struct(s["lon"].alias("lon"), s["lat"].alias("lat"))
        ).alias("ring")
    )
