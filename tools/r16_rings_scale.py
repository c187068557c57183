"""Relation-scale rehearsal for the J2 ring path (r15 verdict task 7).

``r*_osm_scale`` exercises nodes/ways at 10x; the relation -> way -> node
polygon reconstruction (operators/rings.py, the reference's
readme.md:488-495 described-but-never-built feature) had only
fixture-scale evidence. This tool generates a RELATION-HEAVY synthetic
OSM XML — ``n_rel`` multipolygon relations, each two 'outer' way members
tracing a deterministic square around a per-relation center, plus a field
of free nodes — at 1x and 10x, and measures:

- ``reconstruct_rings`` wall + output ring-point totals (the ordered
  double dereference + array_sort(collect_list) assembly);
- the ORDER-PRESERVATION golden at scale: a sampled relation's ring must
  equal the generator's exact corner sequence (member order x nd order) —
  the property that makes document order DATA, not an accident of
  partitioning — checked at both scales;
- ``nodes_in_relation_polygon`` end-to-end on one relation (ring collect
  + broadcast PIP over the shaped node table).

Writes the ``r16_rings_scale`` entry into BENCH_sf1_local.json. A
sublinear wall ratio at 10x relations is the pass condition; the golden
is asserted, not just recorded.

Usage: python tools/r16_rings_scale.py [n_rel] [label]
       (default 1000 relations at 1x, 10000 at 10x)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_relation_xml(path: str, n_rel: int) -> int:
    """Deterministic relation-heavy OSM XML. Per relation r:

    - 4 corner nodes of a small square around a unique center;
    - 2 'outer' ways: way A = corners [0, 1, 2], way B = corners [2, 3, 0]
      (shared endpoints — the OSM multipolygon convention), so the
      reconstructed ring must read A's nodes then B's in document order;
    - 3 free nodes: one inside the square, two outside (PIP targets).

    Node ids encode (relation, corner) so the expected ring is computable
    without parsing. Returns bytes written."""
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        f.write(
            '  <bounds minlat="40.0" minlon="-100.0" maxlat="50.0" maxlon="-90.0"/>\n'
        )
        d = 0.001  # half-side of each square, degrees
        for r in range(n_rel):
            clat = 40.0 + (r % 1000) * 0.009
            clon = -100.0 + (r // 1000) * 0.011
            corners = [
                (clat - d, clon - d),
                (clat - d, clon + d),
                (clat + d, clon + d),
                (clat + d, clon - d),
            ]
            for ci, (la, lo) in enumerate(corners):
                f.write(
                    f'  <node id="{10**8 + 10 * r + ci}" lat="{la:.7f}" '
                    f'lon="{lo:.7f}" version="1" changeset="1" '
                    f'timestamp="2013-01-01T00:00:00Z" user="u" uid="1"/>\n'
                )
            # free nodes: center (inside), two far corners (outside)
            for ci, (la, lo) in enumerate(
                [(clat, clon), (clat + 5 * d, clon), (clat, clon + 5 * d)], start=4
            ):
                f.write(
                    f'  <node id="{10**8 + 10 * r + ci}" lat="{la:.7f}" '
                    f'lon="{lo:.7f}" version="1" changeset="1" '
                    f'timestamp="2013-01-01T00:00:00Z" user="u" uid="1"/>\n'
                )
        for r in range(n_rel):
            base = 10**8 + 10 * r
            f.write(
                f'  <way id="{2 * 10**8 + 2 * r}" version="1" changeset="1" '
                f'timestamp="2013-01-01T00:00:00Z" user="u" uid="1">\n'
            )
            for ci in (0, 1, 2):
                f.write(f'    <nd ref="{base + ci}"/>\n')
            f.write('    <tag k="highway" v="primary"/>\n  </way>\n')
            f.write(
                f'  <way id="{2 * 10**8 + 2 * r + 1}" version="1" changeset="1" '
                f'timestamp="2013-01-01T00:00:00Z" user="u" uid="1">\n'
            )
            for ci in (2, 3, 0):
                f.write(f'    <nd ref="{base + ci}"/>\n')
            f.write("  </way>\n")
        for r in range(n_rel):
            f.write(
                f'  <relation id="{3 * 10**8 + r}" version="1" changeset="1" '
                f'timestamp="2013-01-01T00:00:00Z" user="u" uid="1">\n'
                f'    <member type="way" ref="{2 * 10**8 + 2 * r}" role="outer"/>\n'
                f'    <member type="way" ref="{2 * 10**8 + 2 * r + 1}" role="outer"/>\n'
                '    <tag k="type" v="multipolygon"/>\n'
                "  </relation>\n"
            )
        f.write("</osm>\n")
    return os.path.getsize(path)


def expected_ring(r: int) -> list[tuple[float, float]]:
    """(lon, lat) sequence the reconstruction must produce for relation r:
    way A's corners 0,1,2 then way B's 2,3,0 — duplicates included (ring
    assembly preserves document order verbatim; dedup is a consumer
    choice)."""
    d = 0.001
    clat = 40.0 + (r % 1000) * 0.009
    clon = -100.0 + (r // 1000) * 0.011
    corners = [
        (clat - d, clon - d),
        (clat - d, clon + d),
        (clat + d, clon + d),
        (clat + d, clon - d),
    ]
    seq = [corners[0], corners[1], corners[2], corners[2], corners[3], corners[0]]
    return [(round(lo, 7), round(la, 7)) for (la, lo) in seq]


def run_scale(spark, n_rel: int, tmp: str) -> dict:
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.pipeline_osm import (
        nodes_in_relation_polygon,
        relation_polygons,
    )
    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_xml import (
        read_elements,
        read_shaped,
    )

    xml = os.path.join(tmp, f"rings_{n_rel}.osm")
    t0 = time.perf_counter()
    size = gen_relation_xml(xml, n_rel)
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    rings = relation_polygons(spark, xml).persist()
    n_rings = rings.count()
    ring_pts = rings.select(F.sum(F.size("ring"))).collect()[0][0]
    recon_s = time.perf_counter() - t0
    assert n_rings == n_rel, f"expected {n_rel} rings, got {n_rings}"
    assert ring_pts == 6 * n_rel, f"expected {6 * n_rel} ring points, got {ring_pts}"

    # order-preservation golden at THIS scale: first, middle, last relation
    for r in (0, n_rel // 2, n_rel - 1):
        row = rings.where(F.col("relation_id") == str(3 * 10**8 + r)).collect()
        assert row, f"relation {r} missing a ring"
        got = [(round(p["lon"], 7), round(p["lat"], 7)) for p in row[0]["ring"]]
        assert got == expected_ring(r), f"ring order broke at relation {r}: {got}"
    rings.unpersist()

    # end-to-end PIP on one mid-corpus relation: exactly one free node
    # (the center) of its 7 local nodes lies inside its square
    rid = str(3 * 10**8 + n_rel // 2)
    t0 = time.perf_counter()
    osm = read_shaped(spark, xml)
    inside = nodes_in_relation_polygon(spark, xml, osm, rid)
    base = 10**8 + 10 * (n_rel // 2)
    inside_ids = sorted(r["id"] for r in inside.select("id").collect())
    pip_s = time.perf_counter() - t0
    assert str(base + 4) in inside_ids, "the center node must be inside"
    assert str(base + 5) not in inside_ids and str(base + 6) not in inside_ids, (
        "outside nodes leaked into the polygon"
    )

    return {
        "n_rel": n_rel,
        "xml_mb": round(size / 1e6, 1),
        "gen_s": round(gen_s, 2),
        "n_rings": n_rings,
        "ring_points": int(ring_pts),
        "reconstruct_s": round(recon_s, 2),
        "pip_e2e_s": round(pip_s, 2),
        "order_golden": "held (relations 0, mid, last)",
    }


def main() -> int:
    n_rel = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    label = sys.argv[2] if len(sys.argv) > 2 else "r16_rings_scale"

    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark(label)
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        one = run_scale(spark, n_rel, tmp)
        ten = run_scale(spark, n_rel * 10, tmp)

    ratio = round(ten["reconstruct_s"] / one["reconstruct_s"], 2)
    payload = {
        "comment": "J2 relation-scale rehearsal: relation-heavy synthetic "
        "XML (2 outer ways x 3 nds per relation + 3 free nodes), "
        "reconstruct_rings + order golden + nodes_in_relation_polygon at "
        "1x and 10x relations. Pass = sublinear wall ratio and the order "
        "golden holding at both scales.",
        "one_x": one,
        "ten_x": ten,
        "reconstruct_wall_ratio_10x": ratio,
    }
    out_path = os.path.join(REPO, "BENCH_sf1_local.json")
    with open(out_path) as f:
        ledger = json.load(f)
    ledger[label] = payload
    with open(out_path, "w") as f:
        json.dump(ledger, f, indent=1)
        f.write("\n")
    print(json.dumps({label: payload}, indent=1))
    assert ratio < 10.0, f"reconstruction scaled superlinearly: {ratio}x wall at 10x data"
    return 0


if __name__ == "__main__":
    sys.exit(main())
