"""OSM-scale benchmark: the reference's own workload at the reference's own
data scale (56.675 MB XML -> 266,875 docs, reference readme.md:109,144),
replayed end-to-end on this engine.

Generates a deterministic synthetic OSM XML of comparable size/shape
(~90% nodes / 10% ways, skewed user distribution, tag mix per
FIXTURES.md §2), then times: XML scan+reshape+clean -> parquet store ->
the full readme query battery.

The reference pipeline for the same volume: single-threaded Python 2
iterparse ETL holding the dataset in RAM, mongoimport, then per-query
server round-trips — with the GeoJSON rewrite loop alone called out as
"quite slow" (readme.md:374).

Usage: python tools/bench_osm.py [n_elements] (default 266875)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USERS = [f"user_{i:03d}" for i in range(315)]  # 315 distinct (readme.md:146)
UID = {u: i for i, u in enumerate(USERS)}  # deterministic uid (not hash(): PYTHONHASHSEED varies)
AMENITIES = ["parking", "school", "restaurant", "fast_food", "toilets", "fuel", "bench"]
NATURALS = ["tree", "wood", "peak", "bay", "spring", "cliff", "beach"]
STREETS = ["Main St", "Baldwin Rd.", "East Sprague Avenue", "West Lexington St.", "North Ave"]


def gen_xml(path: str, n: int) -> int:
    """Deterministic OSM XML: n elements (~90% nodes). Returns bytes written."""
    if n < 100:
        raise ValueError(f"n={n} too small; need >= 100 elements (way refs index into the node range)")
    state = 42

    def rnd(mod: int) -> int:
        nonlocal state
        state = (state * 1103515245 + 12345) % (2**31)
        return state % mod

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        f.write('  <bounds minlat="47.5580" minlon="-117.5523" maxlat="47.8878" maxlon="-116.6212"/>\n')
        n_ways = n // 10
        n_nodes = n - n_ways
        for i in range(n_nodes):
            # skew: ~35% of edits from user 0 (readme.md:191)
            u = USERS[0] if rnd(100) < 35 else USERS[1 + rnd(314)]
            lat = 47.5580 + (rnd(10**6) / 10**6) * 0.3298
            lon = -117.5523 + (rnd(10**6) / 10**6) * 0.9311
            f.write(
                f'  <node id="{10**8 + i}" lat="{lat:.7f}" lon="{lon:.7f}" version="1" '
                f'changeset="{i % 99991}" timestamp="2013-0{1 + i % 9}-01T00:00:00Z" '
                f'user="{u}" uid="{UID[u]}">\n'
            )
            r = rnd(100)
            if r < 3:
                f.write(f'    <tag k="amenity" v="{AMENITIES[rnd(len(AMENITIES))]}"/>\n')
            elif r < 4:
                f.write(f'    <tag k="natural" v="{NATURALS[rnd(len(NATURALS))]}"/>\n')
            elif r < 5:
                f.write(f'    <tag k="addr:street" v="{STREETS[rnd(len(STREETS))]}"/>\n')
                f.write(f'    <tag k="addr:housenumber" v="{rnd(9999)}"/>\n')
            elif r < 6:
                f.write(f'    <tag k="highway" v="residential"/>\n')
            f.write("  </node>\n")
        for i in range(n_ways):
            u = USERS[1 + rnd(314)]
            f.write(
                f'  <way id="{2 * 10**8 + i}" version="1" changeset="{i % 9991}" '
                f'timestamp="2013-01-02T00:00:00Z" user="{u}" uid="{UID[u]}">\n'
            )
            base = 10**8 + rnd(n_nodes - 10)
            for j in range(4 + rnd(5)):
                f.write(f'    <nd ref="{base + j}"/>\n')
            f.write('    <tag k="building" v="yes"/>\n')
            f.write("  </way>\n")
        f.write("</osm>\n")
    return os.path.getsize(path)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 266_875
    from data_wrangle_openstreetmaps_data_1_spark.pipeline_osm import ingest_osm, query_battery
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("bench_osm")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        xml = os.path.join(tmp, "synthetic.osm")
        t0 = time.perf_counter()
        size = gen_xml(xml, n)
        gen_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        osm = ingest_osm(spark, xml, os.path.join(tmp, "store"))
        total_docs = osm.count()
        ingest_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        battery = query_battery(osm)
        results = {k: df.count() for k, df in battery.items()}
        battery_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "osm_reference_scale",
                "xml_mb": round(size / 1e6, 2),
                "docs": total_docs,
                "ingest_clean_store_sec": round(ingest_s, 2),
                "query_battery_sec": round(battery_s, 2),
                "gen_sec": round(gen_s, 2),
                "battery_result_rows": results,
            }
        )
    )


if __name__ == "__main__":
    main()
