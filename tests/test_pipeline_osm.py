"""End-to-end pipeline on the fixture: every readme-battery result plus the
reference's conservation invariant (readme.md:519-522)."""

from __future__ import annotations

import pytest

from data_wrangle_openstreetmaps_data_1_spark.pipeline_osm import (
    nodes_in_relation_polygon,
    relation_polygons,
    run_osm_pipeline,
)

import os

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "example.osm")


@pytest.fixture(scope="module")
def battery(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("osm_store"))
    return run_osm_pipeline(spark, FIXTURE, out)


def test_counts(battery):
    got = {r["type"]: r["count"] for r in battery["counts"].collect()}
    assert got == {"node": 23, "way": 1}


def test_distinct_users(battery):
    assert battery["distinct_users"].collect()[0]["users"] == 6


def test_top_users(battery):
    rows = battery["top_users"].collect()
    assert (rows[0]["user"], rows[0]["contributions"]) == ("alice", 8)
    assert (rows[1]["user"], rows[1]["contributions"]) == ("bob", 5)


def test_cities_projection(battery):
    rows = battery["cities"].collect()
    assert [(r["Name"], r["Population"]) for r in rows] == [("Spokane", "208916")]


def test_top_amenities(battery):
    rows = battery["top_amenities"].collect()
    assert [(r["amenity"], r["count"]) for r in rows] == [("school", 1)]


def test_state_box_conservation_invariant(battery):
    # readme.md:519-522: WA-box + ID-box node counts must equal the node
    # total ("147184 + 94545 = 241729 (should be 241729)"). The fixture
    # plants nodes INSIDE the 2e-3 band around the divide (1021 west,
    # 1022 east, 1023 exactly on it) — under the old both-sides-epsilon
    # geometry they were double-counted and this invariant broke.
    r = battery["state_boxes"].collect()[0]
    assert r["wa_nodes"] + r["id_nodes"] == r["all_nodes"] == 23
    assert r["wa_nodes"] == 15  # 13 west of divide + 1021 (in band) + 1023 (edge)
    assert r["id_nodes"] == 8  # 7 east of divide + 1022 (in band)


def test_relation_ring_reconstruct_golden(spark):
    # relation 3001 -> way 2001 (role=outer) -> nodes 1010..1015 closed back
    # to 1010: the ring must reproduce the nd document order exactly,
    # (lon, lat) GeoJSON axis order (readme.md:488-495 steps 1-4)
    rows = relation_polygons(spark, FIXTURE).collect()
    assert len(rows) == 1 and rows[0]["relation_id"] == "3001"
    ring = [(p["lon"], p["lat"]) for p in rows[0]["ring"]]
    assert ring == [
        (-116.9000, 47.7700),
        (-116.9000, 47.7800),
        (-116.9050, 47.7850),
        (-116.9100, 47.7800),
        (-116.9100, 47.7700),
        (-116.9050, 47.7650),
        (-116.9000, 47.7700),
    ]
    assert ring[0] == ring[-1]  # closed


def test_nodes_in_relation_polygon(spark, tmp_path):
    from data_wrangle_openstreetmaps_data_1_spark.pipeline_osm import ingest_osm

    osm = ingest_osm(spark, FIXTURE, str(tmp_path / "store"))
    inside = {r["id"] for r in nodes_in_relation_polygon(spark, FIXTURE, osm, "3001").collect()}
    # 1016 sits inside the hexagon; everything west of -117 is far outside
    assert "1016" in inside
    assert inside.isdisjoint({"1001", "1017", "1020", "1021", "1022", "1023"})


def test_naturals_by_state(battery):
    got = {(r["natural"], r["state"]): r["count"] for r in battery["naturals_by_state"].collect()}
    # node 1003 (natural=tree) sits at lon -117.1, west of the divide -> WA
    assert got == {("tree", "WA"): 1}
