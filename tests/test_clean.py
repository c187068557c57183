"""Consolidated clean_osm pass: every FIXTURES.md §3 dirty-value case
(reference updates W1-W8, readme.md:43-103, 372-378) through ONE select."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.clean import clean_osm

SCHEMA = (
    "id string, lat double, lon double, "
    "address struct<housenumber:string,street:string,postcode:string,city:string,state:string>, "
    "tags map<string,string>"
)


def _row(id, street=None, postcode=None, city=None, state=None, tags=None, lat=47.66, lon=-117.42):
    return (id, lat, lon, (None, street, postcode, city, state), tags or {})


CASES = [
    # W1: merged postcode splits into zip + state (+ city when present)
    (_row("w1a", postcode="WA 99206"), {"postcode": "99206", "state": "WA", "city": None}),
    (
        _row("w1b", postcode="Spokane, WA 99218"),
        {"postcode": "99218", "state": "WA", "city": "Spokane"},
    ),
    # W2: bare state moves out of postcode
    (_row("w2", postcode="WA"), {"postcode": None, "state": "WA"}),
    # W3: TIGER range id replaced from the sidecar tag
    (
        _row("w3", postcode="189872421:189872425", tags={"tiger:zip_right": "99224"}),
        {"postcode": "99224"},
    ),
    # zip+4 intentionally KEPT (readme.md:67)
    (_row("zip4", postcode="99218-1929"), {"postcode": "99218-1929"}),
    # W4: state case fix
    (_row("w4", state="wa"), {"state": "WA"}),
    # W5: city case fix
    (_row("w5", city="spokane"), {"city": "Spokane"}),
    # W6: Coeur d'Alene respellings
    (_row("w6a", city='Coeur d"Alene'), {"city": "Coeur d'Alene"}),
    (_row("w6b", city="Coeur d Alene"), {"city": "Coeur d'Alene"}),
    # W7: merged city splits; state donated only for WA/ID/Washington
    (_row("w7a", city="Otis Orchards, WA"), {"city": "Otis Orchards", "state": "WA"}),
    (
        _row("w7b", city="Spokane, Washington"),
        {"city": "Spokane", "state": "WA"},
    ),
    (_row("w7c", city="Post Falls, ID"), {"city": "Post Falls", "state": "ID"}),
    # unrecognized suffix: city still splits, state untouched (readme.md:98-101)
    (_row("w7d", city="Foo, Bar", state="ID"), {"city": "Foo", "state": "ID"}),
    # F1 street fixes (suffix mapping + whole-name one-offs + decoy)
    (_row("f1a", street="Baldwin Rd."), {"street": "Baldwin Road"}),
    (_row("f1b", street="E Wellesley"), {"street": "E Wellesley Avenue"}),
    (_row("f1c", street="Main Street"), {"street": "Main Street"}),
    (_row("f1d", street="Main"), {"street": "Main Avenue"}),
]


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame([r for r, _ in CASES], SCHEMA)
    return {r["id"]: r for r in clean_osm(df).collect()}


@pytest.mark.parametrize("case,expected", CASES, ids=[c[0][0] for c in CASES])
def test_clean_case(cleaned, case, expected):
    got = cleaned[case[0]]["address"].asDict()
    for field, want in expected.items():
        assert got[field] == want, f"{case[0]}: {field}={got[field]!r}, want {want!r}"


def test_geojson_derived_column(cleaned):
    r = cleaned["w1a"]
    assert r["pos_geojson"]["type"] == "Point"
    # GeoJSON axis order is [lon, lat] (W8/G1, readme.md:375-377)
    assert list(r["pos_geojson"]["coordinates"]) == [-117.42, 47.66]


def test_clean_idempotent(spark):
    df = spark.createDataFrame([r for r, _ in CASES], SCHEMA)
    once = clean_osm(df)
    twice = clean_osm(once.drop("pos_geojson"))
    a = sorted(str(r["address"]) for r in once.collect())
    b = sorted(str(r["address"]) for r in twice.collect())
    assert a == b
