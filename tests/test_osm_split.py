"""Splittable single-document XML scan (sources/osm_split.py).

The native XML source reads one file as one task; the split reader must
produce IDENTICAL shaped output from N parallel byte-range tasks —
including across every range boundary (an element never lost, duplicated,
or truncated at a split edge), with quote-aware tag-end handling the
Hadoop XmlInputFormat gets wrong.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import (
    element_fragments,
    plan_ranges,
    read_elements_split,
    read_shaped_split,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.osm_xml import read_shaped


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bench_osm import gen_xml

    p = str(tmp_path_factory.mktemp("osmsplit") / "t.osm")
    gen_xml(p, 12000)
    return p


def test_plan_ranges_cover_exactly():
    assert plan_ranges(10, 4) == [(0, 4), (4, 8), (8, 10)]
    assert plan_ranges(8, 4) == [(0, 4), (4, 8)]
    with pytest.raises(ValueError):
        plan_ranges(10, 0)


def test_split_scan_is_parallel_and_lossless(spark, xml_path):
    raw = read_elements_split(spark, xml_path, "node", chunk_mb=1)
    # the whole point: > 1 task for one document
    assert raw.rdd.getNumPartitions() > 1
    native = spark.read.format("xml").option("rowTag", "node").option(
        "attributePrefix", "_"
    ).option("inferSchema", "false").load(xml_path)
    assert native.rdd.getNumPartitions() == 1  # pins the native limitation
    assert raw.count() == native.count()
    a = {r["_id"] for r in raw.select("_id").collect()}
    b = {r["_id"] for r in native.select("_id").collect()}
    assert a == b  # no element lost/duplicated at any range boundary


def test_shaped_parity_with_native_reader(spark, xml_path):
    a = read_shaped(spark, xml_path)
    b = read_shaped_split(spark, xml_path, chunk_mb=1)
    assert a.schema == b.schema
    ra = sorted(map(repr, a.collect()))
    rb = sorted(map(repr, b.collect()))
    assert ra == rb


def test_boundary_sweep_tiny_chunks(spark, tmp_path):
    """Chunk sizes smaller than one element put a range boundary at every
    possible position relative to the elements; each must still be
    extracted exactly once (records belong to the range their start tag
    begins in). Runs the REAL extraction code via _chunk_bytes."""
    p = str(tmp_path / "tiny.osm")
    elems = "".join(
        f'<node id="{i}" lat="1.{i}" lon="2.{i}" user="u{i}"><tag k="amenity" v="x"/></node>\n'
        for i in range(50)
    )
    with open(p, "w") as f:
        f.write(f"<osm>\n{elems}</osm>\n")
    for chunk in (7, 64, 257):
        frags = element_fragments(
            spark, p, "node", max_element_bytes=4096, _chunk_bytes=chunk
        )
        ids = [
            f["value"].split('id="', 1)[1].split('"', 1)[0] for f in frags.collect()
        ]
        assert sorted(ids, key=int) == [str(i) for i in range(50)], f"chunk={chunk}"


def test_quote_aware_tag_end(spark, tmp_path):
    """A bare '>' inside a quoted attribute value must not truncate the
    element (legal XML; Hadoop's XmlInputFormat gets this wrong)."""
    p = str(tmp_path / "gt.osm")
    with open(p, "w") as f:
        f.write(
            '<osm><node id="1" lat="3.0" lon="4.0" user="a>b"/>'
            '<node id="2" lat="5.0" lon="6.0" user="c"><tag k="name" v="x>y"/></node></osm>\n'
        )
    df = read_elements_split(spark, p, "node", chunk_mb=1)
    rows = {r["_id"]: r for r in df.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"]["_user"] == "a>b"
    assert rows["2"]["tag"][0]["_v"] == "x>y"


def test_oversized_element_raises(spark, tmp_path):
    p = str(tmp_path / "big.osm")
    with open(p, "w") as f:
        f.write('<osm><node id="1" lat="0" lon="0">')
        f.write('<tag k="a" v="' + "x" * 9000 + '"/>')
        f.write("</node></osm>\n")
    # the element starts inside the first 50-byte range but extends far past
    # the overshoot budget — must raise loudly, never truncate. (A range
    # that happens to contain the whole element never needs the budget.)
    with pytest.raises(Exception, match="max_element_bytes"):
        element_fragments(
            spark, p, "node", max_element_bytes=100, _chunk_bytes=50
        ).collect()


def test_relation_rowtag_schema(spark, tmp_path):
    p = str(tmp_path / "rel.osm")
    with open(p, "w") as f:
        f.write(
            '<osm><relation id="9" user="r">'
            '<member type="way" ref="7" role="outer"/>'
            '<member type="way" ref="8" role="inner"/>'
            '<tag k="type" v="multipolygon"/></relation></osm>\n'
        )
    df = read_elements_split(spark, p, "relation", chunk_mb=1)
    r = df.collect()[0]
    assert r["_id"] == "9"
    assert [m["_ref"] for m in r["member"]] == ["7", "8"]
    assert r["tag"][0]["_v"] == "multipolygon"


def test_remote_opener_parity(spark, xml_path):
    """The fsspec-adapter opener must produce the identical byte-range
    plan AND identical shaped output as the local opener — the whole
    opener contract (size -> plan, read_range -> bytes) exercised
    end-to-end through Spark with a non-local byte source."""
    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import (
        FsspecRangeOpener,
        LocalRangeOpener,
    )

    class _FakeFsspecFS:
        """In-memory fsspec-shaped filesystem: .size + .open('rb') over a
        preloaded {path: bytes} dict. Defined inside the test so
        cloudpickle ships it to executors BY VALUE inside the task
        closure — the same transport path a real s3fs instance takes."""

        def __init__(self, files: dict[str, bytes]):
            self.files = files

        def size(self, path: str) -> int:
            return len(self.files[path])

        def open(self, path: str, mode: str = "rb"):
            import io

            assert mode == "rb"
            return io.BytesIO(self.files[path])

    with open(xml_path, "rb") as f:
        blob = f.read()
    remote_path = "bucket/planet.osm"  # deliberately NOT a local path
    remote = FsspecRangeOpener(_FakeFsspecFS({remote_path: blob}))
    local = LocalRangeOpener()
    # identical sizes -> identical byte-range plans
    assert remote.size(remote_path) == local.size(xml_path)
    assert plan_ranges(remote.size(remote_path), 1 << 20) == plan_ranges(
        local.size(xml_path), 1 << 20
    )
    a = sorted(
        map(tuple, read_shaped_split(spark, xml_path, chunk_mb=1).collect())
    )
    b = sorted(
        map(
            tuple,
            read_shaped_split(spark, remote_path, chunk_mb=1, opener=remote).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_parse_byte_conf():
    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import parse_byte_conf

    assert parse_byte_conf("134217728b") == 128 << 20
    assert parse_byte_conf("128MB") == 128 << 20
    assert parse_byte_conf("1g") == 1 << 30
    assert parse_byte_conf("4096") == 4096
    with pytest.raises(ValueError):
        parse_byte_conf("12 parsecs")


def test_auto_scan_path_selection(spark, xml_path, tmp_path):
    """Data-driven default: big single document -> split reader with
    maxPartitionBytes-sized ranges; small file or directory -> native."""
    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import (
        auto_split_chunk_mb,
    )

    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    # a directory always takes the native one-task-per-file source
    assert auto_split_chunk_mb(spark, str(tmp_path)) is None
    try:
        # force the threshold under the fixture's size: the same file now
        # counts as "planet-scale" and must pick the split reader
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536b")
        assert auto_split_chunk_mb(spark, xml_path) == 1  # max(1, 64k>>20)
        # and comfortably above it: native
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        assert auto_split_chunk_mb(spark, xml_path) is None
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_ingest_auto_path_parity(spark, xml_path, tmp_path):
    """ingest_osm's auto selection end-to-end: the same document ingested
    through the auto-picked split path and the forced-native path must
    land identical stored tables (VERDICT r11 item 4's parity ask)."""
    from data_wrangle_openstreetmaps_data_1_spark.pipeline_osm import ingest_osm

    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536b")
        auto = ingest_osm(spark, xml_path, str(tmp_path / "auto"))  # -> split
        native = ingest_osm(spark, xml_path, str(tmp_path / "native"), split_chunk_mb=0)
        a = sorted(map(tuple, auto.collect()))
        b = sorted(map(tuple, native.collect()))
        assert a == b and len(a) > 0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
