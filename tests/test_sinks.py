"""S3/S4 sinks: JSONL interchange + partitioned parquet store round-trips."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.sources.jsonl import read_jsonl, write_jsonl, write_table
from data_wrangle_openstreetmaps_data_1_spark.sources.osm_xml import read_shaped

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "example.osm")


def test_jsonl_roundtrip(spark, tmp_path):
    shaped = read_shaped(spark, FIXTURE)
    out = str(tmp_path / "osm_jsonl")
    write_jsonl(shaped, out)
    back = read_jsonl(spark, out)
    assert back.count() == shaped.count()
    # nested structures survive the JSON round trip
    r = back.where("id = '2001'").collect()[0]
    assert r["node_refs"] == ["1010", "1011", "1012", "1013", "1014", "1015", "1010"]
    assert r["address"]["street"] == "Baldwin Road"


def test_parquet_store_partitioned_by_type(spark, tmp_path):
    shaped = read_shaped(spark, FIXTURE)
    out = str(tmp_path / "osm_parquet")
    write_table(shaped, out, partition_by=["type"])
    # the node/way discriminator becomes a physical partition (SURVEY §1.2):
    # a type filter must prune at the directory level
    assert os.path.isdir(os.path.join(out, "type=node"))
    assert os.path.isdir(os.path.join(out, "type=way"))
    back = spark.read.parquet(out)
    assert back.where("type = 'node'").count() == 23
    plan = back.where("type = 'way'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(type" in plan
