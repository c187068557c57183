"""OSM-surface 10x scale rehearsal (VERDICT r10 task #5).

The TPC-H-ish tables have a standing 10x rehearsal program; the OSM
reference surface itself (XML -> reshape -> clean -> partitioned store ->
readme query battery) only ever ran at reference scale (266,875
elements, tools/bench_osm.py). This replays the same deterministic
workload at 1x AND 10x (~2.67M elements, ~570 MB single XML document)
and ledgers:

- ETL (scan+reshape+clean+store) and query-battery walls + 10x ratios;
- the XML-source SPLIT evidence: the module docstring originally claimed
  the native source splits a single huge XML document by scanning for
  rowTag boundaries — the one untested scale claim. MEASURING IT
  FALSIFIED IT: the native source reads one file as ONE task whatever
  maxPartitionBytes says (node_scan_partitions_native == 1 at 468 MB).
  The claim is now fixed in sources/osm_xml.py and the real planet-scale
  path is sources/osm_split.py (byte-range planning + boundary-scanning
  extraction + JVM from_xml) — measured here side by side: partition
  count > 1, identical docs count, and the ingest wall ratio vs the
  single-task native scan;
- the conservation invariant (wa_nodes + id_nodes == all_nodes,
  reference readme.md:519-522) at BOTH scales.

Merges into BENCH_sf1_local.json under '<label>' (default 'r11_osm_scale'
for ledger continuity; the per-round sweep passes 'rN_osm_scale' — see
tools/round_sweep.py, which runs this every round so the reference-surface
scaling evidence never goes stale).

Since r12, ingest_osm auto-selects its scan path (single document > 2x
maxPartitionBytes -> split reader); this script additionally records the
auto decision at both scales and asserts it flips exactly at planet
scale: native for the 1x 47 MB document, split for the 10x 0.5 GB one.

Usage: python tools/r11_osm_scale.py [base_n] [label]   (default 266875 r11_osm_scale)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_scale(spark, n: int, tmp: str) -> dict:
    from tools.bench_osm import gen_xml

    from data_wrangle_openstreetmaps_data_1_spark.pipeline_osm import (
        ingest_osm,
        query_battery,
    )
    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_xml import read_elements

    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import (
        read_elements_split,
        read_shaped_split,
    )
    from data_wrangle_openstreetmaps_data_1_spark.operators.clean import clean_osm
    from data_wrangle_openstreetmaps_data_1_spark.sources.jsonl import write_table

    xml = os.path.join(tmp, f"synthetic_{n}.osm")
    t0 = time.perf_counter()
    size = gen_xml(xml, n)
    gen_s = time.perf_counter() - t0

    # split evidence on the raw scans themselves (before any shuffle):
    # native = 1 task per file always; split reader = size/chunk tasks
    native_partitions = read_elements(spark, xml, "node").rdd.getNumPartitions()
    split_partitions = read_elements_split(spark, xml, "node", chunk_mb=64).rdd.getNumPartitions()

    # what would the flagless default do at this size?
    from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import (
        auto_split_chunk_mb,
    )

    auto_chunk_mb = auto_split_chunk_mb(spark, xml)

    # forced-native ingest (split_chunk_mb=0) so the native-vs-split ratio
    # stays measured even now that the flagless default auto-picks split
    # at planet scale
    t0 = time.perf_counter()
    osm = ingest_osm(spark, xml, os.path.join(tmp, f"store_{n}"), split_chunk_mb=0)
    docs = osm.count()
    ingest_s = time.perf_counter() - t0

    # same ETL through the splittable scan (the planet-scale path)
    t0 = time.perf_counter()
    cleaned = clean_osm(read_shaped_split(spark, xml, chunk_mb=64))
    write_table(cleaned, os.path.join(tmp, f"store_split_{n}"), partition_by=["type"])
    osm_split_df = spark.read.parquet(os.path.join(tmp, f"store_split_{n}"))
    docs_split = osm_split_df.count()
    ingest_split_s = time.perf_counter() - t0
    assert docs_split == docs, f"split ingest row parity broken: {docs_split} != {docs}"

    t0 = time.perf_counter()
    battery = query_battery(osm)
    rows = {k: df.count() for k, df in battery.items()}
    state = battery["state_boxes"].collect()[0]
    battery_s = time.perf_counter() - t0
    assert state["wa_nodes"] + state["id_nodes"] == state["all_nodes"], (
        f"conservation invariant broken at n={n}: "
        f"{state['wa_nodes']} + {state['id_nodes']} != {state['all_nodes']}"
    )
    # r17 (VERDICT r16 task 6): the invariant must also hold THROUGH the
    # planet-scale split reader — row-count parity alone would not catch a
    # boundary-scan bug that duplicates/drops nodes while preserving totals
    # across types, or that corrupts lat/lon on chunk edges. Assert the
    # split-ingested store yields the exact same box partition, not just
    # the same row count, so the split ingest path can't silently rot.
    split_state = query_battery(osm_split_df)["state_boxes"].collect()[0]
    assert (
        split_state["wa_nodes"] == state["wa_nodes"]
        and split_state["id_nodes"] == state["id_nodes"]
        and split_state["all_nodes"] == state["all_nodes"]
    ), (
        f"split-reader conservation diverged from native at n={n}: "
        f"split {dict(split_state.asDict())} vs native wa={state['wa_nodes']} "
        f"id={state['id_nodes']} all={state['all_nodes']}"
    )
    return {
        "n_elements": n,
        "xml_mb": round(size / 1e6, 2),
        "docs": docs,
        "node_scan_partitions_native": native_partitions,
        "node_scan_partitions_split": split_partitions,
        "auto_chunk_mb": auto_chunk_mb,
        "gen_sec": round(gen_s, 2),
        "ingest_clean_store_sec": round(ingest_s, 2),
        "ingest_split_reader_sec": round(ingest_split_s, 2),
        "query_battery_sec": round(battery_s, 2),
        "battery_result_rows": rows,
        "conservation": {
            "wa_nodes": state["wa_nodes"],
            "id_nodes": state["id_nodes"],
            "all_nodes": state["all_nodes"],
        },
    }


def main() -> int:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 266_875
    label = sys.argv[2] if len(sys.argv) > 2 else "r11_osm_scale"

    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark(label)
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        one = run_scale(spark, base_n, tmp)
        ten = run_scale(spark, base_n * 10, tmp)

    assert ten["docs"] == one["docs"] * 10, (
        "parallel XML parse must lose no rows under splitting: "
        f"{ten['docs']} != {one['docs']} * 10"
    )
    assert ten["node_scan_partitions_native"] == 1, "native XML source became splittable?"
    assert ten["node_scan_partitions_split"] > 1, "split reader must parallelize a 0.5 GB doc"
    assert one["auto_chunk_mb"] is None, (
        f"auto scan-path must keep the 1x {one['xml_mb']} MB document on the "
        f"native source, picked split with chunk {one['auto_chunk_mb']} MB"
    )
    assert ten["auto_chunk_mb"], (
        f"auto scan-path must pick the split reader for the 10x "
        f"{ten['xml_mb']} MB document"
    )
    payload = {
        "comment": "OSM reference-surface 10x rehearsal: same deterministic "
        "workload as tools/bench_osm.py at 1x and 10x (~0.47 GB single XML "
        "document). Measuring FALSIFIED the old osm_xml.py split claim: the "
        "native source reads one file as ONE task (partitions_native == 1 "
        "at both scales); sources/osm_split.py is the real planet-scale "
        "path (partitions_split = size/64MB tasks, identical docs count, "
        "ingest_split_reader_sec vs the single-task ingest). docs at 10x == "
        "10 x docs at 1x (deterministic gen) proves the boundary-scanning "
        "extraction drops/duplicates nothing; conservation (wa+id==all) "
        "asserted at both scales on BOTH ingest paths (native and split "
        "reader), with the split-path box counts required to equal the "
        "native ones exactly.",
        "1x": one,
        "10x": ten,
        "ratios": {
            "ingest": round(
                ten["ingest_clean_store_sec"] / max(one["ingest_clean_store_sec"], 1e-9), 2
            ),
            "ingest_split_reader": round(
                ten["ingest_split_reader_sec"] / max(one["ingest_split_reader_sec"], 1e-9), 2
            ),
            "battery": round(
                ten["query_battery_sec"] / max(one["query_battery_sec"], 1e-9), 2
            ),
            "split_vs_native_ingest_10x": round(
                ten["ingest_clean_store_sec"] / max(ten["ingest_split_reader_sec"], 1e-9), 2
            ),
        },
    }
    bench_path = os.path.join(REPO, "BENCH_sf1_local.json")
    doc = json.load(open(bench_path))
    doc[label] = payload
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
