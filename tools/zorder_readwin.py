"""Measure the READ-side win of write_zorder_layout — the number that
justifies its write-time shuffle.

Writes lineitem twice at $SPARK_GRAFT_SF_DIR scale: (a) plain rewrite
(same file count, no ordering) and (b) z-ordered on
(l_quantity, l_extendedprice). Runs the same two-column range predicate
against both and records, from the executed plan's own scan metrics,
how many rows the parquet reader actually materialized (after row-group
stats pruning) plus wall time. Emits ONE JSON line and writes
ZORDER_READWIN.json at the repo root.

The z-ordered layout makes min/max row-group statistics selective for
BOTH predicate columns at once — a single-column sort can only do that
for its leading column; an unsorted layout for neither (every row group
spans the full value range, so nothing prunes and the scan reads the
whole table, as the `unsorted` numbers show).

Usage: python tools/zorder_readwin.py  [writes under /tmp/zorder_readwin]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/zorder_readwin"


def scan_stats(df) -> tuple[int, list[int]]:
    """(result rows, per-scan numOutputRows) — metrics read from the SAME
    query execution that ran (df.count() would spawn a fresh one whose
    metrics never update)."""
    n = len(df.collect())
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    vals = []
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            vals.append(m.apply("numOutputRows").value())
    return n, vals


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.layout import write_zorder_layout

    spark = get_spark("zorder_readwin", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    n_files = 16

    t0 = time.perf_counter()
    # control: identical file count and data, no meaningful order — isolates
    # the layout effect from file-splitting effects
    li.repartition(n_files).write.mode("overwrite").parquet(f"{WORK}/plain")
    t_plain_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    write_zorder_layout(li, f"{WORK}/zorder", cols, bits=8, num_files=n_files)
    t_z_write = time.perf_counter() - t0

    # selective in BOTH dimensions — the case single-column sorting can't
    # serve for the trailing column
    pred = F.col("l_quantity").between(10, 15) & F.col("l_extendedprice").between(
        20000, 30000
    )

    out: dict[str, dict[str, float | int]] = {}
    for name in ("plain", "zorder"):
        df = spark.read.parquet(f"{WORK}/{name}").where(pred)
        # warm the file listing so wall time measures the scan, not metadata
        spark.read.parquet(f"{WORK}/{name}").schema
        t0 = time.perf_counter()
        rows, scanned = scan_stats(df)
        wall = time.perf_counter() - t0
        out[name] = {
            "result_rows": rows,
            "rows_scanned": int(sum(scanned)),
            "wall_sec": round(wall, 3),
        }
    out["zorder"]["write_sec"] = round(t_z_write, 3)
    out["plain"]["write_sec"] = round(t_plain_write, 3)

    assert out["plain"]["result_rows"] == out["zorder"]["result_rows"], out
    payload = {
        "metric": "zorder_read_win",
        "sf_dir": sf_dir,
        "predicate": "l_quantity in [10,15] and l_extendedprice in [20000,30000]",
        "layouts": out,
        "scan_reduction": round(
            out["plain"]["rows_scanned"] / max(out["zorder"]["rows_scanned"], 1), 2
        ),
    }
    line = json.dumps(payload)
    print(line)
    with open(os.path.join(REPO, "ZORDER_READWIN.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
