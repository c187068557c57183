"""Measure the READ-side win of the persisted IVF-PQ index layout —
the number that justifies partitioning the codes table by cluster.

Builds the index twice at $SPARK_GRAFT_SF_DIR scale: (a) cluster-
PARTITIONED (write_ivf_pq_index's layout) and (b) the same codes as one
unpartitioned parquet table. Runs the SAME probe battery (every query
vector, nprobe clusters each) against both and records, from the
executed plans' own scan metrics, how many rows the parquet reader
materialized — the partitioned layout prunes non-probed clusters at
file-listing time (PartitionFilters), the flat layout must scan and
filter. Also records the files each layout touched per probe.

At 100 TB the ratio is the serving story: a probe reads nprobe/ncent of
the index and nothing else. Emits ONE JSON line and writes
IVFINDEX_WIN.json at the repo root.

Usage: python tools/ivfindexwin.py   [writes under /tmp/ivfindex_win]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/ivfindex_win"


def scan_rows(df) -> tuple[int, int]:
    """(result rows, summed numOutputRows across scan leaves) from the SAME
    execution that ran (same pattern as tools/zorder_readwin.py)."""
    n = len(df.collect())
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return n, total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        _assign_clusters_driver,
        _assign_encode,
        ivf_pq_probe,
        train_ivf_pq_meta,
        write_ivf_pq_index,
    )
    from data_wrangle_openstreetmaps_data_1_spark.operators.pq import adc_topk
    from data_wrangle_openstreetmaps_data_1_spark.plans.curation_ext import (
        _IVFPQ_NCENT,
        _IVFPQ_NPROBE,
        _PQ_DSUB,
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_NQ,
        _PQ_R,
        _PQ_TOPK,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    spark = get_spark("ivfindex_win", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n_vec = emb.count()
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v",
        ncent=_IVFPQ_NCENT, m=_PQ_M, dsub=_PQ_DSUB, ksub=_PQ_K,
        iters=_PQ_ITERS, round_to=_PQ_R,
    )
    part_path = f"{WORK}/partitioned"
    write_ivf_pq_index(spark, emb, part_path, meta, "vec_id", "v")
    flat_path = f"{WORK}/flat"
    _assign_encode(emb, "vec_id", "v", meta).write.mode("overwrite").parquet(flat_path)

    queries = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < _PQ_NQ).orderBy("vec_id").collect()
    ]

    # probe battery against the partitioned layout (the real read path)
    t0 = time.time()
    pruned_res, pruned_scan = scan_rows(
        ivf_pq_probe(spark, part_path, queries, k=_PQ_TOPK, nprobe=_IVFPQ_NPROBE)
    )
    pruned_wall = round(time.time() - t0, 3)

    # identical ADC battery against the flat layout: same isin predicate,
    # but cluster is a data column — every probe scans the whole table
    flat = spark.read.parquet(flat_path)
    parts = []
    for qid, qvec in queries:
        clusters = _assign_clusters_driver(qvec, meta, _IVFPQ_NPROBE)
        cand = flat.where(F.col("cluster").isin(clusters))
        parts.append(
            adc_topk(cand, "vec_id", [(qid, qvec)], meta["codebooks"], _PQ_DSUB,
                     k=_PQ_TOPK, round_to=_PQ_R)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    t0 = time.time()
    flat_res, flat_scan = scan_rows(out)
    flat_wall = round(time.time() - t0, 3)

    assert pruned_res == flat_res, "layouts must answer identically"

    rec = {
        "metric": "ivf_index_scan_rows_flat_over_pruned",
        "value": round(flat_scan / max(pruned_scan, 1), 2),
        "unit": "x",
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "ncent": _IVFPQ_NCENT,
        "nprobe": _IVFPQ_NPROBE,
        "n_queries": len(queries),
        "pruned": {"scan_rows": pruned_scan, "wall_sec": pruned_wall},
        "flat": {"scan_rows": flat_scan, "wall_sec": flat_wall},
        "result_rows": pruned_res,
        "note": "scan_rows = parquet reader numOutputRows summed over the probe "
        "battery's scan leaves; partitioned layout lists only probed cluster "
        "dirs (PartitionFilters), flat layout reads every row then filters. "
        "At 100 TB the pruned fraction is nprobe/ncent of the index per query.",
    }
    print(json.dumps(rec))
    with open(os.path.join(REPO, "IVFINDEX_WIN.json"), "w") as f:
        json.dump(rec, f, indent=1)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
