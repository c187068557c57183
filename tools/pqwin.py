"""Measure the product-quantization win (round-10 operator claim).

operators/pq.py's claim: PQ codes compress embeddings ~32x (8 int codes
vs 64 float32/float64 dims), which is the difference between an
embedding corpus that fits executor memory and one that doesn't, and the
ADC scan over codes beats the exact scan over raw vectors. This tool
measures all three legs at the rehearsal fixture's scale:

- storage: parquet bytes of (vec_id, embedding) vs (vec_id, code0..7)
- query wall: exact L2 top-5 over raw vectors vs ADC top-5 over codes,
  same 10 queries, best of 2 (encode/train excluded from the query wall
  - at serving time codes are precomputed; train+encode wall reported
  separately as the one-time indexing cost)
- recall of ADC vs exact (the price of the compression)

Emits ONE JSON line and writes PQWIN.json at the repo root.

Usage: python tools/pqwin.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/pqwin"
M, DSUB, KSUB, NQ, TOPK = 8, 8, 16, 10, 5


def _dirsize(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1v2"
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.pq import (
        adc_topk,
        encode_pq,
        train_pq_codebooks,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    spark = get_spark("pqwin")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n_vecs = emb.count()

    t0 = time.time()
    cb = train_pq_codebooks(emb, "vec_id", "v", m=M, dsub=DSUB, ksub=KSUB, iters=1)
    enc = encode_pq(emb, "v", cb, DSUB).select("vec_id", *[f"code{i}" for i in range(M)])
    enc.write.parquet(os.path.join(WORK, "codes"))
    index_wall = time.time() - t0
    emb.write.parquet(os.path.join(WORK, "raw"))
    raw_bytes = _dirsize(os.path.join(WORK, "raw"))
    code_bytes = _dirsize(os.path.join(WORK, "codes"))

    codes = spark.read.parquet(os.path.join(WORK, "codes"))
    queries = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    ]

    def exact_scan():
        parts = []
        for qid, qvec in queries:
            lit = "array(" + ", ".join(repr(float(x)) + "D" for x in qvec) + ")"
            parts.append(
                emb.where(F.col("vec_id") != qid)
                .select(
                    F.lit(qid).alias("query_id"),
                    "vec_id",
                    F.expr(
                        f"aggregate(zip_with(v, {lit}, (a, b) -> (a - b) * (a - b)), "
                        "cast(0.0 as double), (acc, x) -> acc + x)"
                    ).alias("d2"),
                )
                .orderBy("d2", "vec_id")
                .limit(TOPK)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.collect()

    def adc_scan():
        return adc_topk(codes, "vec_id", queries, cb, DSUB, k=TOPK).collect()

    walls = {}
    for label, fn in (("exact", exact_scan), ("adc", adc_scan)):
        best, rows = float("inf"), None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn()
            best = min(best, time.time() - t0)
        walls[label] = round(best, 2)
        walls[f"{label}_rows"] = rows

    exact_top = {}
    for r in walls.pop("exact_rows"):
        exact_top.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = 0
    for r in walls.pop("adc_rows"):
        if r["vec_id"] in exact_top[r["query_id"]]:
            hits += 1
    recall = hits / (NQ * TOPK)

    out = {
        "comment": "PQ (operators/pq.py) vs exact scan at the rehearsal "
        "fixture: storage = parquet bytes of raw (vec_id, 64-double "
        "embedding) vs (vec_id, 8 int codes); query wall = 10-query top-5, "
        "best of 2, codes precomputed (train+encode reported as the "
        "one-time index_wall). Recall is the honest price of 32x "
        "compression on this near-random 64-dim data; production corpora "
        "with real cluster structure quantize better, and sim_ivf's "
        "bucketing composes on top to cut the candidate set.",
        "sf_dir": sf,
        "n_vectors": n_vecs,
        "raw_parquet_bytes": raw_bytes,
        "code_parquet_bytes": code_bytes,
        "storage_ratio": round(raw_bytes / max(code_bytes, 1), 1),
        "index_wall_sec": round(index_wall, 2),
        "exact_scan_sec": walls["exact"],
        "adc_scan_sec": walls["adc"],
        "recall_at_5": round(recall, 3),
    }
    shutil.rmtree(WORK, ignore_errors=True)
    with open(os.path.join(REPO, "PQWIN.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
