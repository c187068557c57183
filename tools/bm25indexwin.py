"""Measure the READ-side win of the persisted BM25 index layout — the
number that justifies bucketing the postings by term hash.

Builds the index twice at $SPARK_GRAFT_SF_DIR scale: (a) term-bucket-
PARTITIONED (write_bm25_index's layout) and (b) the same postings as one
flat parquet table. Runs the same term probe against both and records,
from the executed plans' own scan metrics, the parquet rows each layout
materialized. The partitioned layout lists only the probed term buckets
(PartitionFilters) and pushes the term predicate into those files; the
flat layout scans everything (row-group stats can't help: terms are
hash-scattered across row groups). Also contrasts with what tx_bm25_topk
pays per query batch: a full corpus re-scan + re-tokenize.

Emits ONE JSON line and writes BM25INDEX_WIN.json at the repo root.

Usage: python tools/bm25indexwin.py   [writes under /tmp/bm25index_win]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/bm25index_win"


def scan_rows(df) -> tuple[int, int]:
    """(result rows, summed numOutputRows over every parquet scan in the
    SAME execution). Unlike tools/zorder_readwin.py's flat collectLeaves,
    this walks INTO AQE query stages (AdaptiveSparkPlan / *QueryStage
    nodes wrap their physical subplans as leaves)."""
    n = len(df.collect())
    found: list[int] = []

    def walk(p):
        name = p.nodeName()
        if "Scan" in name:
            m = p.metrics()
            if m.contains("numOutputRows"):
                found.append(m.apply("numOutputRows").value())
        if "QueryStage" in name:
            walk(p.plan())
            return
        it = p.children().iterator()
        while it.hasNext():
            walk(it.next())
        if name == "AdaptiveSparkPlan":
            walk(p.executedPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return n, sum(found)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import bm25_topk
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        _postings_with_dl,
        bm25_probe,
        write_bm25_index,
    )
    from data_wrangle_openstreetmaps_data_1_spark.plans.pipeline_ext import BM25_TERMS
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    spark = get_spark("bm25index_win", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_buckets = 64
    part_path = f"{WORK}/index"
    write_bm25_index(spark, docs, part_path, "doc_id", "text", n_buckets=n_buckets)
    flat_path = f"{WORK}/flat"
    _postings_with_dl(docs, "doc_id", "text", n_buckets).write.mode("overwrite").parquet(
        flat_path
    )
    total_postings = spark.read.parquet(flat_path).count()

    t0 = time.time()
    pruned_res, pruned_scan = scan_rows(bm25_probe(spark, part_path, BM25_TERMS, k=5))
    pruned_wall = round(time.time() - t0, 3)

    flat = spark.read.parquet(flat_path)
    t0 = time.time()
    # same probe semantics against the flat layout (term filter only — the
    # bucket column is data, not a partition, so nothing prunes)
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import B_FP, K1_FP

    post = flat.where(F.col("term").isin(BM25_TERMS))
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    stats = flat.select("doc_id", "dl").distinct().agg(
        F.count("*").alias("n_docs"),
        F.expr("sum(dl) * 1000 div count(*)").alias("avgdl_fp"),
    )
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_fp", F.expr("(n_docs - df) * 1000 div (df + 1) + 1000"))
        .withColumn("norm_fp", F.expr(f"(1000 - {B_FP}) + ({B_FP} * dl * 1000) div avgdl_fp"))
        .withColumn(
            "score_fp",
            F.expr(
                f"(tf * {K1_FP + 1000} * idf_fp) div (tf * 1000 + ({K1_FP} * norm_fp) div 1000)"
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    flat_q = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("term", "doc_id", "tf", "df", "score_fp", "rnk")
    )
    flat_res, flat_scan = scan_rows(flat_q)
    flat_wall = round(time.time() - t0, 3)

    # the per-query operator's cost: full corpus scan + tokenize per batch
    t0 = time.time()
    op_res = bm25_topk(docs, "doc_id", "text", BM25_TERMS, k=5).count()
    op_wall = round(time.time() - t0, 3)

    assert pruned_res == flat_res == op_res

    rec = {
        "metric": "bm25_index_scan_rows_flat_over_pruned",
        "value": round(flat_scan / max(pruned_scan, 1), 2),
        "unit": "x",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "total_postings": total_postings,
        "n_buckets": n_buckets,
        "terms": BM25_TERMS,
        "pruned": {"scan_rows": pruned_scan, "wall_sec": pruned_wall},
        "flat": {"scan_rows": flat_scan, "wall_sec": flat_wall},
        "per_query_operator_wall_sec": op_wall,
        "result_rows": pruned_res,
        "note": "scan_rows = parquet numOutputRows over every scan in the probe's own execution (AQE stages walked). pruned = the probed postings buckets + probed term-dictionary buckets + the 1-row stats table; flat = every posting row x3 (the flat probe must derive df and corpus stats from the same flat table, so it scans all postings three times - the index stores those as separate tiny artifacts). At 100 TB the postings buckets are the only corpus-sized piece; a probe reads |probed buckets|/n_buckets of them. per_query_operator = tx_bm25_topk's full corpus re-scan+re-tokenize per term batch, the cost the index amortizes away.",
    }
    print(json.dumps(rec))
    with open(os.path.join(REPO, "BM25INDEX_WIN.json"), "w") as f:
        json.dump(rec, f, indent=1)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
