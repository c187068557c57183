"""Measure the two-stage top-k win (r15): the final per-query rank's
input is k-bounded per shard instead of the key's FULL candidate list.

The single-window form (`Window.partitionBy("query")` + row_number) that
every ranked probe used through r14 routes every candidate row for one
query through ONE reducer — the r14 verdict's ``weak``: a high-df
(stop-word-like) query term funnels a corpus-sized candidate list through
a single partition. ``operators/topk.py:topk_per_key`` spreads stage 1
across salted shards and gives the final window <= shards * k rows per
query.

Fixture: /tmp/sf1_freq (frequency-faithful 10x documents). The query is
built from the corpus's own highest-df term so the candidate list is as
hot as this corpus can make it. Recorded per query shape:

- ``final_rank_input_rows_window`` — candidate rows the retired single
  window would put through the per-query reducer (= the scored frame's
  full row count);
- ``final_rank_input_rows_two_stage`` — stage-2 survivors (<= shards*k
  per query, measured);
- ``hot_key_max_rows`` — the largest single query's candidate count (the
  one-reducer row load the rewrite removes);
- best-of-``reps`` wall times for both forms with VALUE EQUALITY
  asserted per rep.

Writes TOPK2STAGE_WIN.json at the repo root.

Usage: python tools/topk2stage_win.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FREQ_DIR = "/tmp/sf1_freq"


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from tools.filterplan_win import ensure_freq_fixture

    ensure_freq_fixture()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        _bm25_query_scored,
        write_bm25_index,
    )
    from data_wrangle_openstreetmaps_data_1_spark.operators.topk import topk_per_key
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("topk2stage_win")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{FREQ_DIR}/documents.parquet")

    path = tempfile.mkdtemp(prefix="topk2_win_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=64)

    terms = spark.read.parquet(f"{path}/terms").select("term", "df")
    hot = [
        r["term"]
        for r in terms.orderBy(F.desc("df"), F.asc("term")).limit(3).collect()
    ]
    # "rare" = the corpus's lowest-df term that can still seed a valid
    # theta (>= 2k postings); the synthetic vocab is small and near-
    # uniform, so this picks its one genuinely skewed term
    rare = (
        terms.where(F.col("df") >= 2 * 10)
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(1)
        .collect()[0]["term"]
    )
    queries = [f"{hot[0]} {rare}", hot[1], f"{hot[2]} {hot[0]}"]
    k = 10
    shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_doc = _bm25_query_scored(spark, path, queries, False, None, None)
    order = [F.desc("score_fp"), F.asc("doc_id")]

    cand_per_query = {
        r["query"]: int(r["count"])
        for r in per_doc.groupBy("query").count().collect()
    }
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(shards))
    w1 = Window.partitionBy("query", salt).orderBy(*order)
    survivors = (
        per_doc.withColumn("r", F.row_number().over(w1)).where(F.col("r") <= k)
    )
    surv_per_query = {
        r["query"]: int(r["count"])
        for r in survivors.groupBy("query").count().collect()
    }

    def run_window():
        w = Window.partitionBy("query").orderBy(*order)
        return (
            per_doc.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query", "doc_id", "n_terms", "score_fp", "rnk")
        )

    def run_two_stage():
        return topk_per_key(per_doc, ["query"], order, k, "doc_id").select(
            "query", "doc_id", "n_terms", "score_fp", "rnk"
        )

    times = {"window": float("inf"), "two_stage": float("inf")}
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        a = sorted(map(tuple, run_window().collect()))
        times["window"] = min(times["window"], time.time() - t0)
        t0 = time.time()
        b = sorted(map(tuple, run_two_stage().collect()))
        times["two_stage"] = min(times["two_stage"], time.time() - t0)
        assert a == b, "two-stage diverged from the window form"

    out = {
        "comment": f"two-stage top-k at 10x (sf1_freq), best of {reps} reps, "
        f"local[32], shards={shards}; value-equality asserted per rep",
        "fixture": f"{FREQ_DIR}/documents.parquet",
        "n_docs": docs.count(),
        "queries": queries,
        "k": k,
        "final_rank_input_rows_window": sum(cand_per_query.values()),
        "final_rank_input_rows_two_stage": sum(surv_per_query.values()),
        "hot_key_max_rows": max(cand_per_query.values()),
        "hot_key_max_rows_two_stage": max(surv_per_query.values()),
        "per_query_candidates": cand_per_query,
        "per_query_survivors": surv_per_query,
        "wall_window_s": round(times["window"], 3),
        "wall_two_stage_s": round(times["two_stage"], 3),
    }
    out["final_rank_input_cut"] = round(
        out["final_rank_input_rows_window"]
        / max(out["final_rank_input_rows_two_stage"], 1),
        2,
    )
    shutil.rmtree(path, ignore_errors=True)
    with open(os.path.join(REPO, "TOPK2STAGE_WIN.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
