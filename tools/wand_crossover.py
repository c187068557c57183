"""Measure WHERE the MaxScore/BMW machinery starts beating the exact
probe on wall — the crossover the r16 cost dispatch
(bm25_query_topk_maxscore's ``min_docs_for_pruning``) assumes.

WAND_WIN.json shows the machinery 2-3x slower than exact at 50k docs
(planning jobs dominate) with a 16.7x/198.7x candidate-row cut; the
dispatch therefore delegates below 1M docs. This tool generates
frequency-faithful replicated corpora at 50k/150k/500k docs (the same
replication recipe as /tmp/sf1_freq, so the probed terms' df scales with
the corpus), runs the SAME mixed rare+common query through
bm25_query_topk and the FORCED machinery, and ledgers wall + candidate
rows per size — the measured shape behind the 1M-doc threshold.

Writes WAND_CROSSOVER.json at the repo root. Value equality asserted per
size (the bound must never change answers at any scale).

Usage: python tools/wand_crossover.py [reps]
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
SF01 = "/root/testdata/sf0.1"


def ensure_fixture(reps_of_corpus: int, out_dir: str) -> None:
    if os.path.exists(f"{out_dir}/documents.parquet"):
        return
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    duckdb.sql(
        f"""
        COPY (
          SELECT d.doc_id + r.i * 1000000 AS doc_id, d.text, d.lang,
                 d.source, d.n_chars
          FROM read_parquet('{SF01}/documents.parquet') d,
               (SELECT unnest(range({reps_of_corpus})) AS i) r
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_query_topk,
        bm25_query_topk_maxscore,
        maxscore_plan,
        write_bm25_index,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("wand_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "comment": f"exact vs FORCED MaxScore/BMW wall by corpus size "
        f"(frequency-faithful replication of sf0.1 documents), best of "
        f"{reps} reps, local[32]; mixed rare+common query from the "
        "corpus's own dictionary; value equality asserted per size",
        "sizes": {},
    }
    k = 10
    for mult in (10, 30, 100):
        fix = f"/tmp/wand_x{mult}"
        ensure_fixture(mult, fix)
        docs = spark.read.parquet(f"{fix}/documents.parquet")
        n_docs = docs.count()
        path = tempfile.mkdtemp(prefix=f"wandx{mult}_")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=64)
        build_s = time.time() - t0
        terms = spark.read.parquet(f"{path}/terms").select("term", "df")
        common = terms.orderBy(F.desc("df"), F.asc("term")).limit(1).collect()[0]["term"]
        rare = (
            terms.where(F.col("df") >= 2 * k)
            .orderBy(F.asc("df"), F.asc("term"))
            .limit(1)
            .collect()[0]["term"]
        )
        q = f"{rare} {common}"
        plan = maxscore_plan(spark, path, [q], k)
        times = {"exact": float("inf"), "forced": float("inf")}
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            a = sorted(map(tuple, bm25_query_topk(spark, path, [q], k=k).collect()))
            times["exact"] = min(times["exact"], time.time() - t0)
            t0 = time.time()
            b = sorted(
                map(
                    tuple,
                    bm25_query_topk_maxscore(
                        spark, path, [q], k=k, min_docs_for_pruning=0
                    ).collect(),
                )
            )
            times["forced"] = min(times["forced"], time.time() - t0)
            assert a == b, f"VALUE MISMATCH at {n_docs} docs"
        cell = {
            "n_docs": n_docs,
            "query": q,
            "common_df": int(
                terms.where(F.col("term") == common).collect()[0]["df"]
            ),
            "essential": sorted(t for _, t in plan["ess_pairs"]),
            "build_s": round(build_s, 1),
            "wall_exact_s": round(times["exact"], 3),
            "wall_forced_s": round(times["forced"], 3),
            "forced_over_exact": round(times["forced"] / times["exact"], 2),
        }
        out["sizes"][f"x{mult}"] = cell
        print(json.dumps({f"x{mult}": cell}), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    with open(os.path.join(REPO, "WAND_CROSSOVER.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote WAND_CROSSOVER.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
