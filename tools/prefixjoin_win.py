"""Measure the prefix-Jaccard join's WIN case: hot-shingle corpora.

Round 7 shipped dd_jaccard_prefix (AllPairs/PPJoin prefix filter) justified
as insurance against boilerplate-heavy corpora, but every measurement
corpus was hot-shingle-free, so the record only showed it LOSING to the
plain all-shared-shingle join (14.4s vs 2.4s at sf0.1). This tool builds
the adversarial fixture the operator exists for — a boilerplate sentence
(license header / site footer, the CCNet reality) prepended to a fraction
of documents — and measures both operators on it.

Why the plain join dies: it emits one candidate row per SHARED SHINGLE, so
a boilerplate shingle with document frequency df contributes C(df,2) rows
BEFORE any threshold applies — quadratic in the hot fraction. The prefix
filter ranks each doc's shingles rarest-first and joins only the first
|d| - ceil(t·|d|) + 1 of them; hot shingles are by definition frequent, so
they sort out of every prefix and contribute NOTHING to the candidate join.
The threshold is the standard near-dup 0.8 (rational 4/5), where shared
boilerplate alone cannot push a pair over (J <= ~0.63 even for short docs),
so the fixture perturbs candidate volume, not ground truth; both operators
must return identical pairs — asserted.

Emits ONE JSON line and writes PREFIXJOIN_WIN.json at the repo root.

Usage: python tools/prefixjoin_win.py   [$SPARK_GRAFT_SF_DIR documents]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ~64 words => 62 3-gram shingles per affected doc, the size of a real
# license-header + footer block pair
BOILERPLATE = (
    "this document is provided under the terms of the standard public "
    "license agreement and may be redistributed only with this notice "
    "intact see the website terms page for the complete policy text "
    "copyright by the original publisher all rights reserved unauthorized "
    "reproduction of any portion of this material in any medium without "
    "express written permission from the publisher is strictly prohibited "
    "and may result in legal action under applicable law"
)


def run_case(spark, docs, hot_fraction: float, reps: int = 2) -> dict:
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
        _shingle_sets,
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
        prefix_candidates,
    )

    mod = max(1, round(1 / hot_fraction)) if hot_fraction else 0
    corpus = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % mod == 0, F.concat(F.lit(BOILERPLATE + " "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text")
        if mod
        else F.col("text").alias("text"),
    ).localCheckpoint()  # fixture is materialized so neither side pays its build

    # 2 reps, min: rep 1 carries JVM/codegen warmup that would otherwise
    # masquerade as an operator difference
    plain_wall, prefix_wall = float("inf"), float("inf")
    for _ in range(reps):
        t0 = time.time()
        plain = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8).collect()
        }
        plain_wall = min(plain_wall, time.time() - t0)

        t0 = time.time()
        pref = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_prefix_pairs(corpus, "doc_id", "text", n=3, t_num=4, t_den=5).collect()
        }
        prefix_wall = min(prefix_wall, time.time() - t0)
    assert pref == plain, (
        f"lossless violated at hot_fraction={hot_fraction}: "
        f"{len(pref)} prefix vs {len(plain)} plain pairs"
    )

    # candidate volumes, computed OUTSIDE the timed windows: the plain
    # join's pre-threshold row count is sum over shingles of C(df,2); the
    # prefix join's is its candidate table cardinality
    sh = _shingle_sets(corpus, "doc_id", "text", 3)
    ex = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("sh_h")
    )
    freq = ex.groupBy("sh_h").agg(F.count("*").alias("df"))
    plain_cand, hot_df = freq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long"),
        F.max("df"),
    ).collect()[0]
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pref_cand = prefix_candidates(ex, sizes, 4, 5).count()

    return {
        "hot_fraction": hot_fraction,
        "n_docs": corpus.count(),
        "hottest_shingle_df": int(hot_df),
        "plain_candidate_rows": int(plain_cand),
        "prefix_candidate_rows": int(pref_cand),
        "n_true_pairs": len(plain),
        "plain_wall_sec": round(plain_wall, 2),
        "prefix_wall_sec": round(prefix_wall, 2),
        "winner": "prefix" if prefix_wall < plain_wall else "plain",
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    spark = get_spark("prefixjoin_win")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cases = [run_case(spark, docs, f) for f in (0.0, 0.1, 0.3)]
    for c in cases:
        c["corpus"] = "sf0.1"
    # the crossover case: at 10x the corpus (tools/gen_scale_rehearsal.py
    # rehearsal documents), 10% boilerplate means hot df ~5000 and the
    # plain join's pre-threshold volume hits ~10^9 rows — the quadratic
    # term finally dominates local[32]'s shuffle throughput, which is the
    # miniature of what it does to a 1000-executor corpus at 100 TB
    sf1_docs_path = os.path.join("/tmp/sf1", "documents.parquet")
    if os.path.exists(sf1_docs_path):
        big = load_table(spark, "/tmp/sf1", "documents").select("doc_id", "text")
        # 1 rep: the plain join runs MINUTES here (the hot shingle keys
        # concentrate ~25M-row join outputs on single tasks), so warmup
        # noise is irrelevant at this magnitude
        c = run_case(spark, big, 0.1, reps=1)
        c["corpus"] = "sf1_rehearsal_10x"
        cases.append(c)
    out = {
        "metric": "prefix_jaccard_win",
        "sf_dir": sf_dir,
        "boilerplate_words": len(BOILERPLATE.split()),
        "cases": cases,
        "note": "plain join candidates grow as C(hot_df,2) per boilerplate "
        "shingle (quadratic in the hot fraction); prefix candidates stay "
        "flat because frequent shingles rank out of every rarest-first "
        "prefix. Outputs asserted identical (lossless) in every case.",
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "PREFIXJOIN_WIN.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
