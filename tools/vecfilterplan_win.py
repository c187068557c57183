"""Measure the vector-leg pre/post filter-strategy crossover (r15) —
the FILTERPLAN_WIN twin for ivf_pq_probe_filtered.

Fixture: /tmp/vec4x — the driver's sf0.1 embeddings replicated 4x with
gen_scale_rehearsal's embeddings recipe (vec_id shift + a small additive
nonlinear perturbation so shards aren't exact duplicates). Built here if
missing.

Protocol: one IVF-PQ index (write path, so the live cluster histogram
rides along), then ivf_pq_probe_filtered under BOTH forced strategies at
BOTH selectivities, best of ``reps``, with VALUE EQUALITY asserted per
cell and the auto choice recorded:

- selective: vec_id % 10 == 0  (~10% eligible)  -> auto must pick pre
- broad:     vec_id % 10 != 0  (~90% eligible)  -> auto must pick post

The scale cost model recorded per cell:

- ``eligibility_join_rows_pre``  — codes rows of the probed clusters
  that the PRE semi-join runs against (the corpus-sided join input);
- ``eligibility_join_rows_post`` — ranked page rows the POST filter
  touches instead (<= |queries| * k' — page-sized, never corpus-sized).

Writes VECFILTERPLAN_WIN.json at the repo root.

Usage: python tools/vecfilterplan_win.py [reps]
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
VEC_DIR = "/tmp/vec4x"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHARDS = 4
NCENT, M, DSUB, KSUB, R = 16, 8, 8, 16, 6
NQ, TOPK, NPROBE = 8, 10, 4


def ensure_vec_fixture() -> None:
    if os.path.exists(f"{VEC_DIR}/embeddings.parquet"):
        return
    import duckdb

    os.makedirs(VEC_DIR, exist_ok=True)
    o_vec = (
        duckdb.sql(
            f"SELECT max(vec_id) + 1 FROM read_parquet('{SF01}/embeddings.parquet')"
        ).fetchone()[0]
    )
    duckdb.sql(
        f"""
        COPY (
          SELECT vec_id + s * {o_vec} AS vec_id,
                 CASE WHEN s = 0 THEN embedding
                      ELSE list_transform(embedding,
                           x -> x + 0.0005 * s * (x * x - 0.5))::FLOAT[]
                 END AS embedding,
                 label
          FROM read_parquet('{SF01}/embeddings.parquet')
          CROSS JOIN range({SHARDS}) t(s)
        ) TO '{VEC_DIR}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ensure_vec_fixture()

    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        _assign_clusters_driver,
        choose_vector_filter_strategy,
        ivf_pq_probe_filtered,
        read_ivf_pq_meta,
        train_ivf_pq_meta,
        write_ivf_pq_index,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("vecfilterplan_win")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{VEC_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=NCENT, m=M, dsub=DSUB, ksub=KSUB, iters=1, round_to=R
    )
    path = tempfile.mkdtemp(prefix="vecfp_")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
    queries = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    ]
    stored_meta = read_ivf_pq_meta(spark, path)
    union_clusters = sorted(
        {
            c
            for _, v in queries
            for c in _assign_clusters_driver(v, stored_meta, NPROBE)
        }
    )
    probed_codes = spark.read.parquet(f"{path}/codes").where(
        F.col("cluster").isin(union_clusters)
    )

    out: dict = {
        "comment": f"vector pre/post filter crossover at 4x embeddings, best "
        f"of {reps} reps, local[32]; value-equality asserted per cell",
        "fixture": f"{VEC_DIR}/embeddings.parquet",
        "n_vecs": emb.count(),
        "honesty_note": (
            "r16: the small-corpus floor (always-pre below 65536 live "
            "vectors) encodes what this ledger measured in r15 — at 20k "
            "vectors post's refill bookkeeping round-trips cost more than "
            "the whole pre semi-join, whatever the selectivity. "
            "choice_without_floor records the raw selectivity model (the "
            "behavior above the floor): selective->pre, broad->post — the "
            "crossover is preserved, the floor only short-circuits it "
            "where the corpus is too small for it to matter"
        ),
        "k": TOPK,
        "nprobe": NPROBE,
        "cells": {},
    }
    filters = {
        "selective": F.col("vec_id") % 10 == 0,
        "broad": F.col("vec_id") % 10 != 0,
    }
    for label, pred in filters.items():
        allowed = emb.where(pred).select("vec_id")
        choice = choose_vector_filter_strategy(spark, path, allowed)
        # the selectivity crossover with the r16 small-corpus floor
        # DISABLED — the dial production sets at large corpora, recorded
        # so the floor's shortcut is auditable against the raw model
        unfloored = choose_vector_filter_strategy(
            spark, path, allowed, small_corpus_floor=0
        )
        cell: dict = {
            "selectivity": round(choice["selectivity"], 3),
            "auto_choice": choice["strategy"],
            "floor_applied": choice["floor_applied"],
            "choice_without_floor": unfloored["strategy"],
            "estimator": choice["estimator"],
            "eligibility_join_rows_pre": probed_codes.join(
                allowed, "vec_id", "semi"
            ).count(),
            "eligibility_join_rows_post": len(queries) * TOPK * 4,  # first page
        }
        results = {}
        for strat in ("pre", "post", "auto"):
            best = float("inf")
            rows = None
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = sorted(
                    map(
                        tuple,
                        ivf_pq_probe_filtered(
                            spark, path, queries, k=TOPK, nprobe=NPROBE,
                            allowed=allowed, strategy=strat,
                        ).collect(),
                    )
                )
                best = min(best, time.time() - t0)
            results[strat] = rows
            cell[f"wall_{strat}_s"] = round(best, 3)
        assert results["pre"] == results["post"] == results["auto"], (
            f"VALUE MISMATCH in cell {label}"
        )
        cell["auto_matches_faster_side"] = (
            cell["auto_choice"]
            == min(("pre", "post"), key=lambda x: cell[f"wall_{x}_s"])
        )
        out["cells"][label] = cell
        print(json.dumps({label: cell}), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    with open(os.path.join(REPO, "VECFILTERPLAN_WIN.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote VECFILTERPLAN_WIN.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
