"""Validate SINGLE_STAGE_MAX_CANDIDATES (operators/topk.py, 2^17) by
measurement: single-stage vs two-stage wall as per-key candidate count
grows.

The r16 cost fallback skips the salted stage when a caller-supplied bound
says no key can be hot; this tool sweeps per-key candidates across the
threshold on a synthetic frame (8 keys x N candidates each, unique
tie-break ids, heavy score ties) and records both forms' wall — the
constant is right if single-stage wins comfortably below 2^17 and the
two-stage form is at worst ~even just above it (its win grows with N;
value equality asserted per cell, as everywhere).

Writes TOPK_CROSSOVER.json. Usage: python tools/topk_crossover.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.topk import (
        SINGLE_STAGE_MAX_CANDIDATES,
        topk_per_key,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("topk_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    k, keys = 10, 8
    out: dict = {
        "comment": f"single-stage vs two-stage topk_per_key wall by per-key "
        f"candidates (8 keys, k=10, heavy ties, best of {reps} reps, "
        "local[32]); threshold under test = "
        f"SINGLE_STAGE_MAX_CANDIDATES = {SINGLE_STAGE_MAX_CANDIDATES}",
        "cells": {},
    }
    order = [F.desc("score"), F.asc("id")]
    for n in (10_000, 65_536, 131_072, 524_288, 2_097_152):
        df = (
            spark.range(keys * n)
            .select(
                (F.col("id") % keys).alias("key"),
                F.col("id"),
                (F.col("id") % 97).alias("score"),
            )
        )
        times = {}
        results = {}
        for label, kwargs in (
            ("single", {"approx_candidates_per_key": 0}),  # force 1 shard
            ("two_stage", {"shards": 32}),
        ):
            best = float("inf")
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.time()
                results[label] = sorted(
                    map(
                        tuple,
                        topk_per_key(df, ["key"], order, k, "id", **kwargs).collect(),
                    )
                )
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        assert results["single"] == results["two_stage"], f"VALUE MISMATCH at n={n}"
        cell = {
            "per_key_candidates": n,
            "above_threshold": n > SINGLE_STAGE_MAX_CANDIDATES,
            "wall_single_s": times["single"],
            "wall_two_stage_s": times["two_stage"],
            "single_over_two_stage": round(times["single"] / times["two_stage"], 2),
        }
        out["cells"][f"n{n}"] = cell
        print(json.dumps(cell), flush=True)
    with open(os.path.join(REPO, "TOPK_CROSSOVER.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote TOPK_CROSSOVER.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
