"""Driver bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() action (no driver-side materialization
of result rows — mirrors how the plan would execute on a cluster). A short
warm-up runs one trivial action first so JVM/codegen startup isn't billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# "core11" = the headline set as benched in rounds 1-2, BEFORE
# dd_groups_cc/tx_pack_chunks joined in round 3 — kept as a stable
# subtotal so round-over-round totals stay comparable as the headline
# set grows (a bigger total from MORE queries is not a regression).
# Module-level so tests/test_plan_quality.py can pin membership against
# the registry (a rename would otherwise silently kill the comparator).
CORE11 = [
    "a2_top_users", "j2_join3_chain", "j1_broadcast_join", "tpch_q1_pricing",
    "tpch_q3_revenue", "tpch_q5_regional", "t_hourly_rollup", "g3_near_radius",
    "dd_exact", "dd_minhash_lsh", "sim_knn_brute",
]


def _calibration(spark) -> dict:
    """Fixed-work load probe, run before and after the battery so the
    artifact itself says how contended the host was (the r9->r10 +9%
    'regression' was pure host load, only diagnosable from a side ledger).

    Two timers: a single-thread pure-Python spin (fixed 2e6 iterations —
    driver-core contention) and a fixed all-core JVM job (64M-row codegen
    sum — executor-core contention, the one that moves query walls).
    Comparator rule (README "Bench comparator"): divide the two rounds'
    calib_jvm_sec before reading their totals against each other; a ratio
    outside ~0.8-1.25 means the hosts' quiet levels differ and the
    quiet-window ledger (BENCH_sf1_local.json) is the comparator instead.
    No hardcoded quiet reference is emitted (ADVICE r8: a host-specific
    constant in every row is misleading anywhere else)."""
    la = os.getloadavg()
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc += i ^ (i >> 3)
    py_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.range(64_000_000).selectExpr("sum(id % 7)").collect()
    jvm_sec = time.perf_counter() - t0
    return {
        "loadavg_1m": round(la[0], 2),
        "calib_py_sec": round(py_sec, 3),
        "calib_jvm_sec": round(jvm_sec, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import bench_queries
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads, not billed to any query — and
    # one throwaway run of the calibration shape itself, so calib_jvm_sec
    # measures steady-state capacity, not first-run JIT (measured: the
    # cold first run is ~3x the warm one on an idle host)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64_000_000).selectExpr("sum(id % 7)").collect()

    calib_pre = _calibration(spark)

    # best-of-N: this host (a shared VM) shows multi-second wall-clock noise
    # (identical plans measured 4s one minute and 14s the next); the min of
    # the reps reflects the plan's actual cost. Two reps normally; a third
    # when the first two disagree >2x (both may have hit a noisy window).
    # clearCache between reps so a repeat never reads the previous rep's
    # persisted data (CacheManager matches canonicalized plans).
    timings: dict[str, float] = {}
    # all reps are PUBLISHED (not just the min): the round-6 postmortem
    # could not distinguish a real plan regression from host jitter because
    # only the min survived into BENCH_r06.json — the per-rep spread makes
    # that decidable from the artifact alone.
    all_reps: dict[str, list[float]] = {}
    for name, fn in bench_queries().items():
        reps: list[float] = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
        # third rep for (a) wildly-disagreeing pairs (both may have hit a
        # noisy window) and (b) any query still >1s — profiling shows the
        # first rep on this host routinely runs 1.3-4x the steady state,
        # so a min-of-2 systematically overstates heavy queries.
        if (max(reps) > 2 * min(reps) and min(reps) > 0.5) or min(reps) > 1.0:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        all_reps[name] = [round(r, 3) for r in reps]

    calib_post = _calibration(spark)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    core11 = CORE11
    missing = [q for q in core11 if q not in timings]
    if missing:
        # core11 is the round-over-round comparator; a silently shrunk sum
        # would read as a speedup. Hard failure, not a warning — a renamed
        # core11 query must break the bench, not skew the history.
        print(f"ERROR: core11 queries missing from bench run: {missing}", file=sys.stderr)
        sys.exit(2)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "reps": all_reps,
                "core11_value": round(sum(timings[q] for q in core11 if q in timings), 3),
                # fixed-work load probes bracketing the battery — the
                # round-over-round comparator divides calib_jvm_sec first
                # (see README "Bench comparator" and _calibration's doc)
                "calibration": {"pre": calib_pre, "post": calib_post},
                # Quiet-window reference for core11 lives in
                # BENCH_sf1_local.json (sf01_same_code, r7: 6.32s on the
                # round-7 host) — compare noisy round values against THAT
                # artifact before calling a regression (first-rep/min
                # spreads in `reps` show multi-second jitter). Not emitted
                # as a field: a hardcoded host-specific constant in every
                # result row is misleading data anywhere else (ADVICE r8).
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
