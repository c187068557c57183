"""Driver-session parity gate: the external driver builds a PLAIN
SparkSession (local[32], shuffle.partitions=32, nothing else) — none of
session.py's tuned confs exist there. Every correctness-relevant conf must
therefore be (re)set inside the loaders/queries themselves
(e.g. ``nanosAsLong`` in sources/tables.py:load_table), never only in the
tuned builder.

This test replays a risk-class sample of the driver contract in a
subprocess running exactly the driver's session and compares row sets
against the tuned in-process session. A mismatch (or crash) here means a
conf the engine silently depends on did not survive the driver's session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

# One query per conf-risk class: events ts ingestion (any physical form) +
# timestamp arithmetic (sessionize_gap), timestamp->string rendering
# (t_hourly_rollup), Arrow/pandas_udf (g4_polygon_pip), persist()-based
# dedup (dd_exact), date derivation from canonical ts (sk_hll_grouped),
# union+LOCF window as-of join (j_asof_backward), streaming sketch agg
# under a plain session (st_hll). Round-6 classes: eager localCheckpoint
# in an iterative loop (dd_groups_cc_star — checkpoint blocks under a
# plain session), persist + left_anti + crossJoin-of-aggregates
# (dd_lsh_tier_audit).
QUERIES = [
    "sessionize_gap",
    "t_hourly_rollup",
    "g4_polygon_pip",
    "dd_exact",
    "sk_hll_grouped",
    "j_asof_backward",
    "st_hll",
    "dd_groups_cc_star",
    "dd_lsh_tier_audit",
    # Round-6b classes: foreachBatch streaming + prepared-index persist
    # under a plain session (st_incremental_dedup), calendar-spine
    # sequence/explode over timestamps (t_gap_fill), fixed-point iterative
    # graph loop (ml_pagerank)
    "st_incremental_dedup",
    "t_gap_fill",
    "ml_pagerank",
    # Round-11 classes: persisted-index lifecycles under a plain session —
    # partitionBy writes + dynamic partition overwrite + driver-side md5
    # bucket routing (tx_bm25_stored), and foreachBatch streaming index
    # maintenance + cluster-pruned probe (st_ivf_index)
    "tx_bm25_stored",
    "st_ivf_index",
    # Round-12 class: the batched stored probe under a plain session —
    # createDataFrame-broadcast LUT equi-joins + query-partitioned window
    # top-k must pick the same plan (and values) without the tuned confs
    "sim_ivf_pq_batched",
]

_CHILD = r"""
import json, sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
import __spark_entry__ as m
qs = m.queries()
out = {}
for name in json.loads(sys.argv[1]):
    rows = qs[name](spark, sys.argv[2]).collect()
    out[name] = sorted(repr(tuple(r)) for r in rows)
print("PARITY:" + json.dumps(out))
"""


def test_plain_driver_session_replays_tuned_results(spark):
    import __spark_entry__ as m

    qs = m.queries()
    # start the plain-session subprocess FIRST and compute the tuned-session
    # expectations while it runs (guide §2.6 applied to the suite: the two
    # sessions are separate processes with separate caches, so overlapping
    # them is pure wall-time — this test was the suite's third-largest cost
    # in the r19 duration profile). The child stays sequential: it replays
    # the driver's battery exactly.
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, json.dumps(QUERIES), SF],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    expected = {
        name: sorted(repr(tuple(r)) for r in qs[name](spark, SF).collect())
        for name in QUERIES
    }
    try:
        stdout, stderr = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    assert proc.returncode == 0, f"plain-session replay crashed:\n{stderr[-3000:]}"
    payload = [l for l in stdout.splitlines() if l.startswith("PARITY:")]
    assert payload, f"no parity payload in output:\n{stdout[-2000:]}"
    got = json.loads(payload[0][len("PARITY:") :])

    for name in QUERIES:
        assert got[name] == expected[name], (
            f"{name}: plain driver session produced different rows than the "
            f"tuned session — a correctness-relevant conf lives only in "
            f"session.py's builder"
        )
