"""Measure the READ-side win of write_bucketed — the number that justifies
its write-time shuffle.

Writes lineitem+orders at $SPARK_GRAFT_SF_DIR scale twice: plain parquet
and co-bucketed on the order key (8 buckets each). Runs the same
fact-fact join + aggregation against both (broadcast disabled so the
plain path must shuffle) and records, from the executed plan's own
metrics, the shuffle bytes/records each plan actually moved, plus wall
time. The bucketed plan's join-side shuffle must be ZERO — the entire
point of paying the bucketing shuffle once at write time. Emits ONE JSON
line and writes BUCKETJOIN_WIN.json at the repo root.

Usage: python tools/bucketjoin_win.py   [writes under /tmp/bucketjoin_win]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/bucketjoin_win"


def shuffle_stats(df) -> dict:
    """Sum shuffle write metrics over every Exchange in the EXECUTED plan
    (AQE stages unwrapped); must run after the action so metrics are live."""
    totals = {"shuffleBytesWritten": 0, "shuffleRecordsWritten": 0, "exchanges": 0}

    def walk(node):
        name = node.nodeName()
        if name.startswith("Exchange"):
            totals["exchanges"] += 1
            m = node.metrics()
            it = m.keysIterator()
            while it.hasNext():
                k = it.next()
                if k in ("shuffleBytesWritten", "shuffleRecordsWritten"):
                    totals[k] += m.apply(k).value()
        if "QueryStage" in name:
            walk(node.plan())
            return
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return totals


def run_join(spark, li, o) -> tuple[float, dict, int]:
    from pyspark.sql import functions as F

    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    t0 = time.time()
    n = len(j.collect())
    wall = time.time() - t0
    return wall, shuffle_stats(j), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.layout import write_bucketed
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    spark = get_spark("bucketjoin_win")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    # plain copies (same file layout discipline, no bucketing metadata)
    li.write.parquet(f"{WORK}/li_plain")
    o.write.parquet(f"{WORK}/o_plain")
    write_bucketed(li, "bw_li", f"{WORK}/li_bkt", ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(o, "bw_o", f"{WORK}/o_bkt", ["o_orderkey"], 8, ["o_orderkey"])

    try:
        plain_wall, plain_sh, n1 = run_join(
            spark, spark.read.parquet(f"{WORK}/li_plain"), spark.read.parquet(f"{WORK}/o_plain")
        )
        bkt_wall, bkt_sh, n2 = run_join(spark, spark.table("bw_li"), spark.table("bw_o"))
        assert n1 == n2, (n1, n2)
        # the bucketed plan may still shuffle the tiny AGGREGATION output;
        # the JOIN-side shuffle (the data-sized one) must be gone, so the
        # bytes ratio is the honest summary
        out = {
            "metric": "bucketjoin_shuffle_bytes",
            "sf_dir": sf_dir,
            "plain": {"wall_s": round(plain_wall, 2), **plain_sh},
            "bucketed": {"wall_s": round(bkt_wall, 2), **bkt_sh},
            "bytes_ratio": round(
                plain_sh["shuffleBytesWritten"] / max(1, bkt_sh["shuffleBytesWritten"]), 2
            ),
            "result_rows": n1,
        }
        print(json.dumps(out))
        with open(os.path.join(REPO, "BUCKETJOIN_WIN.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        spark.sql("DROP TABLE IF EXISTS bw_li")
        spark.sql("DROP TABLE IF EXISTS bw_o")
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
