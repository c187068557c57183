"""Measure the cost-based pre/post filter-strategy crossover (r14b).

Fixture: /tmp/sf1_freq documents (frequency-faithful 10x replication —
query terms match 10x the docs, so the postings-side work actually
scales; the suffix-scheme corpus would leave the probed term buckets
sf0.1-sized). Built here if missing.

Protocol: one index + facets sidecar (source, lang), then
bm25_query_topk_filtered under BOTH forced strategies at BOTH
selectivities, best of ``reps``:

- selective: source IN (src1, src3) — 10% of docs eligible
- broad:     lang IN (en, zh, es)  — ~69% eligible

Asserts pre == post == auto values at each selectivity (the planner
acts on an estimate, which is only safe because both are exact), records
wall times, the auto choice, and whether auto picked the measured-faster
side. Writes FILTERPLAN_WIN.json at the repo root.

Honesty note: at sf1-freq scale the absolute times are dominated by the
per-run index probe overhead (second-scale) and the pre/post wall-time
delta sits inside jitter (measured +-3%); the SCALE-relevant quantity is
``agg_input_rows_*`` — the postings rows entering the per-(query, doc)
aggregate under each strategy. Pre shrinks that input by the
selectivity factor (10% of rows on the selective filter); post always
feeds the full matching set and saves only the postings-side semi-join.
At corpus scale the aggregate input is the shuffle, so the row counts
ARE the cost model; the value-equality assertion is what makes acting
on the estimate safe.

Usage: python tools/filterplan_win.py [reps]
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
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = ["slow hash", "table merge group", "spark window"]
FILTERS = {
    "selective": ("source", ["src1", "src3"]),
    "broad": ("lang", ["en", "zh", "es"]),
}


def ensure_freq_fixture() -> None:
    if os.path.exists(f"{FREQ_DIR}/documents.parquet"):
        return
    import duckdb

    os.makedirs(FREQ_DIR, exist_ok=True)
    duckdb.sql(
        f"""
        COPY (
          SELECT d.doc_id + r.i * 1000000 AS doc_id, d.text, d.lang,
                 d.source, d.n_chars
          FROM read_parquet('{SF01}/documents.parquet') d,
               (SELECT unnest(range(10)) AS i) r
        ) TO '{FREQ_DIR}/documents.parquet' (FORMAT PARQUET)
        """
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ensure_freq_fixture()

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_query_topk_filtered,
        choose_filter_strategy,
        write_bm25_index,
        write_doc_facets,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark("filterplan_win")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{FREQ_DIR}/documents.parquet")

    path = tempfile.mkdtemp(prefix="filterplan_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=64)
    write_doc_facets(spark, path, docs, ["source", "lang"])

    out: dict[str, dict] = {
        "comment": "pre/post filter-strategy crossover at 10x (sf1_freq), "
        f"best of {reps} reps, local[32]; value-equality asserted per cell",
        "fixture": f"{FREQ_DIR}/documents.parquet",
        "n_docs": docs.count(),
    }
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        term_bucket_py,
    )

    all_terms = sorted({w for q in QUERIES for w in q.split()})
    buckets = sorted({term_bucket_py(t, 64) for t in all_terms})
    matched_post = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
    )
    for label, (col, vals) in FILTERS.items():
        choice = choose_filter_strategy(spark, path, col, vals)
        eligible = (
            spark.read.parquet(f"{path}/facets")
            .where(F.col(col).isin(vals))
            .select("doc_id")
        )
        cell: dict = {
            "filter": f"{col} IN {vals}",
            "selectivity": round(choice["selectivity"], 3),
            "auto_choice": choice["strategy"],
            # the scale cost model: rows entering the per-(query, doc)
            # aggregate — pre prunes them by the selectivity factor,
            # post feeds the full matching set
            "agg_input_rows_pre": matched_post.join(
                eligible, "doc_id", "semi"
            ).count(),
            "agg_input_rows_post": matched_post.count(),
        }
        results = {}
        for strat in ("pre", "post"):
            best = float("inf")
            rows = None
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = sorted(
                    map(
                        tuple,
                        bm25_query_topk_filtered(
                            spark, path, QUERIES, col, vals, k=10, strategy=strat
                        ).collect(),
                    )
                )
                best = min(best, time.time() - t0)
            cell[f"{strat}_sec"] = round(best, 3)
            results[strat] = rows
        assert results["pre"] == results["post"], f"{label}: strategies disagree"
        auto_rows = sorted(
            map(
                tuple,
                bm25_query_topk_filtered(
                    spark, path, QUERIES, col, vals, k=10, strategy="auto"
                ).collect(),
            )
        )
        assert auto_rows == results["pre"], f"{label}: auto disagrees"
        cell["value_equal"] = True
        # wall times at this scale sit inside jitter (see module doc);
        # the ratio of aggregate-input rows is the scale cost model
        cell["agg_rows_ratio"] = round(
            cell["agg_input_rows_post"] / max(cell["agg_input_rows_pre"], 1), 2
        )
        out[label] = cell
        print(label, json.dumps(cell), flush=True)

    with open(os.path.join(REPO, "FILTERPLAN_WIN.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
