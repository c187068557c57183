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
per-run index probe overhead (second-scale), so the crossover margin is
modest; the ledger's point is the DIRECTION — pre must not lose badly on
selective filters, post must not lose badly on broad ones — and the
value-equality assertion that makes the estimate-driven choice safe.

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
    for label, (col, vals) in FILTERS.items():
        choice = choose_filter_strategy(spark, path, col, vals)
        cell: dict = {
            "filter": f"{col} IN {vals}",
            "selectivity": round(choice["selectivity"], 3),
            "auto_choice": choice["strategy"],
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
        faster = "pre" if cell["pre_sec"] <= cell["post_sec"] else "post"
        cell["faster_measured"] = faster
        cell["auto_matches_faster"] = faster == cell["auto_choice"]
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
