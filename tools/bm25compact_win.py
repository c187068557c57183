"""Measure the bucket-selective BM25 compaction win (r14 verdict task 3).

Fixture: /tmp/sf1v2 documents (the FAITHFUL suffix-scheme 10x corpus —
50k docs, ~310-term vocabulary, so a few victims' terms hash to a strict
subset of a 64-bucket space; the plain sf0.1 corpus has a 31-term vocab
where any doc's terms dirty nearly every bucket, which is a testdata
artifact, not the production shape — real takedown batches touch a tiny
fraction of a web-scale vocabulary).

Protocol: two identical indexes (postings + positional sidecar,
n_buckets=64), the same small victim set deleted in both, then
bm25_index_compact selective on A and all_buckets=True (the full-rewrite
reference) on B. Records wall time, bytes REWRITTEN (selective: the
dirty bucket dirs across postings/positions/terms + stats; full: every
artifact byte), dirty/present bucket counts, and asserts the two indexes
land value-identical (probe + artifact multisets).

Writes BM25COMPACT_WIN.json at the repo root.

Runs are keyed by bucket count in the output file: the 64-bucket row is
the standard layout, the 256-bucket row shows the ratio's trend as the
bucket space widens toward the production shape (bucket count scales
with the corpus; the win is bounded by victim-vocab / corpus-vocab).

Usage: python tools/bm25compact_win.py [n_victims] [n_buckets]
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
SRC = "/tmp/sf1v2/documents.parquet"


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    n_victims = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    NB = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_probe,
        term_bucket_py,
        write_bm25_index,
        write_phrase_positions,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark

    spark = get_spark()
    docs = spark.read.parquet(SRC).select("doc_id", "text")
    a = tempfile.mkdtemp(prefix="cmpwin_sel_")
    b = tempfile.mkdtemp(prefix="cmpwin_full_")
    out: dict = {"fixture": SRC, "n_buckets": NB, "n_victims": n_victims}
    try:
        for p in (a, b):
            shutil.rmtree(p, ignore_errors=True)
            write_bm25_index(spark, docs, p, "doc_id", "text", n_buckets=NB)
            write_phrase_positions(spark, docs, p, "doc_id", "text")
        # victims from ONE shard (shard-suffixed vocab concentrates their
        # terms): the takedown-batch shape
        victims = [
            int(r["doc_id"])
            for r in docs.select("doc_id").orderBy("doc_id").limit(n_victims).collect()
        ]
        vic_terms = [
            r["term"]
            for r in spark.read.parquet(f"{a}/postings")
            .where(F.col("doc_id").isin(victims))
            .select("term")
            .distinct()
            .collect()
        ]
        dirty = sorted({term_bucket_py(t, NB) for t in vic_terms})
        present = sorted(
            int(d.split("=")[1])
            for d in os.listdir(f"{a}/postings")
            if d.startswith("bucket=")
        )
        out["victim_distinct_terms"] = len(vic_terms)
        out["dirty_buckets"] = len(dirty)
        out["present_buckets"] = len(present)
        total_bytes = sum(
            dir_bytes(f"{a}/{sub}") for sub in ("postings", "positions", "terms", "stats")
        )
        out["index_bytes"] = total_bytes
        for p in (a, b):
            bm25_index_delete(spark, p, victims)
        t0 = time.perf_counter()
        rem_a = bm25_index_compact(spark, a)
        out["selective_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rem_b = bm25_index_compact(spark, b, all_buckets=True)
        out["full_sec"] = round(time.perf_counter() - t0, 3)
        assert rem_a == rem_b, (rem_a, rem_b)
        out["postings_rows_removed"] = rem_a
        sel_bytes = sum(
            dir_bytes(f"{a}/{sub}/bucket={bk}")
            for sub in ("postings", "positions", "terms")
            for bk in dirty
            if os.path.isdir(f"{a}/{sub}/bucket={bk}")
        ) + dir_bytes(f"{a}/stats")
        full_bytes = sum(
            dir_bytes(f"{b}/{sub}") for sub in ("postings", "positions", "terms", "stats")
        )
        out["selective_bytes_rewritten"] = sel_bytes
        out["full_bytes_rewritten"] = full_bytes
        out["bytes_ratio"] = round(full_bytes / max(sel_bytes, 1), 2)
        out["time_ratio"] = round(out["full_sec"] / max(out["selective_sec"], 1e-9), 2)
        # value equality: artifacts + a probe
        for sub in ("postings", "terms", "stats", "positions"):
            ga = sorted(tuple(r) for r in spark.read.parquet(f"{a}/{sub}").collect())
            gb = sorted(tuple(r) for r in spark.read.parquet(f"{b}/{sub}").collect())
            assert ga == gb, f"{sub} diverged"
        sample_terms = sorted(set(vic_terms))[:3] or ["spark"]
        pa = sorted(map(tuple, bm25_probe(spark, a, sample_terms, k=5).collect()))
        pb = sorted(map(tuple, bm25_probe(spark, b, sample_terms, k=5).collect()))
        assert pa == pb
        out["value_equal"] = True
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)
    path = os.path.join(REPO, "BM25COMPACT_WIN.json")
    merged = {}
    if os.path.exists(path):
        prev = json.load(open(path))
        # pre-keyed layouts merge in as their bucket count
        merged = prev if all(k.startswith("nb") for k in prev) else {f"nb{prev.get('n_buckets', '?')}": prev}
    merged[f"nb{NB}"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
