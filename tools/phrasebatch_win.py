"""Measure the serving win of phrase_probe_batched over the per-phrase
reference form at serving-sized phrase batches — the text twin of
tools/batchprobe_win.py: plan size constant in the number of phrases, one
pruned positions/ scan instead of one scan branch + union per phrase.

Protocol: build one BM25 index + positional sidecar from sf0.1 documents,
mine the corpus's most frequent bigrams as the phrase batches (every
phrase guaranteed to have matches — the realistic serving case), then
answer the SAME batch both ways, best of 2 timed reps each (cache cleared
between reps), results asserted EQUAL row-for-row before any number is
recorded. Writes PHRASEBATCH_WIN.json.

Usage: python tools/phrasebatch_win.py [sf_dir]
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
BATCHES = [4, 16, 48]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens, word_shingles
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        _BAD_QUERY_WORD,
        phrase_probe_batched,
        phrase_probe_per_phrase,
        write_bm25_index,
        write_phrase_positions,
    )
    from data_wrangle_openstreetmaps_data_1_spark.session import get_spark
    from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

    spark = get_spark("phrasebatch_win")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf, "documents")
    # mine the top-|max batch| corpus bigrams as phrases: realistic
    # serving queries (every phrase matches documents, none trivially
    # prunes to nothing)
    bigrams = [
        r["bg"]
        for r in docs.select(
            F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bg"))
        .limit(max(BATCHES) * 2)
        .collect()
        if not _BAD_QUERY_WORD.search(r["bg"].replace(" ", ""))
    ][: max(BATCHES)]
    if len(bigrams) < max(BATCHES):
        print(f"corpus yields only {len(bigrams)} clean bigrams; need {max(BATCHES)}")
        return 1

    path = tempfile.mkdtemp(prefix="phrase_batchwin_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    write_phrase_positions(spark, docs, path, "doc_id", "text")

    def timed(fn):
        best, rows = float("inf"), None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn().collect()
            best = min(best, time.time() - t0)
        return best, rows

    points = []
    for n in BATCHES:
        phrases = bigrams[:n]
        t_loop, r_loop = timed(
            lambda: phrase_probe_per_phrase(spark, path, phrases, k=5)
        )
        t_batch, r_batch = timed(
            lambda: phrase_probe_batched(spark, path, phrases, k=5)
        )
        set_loop = sorted(map(tuple, r_loop))
        set_batch = sorted(map(tuple, r_batch))
        assert set_loop == set_batch, "batched phrase probe diverged from the loop"
        pt = {
            "n_phrases": n,
            "rows": len(set_batch),
            "per_phrase_loop_s": round(t_loop, 2),
            "batched_s": round(t_batch, 2),
            "speedup": round(t_loop / max(t_batch, 1e-9), 2),
        }
        points.append(pt)
        print(json.dumps(pt), flush=True)

    payload = {
        "comment": "per-phrase probe loop vs batched probe, same positional "
        "sidecar, same mined-bigram phrase batches, best of 2, results "
        "asserted equal row-for-row before recording. The loop compiles one "
        "pruned scan branch + union per phrase (plan + file-listing cost "
        "linear in phrases); the batched form is one union-pruned scan + "
        "broadcast (phrase, term) fan-out + one generic adjacency fold "
        "regardless of batch size — the trend across batch sizes is the "
        "claim, and sf0.1's index is small enough that JVM fixed costs "
        "dominate both forms, so it understates production",
        "sf_dir": sf,
        "k": 5,
        "batches": points,
    }
    with open(os.path.join(REPO, "PHRASEBATCH_WIN.json"), "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps(payload))
    shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
