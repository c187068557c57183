"""Persisted BM25 index lifecycle (operators/text_index.py).

Mirrors tests/test_ivf_index.py for the text side: pruned probe reads,
add-invisibility (base + delta == one-shot build), loud duplicate guard,
driver/JVM bucket-hash parity, and value-parity with the per-query
operator (bm25_topk) it replaces at serving time.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import bm25_topk
from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    _bucket_col,
    bm25_index_add,
    bm25_probe,
    term_bucket_py,
    write_bm25_index,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

TERMS = ["spark", "hash", "window"]
NB = 16


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


@pytest.fixture(scope="module")
def full_index(spark, docs):
    path = tempfile.mkdtemp(prefix="bm25idx_full_")
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_bucket_hash_parity(spark, docs):
    """Driver-side hashlib bucket == JVM portable_hash64 bucket, term by
    term — the contract pruning correctness rests on."""
    sample = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .where(F.length("term") > 0)
        .distinct()
        .limit(200)
        .select("term", _bucket_col(F.col("term"), NB).alias("b"))
        .collect()
    )
    assert len(sample) > 20  # sf0.001's synthetic vocab is ~31 terms
    for r in sample:
        assert term_bucket_py(r["term"], NB) == r["b"], r["term"]


def test_probe_plan_prunes_buckets(spark, full_index):
    buckets = sorted({term_bucket_py(t, NB) for t in TERMS})
    scan = spark.read.parquet(f"{full_index}/postings").where(
        F.col("bucket").isin(buckets) & F.col("term").isin(TERMS)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    assert "PushedFilters" in plan  # the term predicate reaches the scan
    total = spark.read.parquet(f"{full_index}/postings").count()
    assert scan.count() < total


def test_probe_matches_per_query_operator(spark, docs, full_index):
    a = sorted(map(tuple, bm25_probe(spark, full_index, TERMS, k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs, "doc_id", "text", TERMS, k=5).collect()))
    assert a == b and len(a) == 15


def test_incremental_add_value_invisible(spark, docs, full_index):
    path = tempfile.mkdtemp(prefix="bm25idx_incr_")
    try:
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 5 != 3), path, "doc_id", "text", n_buckets=NB
        )
        bm25_index_add(spark, docs.where(F.col("doc_id") % 5 == 3), path, "doc_id", "text")
        for sub in ("postings", "terms", "stats"):
            a = sorted(tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect())
            b = sorted(tuple(r) for r in spark.read.parquet(f"{full_index}/{sub}").collect())
            assert a == b, f"{sub} diverged between add path and one-shot build"
        pa = sorted(map(tuple, bm25_probe(spark, path, TERMS, k=5).collect()))
        pb = sorted(map(tuple, bm25_probe(spark, full_index, TERMS, k=5).collect()))
        assert pa == pb
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_add_rewrites_only_touched_term_buckets(spark, docs):
    """The df-merge must leave untouched term-dictionary buckets'files
    bit-identical (dynamic partition overwrite discipline)."""
    import os

    path = tempfile.mkdtemp(prefix="bm25idx_sel_")
    try:
        write_bm25_index(
            spark, docs.where(F.col("doc_id") % 7 != 0), path, "doc_id", "text", n_buckets=NB
        )

        def listing(sub):
            out = {}
            for d in os.listdir(f"{path}/{sub}"):
                if d.startswith("bucket="):
                    full = f"{path}/{sub}/{d}"
                    out[d] = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
            return out

        pre = listing("terms")
        batch = docs.where(F.col("doc_id") % 7 == 0)
        from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
            _postings_with_dl,
        )

        touched = {
            r["bucket"]
            for r in _postings_with_dl(batch, "doc_id", "text", NB)
            .select("bucket")
            .distinct()
            .collect()
        }
        bm25_index_add(spark, batch, path, "doc_id", "text")
        post = listing("terms")
        for d in pre:
            b = int(d.split("=", 1)[1])
            if b not in touched:
                assert pre[d] == post[d], f"untouched bucket {d} was rewritten"
        assert any(pre[d] != post[d] for d in pre), "no bucket rewritten?"
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_duplicate_add_raises(spark, docs, full_index):
    with pytest.raises(ValueError, match="already indexed"):
        bm25_index_add(
            spark, docs.where(F.col("doc_id") < 3), full_index, "doc_id", "text"
        )


def test_delete_then_compact(spark, docs):
    """Delete: the doc vanishes from probes immediately while df stays
    deleted-doc-inclusive (the documented Lucene-style staleness);
    compact: df/stats become exact — the index answers as if built on
    the filtered corpus."""
    import os

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_compact,
        bm25_index_delete,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_del_")
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        before = bm25_probe(spark, path, TERMS, k=5).collect()
        victim = int(
            sorted(
                (r for r in before if r["term"] == TERMS[0]),
                key=lambda r: r["rnk"],
            )[0]["doc_id"]
        )
        bm25_index_delete(spark, path, [victim])
        stale = bm25_probe(spark, path, TERMS, k=5).collect()
        assert victim not in {r["doc_id"] for r in stale}
        assert all(len([r for r in stale if r["term"] == t]) == 5 for t in TERMS)
        # df still counts the deleted doc until compact (the contract)
        df_stale = {r["term"]: r["df"] for r in stale}
        df_before = {r["term"]: r["df"] for r in before}
        assert df_stale == df_before

        removed = bm25_index_compact(spark, path)
        assert removed > 0
        assert not os.path.isdir(f"{path}/tombstones")
        exact = sorted(map(tuple, bm25_probe(spark, path, TERMS, k=5).collect()))
        ref = sorted(
            map(
                tuple,
                bm25_topk(
                    docs.where(F.col("doc_id") != victim), "doc_id", "text", TERMS, k=5
                ).collect(),
            )
        )
        assert exact == ref  # post-compact == built-on-filtered-corpus
        assert bm25_index_compact(spark, path) == 0  # idempotent
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_interleaved_add_delete_probe_compact(spark, docs):
    """Full lifecycle interleaving (the IVF twin's discipline): build ->
    add -> delete -> probe -> ADD WITH TOMBSTONES PENDING -> probe ->
    compact -> probe -> re-add the deleted doc -> probe. Tombstone
    consistency must hold at every step: deleted docs never surface,
    per-term k is maintained, and post-compact (and post-re-add) the
    probe is bit-equal to the per-query operator on the live corpus."""
    import os

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_compact,
        bm25_index_delete,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_ilv_")
    try:
        base = docs.where(F.col("doc_id") % 3 == 0)
        add1 = docs.where(F.col("doc_id") % 3 == 1)
        add2 = docs.where(F.col("doc_id") % 3 == 2)
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        bm25_index_add(spark, add1, path, "doc_id", "text")

        got = bm25_probe(spark, path, TERMS, k=5).collect()
        victim = int(
            sorted((r for r in got if r["term"] == TERMS[0]), key=lambda r: r["rnk"])[0][
                "doc_id"
            ]
        )
        bm25_index_delete(spark, path, [victim])
        stale = bm25_probe(spark, path, TERMS, k=5).collect()
        assert victim not in {r["doc_id"] for r in stale}
        assert all(len([r for r in stale if r["term"] == t]) == 5 for t in TERMS)

        # add while tombstones are pending — the interleaving under test
        bm25_index_add(spark, add2, path, "doc_id", "text")
        mid = bm25_probe(spark, path, TERMS, k=5).collect()
        assert victim not in {r["doc_id"] for r in mid}
        assert all(len([r for r in mid if r["term"] == t]) == 5 for t in TERMS)

        removed = bm25_index_compact(spark, path)
        assert removed > 0 and not os.path.isdir(f"{path}/tombstones")
        exact = sorted(map(tuple, bm25_probe(spark, path, TERMS, k=5).collect()))
        ref = sorted(
            map(
                tuple,
                bm25_topk(
                    docs.where(F.col("doc_id") != victim), "doc_id", "text", TERMS, k=5
                ).collect(),
            )
        )
        assert exact == ref

        # compaction physically dropped the victim -> re-adding it is a
        # legal new document again; the index must answer as the full corpus
        bm25_index_add(spark, docs.where(F.col("doc_id") == victim), path, "doc_id", "text")
        back = sorted(map(tuple, bm25_probe(spark, path, TERMS, k=5).collect()))
        full = sorted(map(tuple, bm25_topk(docs, "doc_id", "text", TERMS, k=5).collect()))
        assert back == full
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_rebuild_terms_recovers_partial_commit(spark, docs):
    """The documented partial-commit recovery: postings appended but the
    terms swap never landed (crash window). rebuild_bm25_terms must
    restore terms/ and stats/ to exactly the one-shot-build state, since
    both are pure functions of postings/."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        rebuild_bm25_terms,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_rec_")
    ref = tempfile.mkdtemp(prefix="bm25idx_ref_")
    try:
        base = docs.where(F.col("doc_id") % 5 != 3)
        batch = docs.where(F.col("doc_id") % 5 == 3)
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        # simulate the crash window: postings landed, terms/stats did not
        from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
            _postings_with_dl,
        )

        _postings_with_dl(batch, "doc_id", "text", NB).repartition("bucket").write.partitionBy(
            "bucket"
        ).mode("append").parquet(f"{path}/postings")
        rebuild_bm25_terms(spark, path)

        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        for sub in ("terms", "stats"):
            a = sorted(tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect())
            b = sorted(tuple(r) for r in spark.read.parquet(f"{ref}/{sub}").collect())
            assert a == b, f"{sub} not recovered to the one-shot state"
        pa = sorted(map(tuple, bm25_probe(spark, path, TERMS, k=5).collect()))
        pb = sorted(map(tuple, bm25_probe(spark, ref, TERMS, k=5).collect()))
        assert pa == pb
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)


PHRASES = ["table hash", "merge group", "slow hash batch"]


def test_phrase_stored_matches_scan_form(spark, docs, full_index):
    """The positional-sidecar probe must be value-identical to the scan
    form (phrase_topk) — the serving path changes bytes touched, never
    the answer — and its scan must prune to the phrase words' buckets."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import (
        phrase_topk,
    )
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_probe,
        write_phrase_positions,
    )

    write_phrase_positions(spark, docs, full_index, "doc_id", "text")
    stored = phrase_probe(spark, full_index, PHRASES, k=5)
    scan = phrase_topk(docs, "doc_id", "text", PHRASES, k=5)
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, scan.collect()))

    plan = stored._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_phrase_positions_add_invisible(spark, docs):
    """base + delta positional add == one-shot positional build, probe
    answers included (per-document state: appends never touch existing
    bytes), and the duplicate guard is loud."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_positions_add,
        phrase_probe,
        write_phrase_positions,
    )

    oneshot = tempfile.mkdtemp(prefix="phrasepos_ref_")
    split = tempfile.mkdtemp(prefix="phrasepos_split_")
    try:
        for p in (oneshot, split):
            write_bm25_index(spark, docs, p, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, oneshot, "doc_id", "text")
        write_phrase_positions(
            spark, docs.where(F.col("doc_id") % 3 != 1), split, "doc_id", "text"
        )
        phrase_positions_add(
            spark, docs.where(F.col("doc_id") % 3 == 1), split, "doc_id", "text"
        )
        ref = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{oneshot}/positions").collect()
        )
        got = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{split}/positions").collect()
        )
        assert got == ref
        assert sorted(map(tuple, phrase_probe(spark, split, PHRASES, k=5).collect())) \
            == sorted(map(tuple, phrase_probe(spark, oneshot, PHRASES, k=5).collect()))
        with pytest.raises(ValueError, match="already has positions"):
            phrase_positions_add(
                spark, docs.where(F.col("doc_id") % 3 == 1), split, "doc_id", "text"
            )
    finally:
        shutil.rmtree(oneshot, ignore_errors=True)
        shutil.rmtree(split, ignore_errors=True)


def test_phrase_probe_honors_tombstones(spark, docs):
    """A deleted doc must vanish from phrase results immediately (the
    bm25_probe staleness contract applies to the positional sidecar
    too)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_delete,
        phrase_probe,
        write_phrase_positions,
    )

    path = tempfile.mkdtemp(prefix="phrasepos_ts_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, path, "doc_id", "text")
        top1 = phrase_probe(spark, path, PHRASES, k=1).collect()
        victims = sorted({int(r["doc_id"]) for r in top1})
        bm25_index_delete(spark, path, victims)
        after = phrase_probe(spark, path, PHRASES, k=5)
        assert after.where(F.col("doc_id").isin(victims)).count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_proximity_slop0_equals_phrase_bigram(spark, docs, full_index):
    """slop=0 is exact adjacency: proximity counts for (w1, w2, 0) must
    equal phrase_probe's bigram counts doc-for-doc, and the guards are
    loud."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_probe,
        proximity_probe,
        write_phrase_positions,
    )

    write_phrase_positions(spark, docs, full_index, "doc_id", "text")
    prox = proximity_probe(spark, full_index, [("table", "hash", 0)], k=500)
    phr = phrase_probe(spark, full_index, ["table hash"], k=500)
    got = {(r["doc_id"], r["prox_tf"]) for r in prox.collect()}
    ref = {(r["doc_id"], r["phrase_tf"]) for r in phr.collect()}
    assert got == ref and got  # non-empty on this corpus

    # widening the window can only add matches
    wide = proximity_probe(spark, full_index, [("table", "hash", 3)], k=500)
    wide_by_doc = {r["doc_id"]: r["prox_tf"] for r in wide.collect()}
    for doc_id, tf in got:
        assert wide_by_doc.get(doc_id, 0) >= tf

    with pytest.raises(ValueError, match="identical words"):
        proximity_probe(spark, full_index, [("hash", "hash", 1)], k=5)
    with pytest.raises(ValueError, match="negative slop"):
        proximity_probe(spark, full_index, [("table", "hash", -1)], k=5)
    with pytest.raises(ValueError, match="non-empty"):
        proximity_probe(spark, full_index, [], k=5)


def test_compact_folds_tombstones_into_positions(spark, docs):
    """The round-12 wrong-answer repro: delete -> compact must NOT
    resurrect the victim in phrase/proximity results (compact rewrites
    positions/ with the survivors anti-join BEFORE clearing tombstones),
    and a post-compact re-add of the victim is legal again and restores
    its positions rows bit-equally."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_add,
        bm25_index_compact,
        bm25_index_delete,
        phrase_positions_add,
        phrase_probe,
        proximity_probe,
        write_phrase_positions,
    )

    path = tempfile.mkdtemp(prefix="phrasepos_cpt_")
    ref = tempfile.mkdtemp(prefix="phrasepos_cptref_")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ref, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, path, "doc_id", "text")
        top1 = phrase_probe(spark, path, PHRASES, k=1).collect()
        victims = sorted({int(r["doc_id"]) for r in top1})
        bm25_index_delete(spark, path, victims)
        stale = phrase_probe(spark, path, PHRASES, k=5).collect()
        assert not set(victims) & {r["doc_id"] for r in stale}

        assert bm25_index_compact(spark, path) > 0
        # the repro: pre-fix, the tombstone clear resurrected the victims
        after = phrase_probe(spark, path, PHRASES, k=5).collect()
        assert not set(victims) & {r["doc_id"] for r in after}
        assert sorted(map(tuple, after)) == sorted(map(tuple, stale))
        prox_after = proximity_probe(
            spark, path, [("table", "hash", 0), ("merge", "group", 2)], k=5
        ).collect()
        assert not set(victims) & {r["doc_id"] for r in prox_after}
        # positions/ physically dropped the victims' rows
        pos_ids = {
            r["doc_id"]
            for r in spark.read.parquet(f"{path}/positions")
            .select("doc_id").distinct().collect()
        }
        assert not set(victims) & pos_ids

        # re-add after compact: the duplicate guard must NOT trip on stale
        # rows, and the restored index answers as the full corpus
        vic_docs = docs.where(F.col("doc_id").isin(victims))
        bm25_index_add(spark, vic_docs, path, "doc_id", "text")
        phrase_positions_add(spark, vic_docs, path, "doc_id", "text")
        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, ref, "doc_id", "text")
        got = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/positions").collect()
        )
        want = sorted(
            tuple(r) for r in spark.read.parquet(f"{ref}/positions").collect()
        )
        assert got == want
        assert sorted(map(tuple, phrase_probe(spark, path, PHRASES, k=5).collect())) \
            == sorted(map(tuple, phrase_probe(spark, ref, PHRASES, k=5).collect()))
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)


BATCH8 = PHRASES + [
    "hash table", "group merge", "batch slow", "hash group", "table group",
]


def test_batched_phrase_probe_matches_reference_form(spark, docs, full_index):
    """phrase_probe_batched must be row-identical to the per-phrase
    reference form while compiling ONE pruned positions/ scan regardless
    of phrase count (the ivf_pq_probe_batched discipline)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_probe_batched,
        phrase_probe_per_phrase,
        write_phrase_positions,
    )

    write_phrase_positions(spark, docs, full_index, "doc_id", "text")
    for phrases in (PHRASES, BATCH8):
        batched = phrase_probe_batched(spark, full_index, phrases, k=5)
        looped = phrase_probe_per_phrase(spark, full_index, phrases, k=5)
        assert sorted(map(tuple, batched.collect())) == sorted(
            map(tuple, looped.collect())
        )
        plan = batched._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==", 1)[0]
        # one positions scan however many phrases; the reference form has
        # one per phrase. No tombstones on this index -> exactly 1.
        assert plan.count("Scan parquet") == 1
        assert "PartitionFilters" in plan
        assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_batched_proximity_probe_matches_reference_form(spark, docs, full_index):
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        proximity_probe_batched,
        proximity_probe_per_pair,
        write_phrase_positions,
    )

    write_phrase_positions(spark, docs, full_index, "doc_id", "text")
    pairs = [
        ("table", "hash", 0), ("merge", "group", 2), ("slow", "batch", 3),
        ("hash", "table", 1), ("group", "merge", 0), ("table", "group", 4),
    ]
    batched = proximity_probe_batched(spark, full_index, pairs, k=5)
    looped = proximity_probe_per_pair(spark, full_index, pairs, k=5)
    assert sorted(map(tuple, batched.collect())) == sorted(map(tuple, looped.collect()))
    plan = batched._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert plan.count("Scan parquet") == 1


def test_query_word_guards(spark, docs, full_index):
    """Serving APIs reject malformed query words LOUDLY (quotes and
    backslashes would corrupt/inject the probe expression in the
    interpolating forms; whitespace can never be a token), and duplicate
    phrases/pairs are caller bugs, not silent double-counts."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.retrieval import (
        phrase_topk,
    )
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_probe,
        proximity_probe,
        write_phrase_positions,
    )

    write_phrase_positions(spark, docs, full_index, "doc_id", "text")
    for bad in ("o'brien hash", "back\\slash hash"):
        with pytest.raises(ValueError, match="quote"):
            phrase_probe(spark, full_index, [bad], k=5)
        with pytest.raises(ValueError, match="quote"):
            phrase_topk(docs, "doc_id", "text", [bad], k=5)
    with pytest.raises(ValueError, match="quote"):
        proximity_probe(spark, full_index, [("o'brien", "hash", 1)], k=5)
    with pytest.raises(ValueError, match="duplicate phrases"):
        phrase_probe(spark, full_index, ["table hash", "table hash"], k=5)
    with pytest.raises(ValueError, match="duplicate"):
        proximity_probe(
            spark, full_index, [("table", "hash", 0), ("table", "hash", 0)], k=5
        )


def test_stats_incremental_missing_row_rebuilds(spark, docs):
    """The documented partial-commit crash state can leave stats/ with no
    row; the incremental-stats path must fall back to the full rebuild
    (stats are a pure function of postings/), not AttributeError."""
    path = tempfile.mkdtemp(prefix="bm25idx_nostats_")
    ref = tempfile.mkdtemp(prefix="bm25idx_nostats_ref_")
    try:
        base = docs.where(F.col("doc_id") % 5 != 3)
        batch = docs.where(F.col("doc_id") % 5 == 3)
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        # simulate the crash state: stats/ exists but holds zero rows
        empty = spark.read.parquet(f"{path}/stats").where(F.lit(False)).collect()
        spark.createDataFrame(
            empty, spark.read.parquet(f"{path}/stats").schema
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
        assert spark.read.parquet(f"{path}/stats").head() is None
        bm25_index_add(spark, batch, path, "doc_id", "text")
        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        a = sorted(tuple(r) for r in spark.read.parquet(f"{path}/stats").collect())
        b = sorted(tuple(r) for r in spark.read.parquet(f"{ref}/stats").collect())
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)


def test_prefix_probe_guards_and_pruning(spark, docs, full_index):
    """PrefixQuery contract: metacharacter/charset rejection, the
    max_expansions cap (Lucene's degenerate-prefix guard) trips BEFORE an
    unbounded driver collect, zero-match prefixes yield empty results,
    and the postings scan carries the bucket PartitionFilters."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        prefix_probe,
    )

    for bad in ("ab_", "a%", "Upper", "o'x", ""):
        with pytest.raises(ValueError, match="a-z0-9|non-empty"):
            prefix_probe(spark, full_index, [bad], k=5)
    with pytest.raises(ValueError, match="duplicate prefixes"):
        prefix_probe(spark, full_index, ["s", "s"], k=5)
    with pytest.raises(ValueError, match="expand past"):
        prefix_probe(spark, full_index, ["s"], k=5, max_expansions=1)
    empty = prefix_probe(spark, full_index, ["zzzz"], k=5)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "prefix", "doc_id", "n_terms", "total_tf", "rnk",
    ]

    got = prefix_probe(spark, full_index, ["s", "zzzz"], k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_prefix_probe_matches_corpus_computation(spark, docs, full_index):
    """Stored prefix probe == the same aggregation computed directly from
    the corpus (expansion + summed tf + distinct-term count + ranking)."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        prefix_probe,
    )

    prefixes = ["s", "c"]
    stored = sorted(map(tuple, prefix_probe(spark, full_index, prefixes, k=5).collect()))
    tok = docs.select(
        F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term")
    )
    pf = spark.createDataFrame([(p,) for p in prefixes], "prefix string")
    g = (
        tok.join(F.broadcast(pf), tok["term"].startswith(pf["prefix"]))
        .groupBy("prefix", "doc_id")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.count("*").cast("long").alias("total_tf"),
        )
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("total_tf"), F.asc("doc_id"))
    ref = sorted(
        map(
            tuple,
            g.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 5)
            .select("prefix", "doc_id", "n_terms", "total_tf", "rnk")
            .collect(),
        )
    )
    assert stored == ref and stored


def test_prefix_probe_honors_tombstones(spark, docs):
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_delete,
        prefix_probe,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_pref_ts_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        top1 = prefix_probe(spark, path, ["s"], k=1).collect()
        victim = int(top1[0]["doc_id"])
        bm25_index_delete(spark, path, [victim])
        after = prefix_probe(spark, path, ["s"], k=5)
        assert after.where(F.col("doc_id") == victim).count() == 0
        assert after.count() == 5  # runners-up promoted
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_phrase_bm25_scoring_and_exact_df_under_delete(spark, docs):
    """phrase_bm25_probe ranks by the fixed-point BM25 score (not raw
    phrase_tf), df = matching-doc count per phrase, and — the stated
    staleness contract — df is EXACT immediately after a delete (it is
    probe-computed from the matched set), unlike term df which waits for
    compact."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_delete,
        phrase_bm25_probe,
        phrase_probe,
        write_phrase_positions,
    )

    path = tempfile.mkdtemp(prefix="phrase_bm25_t_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, path, "doc_id", "text")
        phrase = PHRASES[0]
        scored = phrase_bm25_probe(spark, path, [phrase], k=500).collect()
        assert scored
        # df is constant per phrase and equals the matched-doc count
        matched = phrase_probe(spark, path, [phrase], k=100000).collect()
        dfs = {r["df"] for r in scored}
        assert dfs == {len(matched)}
        # phrase_tf values agree doc-for-doc with the unscored probe
        tf_by_doc = {r["doc_id"]: r["phrase_tf"] for r in matched}
        for r in scored:
            assert tf_by_doc[r["doc_id"]] == r["phrase_tf"]
        # ranking is by score_fp desc (doc_id asc ties), monotone in rnk
        by_rnk = sorted(scored, key=lambda r: r["rnk"])
        for a, b in zip(by_rnk, by_rnk[1:]):
            assert (a["score_fp"], -a["doc_id"]) >= (b["score_fp"], -b["doc_id"])

        victim = int(by_rnk[0]["doc_id"])
        bm25_index_delete(spark, path, [victim])
        after = phrase_bm25_probe(spark, path, [phrase], k=500).collect()
        assert victim not in {r["doc_id"] for r in after}
        assert {r["df"] for r in after} == {len(matched) - 1}  # exact, not stale
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_fuzzy_term_probe_matches_brute_force(spark, docs, full_index):
    """The SymSpell neighborhood join + verify must equal brute-force
    levenshtein over queries x vocabulary (exactness is the contract:
    deletion neighborhoods alone admit ED-2 pairs like transposed
    bigrams — the verify step must reject them), and guards are loud."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        fuzzy_term_probe,
    )

    queries = ["spar", "grup", "windo", "batch", "qzx"]
    got = sorted(map(tuple, fuzzy_term_probe(spark, full_index, queries, k=5).collect()))
    # brute force: fine at test scale, the exact thing the probe optimizes
    dictionary = (
        docs.select(F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )
    q = spark.createDataFrame([(x,) for x in queries], "query string")
    w = Window.partitionBy("query").orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
    ref = sorted(
        map(
            tuple,
            dictionary.crossJoin(F.broadcast(q))
            .withColumn("dist", F.levenshtein("query", "term"))
            .where(F.col("dist") <= 1)
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 5)
            .select("query", "term", "dist", "df", "rnk")
            .collect(),
        )
    )
    assert got == ref and got
    by_query = {}
    for row in got:
        by_query.setdefault(row[0], []).append(row)
    assert "qzx" not in by_query  # no ED<=1 neighbor: empty branch
    assert by_query["batch"][0][1:3] == ("batch", 0)  # exact hit first

    with pytest.raises(ValueError, match="duplicate"):
        fuzzy_term_probe(spark, full_index, ["spar", "spar"], k=5)
    with pytest.raises(ValueError, match="quote"):
        fuzzy_term_probe(spark, full_index, ["o'x"], k=5)


def test_bm25_query_topk_semantics(spark, docs, full_index):
    """Multi-term ranked retrieval: a single-word query agrees exactly
    with the per-term probe; AND results are the n_terms-complete subset
    of OR results; guards are loud; tombstones honored."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_query_topk,
    )

    one = bm25_query_topk(spark, full_index, ["spark"], k=5).collect()
    ref = [r for r in bm25_probe(spark, full_index, ["spark"], k=5).collect()]
    assert [(r["doc_id"], r["score_fp"], r["rnk"]) for r in sorted(one, key=lambda r: r["rnk"])] \
        == [(r["doc_id"], r["score_fp"], r["rnk"]) for r in sorted(ref, key=lambda r: r["rnk"])]
    assert all(r["n_terms"] == 1 for r in one)

    q = ["slow hash", "table merge group"]
    both = bm25_query_topk(spark, full_index, q, k=1000).collect()
    conj = bm25_query_topk(spark, full_index, q, k=1000, require_all=True).collect()
    or_set = {(r["query"], r["doc_id"]): r for r in both}
    for r in conj:
        o = or_set[(r["query"], r["doc_id"])]  # every AND row exists in OR
        assert o["score_fp"] == r["score_fp"] and o["n_terms"] == r["n_terms"]
        assert r["n_terms"] == len(set(r["query"].split()))
    # repeated query words dedupe (bag-of-words contract)
    a = bm25_query_topk(spark, full_index, ["hash hash"], k=5).collect()
    b = bm25_query_topk(spark, full_index, ["hash"], k=5).collect()
    assert sorted((r["doc_id"], r["score_fp"]) for r in a) == sorted(
        (r["doc_id"], r["score_fp"]) for r in b
    )
    with pytest.raises(ValueError, match="duplicate"):
        bm25_query_topk(spark, full_index, ["hash", "hash"], k=5)
    with pytest.raises(ValueError, match="quote"):
        bm25_query_topk(spark, full_index, ["o'x hash"], k=5)


def test_bm25_query_topk_honors_tombstones(spark, docs):
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_delete,
        bm25_query_topk,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_multi_ts_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        top1 = bm25_query_topk(spark, path, ["slow hash"], k=1).collect()
        victim = int(top1[0]["doc_id"])
        bm25_index_delete(spark, path, [victim])
        after = bm25_query_topk(spark, path, ["slow hash"], k=5)
        assert after.where(F.col("doc_id") == victim).count() == 0
        assert after.count() == 5
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_phrase_snippet_probe_windows_and_clamps(spark):
    """Snippet windows: first occurrence selected, ctx tokens each side,
    clamped at both document bounds; tokenization is the index's own."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        phrase_snippet_probe,
        write_bm25_index,
        write_phrase_positions,
    )

    docs = spark.createDataFrame(
        [
            (1, "Table Hash u v w x y z"),            # match at doc start
            (2, "a b c d e table hash"),              # match at doc end
            (3, "a b c d table hash x y z w"),        # interior + clamp-free
            (4, "table hash a b table hash c"),       # first of two matches
            (5, "no match here at all"),
        ],
        "doc_id long, text string",
    )
    path = tempfile.mkdtemp(prefix="phrase_snip_t_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, path, "doc_id", "text")
        got = {
            r["doc_id"]: (r["first_pos"], r["snippet"], r["phrase_tf"])
            for r in phrase_snippet_probe(
                spark, path, docs, ["table hash"], k=10, ctx=3
            ).collect()
        }
        assert got[1] == (1, "table hash u v w", 1)       # lo clamps to 1
        assert got[2] == (6, "c d e table hash", 1)       # hi clamps to len
        assert got[3] == (5, "b c d table hash x y z", 1) # full window
        assert got[4] == (1, "table hash a b table", 2)   # first of two wins
        assert 5 not in got
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_index_merge_equals_oneshot_build(spark, docs):
    """merge(build(A), build(B)) must be bit-identical to build(A ∪ B)
    across every artifact (postings, terms, stats, positions) and every
    probe family; the guards (bucket mismatch, overlapping docs, pending
    tombstones, mixed positions capability) refuse loudly."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_index_delete,
        bm25_index_merge,
        phrase_probe,
        write_phrase_positions,
    )

    a = tempfile.mkdtemp(prefix="bm25mrg_a_")
    b = tempfile.mkdtemp(prefix="bm25mrg_b_")
    out = tempfile.mkdtemp(prefix="bm25mrg_o_")
    ref = tempfile.mkdtemp(prefix="bm25mrg_r_")
    for p in (a, b, out, ref):
        shutil.rmtree(p, ignore_errors=True)
    try:
        da = docs.where(F.col("doc_id") % 2 == 0)
        db = docs.where(F.col("doc_id") % 2 == 1)
        write_bm25_index(spark, da, a, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, da, a, "doc_id", "text")
        write_bm25_index(spark, db, b, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, db, b, "doc_id", "text")
        bm25_index_merge(spark, out, [a, b])
        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        write_phrase_positions(spark, docs, ref, "doc_id", "text")
        for sub in ("postings", "terms", "stats", "positions"):
            got = sorted(tuple(r) for r in spark.read.parquet(f"{out}/{sub}").collect())
            want = sorted(tuple(r) for r in spark.read.parquet(f"{ref}/{sub}").collect())
            assert got == want, f"{sub} diverged from the one-shot build"
        assert sorted(map(tuple, bm25_probe(spark, out, TERMS, k=5).collect())) \
            == sorted(map(tuple, bm25_probe(spark, ref, TERMS, k=5).collect()))
        assert sorted(map(tuple, phrase_probe(spark, out, PHRASES, k=5).collect())) \
            == sorted(map(tuple, phrase_probe(spark, ref, PHRASES, k=5).collect()))

        # guards
        with pytest.raises(ValueError, match="more than one input"):
            bm25_index_merge(spark, tempfile.mkdtemp(prefix="bm25mrg_x_"), [a, a])
        mismatch = tempfile.mkdtemp(prefix="bm25mrg_nb_")
        shutil.rmtree(mismatch, ignore_errors=True)
        write_bm25_index(spark, db, mismatch, "doc_id", "text", n_buckets=8)
        with pytest.raises(ValueError, match="n_buckets disagree"):
            bm25_index_merge(spark, tempfile.mkdtemp(prefix="bm25mrg_y_"), [a, mismatch])
        shutil.rmtree(mismatch, ignore_errors=True)
        victim = int(da.limit(1).collect()[0]["doc_id"])
        bm25_index_delete(spark, a, [victim])
        with pytest.raises(ValueError, match="pending tombstones"):
            bm25_index_merge(spark, tempfile.mkdtemp(prefix="bm25mrg_z_"), [a, b])
    finally:
        for p in (a, b, out, ref):
            shutil.rmtree(p, ignore_errors=True)


def test_suffix_probe_matches_corpus_and_guards(spark, docs, full_index):
    """Reversed-dictionary suffix queries: equality with direct corpus
    computation, the missing-rterms loud error, and the shared guard
    contract (charset, duplicates, expansion cap, zero-match empties)."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        suffix_probe,
        write_reversed_terms,
    )

    nodict = tempfile.mkdtemp(prefix="bm25idx_nodict_")
    shutil.rmtree(nodict, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, nodict, "doc_id", "text", n_buckets=NB)
        with pytest.raises(ValueError, match="no reversed dictionary"):
            suffix_probe(spark, nodict, ["w"], k=5)
    finally:
        shutil.rmtree(nodict, ignore_errors=True)

    write_reversed_terms(spark, full_index)
    suffixes = ["w", "er", "zz"]
    got = sorted(map(tuple, suffix_probe(spark, full_index, suffixes, k=5).collect()))
    tok = docs.select(F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term"))
    sf = spark.createDataFrame([(s,) for s in suffixes], "suffix string")
    g = (
        tok.join(F.broadcast(sf), tok["term"].endswith(sf["suffix"]))
        .groupBy("suffix", "doc_id")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.count("*").cast("long").alias("total_tf"),
        )
    )
    w = Window.partitionBy("suffix").orderBy(F.desc("total_tf"), F.asc("doc_id"))
    ref = sorted(
        map(
            tuple,
            g.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 5)
            .select("suffix", "doc_id", "n_terms", "total_tf", "rnk")
            .collect(),
        )
    )
    assert got == ref and got
    assert not [r for r in got if r[0] == "zz"]  # zero-match branch empty
    with pytest.raises(ValueError, match="a-z0-9"):
        suffix_probe(spark, full_index, ["W%"], k=5)
    with pytest.raises(ValueError, match="expand past"):
        suffix_probe(spark, full_index, ["w"], k=5, max_expansions=1)


def test_facet_counts_match_corpus_and_whole_set(spark, docs, full_index):
    """Facets summarize the WHOLE matching set (not the top-k page) and
    match the direct corpus computation; tombstoned docs drop from the
    counts immediately."""
    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_facet_counts,
        bm25_index_delete,
    )

    q = ["slow hash"]
    got = {
        (r["facet"],): r["n_docs"]
        for r in bm25_facet_counts(spark, full_index, docs, q, "source", k_facets=1000).collect()
    }
    terms = set(q[0].split())
    matching = (
        docs.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term").isin(list(terms)))
        .select("doc_id", "source")
        .distinct()
    )
    ref = {
        (r["source"],): r["n"]
        for r in matching.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got == ref and sum(got.values()) == matching.count()

    # delete a matching doc: counts drop by exactly one in its facet
    victim = matching.limit(1).collect()[0]
    path = tempfile.mkdtemp(prefix="bm25idx_facet_ts_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        bm25_index_delete(spark, path, [int(victim["doc_id"])])
        after = {
            (r["facet"],): r["n_docs"]
            for r in bm25_facet_counts(spark, path, docs, q, "source", k_facets=1000).collect()
        }
        expect = dict(ref)
        expect[(victim["source"],)] -= 1
        expect = {k: v for k, v in expect.items() if v > 0}
        assert after == expect
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_bm25_query_boosts(spark, docs, full_index):
    """Query-time boosting: neutral boosts are a no-op, the multiplier is
    exact fixed-point on each term's contribution, and non-positive
    boosts refuse loudly."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_query_topk,
    )

    q = ["slow hash"]
    plain = sorted(map(tuple, bm25_query_topk(spark, full_index, q, k=1000).collect()))
    neutral = sorted(
        map(
            tuple,
            bm25_query_topk(
                spark, full_index, q, k=1000, boosts={"slow": 1000, "hash": 1000}
            ).collect(),
        )
    )
    assert plain == neutral
    # doubling one term: recompute expected scores from the per-term probe
    per_term = bm25_probe(spark, full_index, ["slow", "hash"], k=100000).collect()
    contrib = {}
    for r in per_term:
        mult = 2000 if r["term"] == "hash" else 1000
        contrib.setdefault(r["doc_id"], 0)
        contrib[r["doc_id"]] += (r["score_fp"] * mult) // 1000
    boosted = bm25_query_topk(
        spark, full_index, q, k=1000, boosts={"hash": 2000}
    ).collect()
    for r in boosted:
        assert contrib[r["doc_id"]] == r["score_fp"]
    with pytest.raises(ValueError, match="non-positive boost"):
        bm25_query_topk(spark, full_index, q, k=5, boosts={"hash": 0})


def test_reversed_dictionary_rides_the_add_path(spark, docs):
    """r14 lifecycle contract: once rterms/ exists, bm25_index_add
    rebuilds it — suffix_probe keeps serving across adds with NO manual
    rebuild, and the post-add result equals a fresh one-shot build's
    (the new docs' terms are suffix-searchable immediately)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        suffix_probe,
        write_reversed_terms,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_radd_")
    ref = tempfile.mkdtemp(prefix="bm25idx_radd_ref_")
    for p in (path, ref):
        shutil.rmtree(p, ignore_errors=True)
    try:
        base = docs.where(F.col("doc_id") % 5 != 3)
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        write_reversed_terms(spark, path)
        assert suffix_probe(spark, path, ["w"], k=5).count() > 0
        bm25_index_add(
            spark, docs.where(F.col("doc_id") % 5 == 3), path, "doc_id", "text"
        )
        got = suffix_probe(spark, path, ["w", "er"], k=5)  # no manual rebuild
        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        write_reversed_terms(spark, ref)
        want = suffix_probe(spark, ref, ["w", "er"], k=5)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)


def test_suffix_probe_refuses_stale_reversed_dictionary(spark, docs):
    """The staleness BACKSTOP (the lifecycle now rebuilds rterms/ on
    add/compact/merge, so staleness needs an out-of-band mutation):
    restoring an old rterms/+snapshot pair from backup over a grown
    index must REFUSE — it would silently miss the newer terms — and a
    rebuild restores service."""
    import os

    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        suffix_probe,
        write_reversed_terms,
    )

    path = tempfile.mkdtemp(prefix="bm25idx_rstale_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        base = docs.where(F.col("doc_id") % 5 != 3)
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        write_reversed_terms(spark, path)
        # save the base-corpus reversed dictionary aside (the "backup")
        for d in ("rterms", "rterms__snapshot"):
            shutil.copytree(os.path.join(path, d), os.path.join(path + "_bak", d))
        bm25_index_add(
            spark, docs.where(F.col("doc_id") % 5 == 3), path, "doc_id", "text"
        )
        assert suffix_probe(spark, path, ["w"], k=5).count() > 0  # rode the add
        # out-of-band mutation: restore the stale backup over the live dirs
        for d in ("rterms", "rterms__snapshot"):
            shutil.rmtree(os.path.join(path, d))
            shutil.copytree(os.path.join(path + "_bak", d), os.path.join(path, d))
        with pytest.raises(ValueError, match="STALE"):
            suffix_probe(spark, path, ["w"], k=5)
        write_reversed_terms(spark, path)
        assert suffix_probe(spark, path, ["w"], k=5).count() > 0
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + "_bak", ignore_errors=True)


def test_bm25_query_boost_for_absent_term_is_loud(spark, docs, full_index):
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_query_topk,
    )

    with pytest.raises(ValueError, match="not in any query"):
        bm25_query_topk(
            spark, full_index, ["slow hash"], k=5, boosts={"hsah": 2000}
        )


def test_bm25_query_page_chaining(spark, docs, full_index):
    """search_after: chained pages reproduce the global ranking exactly
    (no skips, no repeats), cursors for unknown queries refuse, and an
    exhausted ranking yields an empty page."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        bm25_query_page,
        bm25_query_topk,
    )

    q = ["slow hash", "spark window"]
    full = bm25_query_topk(spark, full_index, q, k=10).collect()
    p1 = bm25_query_page(spark, full_index, q, k=5).collect()
    after = {}
    for r in p1:
        if r["rnk"] == 5:
            after[r["query"]] = (int(r["score_fp"]), int(r["doc_id"]))
    p2 = bm25_query_page(spark, full_index, q, k=5, after=after).collect()
    chained = sorted(
        [(r["query"], r["doc_id"], r["score_fp"], r["rnk"]) for r in p1]
        + [(r["query"], r["doc_id"], r["score_fp"], r["rnk"] + 5) for r in p2]
    )
    want = sorted((r["query"], r["doc_id"], r["score_fp"], r["rnk"]) for r in full)
    assert chained == want

    with pytest.raises(ValueError, match="unknown queries"):
        bm25_query_page(spark, full_index, q, k=5, after={"nope": (1, 1)})
    # a cursor past the last hit returns an empty page, not an error
    last = max((r for r in full if r["query"] == q[0]), key=lambda r: r["rnk"])
    deep = bm25_query_page(
        spark, full_index, [q[0]], k=5,
        after={q[0]: (0, int(last["doc_id"]))},
    )
    assert deep.count() == 0
