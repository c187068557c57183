"""Round-14 serving-tier lifecycle seams.

Covers: bucket-selective compaction (value-equal to the full rewrite,
dirty-buckets-only I/O), crash-safe rename-aside swaps (loud refusal on
leftover swap dirs), the facet sidecar lifecycle (write/add/compact/
stored-vs-ad-hoc parity), search_after cursors on the positional tier,
pre-filter `allowed` semantics on the lexical leg, strict term-boost
validation, merge clash guards, and streaming with_rterms.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    bm25_facet_counts,
    bm25_facet_counts_stored,
    bm25_index_add,
    bm25_index_compact,
    bm25_index_delete,
    bm25_index_merge,
    bm25_query_topk,
    doc_facets_add,
    phrase_probe_batched,
    proximity_probe_batched,
    suffix_probe,
    write_bm25_index,
    write_doc_facets,
    write_phrase_positions,
    write_reversed_terms,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NB = 16
TERMS = ["spark", "hash", "window"]
PHRASES = ["table hash", "merge group"]


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


def _build_full(spark, docs, path, n_buckets=NB):
    """Index with every artifact family: postings + positions + facets +
    rterms."""
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=n_buckets)
    write_phrase_positions(spark, docs, path, "doc_id", "text")
    write_doc_facets(spark, path, docs, ["source"])
    write_reversed_terms(spark, path)


def _snapshot(spark, path, subs=("postings", "terms", "stats", "positions", "facets")):
    return {
        sub: sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect()
        )
        for sub in subs
        if os.path.isdir(f"{path}/{sub}")
    }


def test_selective_compact_equals_full_rewrite(spark, docs):
    """The value-equality contract: selective (dirty buckets only) and
    all_buckets=True (the reference full rewrite) land identical artifact
    content, identical removed counts, and identical probe answers —
    including the lifecycle-rebuilt reversed dictionary."""
    a = tempfile.mkdtemp(prefix="r14cmp_sel_")
    b = tempfile.mkdtemp(prefix="r14cmp_full_")
    try:
        _build_full(spark, docs, a)
        _build_full(spark, docs, b)
        victims = [int(r["doc_id"]) for r in docs.limit(3).collect()]
        bm25_index_delete(spark, a, victims)
        bm25_index_delete(spark, b, victims)
        rem_a = bm25_index_compact(spark, a)
        rem_b = bm25_index_compact(spark, b, all_buckets=True)
        assert rem_a == rem_b > 0
        sa, sb = _snapshot(spark, a), _snapshot(spark, b)
        assert set(sa) == set(sb)
        for sub in sa:
            assert sa[sub] == sb[sub], f"{sub} diverged"
        pa = sorted(map(tuple, suffix_probe(spark, a, ["w"], k=5).collect()))
        pb = sorted(map(tuple, suffix_probe(spark, b, ["w"], k=5).collect()))
        assert pa == pb  # both rterms rebuilt by compact, no manual step
        assert not os.path.isdir(f"{a}/tombstones")
        assert not os.path.isdir(f"{b}/tombstones")
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)


def test_selective_compact_touches_only_dirty_buckets(spark, docs):
    """The I/O claim behind the win: bucket dirs NOT named by the victims'
    terms keep their exact data files (same names, same bytes) across a
    selective compact — only dirty buckets are rewritten."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
        term_bucket_py,
    )

    path = tempfile.mkdtemp(prefix="r14dirty_")
    try:
        nb = 64  # wide bucket space so one doc's terms hit a strict subset
        shutil.rmtree(path, ignore_errors=True)
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=nb)
        victim = int(docs.select("doc_id").head()["doc_id"])
        vic_terms = [
            r["term"]
            for r in spark.read.parquet(f"{path}/postings")
            .where(F.col("doc_id") == victim)
            .select("term")
            .distinct()
            .collect()
        ]
        dirty = {term_bucket_py(t, nb) for t in vic_terms}
        present = {
            int(d.split("=")[1])
            for d in os.listdir(f"{path}/postings")
            if d.startswith("bucket=")
        }
        clean = sorted(present - dirty)
        assert clean, "victim's terms cover every bucket — widen n_buckets"

        def files_of(b):
            d = f"{path}/postings/bucket={b}"
            return sorted(
                (f, os.path.getsize(os.path.join(d, f)))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        before = {b: files_of(b) for b in clean}
        bm25_index_delete(spark, path, [victim])
        removed = bm25_index_compact(spark, path)
        assert removed == len(vic_terms)  # one postings row per distinct term
        for b in clean:
            assert files_of(b) == before[b], f"clean bucket {b} was rewritten"
        for b in sorted(dirty):
            got = {
                int(r["doc_id"])
                for r in spark.read.parquet(f"{path}/postings/bucket={b}").collect()
            }
            assert victim not in got
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compact_refuses_on_leftover_swap_dirs(spark, docs):
    """Crash detection: a leftover __compact (or __old) dir from a crashed
    swap makes the next compact refuse LOUDLY instead of half-completing
    and clearing tombstones over a stale sidecar (r13 ADVICE)."""
    path = tempfile.mkdtemp(prefix="r14crash_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        victim = int(docs.select("doc_id").head()["doc_id"])
        bm25_index_delete(spark, path, [victim])
        os.makedirs(f"{path}/positions__compact")
        with pytest.raises(ValueError, match="leftover swap dirs"):
            bm25_index_compact(spark, path)
        assert os.path.isdir(f"{path}/tombstones")  # nothing was cleared
        os.rmdir(f"{path}/positions__compact")
        os.makedirs(f"{path}/postings__old")
        with pytest.raises(ValueError, match="leftover swap dirs"):
            bm25_index_compact(spark, path)
        os.rmdir(f"{path}/postings__old")
        assert bm25_index_compact(spark, path) > 0  # clean state proceeds
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_facet_sidecar_lifecycle(spark, docs):
    """write + add == ad-hoc on the full corpus; deletes mask immediately
    (tombstone anti-join on the matched set); compact physically drops
    victims' sidecar rows; guards are loud."""
    path = tempfile.mkdtemp(prefix="r14facets_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        base = docs.where(F.col("doc_id") % 4 != 1)
        rest = docs.where(F.col("doc_id") % 4 == 1)
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        write_doc_facets(spark, path, base, ["source"])
        bm25_index_add(spark, rest, path, "doc_id", "text")
        doc_facets_add(spark, rest, path)
        queries = ["slow hash", "table merge group"]
        stored = sorted(map(tuple, bm25_facet_counts_stored(
            spark, path, queries, "source", k_facets=10
        ).collect()))
        adhoc = sorted(map(tuple, bm25_facet_counts(
            spark, path, docs, queries, "source", k_facets=10
        ).collect()))
        assert stored == adhoc and stored
        # deletes mask immediately, compact drops sidecar rows physically
        victims = [int(r["doc_id"]) for r in docs.limit(2).collect()]
        bm25_index_delete(spark, path, victims)
        masked = sorted(map(tuple, bm25_facet_counts_stored(
            spark, path, queries, "source", k_facets=10
        ).collect()))
        bm25_index_compact(spark, path)
        compacted = sorted(map(tuple, bm25_facet_counts_stored(
            spark, path, queries, "source", k_facets=10
        ).collect()))
        assert masked == compacted
        left = {
            int(r["doc_id"])
            for r in spark.read.parquet(f"{path}/facets").select("doc_id").collect()
        }
        assert not (left & set(victims))
        # loud guards (duplicate probe must use a doc that SURVIVED the
        # compact — a compacted victim is legally re-addable)
        survivor = rest.where(~F.col("doc_id").isin(victims)).limit(1)
        with pytest.raises(ValueError, match="already has facets"):
            doc_facets_add(spark, survivor, path)
        with pytest.raises(ValueError, match="lacks stored facet columns"):
            doc_facets_add(
                spark,
                spark.createDataFrame([(10**9,)], "doc_id long"),
                path,
            )
        with pytest.raises(ValueError, match="not in .* sidecar|not in the sidecar"):
            bm25_facet_counts_stored(spark, path, queries, "nope")
        other = tempfile.mkdtemp(prefix="r14nofacets_")
        try:
            shutil.rmtree(other, ignore_errors=True)
            write_bm25_index(spark, base, other, "doc_id", "text", n_buckets=NB)
            with pytest.raises(ValueError, match="no facet sidecar"):
                bm25_facet_counts_stored(spark, other, queries, "source")
        finally:
            shutil.rmtree(other, ignore_errors=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def pos_index(spark, docs):
    path = tempfile.mkdtemp(prefix="r14pos_")
    _build_full(spark, docs, path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_phrase_pagination_chaining(spark, pos_index):
    """p1 + p2(after=p1's last) == global top-2k with page-local ranks;
    cursors for unknown phrases refuse."""
    k = 3
    full = phrase_probe_batched(spark, pos_index, PHRASES, k=2 * k).collect()
    p1 = phrase_probe_batched(spark, pos_index, PHRASES, k=k).collect()
    after = {}
    for r in p1:
        cur = after.get(r["phrase"])
        if cur is None or r["rnk"] > cur[2]:
            after[r["phrase"]] = (int(r["phrase_tf"]), int(r["doc_id"]), r["rnk"])
    p2 = phrase_probe_batched(
        spark, pos_index, PHRASES, k=k,
        after={p: (tf, d) for p, (tf, d, _) in after.items()},
    ).collect()
    got = sorted(
        [(r["phrase"], r["doc_id"], r["phrase_tf"], r["rnk"]) for r in p1]
        + [(r["phrase"], r["doc_id"], r["phrase_tf"], r["rnk"] + k) for r in p2]
    )
    want = sorted(
        (r["phrase"], r["doc_id"], r["phrase_tf"], r["rnk"]) for r in full
    )
    assert got == want
    with pytest.raises(ValueError, match="unknown keys"):
        phrase_probe_batched(
            spark, pos_index, PHRASES, k=k, after={"nope nope": (1, 1)}
        )


def test_proximity_pagination_chaining(spark, pos_index):
    pairs = [("table", "hash", 2), ("merge", "group", 1)]
    k = 3
    full = proximity_probe_batched(spark, pos_index, pairs, k=2 * k).collect()
    p1 = proximity_probe_batched(spark, pos_index, pairs, k=k).collect()
    after = {}
    for r in p1:
        key = (r["w1"], r["w2"], r["slop"])
        cur = after.get(key)
        if cur is None or r["rnk"] > cur[2]:
            after[key] = (int(r["prox_tf"]), int(r["doc_id"]), r["rnk"])
    p2 = proximity_probe_batched(
        spark, pos_index, pairs, k=k,
        after={key: (tf, d) for key, (tf, d, _) in after.items()},
    ).collect()
    key_cols = ("w1", "w2", "slop", "doc_id", "prox_tf")
    got = sorted(
        [tuple(r[c] for c in key_cols) + (r["rnk"],) for r in p1]
        + [tuple(r[c] for c in key_cols) + (r["rnk"] + k,) for r in p2]
    )
    want = sorted(tuple(r[c] for c in key_cols) + (r["rnk"],) for r in full)
    assert got == want
    with pytest.raises(ValueError, match="unknown pairs"):
        proximity_probe_batched(
            spark, pos_index, pairs, k=k, after={("a", "b", 0): (1, 1)}
        )


def test_bm25_query_allowed_is_prefilter(spark, docs, pos_index):
    """allowed= restricts candidates BEFORE the top-k with corpus-wide
    stats: the filtered top-k equals filter-then-rerank of the FULL
    unfiltered ranking (scores unchanged), and k survivors come back
    whenever k eligible docs match."""
    queries = ["slow hash", "table merge group"]
    k = 5
    allowed = docs.where(F.col("doc_id") % 3 == 0).select("doc_id")
    got = bm25_query_topk(
        spark, pos_index, queries, k=k, allowed=allowed
    ).collect()
    full = bm25_query_topk(spark, pos_index, queries, k=10**6).collect()
    want = []
    for q in queries:
        rows = sorted(
            (r for r in full if r["query"] == q and r["doc_id"] % 3 == 0),
            key=lambda r: (-r["score_fp"], r["doc_id"]),
        )
        eligible = len(rows)
        page = rows[:k]
        assert len(page) == min(k, eligible)  # k-survivors property
        want += [
            (q, r["doc_id"], r["n_terms"], r["score_fp"], i + 1)
            for i, r in enumerate(page)
        ]
    assert sorted(map(tuple, got)) == sorted(want)
    assert all(r["doc_id"] % 3 == 0 for r in got)


def test_boost_validation_rejects_floats_and_tiny_values(spark, pos_index):
    with pytest.raises(ValueError, match="fixed-point int"):
        bm25_query_topk(spark, pos_index, ["slow hash"], boosts={"hash": 2.0})
    with pytest.raises(ValueError, match="fixed-point int"):
        bm25_query_topk(spark, pos_index, ["slow hash"], boosts={"hash": True})
    with pytest.raises(ValueError, match="suspiciously small"):
        bm25_query_topk(spark, pos_index, ["slow hash"], boosts={"hash": 2})
    with pytest.raises(ValueError, match="non-positive"):
        bm25_query_topk(spark, pos_index, ["slow hash"], boosts={"hash": 0})


def test_merge_out_path_clash_guards(spark):
    """Both merge tiers refuse out_path ∈ in_paths before touching disk."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_index_merge,
    )

    with pytest.raises(ValueError, match="one of the inputs"):
        bm25_index_merge(spark, "/tmp/r14_x", ["/tmp/r14_x", "/tmp/r14_y"])
    with pytest.raises(ValueError, match="one of the inputs"):
        ivf_pq_index_merge(spark, "/tmp/r14_x", ["/tmp/r14_y", "/tmp/r14_x/"])


def test_merge_rebuilds_rterms_and_facets(spark, docs):
    """A merged index serves suffix queries (rterms rebuilt from the merged
    dictionary — any input carrying rterms) and stored facets (union of
    the inputs' sidecars); facets on only SOME inputs refuses."""
    a = tempfile.mkdtemp(prefix="r14mrg_a_")
    b = tempfile.mkdtemp(prefix="r14mrg_b_")
    out = tempfile.mkdtemp(prefix="r14mrg_out_")
    ref = tempfile.mkdtemp(prefix="r14mrg_ref_")
    try:
        da = docs.where(F.col("doc_id") % 2 == 0)
        db = docs.where(F.col("doc_id") % 2 == 1)
        for p, d in ((a, da), (b, db)):
            shutil.rmtree(p, ignore_errors=True)
            write_bm25_index(spark, d, p, "doc_id", "text", n_buckets=NB)
            write_doc_facets(spark, p, d, ["source"])
        write_reversed_terms(spark, a)  # only ONE input carries rterms
        shutil.rmtree(out, ignore_errors=True)
        bm25_index_merge(spark, out, [a, b])
        _build_full(spark, docs, ref)
        got_sfx = sorted(map(tuple, suffix_probe(spark, out, ["w"], k=5).collect()))
        want_sfx = sorted(map(tuple, suffix_probe(spark, ref, ["w"], k=5).collect()))
        assert got_sfx == want_sfx
        q = ["slow hash"]
        got_f = sorted(map(tuple, bm25_facet_counts_stored(
            spark, out, q, "source"
        ).collect()))
        want_f = sorted(map(tuple, bm25_facet_counts_stored(
            spark, ref, q, "source"
        ).collect()))
        assert got_f == want_f
        # all-or-none facets guard
        shutil.rmtree(f"{b}/facets")
        shutil.rmtree(out, ignore_errors=True)
        with pytest.raises(ValueError, match="facets/ present on only some"):
            bm25_index_merge(spark, out, [a, b])
    finally:
        for p in (a, b, out, ref):
            shutil.rmtree(p, ignore_errors=True)


def test_stream_with_positions_missing_sidecar_is_loud(spark, docs):
    """with_positions=True against a pre-existing index built WITHOUT the
    positional sidecar fails BEFORE the stream starts, with the bootstrap
    instruction (r13 ADVICE) — not an opaque AnalysisException mid-add."""
    from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
        read_documents_stream,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
        run_bm25_index_stream,
    )

    path = tempfile.mkdtemp(prefix="r14st_nopos_")
    landing = tempfile.mkdtemp(prefix="r14st_land_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        base = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text").write.mode(
            "overwrite"
        ).parquet(landing)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text")
        with pytest.raises(ValueError, match="no positions/ sidecar"):
            run_bm25_index_stream(
                stream, path, "doc_id", "text", n_buckets=NB, with_positions=True
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(landing, ignore_errors=True)


def test_stream_with_rterms_serves_suffix_at_end(spark, docs):
    """with_rterms=True: the streamed index answers suffix queries with no
    manual rebuild, equal to a one-shot build + write_reversed_terms —
    including when the stream EXTENDS a pre-existing index whose rterms
    are bootstrapped at stream start."""
    from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
        read_documents_stream,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
        run_bm25_index_stream,
    )

    path = tempfile.mkdtemp(prefix="r14st_rt_")
    landing = tempfile.mkdtemp(prefix="r14st_rtland_")
    ref = tempfile.mkdtemp(prefix="r14st_rtref_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        base = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        # pre-existing index with NO rterms: the stream bootstraps it
        write_bm25_index(spark, base, path, "doc_id", "text", n_buckets=NB)
        docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text").repartition(
            2
        ).write.mode("overwrite").parquet(landing)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text")
        run_bm25_index_stream(
            stream, path, "doc_id", "text", n_buckets=NB, with_rterms=True
        )
        got = sorted(map(tuple, suffix_probe(spark, path, ["w", "er"], k=5).collect()))
        shutil.rmtree(ref, ignore_errors=True)
        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        write_reversed_terms(spark, ref)
        want = sorted(map(tuple, suffix_probe(spark, ref, ["w", "er"], k=5).collect()))
        assert got == want
    finally:
        for p in (path, ref):
            shutil.rmtree(p, ignore_errors=True)
        shutil.rmtree(landing, ignore_errors=True)


def test_rebuild_over_live_index_refuses(spark, docs):
    """write_bm25_index replaces only the three core artifacts, so a
    rebuild over a path still holding per-document sidecars would leave
    them silently describing the OLD corpus — refused loudly."""
    path = tempfile.mkdtemp(prefix="r14rebuild_")
    try:
        _build_full(spark, docs, path)
        with pytest.raises(ValueError, match="sidecar state"):
            write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
        for d in ("positions", "facets", "facet_stats", "rterms"):
            shutil.rmtree(f"{path}/{d}")
        # core-only index: rebuild is legal (nothing left to go stale)
        write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=NB)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_with_facets(spark, docs):
    """with_facets: the streamed facet sidecar equals the one-shot build's
    (batching-independent, per-document rows); a pre-existing index
    without the sidecar refuses up front."""
    from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
        read_documents_stream,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.index_maintenance import (
        run_bm25_index_stream,
    )

    path = tempfile.mkdtemp(prefix="r14st_fac_")
    landing = tempfile.mkdtemp(prefix="r14st_facland_")
    ref = tempfile.mkdtemp(prefix="r14st_facref_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        docs.select("doc_id", "text", "source").repartition(3).write.mode(
            "overwrite"
        ).parquet(landing)
        stream = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text", "source")
        run_bm25_index_stream(
            stream, path, "doc_id", "text", n_buckets=NB, with_facets=["source"]
        )
        shutil.rmtree(ref, ignore_errors=True)
        write_bm25_index(spark, docs, ref, "doc_id", "text", n_buckets=NB)
        write_doc_facets(spark, ref, docs, ["source"])
        got = sorted(tuple(r) for r in spark.read.parquet(f"{path}/facets").collect())
        want = sorted(tuple(r) for r in spark.read.parquet(f"{ref}/facets").collect())
        assert got == want
        q = ["slow hash"]
        gf = sorted(map(tuple, bm25_facet_counts_stored(spark, path, q, "source").collect()))
        wf = sorted(map(tuple, bm25_facet_counts_stored(spark, ref, q, "source").collect()))
        assert gf == wf
        # pre-existing index without the sidecar refuses up front
        shutil.rmtree(f"{ref}/facets")
        stream2 = read_documents_stream(
            spark, landing, glob="*.parquet", max_files_per_trigger=1
        ).select("doc_id", "text", "source")
        with pytest.raises(ValueError, match="no facets/ sidecar"):
            run_bm25_index_stream(
                stream2, ref, "doc_id", "text", n_buckets=NB, with_facets=["source"]
            )
    finally:
        for p in (path, ref):
            shutil.rmtree(p, ignore_errors=True)
        shutil.rmtree(landing, ignore_errors=True)


def test_batched_probe_rejects_ragged_query_vectors(spark, sf_small):
    """The numpy LUT build refuses wrong-length query vectors loudly (the
    scalar loop silently zip-truncated them)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.ivf_index import (
        ivf_pq_probe_batched,
        train_ivf_pq_meta,
        write_ivf_pq_index,
    )

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    meta = train_ivf_pq_meta(
        emb, "vec_id", "v", ncent=4, m=8, dsub=8, ksub=8, iters=1, round_to=6
    )
    path = tempfile.mkdtemp(prefix="r14rag_")
    try:
        shutil.rmtree(path, ignore_errors=True)
        write_ivf_pq_index(spark, emb, path, meta, "vec_id", "v")
        with pytest.raises(ValueError, match="must all be length"):
            ivf_pq_probe_batched(
                spark, path, [(0, [0.0] * 63)], k=3, nprobe=2
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
