"""Streaming index maintenance: the persisted-index add paths driven by a
Structured Streaming file source.

The landing-zone pattern (same as streaming/incremental.py): upstream
writers drop immutable document files into a directory; each micro-batch
flows through ``foreachBatch`` into the index lifecycle — the FIRST
batch materializes the index (operators/text_index.write_bm25_index),
every later batch is an incremental add (bm25_index_add: postings append
into bucket partitions + partition-selective df-merge + stats rewrite).
Because add-then-add is bit-identical to one-shot build (the
add-invisibility property asserted in tests/test_text_index.py), the
final index is INDEPENDENT of how the files split into micro-batches —
asserted against a one-shot build in tests/test_index_stream.py.

Why foreachBatch: the add path is write-side DDL-ish work (partitioned
appends, dynamic partition overwrite of dictionary buckets) that has no
streaming-operator form; foreachBatch hands over full batch semantics
per micro-batch. Per-batch WRITE cost is O(batch) — no existing postings
or codes bytes are rewritten — and stats roll forward from the stored
(n_docs, sum_dl) row plus the batch aggregate; the one O(corpus) touch
left is the optional duplicate-id guard, a single column-pruned scan of
stored ids (disable ``check_duplicates`` when upstream guarantees
exactly-once ids to make the whole batch corpus-free).

Replay boundary, honestly: after a crash between the postings append and
the checkpoint commit, the file source re-delivers the batch and
``bm25_index_add``'s duplicate guard raises LOUDLY instead of silently
double-counting postings — recovery is rebuild-from-landing-zone (the
corpus is the immutable source of truth; the index is derived state). A
production-hardened variant would stage each batch's appends under a
batch_id-keyed subdir and commit atomically; the loud-failure contract
here is the honest single-writer version of that.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

from ..operators.text_index import (
    bm25_index_add,
    doc_facets_add,
    phrase_positions_add,
    write_bm25_index,
    write_reversed_terms,
)

_POSTINGS = "postings"
_POSITIONS = "positions"
_FACETS = "facets"
_RTERMS = "rterms"


def run_bm25_index_stream(
    doc_stream: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    checkpoint: str | None = None,
    with_positions: bool = False,
    with_rterms: bool = False,
    with_facets: list[str] | None = None,
    maintain: dict | None = None,
) -> dict | None:
    """Drain a finite document stream (AvailableNow) into the BM25 index
    at ``path``: first non-empty batch builds, later batches add.

    ``with_positions=True`` maintains the phrase/proximity positional
    sidecar (``positions/``) in the SAME foreachBatch — a streaming
    deployment that serves phrase queries needs the sidecar to ride the
    same adds as the scoring postings, or a doc becomes BM25-searchable
    before it is phrase-searchable. Positions are per-document state
    (appends touch zero existing bytes), so the sidecar is as batching-
    independent as the postings; both duplicate guards fire on replay.
    Against a PRE-EXISTING index built without the sidecar this raises
    an actionable error BEFORE the stream starts (the add path cannot
    conjure past docs' positions): bootstrap with write_phrase_positions
    over the full corpus first.

    ``with_rterms=True`` keeps the suffix tier's reversed dictionary
    (``rterms/``) riding the stream: it is bootstrapped here if missing
    (a pure, vocabulary-sized function of terms/ — unlike positions it
    CAN be conjured from the index itself), and bm25_index_add then
    rebuilds it on every later batch, so suffix_probe keeps serving at
    every commit point instead of hard-refusing on the staleness guard.

    ``with_facets`` (a facet-column list) maintains the facet sidecar
    (``facets/``) in the same foreachBatch — stream rows must carry the
    columns. Like positions, past docs' facets cannot be conjured from
    the index, so a pre-existing index without the sidecar fails loudly
    up front with the write_doc_facets bootstrap instruction.

    ``maintain`` (optional kwargs for
    operators/index_admin.maintain_bm25_segment; pass ``{}`` for the
    defaults) runs ONE idempotent maintenance pass after the stream
    drains — the streaming deployment shape where ingestion and
    maintenance share a schedule: drain the landing zone, then compact
    if accumulated deletes crossed the tombstone-ratio trigger and heal
    any stale sidecar. Returns that report dict, else None."""
    state = {"initialized": os.path.isdir(os.path.join(path, _POSTINGS))}
    if state["initialized"]:
        spark0 = doc_stream.sparkSession
        if with_positions and not os.path.isdir(os.path.join(path, _POSITIONS)):
            # the add path appends per-document positions; it can never
            # backfill docs indexed before the sidecar existed — failing
            # here beats phrase_positions_add's opaque AnalysisException
            # on the missing dir mid-stream (r13 ADVICE)
            raise ValueError(
                f"run_bm25_index_stream: with_positions=True but the index "
                f"at {path} has no positions/ sidecar — bootstrap it over "
                "the FULL corpus with write_phrase_positions(spark, docs, "
                "path, id_col, text_col) before streaming adds"
            )
        if with_facets and not os.path.isdir(os.path.join(path, _FACETS)):
            raise ValueError(
                f"run_bm25_index_stream: with_facets={with_facets!r} but the "
                f"index at {path} has no facets/ sidecar — bootstrap it over "
                "the FULL corpus with write_doc_facets(spark, docs, path, "
                "facet_cols) before streaming adds"
            )
        if with_rterms and not os.path.isdir(os.path.join(path, _RTERMS)):
            write_reversed_terms(spark0, path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if not state["initialized"]:
            # the fused build (r19) shares the tokenize scan and writes
            # every requested sidecar in the same pooled phase — the
            # sidecars still ride the SAME foreachBatch commit point as
            # the sequential form, just overlapped instead of serial
            write_bm25_index(
                spark, batch_df, path, id_col, text_col, n_buckets=n_buckets,
                positions=with_positions,
                reversed_terms=with_rterms,
                facet_cols=with_facets,
            )
            state["initialized"] = True
        else:
            bm25_index_add(spark, batch_df, path, id_col, text_col)
            if with_positions:
                phrase_positions_add(spark, batch_df, path, id_col, text_col)
            if with_facets:
                doc_facets_add(spark, batch_df, path, id_col)

    q = (
        doc_stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="bm25_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if maintain is not None and state["initialized"]:
        from ..operators.index_admin import maintain_bm25_segment

        return maintain_bm25_segment(doc_stream.sparkSession, path, **maintain)
    return None


def run_ivf_index_stream(
    vec_stream: DataFrame,
    path: str,
    meta: dict,
    id_col: str = "vec_id",
    vec_col: str = "v",
    checkpoint: str | None = None,
    maintain: dict | None = None,
) -> dict | None:
    """Vector twin: drain a finite embedding stream into the IVF-PQ index
    at ``path``. ``meta`` (codebooks + centroids) is TRAINED BEFOREHAND on
    a sample — the FAISS train-once-add-forever contract; streams only
    ever assign + encode, so the final index is the same batching-
    independent function of the corpus as the BM25 case. First non-empty
    batch materializes the index (codes + meta sidecar), later batches
    append into their cluster partitions.

    ``maintain`` (optional kwargs for
    operators/index_admin.maintain_ivf_segment; ``{}`` for defaults) runs
    one idempotent post-drain maintenance pass — the same drain-then-
    maintain schedule as the BM25 stream — and returns its report."""
    from ..operators.ivf_index import ivf_pq_index_add, write_ivf_pq_index

    state = {"initialized": os.path.isdir(os.path.join(path, "codes"))}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if not state["initialized"]:
            write_ivf_pq_index(spark, batch_df, path, meta, id_col, vec_col)
            state["initialized"] = True
        else:
            ivf_pq_index_add(spark, batch_df, path, id_col, vec_col)

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ivf_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if maintain is not None and state["initialized"]:
        from ..operators.index_admin import maintain_ivf_segment

        return maintain_ivf_segment(vec_stream.sparkSession, path, **maintain)
    return None


def run_hybrid_index_stream(
    doc_vec_stream: DataFrame,
    bm_path: str,
    ivf_path: str,
    meta: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "v",
    n_buckets: int = 16,
    checkpoint: str | None = None,
) -> None:
    """Drain a finite (id, text, vector) stream into BOTH serving indexes
    from ONE ``foreachBatch`` — the ingestion shape behind a hybrid
    retrieval deployment, where the lexical and vector tiers must index
    the SAME document set at every commit point. A dual-writer setup (two
    independent streams) can expose a window where a doc is searchable in
    one tier but not the other; a single handler narrows that to the two
    in-batch writes (and a crash between them is caught by whichever
    index's duplicate guard trips on replay — the same loud-failure
    recovery contract as the single-index streams, with the landing zone
    as the source of truth).

    Rows may carry text, a vector, or both (the stream is the OUTER union
    of the two modalities — a doc without an embedding must still reach
    the lexical tier, not silently drop from the corpus): each tier
    indexes its non-null slice, initializing on its first non-empty one.
    Each tier's add is the same O(batch) work as its single-index stream,
    and each final index is the same batching-independent function of the
    corpus — so the post-stream hybrid probe shares sim_hybrid_stored's
    oracle verbatim (plans/serving_ext.py:st_hybrid_index).
    """
    from pyspark.sql import functions as F

    from ..operators.ivf_index import ivf_pq_index_add, write_ivf_pq_index

    state = {
        "bm": os.path.isdir(os.path.join(bm_path, _POSTINGS)),
        "ivf": os.path.isdir(os.path.join(ivf_path, "codes")),
    }

    from concurrent.futures import ThreadPoolExecutor

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        docs = batch_df.where(F.col(text_col).isNotNull()).select(id_col, text_col)
        vecs = batch_df.where(F.col(vec_col).isNotNull()).select(id_col, vec_col)

        # The two tiers write to DIFFERENT index directories from DIFFERENT
        # column slices — independent jobs, so run them concurrently and
        # let each back-fill the other's task tails (r18; guide §2.6
        # pattern, same as write_bm25_index's artifact writes). Lockstep is
        # a commit-point property and both tiers complete before handle
        # returns, so every commit still has both indexes covering the same
        # doc set; a crash while BOTH are in flight is caught on replay by
        # whichever duplicate guard trips — the same loud-failure recovery
        # as the sequential form (which had the identical window between
        # its two writes).
        def lex_tier() -> None:
            if not docs.isEmpty():
                if not state["bm"]:
                    write_bm25_index(
                        spark, docs, bm_path, id_col, text_col, n_buckets=n_buckets
                    )
                    state["bm"] = True
                else:
                    bm25_index_add(spark, docs, bm_path, id_col, text_col)

        def vec_tier() -> None:
            if not vecs.isEmpty():
                if not state["ivf"]:
                    write_ivf_pq_index(spark, vecs, ivf_path, meta, id_col, vec_col)
                    state["ivf"] = True
                else:
                    ivf_pq_index_add(spark, vecs, ivf_path, id_col, vec_col)

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(lex_tier), pool.submit(vec_tier)]:
                f.result()

    q = (
        doc_vec_stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="hybrid_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
