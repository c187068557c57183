"""Index ADMINISTRATION: the maintenance brain around the persisted
serving indexes — segment inventory, a tiered merge POLICY (which
segments to merge, not just how — operators/text_index.py:bm25_index_merge
is the mechanism), and a one-row describe for dashboards/tests.

Why a policy matters at 100 TB: per-shard / per-day builds leave a long
tail of small segments; probing S segments costs S pruned scans, but
merging EVERYTHING into one segment re-writes the whole corpus every
cycle. Lucene's TieredMergePolicy resolves the tension by merging only
peers of similar (small) size and never touching segments that already
reached the max size — rewrite amplification stays logarithmic in corpus
size. The planner below is that shape, deterministic and pure (unit-
testable without Spark); execution composes the existing merge op.

Reference scope note: the reference repo (kdivringi/
data-wrangle-openstreetmaps-data_1) has no serving index at all — its
query tier is a one-shot MongoDB load (data_wrangler.py / readme.md);
this module belongs to the LLM-pipeline serving extension the build
brief asks for beyond the reference surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text_index import (
    _FACET_STATS,
    _FACETS,
    _POSITIONS,
    _RTERMS,
    _STATS,
    _TERMS,
    _TOMBSTONES,
    bm25_index_merge,
    read_index_meta,
)


def plan_segment_merges(
    segments: dict[str, int],
    *,
    max_merge_at_once: int = 4,
    max_merged_docs: int | None = None,
    target_segment_count: int = 1,
) -> list[list[str]]:
    """Tiered merge PLANNING (Lucene TieredMergePolicy's shape, one
    pass): given segment name -> live doc count, return the list of
    merge groups (each a list of >= 2 segment names) a maintenance cycle
    should execute.

    Policy, deterministic and pure:

    - segments with ``n_docs >= max_merged_docs`` are NEVER merge inputs
      (they are done growing — rewriting them again is the amplification
      Lucene's policy exists to avoid). ``None`` disables the ceiling.
    - remaining segments sort by (n_docs asc, name asc) — smallest-first,
      so each merge buys the biggest segment-count reduction per byte
      rewritten.
    - groups take up to ``max_merge_at_once`` consecutive smallest
      segments, never letting a group's combined size cross
      ``max_merged_docs``; a group needs >= 2 members to be a merge.
    - planning stops once executing the plan would leave
      <= ``target_segment_count`` segments.

    ONE pass, no cascade: a merged result does not re-enter this plan
    (real maintenance loops re-plan each cycle on fresh stats — and a
    cascaded plan would re-write the same docs twice in one cycle, the
    exact amplification the policy bounds). Callers execute with
    :func:`execute_merge_plan` and re-plan next cycle."""
    if max_merge_at_once < 2:
        raise ValueError(
            f"plan_segment_merges: max_merge_at_once {max_merge_at_once!r} "
            "must be >= 2 (a 1-way merge is a copy)"
        )
    if target_segment_count < 1:
        raise ValueError(
            f"plan_segment_merges: target_segment_count "
            f"{target_segment_count!r} must be >= 1"
        )
    bad = {n: c for n, c in segments.items() if c < 0}
    if bad:
        raise ValueError(f"plan_segment_merges: negative doc counts: {bad}")
    eligible = sorted(
        (
            (c, n)
            for n, c in segments.items()
            if max_merged_docs is None or c < max_merged_docs
        ),
    )
    plan: list[list[str]] = []
    remaining_total = len(segments)
    i = 0
    while i < len(eligible) and remaining_total > target_segment_count:
        group = [eligible[i]]
        j = i + 1
        while (
            j < len(eligible)
            and len(group) < max_merge_at_once
            # extending to len(group)+1 members leaves
            # remaining_total - len(group) segments after execution
            and remaining_total - len(group) >= target_segment_count
            and (
                max_merged_docs is None
                or sum(c for c, _n in group) + eligible[j][0] <= max_merged_docs
            )
        ):
            group.append(eligible[j])
            j += 1
        if len(group) < 2:
            break  # smallest survivor can't pair up under the ceiling
        plan.append([n for _c, n in group])
        remaining_total -= len(group) - 1
        i = j
    return plan


def bm25_segment_stats(spark: SparkSession, paths: list[str]) -> dict[str, int]:
    """Live doc counts per segment, from each segment's own tiny
    ``stats/`` row (minus pending tombstones — the planner should see
    post-compact reality). Input to :func:`plan_segment_merges`."""
    out: dict[str, int] = {}
    for p in paths:
        read_index_meta(spark, p)  # loud if not an index
        n = int(spark.read.parquet(f"{p}/{_STATS}").collect()[0]["n_docs"])
        if os.path.isdir(f"{p}/{_TOMBSTONES}"):
            n -= spark.read.parquet(f"{p}/{_TOMBSTONES}").count()
        out[p] = n
    return out


def execute_merge_plan(
    spark: SparkSession,
    plan: list[list[str]],
    out_dir: str,
) -> list[str]:
    """Execute a :func:`plan_segment_merges` plan: each group merges into
    ``out_dir/merged_{i}`` via bm25_index_merge (which enforces the
    disjointness / n_buckets / sidecar-parity contracts). Returns the new
    segment paths in plan order. The caller retires the inputs once the
    outputs exist — same publish-then-retire discipline as compaction."""
    seen: set[str] = set()
    for g in plan:
        for p in g:
            if p in seen:
                raise ValueError(
                    f"execute_merge_plan: segment {p!r} appears in two "
                    "merge groups — a plan must partition its inputs"
                )
            seen.add(p)
    outs = []
    for i, g in enumerate(plan):
        out = os.path.join(out_dir, f"merged_{i}")
        bm25_index_merge(spark, out, g)
        outs.append(out)
    return outs


def bm25_index_describe(spark: SparkSession, path: str) -> DataFrame:
    """One-row inventory of an index's artifacts — the `_cat/indices`
    shape: corpus stats, dictionary size, bucket count, pending
    tombstones, and which optional sidecars (positions / facets /
    reversed dictionary) this segment carries. Every input is an
    index-artifact read (the stats row, the vocabulary-sized dictionary
    count, directory probes) — nothing corpus-sized."""
    meta = read_index_meta(spark, path)
    st = spark.read.parquet(f"{path}/{_STATS}").collect()[0]
    n_terms = spark.read.parquet(f"{path}/{_TERMS}").count()
    n_tomb = (
        spark.read.parquet(f"{path}/{_TOMBSTONES}").count()
        if os.path.isdir(f"{path}/{_TOMBSTONES}")
        else 0
    )
    row = {
        "n_docs": int(st["n_docs"]),
        "avgdl_fp": int(st["avgdl_fp"]),
        "n_terms": int(n_terms),
        "n_buckets": int(meta["n_buckets"]),
        "n_tombstones": int(n_tomb),
        "has_positions": os.path.isdir(f"{path}/{_POSITIONS}"),
        "has_facets": os.path.isdir(f"{path}/{_FACETS}"),
        "has_facet_stats": os.path.isdir(f"{path}/{_FACET_STATS}"),
        "has_rterms": os.path.isdir(f"{path}/{_RTERMS}"),
    }
    return spark.createDataFrame(
        [row],
        "n_docs long, avgdl_fp long, n_terms long, n_buckets int, "
        "n_tombstones long, has_positions boolean, has_facets boolean, "
        "has_facet_stats boolean, has_rterms boolean",
    )


def ivf_segment_stats(spark: SparkSession, paths: list[str]) -> dict[str, int]:
    """Live VECTOR counts per IVF-PQ segment (codes rows minus pending
    tombstones) — the vector-tier twin of :func:`bm25_segment_stats`, so
    :func:`plan_segment_merges` plans both tiers with one policy.
    ``count()`` on a parquet path resolves from row-group metadata, not
    a data scan."""
    from .ivf_index import _CODES as IVF_CODES
    from .ivf_index import _TOMBSTONES as IVF_TOMBSTONES
    from .ivf_index import read_ivf_pq_meta

    out: dict[str, int] = {}
    for p in paths:
        read_ivf_pq_meta(spark, p)  # loud if not an IVF-PQ index
        n = spark.read.parquet(f"{p}/{IVF_CODES}").count()
        if os.path.isdir(f"{p}/{IVF_TOMBSTONES}"):
            n -= spark.read.parquet(f"{p}/{IVF_TOMBSTONES}").count()
        out[p] = n
    return out


def execute_ivf_merge_plan(
    spark: SparkSession,
    plan: list[list[str]],
    out_dir: str,
) -> list[str]:
    """Execute a :func:`plan_segment_merges` plan on the VECTOR tier:
    each group merges into ``out_dir/merged_{i}`` via ivf_pq_index_merge
    (which enforces the shared-meta / disjoint-ids / no-tombstones
    contracts). Same publish-then-retire discipline as the text twin."""
    seen: set[str] = set()
    for g in plan:
        for p in g:
            if p in seen:
                raise ValueError(
                    f"execute_ivf_merge_plan: segment {p!r} appears in two "
                    "merge groups — a plan must partition its inputs"
                )
            seen.add(p)
    from .ivf_index import ivf_pq_index_merge

    outs = []
    for i, g in enumerate(plan):
        out = os.path.join(out_dir, f"merged_{i}")
        ivf_pq_index_merge(spark, out, g)
        outs.append(out)
    return outs


def maintain_bm25_segment(
    spark: SparkSession,
    path: str,
    *,
    tombstone_ratio: float = 0.1,
    force_compact: bool = False,
) -> dict:
    """ONE idempotent maintenance pass over a single BM25 segment — the
    per-segment half of :func:`maintain_bm25`:

    1. **compaction trigger**: pending tombstones / stored n_docs >=
       ``tombstone_ratio`` (or ``force_compact``) runs the
       bucket-selective :func:`~.text_index.bm25_index_compact` — which
       already heals the doc-keyed sidecars (positions/facets/rterms/
       facet_stats) it touches;
    2. **sidecar heals** for drift left by pre-lifecycle code paths or
       partial commits, each a pure function of index artifacts:
       rterms/ stale against the terms/ snapshot -> write_reversed_terms;
       facets/ present but facet_stats/ missing -> write_facet_stats.

    Idempotent by construction: a second immediate run finds no
    tombstones over threshold and no stale sidecars, and reports all
    no-ops. Returns {compacted, postings_rows_removed, healed,
    n_tombstones_before, n_docs}."""
    from .text_index import (
        _terms_snapshot,
        bm25_index_compact,
        write_facet_stats,
        write_reversed_terms,
    )

    if not 0.0 < tombstone_ratio <= 1.0:
        raise ValueError(
            f"maintain_bm25_segment: tombstone_ratio {tombstone_ratio!r} "
            "must be in (0, 1]"
        )
    read_index_meta(spark, path)  # loud if not an index
    n_docs = int(spark.read.parquet(f"{path}/{_STATS}").collect()[0]["n_docs"])
    n_tomb = (
        spark.read.parquet(f"{path}/{_TOMBSTONES}").count()
        if os.path.isdir(f"{path}/{_TOMBSTONES}")
        else 0
    )
    report = {
        "compacted": False,
        "postings_rows_removed": 0,
        "healed": [],
        "n_tombstones_before": n_tomb,
        "n_docs": n_docs,
    }
    if n_tomb and (force_compact or n_docs == 0 or n_tomb / n_docs >= tombstone_ratio):
        report["postings_rows_removed"] = bm25_index_compact(spark, path)
        report["compacted"] = True
    if os.path.isdir(f"{path}/{_RTERMS}"):
        snap_dir = f"{path}/{_RTERMS}__snapshot"
        snap = (
            spark.read.parquet(snap_dir).head()
            if os.path.isdir(snap_dir)
            else None
        )
        if snap is None or (
            int(snap["terms_count"]),
            int(snap["terms_df_sum"]),
        ) != _terms_snapshot(spark, path):
            write_reversed_terms(spark, path)
            report["healed"].append("rterms")
    if os.path.isdir(f"{path}/{_FACETS}") and not os.path.isdir(
        f"{path}/{_FACET_STATS}"
    ):
        write_facet_stats(spark, path)
        report["healed"].append("facet_stats")
    return report


def maintain_bm25(
    spark: SparkSession,
    segments: list[str],
    out_dir: str,
    *,
    tombstone_ratio: float = 0.1,
    max_merge_at_once: int = 4,
    max_merged_docs: int | None = None,
    target_segment_count: int = 1,
) -> dict:
    """ONE maintenance cycle over a BM25 segment set — the single entry a
    deployment schedules (r14 verdict task 5), composing the pieces that
    already exist: per-segment tombstone-triggered compaction + sidecar
    heals (:func:`maintain_bm25_segment`), then the tiered merge policy
    (:func:`plan_segment_merges` on post-compact live counts) executed
    with :func:`execute_merge_plan`. Segments entering a merge group are
    force-compacted first — both merge ops refuse pending tombstones
    (Lucene's merges-drop-deletes, made explicit).

    Rewrite amplification stays bounded by the policy: compaction
    rewrites only dirty buckets, merges only group peers of similar
    (small) size and never re-enter segments at ``max_merged_docs``
    (asserted over a long add/delete lifecycle in
    tests/test_maintain_cycle.py).

    Returns {per_segment, plan, merged_out, segments} where ``segments``
    is the post-cycle serving set (unmerged survivors + merge outputs, in
    that order). The CALLER retires merged inputs once it has republished
    the serving set — publish-then-retire, same as compaction's swap
    discipline. Idempotent: run again on the returned set, it plans
    nothing new (unless the set still exceeds ``target_segment_count``
    under the size ceiling, in which case the next cycle continues the
    tiering — one pass never cascades by design)."""
    if len(set(segments)) != len(segments):
        raise ValueError("maintain_bm25: duplicate segment paths")
    per = {
        p: maintain_bm25_segment(spark, p, tombstone_ratio=tombstone_ratio)
        for p in segments
    }
    stats = bm25_segment_stats(spark, segments)
    plan = plan_segment_merges(
        stats,
        max_merge_at_once=max_merge_at_once,
        max_merged_docs=max_merged_docs,
        target_segment_count=target_segment_count,
    )
    for group in plan:
        for p in group:
            if os.path.isdir(f"{p}/{_TOMBSTONES}"):
                rep = maintain_bm25_segment(
                    spark, p, tombstone_ratio=tombstone_ratio, force_compact=True
                )
                per[p]["postings_rows_removed"] += rep["postings_rows_removed"]
                per[p]["compacted"] = per[p]["compacted"] or rep["compacted"]
    outs = execute_merge_plan(spark, plan, out_dir)
    merged_inputs = {p for g in plan for p in g}
    final = [p for p in segments if p not in merged_inputs] + outs
    return {"per_segment": per, "plan": plan, "merged_out": outs, "segments": final}


def maintain_ivf_segment(
    spark: SparkSession,
    path: str,
    *,
    tombstone_ratio: float = 0.1,
    force_compact: bool = False,
) -> dict:
    """Vector-tier twin of :func:`maintain_bm25_segment`: tombstone-ratio
    triggered :func:`~.ivf_index.ivf_pq_index_compact` (partition-
    selective) plus the cluster-histogram heal (missing sidecar on a
    pre-r15 index -> write_cluster_stats; the lifecycle maintains it
    incrementally otherwise). Idempotent; same report shape with
    ``partitions_rewritten`` instead of postings rows."""
    from .ivf_index import _CLUSTER_STATS as IVF_CSTATS
    from .ivf_index import _CODES as IVF_CODES
    from .ivf_index import _TOMBSTONES as IVF_TOMBSTONES
    from .ivf_index import (
        ivf_pq_index_compact,
        read_ivf_pq_meta,
        write_cluster_stats,
    )

    if not 0.0 < tombstone_ratio <= 1.0:
        raise ValueError(
            f"maintain_ivf_segment: tombstone_ratio {tombstone_ratio!r} "
            "must be in (0, 1]"
        )
    read_ivf_pq_meta(spark, path)  # loud if not an IVF-PQ index
    n_vecs = spark.read.parquet(f"{path}/{IVF_CODES}").count()
    n_tomb = (
        spark.read.parquet(f"{path}/{IVF_TOMBSTONES}").count()
        if os.path.isdir(f"{path}/{IVF_TOMBSTONES}")
        else 0
    )
    report = {
        "compacted": False,
        "partitions_rewritten": 0,
        "healed": [],
        "n_tombstones_before": n_tomb,
        "n_vecs": n_vecs,
    }
    if n_tomb and (
        force_compact or n_vecs == 0 or n_tomb / n_vecs >= tombstone_ratio
    ):
        report["partitions_rewritten"] = ivf_pq_index_compact(spark, path)
        report["compacted"] = True
    if not os.path.isdir(f"{path}/{IVF_CSTATS}"):
        write_cluster_stats(spark, path)
        report["healed"].append("cluster_stats")
    else:
        # staleness cross-check: the histogram counts logical rows of
        # codes/ (tombstones included until compact), so sum(n_vecs) must
        # equal the live codes count EXACTLY. A crash between
        # ivf_pq_index_add's codes append and its histogram rewrite leaves
        # the sidecar silently stale — it only mis-COSTS (the filter
        # planner), never mis-answers, which is exactly why nothing else
        # would ever notice; the maintenance pass is where it heals.
        live = (
            spark.read.parquet(f"{path}/{IVF_CODES}").count()
            if report["compacted"]
            else n_vecs
        )
        hist_sum = sum(
            int(r["n_vecs"])
            for r in spark.read.parquet(f"{path}/{IVF_CSTATS}").collect()
        )
        if hist_sum != live:
            write_cluster_stats(spark, path)
            report["healed"].append("cluster_stats")
    return report


def maintain_ivf(
    spark: SparkSession,
    segments: list[str],
    out_dir: str,
    *,
    tombstone_ratio: float = 0.1,
    max_merge_at_once: int = 4,
    max_merged_docs: int | None = None,
    target_segment_count: int = 1,
) -> dict:
    """Vector-tier twin of :func:`maintain_bm25`: per-segment maintenance,
    tiered merge plan over live vector counts, merge-forced compaction
    (ivf_pq_index_merge refuses pending tombstones), publish-then-retire.
    Same report shape."""
    if len(set(segments)) != len(segments):
        raise ValueError("maintain_ivf: duplicate segment paths")
    from .ivf_index import _TOMBSTONES as IVF_TOMBSTONES

    per = {
        p: maintain_ivf_segment(spark, p, tombstone_ratio=tombstone_ratio)
        for p in segments
    }
    stats = ivf_segment_stats(spark, segments)
    plan = plan_segment_merges(
        stats,
        max_merge_at_once=max_merge_at_once,
        max_merged_docs=max_merged_docs,
        target_segment_count=target_segment_count,
    )
    for group in plan:
        for p in group:
            if os.path.isdir(f"{p}/{IVF_TOMBSTONES}"):
                rep = maintain_ivf_segment(
                    spark, p, tombstone_ratio=tombstone_ratio, force_compact=True
                )
                per[p]["partitions_rewritten"] += rep["partitions_rewritten"]
                per[p]["compacted"] = per[p]["compacted"] or rep["compacted"]
    outs = execute_ivf_merge_plan(spark, plan, out_dir)
    merged_inputs = {p for g in plan for p in g}
    final = [p for p in segments if p not in merged_inputs] + outs
    return {"per_segment": per, "plan": plan, "merged_out": outs, "segments": final}
