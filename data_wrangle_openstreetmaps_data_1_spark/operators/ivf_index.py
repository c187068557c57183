"""Persisted IVF-PQ index: the serving lifecycle around operators/pq.py.

``sim_ivf_pq`` (plans/curation_ext.py) composes the IVF + PQ math in one
session; this module is the part a 100 TB deployment actually operates:

- **write**: the assigned+encoded corpus lands as a parquet table
  PARTITIONED BY the coarse cluster id, with the trained codebooks and
  centroid vectors in a sidecar meta dataset next to the codes. At scale
  the cluster id is the ONLY layout decision that matters — a probe that
  touches ``nprobe`` of ``ncent`` clusters must read ``nprobe/ncent`` of
  the files, and partition-by-cluster is how Spark's reader gets that for
  free (PartitionFilters, no file content touched for pruned clusters).
- **add**: new vectors are assigned + encoded against the STORED meta
  (codebooks are corpus statistics — production systems train once on a
  sample and add batches forever, the FAISS ``IndexIVFPQ.add`` contract)
  and appended into their cluster partitions. The batch never joins the
  existing index (the ``dd_incremental`` batch×index-only discipline;
  here even cheaper: assignment needs only the broadcast centroids, so
  the add path touches ZERO existing index bytes — the optional
  duplicate-id guard reads just the pruned ``vec_id`` column).
- **delete / compact**: deletes are O(batch) tombstone appends (the
  FAISS ``remove_ids`` contract); probes anti-join the broadcast
  tombstone set until ``ivf_pq_index_compact`` folds them in by
  rewriting ONLY the cluster partitions that contain a tombstoned
  vector (dynamic partition overwrite — clean clusters' files are
  bit-untouched, asserted in tests).
- **probe**: per-query nearest-``nprobe`` centroids are computed
  driver-side from the sidecar meta (ncent×d doubles — tiny), then the
  ADC ranking (operators/pq.py:adc_topk) runs over ONLY the probed
  cluster partitions via an ``isin`` on the partition column.

Determinism matches the pq.py contract exactly: the driver-side centroid
distance is the same left fold (0.0 + t0 + t1 + ...) as Spark's
``aggregate`` and DuckDB's ``list_reduce``, ties break by centroid id, so
the stored-index probe is value-identical to the in-session
``sim_ivf_pq`` and its oracle.

The read-side win is measured by tools/ivfindexwin.py (IVFINDEX_WIN.json):
rows materialized by the pruned probe scan vs the unpartitioned layout.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pq import _fold_l2sq, encode_pq, train_pq_codebooks
from .topk import topk_per_key

_CODES = "codes"
_META = "meta"
_TOMBSTONES = "tombstones"
_CLUSTER_STATS = "cluster_stats"


def train_ivf_pq_meta(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    ncent: int,
    m: int,
    dsub: int,
    ksub: int,
    iters: int = 1,
    round_to: int = 6,
) -> dict:
    """Train the index meta (PQ codebooks + coarse centroids) from a
    training frame. Centroids follow the seed convention shared with
    operators/similarity.py ivf tiers: the vectors with ``id < ncent``
    (deterministic, oracle-reproducible). Train on a hash-sample at scale
    — meta is statistics, it does not need the corpus.
    """
    codebooks = train_pq_codebooks(
        emb, id_col, vec_col, m=m, dsub=dsub, ksub=ksub, iters=iters, round_to=round_to
    )
    cent_rows = (
        emb.where(F.col(id_col) < ncent).select(id_col, vec_col).orderBy(id_col).collect()
    )  # bounded: ncent rows
    if len(cent_rows) != ncent:
        raise ValueError(
            f"centroid seed contract violated: need ids 0..{ncent - 1} present, "
            f"got {len(cent_rows)} rows"
        )
    return {
        "m": m,
        "dsub": dsub,
        "ksub": ksub,
        "ncent": ncent,
        "round_to": round_to,
        "codebooks": codebooks,
        "centroids": [[int(r[id_col]), [float(x) for x in r[vec_col]]] for r in cent_rows],
    }


def _assign_clusters_driver(vec: list[float], meta: dict, nprobe: int) -> list[int]:
    """Nearest-``nprobe`` centroid ids for one vector, driver-side. Same
    fold order and (d2, c_id) tie-break as similarity.ivf_assign — bit
    identical, so stored-index probes match the in-session plan."""
    scored = sorted(
        ((_fold_l2sq(vec, cvec), cid) for cid, cvec in meta["centroids"]),
        key=lambda t: (t[0], t[1]),
    )
    return [cid for _, cid in scored[:nprobe]]


def _assign_encode(
    emb: DataFrame, id_col: str, vec_col: str, meta: dict, with_resid: bool = False
) -> DataFrame:
    """(id, code0..codeM-1, cluster) for a batch of vectors, purely from
    meta: cluster via a literal-folded distance array over the broadcast-
    free centroid LITERALS (ncent is small by contract), codes via
    encode_pq. One scan, whole-stage codegen, no join, no shuffle.
    ``with_resid`` adds ``resid_fp``: the assigned-centroid squared
    distance in 1e-6 fixed point (integer, so downstream sums are
    aggregation-order independent) — the drift gauge's raw signal."""
    from ..functions.vectors import literal_fold_sql

    dists = "array(" + ", ".join(
        literal_fold_sql(vec_col, cvec, term="l2sq") for _, cvec in meta["centroids"]
    ) + ")"
    ids = "array(" + ", ".join(str(int(cid)) for cid, _ in meta["centroids"]) + ")"
    d = int(meta["m"]) * int(meta["dsub"])
    # first-minimum position == (d2 asc, c_id asc) tie-break because the
    # centroid literals are ordered by id.
    #
    # Loud malformed-vector guard: a wrong-dimension vector nulls the
    # zip_with folds (all distances NULL -> array_min NULL -> cluster
    # NULL), and a NaN/Inf component can do the same — without the guard
    # such rows land silently in __HIVE_DEFAULT_PARTITION__, which no
    # probe ever reads (probes prune on concrete cluster ids). The write
    # path must refuse them the way adc_topk's non-finite LUT guard does.
    assigned = emb.withColumn(
        "cluster",
        F.expr(
            f"CASE WHEN size({vec_col}) != {d} THEN "
            f"  raise_error(concat('ivf _assign_encode: vector for id ', "
            f"    cast({id_col} as string), ' has dimension ', "
            f"    cast(size({vec_col}) as string), ', index requires {d}')) "
            f"WHEN exists({vec_col}, x -> isnan(x) OR x = double('inf') "
            f"                            OR x = double('-inf')) THEN "
            f"  raise_error(concat('ivf _assign_encode: non-finite component "
            f"in vector for id ', cast({id_col} as string))) "
            f"ELSE element_at({ids}, cast(array_position({dists}, array_min({dists})) as int)) END"
        ).cast("int"),
    )
    if with_resid:
        assigned = assigned.withColumn(
            "resid_fp", F.expr(f"cast(round(array_min({dists}) * 1000000) as long)")
        )
    enc = encode_pq(assigned, vec_col, meta["codebooks"], meta["dsub"])
    return enc.select(
        id_col,
        *[f"code{mi}" for mi in range(meta["m"])],
        "cluster",
        *(["resid_fp"] if with_resid else []),
    )


_DRIFT_BASE = "drift_baseline"


def write_ivf_pq_index(
    spark: SparkSession, emb: DataFrame, path: str, meta: dict, id_col: str, vec_col: str
) -> None:
    """Materialize the index: codes partitioned by cluster + sidecar meta
    + the drift baseline (per-cluster base count and summed assignment
    residual, ncent tiny rows — the training-time distribution snapshot
    ``ivf_pq_drift_report`` compares add batches against; adds never
    update it, since the whole point is detecting departure from what the
    codebooks were trained on).

    The meta sidecar is written through Spark (text dataset) so the index
    is one self-contained directory on whatever filesystem the codes use
    (HDFS/S3/local) — no driver-local files."""
    from concurrent.futures import ThreadPoolExecutor

    from ..partitioning import eager_cache

    # materialize the assignments ONCE up front, then submit the three
    # independent artifact writes together (guide §2.6; same shape as
    # write_bm25_index r18) — a lazy persist would let the concurrent
    # writes race and each re-run the assign+encode pipeline
    assigned = eager_cache(_assign_encode(emb, id_col, vec_col, meta, with_resid=True))

    def _w_codes() -> None:
        assigned.drop("resid_fp").write.partitionBy("cluster").mode("overwrite").parquet(
            f"{path}/{_CODES}"
        )

    def _w_drift() -> None:
        assigned.groupBy("cluster").agg(
            F.count("*").alias("n_base"),
            F.sum("resid_fp").cast("long").alias("sum_resid_fp"),
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{_DRIFT_BASE}")

    def _w_stats() -> None:
        # LIVE cluster-cardinality histogram (unlike the drift baseline,
        # which deliberately snapshots training time): ncent tiny rows the
        # filter-strategy planner reads instead of paying a corpus count
        assigned.groupBy("cluster").agg(
            F.count("*").cast("long").alias("n_vecs")
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{_CLUSTER_STATS}")

    with ThreadPoolExecutor(max_workers=3) as pool:
        for f in [pool.submit(w) for w in (_w_codes, _w_drift, _w_stats)]:
            f.result()
    # meta last: the commit marker, written only after every artifact landed
    spark.createDataFrame([(json.dumps(meta),)], "value string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{path}/{_META}")


def read_ivf_pq_meta(spark: SparkSession, path: str) -> dict:
    return json.loads(spark.read.text(f"{path}/{_META}").head()["value"])


def ivf_pq_drift_report(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    *,
    rate_ratio_warn: float = 3.0,
    resid_ratio_warn: float = 2.0,
) -> DataFrame:
    """Distribution-drift gauge for train-once-add-forever: compares an
    add batch's per-cluster landing profile against the training-time
    baseline snapshot, from the BATCH ONLY (one assign pass, meta-local)
    plus the ncent-row baseline — no index scan.

    Two orthogonal signals per touched cluster (both in 1e-6 fixed point,
    integer arithmetic end-to-end so values are deterministic):

    - ``add_rate_fp`` vs ``base_rate_fp``: the fraction of the batch
      landing in this cluster vs the fraction of the training corpus that
      did. A cluster soaking up ``rate_ratio_warn``x its base share (or
      any vectors landing in a base-empty cluster) means the coarse
      partition no longer matches the data — probes will over-scan hot
      clusters.
    - ``mean_resid_add_fp`` vs ``mean_resid_base_fp``: mean squared
      distance of the batch's vectors to their assigned centroids vs the
      training mean. Residual inflation past ``resid_ratio_warn``x means
      the new vectors sit far from EVERY centroid — quantization error
      grows and stored-probe recall silently degrades.

    ``retrain_flag`` = either signal fired. Feed any batch through this
    before/after ``ivf_pq_index_add`` (or pass ``drift_guard=True`` to the
    add to make a flagged batch raise instead of landing)."""
    import os

    meta = read_ivf_pq_meta(spark, path)
    if not os.path.isdir(f"{path}/{_DRIFT_BASE}"):
        # graceful old-layout handling (the BM25 stats path's discipline):
        # indexes written before the drift gauge existed have no baseline
        # snapshot — fail with the recovery spelled out, not an opaque
        # AnalysisException from the missing parquet dir
        raise ValueError(
            f"ivf_pq_drift_report: {path} predates the drift baseline "
            f"({_DRIFT_BASE}/ missing) — rebuild with write_ivf_pq_index "
            "to snapshot the training-time cluster profile, or skip the "
            "drift gauge for this index"
        )
    base = spark.read.parquet(f"{path}/{_DRIFT_BASE}")
    batch_prof = (
        _assign_encode(batch, id_col, vec_col, meta, with_resid=True)
        .groupBy("cluster")
        .agg(F.count("*").alias("n_add"), F.sum("resid_fp").cast("long").alias("sum_add_fp"))
    )
    tot_add = batch_prof.agg(F.sum("n_add").cast("long").alias("total_add"))
    tot_base = base.agg(F.sum("n_base").cast("long").alias("total_base"))
    joined = (
        batch_prof.join(F.broadcast(base), "cluster", "left")
        .crossJoin(F.broadcast(tot_add))
        .crossJoin(F.broadcast(tot_base))
        .withColumn("n_base", F.coalesce("n_base", F.lit(0)).cast("long"))
        .withColumn("sum_resid_fp", F.coalesce("sum_resid_fp", F.lit(0)).cast("long"))
        .withColumn("add_rate_fp", F.expr("n_add * 1000000 div total_add"))
        .withColumn("base_rate_fp", F.expr("n_base * 1000000 div total_base"))
        .withColumn("mean_resid_add_fp", F.expr("sum_add_fp div n_add"))
        .withColumn(
            "mean_resid_base_fp",
            F.expr("CASE WHEN n_base > 0 THEN sum_resid_fp div n_base ELSE NULL END"),
        )
        .withColumn(
            "rate_flag",
            (F.col("n_base") == 0)
            | (F.col("add_rate_fp") > F.lit(rate_ratio_warn) * F.col("base_rate_fp")),
        )
        .withColumn(
            "resid_flag",
            F.col("mean_resid_base_fp").isNotNull()
            & (
                F.col("mean_resid_add_fp")
                > F.lit(resid_ratio_warn) * F.col("mean_resid_base_fp")
            ),
        )
        .withColumn("retrain_flag", F.col("rate_flag") | F.col("resid_flag"))
    )
    return joined.select(
        "cluster", "n_add", "n_base", "add_rate_fp", "base_rate_fp",
        "mean_resid_add_fp", "mean_resid_base_fp", "rate_flag", "resid_flag",
        "retrain_flag",
    )


def ivf_pq_index_add(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    *,
    check_duplicates: bool = True,
    drift_guard: bool = False,
) -> None:
    """Incremental add: assign + encode ``batch`` with the STORED meta and
    append into the cluster partitions. Touches no existing index data
    (assignment is meta-only); the optional duplicate guard is the one
    batch×index contact and reads only the column-pruned ``vec_id``s.
    ``drift_guard=True`` runs :func:`ivf_pq_drift_report` on the batch
    first and refuses (raises) if any cluster warrants retraining — the
    batch never lands, so the index's recall contract is preserved.

    Partial-commit story: the codes append and the histogram rewrite are
    two separate commits; a crash between them leaves cluster_stats/
    STALE — which mis-COSTS the filter planner but never mis-answers
    (both filter strategies are exact). Recovery is
    :func:`write_cluster_stats`, and :func:`~.index_admin.maintain_ivf_segment`
    cross-checks sum(n_vecs) against the live codes count on every
    maintenance pass and heals automatically.
    """
    meta = read_ivf_pq_meta(spark, path)
    if drift_guard:
        flagged = (
            ivf_pq_drift_report(spark, batch, path, id_col, vec_col)
            .where(F.col("retrain_flag"))
            .select("cluster", "rate_flag", "resid_flag")
            .collect()  # bounded: <= ncent rows
        )
        if flagged:
            detail = ", ".join(
                f"cluster {r['cluster']}"
                f"({'rate' if r['rate_flag'] else ''}{'+' if r['rate_flag'] and r['resid_flag'] else ''}{'resid' if r['resid_flag'] else ''})"
                for r in flagged
            )
            raise ValueError(
                f"ivf_pq_index_add: drift guard tripped at {path} — {detail}. "
                "The batch's distribution departs from what the codebooks were "
                "trained on; retrain meta (train_ivf_pq_meta on a fresh sample) "
                "and rebuild, or pass drift_guard=False to add anyway."
            )
    if check_duplicates:
        existing = spark.read.parquet(f"{path}/{_CODES}").select(id_col)
        dup = batch.select(id_col).join(existing, id_col).limit(1).collect()
        if dup:
            raise ValueError(
                f"ivf_pq_index_add: id {dup[0][id_col]!r} already present in the "
                f"index at {path} — adds must be new vectors (use overwrite to "
                "rebuild, or dedupe the batch first)"
            )
    enc = _assign_encode(batch, id_col, vec_col, meta).persist()
    try:
        enc.write.partitionBy("cluster").mode("append").parquet(f"{path}/{_CODES}")
        _cluster_stats_apply_delta(
            spark, path, enc.groupBy("cluster").agg(F.count("*").cast("long").alias("d"))
        )
    finally:
        enc.unpersist()


def ivf_pq_index_delete(spark: SparkSession, path: str, ids: list[int]) -> None:
    """Logical delete (the FAISS ``remove_ids`` analog, public API): append
    the ids to a tombstone sidecar. O(batch) — touches no index data; the
    probe anti-joins tombstones (broadcast: they stay small between
    compactions) and ``ivf_pq_index_compact`` folds them in, rewriting
    ONLY the cluster partitions that contain a tombstoned vector."""
    if not ids:
        raise ValueError("ivf_pq_index_delete: empty id batch")
    spark.createDataFrame([(int(i),) for i in ids], "vec_id long").write.mode(
        "append"
    ).parquet(f"{path}/{_TOMBSTONES}")


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    import os

    if not os.path.isdir(f"{path}/{_TOMBSTONES}"):
        return None
    return spark.read.parquet(f"{path}/{_TOMBSTONES}")


def ivf_pq_index_compact(spark: SparkSession, path: str, id_col: str = "vec_id") -> int:
    """Fold tombstones into the codes table, partition-selectively: only
    cluster partitions containing a tombstoned id are rewritten (dynamic
    partition overwrite); clean clusters' files are untouched — at 100 TB
    a delete batch touching 3 of 10k clusters rewrites 3. Returns the
    number of partitions rewritten.

    Loud guard: a cluster whose vectors are ALL tombstoned cannot be
    expressed as a dynamic overwrite (nothing to write leaves the stale
    files in place) — that needs a full rebuild, so it raises."""
    ts = _tombstones(spark, path)
    if ts is None or ts.head(1) == []:
        return 0
    ts = ts.withColumnRenamed("vec_id", id_col)  # tombstones store vec_id
    codes = spark.read.parquet(f"{path}/{_CODES}")
    dead = codes.join(F.broadcast(ts), id_col)
    dirty = [r["cluster"] for r in dead.select("cluster").distinct().collect()]
    if not dirty:  # tombstones for ids never in the index: just clear them
        _clear_tombstones(spark, path)
        return 0
    survivors = codes.where(F.col("cluster").isin(dirty)).join(
        F.broadcast(ts), id_col, "left_anti"
    )
    alive = {r["cluster"] for r in survivors.select("cluster").distinct().collect()}
    emptied = sorted(set(dirty) - alive)
    if emptied:
        raise ValueError(
            f"ivf_pq_index_compact: clusters {emptied} would become empty — "
            "dynamic partition overwrite cannot express an empty partition; "
            "rebuild the index (write_ivf_pq_index) for full-cluster deletes"
        )
    # collect the per-cluster delete counts BEFORE the rewrite: dead reads
    # the codes table being overwritten, so a lazy read after the swap
    # would see the survivors and compute a zero delta (ncent-bounded rows)
    dead_counts = [
        (int(r["cluster"]), -int(r["n"]))
        for r in dead.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    ]
    # per-writer option, NOT the session conf: index writers may run on
    # pool threads next to other writers in the same session (the §2.6
    # overlap pattern), and a session-global set/restore window would let
    # a concurrent partitioned overwrite silently flip static/dynamic —
    # static truncates ALL existing partitions (the data-loss class the
    # r18 ADVICE flagged). The writer option takes precedence over the
    # session conf and is scoped to exactly this write.
    survivors.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        "cluster"
    ).mode("overwrite").parquet(f"{path}/{_CODES}")
    _cluster_stats_apply_delta(
        spark, path, spark.createDataFrame(dead_counts, "cluster int, d long")
    )
    _clear_tombstones(spark, path)
    return len(dirty)


def _clear_tombstones(spark: SparkSession, path: str) -> None:
    # local-FS delete; on HDFS/S3 swap for the FS client's recursive
    # delete (same boundary as sources/osm_split.py's file opener)
    import shutil

    shutil.rmtree(f"{path}/{_TOMBSTONES}", ignore_errors=True)


def ivf_pq_probe(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    *,
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k per query over ONLY the probed cluster partitions.

    The ``cluster isin(...)`` predicate lands on the partition column, so
    the executed plan prunes non-probed clusters at file-listing time
    (PartitionFilters) — at 100 TB each query reads nprobe/ncent of the
    index and no more. Output schema matches adc_topk
    (query_id, vec_id, adc_d2), value-identical to sim_ivf_pq.
    """
    from .pq import adc_topk

    if not queries:
        # mirror bm25_probe's empty-terms guard: without it the union fold
        # below indexes parts[0] and raises an opaque IndexError
        raise ValueError("ivf_pq_probe: queries must be non-empty")
    meta = read_ivf_pq_meta(spark, path)
    codes = spark.read.parquet(f"{path}/{_CODES}")
    ts = _tombstones(spark, path)
    if ts is not None:
        # logical deletes not yet compacted: anti-join the (small,
        # broadcast) tombstone set — partition pruning still applies to
        # the codes side underneath
        codes = codes.join(
            F.broadcast(ts.withColumnRenamed("vec_id", id_col).select(id_col)),
            id_col,
            "left_anti",
        )
    parts = []
    for qid, qvec in queries:
        clusters = _assign_clusters_driver(qvec, meta, nprobe)
        cand = codes.where(F.col("cluster").isin(clusters))
        parts.append(
            adc_topk(
                cand, id_col, [(qid, qvec)], meta["codebooks"], meta["dsub"],
                k=k, round_to=meta["round_to"],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

def ivf_pq_probe_batched(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    *,
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """:func:`ivf_pq_probe` for SERVING-SIZED query batches: one plan,
    constant size in the number of queries.

    ``allowed`` (optional) is a DataFrame whose ``id_col`` column names
    the vectors eligible to rank — METADATA-FILTERED vector search with
    PRE-FILTER semantics: candidates are restricted BEFORE the top-k, so
    every returned neighbor satisfies the filter and k survivors come
    back whenever the probed clusters hold k eligible vectors (the
    post-filter alternative — filter the unfiltered top-k — silently
    returns fewer than k under selective filters; stated exactly in the
    filtered-search literature). The filter applies as a semi-join on
    the pruned codes scan; AQE broadcasts it when small, shuffles both
    sides when the eligible set is corpus-sized — which is when you want
    it distributed. Cluster pruning still bounds recall exactly as in
    the unfiltered probe.

    The per-query form builds one scan branch + one TakeOrderedAndProject
    per query — right for a handful of queries, wrong for a serving batch
    (a 500-query batch would compile a 500-branch union and re-list the
    probed partitions 500 times). This form:

    - scans the codes table ONCE, pruned to the UNION of all probed
      clusters (``cluster isin`` on the partition column — still
      PartitionFilters, still nprobe/ncent of the index per query, just
      listed once);
    - fans candidates out to their probing queries with a broadcast
      (query_id, cluster) join — rows appear once per probing query,
      exactly the work the per-query branches did;
    - replaces the per-query literal LUT arrays with M broadcast
      (query_id, code, dd) LUT joins. The dd values are the SAME
      driver-computed doubles adc_topk embeds as literals, and the
      accumulation ``dd0 + dd1 + ... + ddM-1`` is the same left fold as
      its ``element_at`` chain — bit-identical adc_d2, pinned by sharing
      sim_ivf_pq's oracle and by the equality test against the per-query
      probe;
    - takes top-k with the two-stage per-query rank (operators/topk.py —
      same (adc_d2, id) tie-break as the per-query ``orderBy(...).limit(k)``,
      value-identical, no single-reducer funnel).

    Broadcast sizes: (queries x nprobe) cluster pairs + M x (queries x
    ksub) LUT rows — a 1000-query batch at M=8, ksub=256 is ~2M tiny rows,
    comfortably broadcastable; the corpus-sized side never shuffles.
    Tombstones are honored identically to ivf_pq_probe.
    """
    import numpy as np
    import pandas as pd

    if not queries:
        raise ValueError("ivf_pq_probe_batched: queries must be non-empty")
    meta = read_ivf_pq_meta(spark, path)
    cb, dsub, r = meta["codebooks"], int(meta["dsub"]), int(meta["round_to"])
    m = len(cb)
    qc_rows: list[tuple[int, int]] = []
    for qid, qvec in queries:
        for c in _assign_clusters_driver(qvec, meta, nprobe):
            qc_rows.append((int(qid), int(c)))
    # LUT build, numpy-vectorized over (queries x ksub): the scalar loop
    # was O(|queries| * M * ksub) Python iterations (~2M at a 1000-query
    # batch — bounded but needless). The float ORDER is preserved for
    # bit-identity with pq._fold_l2sq (the per-query probe's literal
    # LUTs): accumulate subspace dims one at a time, elementwise IEEE
    # doubles — acc = acc + (x-y)*(x-y) in the same left-fold sequence per
    # (query, code) cell, no reduction reordering (np.sum's pairwise
    # summation would NOT be bit-identical). Pinned by the batched ≡
    # per-query equality test and by sharing sim_ivf_pq's oracle.
    qids = np.asarray([int(qid) for qid, _ in queries], dtype=np.int64)
    qmat = np.asarray([qvec for _, qvec in queries], dtype=np.float64)
    if qmat.ndim != 2 or qmat.shape[1] != m * dsub:
        raise ValueError(
            f"ivf_pq_probe_batched: query vectors must all be length "
            f"{m * dsub} (m={m} x dsub={dsub}); got shape {qmat.shape}"
        )
    lut_pdfs: list[pd.DataFrame] = []
    for mi in range(m):
        cmat = np.asarray(cb[mi], dtype=np.float64)  # (ksub, dsub)
        qs = qmat[:, mi * dsub : (mi + 1) * dsub]  # (nq, dsub)
        acc = np.zeros((qmat.shape[0], cmat.shape[0]), dtype=np.float64)
        for j in range(dsub):
            diff = qs[:, j, None] - cmat[None, :, j]
            acc += diff * diff
        if not np.isfinite(acc).all():
            bad_q = int(qids[np.argwhere(~np.isfinite(acc))[0][0]])
            raise ValueError(
                f"ivf_pq_probe_batched: non-finite distance for query "
                f"{bad_q!r} subspace {mi} — the query vector or codebook "
                "contains NaN/inf; clean the embeddings first"
            )
        ksub_mi = cmat.shape[0]
        lut_pdfs.append(
            pd.DataFrame(
                {
                    "query_id": np.repeat(qids, ksub_mi),
                    # codes are 1-based (array_position), same as
                    # adc_topk's element_at indexing
                    f"code{mi}": np.tile(
                        np.arange(1, ksub_mi + 1, dtype=np.int32), len(qids)
                    ),
                    f"dd{mi}": acc.ravel(),
                }
            )
        )
    union_clusters = sorted({c for _, c in qc_rows})
    codes = spark.read.parquet(f"{path}/{_CODES}").where(
        F.col("cluster").isin(union_clusters)
    )
    if allowed is not None:
        # pre-filter semi-join (see docstring); dedup is inherent to semi
        codes = codes.join(allowed.select(F.col(id_col)), id_col, "semi")
    ts = _tombstones(spark, path)
    if ts is not None:
        codes = codes.join(
            F.broadcast(ts.withColumnRenamed("vec_id", id_col).select(id_col)),
            id_col,
            "left_anti",
        )
    qc = spark.createDataFrame(qc_rows, "query_id long, cluster int")
    cand = codes.join(F.broadcast(qc), "cluster")
    for mi in range(m):
        lut = spark.createDataFrame(
            lut_pdfs[mi], f"query_id long, code{mi} int, dd{mi} double"
        )
        cand = cand.join(F.broadcast(lut), ["query_id", f"code{mi}"])
    acc = F.col("dd0")
    for mi in range(1, m):
        acc = acc + F.col(f"dd{mi}")
    scored = cand.where(F.col(id_col) != F.col("query_id")).select(
        "query_id", id_col, F.round(acc, r).alias("adc_d2")
    )
    # two-stage top-k (operators/topk.py): one query probing hot clusters
    # must not funnel every ADC candidate through a single reducer. The
    # histogram sidecar gives a FREE per-query candidate bound (sum of
    # the probed clusters' live counts — tombstones/allowed only shrink
    # it), so small serving probes skip the salted stage entirely.
    approx = None
    sizes = _cluster_sizes_cached(spark, path)
    if sizes is not None:
        per_q: dict[int, int] = {}
        for qid, c in qc_rows:
            per_q[qid] = per_q.get(qid, 0) + sizes.get(c, 0)
        approx = max(per_q.values(), default=None)
    return topk_per_key(
        scored,
        ["query_id"],
        [F.asc("adc_d2"), F.asc(id_col)],
        k,
        id_col,
        rank_col="__rk",
        approx_candidates_per_key=approx,
    ).drop("__rk")


#: (abs sidecar dir -> (directory signature, {cluster: n_vecs})). See
#: :func:`_cluster_sizes_cached`.
_CLUSTER_SIZES_CACHE: dict[str, tuple[tuple, dict[int, int]]] = {}


def _cluster_sizes_cached(spark: SparkSession, path: str) -> dict[int, int] | None:
    """Live per-cluster cardinalities from the histogram sidecar, cached
    per (path, directory signature) — r16 ADVICE fix, landed in the r18
    optimization round: a serving process probes the same persisted index
    many times, and re-collecting the ncent-row parquet cost one Spark
    job per probe call for data that only changes when the lifecycle
    rewrites the sidecar. The signature is the sidecar directory's file
    names + sizes + mtimes via pure ``os.stat`` — no Spark job on the hit
    path; every lifecycle rewrite (overwrite mode replaces the files)
    changes it and invalidates the entry. Returns None when the sidecar
    is absent (pre-r15 index) — callers keep their scan fallbacks, and a
    stale-between-partial-commit-and-heal histogram can only mis-cost,
    never mis-answer (same contract as before the cache)."""
    import os

    d = os.path.abspath(f"{path}/{_CLUSTER_STATS}")
    if not os.path.isdir(d):
        return None
    try:
        sig = tuple(
            sorted(
                (name, st.st_size, st.st_mtime_ns)
                for name in os.listdir(d)
                for st in (os.stat(os.path.join(d, name)),)
            )
        )
    except FileNotFoundError:
        # a concurrent lifecycle rewrite replaced part files between the
        # listdir and a stat (r18 ADVICE): treat as a miss and read the
        # sidecar via Spark without caching — the NEXT call sees a stable
        # signature and re-enters the cache. Never an error on the probe
        # hot path; a transiently uncached read only costs one extra job.
        return {
            int(r["cluster"]): int(r["n_vecs"])
            for r in spark.read.parquet(d).collect()
        }
    hit = _CLUSTER_SIZES_CACHE.get(d)
    if hit is not None and hit[0] == sig:
        return hit[1]
    sizes = {
        int(r["cluster"]): int(r["n_vecs"])
        for r in spark.read.parquet(d).collect()  # ncent rows
    }
    _CLUSTER_SIZES_CACHE[d] = (sig, sizes)
    return sizes


def write_cluster_stats(spark: SparkSession, path: str) -> None:
    """(Re)build the live cluster-cardinality histogram from the codes
    table — one column-pruned aggregate, ncent tiny output rows. The
    lifecycle maintains the histogram incrementally (write/add/compact/
    merge); this full rebuild is the upgrade path for pre-r15 indexes
    and the recovery after a partial commit."""
    (
        spark.read.parquet(f"{path}/{_CODES}")
        .groupBy("cluster")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{_CLUSTER_STATS}")
    )


def _cluster_stats_apply_delta(
    spark: SparkSession, path: str, delta: DataFrame
) -> None:
    """Merge a (cluster, d) count delta into the histogram sidecar —
    O(ncent) rows collected driver-side BEFORE the overwrite (never a
    lazy read of the dir being replaced). Missing sidecar (pre-r15
    index): full rebuild — the histogram is a pure function of codes/."""
    import os

    if not os.path.isdir(f"{path}/{_CLUSTER_STATS}"):
        write_cluster_stats(spark, path)
        return
    stored = {
        int(r["cluster"]): int(r["n_vecs"])
        for r in spark.read.parquet(f"{path}/{_CLUSTER_STATS}").collect()
    }
    for r in delta.collect():
        stored[int(r["cluster"])] = stored.get(int(r["cluster"]), 0) + int(r["d"])
    rows = [(c, n) for c, n in sorted(stored.items()) if n > 0]
    spark.createDataFrame(rows, "cluster int, n_vecs long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{_CLUSTER_STATS}")


def choose_vector_filter_strategy(
    spark: SparkSession,
    path: str,
    allowed: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    small_corpus_floor: int = 65_536,
) -> dict:
    """COST-BASED pre/post decision for metadata-filtered vector search —
    the vector twin of text_index.choose_filter_strategy (r14 verdict
    task): estimate the filter's selectivity from the index's OWN
    histogram sidecar (corpus total = sum of the live per-cluster counts
    — never a corpus-cardinality aggregate at plan time) plus one
    column-pruned count of the eligible set, then:

    - **pre** (selective filter): semi-join eligibility onto the pruned
      codes scan — LUT joins and ADC scoring only ever see eligible rows;
    - **post** (broad filter): rank UNFILTERED top-k' cheaply (no
      corpus-sized eligibility join at all), filter the k'-bounded page,
      refill if short — see ivf_pq_probe_filtered for the exact,
      bounded-rounds contract. Unlike text, naive post-filtering CHANGES
      ANN results (under-returns on selective filters), so the refill
      loop is what makes post exact here.

    Corpus-size floor (r15 verdict task): below ``small_corpus_floor``
    live vectors — read from the stored histogram, free — the answer is
    always **pre**, whatever the selectivity: the post path's refill
    bookkeeping costs 2+ extra driver round-trips that cannot pay for
    themselves when the "corpus-sized" eligibility join is itself tiny
    (VECFILTERPLAN_WIN measured pre faster on BOTH cells at 20k vectors;
    the selectivity crossover is real only once the corpus dwarfs the
    serving page).

    The histogram can be stale only between a partial commit and its
    recovery (write_cluster_stats / the maintain_ivf_segment heal); a
    mis-estimate can only mis-COST, never mis-answer — both strategies
    are exact. Returns (strategy, eligible, total, selectivity,
    threshold, estimator, floor_applied)."""
    import os

    if not 0.0 < threshold < 1.0:
        raise ValueError(
            f"choose_vector_filter_strategy: threshold {threshold!r} must be in (0, 1)"
        )
    sizes = _cluster_sizes_cached(spark, path)
    if sizes is not None:
        total = sum(sizes.values())
        estimator = "stored"
    else:
        total = spark.read.parquet(f"{path}/{_CODES}").count()
        estimator = "scan"
    eligible = allowed.select(id_col).distinct().count()
    sel = eligible / total if total else 0.0
    floor_applied = total < small_corpus_floor
    return {
        "strategy": "pre" if floor_applied or sel <= threshold else "post",
        "eligible": eligible,
        "total": total,
        "selectivity": sel,
        "threshold": threshold,
        "estimator": estimator,
        "floor_applied": floor_applied,
    }


# Driver-side row cap for the post-filter path's page assembly: the worst
# refill round collects |queries| x k' rows (3 numeric columns) — 1M rows
# is ~30 MB on the driver, a comfortable serving-batch ceiling. Bigger
# batches must chunk or take the pre path; the guard below makes that an
# up-front error, not a silent driver OOM.
_POST_FILTER_PAGE_MAX = 1_000_000


def ivf_pq_probe_filtered(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    *,
    k: int,
    nprobe: int,
    allowed: DataFrame,
    strategy: str = "auto",
    threshold: float = 0.5,
    refill_factor: int = 4,
    max_refill_rounds: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Metadata-filtered batched ANN with a COST-BASED strategy — exact
    under BOTH strategies (value-equality asserted in tests; the
    candidate universe is always the probed clusters minus tombstones,
    so pre and post rank the same eligible set):

    - **pre**: ivf_pq_probe_batched(allowed=...) — eligibility semi-join
      on the pruned codes scan. Right when the filter is selective.
    - **post**: rank the UNFILTERED top-k' (k' = k * refill_factor),
      semi-join eligibility against that k'-bounded page, and accept a
      query's page when it either yields >= k eligible hits or the
      unfiltered ranking returned fewer than k' rows (the probed
      clusters are exhausted — nothing below the page can exist). Short
      queries REFILL with k' *= refill_factor up to ``max_refill_rounds``
      rounds; anything still short falls back to the exact pre path for
      just those queries. Right when the filter is broad: the corpus-
      sized eligibility join disappears — the filter touches only
      |queries| x k' ranked rows.

    ``strategy='auto'`` consults choose_vector_filter_strategy (stored
    histogram + one eligible count). Output is ivf_pq_probe_batched's
    (query_id, id, adc_d2) shape, top-k eligible per query."""
    if strategy not in ("auto", "pre", "post"):
        raise ValueError(
            f"ivf_pq_probe_filtered: unknown strategy {strategy!r} "
            "(auto | pre | post)"
        )
    if refill_factor < 2:
        raise ValueError(
            f"ivf_pq_probe_filtered: refill_factor {refill_factor!r} must be >= 2"
        )
    if max_refill_rounds < 0:
        raise ValueError(
            f"ivf_pq_probe_filtered: max_refill_rounds {max_refill_rounds!r} "
            "must be >= 0"
        )
    if strategy == "auto":
        strategy = choose_vector_filter_strategy(
            spark, path, allowed, threshold, id_col
        )["strategy"]
    if strategy == "pre":
        return ivf_pq_probe_batched(
            spark, path, queries, k=k, nprobe=nprobe, id_col=id_col, allowed=allowed
        )
    # loud input-contract guard (the check_query_words pattern): the post
    # path assembles pages DRIVER-side, and k' grows refill_factor x per
    # round — the worst single round collects |queries| x k_final rows.
    # Reject an oversized batch up front instead of silently materializing
    # it; chunk the query batch or force strategy='pre' (exact either way).
    worst_rows = len(queries) * k * refill_factor ** (max_refill_rounds + 1)
    if worst_rows > _POST_FILTER_PAGE_MAX:
        raise ValueError(
            f"ivf_pq_probe_filtered: post-filter page bound exceeded — "
            f"|queries|={len(queries)} x k'={k * refill_factor ** (max_refill_rounds + 1)} "
            f"= {worst_rows} rows > {_POST_FILTER_PAGE_MAX} driver-side cap. "
            "Chunk the query batch, lower refill_factor/max_refill_rounds, "
            "or pass strategy='pre' (value-identical)"
        )
    remaining = {int(qid) for qid, _ in queries}
    done_rows: list[tuple[int, int, float]] = []
    kp = k * refill_factor
    for _ in range(max_refill_rounds + 1):
        batch = [(qid, v) for qid, v in queries if int(qid) in remaining]
        if not batch:
            break
        page = ivf_pq_probe_batched(
            spark, path, batch, k=kp, nprobe=nprobe, id_col=id_col
        ).persist()
        # bookkeeping reads are k'-bounded by construction (a serving
        # page, never the corpus): |queries| count rows, then the
        # eligible survivors themselves
        unfiltered_n = {
            int(r["query_id"]): int(r["n"])
            for r in page.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        surv_rows = (
            page.join(allowed.select(F.col(id_col)), id_col, "semi")
            .select("query_id", id_col, "adc_d2")
            .collect()
        )
        page.unpersist()
        surv_by_q: dict[int, list] = {}
        for r in surv_rows:
            surv_by_q.setdefault(int(r["query_id"]), []).append(
                (float(r["adc_d2"]), int(r[id_col]))
            )
        complete = {
            q
            for q in remaining
            if len(surv_by_q.get(q, [])) >= k or unfiltered_n.get(q, 0) < kp
        }
        for q in sorted(complete):
            # the same (adc_d2 asc, id asc) total order the probe ranks by
            for d2, vid in sorted(surv_by_q.get(q, []))[:k]:
                done_rows.append((q, vid, d2))
        remaining -= complete
        kp *= refill_factor
    parts: list[DataFrame] = []
    if done_rows:
        parts.append(
            spark.createDataFrame(
                done_rows, f"query_id long, {id_col} long, adc_d2 double"
            )
        )
    if remaining:
        # bounded rounds exhausted: exact pre fallback for the stragglers
        batch = [(qid, v) for qid, v in queries if int(qid) in remaining]
        parts.append(
            ivf_pq_probe_batched(
                spark, path, batch, k=k, nprobe=nprobe, id_col=id_col, allowed=allowed
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], f"query_id long, {id_col} long, adc_d2 double"
        )
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out


def ivf_pq_index_merge(
    spark: SparkSession, out_path: str, in_paths: list[str], id_col: str = "vec_id"
) -> None:
    """Merge N IVF-PQ indexes into one (FAISS's ``merge_from`` contract):
    legal ONLY when every input was encoded with the SAME trained meta
    (codebooks + centroids are statistics — the train-once contract means
    shards encoded independently against shared meta carry directly
    comparable codes and cluster routing). Codes union into their cluster
    partitions; the drift baselines (per-cluster count + summed residual)
    are mergeable monoids and SUM per cluster, so the merged gauge reads
    as if the union corpus had been snapshotted at training time.

    Because assignment/encoding are per-vector functions of fixed meta,
    the merged index is bit-identical to a one-shot
    :func:`write_ivf_pq_index` on the union corpus (asserted in tests) —
    merging is value-invisible to probes.

    Guards, loudly: < 2 inputs, meta mismatch (byte-compared as canonical
    JSON), overlapping vector ids, pending tombstones (compact first)."""
    import os

    if len(in_paths) < 2:
        raise ValueError("ivf_pq_index_merge: need >= 2 input indexes")
    # same clash guard as bm25_index_merge: overwriting a live input's
    # codes/ while lazily reading it would corrupt the input segment
    norm_out = os.path.realpath(out_path)
    if any(os.path.realpath(p) == norm_out for p in in_paths):
        raise ValueError(
            f"ivf_pq_index_merge: out_path {out_path!r} is one of the "
            "inputs — merge writes to a NEW location; pick a fresh out_path"
        )
    metas = [read_ivf_pq_meta(spark, p) for p in in_paths]
    canon = [json.dumps(m, sort_keys=True) for m in metas]
    if any(c != canon[0] for c in canon[1:]):
        raise ValueError(
            "ivf_pq_index_merge: inputs were encoded with DIFFERENT meta "
            "(codebooks/centroids) — codes are not comparable across "
            "codebooks; re-encode against shared meta first (the FAISS "
            "merge_from contract)"
        )
    for p in in_paths:
        ts = _tombstones(spark, p)
        if ts is not None and ts.head(1) != []:
            raise ValueError(
                f"ivf_pq_index_merge: {p} has pending tombstones — run "
                "ivf_pq_index_compact first"
            )
    codes = [spark.read.parquet(f"{p}/{_CODES}") for p in in_paths]
    per_ids = [c.select(id_col).distinct() for c in codes]
    seen = per_ids[0]
    for ids in per_ids[1:]:
        clash = seen.join(ids, id_col).limit(1).collect()
        if clash:
            raise ValueError(
                f"ivf_pq_index_merge: {id_col} {clash[0][id_col]!r} appears "
                "in more than one input — vector sets must be disjoint"
            )
        seen = seen.unionByName(ids).distinct()
    union = codes[0]
    for c in codes[1:]:
        union = union.unionByName(c)
    union.write.partitionBy("cluster").mode("overwrite").parquet(
        f"{out_path}/{_CODES}"
    )
    bases = []
    for p in in_paths:
        if not os.path.isdir(f"{p}/{_DRIFT_BASE}"):
            bases = None
            break
        bases.append(spark.read.parquet(f"{p}/{_DRIFT_BASE}"))
    if bases is not None:
        bu = bases[0]
        for b in bases[1:]:
            bu = bu.unionByName(b)
        bu.groupBy("cluster").agg(
            F.sum("n_base").cast("long").alias("n_base"),
            F.sum("sum_resid_fp").cast("long").alias("sum_resid_fp"),
        ).coalesce(1).write.mode("overwrite").parquet(f"{out_path}/{_DRIFT_BASE}")
    spark.createDataFrame([(json.dumps(metas[0]),)], "value string").coalesce(
        1
    ).write.mode("overwrite").text(f"{out_path}/{_META}")
    stats = []
    for p in in_paths:
        if not os.path.isdir(f"{p}/{_CLUSTER_STATS}"):
            stats = None
            break
        stats.append(spark.read.parquet(f"{p}/{_CLUSTER_STATS}"))
    if stats is not None:
        su = stats[0]
        for x in stats[1:]:
            su = su.unionByName(x)
        su.groupBy("cluster").agg(
            F.sum("n_vecs").cast("long").alias("n_vecs")
        ).coalesce(1).write.mode("overwrite").parquet(f"{out_path}/{_CLUSTER_STATS}")
    else:
        write_cluster_stats(spark, out_path)
