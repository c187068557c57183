"""Product quantization (PQ) for embedding compression + ADC search.

Jégou et al., "Product Quantization for Nearest Neighbor Search" (TPAMI
2011, public): split a d-dim vector into M contiguous subvectors, k-means
each subspace independently (here via the same deterministic Lloyd's
trainer as operators/clustering.py), and store each vector as M small
integer codes. Asymmetric distance computation (ADC) then approximates
query→vector L2² as the sum of M table lookups: the query keeps its exact
subvectors, each compared against the code's centroid.

Why this matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its
PQ code is M small integers (the registered sim_pq uses M=8 subspaces of
16 codes — 8 bytes, a 32× memory compression; M=4 halves it again at
more recall loss), turning an embedding corpus that would not fit
executor memory into one that scans from RAM. The ADC scan itself is codegen'd column math
(element_at on literal lookup arrays, integer code columns) — no Python,
no shuffle beyond the per-query top-k's TakeOrderedAndProject. Compose
with the IVF bucketing in operators/similarity.py to bound the candidate
set per query; here the scan is exhaustive so recall loss comes ONLY from
quantization, which the tests measure.

Determinism contract (what makes an iterative, float-heavy operator
oracle-checkable — same scheme as operators/clustering.py): codebooks are
trained with per-iteration centroid rounding (round_to decimals) and
first-minimum argmin ties, so both engines quantize to identical
codebooks and codes; every distance is a fixed-order left fold of IEEE
doubles (0.0 + t0 + t1 + ...), identical between Spark's ``aggregate``,
DuckDB's ``list_reduce``, and the driver-side Python loop that builds the
per-query lookup tables.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import literal_fold_sql


def _fold_l2sq(a: list[float], b: list[float]) -> float:
    """Driver-side twin of ``literal_fold_sql(..., term='l2sq')``: same
    left-fold order, same IEEE double ops — bit-identical to the SQL form."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _exploded_subspaces(df: DataFrame, id_col: str, vec_col: str, m: int, dsub: int) -> DataFrame:
    """(id, m, s): one row per (vector, subspace), s = the dsub-dim slice."""
    subs = ", ".join(
        f"struct({mi} as m, slice({vec_col}, {mi * dsub + 1}, {dsub}) as s)" for mi in range(m)
    )
    return df.select(id_col, F.expr(f"explode(array({subs}))").alias("x")).select(
        id_col, "x.m", "x.s"
    )


def _assign_case_sql(codebooks: list[list[list[float]]]) -> str:
    """1-based nearest-code expression, branching on the subspace column
    ``m`` — ONE projection assigns every subspace's codes in a single
    distributed pass (ties -> first minimum, the shared argmin contract)."""
    branches = []
    for mi, cb in enumerate(codebooks):
        dists = "array(" + ", ".join(literal_fold_sql("s", c, term="l2sq") for c in cb) + ")"
        branches.append(f"WHEN m = {mi} THEN array_position({dists}, array_min({dists}))")
    # NOTE on form: an expanded plain-arithmetic variant (element_at terms,
    # codegen-able, avoiding the interpreted higher-order fold) was measured
    # 3x SLOWER end-to-end here — the M*ksub-fold CASE becomes a ~16k-node
    # expression tree and Catalyst optimization time swamps the interpreted-
    # eval saving. The compact fold keeps the tree small; at 100 TB, where
    # encode cost dominates compile cost, switch encode_pq to the broadcast
    # codebook-join + min_by form instead of widening these literals.
    return "CASE " + " ".join(branches) + " END"


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    dsub: int = 16,
    ksub: int = 16,
    iters: int = 1,
    round_to: int = 6,
) -> list[list[list[float]]]:
    """Train one k-means codebook per subspace. Returns
    ``codebooks[m][code][dim]`` (code is 0-based here; columns/SQL use the
    1-based first-minimum position).

    Same determinism contract as clustering.kmeans_fit (seed = vectors
    with id < ksub, per-iteration centroid rounding, first-minimum
    argmin, empty clusters keep their centroid) — but all M subspaces
    train TOGETHER: per iteration, one distributed pass over the exploded
    (id, m, subvector) frame assigns every subspace's clusters, and one
    groupBy(m, cluster) recomputes every codebook's means. M separate
    kmeans_fit loops would cost M×(iters+1) jobs; this costs 1+iters, and
    only M×ksub×dsub scalars ever reach the driver. At scale, train on a
    hash-sample: codebooks are statistics, they do not need the corpus.
    """
    ex = _exploded_subspaces(df, id_col, vec_col, m, dsub)
    seed_rows = (
        ex.where(F.col(id_col) < ksub)
        .select(
            id_col, "m", F.expr(f"transform(s, x -> round(x, {round_to}))").alias("s")
        )
        .collect()
    )
    codebooks: list[list[list[float] | None]] = [[None] * ksub for _ in range(m)]
    for r in seed_rows:
        codebooks[r["m"]][r[id_col]] = list(r["s"])
    missing = [(mi, ci) for mi in range(m) for ci in range(ksub) if codebooks[mi][ci] is None]
    if missing:
        raise ValueError(
            f"seed contract violated: need ids 0..{ksub - 1} present for every "
            f"subspace (missing (m, id) pairs: {missing[:5]}...); cluster "
            "numbering must match the oracle's vec_id+1 scheme"
        )
    for _ in range(iters):
        assigned = ex.withColumn("cluster", F.expr(_assign_case_sql(codebooks)).cast("int"))
        rows = (
            assigned.groupBy("m", "cluster")
            .agg(
                *[
                    F.round(F.avg(F.element_at("s", i + 1)), round_to).alias(f"c{i}")
                    for i in range(dsub)
                ]
            )
            .collect()
        )
        by_key = {(r["m"], r["cluster"]): [r[f"c{i}"] for i in range(dsub)] for r in rows}
        codebooks = [
            [by_key.get((mi, ci + 1), codebooks[mi][ci]) for ci in range(ksub)]
            for mi in range(m)
        ]
    return codebooks


def encode_pq(df: DataFrame, vec_col: str, codebooks: list[list[list[float]]], dsub: int) -> DataFrame:
    """Add 1-based ``code0..code{M-1}`` int columns: nearest codebook entry
    per subspace (squared L2, ties -> first minimum). Pure literal-folded
    column expressions — whole-stage-codegen'd, no Python in the scan."""
    out = df
    for mi, cb in enumerate(codebooks):
        sub = f"slice({vec_col}, {mi * dsub + 1}, {dsub})"
        dists = "array(" + ", ".join(literal_fold_sql(sub, c, term="l2sq") for c in cb) + ")"
        out = out.withColumn(
            f"code{mi}", F.expr(f"array_position({dists}, array_min({dists}))").cast("int")
        )
    return out


def adc_topk(
    encoded: DataFrame,
    id_col: str,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    dsub: int,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k: for each (query_id, exact query vector),
    build the M×ksub lookup table driver-side (tiny: M*ksub doubles), then
    rank the encoded corpus by ``sum_m lut[m][code_m]``.

    Each query's branch is ``orderBy(...).limit(k)`` —
    TakeOrderedAndProject, a per-partition partial top-k with no global
    sort — and the branches union. Queries are few (the broadcast-side
    contract shared with operators/similarity.py); the corpus side streams
    through codegen'd lookups. NOTE each branch re-scans ``encoded``: when
    nq x scan cost dominates (a big corpus and more than a handful of
    queries), persist the encoded frame or serve from a written codes
    table (tools/pqwin.py measures that artifact) instead of re-deriving
    it per branch.
    """
    if not queries:
        raise ValueError("adc_topk: queries must be non-empty")
    m = len(codebooks)
    per_q = []
    for qid, qvec in queries:
        luts = []
        for mi in range(m):
            qs = qvec[mi * dsub : (mi + 1) * dsub]
            luts.append([_fold_l2sq(qs, c) for c in codebooks[mi]])
            # a NaN/inf LUT value (corrupt embeddings) would otherwise embed
            # an unparseable float literal ("inf D") in the SQL below and
            # surface as a cryptic parser error far from the cause
            bad = next((v for v in luts[-1] if not math.isfinite(v)), None)
            if bad is not None:
                raise ValueError(
                    f"adc_topk: non-finite distance {bad!r} in LUT for "
                    f"query {qid!r} subspace {mi} — the query vector or "
                    "codebook contains NaN/inf; clean the embeddings first"
                )
        # fixed summand order (m = 0..M-1): matches the oracle's l0+l1+...
        approx = " + ".join(
            "element_at(array("
            + ", ".join(repr(float(v)) + "D" for v in luts[mi])
            + f"), code{mi})"
            for mi in range(m)
        )
        per_q.append(
            encoded.where(F.col(id_col) != qid)
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col(id_col),
                F.round(F.expr(approx), round_to).alias("adc_d2"),
            )
            .orderBy("adc_d2", id_col)
            .limit(k)
        )
    out = per_q[0]
    for b in per_q[1:]:
        out = out.unionByName(b)
    return out
