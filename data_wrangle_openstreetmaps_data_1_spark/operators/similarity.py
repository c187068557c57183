"""Similarity search over an ``array<float>`` embedding column.

- ``knn_brute``: exact top-k cosine — broadcast the (small) query set,
  cosine as a pure column expression, per-query top-k via window
  ``row_number``. At 100 TB the scan dominates; the cross join is
  broadcast-nested-loop with the tiny query side broadcast, so no shuffle
  of the big side at all.
- ``ann_lsh``: random-hyperplane (sign) LSH bucketing — candidates share a
  bucket key, turning top-k into a keyed equi-join + local top-k. This is
  the scale path when the query set is large.
- ``embedding_neardup_pairs``: pairs with cosine >= tau, LSH-bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import topk_per_key

from ..functions.vectors import cosine, literal_fold_sql
from ..partitioning import spread, truncate_lineage


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG -> [-1, 1]); no runtime
    RNG so results are reproducible across engines and runs."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (2**31)
            row.append((state / 2**30) - 1.0)
        planes.append(row)
    return planes


def knn_brute(
    targets: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    approx_target_count: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim rounded to 6), k rows per query,
    ties broken by neighbor id. ``queries`` must be small (it is broadcast).
    ``approx_target_count``: optional free upper bound on |targets| (parquet
    footer count) — per-query candidates of the broadcast crossJoin are
    exactly |targets|, so it feeds topk_per_key's cost-based shard sizing
    (single window below SINGLE_STAGE_MAX_CANDIDATES; value-identical).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    t = spread(targets).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("t_vec"))
    scored = (
        t.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("t_vec")).alias("cos_raw"),
        )
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.desc("cos_raw"), F.asc("neighbor_id")],
        k,
        "neighbor_id",
        rank_col="rk",
        approx_candidates_per_key=approx_target_count,
    ).select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))


def lsh_bucket_sql(vec_col: str, planes: list[list[float]]) -> str:
    """Sign-LSH bucket key — one bit per hyperplane (dot(v, plane) >= 0) —
    as a single SQL string (one JVM parse instead of ~1000 py4j literal
    round-trips; see functions/hashing.py). The left-fold order matches
    DuckDB's ``list_reduce`` exactly, so the sign bits — and therefore
    bucket membership — agree across engines."""
    bits = []
    for p in planes:
        dot = literal_fold_sql(vec_col, p, term="dot")
        bits.append(f"(case when {dot} >= 0 then '1' else '0' end)")
    return "concat(" + ", ".join(bits) + ")"


def ann_lsh(
    targets: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    approx_target_count: int | None = None,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Recall < 1 by design; the bucket join replaces the full scan.
    Output schema matches :func:`knn_brute`. ``approx_target_count``:
    optional free |targets| bound (>= any bucket's size) for topk_per_key's
    cost-based shard sizing."""
    planes = _hyperplanes(dim, n_planes)
    bucket = F.expr(lsh_bucket_sql(vec_col, planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        bucket.alias("bucket"),
    )
    t = spread(targets).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("t_vec"),
        bucket.alias("bucket"),
    )
    scored = (
        t.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("t_vec")).alias("cos_raw"))
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.desc("cos_raw"), F.asc("neighbor_id")],
        k,
        "neighbor_id",
        rank_col="rk",
        approx_candidates_per_key=approx_target_count,
    ).select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))


def ann_lsh_multiband(
    targets: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    bands: int = 4,
    approx_target_count: int | None = None,
) -> DataFrame:
    """Multi-probe sign-LSH ANN: candidates = union over ``bands``
    independent hyperplane sets of same-bucket rows, then exact-cosine
    top-k. Single-band ann_lsh has measured recall@10 of 0.0-0.2 on the
    embeddings corpus (sim_recall_at_k) because one 8-bit bucket holds
    ~1/256 of the corpus; OR-ing ``bands`` independent buckets trades
    ``bands``x the candidate volume for multiplicatively better recall —
    the standard LSH OR-construction (same banding the neardup pair path
    uses). Still a keyed equi-join per band, never a full scan; the
    100 TB shape is unchanged.

    Output schema matches :func:`knn_brute`.
    """
    keys = ", ".join(
        f"concat('{bi}:', {lsh_bucket_sql(vec_col, planes)})"
        for bi, planes in enumerate(neardup_band_planes(dim, n_planes, bands))
    )
    bucket = F.explode(F.expr(f"array({keys})")).alias("bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), bucket
    )
    t = spread(targets).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("t_vec"), bucket
    )
    scored = (
        t.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("t_vec")).alias("cos_raw")
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.desc("cos_raw"), F.asc("neighbor_id")],
        k,
        "neighbor_id",
        rank_col="rk",
        approx_candidates_per_key=approx_target_count,
    ).select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Retrieval quality of an ANN result against the exact top-k ground
    truth: per query, ``hits`` = |approx ∩ exact| and ``recall_at_k`` =
    hits / k. Both inputs are (query_id, neighbor_id, ...) top-k tables.

    Queries the ANN missed entirely still get a row (hits = 0) via the
    left join from the exact side's query list — silent omission is the
    failure mode this metric exists to catch. Join moves (query, neighbor)
    id pairs only: at scale this is k rows per query per side, so the
    whole check is driver-negligible regardless of corpus size.
    """
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.round(F.coalesce("hits", F.lit(0)).cast("double") / F.lit(float(k)), 6).alias(
                "recall_at_k"
            ),
        )
    )


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, nprobe: int = 1
) -> DataFrame:
    """Coarse quantization: nearest ``nprobe`` centroids per vector (squared
    L2, ties by centroid id). Centroids are broadcast; assignment is one
    scan of the big side — the IVF build cost.
    """
    c = centroids.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = vectors.crossJoin(F.broadcast(c)).withColumn(
        "d2", _l2sq(F.col(vec_col), F.col("c_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("d2"), F.asc("c_id"))
    return (
        scored.withColumn("crk", F.row_number().over(w))
        .where(F.col("crk") <= nprobe)
        .select(id_col, vec_col, F.col("c_id").alias("cluster"))
    )


def ivf_search(
    targets: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 2,
    approx_target_count: int | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine: targets live in their single nearest
    cluster; each query probes its ``nprobe`` nearest clusters and scores
    only those clusters' members. Recall < 1 by design; the cluster
    equi-join replaces the full scan (the 100 TB path: partition the target
    table by cluster at write time and the probe prunes partitions).

    Output schema matches :func:`knn_brute`.
    """
    t = ivf_assign(spread(targets), centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("t_vec"), "cluster"
    )
    q = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cluster"
    )
    scored = (
        t.join(F.broadcast(q), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("t_vec")).alias("cos_raw"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.desc("cos_raw"), F.asc("neighbor_id")],
        k,
        "neighbor_id",
        rank_col="rk",
        approx_candidates_per_key=approx_target_count,
    ).select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))


NORMALIZE_EXPR = (
    "transform({v}, x -> x / sqrt(aggregate({v}, cast(0.0 as double), "
    "(acc, y) -> acc + y * y)))"
)


def quantize_stats(targets: DataFrame, vec_col: str) -> DataFrame:
    """One-row global max-|component| of the L2-NORMALIZED target corpus —
    the symmetric scalar-quantization codebook. max of doubles is exact and
    order-independent, so the codebook is deterministic however the corpus
    is partitioned."""
    vn = F.expr(NORMALIZE_EXPR.format(v=vec_col))
    return targets.select(F.explode(vn).alias("x")).agg(F.max(F.abs(F.col("x"))).alias("m"))


def quantize_q8_expr(vec_col: str) -> str:
    """SQL string: ``array<double>`` -> SYMMETRIC int levels in [-127, 127]
    over the L2-normalized vector, against the broadcast ``m`` codebook
    column. Normalize-then-symmetric-quantize is what makes the integer dot
    track COSINE: the earlier min/max form was affine (a +shift per
    component), so dot(q(a), q(b)) ranked ``dot(a,b) - lo*sum(b) + const``
    — a systematically different objective, measured at 0.0-0.2 recall@10
    against exact cosine by sim_recall_at_k. The symmetric form has no
    shift term: dot(q(a), q(b)) ~ (127/m)^2 * cos-numerator on unit
    vectors. ``floor``, not ``round`` — Spark rounds HALF_UP while other
    engines round half-even, and floor on the identical double product is
    deterministic everywhere."""
    vn = NORMALIZE_EXPR.format(v=vec_col)
    return (
        f"transform({vn}, x -> cast(floor(x * (cast(127 as double) / m)) as bigint))"
    )


def knn_quantized(
    targets: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    approx_target_count: int | None = None,
) -> DataFrame:
    """Top-k neighbors by integer dot product over int8-quantized vectors
    (4x memory/bandwidth compression — the standard first move when the
    float corpus stops fitting executor memory or the scan is
    bandwidth-bound).

    The codebook (global max-|component| of the NORMALIZED target corpus)
    applies to both sides, as in production retrieval. The score is exact
    int64 arithmetic end-to-end (no float anywhere in scoring or ranking,
    so results are bit-stable across engines, runs, and partitionings —
    unlike float cosine, whose sum order matters). Ties break on neighbor
    id. Queries broadcast; the big side never shuffles (same BNLJ shape as
    :func:`knn_brute`, at a quarter of the bytes). sim_recall_at_k pins
    this scorer's fidelity against exact cosine per query.
    """
    stats = quantize_stats(targets, vec_col)
    q = F.expr(quantize_q8_expr(vec_col))
    qs = queries.crossJoin(F.broadcast(stats)).select(
        F.col(id_col).alias("query_id"), q.alias("qa")
    )
    ts = spread(targets).crossJoin(F.broadcast(stats)).select(
        F.col(id_col).alias("neighbor_id"), q.alias("qb")
    )
    scored = (
        ts.crossJoin(F.broadcast(qs))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qa, qb, (a, b) -> a * b), cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("qscore"),
        )
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.desc("qscore"), F.asc("neighbor_id")],
        k,
        "neighbor_id",
        rank_col="rk",
        approx_candidates_per_key=approx_target_count,
    ).select("query_id", "neighbor_id", "qscore")


def neardup_band_planes(
    dim: int = 64, n_planes: int = 8, bands: int = 4
) -> list[list[list[float]]]:
    """Per-band hyperplane sets for banded near-dup LSH — one deterministic
    seed per band. Shared with the generated DuckDB oracle so bucket bits
    agree across engines."""
    return [_hyperplanes(dim, n_planes, seed=11 + bi) for bi in range(bands)]


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Pairs of rows with cosine >= tau (embedding near-duplicate detection).

    Candidates come from a banded sign-LSH equi-join — a pair is considered
    iff it shares ALL ``n_planes`` sign bits in at least one of ``bands``
    independent hyperplane sets — then verified with exact cosine. No
    all-pairs product anywhere: the band join shuffles (id, bucket-string)
    rows only, vectors are re-joined for the (small) candidate set. Recall
    < 1 by design (standard LSH trade: more bands / fewer planes per band =
    more recall, more candidates); the oracle mirrors the same bucket
    gating, so the output is deterministic and value-checkable.
    """
    df = spread(df)
    keys = ", ".join(
        f"concat('{bi}:', {lsh_bucket_sql(vec_col, planes)})"
        for bi, planes in enumerate(neardup_band_planes(dim, n_planes, bands))
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # Persisted for the self-join below: the two join branches would each
    # re-evaluate the bands*n_planes dot products otherwise (ReusedExchange
    # does not dedupe pre-shuffle compute; see minhash_lsh_pairs). Cache
    # lifetime is bounded to THIS call: the (small, tau-filtered) result is
    # eagerly materialized via localCheckpoint and the band cache released
    # before returning — a lazily returned plan would pin it in executor
    # memory for the session (the ADVICE r7/r8 leak class, same fix as
    # dedup.py:jaccard_prefix_pairs).
    banded = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(f"array({keys})")).alias("bucket"),
    ).persist()
    try:
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), "bucket")
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        return (
            cand.join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a")
            .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b")
            .select("id_a", "id_b", F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= tau)
            .transform(truncate_lineage)
        )
    finally:
        banded.unpersist()
