"""Iterative clustering: Lloyd's k-means over an embedding column.

The iterative-algorithm shape on Spark: per iteration, ONE distributed
pass assigns every vector to its nearest centroid (centroids are a tiny
k x dim literal broadcast inside the expression), then a groupBy recomputes
means; only the k x dim centroid matrix ever reaches the driver. The data
DataFrame is never collected.

Determinism contract (what makes this oracle-checkable even though it is
iterative): seed centroids are the vectors with id < k; every recomputed
centroid coordinate is rounded to ``round_to`` decimals before the next
iteration, so both engines quantize to identical centroids and therefore
identical assignments; argmin ties break to the lowest centroid index
(array_position/list_position both return the FIRST minimum, 1-based).

Scale notes: per iteration cost = one scan + one k-way groupBy (partial
aggregation does the heavy lifting map-side). k iterations = k scans; at
100 TB you cache the (id, vec) projection once up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import literal_fold_sql


def _d2_sql(vec_col: str, centroid: list[float]) -> str:
    return literal_fold_sql(vec_col, centroid, term="l2sq")


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add a 1-based ``cluster`` column: index of the nearest centroid
    (squared L2; ties -> lowest index via first-minimum array_position)."""
    dists = "array(" + ", ".join(_d2_sql(vec_col, c) for c in centroids) + ")"
    return df.withColumn(
        "cluster", F.expr(f"array_position({dists}, array_min({dists}))").cast("int")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    round_to: int = 6,
) -> tuple[list[list[float]], DataFrame]:
    """Run ``iters`` Lloyd iterations; returns (final centroids, assignment
    DataFrame). Seed centroids = vectors with ``id_col`` < k, coordinates
    rounded like every later iteration so iteration 0 follows the same
    quantization contract.

    Residual nondeterminism caveat: the quantization contract assumes a
    rounded per-cluster mean never lands within an ulp of a rounding
    boundary — avg() accumulation order differs between engines (and across
    Spark runs), so a boundary hit would flip a centroid coordinate and
    cascade. With ``round_to=6`` the per-coordinate probability is ~1e-10;
    accepted and documented rather than pretended away.
    """
    if iters < 1:
        raise ValueError(f"iters={iters} must be >= 1")
    seed = (
        df.where(F.col(id_col) < k)
        .orderBy(id_col)
        .select(id_col, F.transform(vec_col, lambda x: F.round(x, round_to)).alias("v"))
        .collect()
    )
    if len(seed) != k or [r[id_col] for r in seed] != list(range(k)):
        raise ValueError(
            f"seed contract violated: need exactly ids 0..{k - 1} present "
            f"(got {[r[id_col] for r in seed]}); cluster numbering must match "
            "the oracle's vec_id+1 scheme"
        )
    centroids = [list(r["v"]) for r in seed]
    dim = len(centroids[0])

    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, centroids)
        new_rows = (
            assigned.groupBy("cluster")
            .agg(*[F.round(F.avg(F.element_at(vec_col, i + 1)), round_to).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        by_cluster = {r["cluster"]: [r[f"c{i}"] for i in range(dim)] for r in new_rows}
        # empty clusters keep their previous centroid
        centroids = [by_cluster.get(ci + 1, centroids[ci]) for ci in range(k)]
    return centroids, assigned


def kmeans_summary(df: DataFrame, id_col: str, vec_col: str, k: int = 8, iters: int = 3) -> DataFrame:
    """Registered-query form: per-cluster size and rounded centroid norm
    after ``iters`` iterations — compact, exactly comparable output."""
    centroids, assigned = kmeans_fit(df, id_col, vec_col, k=k, iters=iters)
    norms = {ci + 1: round(sum(x * x for x in c) ** 0.5, 6) for ci, c in enumerate(centroids)}
    norm_map = F.create_map(*[F.lit(x) for kv in norms.items() for x in kv])
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n_members"))
        .withColumn("centroid_norm", norm_map[F.col("cluster")])
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.45,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with k-means, then inside each cluster drop every
    item that has ANY >= tau cosine neighbor with a smaller id — even one
    that was itself dropped. This is an over-approximation of the greedy
    keep-first rule (chain a~b, b~c, a!~c: greedy keeps c, this drops it),
    chosen because it is a single keyed self-join instead of an inherently
    sequential per-cluster scan; deterministic by id order, and the oracle
    mirrors the same rule.

    Scale story: clustering first is what makes embedding dedup tractable —
    the pairwise stage is confined WITHIN clusters, so its cost is
    sum(|cluster|^2) instead of n^2; at 100 TB you scale k with n to keep
    cluster sizes bounded (SemDeDup's own recipe), and the per-cluster
    pair join is a keyed equi-join on cluster id that AQE can split.

    Output: (cluster, n_members, n_dropped) — compact, exactly comparable;
    cosine rounded to 6 before the threshold so both engines decide
    identically (the sim_neardup_cosine parity contract).
    """
    from ..functions.vectors import cosine

    _, assigned = kmeans_fit(df, id_col, vec_col, k=k, iters=iters)
    a = assigned.select("cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = assigned.select("cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
    near = pairs.where(F.round(cosine(F.col("va"), F.col("vb")), 6) >= tau)
    drops = near.select("cluster", "id_b").distinct()
    members = assigned.groupBy("cluster").agg(F.count("*").alias("n_members"))
    nd = drops.groupBy("cluster").agg(F.count("*").alias("n_dropped"))
    return members.join(nd, "cluster", "left").select(
        "cluster", "n_members", F.coalesce("n_dropped", F.lit(0)).alias("n_dropped")
    )
