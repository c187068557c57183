"""Connected components over near-duplicate pairs: dedup GROUP resolution.

Pair generators (exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding
cosine — operators/dedup.py, similarity.py) emit EDGES; a training-data
pipeline then needs the transitive closure: which documents form one
duplicate cluster, and which single document to keep. That is connected
components with min-id labeling — the keeper is the smallest doc id in the
component (the same keep-min convention as exact_dedup).

Algorithm: iterative min-label propagation (the standard large-graph CC on
a relational engine — each round, every node takes the min of its own label
and its neighbors' labels). Converges in O(component diameter) rounds;
near-dup components are shallow (pairs are dense within a cluster), so a
handful of rounds suffice. Each round is one keyed equi-join + groupBy —
no driver-side graph, only the single converged/changed counter is
collected per round (same contract as kmeans_fit's k x dim centroids).

Scale notes: the label table is (id, label) bigints — at 100 TB of
documents this is the small derived table, shuffled by id. The edge table
is symmetrized once up front. Persist both; each iteration's shuffle reuses
the edge partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Min-id connected components.

    ``nodes``: one row per member (singletons allowed — they label
    themselves). ``edges``: undirected pairs (each pair once is enough;
    symmetrized internally). Returns (id, component) where component is the
    smallest id reachable from ``id``.

    Raises if ``max_iters`` rounds don't converge (a cycle cannot cause
    this — labels are monotonically non-increasing and bounded by the
    component min — but a pathological path graph longer than ``max_iters``
    would; raise rather than silently return wrong labels).
    """
    ids = nodes.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()

    labels = ids.select("id", F.col("id").alias("label"))
    prev = None  # the persisted frame backing the current `labels`
    try:
        for _ in range(max_iters):
            # neighbor's current label, keyed by the receiving node
            nbr = (
                sym.join(labels.withColumnRenamed("id", "a"), "a")
                .groupBy(F.col("b").alias("id"))
                .agg(F.min("label").alias("nbr_label"))
            )
            merged = (
                labels.join(nbr, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                    ).alias("new_label"),
                    F.col("label"),
                )
            ).persist()
            # ONE action per round: the full-scan aggregate both counts the
            # still-improving labels and MATERIALIZES merged's cache (every
            # partition is computed to feed the sum). Materialize-before-
            # unpersist matters: dropping the previous round's cache first
            # would make every later round recompute the whole lineage back
            # to round 0 (O(rounds^2) joins).
            changed = (
                merged.agg(
                    F.sum((F.col("new_label") < F.col("label")).cast("long"))
                ).collect()[0][0]
                or 0
            )
            if prev is not None:
                prev.unpersist()
            prev = merged
            # labels is a cheap projection over the cached merged frame — no
            # second persist/materialize pass needed
            labels = merged.select("id", F.col("new_label").alias("label"))
            if changed == 0:
                return labels.select("id", F.col("label").alias("component"))
        # non-convergence: the last persisted frame will never be consumed —
        # release it before raising so a long-lived session doesn't
        # accumulate orphaned cached blocks
        if prev is not None:
            prev.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds the round budget)"
        )
    finally:
        sym.unpersist()


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Keeper resolution over near-dup pairs: every document labeled with
    its duplicate-group id (= min doc id in the component) and whether it
    is the kept canonical copy. Singleton docs keep themselves.

    Output: (doc_id, group_id, is_keeper) — the drop set for a dedup pass
    is ``is_keeper = false``.
    """
    cc = connected_components(
        docs.select(F.col(id_col).alias("id")),
        pairs.select(F.col(pair_a).alias("src"), F.col(pair_b).alias("dst")),
    )
    return cc.select(
        F.col("id").alias(id_col),
        F.col("component").alias("group_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
