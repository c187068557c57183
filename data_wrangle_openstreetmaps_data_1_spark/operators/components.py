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

from ..partitioning import truncate_lineage, truncate_lineage_lazy


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

    r18 optimization round: the iteration runs over edge ENDPOINTS only. A
    node with no edges can never change label, so the label table is
    restricted to nodes that appear in ``sym`` (one semi-join up front);
    singletons rejoin as themselves in one final left join. Per-round
    shuffle + checkpoint volume then scales with the DUP-TOUCHED doc
    count, not the corpus — at 100 TB near-dup endpoints are a small
    fraction of all documents, while the old loop re-shuffled and
    re-materialized every corpus id every round (napkin: at 50B docs /
    ~20% touched, ~2 TB of label shuffle saved per round against a
    one-time endpoint semi-join + final rejoin of ~2 TB — a win for any
    graph needing >= 2 rounds, i.e. all of them). ``sym`` is materialized
    EAGERLY (truncate_lineage) because round 1 reads it twice — through
    ``nbr`` and through the endpoint semi-join — and a lazy persist would
    let those concurrent stages each recompute the full pair-generator
    lineage (partitioning.eager_cache has the measured race profile).
    Output-identical to the all-nodes loop, including edges whose
    endpoints are absent from ``nodes`` (such endpoints propagate nothing:
    they have no label row, exactly as before); oracle-checked against
    the same recursive-CTE twin. Measured at sf0.1 interleaved A/B (min
    of 6): dd_groups_cc 3.88s old vs 4.44s new, dd_groups_minhash 3.17s
    vs 3.24s — the local cost is the two extra one-time joins at ~7k
    rows, accepted for the corpus-proportional-to-touched-proportional
    round cost at scale.

    A persist-per-round variant (one action per round instead of
    checkpoint + agg) was A/B-measured SLOWER (dd_groups_cc 6.7s):
    building the columnar InMemoryRelation costs more than the
    localCheckpoint block write, and the lineage kept between checkpoints
    doubles plan text per round. Checkpoint-every-round stays.

    Raises if ``max_iters`` rounds don't converge (a cycle cannot cause
    this — labels are monotonically non-increasing and bounded by the
    component min — but a pathological path graph longer than ``max_iters``
    would; raise rather than silently return wrong labels).
    """
    ids = nodes.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    sym = truncate_lineage(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    )

    # endpoint nodes only; the semi-join keeps label rows for REAL nodes
    # (an edge endpoint absent from `nodes` propagates nothing — exactly
    # the old behavior, where it simply had no label row)
    labels = ids.join(
        sym.select(F.col("a").alias("id")).distinct(), "id", "left_semi"
    ).select("id", F.col("id").alias("label"))
    for _ in range(max_iters):
        # neighbor's current label, keyed by the receiving node
        nbr = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # truncate_lineage_lazy (LAZY localCheckpoint or reliable
        # checkpoint per the package flag): the ``changed`` aggregate
        # below is a single global scan of every partition of ``merged``,
        # so ONE job computes the round, materializes its blocks, and
        # collects the convergence counter (r19: 2 jobs/round -> 1; the
        # eager form paid a separate materialization job, then re-read
        # the blocks for the aggregate — at scale a full extra pass over
        # the label table per round). The lineage is still truncated
        # every round: plain persist caches data but keeps the full
        # logical lineage, whose plan TEXT doubles per round — past ~10
        # rounds AQE's explainString alone OOMs the driver heap
        # (observed on a 17-node path graph). Old rounds' blocks are
        # released by the context cleaner when the superseded frames are
        # garbage collected.
        merged = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("new_label"),
                F.col("label"),
            )
        ).transform(truncate_lineage_lazy)
        changed = (
            merged.agg(
                F.sum((F.col("new_label") < F.col("label")).cast("long"))
            ).collect()[0][0]
            or 0
        )
        labels = merged.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            # singletons never entered the loop; they label themselves
            return ids.join(labels, "id", "left").select(
                "id", F.coalesce("label", F.col("id")).alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds the round budget)"
    )


def _edge_digest(e: DataFrame) -> tuple:
    """Order-independent digest of an edge set, one distributed action:
    (count, sum u, sum v, xor of xxhash64(u, v)). Used as the convergence
    check for the star algorithm — the edge set is a fixpoint iff a round
    leaves it unchanged, and comparing digests avoids a full set-equality
    join. The 64-bit hash-xor term makes an undetected change require an
    exact multi-column collision (a false "converged" would need count AND
    both id-sums AND the hash-xor to collide simultaneously). Id sums go
    through decimal(38,0) and the hash through xor (not sum) because ANSI
    mode makes a long-overflowing sum an ERROR, not a wrap."""
    row = e.agg(
        F.count("*"),
        F.sum(F.col("u").cast("decimal(38,0)")),
        F.sum(F.col("v").cast("decimal(38,0)")),
        F.expr("bit_xor(xxhash64(u, v))"),
    ).collect()[0]
    return tuple(row)


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """Min-id connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public). Same contract as :func:`connected_components`.

    Where this beats label propagation — and where it doesn't:

    - **Round count**: O(log^2 n) worst case (log n in practice) vs
      O(component diameter) — a 17-node chain converges in <= 10 rounds
      where label propagation needs 16 (pinned in
      tests/test_components.py). The win case is deep/chain-shaped
      components or unknown diameter.
    - **Working set**: the iteration touches EDGES ONLY — singletons never
      enter the loop; the node table joins in once at the end. At scale
      the per-round shuffle is proportional to the pair count, not the
      corpus.
    - **Measured trade-off** (sf0.1, 2.3k pairs, diameter <= 2 planted
      clusters): label propagation 1.7s vs star 4.3s — star's ~5 shuffles
      + 2 actions per round lose to label prop's 2 + 1 when rounds are few
      and frames tiny, which is exactly the near-dup dedup shape. Hence
      dedup_groups defaults to label propagation and exposes
      ``algorithm="star"`` for deep graphs.

    Per round: large-star hooks every neighbor v > u to m = min(N(u) ∪ u)
    (keyed groupBy-min + self-join), then small-star re-points every
    smaller neighbor of each node to that node's min. Both are keyed
    equi-joins + partial-agg groupBys — no driver-side graph; per round,
    one eager localCheckpoint (materialize + lineage truncation) and one
    scalar digest collect. At the fixpoint the edge set IS the star set
    (child -> component min), so labels fall out of one final left join.
    """
    ids = nodes.select(F.col(id_col).alias("id")).distinct()
    # Restrict edges to endpoints present in `nodes` — label propagation
    # does this implicitly (an unknown endpoint has no label row to
    # propagate), and without the filter the star algorithm would adopt an
    # unknown endpoint as a component minimum, emitting labels that don't
    # exist in the node table. Two semi-joins over the skinny edge list,
    # cheaper than a single iteration round.
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .join(ids.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(ids.withColumnRenamed("id", "v"), "v", "left_semi")
        .distinct()
        .persist()
    )
    prev_digest = _edge_digest(e)
    prev = e
    for _ in range(max_iters):
        # large-star: m(u) = min(u, min neighbors); emit (v, m) for v > u
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on the large-star output: direct each edge to the
        # smaller endpoint, re-point every smaller neighbor (and the
        # center) to the neighborhood min
        d = large.select(
            F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
        ).distinct()
        mins2 = d.groupBy("a").agg(F.min("b").alias("m"))
        # LAZY localCheckpoint (r19, the label-prop loop's fusion): the
        # digest collect right below is one global aggregate over every
        # partition of ``nxt``, so one job computes the round,
        # materializes its blocks, AND collects the digest — the eager
        # form was the star loop's "2 actions per round" the r18 verdict
        # flagged. Lineage is still truncated every round (see
        # connected_components — per-round plan text otherwise doubles
        # and OOMs the driver past ~10 rounds).
        nxt = (
            d.join(mins2, "a")
            .where(F.col("b") != F.col("m"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select(F.col("a").alias("u"), F.col("m").alias("v")))
            .distinct()
            .transform(truncate_lineage_lazy)
        )
        digest = _edge_digest(nxt)
        if prev is not None:
            prev.unpersist()  # the round-0 persisted input; later rounds'
            prev = None  # checkpoint blocks are GC-cleaned
        e = nxt
        if digest == prev_digest:
            # fixpoint: e is (child, root) stars with root = component min;
            # root < child for every edge, singletons absent. The final
            # checkpoint blocks back the returned plan; note checkpoint
            # blocks live in the BlockManager, NOT the SQL cache —
            # catalog.clearCache() does not free them, the context cleaner
            # does once the frames are garbage collected.
            star = e.groupBy(F.col("u").alias("id")).agg(F.min("v").alias("component"))
            return ids.join(star, "id", "left").select(
                "id", F.coalesce("component", F.col("id")).alias("component")
            )
        prev_digest = digest
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iters} rounds"
    )


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    algorithm: str = "label",
) -> DataFrame:
    """Keeper resolution over near-dup pairs: every document labeled with
    its duplicate-group id (= min doc id in the component) and whether it
    is the kept canonical copy. Singleton docs keep themselves.

    Output: (doc_id, group_id, is_keeper) — the drop set for a dedup pass
    is ``is_keeper = false``.

    Algorithm choice, MEASURED at sf0.1 (6.7k docs, 2.3k pairs, planted
    near-dup clusters of diameter <= 2): label propagation 1.7s vs
    large-star/small-star 4.3s on identical pre-materialized pairs —
    near-dup components are dense and shallow, so rounds = ~3 for both,
    and label prop runs 2 shuffles + 1 action per round vs star's ~5 + 2.
    ``algorithm="star"`` flips to :func:`connected_components_star` for
    graphs where its O(log^2) round bound wins: chain-shaped components
    (audit trails, citation chains) or any edge set whose diameter is not
    known to be small. Both are value-checked against the same recursive-
    CTE oracle (dd_groups_cc / dd_groups_cc_star).
    """
    algo = connected_components_star if algorithm == "star" else connected_components
    cc = algo(
        docs.select(F.col(id_col).alias("id")),
        pairs.select(F.col(pair_a).alias("src"), F.col(pair_b).alias("dst")),
    )
    return cc.select(
        F.col("id").alias(id_col),
        F.col("component").alias("group_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
