"""Iterative graph analytics: fixed-point PageRank on a relational engine.

Rounds out the iterative tier (ml_kmeans: centroid iteration;
components.py: label propagation / star contraction) with the third
classic iterative shape — per-round *weighted neighbor aggregation*. The
training-data use case is influence/authority scoring over derived link
graphs (domain graphs for crawl prioritization, citation graphs for
source weighting).

All arithmetic is integer fixed-point (SCALE = 10^12), every division an
integral ``div`` on non-negative operands — so the trajectory is
bit-identical between Spark and the DuckDB oracle's unrolled CTEs (the
ml_kmeans pattern: N iterations in the operator == N unrolled CTEs in
SQL). No floats, no libm, no convergence epsilon: the iteration count is
part of the operator contract.

100 TB shape: per iteration, ONE keyed equi-join (edges ⋈ ranks on src —
at scale both sides can be pre-bucketed by the join key, making rounds
exchange-free) + one groupBy(dst) with map-side partial sums. Rank and
degree tables are (id, long) rows — the small derived tables. Nothing
collects on the driver; the loop is a static Python unroll (fixed
``iters``), so the plan is finite and AQE optimizes each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_PCT = 85  # damping factor d = 0.85, as an integer percentage


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    symmetrize: bool = True,
) -> DataFrame:
    """Fixed-point PageRank over an edge list; returns (node, pr_fp).

    ``symmetrize`` treats the input as undirected (each edge both ways,
    deduped) — which also guarantees no dangling nodes (every node in the
    graph has outdegree >= 1), so no dangling-mass redistribution term is
    needed. With ``symmetrize=False`` the caller must guarantee that
    every node has an out-edge; isolated/dangling nodes would silently
    leak rank mass otherwise.

    r_0(v)   = SCALE div N
    r_i+1(v) = (15 * (SCALE div N)) div 100
             + (85 * Σ_{u→v} (r_i(u) div outdeg(u))) div 100

    Floor-division remainders make total mass shrink slightly per round;
    that loss is deterministic and identical across engines (both floor
    on non-negative ints), which is the point — determinism over the
    last decimal of a score nobody reads.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if symmetrize:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    nstats = nodes.agg(F.count("*").alias("n_nodes"))
    teleport = f"({100 - DAMP_PCT} * ({SCALE} div n_nodes)) div 100"

    r = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", F.expr(f"{SCALE} div n_nodes").alias("r")
    )
    for _ in range(iters):
        contrib = (
            e.join(r.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).alias("m"))
            .select(F.col("dst").alias("node"), "m")
        )
        if not symmetrize:
            # a directed graph can have zero-in-degree nodes; without this
            # backfill they would vanish from r after round 1 (groupBy only
            # emits receiving nodes) and stop contributing to their
            # out-neighbors. Symmetrized graphs skip the extra join: every
            # node has an in-edge by construction.
            contrib = nodes.join(contrib, "node", "left").select(
                "node", F.coalesce("m", F.lit(0)).alias("m")
            )
        r = contrib.crossJoin(F.broadcast(nstats)).select(
            "node",
            F.expr(f"{teleport} + ({DAMP_PCT} * m) div 100").alias("r"),
        )
    return r.select("node", F.col("r").alias("pr_fp"))
