"""Property tests for the fixed-point PageRank operator."""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_1_spark.operators.graph import SCALE, pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.pr_fp for r in pagerank(df, **kw).collect()}


def test_star_center_dominates(spark):
    # undirected star: the hub must outrank every leaf, and all leaves tie
    edges = [(0, i) for i in range(1, 8)]
    pr = _pr(spark, edges)
    leaves = {pr[i] for i in range(1, 8)}
    assert len(leaves) == 1
    assert pr[0] > leaves.pop()


def test_symmetric_pair_ties(spark):
    pr = _pr(spark, [(1, 2)])
    assert pr[1] == pr[2]


def test_mass_conserved_up_to_floor_loss(spark):
    # total fixed-point mass stays within floor-division loss of SCALE:
    # each of the 3 rounds loses < 1 unit per node per div (two divs/round)
    edges = [(i, i + 1) for i in range(10)] + [(0, 5), (3, 9)]
    pr = _pr(spark, edges)
    n = len(pr)
    total = sum(pr.values())
    assert total <= SCALE
    assert total >= SCALE - 3 * 2 * n * 100  # generous floor-loss bound
    assert all(v > 0 for v in pr.values())


def test_ring_is_uniform(spark):
    # a ring is vertex-transitive: every node must get the identical score
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    pr = _pr(spark, edges)
    assert len(set(pr.values())) == 1
    assert len(pr) == n


def test_directed_keeps_source_only_nodes(spark):
    # node 4 has an out-edge but NO in-edge: it must stay in the result
    # (teleport-only rank) and keep contributing to node 1 every round
    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
    pr = _pr(spark, edges, symmetrize=False)
    assert set(pr) == {1, 2, 3, 4}
    # node 4 never receives: teleport-only rank, strictly the smallest —
    # but present and positive (the round-1 dropout bug would lose it)
    assert 0 < pr[4] < min(pr[1], pr[2], pr[3])


def test_mismatched_index_artifacts_rejected(spark):
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_join,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], ["doc_id", "text"]
    )
    art = minhash_index(docs, "doc_id", "text", k=16, bands=4)
    with pytest.raises(ValueError, match="mismatched"):
        minhash_lsh_join(docs, None, "doc_id", "text", k=16, bands=8,
                         index_artifacts=art)
    with pytest.raises(ValueError, match="divide"):
        minhash_index(docs, "doc_id", "text", k=16, bands=5)
