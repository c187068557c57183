"""Unit tests for connected-components keeper resolution (operators/components.py)."""

from __future__ import annotations

import pytest

from data_wrangle_openstreetmaps_data_1_spark.operators.components import (
    connected_components,
    connected_components_star,
    dedup_groups,
)


def test_connected_components_path_star_singleton(spark):
    # component {1,2,3,4} is a PATH (worst diameter), {10,11,12} a star,
    # {99} a singleton with no edges
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 12, 99)], "id long")
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12)], "src long, dst long"
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_raises_past_round_budget(spark):
    # a 4-node path needs 3 propagation rounds; cap at 1 must raise, not
    # silently return partial labels
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(nodes, edges, max_iters=1)


def test_star_cc_matches_label_propagation(spark):
    # identical results on a mixed graph: path, star, triangle-with-tail,
    # singleton, plus ids deliberately NOT in min-first pair order
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 12, 20, 21, 22, 23, 99)], "id long"
    )
    edges = spark.createDataFrame(
        [(4, 3), (2, 1), (2, 3), (10, 11), (12, 10), (22, 21), (21, 20), (22, 20), (23, 22)],
        "src long, dst long",
    )
    lp = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    st = {r["id"]: r["component"] for r in connected_components_star(nodes, edges).collect()}
    assert st == lp
    assert st[23] == 20 and st[99] == 99 and st[4] == 1


def test_star_cc_fewer_rounds_on_path_graph(spark):
    # a 17-node chain has diameter 16: label propagation needs 16 rounds
    # (raises at a 10-round budget) while large-star/small-star contracts
    # it within ~log^2 rounds — the round-reduction claim, pinned
    nodes = spark.createDataFrame([(i,) for i in range(17)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(16)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(nodes, edges, max_iters=10)
    got = {r["id"]: r["component"] for r in
           connected_components_star(nodes, edges, max_iters=10).collect()}
    assert got == {i: 0 for i in range(17)}


def test_dedup_groups_keeper_selection(spark):
    docs = spark.createDataFrame([(i,) for i in (5, 6, 7, 8)], "doc_id long")
    pairs = spark.createDataFrame([(6, 7), (7, 8)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: (r["group_id"], r["is_keeper"]) for r in dedup_groups(docs, pairs).collect()}
    assert rows == {5: (5, True), 6: (6, True), 7: (6, False), 8: (6, False)}
