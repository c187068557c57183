"""Property-based equivalence tests for the round-6 algorithm pairs.

Fixed fixtures pin known shapes; these throw arbitrary small graphs and
skewed key distributions at the implementations and demand exact
agreement with their reference twins:

- connected_components_star ≡ connected_components (label propagation)
  on arbitrary graphs — the star algorithm's fixpoint/digest machinery
  has failure modes (premature convergence, lost singletons, unknown-
  endpoint adoption) that no hand-picked fixture can enumerate.
- salted_join ≡ plain join for every accepted join type under arbitrary
  skew and threshold placement — hot/cold path splitting must never
  change the relational result.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from data_wrangle_openstreetmaps_data_1_spark.partitioning import salted_join

edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=20
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_star_cc_equals_label_prop_on_random_graphs(spark, edges):
    # node set = 0..15 always (so some nodes are singletons); edge list
    # arbitrary, including self-loops and duplicates
    nodes = spark.createDataFrame([(i,) for i in range(16)], "id long")
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    lp = {r["id"]: r["component"] for r in connected_components(nodes, e).collect()}
    star = {r["id"]: r["component"] for r in connected_components_star(nodes, e).collect()}
    assert star == lp


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    left_keys=st.lists(st.integers(0, 5), min_size=1, max_size=40),
    right_keys=st.lists(st.integers(0, 7), min_size=1, max_size=8),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    threshold=st.sampled_from([1, 3, 100]),
)
def test_salted_join_equals_plain_join_property(spark, left_keys, right_keys, how, threshold):
    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k long, payload long"
    )
    right = spark.createDataFrame(
        [(k, f"d{k}") for k in set(right_keys)], "k long, label string"
    )
    plain = left.join(right, ["k"], how)
    salted = salted_join(left, right, ["k"], salt=4, how=how, hot_threshold=threshold)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
