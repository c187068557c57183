"""recall_at_k (operators/similarity.py) edge semantics: a query the ANN
missed ENTIRELY must still get a (hits=0, recall=0.0) row — silent omission
is the failure mode the metric exists to catch — and hits are counted per
query, not globally. The full value parity (against brute-force ground
truth on the embeddings table) is pinned by the sim_recall_at_k oracle."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from data_wrangle_openstreetmaps_data_1_spark.operators.similarity import recall_at_k


def test_recall_at_k_zero_fills_missed_queries(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, neighbor_id long"
    )
    # query 1: one of two hit; query 2: absent from the ANN output entirely
    approx = spark.createDataFrame(
        [(1, 10), (1, 99)], "query_id long, neighbor_id long"
    )
    rows = {r["query_id"]: r for r in recall_at_k(exact, approx, k=2).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["hits"] == 1 and rows[1]["recall_at_k"] == 0.5
    assert rows[2]["hits"] == 0 and rows[2]["recall_at_k"] == 0.0


def test_recall_at_k_extra_approx_rows_never_inflate(spark):
    # approx rows outside the exact top-k contribute nothing, and recall
    # caps at 1.0 when the ANN returns the exact set
    exact = spark.createDataFrame([(1, 10), (1, 11)], "query_id long, neighbor_id long")
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 13)], "query_id long, neighbor_id long"
    )
    [r] = recall_at_k(exact, approx, k=2).collect()
    assert r["hits"] == 2 and r["recall_at_k"] == 1.0
