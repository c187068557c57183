"""Leakage-safe splitting (operators/splits.py): determinism,
exhaustiveness, the no-straddle guarantee, and input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.splits import (
    group_aware_split,
    leakage_audit,
    split_column,
    split_summary,
)

SPLITS = [("train", 9000), ("val", 500), ("test", 500)]


def _docs(spark, n=400):
    # 4 docs per group -> 100 groups, so a naive split straddles some
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100).cast("string").alias("g")
    )


def test_every_row_assigned_and_groups_never_straddle(spark):
    out = group_aware_split(_docs(spark), "g", SPLITS)
    assert out.where(F.col("split").isNull()).count() == 0
    assert (
        out.groupBy("g").agg(F.countDistinct("split").alias("k")).where("k > 1").count()
        == 0
    )
    # all three splits are populated at 100 groups
    assert {r["split"] for r in out.select("split").distinct().collect()} == {
        "train",
        "val",
        "test",
    }


def test_assignment_is_partitioning_and_rerun_stable(spark):
    base = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in group_aware_split(base, "g", SPLITS).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in group_aware_split(base.repartition(17, "doc_id"), "g", SPLITS).collect()
    }
    assert a == b


def test_summary_counts_docs_and_groups(spark):
    rows = {
        r["split"]: (r["n_docs"], r["n_groups"])
        for r in split_summary(_docs(spark), "doc_id", "g", SPLITS).collect()
    }
    assert sum(v[0] for v in rows.values()) == 400
    assert sum(v[1] for v in rows.values()) == 100
    # 4 docs per group, a group lands whole: n_docs = 4 * n_groups per split
    assert all(nd == 4 * ng for nd, ng in rows.values())


def test_leakage_audit_group_aware_is_zero_naive_is_not(spark):
    rows = {r["strategy"]: r.asDict() for r in leakage_audit(_docs(spark), "doc_id", "g", SPLITS).collect()}
    assert rows["group_aware"]["straddling_pairs"] == 0
    assert rows["group_aware"]["groups_straddling"] == 0
    # 100 groups of 4: C(4,2) * 100 pairs on both strategies
    assert rows["naive_by_doc"]["dup_pairs"] == 600
    assert rows["group_aware"]["dup_pairs"] == 600
    # a 90/5/5 doc-hash split leaves a 4-doc group intact with prob
    # ~0.9^4 + ... ~= 0.66 -> expect dozens of straddling groups; assert
    # the qualitative fact the audit exists to demonstrate
    assert rows["naive_by_doc"]["straddling_pairs"] > 0
    assert rows["naive_by_doc"]["groups_straddling"] > 0


def test_different_salts_draw_different_splits(spark):
    base = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in base.select("doc_id", split_column(F.col("g"), SPLITS, "s-a").alias("split")).collect()}
    b = {r["doc_id"]: r["split"] for r in base.select("doc_id", split_column(F.col("g"), SPLITS, "s-b").alias("split")).collect()}
    assert a != b


def test_split_validation():
    with pytest.raises(ValueError, match="sum to 10000"):
        split_column(F.col("g"), [("train", 9000), ("test", 500)])
    with pytest.raises(ValueError, match="positive"):
        split_column(F.col("g"), [("train", 10500), ("test", -500)])
    with pytest.raises(ValueError, match="duplicate split names"):
        split_column(F.col("g"), [("train", 9000), ("train", 1000)])
    with pytest.raises(ValueError, match="non-empty"):
        split_column(F.col("g"), [])
