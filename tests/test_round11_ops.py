"""Round-11 additions: guard paths from the round-10 advice items and the
unicode-whitespace tokenization invariant for heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens as _tokens


def test_scd2_duplicate_key_batch_raises(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, 100, 0, None, True)],
        "key long, bal long, valid_from long, valid_to long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, 150), (1, 175)], "key long, bal long"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        scd2_apply(dim, changes, "key", ["bal"], batch_id=1)


def test_adc_topk_nonfinite_lut_raises(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.pq import adc_topk

    enc = spark.createDataFrame([(1, 0, 0)], "vec_id long, code0 int, code1 int")
    # a NaN codebook entry poisons the LUT: must fail loudly at build time,
    # not as a cryptic SQL parser error
    cb = [[[float("nan"), 0.0]], [[0.0, 0.0]]]
    with pytest.raises(ValueError, match="non-finite"):
        adc_topk(enc, "vec_id", [(99, [1.0, 1.0, 1.0, 1.0])], cb, dsub=2, k=1)


def test_heavy_hitters_unicode_whitespace_matches_spark_tokens(spark):
    """A token glued to U+00A0 (no-break space): Java \\s does NOT split it,
    and after the re.ASCII fix neither does pass 1 — so the candidate
    superset guarantee holds and the exact recount agrees with a census
    using the Spark-side tokenizer."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.heavy import heavy_hitters

    rows = [("alpha\u00a0alpha bulk",)] * 30 + [("filler one off",)] * 5
    d = spark.createDataFrame(rows, "text string")
    toks = d.select(F.explode(_tokens(F.col("text"))).alias("t")).where(
        F.length("t") > 0
    )
    n = toks.count()
    k = 4
    want = {
        (r["t"], r["c"])
        for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
        if r["c"] * k > n
    }
    # the glued "alpha\u00a0alpha" IS a heavy hitter under Spark tokenization;
    # pre-fix pass 1 split it on U+00A0 and never emitted it as a candidate
    assert any("\u00a0" in t for t, _ in want)
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(d, "text", k).collect()}
    assert got == want
