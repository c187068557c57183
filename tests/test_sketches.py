"""Count-min sketch invariants that the top-10 oracle can't pin: the
overcount-only guarantee holds for EVERY item, and sketches merge as an
associative monoid (partition-wise build + sum == whole-corpus build),
which is what makes incremental/day-partitioned maintenance correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
    countmin_build,
    countmin_estimate,
)


def _counts(spark):
    # zipf-ish synthetic counts with adversarial collisions forced by w=16
    items = [(f"tok{i}", (200 // (i + 1)) + 1) for i in range(120)]
    return spark.createDataFrame(items, ["tok", "c"])


def test_estimate_never_undercounts_any_item(spark):
    cnt = _counts(spark)
    sketch = countmin_build(cnt, "tok", "c", d=3, w=16)
    est = countmin_estimate(
        sketch, cnt.select("tok", F.col("c").alias("true_cnt")), "tok", d=3, w=16
    ).toPandas()
    assert len(est) == 120
    assert (est["est_cnt"] >= est["true_cnt"]).all()
    # and with w=16 over 120 items, collisions exist: some estimate overcounts
    assert (est["est_cnt"] > est["true_cnt"]).any()


def test_sketch_merge_is_groupby_sum(spark):
    cnt = _counts(spark)
    whole = countmin_build(cnt, "tok", "c", d=3, w=16)
    half_a = countmin_build(cnt.where(F.col("c") % 2 == 0), "tok", "c", d=3, w=16)
    half_b = countmin_build(cnt.where(F.col("c") % 2 != 0), "tok", "c", d=3, w=16)
    merged = (
        half_a.unionByName(half_b).groupBy("i", "bucket").agg(F.sum("bc").alias("bc"))
    )
    a = whole.toPandas().sort_values(["i", "bucket"], ignore_index=True)
    b = merged.toPandas().sort_values(["i", "bucket"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_bloom_no_false_negatives_and_some_rejections(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
        bloom_build,
        bloom_member,
    )

    members = spark.createDataFrame([(f"in{i}",) for i in range(80)], ["item"])
    others = spark.createDataFrame([(f"out{i}",) for i in range(80)], ["item"])
    bloom = bloom_build(members, "item", k=3, m=512)
    # bloom guarantee: every true member passes
    back = bloom_member(bloom, members, "item", k=3, m=512).toPandas()
    assert len(back) == 80
    # and the filter genuinely rejects (false-positive rate < 100%)
    fp = bloom_member(bloom, others, "item", k=3, m=512).toPandas()
    assert len(fp) < 80
    # schema passthrough: probe columns survive, no helper columns leak
    assert list(back.columns) == ["item"]


def test_bloom_merge_is_union_distinct(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import bloom_build

    items = spark.createDataFrame([(f"t{i}",) for i in range(60)], ["item"])
    whole = bloom_build(items, "item", k=3, m=256)
    merged = (
        bloom_build(items.limit(30), "item", k=3, m=256)
        .unionByName(bloom_build(items.subtract(items.limit(30)), "item", k=3, m=256))
        .distinct()
    )
    assert sorted(r.bit for r in whole.collect()) == sorted(r.bit for r in merged.collect())


def test_hll_estimate_within_error_bound(spark):
    """Raw HLL with m=256 has relative stddev ~1.04/sqrt(256) = 6.5%; a 25%
    band (~4 sigma) on 5000 distinct items is a deterministic check (the
    hash is fixed, so this can only break if the estimator math changes)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    n = 5000
    items = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("item"))
    est = hll_estimate(hll_build(items, "item")).collect()[0]
    assert abs(est.est_distinct - n) / n < 0.25
    assert est.nonempty_buckets <= 256


def test_hll_insensitive_to_duplicates_and_merge(spark):
    """HLL is a max-monoid: duplicated input and partition-wise build +
    groupBy-max both yield the identical sketch (not just a close one)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import hll_build

    items = spark.range(800).select(F.concat(F.lit("k"), F.col("id")).alias("item"))
    whole = hll_build(items, "item")
    doubled = hll_build(items.unionByName(items), "item")
    merged = (
        hll_build(items.where(F.col("item").rlike("[02468]$")), "item")
        .unionByName(hll_build(items.where(F.col("item").rlike("[13579]$")), "item"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    base = sorted((r.bucket, r.rho) for r in whole.collect())
    assert sorted((r.bucket, r.rho) for r in doubled.collect()) == base
    assert sorted((r.bucket, r.rho) for r in merged.collect()) == base


def test_histogram_sketch_merge_is_groupby_sum(spark):
    """The sketch is a sum-monoid: sketching halves and merging with
    groupBy-sum equals sketching the whole."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import histogram_build

    df = spark.range(1000).select((F.col("id") * 7 % 997).cast("double").alias("x"))
    whole = histogram_build(df, "x", lo=0.0, width=64.0, nb=16)
    h1 = histogram_build(df.where("id % 2 = 0"), "x", lo=0.0, width=64.0, nb=16)
    h2 = histogram_build(df.where("id % 2 = 1"), "x", lo=0.0, width=64.0, nb=16)
    merged = h1.unionByName(h2).groupBy("bucket").agg(F.sum("c").alias("c"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_histogram_sketch_clamps_and_conserves_mass(spark):
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import histogram_build

    df = spark.createDataFrame([(-5.0,), (0.0,), (63.9,), (64.0,), (1e9,)], "x double")
    sk = {r["bucket"]: r["c"] for r in histogram_build(df, "x", 0.0, 64.0, nb=4).collect()}
    assert sum(sk.values()) == 5  # nothing lost
    assert sk[0] == 3  # -5 clamps down, 0 and 63.9 in range
    assert sk[3] == 1  # 1e9 clamps to the top bucket
    assert sk[1] == 1  # 64.0 lands in bucket 1


def test_histogram_quantiles_within_one_bucket_of_exact(spark):
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
        histogram_build,
        histogram_quantiles,
    )

    df = spark.range(10000).select((F.col("id") % 4096).cast("double").alias("x"))
    sk = histogram_build(df, "x", lo=0.0, width=256.0, nb=16)
    est = {r["q"]: r["est"] for r in histogram_quantiles(sk, [0.5, 0.9], 0.0, 256.0).collect()}
    exact = df.selectExpr("percentile(x, array(0.5, 0.9)) as p").collect()[0]["p"]
    assert abs(est[0.5] - exact[0]) <= 256.0
    assert abs(est[0.9] - exact[1]) <= 256.0


def test_hll_grouped_merge_is_groupby_max(spark):
    """Per-group HLL stays a max-monoid: sketching halves and merging with
    groupBy-max over (group, bucket) equals sketching the whole."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("u"), (F.col("id") * 13 % 500).cast("string")).alias("item"),
    )
    whole = hll_build_grouped(df, "item", ["g"])
    h1 = hll_build_grouped(df.where("id % 2 = 0"), "item", ["g"])
    h2 = hll_build_grouped(df.where("id % 2 = 1"), "item", ["g"])
    merged = h1.unionByName(h2).groupBy("g", "bucket").agg(F.max("rho").alias("rho"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    # and the grouped estimator lands within ~15% of truth per group
    est = {r["g"]: r["est_distinct"] for r in hll_estimate_grouped(whole, ["g"]).collect()}
    true = {
        r["g"]: r["t"]
        for r in df.groupBy("g").agg(F.count_distinct("item").alias("t")).collect()
    }
    for g in true:
        assert abs(est[g] - true[g]) / true[g] < 0.15, (g, est[g], true[g])


def test_adaptive_quantiles_unbounded_domain(spark):
    """Range discovered, not assumed: negative values land correctly, and a
    degenerate (constant) column yields the constant at every quantile."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
        histogram_quantiles_adaptive,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(-500, 501)], "value double"
    )
    got = {
        r["q"]: r["est"]
        for r in histogram_quantiles_adaptive(df, "value", [0.5, 0.95]).collect()
    }
    # uniform on [-500, 500]: median ~0, p95 ~450; bucket width ~3.9
    assert abs(got[0.5]) < 4.0 and abs(got[0.95] - 450.0) < 4.0

    # degenerate (constant) column: width falls back to 1.0 and the
    # documented error bound (<= one bucket width) is the guarantee —
    # est = lo + q·width, within 1.0 of the true constant
    const = spark.createDataFrame([(7.5,)] * 100, "value double")
    got_c = {
        r["q"]: r["est"]
        for r in histogram_quantiles_adaptive(const, "value", [0.25, 0.9]).collect()
    }
    assert all(7.5 <= v <= 8.5 for v in got_c.values())

    with_nulls = spark.createDataFrame(
        [(None,), (1.0,), (2.0,), (3.0,), (None,)], "value double"
    )
    got_n = {
        r["q"]: r["est"]
        for r in histogram_quantiles_adaptive(with_nulls, "value", [0.5]).collect()
    }
    assert abs(got_n[0.5] - 2.0) < 0.02  # nulls excluded: median of {1,2,3}


def test_histogram_null_and_q_validation(spark):
    """Review-r9 fixes: NULL metric rows are excluded (previously clamped
    into bucket 0, dragging every quantile low) and q outside (0, 1] is
    rejected loudly (q=0 previously vanished silently from the output)."""
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.operators.sketches import (
        histogram_build,
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [(None,)] * 50 + [(float(v),) for v in range(100)], "value double"
    )
    sketch = histogram_build(df, "value", lo=0.0, width=1.0, nb=128)
    # 100 non-null rows only: bucket 0 holds exactly one value
    assert {r["bucket"]: r["c"] for r in sketch.collect()}[0] == 1
    med = {r["q"]: r["est"] for r in histogram_quantiles(sketch, [0.5], 0.0, 1.0).collect()}
    assert abs(med[0.5] - 50.0) < 1.01  # nulls no longer drag the median low
    with pytest.raises(ValueError, match="quantiles must be in"):
        histogram_quantiles(sketch, [0.0, 0.5], 0.0, 1.0)


def test_simhash_rejects_unbanded_bits(spark):
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of n_bands"):
        simhash_pairs(df, "doc_id", "text", bits=30)
