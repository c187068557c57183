"""Count-min sketch over a distributed corpus — the streaming/mergeable
frequency summary a training pipeline uses when the exact term table is too
big to keep (heavy-hitter tracking, frequency-capped dedup, mixture
telemetry).

Built entirely from the portable md5 hash family (functions/hashing.py), so
the sketch is BIT-IDENTICAL across engines and the registered query is
fully value-checked by the DuckDB oracle — unlike approx_count_distinct /
approx_percentile whose sketches are engine-private.

Scale design: the sketch table is O(d x w) rows no matter the corpus size;
building it is one groupBy over hashed items, and merging per-partition or
per-day sketches is the SAME groupBy-sum (count-min is an associative
monoid), so incremental maintenance costs one small shuffle. Point queries
join a broadcast of the (tiny) sketch. Estimates overcount only:
est >= true always, with err <= 2N/w at probability 1 - (1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _bucket(item_col, i_col, w: int, salt: str):
    """Shared hash-bucket expression for count-min and bloom (review r9:
    this was previously dead code while four call sites inlined the same
    expression — a salt-layout change had to be edited in four places).
    Salt layout shared verbatim with the oracle SQL:
    ``item || ':<salt>' || i``."""
    return F.pmod(
        portable_hash64(F.concat(item_col, F.lit(f":{salt}"), i_col.cast("string"))),
        F.lit(w),
    )


def countmin_build(
    counts: DataFrame, item_col: str, count_col: str, d: int = 4, w: int = 64, salt: str = "cm"
) -> DataFrame:
    """(sketch_row, bucket, bc) from an exact (item, count) table.

    Each item lands in one bucket per sketch row; bucket counts sum item
    counts. d x w rows out, regardless of input size.
    """
    rows = counts.select(
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
        F.col(item_col).alias("item"),
        F.col(count_col).alias("c"),
    )
    bucketed = rows.withColumn("bucket", _bucket(F.col("item"), F.col("i"), w, salt))
    return bucketed.groupBy("i", "bucket").agg(F.sum("c").alias("bc"))


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, d: int = 4, w: int = 64, salt: str = "cm"
) -> DataFrame:
    """Point-query the sketch: est(item) = min over rows of that row's
    bucket count. ``sketch`` is broadcast (d x w rows); probes never
    shuffle.

    LEFT join + coalesce(0): a bucket no build item ever hashed to is
    absent from the sketch relation, and an absent bucket means count 0 —
    an inner join would silently drop that row and overestimate (or lose
    the probe entirely when all d buckets are empty)."""
    expanded = probes.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i")
    ).withColumn("bucket", _bucket(F.col(item_col), F.col("i"), w, salt))
    joined = expanded.join(F.broadcast(sketch), ["i", "bucket"], "left")
    group_cols = [c for c in probes.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("bc"), F.lit(0))).alias("est_cnt")
    )


def bloom_build(items: DataFrame, item_col: str, k: int = 3, m: int = 1024, salt: str = "bl") -> DataFrame:
    """Bloom filter as a relation of set bit positions (<= m rows after
    distinct): the "seen before" membership summary behind incremental
    dedup and contamination screens.

    Portable-hash bits make the filter bit-identical across engines, so a
    query over it is value-checkable (engine-private bloom builders are
    not). Like the count-min table, merging two filters is trivial
    relational algebra — UNION DISTINCT of bit sets. At production scale
    (m in the billions) the same positions would aggregate into packed
    bitmap chunks (bucket = bit div 64, word = bit_or of 1 << (bit % 64));
    the unpacked relation keeps the oracle twin exact here.
    """
    rows = items.select(
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
        F.col(item_col).alias("item"),
    )
    return rows.select(
        _bucket(F.col("item"), F.col("i"), m, salt).alias("bit")
    ).distinct()


# HyperLogLog: m = 2^HLL_P buckets; rho drawn from HLL_RHO_BITS hash bits.
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_RHO_BITS = 44
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # standard bias constant, m >= 128


def hll_build(items: DataFrame, item_col: str, salt: str = "hll") -> DataFrame:
    """HyperLogLog sketch as a relation of (bucket, rho) — at most m=256
    rows regardless of corpus size.

    Built on the portable md5 hash family so the sketch is bit-identical
    across engines (``approx_count_distinct``'s HLL++ sketch is
    engine-private and unverifiable). The geometric statistic is
    trailing-zeros+1 of the 44 hash bits above the bucket index — same
    distribution as the classic leading-zeros rank, but computable with
    pure integer ops both engines share: ``length(bin(rem & -rem))``
    isolates the lowest set bit and reads its position off the binary
    string, no float log anywhere.

    Merging sketches (per-partition, per-day, cross-corpus) is the same
    groupBy-max — HLL is a max-monoid, which is the whole point at 100 TB:
    one tiny mergeable summary instead of a global distinct shuffle.
    """
    h = portable_hash64(F.concat(F.col(item_col), F.lit(f":{salt}")))
    mask = (1 << HLL_RHO_BITS) - 1
    b = items.select(
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.shiftright(h, HLL_P).bitwiseAND(F.lit(mask)).alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(HLL_RHO_BITS + 1)).otherwise(
        F.length(F.bin(F.col("rem").bitwiseAND(-F.col("rem"))))
    )
    return b.select("bucket", rho.alias("rho")).groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """One-row (est_distinct, nonempty_buckets) from an ``hll_build`` sketch.

    Raw HLL estimator alpha*m^2 / sum(2^-rho), no small-range correction —
    the linear-counting branch needs ``ln``, whose last-ulp behavior is not
    guaranteed identical across engines, while this form is: every 2^-rho
    term is an exact dyadic (span < 53 bits, so the double sum is exact and
    order-independent), and the final multiply/divide is a single IEEE
    operation on both sides. Estimate floors to BIGINT.
    """
    s = sketch.agg(
        F.count("*").alias("nb"),
        F.sum(F.expr("cast(1 as double) / shiftleft(cast(1 as bigint), rho)")).alias("s_ne"),
    )
    est = F.floor(
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        / ((F.lit(HLL_M) - F.col("nb")).cast("double") + F.col("s_ne"))
    ).cast("long")
    return s.select(est.alias("est_distinct"), F.col("nb").alias("nonempty_buckets"))


def bloom_member(
    bloom: DataFrame, probes: DataFrame, item_col: str, k: int = 3, m: int = 1024, salt: str = "bl"
) -> DataFrame:
    """Rows of ``probes`` whose item has ALL k bits set (definite-or-false-
    positive membership; definite negatives are filtered out — the bloom
    guarantee). The filter is broadcast; probes never shuffle for the
    membership test itself.

    LEFT join + a presence flag, folded with min(): "all k bits set" must
    hold per distinct probe key regardless of row multiplicity — the old
    inner-join ``count(*) == k`` form miscounted duplicate probe rows
    (2 duplicates -> 2k joined rows -> filtered out despite membership).

    NOTE: the groupBy is over ALL probe columns, so duplicate probe rows
    collapse to one output row — membership is a property of the probe
    VALUE, not the row. Callers that need row multiplicity preserved must
    carry their own row id (e.g. ``monotonically_increasing_id`` before
    calling); every registered caller probes distinct keys."""
    expanded = probes.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i")
    ).withColumn("bit", _bucket(F.col(item_col), F.col("i"), m, salt))
    marked = F.broadcast(bloom.withColumn("_bit_set", F.lit(1)))
    joined = expanded.join(marked, "bit", "left")
    group_cols = list(probes.columns)
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("_bit_set"), F.lit(0))).alias("_all_set"))
        .where(F.col("_all_set") == 1)
        .drop("_all_set")
    )


# --------------------------------------------------------------------------
# Histogram-quantile sketch: one-pass mergeable quantiles
# --------------------------------------------------------------------------

def histogram_build(
    items: DataFrame, value_col: str, lo: float, width: float, nb: int
) -> DataFrame:
    """Fixed-width histogram sketch: (bucket, c) with at most ``nb`` rows
    regardless of input size — the one-pass distributed quantile summary
    (approx_percentile's t-digest is engine-private and unverifiable; the
    equi-width histogram is exactly reproducible in any engine).

    Mergeable monoid like count-min/HLL: per-partition / per-day sketches
    combine with the same groupBy-sum, so incremental maintenance at
    100 TB is one tiny shuffle. Out-of-range values clamp to the edge
    buckets, so non-null mass is never lost (NULL metric rows are excluded
    — see the inline note). Use a power-of-two ``width`` so the
    bucket arithmetic is float-exact across engines.
    """
    b = F.least(
        F.lit(nb - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    # NULL metric rows are EXCLUDED, not clamped: Spark's greatest() skips
    # nulls, so without this filter floor(NULL) -> greatest(0, NULL) = 0
    # and every null row silently inflated bucket 0, dragging all
    # quantiles low (review r9). A null metric has no quantile.
    return (
        items.where(F.col(value_col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def histogram_quantiles(
    sketch: DataFrame, qs: list[float], lo: float, width: float
) -> DataFrame:
    """Quantile estimates by linear interpolation inside the crossing
    bucket: est(q) = lo + width * (bucket + (q*N - cum_before) / c).

    All work happens on the <= nb-row sketch (broadcast-sized); the
    original data is never touched again. Error bound: one bucket width.

    ``qs`` must lie in (0, 1]: q = 0 has no crossing bucket (the condition
    ``cum_before < q·N`` is unsatisfiable at 0) and previously vanished
    SILENTLY from the output, misaligning any caller zipping qs against
    rows (review r9) — now rejected loudly; q = 1 hits the last bucket.
    """
    bad = [q for q in qs if not (0.0 < q <= 1.0)]
    if bad:
        raise ValueError(
            f"quantiles must be in (0, 1], got {bad}: q=0 has no crossing "
            "bucket (use lo, the discovered minimum, directly)"
        )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.orderBy(F.lit(1))).alias("n"),
    )
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame([(q,) for q in qs], "q double").limit(len(qs))
        )
    )
    hit = qdf.where(
        (F.col("cum") >= F.col("q") * F.col("n"))
        & ((F.col("cum") - F.col("c")) < F.col("q") * F.col("n"))
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bucket") + (F.col("q") * F.col("n") - (F.col("cum") - F.col("c"))) / F.col("c")
    )
    return hit.select("q", F.round(est, 2).alias("est")).orderBy("q")


def histogram_quantiles_adaptive(
    items: DataFrame, value_col: str, qs: list[float], nb: int = 256
) -> DataFrame:
    """Unbounded-domain quantiles: two passes, no prior range knowledge.

    ``histogram_build`` needs (lo, width) up front — fine for domains with
    a schema-known range, wrong for arbitrary metrics. Pass 1 computes
    min/max (ONE scalar driver row — the bounded-collect precedent of
    clustering.py); pass 2 runs the same fixed-width sketch with
    lo = min, width = (max − min)/nb. Error bound: one bucket width =
    (max − min)/nb — rank-exact at the bucket level like the fixed-range
    form, with the range discovered instead of assumed. Still a mergeable
    sum-monoid GIVEN the range: re-using pass 1's (lo, width) across
    per-day/per-partition sketches keeps them combinable; a fresh range
    discovery re-buckets.

    Cross-engine exactness: lo/width are IEEE doubles from min/max (both
    engines compute the identical values), and the interpolation mirrors
    ``histogram_quantiles``'s expression order, so the DuckDB twin is
    bit-reproducible. NULLs are filtered before both passes (Spark sorts
    NULL buckets first, DuckDB last — excluding them is the only portable
    choice, and a NULL metric has no quantile anyway).
    """
    vals = items.where(F.col(value_col).isNotNull())
    row = vals.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]  # ONE row: two scalars
    lo = float(row["lo"]) if row["lo"] is not None else 0.0
    hi = float(row["hi"]) if row["hi"] is not None else 0.0
    width = (hi - lo) / nb if hi > lo else 1.0
    sketch = histogram_build(vals, value_col, lo=lo, width=width, nb=nb)
    return histogram_quantiles(sketch, qs, lo=lo, width=width)


def hll_build_grouped(
    items: DataFrame, item_col: str, group_cols: list[str], salt: str = "hll"
) -> DataFrame:
    """Per-group HLL sketches in ONE pass: (group..., bucket, rho), at most
    m=256 rows per group whatever the group's cardinality.

    This is the form a 100 TB pipeline actually runs — distinct users per
    day/source/shard — where exact count(distinct) per group would shuffle
    every raw pair. Still a max-monoid per group: merging per-partition or
    per-day grouped sketches is the same groupBy-max over (group, bucket).
    """
    h = portable_hash64(F.concat(F.col(item_col), F.lit(f":{salt}")))
    mask = (1 << HLL_RHO_BITS) - 1
    b = items.select(
        *group_cols,
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.shiftright(h, HLL_P).bitwiseAND(F.lit(mask)).alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(HLL_RHO_BITS + 1)).otherwise(
        F.length(F.bin(F.col("rem").bitwiseAND(-F.col("rem"))))
    )
    return (
        b.select(*group_cols, "bucket", rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_grouped(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., est_distinct, nonempty_buckets) per group from a grouped
    sketch — same exact-dyadic estimator as hll_estimate (see its note)."""
    s = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("nb"),
        F.sum(F.expr("cast(1 as double) / shiftleft(cast(1 as bigint), rho)")).alias("s_ne"),
    )
    est = F.floor(
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        / ((F.lit(HLL_M) - F.col("nb")).cast("double") + F.col("s_ne"))
    ).cast("long")
    return s.select(*group_cols, est.alias("est_distinct"), F.col("nb").alias("nonempty_buckets"))


def hll_sketch_sql(tok_cte: str, tag: str, salt: str = "hll") -> str:
    """DuckDB CTE text for the (bucket, rho) sketch of ``tok_cte``'s ``tok``
    column — the SQL twin of :func:`hll_build`, generated from the same
    constants. ONE source for the bucket/rho arithmetic: every oracle that
    sketches (sk_hll, sk_hll_intersect, streaming st_hll) composes these
    fragments instead of re-stating the estimator by hand."""
    mask = (1 << HLL_RHO_BITS) - 1
    return f"""r_{tag} AS (
      SELECT h % {HLL_M} AS bucket,
             max(CASE WHEN rem = 0 THEN {HLL_RHO_BITS + 1}
                      ELSE length(bin(rem & -rem)) END) AS rho
      FROM (SELECT h, (h >> {HLL_P}) & {mask} AS rem
            FROM (SELECT ('0x' || substr(md5(tok || ':{salt}'), 1, 15))::BIGINT AS h
                  FROM {tok_cte}))
      GROUP BY 1)"""


def hll_estimate_sql(sketch_cte: str) -> str:
    """DuckDB scalar-subquery text for the raw estimate over a (bucket,
    rho) sketch CTE — the SQL twin of :func:`hll_estimate`'s arithmetic,
    with the alpha*m^2 double literal folded identically."""
    alpha_m2 = HLL_ALPHA * HLL_M * HLL_M
    return f"""(SELECT CAST(floor(CAST('{alpha_m2!r}' AS DOUBLE)
                    / (CAST({HLL_M} - count(*) AS DOUBLE)
                       + sum(CAST(1 AS DOUBLE) / (1::BIGINT << rho))))
             AS BIGINT) FROM {sketch_cte})"""
