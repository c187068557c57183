"""Blocked fuzzy matching (entity resolution over string keys).

The classic ER recipe at scale: never compare all pairs — generate
candidates by equi-joining on cheap *blocking keys* (here: each token of
the name, multi-pass union), then verify candidates with an edit-distance
predicate. Both Spark and DuckDB ship classic Levenshtein, so the verify
is value-checkable across engines.

100 TB shape: candidates come from equi-joins on token keys (AQE splits a
skewed block); dedup of the multi-pass union happens on the pair key
BEFORE the O(len²) Levenshtein runs, so each surviving candidate pair is
scored exactly once, JVM-side. The distinct-values pre-step collapses
repeated entity strings first — at corpus scale the distinct-name table
is orders of magnitude smaller than the row table (64 vs 2000 even at
sf0.01 for part names) and redistributes the verify cost to unique pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_blocked_pairs(
    df: DataFrame, name_col: str, max_dist: int = 2, n_block_tokens: int = 2
) -> DataFrame:
    """Distinct near-identical value pairs under Levenshtein <= max_dist.

    Blocking: a candidate pair must share a token drawn from the first
    ``n_block_tokens`` whitespace positions of EACH side — joined on the
    token VALUE alone, not its position (review r9: the earlier
    (position, token) join silently required the shared token to sit at
    the SAME index on both sides, so a leading-token insert/delete —
    'a corp' vs 'corp', distance 2 — never became a candidate even though
    it is within max_dist; position-free blocking recovers exactly those
    shifted-token pairs at the cost of a modest candidate increase, and
    single-key blocking is still avoided because EITHER of the first
    ``n_block_tokens`` tokens can anchor the pair).
    Output: (name_a, name_b, dist) with name_a < name_b, dist >= 1.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    keyed = names.select(
        "name", F.explode(F.slice(F.split("name", r"\s+"), 1, n_block_tokens)).alias("key")
    ).where(F.length("key") > 0).distinct()
    a = keyed.select(F.col("name").alias("name_a"), "key")
    b = keyed.select(F.col("name").alias("name_b"), "key")
    cand = (
        a.join(b, ["key"])
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
