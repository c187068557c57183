"""Vocabulary coverage curve — the tokenizer-sizing question: how many
distinct tokens does it take to cover X% of all token occurrences?

The naive plan ranks EVERY distinct token by global count and runs a
cumulative-sum window over that ranking — a single-partition sort over the
whole vocabulary (tens of millions of rows at 100 TB), exactly the
unpartitioned-window shape this repo lints against. The scale trick is the
FREQUENCY-OF-FREQUENCIES histogram: coverage only depends on how many
tokens occur with each count, never on which token is which (all tokens
in one frequency class are interchangeable in the greedy-by-count vocab
order). So:

  token counts  (shuffle on token — the one data-sized exchange)
  -> histogram: (freq, n_tokens, mass = freq * n_tokens)
     (second groupBy on freq; output rows = #distinct frequencies,
      O(sqrt(total_tokens)) by the harmonic bound — a few thousand even
      at 100 TB)
  -> cumulative window + threshold arithmetic on the TINY histogram

The boundary class is resolved exactly in int64: the smallest vocab v
with 10000 * mass(v) >= bp * total needs
``k = ceil((bp * total - 10000 * cum_before) / (10000 * freq))`` tokens
from the first class whose cumulative mass crosses the threshold
(10000 * total <= 1e4 * ~1e14 tokens at 100 TB — inside int64). The
result is deterministic regardless of tie order inside a class, which is
also why the DuckDB oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..partitioning import explode_nonempty, spread


def token_frequency_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(freq, n_tokens, mass): how many distinct tokens occur ``freq``
    times, and the token mass that class carries."""
    tok = explode_nonempty(
        spread(df).select(tokens(F.col(text_col)).alias("toks")), [], "toks", "token"
    ).where(F.length("token") > 0)
    counts = tok.groupBy("token").agg(F.count("*").alias("freq"))
    return (
        counts.groupBy("freq")
        .agg(F.count("*").alias("n_tokens"))
        .withColumn("mass", F.col("freq") * F.col("n_tokens"))
    )


def vocab_coverage(df: DataFrame, text_col: str, coverage_bps: list[int]) -> DataFrame:
    """For each coverage target (basis points of total token occurrences),
    the smallest greedy-by-count vocabulary reaching it.

    Output: (coverage_bp, vocab_size, covered_tokens) — ``covered_tokens``
    is the exact mass the chosen vocabulary covers (>= the target).
    """
    bad = [bp for bp in coverage_bps if not 0 < bp <= 10_000]
    if bad:
        raise ValueError(f"coverage_bps must be in (0, 10000], got {bad}")
    hist = token_frequency_histogram(df, text_col)
    # the histogram is O(sqrt(corpus)) rows: a one-partition window here is
    # the *point* of the design, not an accident (see module docstring)
    w = Window.orderBy(F.col("freq").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "freq",
        "n_tokens",
        F.sum("mass").over(w).alias("cum_mass"),
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    )
    total = cum.agg(F.max("cum_mass").alias("total"))
    curve = (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(
            F.broadcast(
                cum.sparkSession.createDataFrame(
                    [(bp,) for bp in sorted(set(coverage_bps))], "coverage_bp int"
                )
            )
        )
        .withColumn("target", F.col("coverage_bp").cast("long") * F.col("total"))
        .withColumn("cum_before", F.col("cum_mass") - F.col("freq") * F.col("n_tokens"))
        .where(
            (F.lit(10_000) * F.col("cum_mass") >= F.col("target"))
            & (F.lit(10_000) * F.col("cum_before") < F.col("target"))
        )
        .withColumn(
            "k",
            F.expr("(target - 10000 * cum_before + 10000 * freq - 1) div (10000 * freq)"),
        )
        .select(
            "coverage_bp",
            (F.col("cum_tokens") - F.col("n_tokens") + F.col("k")).alias("vocab_size"),
            (F.col("cum_before") + F.col("k") * F.col("freq")).alias("covered_tokens"),
        )
    )
    return curve
