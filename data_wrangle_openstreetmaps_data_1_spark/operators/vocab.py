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


# --------------------------------------------------------------------------
# batch-vs-corpus vocabulary drift (ingestion distribution-shift monitor)
# --------------------------------------------------------------------------

# warn thresholds (fixed-point): >10% of batch token mass out-of-vocabulary,
# batch mean doc length outside [0.8x, 1.25x] of the base, or total L1
# distance between the relative term-frequency vectors above 0.6 (per-million
# units; L1 of two distributions is in [0, 2e6] fp)
OOV_WARN_FP = 100_000
DL_RATIO_LO_FP = 800
DL_RATIO_HI_FP = 1250
L1_WARN_FP = 600_000


def vocab_drift_report(base: DataFrame, batch: DataFrame, text_col: str) -> DataFrame:
    """Distribution-shift gauge for an incoming document batch against the
    corpus it is about to join: new-term count, out-of-vocabulary token
    mass, mean-doc-length ratio, and the L1 distance between the two
    relative term-frequency vectors — the text-side analog of
    ``ivf_index.ivf_pq_drift_report``, with one honest difference stated
    up front: BM25 carries NO trained state (df/stats are maintained
    exactly by adds), so nothing here gates index correctness. This is
    INGESTION monitoring — the check a pretraining pipeline runs to catch
    a crawler/domain mix shift before the batch lands in the corpus.

    All metrics are integer fixed-point (per-mille / per-million), so the
    report hashes identically in the DuckDB oracle:

    - ``new_terms`` — distinct batch terms absent from the base vocabulary
    - ``oov_rate_fp`` — batch token occurrences of those terms, per million
      batch tokens
    - ``dl_ratio_fp`` — batch avg doc length vs base, per mille
    - ``l1_fp`` — sum over the vocabulary union of |base relative freq −
      batch relative freq|, per million (total variation x 2)
    - ``drift_flag`` — any threshold tripped (module constants above)

    Shape at 100 TB: both sides tokenize once; term counts partial-
    aggregate map-side; the single data-sized exchange is the term-keyed
    full-outer join of the two count tables (O(vocabulary), not
    O(corpus)); everything after is a one-row global aggregate.
    """
    from ..functions.text import tokens
    from ..partitioning import explode_nonempty, spread

    def _counts(df: DataFrame) -> tuple[DataFrame, DataFrame]:
        toked = spread(df).select(tokens(F.col(text_col)).alias("toks"))
        lens = toked.select(F.size("toks").alias("dl")).where(F.col("dl") >= 1)
        docstats = lens.agg(
            F.count("*").alias("n_docs"),
            F.expr("sum(dl) * 1000 div count(*)").alias("avgdl_fp"),
        )
        cnt = (
            explode_nonempty(toked, [], "toks", "term")
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        return docstats, cnt

    base_stats, base_cnt = _counts(base)
    batch_stats, batch_cnt = _counts(batch)
    base_tot = base_cnt.agg(F.sum("cnt").cast("long").alias("tot_base"))
    batch_tot = batch_cnt.agg(F.sum("cnt").cast("long").alias("tot_batch"))
    joined = (
        base_cnt.withColumnRenamed("cnt", "cnt_base")
        .join(
            batch_cnt.withColumnRenamed("cnt", "cnt_batch"),
            "term",
            "full_outer",
        )
        .crossJoin(F.broadcast(base_tot))
        .crossJoin(F.broadcast(batch_tot))
    )
    per_term = joined.select(
        "cnt_base",
        "cnt_batch",
        F.expr(
            "abs(coalesce(cnt_base, 0L) * 1000000 div tot_base "
            "- coalesce(cnt_batch, 0L) * 1000000 div tot_batch)"
        ).alias("l1_term_fp"),
    )
    agg = per_term.agg(
        F.count(F.when(F.col("cnt_base").isNotNull(), 1)).cast("long").alias("base_terms"),
        F.count(F.when(F.col("cnt_batch").isNotNull(), 1)).cast("long").alias("batch_terms"),
        F.count(
            F.when(F.col("cnt_base").isNull() & F.col("cnt_batch").isNotNull(), 1)
        ).cast("long").alias("new_terms"),
        F.sum(F.when(F.col("cnt_base").isNull(), F.col("cnt_batch")).otherwise(F.lit(0)))
        .cast("long")
        .alias("oov_mass"),
        F.sum("l1_term_fp").cast("long").alias("l1_fp"),
    )
    return (
        agg.crossJoin(F.broadcast(batch_tot))
        .crossJoin(
            F.broadcast(
                base_stats.select(
                    F.col("n_docs").alias("base_docs"),
                    F.col("avgdl_fp").alias("base_avgdl_fp"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                batch_stats.select(
                    F.col("n_docs").alias("batch_docs"),
                    F.col("avgdl_fp").alias("batch_avgdl_fp"),
                )
            )
        )
        .withColumn("oov_rate_fp", F.expr("oov_mass * 1000000 div tot_batch"))
        .withColumn("dl_ratio_fp", F.expr("batch_avgdl_fp * 1000 div base_avgdl_fp"))
        .withColumn(
            "drift_flag",
            F.expr(
                f"oov_rate_fp > {OOV_WARN_FP} "
                f"or dl_ratio_fp < {DL_RATIO_LO_FP} or dl_ratio_fp > {DL_RATIO_HI_FP} "
                f"or l1_fp > {L1_WARN_FP}"
            ),
        )
        .select(
            "base_docs", "batch_docs", "base_terms", "batch_terms", "new_terms",
            "oov_rate_fp", "dl_ratio_fp", "l1_fp", "drift_flag",
        )
    )
