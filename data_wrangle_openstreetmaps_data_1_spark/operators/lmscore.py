"""Corpus-statistics language-model scoring (the KenLM-filter stand-in).

Production pretraining filters score every document with an n-gram LM and
drop the worst-predicted tail (CCNet's KenLM perplexity step). A real LM
needs log-space float arithmetic; this operator computes the integer-exact
core of the same signal — the mean bigram continuation probability of a
document under the corpus's own bigram statistics:

    score_fp(doc) = mean over bigram occurrences (w1, w2) of
                    c(w1, w2) * 1e6 div c(w1 as prefix)

Higher = the document's word transitions are better predicted by the
corpus (fluent/common text); near-zero = unpredictable transitions (noise,
mangled text, wrong language). Monotone in the geometric-mean probability
a real bigram LM would assign, minus the log — which is what keeps every
value bit-identical between Spark and the DuckDB oracle.

100 TB shape: ONE pass builds per-occurrence bigram rows (posexplode of
the token array — narrow); bigram and prefix counts are groupBys over
16-byte md5 keys with map-side partials (never shuffling raw text); the
score is two equi-joins of those count tables back onto the occurrence
rows + one per-doc aggregate. The count tables are the corpus's bigram
vocabulary — the small side at scale, broadcastable or bucketable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

SCALE = 1_000_000


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, bg_h, un_h): one row per bigram OCCURRENCE, keyed by md5 of
    the bigram and of its prefix unigram (hash early: every downstream
    shuffle moves 16-byte keys, not text)."""
    toked = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")).where(
        F.size("toks") >= 2
    )
    pairs = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) as w1, element_at(toks, i + 1) as w2))"
            )
        ).alias("bg"),
    )
    return pairs.select(
        "doc_id",
        F.md5(F.concat(F.col("bg.w1"), F.lit(" "), F.col("bg.w2"))).alias("bg_h"),
        F.md5(F.col("bg.w1")).alias("un_h"),
    )


def lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram continuation probability, fixed-point 1e6.

    Output: (doc_id, n_bigrams, lm_score_fp). Documents with fewer than
    two tokens emit nothing (no bigrams, score undefined).
    """
    # eager_cache (r18): ex feeds three consumers on three shuffle keys
    # (bg_h, un_h, and the score joins) under ONE action, so a lazy
    # persist let the concurrent AQE stages each recompute the explode+md5
    # stage (see partitioning.eager_cache). Same lifecycle contract as
    # operators/dedup.py: callers running many operators in one session
    # clearCache() between them; checkpoint blocks release on GC.
    from ..partitioning import eager_cache

    ex = eager_cache(_bigram_rows(df, id_col, text_col))
    bgc = ex.groupBy("bg_h").agg(F.count("*").alias("c_bg"))
    unc = ex.groupBy("un_h").agg(F.count("*").alias("c_un"))
    scored = (
        ex.join(bgc, "bg_h")
        .join(unc, "un_h")
        .select("doc_id", F.expr(f"c_bg * {SCALE} div c_un").alias("p_fp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.expr("sum(p_fp) div count(*)").alias("lm_score_fp"),
    )
