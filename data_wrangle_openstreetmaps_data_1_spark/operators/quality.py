"""Composable per-document quality gates (Gopher/C4-style filtering).

``tx_quality`` scores documents; this module *gates* them — the form a
production pretraining filter actually takes: a conjunction of named
boolean rules, each cheap and auditable, with the per-rule verdicts kept
in the output so rejection reasons can be aggregated downstream (the
"how much did each rule cost us" report every data-curation loop needs).

Rules here are the subset of Gopher's (Rae et al. 2021, public) that are
meaningful on the synthetic corpus: token-count bounds, mean-token-length
bounds, stopword presence, and modal-token repetition. All arithmetic is
integer fixed-point (no libm, no float rounding), so gate verdicts hash
identically in the DuckDB oracle.

100 TB shape: one explode + two groupBys per doc (term counts, then doc
rollup) with map-side partials; the doc-level gates join on doc_id — one
shuffle each, all skinny rows. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Stopword markers for the gate (word-soup corpus: articles/particles the
# generator actually emits). A real English run would use a larger list;
# the gate SHAPE is what matters and is corpus-independent.
GATE_STOPWORDS = ["the", "a", "of", "to", "is"]

# Gate thresholds (integer fixed-point, scale 10 for mean token length).
MIN_TOKENS = 30
MAX_TOKENS = 5000
MIN_MEAN_LEN_X10 = 30  # mean token length >= 3.0 chars
MAX_MEAN_LEN_X10 = 80  # mean token length <= 8.0 chars
MAX_MODAL_PCT = 20  # most frequent token <= 20% of all tokens


def quality_gates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document gate verdicts: (doc_id, n_tokens, g_len, g_wordlen,
    g_stop, g_rep, passed).

    - g_len:     MIN_TOKENS <= n_tokens <= MAX_TOKENS
    - g_wordlen: mean token length in [3.0, 8.0] (integer x10 fixed-point)
    - g_stop:    at least one GATE_STOPWORDS token present
    - g_rep:     modal token frequency <= 20% (Gopher-style repetition gate)
    - passed:    conjunction of all gates
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    per_term = tok.groupBy("doc_id", "term").agg(
        F.count("*").alias("cnt"), F.sum(F.length("term")).alias("chars")
    )
    per_doc = per_term.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum("chars").alias("n_chars"),
        F.max("cnt").alias("modal_cnt"),
        F.max(F.when(F.col("term").isin(GATE_STOPWORDS), 1).otherwise(0)).alias("has_stop"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS).alias("g_len"),
        F.expr("n_chars * 10 div n_tokens").between(MIN_MEAN_LEN_X10, MAX_MEAN_LEN_X10).alias(
            "g_wordlen"
        ),
        (F.col("has_stop") == 1).alias("g_stop"),
        (F.col("modal_cnt") * 100 <= F.col("n_tokens") * MAX_MODAL_PCT).alias("g_rep"),
    ).withColumn(
        "passed", F.col("g_len") & F.col("g_wordlen") & F.col("g_stop") & F.col("g_rep")
    )
