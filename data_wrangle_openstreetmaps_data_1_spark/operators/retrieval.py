"""Lexical retrieval over the document corpus: inverted postings + BM25.

The reference engine's query surface is lookup/aggregation only; a
training-data pipeline additionally needs *retrieval* — "which documents
match these terms, ranked" — both as a data-curation tool (targeted
subcorpus extraction) and as the lexical half of hybrid (BM25 + vector)
search next to operators/similarity.py.

All scoring is fixed-point integer arithmetic (scale 1000) so the scores
hash bit-identically in the DuckDB oracle: idf uses a monotone rational
surrogate instead of ln() (libm results are not contractually identical
across engines), and every division is integral ``div`` on positive
operands (Spark truncates, DuckDB floors — identical for non-negatives,
and every operand here is non-negative by construction).

100 TB shape: the postings build is one explode + one (term, doc) groupBy
with map-side partial aggregation — the shuffle carries (term, doc_id,
count) rows, never text. df/avgdl are tiny aggregates broadcast onto the
postings; top-k per term is a window over per-term partitions (a handful
of query terms ⇒ a handful of partitions, each reduced map-side by the
rank filter at 100 TB via TakeOrdered-style partial sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import topk_per_key

from ..functions.text import tokens

# BM25 constants, pre-scaled by 1000 (k1 = 1.2, b = 0.75).
K1_FP = 1200
B_FP = 750


def inverted_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf) postings from whitespace-tokenized lowercased text.

    One explode + one groupBy; partial aggregation collapses repeated
    terms map-side before the (term, doc_id) shuffle.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 5,
    approx_doc_count: int | None = None,
) -> DataFrame:
    """Per-term BM25 top-k documents, fixed-point integer scoring.

    score_fp = (tf * (k1+1)*1000 * idf_fp) div (tf*1000 + k1*norm_fp/1000)
      norm_fp = (1000 - b*1000) + (b*1000 * dl * 1000) div avgdl_fp
      idf_fp  = ((N - df) * 1000) div (df + 1) + 1000   (rational, > 0)

    The idf is the Robertson idf's rational core (N - df)/(df + 1) without
    the log — monotone in df, so rankings agree with classic BM25 on any
    fixed corpus; the absence of ln() is what makes the score value-
    checkable bit-for-bit across engines.

    Output: (term, doc_id, tf, df, score_fp, rnk), rnk <= k, ties broken
    by doc_id for cross-engine determinism.

    ``approx_doc_count``: optional free upper bound on |df| (parquet footer
    count) — a term's postings can't exceed the corpus, so it bounds the
    per-term candidates for topk_per_key's cost-based shard sizing.
    """
    docs = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    lens = docs.select("doc_id", F.size("toks").alias("dl")).where(F.col("dl") >= 1)
    stats = lens.agg(
        F.count("*").alias("n_docs"),
        F.expr("sum(dl) * 1000 div count(*)").alias("avgdl_fp"),
    )
    # postings derive from the ALREADY-tokenized docs frame — tokenizing
    # the corpus once, not once for lens and again for the postings
    post = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_fp", F.expr("(n_docs - df) * 1000 div (df + 1) + 1000"))
        .withColumn("norm_fp", F.expr(f"(1000 - {B_FP}) + ({B_FP} * dl * 1000) div avgdl_fp"))
        .withColumn(
            "score_fp",
            F.expr(f"(tf * {K1_FP + 1000} * idf_fp) div (tf * 1000 + ({K1_FP} * norm_fp) div 1000)"),
        )
    )
    return topk_per_key(
        scored,
        ["term"],
        [F.desc("score_fp"), F.asc("doc_id")],
        k,
        "doc_id",
        approx_candidates_per_key=approx_doc_count,
    ).select("term", "doc_id", "tf", "df", "score_fp", "rnk")


def rrf_fuse(
    lex: DataFrame,
    vec: DataFrame,
    k_rrf: int = 60,
    k: int = 10,
    approx_candidates_per_key: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a vector ranking — the
    standard production hybrid-retrieval combiner (Cormack/Clarke/Buettcher
    SIGIR'09): score(d) = sum over tiers of 1 / (k_rrf + rank_tier(d)).

    Inputs: ``lex`` = (query_id, doc_id, lex_rank) and ``vec`` =
    (query_id, doc_id, vec_rank), rank 1-based within each query. Docs
    present in only one tier contribute only that tier's term (the other
    rank reported as 0). Scoring is fixed-point integer —
    ``1000000 div (k_rrf + rank)`` — so fused scores and the final
    ordering hash bit-identically in the DuckDB oracle; rank-based fusion
    needs no score normalization across tiers, which is exactly why RRF
    is the production default.

    Output: (query_id, doc_id, lex_rank, vec_rank, rrf_fp, rnk), top-k
    per query by rrf_fp desc, ties by doc_id asc.
    ``approx_candidates_per_key``: optional per-query candidate bound —
    both inputs are per-query top-N pages, so lex_N + vec_N is exact and
    free for the caller; feeds topk_per_key's cost-based shard sizing.

    100 TB shape: both inputs are already per-query top-N (tiny relative
    to the corpus — N rows per query, not corpus-sized), so the full-outer
    join and the per-query window cost O(queries x N); the heavy lifting
    stays in the tier operators (postings build / ANN scan), each already
    argued at scale in its own docstring.
    """
    l = lex.select("query_id", "doc_id", F.col("lex_rank").cast("long").alias("lex_rank"))
    v = vec.select("query_id", "doc_id", F.col("vec_rank").cast("long").alias("vec_rank"))
    fused = (
        l.join(v, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
            (
                F.coalesce(F.expr(f"1000000 div ({k_rrf} + lex_rank)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000 div ({k_rrf} + vec_rank)"), F.lit(0))
            ).cast("long").alias("rrf_fp"),
        )
    )
    return (
        topk_per_key(
            fused,
            ["query_id"],
            [F.desc("rrf_fp"), F.asc("doc_id")],
            k,
            "doc_id",
            approx_candidates_per_key=approx_candidates_per_key,
        )
        .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf_fp", "rnk")
    )
def _phrase_tf_expr(phrase_words: list[str], toks: str = "toks") -> str:
    """SQL expression counting EXACT adjacent occurrences of an n-word
    phrase in a token array: filter the valid start positions (1-based,
    bounds-guarded so element_at never reads past the array — ANSI-safe)
    for full n-token matches. 0 when the doc is shorter than the phrase."""
    n = len(phrase_words)
    conds = " AND ".join(
        f"element_at({toks}, i + {j}) = '{w}'" for j, w in enumerate(phrase_words)
    )
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"size(filter(sequence(1, size({toks}) - {n} + 1), i -> {conds})) "
        f"ELSE 0 END"
    )


def phrase_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrases: list[str],
    k: int = 5,
    approx_doc_count: int | None = None,
) -> DataFrame:
    """Per-phrase top-k documents by EXACT-ADJACENCY phrase frequency —
    the positional query BM25's bag-of-words postings cannot answer
    ("table hash" as a phrase, not two independent terms).

    One corpus scan computes every phrase's count as a parallel column
    (all whole-stage-codegen higher-order filters over the shared token
    array — the corpus is NOT re-scanned per phrase), then ``stack``
    pivots the counts long, rows with zero matches drop, and one window
    per phrase ranks (phrase_tf desc, doc_id asc).

    Output: (phrase, doc_id, phrase_tf, rnk), rnk <= k.

    100 TB shape: scan-dominated by construction — phrase evaluation is
    per-row array arithmetic inside codegen; the only exchange is the
    per-phrase top-k window over rows that actually match (a tiny
    fraction for selective phrases). Serving-side note, honestly: this
    is the SCAN form; an index-served form needs positional postings
    (positions arrays in the postings rows — the standard Lucene layout),
    which the stored BM25 index deliberately omits (docstring there:
    postings stay scoring-complete, not position-complete).
    """
    from .text_index import check_query_words

    if not phrases:
        raise ValueError("phrase_topk: phrases must be non-empty")
    split = [p.split() for p in phrases]
    if any(len(w) < 2 for w in split):
        raise ValueError("phrase_topk: each phrase needs >= 2 words")
    # words are interpolated into the codegen'd filter expression below —
    # the shared charset guard rejects quote/backslash/whitespace loudly
    check_query_words([w for ws in split for w in ws], "phrase_topk")
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    tf_cols = [
        F.expr(_phrase_tf_expr(w)).cast("long").alias(f"tf_{i}")
        for i, w in enumerate(split)
    ]
    wide = toked.select("doc_id", *tf_cols)
    stack_args = ", ".join(f"'{p}', tf_{i}" for i, p in enumerate(phrases))
    long = wide.selectExpr(
        "doc_id", f"stack({len(phrases)}, {stack_args}) AS (phrase, phrase_tf)"
    ).where(F.col("phrase_tf") > 0)
    return topk_per_key(
        long,
        ["phrase"],
        [F.desc("phrase_tf"), F.asc("doc_id")],
        k,
        "doc_id",
        approx_candidates_per_key=approx_doc_count,
    ).select("phrase", "doc_id", "phrase_tf", "rnk")
