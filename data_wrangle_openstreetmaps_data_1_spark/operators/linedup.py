"""Line-level exact deduplication (CCNet-style) with document rebuild.

Document-level dedup (operators/dedup.py) removes whole near-duplicate
documents; web corpora additionally carry *line*-level boilerplate —
headers, navigation, legal footers — that repeats across otherwise
distinct pages. CCNet (Wenzek et al. 2020, public) removes any line whose
hash occurs elsewhere in the corpus; this operator implements that shape:
split each document into lines, drop every line that appears in >= 2
distinct documents, and reassemble the surviving lines in order.

The synthetic corpus has no newlines, so a "line" here is a fixed-width
window of LINE_TOKENS consecutive tokens (non-overlapping) — the plumbing
(hash census → membership anti-join → ordered rebuild) is identical to
newline-split text; swap :func:`doc_lines` to ``split(text, '\\n')`` for a
real crawl.

100 TB shape: the line census is a groupBy on md5(line) — 16-byte shuffle
keys, map-side partials; the drop is a LEFT ANTI join on the same key (no
row widening, no all-pairs anything); the rebuild shuffles each doc's
surviving (pos, line) rows once on doc_id and re-orders them inside the
aggregate via sort_array — no global sort. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

LINE_TOKENS = 10


def doc_lines(df: DataFrame, id_col: str, text_col: str, width: int = LINE_TOKENS) -> DataFrame:
    """(doc_id, pos, line): non-overlapping ``width``-token windows, 0-based
    pos, preserving order. Documents with no tokens emit nothing."""
    toked = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")).where(
        F.size("toks") >= 1
    )
    # slice() is 1-based; (size-1) div width is >= 0 because size >= 1,
    # so the integral div is floor on both engines.
    lines = toked.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, (size(toks) - 1) div {width}), "
            f"i -> array_join(slice(toks, i * {width} + 1, {width}), ' '))"
        ).alias("lines"),
    )
    return lines.select("doc_id", F.posexplode("lines").alias("pos", "line"))


def line_dedup(df: DataFrame, id_col: str, text_col: str, width: int = LINE_TOKENS) -> DataFrame:
    """Corpus-wide line dedup summary per document.

    Output: (doc_id, n_lines, n_kept, clean_md5) where clean_md5 is the
    md5 of the document rebuilt from its surviving lines (space-joined in
    original order; md5('') when every line was boilerplate) — the hash
    stands in for shipping the cleaned text through the correctness gate.
    """
    lines = doc_lines(df, id_col, text_col, width).withColumn("lh", F.md5("line"))
    dup = (
        lines.groupBy("lh")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("lh")
    )
    kept = lines.join(dup, "lh", "left_anti")
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )
