"""Unigram (SentencePiece-flavored) subword vocabulary + segmentation.

The second tokenizer family next to operators/bpe.py (Kudo 2018's unigram
LM is the public basis; this is the deterministic, oracle-checkable core
of that shape): score candidate substrings by corpus frequency mass, keep
the top-V as the piece vocabulary, and segment words by GREEDY
LONGEST-MATCH against that vocabulary with single-character fallback
(unknown chars pass through as their own pieces — the byte-fallback
semantics real tokenizers use, and what guarantees one-step progress).

Greedy longest-match instead of Viterbi/EM keeps every stage exactly
expressible in BOTH engines — the segmentation is ONE bounded left fold
per word (Spark ``aggregate`` over a sequence; the DuckDB oracle walks
the same states with a recursive CTE), no per-row Python anywhere.

Scale design:
- Candidate generation and segmentation run over the DISTINCT-word table
  weighted by count, not the corpus: cost ∝ |vocabulary| (Heaps' law,
  ~sqrt-ish of corpus), results re-weighted by word count. The corpus
  text itself is scanned once for word counts.
- The piece vocabulary is a bounded scalar class (like BPE's merge rules,
  operators/bpe.py): V pieces of ≤4 chars collected to the driver and
  embedded as IN-list literals — broadcast-free, codegen'd membership.
- The fold unrolls to the measured max word length (one scalar agg), so
  plan depth is data-bounded and no iteration loop or lineage truncation
  is needed at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..partitioning import explode_nonempty, spread

#: candidate piece lengths (singles are the implicit fallback)
PIECE_LENS = (2, 3, 4)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wc): distinct corpus words with occurrence counts."""
    w = explode_nonempty(spread(df.select(text_col)), [], tokens(F.col(text_col)), "word")
    return w.where(F.length("word") > 0).groupBy("word").agg(F.count("*").alias("wc"))


def piece_masses(words: DataFrame) -> DataFrame:
    """(piece, mass): every substring of length 2..4 at every position of
    every distinct word, weighted by word count. ``mass`` is the exact
    integer frequency mass the piece could cover."""
    per_len = []
    for plen in PIECE_LENS:
        # sequence(1, n) REVERSES when n < 1 (Spark yields [1, 0]) — the
        # if() guard keeps short words at an empty array, like DuckDB range
        per_len.append(
            f"if(length(word) >= {plen}, "
            f"transform(sequence(1, length(word) - {plen - 1}), "
            f"i -> substring(word, i, {plen})), array())"
        )
    allsubs = "concat(" + ", ".join(per_len) + ")"
    ex = explode_nonempty(
        words.select("wc", F.expr(allsubs).alias("subs")), ["wc"], "subs", "piece"
    )
    return ex.groupBy("piece").agg(F.sum("wc").alias("mass"))


def select_vocab(words: DataFrame, v: int) -> list[tuple[str, int]]:
    """Top-``v`` pieces by (mass desc, piece asc) — the deterministic
    selection both engines share. Bounded scalar result (the piece list is
    the tokenizer artifact, like a BPE rule list)."""
    top = piece_masses(words).orderBy(F.desc("mass"), F.asc("piece")).limit(v).collect()
    return [(r["piece"], r["mass"]) for r in top]


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def match_len_sql(word_sql: str, pos_sql: str, pieces: list[str]) -> str:
    """Greedy longest-match length at a position: the longest piece length
    whose substring is in the vocabulary, else 1 (single-char fallback).
    Pure CASE over IN-list literals — identical text works in both
    engines (substring past end returns a short string and can't match a
    longer piece, in Spark and DuckDB alike)."""
    branches = []
    for plen in sorted(PIECE_LENS, reverse=True):
        of_len = sorted(p for p in pieces if len(p) == plen)
        if of_len:
            lits = ", ".join(_sql_quote(p) for p in of_len)
            branches.append(
                f"WHEN substring({word_sql}, {pos_sql}, {plen}) IN ({lits}) THEN {plen}"
            )
    if not branches:
        return "1"
    return "CASE " + " ".join(branches) + " ELSE 1 END"


def segment_words(words: DataFrame, pieces: list[str], max_len: int) -> DataFrame:
    """Add ``seg``: '|'-joined greedy segmentation of ``word``. One
    ``aggregate`` fold of ``max_len`` steps (each step consumes >= 1 char,
    so words up to ``max_len`` chars finish; longer input is a loud error
    rather than a silent truncation)."""
    over = words.where(F.length("word") > max_len).limit(1).collect()
    if over:
        raise ValueError(
            f"segment_words: word longer than max_len={max_len} "
            f"({over[0]['word']!r}); raise max_len (it is the fold depth)"
        )
    l_expr = match_len_sql("word", "acc.p", pieces)
    fold = (
        f"aggregate(sequence(1, {max_len}), "
        "named_struct('p', 1, 'seg', cast('' as string)), "
        "(acc, i) -> if(acc.p > length(word), acc, "
        f"named_struct('p', acc.p + {l_expr}, "
        f"'seg', concat(acc.seg, '|', substring(word, acc.p, {l_expr}))))).seg"
    )
    return words.withColumn("seg", F.expr(fold))


def segment_recursive_sql(words_cte: str, pieces_cte: str) -> str:
    """DuckDB oracle twin of :func:`segment_words`: a recursive CTE walking
    (word, pos) states with the same longest-match rule, vocabulary read
    relationally from ``pieces_cte(piece)`` (so the oracle derives the
    SAME vocab from the data rather than trusting the Spark-side
    literals). Returns CTE text for ``segd(word, wc, seg)``."""
    l_branches = " ".join(
        f"WHEN substr(word, p, {plen}) IN "
        f"(SELECT piece FROM {pieces_cte} WHERE length(piece) = {plen}) THEN {plen}"
        for plen in sorted(PIECE_LENS, reverse=True)
    )
    return f"""
    walk(word, wc, p, seg) AS (
      SELECT word, wc, 1, '' FROM {words_cte}
      UNION ALL
      SELECT word, wc, p + l, seg || '|' || substr(word, p, l)
      FROM (SELECT word, wc, p, seg,
                   CASE {l_branches} ELSE 1 END AS l
            FROM walk WHERE p <= length(word)))
    , segd AS (SELECT word, wc, seg FROM walk WHERE p > length(word))
    """
