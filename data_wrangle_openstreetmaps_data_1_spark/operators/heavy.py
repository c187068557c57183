"""Exact distributed heavy hitters (φ-frequent items) without a full
token census.

The classic two-pass local-threshold scheme (Manku/Motwani lossy-counting
lineage, public): any item with global frequency > n/k must, in at least
one data batch, exceed that batch's local n_b/k (strict pigeonhole over
any partition of the stream: if every batch count obeyed
cnt_b*k <= n_b, summing gives freq*k <= n). So

- **pass 1** counts WITHIN Arrow batches (mapInPandas — per-batch Python
  dict counting, no shuffle, scan-speed) and emits only tokens that beat
  their batch-local threshold, plus one per-batch total row. The emitted
  candidate set depends on batching, but it is always a SUPERSET of the
  true heavy hitters.
- **pass 2** recounts ONLY the candidates exactly (distinct-candidate
  broadcast semi-join pushed below the aggregation) and applies the
  global threshold. The final answer is therefore EXACT and independent
  of partitioning/batching.

Why this matters at 100 TB: the naive census (groupBy every token) moves
every distinct token through the shuffle — at web scale that is billions
of keys dominated by the useless singleton tail. Here the shuffle moves
(a) per-batch survivors and (b) candidate recounts only; the tail dies
executor-side in a Python dict that never exceeds the batch.

Tokenization in pass 1 matches functions/text.tokens'
``split(lower(trim(text)), '\\s+')`` UNCONDITIONALLY: the pattern is
compiled with ``re.ASCII`` so Python ``\\s`` == Java ``\\s``
(``[ \\t\\n\\x0B\\f\\r]``; Python spells \\x0B as \\v) and the strip uses
the same explicit ASCII set rather than unicode str.strip(). Without
this, a heavy hitter adjacent to a unicode space (e.g. U+00A0) could be
split by pass 1 but not pass 2, silently dropping it from the candidate
superset.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..partitioning import explode_nonempty, spread, truncate_lineage

# re.ASCII pins \s to [ \t\n\v\f\r] — exactly Java's \s — so the pass-1
# candidate superset guarantee holds on any corpus, not just ASCII text.
_WS = re.compile(r"\s+", re.ASCII)
_ASCII_WS = " \t\n\r\f\v"

_CAND_SCHEMA = "token string, cnt long, batch_n long"


def _candidate_batches(k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, int] = {}
            n_b = 0
            for text in pdf["text"]:
                if text is None:
                    continue
                for tok in _WS.split(text.strip(_ASCII_WS).lower()):
                    if tok:
                        counts[tok] = counts.get(tok, 0) + 1
                        n_b += 1
            survivors = [(t, c) for t, c in counts.items() if c * k > n_b]
            yield pd.DataFrame(
                {
                    "token": [t for t, _ in survivors] + [None],
                    "cnt": [c for _, c in survivors] + [0],
                    # the None-token row carries this batch's total
                    "batch_n": [0] * len(survivors) + [n_b],
                }
            )

    return gen


def heavy_hitters(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Tokens with exact global count * k > total tokens.

    Output: (token, cnt) — exact counts, deterministic regardless of how
    the input was batched or partitioned.
    """
    src = spread(df.select(F.col(text_col).alias("text")))
    pass1 = src.mapInPandas(_candidate_batches(k), schema=_CAND_SCHEMA)
    # one action materializes both the candidate set and the global total;
    # both are small (survivors per batch <= k by construction)
    pass1 = pass1.persist()
    try:
        total = pass1.agg(F.sum("batch_n")).collect()[0][0] or 0
        cands = pass1.where(F.col("token").isNotNull()).select("token").distinct()
        toks = explode_nonempty(src, [], tokens(F.col("text")), "token").where(
            F.length("token") > 0
        )
        exact = (
            toks.join(F.broadcast(cands), "token")
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
        )
        out = exact.where(F.col("cnt") * k > F.lit(total))
        # eager-materialize while the candidate frame is still cached
        # (pass2's lineage reads it); truncation also drops that lineage
        # so the unpersist below can never trigger a pass-1 recompute
        return truncate_lineage(out)
    finally:
        pass1.unpersist()
