"""Sequence packing: map documents into fixed-size token chunks.

The standard pretraining layout — concatenate documents in a deterministic
order into one token stream, cut every ``max_tokens`` — expressed as pure
window arithmetic: a running token total per shard gives every document its
chunk id and offset without materializing the stream. (Greedy
no-straddle bin packing is a different, inherently sequential policy; the
concat-then-chunk policy is the one large pipelines actually use, and it is
exactly expressible as a cumulative sum.)

Scale notes: a single global ordering would funnel everything through one
window partition, so packing is per-SHARD (deterministic hash shard by
default) — each shard is an independent token stream, which is also how a
1000-executor run would write chunked training files. The only shuffle is
the window's partition-by-shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    max_tokens: int,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document its position in the packed token stream.

    Documents are ordered by ``id_col`` within ``pmod(id, n_shards)``
    shards; each shard's stream is cut every ``max_tokens``. Output adds:

    - ``shard``        — which independent stream the doc belongs to
    - ``chunk_id``     — chunk (0-based within shard) holding the doc's
                         first token
    - ``chunk_offset`` — token offset of the doc inside that chunk
    - ``n_chunks``     — how many chunks the doc spans (docs longer than
                         the remaining chunk space straddle boundaries,
                         exactly like the real layout)
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens={max_tokens} must be >= 1")
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards} must be >= 1")
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = F.pmod(F.col(id_col), F.lit(n_shards))
    w = Window.partitionBy(shard).orderBy(F.col(id_col))
    # Integer arithmetic throughout: float floor(start/max) could misplace a
    # chunk boundary once running totals get large enough for double
    # rounding; `div` stays exact at any stream length.
    staged = df.select(
        id_col,
        toks.cast("long").alias("n_tokens"),
        shard.alias("shard"),
        (F.sum(toks.cast("long")).over(w) - toks).cast("long").alias("start"),
    )
    return staged.select(
        id_col,
        "n_tokens",
        "shard",
        F.expr(f"start div {max_tokens}").alias("chunk_id"),
        F.pmod(F.col("start"), F.lit(max_tokens)).cast("long").alias("chunk_offset"),
        F.when(F.col("n_tokens") <= 0, F.lit(0))
        .otherwise(
            F.expr(f"(start + n_tokens - 1) div {max_tokens} - start div {max_tokens} + 1")
        )
        .cast("long")
        .alias("n_chunks"),
    )
