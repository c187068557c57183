"""Chunked event-sequence pattern matching — the graceful-degradation path
the ``a_event_pattern_match`` skew guard's error message promises
(plans/pipeline_ext.py:_guard_max_events_per_key).

The unchunked operator collapses each key's ordered event initials into ONE
string row, so a bot key with 10⁸ events becomes a ~100 MB single row built
inside ``collect_list`` on one executor — the guard fails loudly before
that. This module bounds the per-ROW size instead: each key's ordered
events split into fixed-size chunks, each chunk becomes a ≤ ``chunk_size``
character string, and a match that straddles a boundary is caught by
appending the next chunk's first ``max_match_len - 1`` characters (the
overlap). The key-partitioned window SORT over a hot key still runs in one
task, but Spark's external sort spills skinny constant-width rows to disk
gracefully — it is the single data-sized ROW, not the sort, that kills the
unchunked form.

Semantics — deliberate and documented: this counts ANCHORED MATCH STARTS
(positions ``i`` where the bounded regex matches beginning at ``i``),
not the non-overlapping left-to-right scan of the unchunked operator. A
non-overlapping scan carries consumed-prefix state across every boundary
(a match that starts in chunk k decides where chunk k+1's first match may
begin), which is inherently sequential; anchored-start counting is
boundary-decomposable and exact. For the funnel question the operator
serves ("how many view→…→purchase runs began"), all-starts is the more
direct count. The pattern must be LENGTH-BOUNDED (``max_match_len``) —
``vc*p`` is unbounded and cannot be chunked losslessly; use ``vc{0,K}p``.

Chunk-local exactness: with both sides' suffix identical, a match starting
inside chunk k's appended tail region succeeds there iff it succeeds at the
same position of chunk k+1's body — so per-chunk counts use
``lookahead_count(body + tail) - lookahead_count(tail)``: starts in the
tail are counted exactly once, by the next chunk. The lookahead form
``(?=pat)`` makes every start position a zero-width match, so
``regexp_extract_all`` (codegen, JVM regex) counts starts without
materializing match text.

Scale: one key-hash shuffle for the window, one (key, chunk) partial-agg
shuffle for the strings, one small lead() window per key over chunk ids;
per-row memory is O(chunk_size), independent of key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchored_pattern_counts_chunked(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    char_col: str,
    pattern: str,
    max_match_len: int,
    chunk_size: int = 1_000_000,
) -> DataFrame:
    """Per-key count of positions where ``pattern`` matches starting there.

    ``pattern`` must never match more than ``max_match_len`` characters
    (caller contract — e.g. ``vc{0,3}p`` ⇒ 5) and must NOT match the
    empty string: a zero-width-matchable pattern (``c{0,2}``) makes every
    position a match INCLUDING the end-of-string position, which the
    per-chunk telescoping count cannot see (``starts(body+tail) −
    starts(tail)`` cancels interior end positions but each key's final
    end-of-string start would be lost — one-off divergence from the
    unchunked reference, caught in review r9). Rejected up front by a
    driver-side ``re`` probe rather than silently miscounting.
    ``max_match_len - 1`` must fit inside one chunk so a straddling match
    spans at most two chunks. Returns (key_col, n_matches) for keys with
    ≥ 1 match.
    """
    import re as _re

    if max_match_len < 1:
        raise ValueError(f"max_match_len must be >= 1, got {max_match_len}")
    # Best-effort driver-side probe: Python's re is a close-enough dialect
    # for the simple bounded patterns this operator targets. Java-only
    # syntax (\p{Alpha}, \Q..\E, possessive quantifiers) that Python
    # cannot parse skips the probe rather than crashing — the JVM regex is
    # still the executor of record. Context-dependent zero-width patterns
    # (lookbehind like (?<=a)b?) can pass the empty-string probe yet still
    # match zero-width mid-data; such patterns are outside the supported
    # class (the docstring requires min match length >= 1 unconditionally).
    try:
        empty_matchable = _re.compile(f"(?:{pattern})").match("") is not None
    except _re.error:
        empty_matchable = False  # Java-dialect pattern: probe not possible
    if empty_matchable:
        raise ValueError(
            f"pattern {pattern!r} can match the empty string; zero-width "
            "matches make the end-of-string position countable, which "
            "chunked telescoping cannot preserve — require min match "
            "length >= 1 (e.g. anchor with a mandatory first literal)"
        )
    if max_match_len - 1 > chunk_size:
        raise ValueError(
            f"overlap {max_match_len - 1} exceeds chunk_size {chunk_size}: "
            "a match could span 3+ chunks; raise chunk_size or bound the "
            "pattern tighter"
        )
    # char column as the FINAL order tie-break, matching the unchunked
    # form's array_sort over struct(*order_cols, c): with duplicate
    # order values both forms now resolve ties identically (advice r9 —
    # row_number over order_cols alone was nondeterministic there).
    w = Window.partitionBy(key_col).orderBy(*order_cols, F.col("c"))
    ev = (
        df.select(key_col, F.col(char_col).alias("c"), *order_cols)
        .withColumn("rn", F.row_number().over(w) - 1)
        .select(
            key_col,
            "c",
            # exact integer div, not float-divide-then-truncate: the
            # package convention (packing.py, dedup.py prefix lengths) for
            # boundary arithmetic — a misplaced chunk boundary would
            # silently corrupt that key's telescoped count (review r9)
            F.expr(f"rn div {chunk_size}").alias("chunk"),
            F.pmod(F.col("rn"), F.lit(chunk_size)).alias("pos"),
        )
    )
    # per-(key, chunk) ordered string: bounded at chunk_size chars per row
    chunks = ev.groupBy(key_col, "chunk").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ),
        ).alias("s")
    )
    ov = max_match_len - 1
    w_next = Window.partitionBy(key_col).orderBy("chunk")
    tail = F.coalesce(
        F.lead(F.substring("s", 1, ov)).over(w_next), F.lit("")
    )
    look = F.lit(f"(?={pattern})")
    starts = lambda c: F.size(F.regexp_extract_all(c, look, F.lit(0)))  # noqa: E731
    per_chunk = chunks.select(
        key_col,
        (starts(F.concat(F.col("s"), tail)) - starts(tail)).alias("n"),
    )
    return (
        per_chunk.groupBy(key_col)
        .agg(F.sum("n").cast("long").alias("n_matches"))
        .where(F.col("n_matches") > 0)
    )


def anchored_pattern_counts(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    char_col: str,
    pattern: str,
) -> DataFrame:
    """Unchunked reference with the SAME anchored-start semantics (one
    string row per key — subject to the same skew caveat as the
    non-overlapping operator; exists for equivalence testing and for
    corpora known to be under the cap)."""
    w_ord = F.array_sort(F.collect_list(F.struct(*order_cols, F.col(char_col).alias("c"))))
    seq = df.groupBy(key_col).agg(
        F.concat_ws("", F.transform(w_ord, lambda s: s["c"])).alias("s")
    )
    n = F.size(F.regexp_extract_all(F.col("s"), F.lit(f"(?={pattern})"), F.lit(0)))
    return seq.select(key_col, n.cast("long").alias("n_matches")).where(
        F.col("n_matches") > 0
    )
