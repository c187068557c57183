"""Repeated-passage scrubbing — substring-level dedup of training text.

Document-level dedup (operators/dedup.py) drops whole near-duplicate
documents; this operator removes REPEATED PASSAGES from otherwise-unique
documents — the boilerplate/license-header/templated-span problem
("Deduplicating Training Data Makes Language Models Better", Lee et al.
2022, public literature: repeated substrings of ~50 tokens are the bulk of
web-corpus duplication and removing them improves LMs).

Relational formulation (no suffix arrays, no per-doc Python): a passage is
a k-token window. Any k-gram occurring more than once in the corpus marks
the token positions it covers; covered positions are cut and the remaining
tokens re-joined. Consecutive/overlapping repeated windows merge for free:
interval union is just DISTINCT covered positions — no gaps-and-islands
windowing needed, because coverage is computed per position, not per span.

Plan shape (the 100 TB argument):
1. tokenize + per-position k-gram hash (codegen; portable 60-bit md5 tier
   so the DuckDB oracle is bit-identical, operators/dedup.py precedent) —
   rows are (doc_id, i, gh), never text;
2. one groupBy(gh) — the only corpus-keyed shuffle; hot boilerplate grams
   are single keys whose count fits in a long (map-side partial agg), and
   only grams with count >= 2 flow on;
3. flagged occurrences explode to at most k covered positions each —
   bounded k × duplicated-volume, not corpus²;
4. anti-join on (doc_id, position) + one per-doc ordered rebuild
   (collect_list bounded by the doc's own length — the same bound as any
   per-row reshape).

``keep_first``: False (default) scrubs EVERY occurrence — the boilerplate-
removal mode (shared headers should survive in no document); True keeps
the globally-first occurrence ((doc_id, i)-minimal, deterministic) and
scrubs the rest — the Lee et al. dedup mode (information is kept exactly
once). first-occurrence selection is a min(struct) aggregate in the same
groupBy — no per-gram window sort, so a million-occurrence boilerplate
gram costs a single running min, not a skewed sort.

keep_first and SELF-OVERLAPPING grams (review r9, behavior pinned in
tests): byte-exact preservation of the first occurrence holds whenever
the repeated gram does not overlap itself. For periodic text ('a a a a
a a', k=5: the gram recurs at i=1 AND i=2) the later overlapping
occurrences are still flagged and their covered positions still cut, so
only the first occurrence's non-overlapped PREFIX survives — periodic
spam collapses toward its fundamental period, which is the desired
outcome for that class (it is precisely the 'repeated many times'
content substring dedup exists to shrink); exactly-once preservation of
an aperiodic passage is unaffected.

Output: (doc_id, n_tokens, n_removed, cleaned_hash) — the cleaned text is
md5-hashed so the driver's value compare works on fixed-width rows; the
full cleaned text is one ``concat_ws`` away for pipeline use
(``scrubbed_text`` helper below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import HASH64_SQL
from ..functions.text import tokens
from ..partitioning import eager_cache, spread, truncate_lineage


def _occurrences(base: DataFrame, k: int) -> DataFrame:
    """(doc_id, i, gh): every k-gram start position with its portable hash.

    Built via explode_outer-then-filter (the explode_nonempty pattern —
    a plain explode of a computed array infers a size>0 filter that pushes
    the whole tokenize subtree below the spread exchange)."""
    grams = base.select(
        "doc_id",
        F.explode_outer(
            F.when(
                F.col("n") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - (k - 1)),
                    lambda i: F.struct(
                        i.cast("int").alias("i"),
                        F.concat_ws(" ", F.slice(F.col("t"), i, k)).alias("g"),
                    ),
                ),
            )
        ).alias("s"),
    ).where(F.col("s").isNotNull())
    return grams.select(
        "doc_id",
        F.col("s.i").alias("i"),
        F.expr(HASH64_SQL.format(x="s.g")).alias("gh"),
    )


def _scrub_parts(
    df: DataFrame, id_col: str, text_col: str, k: int, keep_first: bool
):
    """Shared scrub core: returns (base, cleaned) where ``base`` is the
    PERSISTED (doc_id, t, n) token table and ``cleaned`` the per-doc kept
    groups. ONE implementation for both public projections (review r9: the
    hash form and the text form previously duplicated this ~40-line plan
    and could drift apart silently).

    ``base`` materialization rationale (the dedup.py precedent): the
    tokenize subtree feeds FOUR consumers (gram build, both sides' shapes
    of the flagged join resolve through occ, the position explode, and the
    final per-doc join) whose downstream exchanges differ, so
    ReuseExchange cannot collapse them — un-materialized, the CPU-bound
    tokenize+gram+md5 pipeline runs ~4x per action (the exact failure
    class dedup.py measured at ~24s of a 38s sf0.1 run), and because the
    callers drive everything through ONE truncate_lineage action, a LAZY
    persist still lets the four concurrent AQE stages each recompute it
    (partitioning.eager_cache, r18). eager_cache materializes once;
    blocks spill rather than OOM at corpus scale. Callers still eagerly
    materialize their projection and then unpersist (a no-op under the
    checkpoint mode, kept for the persist/count A/B modes).
    """
    base = eager_cache(
        spread(df)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t"))
        .withColumn("n", F.size("t"))
    )
    occ = _occurrences(base, k)
    freq = occ.groupBy("gh").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("doc_id", "i")).alias("first_occ"),
    )
    flagged = occ.join(freq.where(F.col("cnt") >= 2), "gh")
    if keep_first:
        flagged = flagged.where(F.struct("doc_id", "i") != F.col("first_occ"))
    covered = flagged.select(
        "doc_id",
        F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(k - 1))).alias("p"),
    ).distinct()
    tpos = (
        base.select("doc_id", F.posexplode_outer("t").alias("p0", "tok"))
        .where(F.col("tok").isNotNull())
        .select("doc_id", (F.col("p0") + 1).cast("int").alias("p"), "tok")
    )
    kept = tpos.join(covered, ["doc_id", "p"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("cleaned"),
        F.count("*").alias("n_kept"),
    )
    return base, cleaned


def repeated_passage_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    keep_first: bool = False,
) -> DataFrame:
    """Cut every token covered by a corpus-repeated k-gram (module doc).

    Returns (doc_id, n_tokens, n_removed, cleaned_hash), one row per input
    document (fully-scrubbed docs report md5('') — they remain visible so
    a downstream filter can decide their fate explicitly). Eagerly
    materialized (truncate_lineage) so the corpus-sized token cache is
    released before returning — the output is one fixed-width row per doc.
    """
    base, cleaned = _scrub_parts(df, id_col, text_col, k, keep_first)
    try:
        return (
            base.select("doc_id", "n")
            .join(cleaned, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n").cast("long").alias("n_tokens"),
                (F.col("n") - F.coalesce(F.col("n_kept"), F.lit(0)))
                .cast("long")
                .alias("n_removed"),
                F.md5(F.coalesce("cleaned", F.lit(""))).alias("cleaned_hash"),
            )
            .transform(truncate_lineage)
        )
    finally:
        base.unpersist()


def scrubbed_text(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, keep_first: bool = False
) -> DataFrame:
    """Pipeline form: (doc_id, text) with repeated passages removed — the
    SAME shared plan as :func:`repeated_passage_scrub` (one core, two
    projections), returning the cleaned text itself for downstream stages.
    Eager like the hash form; the output is the cleaned corpus, which is
    what the caller was about to materialize anyway.
    """
    base, cleaned = _scrub_parts(df, id_col, text_col, k, keep_first)
    try:
        return (
            base.select("doc_id")
            .join(cleaned, "doc_id", "left")
            .select("doc_id", F.coalesce("cleaned", F.lit("")).alias("text"))
            .transform(truncate_lineage)
        )
    finally:
        base.unpersist()
