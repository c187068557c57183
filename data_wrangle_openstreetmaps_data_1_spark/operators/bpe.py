"""BPE tokenizer training: learn merge rules from corpus word frequencies.

The Sennrich'16 byte-pair-encoding trainer, Spark-shaped: the only
corpus-scale stage is the word-frequency groupBy (one shuffle on the word
string — document text never moves again); every merge round then operates
on the VOCAB table (bounded by distinct words — ~millions of rows at web
scale, not corpus-sized), as per-word window functions.

Merge application is EXACT greedy leftmost non-overlapping — the semantics
real BPE trainers use — via gaps-and-islands: hit rows mark pair starts,
consecutive hits form islands (pos minus running hit count), and within an
island greedy takes every odd occurrence. A string replace() cannot express
this (the replace consumes the shared boundary symbol and de-syncs on odd
runs like 'aaaa'); the windowed form can, identically on both engines
(the DuckDB oracle unrolls the same rounds — plans/pipeline_ext.py).

Driver state: ONE (a, b, count) row collected per round — the argmax merge
pair (same bounded-scalar pattern as the k-means centroid collect,
operators/clustering.py). Each round's symbol table is persisted and the
previous round's unpersisted once superseded; the returned merge table is
built from the collected rows, so nothing stays pinned after return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bpe_merges(df: DataFrame, text_col: str, rounds: int = 6) -> DataFrame:
    """Learn the first ``rounds`` BPE merge rules.

    Output: (rnd, lft, rgt, pair_count) — one row per learned rule, rnd
    1-based; pair_count is the occurrence-weighted adjacent-pair count the
    rule won with (ties broken by (lft, rgt) string order, so the rule
    sequence is deterministic and engine-portable).
    """
    if rounds < 1:
        raise ValueError(f"rounds={rounds} must be >= 1")
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    # (?!^) splits between every pair of chars; Java's split keeps one
    # TRAILING empty token (the lookahead also matches at end-of-string),
    # which must be dropped or it becomes a phantom symbol in every word.
    # It is always last, so the surviving positions stay contiguous.
    syms = (
        words.select(
            F.col("w").alias("w_id"),
            "cnt",
            F.posexplode(F.split("w", r"(?!^)")).alias("pos0", "sym"),
        )
        .where(F.col("sym") != "")
        .select("w_id", (F.col("pos0") + 1).cast("long").alias("pos"), "sym", "cnt")
    )

    w_word = Window.partitionBy("w_id").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    cur = syms.persist()
    pinned = [cur]
    try:
        for r in range(rounds):
            best = (
                cur.withColumn("nxt", F.lead("sym").over(w_word))
                .where(F.col("nxt").isNotNull())
                .groupBy("sym", "nxt")
                .agg(F.sum("cnt").alias("pc"))
                .orderBy(F.desc("pc"), F.asc("sym"), F.asc("nxt"))
                .limit(1)
                .collect()
            )
            if not best:  # corpus degenerated to single-symbol words
                break
            a, b, pc = best[0]
            merges.append((r + 1, a, b, int(pc)))
            if r == rounds - 1:
                break  # the last rule needs no application
            hit = cur.withColumn(
                "nxt", F.lead("sym").over(w_word)
            ).withColumn(
                "hit", ((F.col("sym") == a) & (F.col("nxt") == b)).cast("int")
            )
            isl = hit.withColumn(
                "island",
                F.col("pos")
                - F.sum("hit").over(w_word.rowsBetween(Window.unboundedPreceding, 0)),
            )
            tkn = isl.withColumn(
                "taken",
                (
                    (F.col("hit") == 1)
                    & (
                        F.row_number().over(
                            Window.partitionBy("w_id", "island", "hit").orderBy("pos")
                        )
                        % 2
                        == 1
                    )
                ).cast("int"),
            )
            nxt = (
                tkn.withColumn(
                    "prev_taken", F.coalesce(F.lag("taken").over(w_word), F.lit(0))
                )
                .where(F.col("prev_taken") == 0)
                .select(
                    "w_id",
                    F.row_number().over(w_word).cast("long").alias("pos"),
                    F.when(F.col("taken") == 1, F.lit(a + b))
                    .otherwise(F.col("sym"))
                    .alias("sym"),
                    "cnt",
                )
                .persist()
            )
            pinned.append(nxt)
            cur = nxt
    finally:
        for p in pinned:
            p.unpersist()
    return spark.createDataFrame(
        merges, "rnd int, lft string, rgt string, pair_count long"
    )
