"""Streaming incremental dedup: new document files vs a stored MinHash index.

The batch twin is ``operators/dedup.py:minhash_lsh_join`` (registered as
``dd_incremental``); this module runs the same asymmetric join
*continuously* — the landing-zone pattern a 100 TB/day ingest actually
uses: upstream writers drop immutable document files into a directory, the
file-source stream picks each file up as a micro-batch, and every batch is
deduped against the (static, band-bucketed) corpus index before admission.

Why ``foreachBatch`` and not a stream-static join: the stream side needs a
per-document *aggregation* (the MinHash signature is a groupBy over the
exploded shingle hashes) before it can touch the index, and chaining a
streaming aggregation into a join pushes into unsupported-operation
territory; ``foreachBatch`` hands each micro-batch over with full batch
semantics, so the whole verified pipeline (shingle → sign → band-join →
exact verify) runs unchanged per batch. This stays incremental where it
matters — the index side is bucketed and reused; per-batch cost scales
with the batch, not the corpus.

State: NONE beyond the file-source checkpoint. Each document's matches
depend only on that document and the static index, so batching is
embarrassingly incremental — the union of per-batch outputs equals the
one-shot batch join regardless of how the files split into micro-batches
(asserted in tests/test_streaming_incremental.py with maxFilesPerTrigger=1).

Driver-sidedness: per-batch results are collected onto the driver ONLY in
this finite harness runner (matches run_available_now's contract — small
verified-pair outputs); the production sink is the foreachBatch parquet
writer (finite.run_available_now_to_parquet's shape, executor-side writes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..operators.dedup import minhash_index, minhash_lsh_join

_MAX_DRIVER_ROWS = 1_000_000


def read_documents_stream(
    spark: SparkSession,
    path: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over document parquet files in ``path``.

    File sources refuse schema inference; the schema is probed from one
    batch-read footer (metadata only), same pattern as the events ingest.
    """
    schema: StructType = spark.read.option("pathGlobFilter", glob).parquet(path).schema
    reader = (
        spark.readStream.schema(schema).format("parquet").option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_incremental_dedup_once(
    new_stream: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """Drain a finite document stream, deduping every micro-batch against
    the static index; return the union of all batches' verified matches
    as (new_id, index_id, jaccard).
    """
    spark = new_stream.sparkSession
    collected: list = []
    # static schema: a zero-batch stream (empty landing zone) must return
    # an EMPTY frame, not crash on an unset first-batch schema
    out_schema = StructType(
        [
            StructField("new_id", LongType()),
            StructField("index_id", LongType()),
            StructField("jaccard", DoubleType()),
        ]
    )
    # hash/sign/band the index ONCE, pinned — each micro-batch reuses the
    # persisted artifacts instead of recomputing the corpus-side pipeline
    artifacts = minhash_index(index_df, id_col, text_col, n=n, k=k, bands=bands)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        matches = minhash_lsh_join(
            batch_df,
            index_df,
            id_col,
            text_col,
            n=n,
            k=k,
            bands=bands,
            threshold=threshold,
            index_artifacts=artifacts,
            # no per-batch persist: each micro-batch's exploded hash table
            # would otherwise stay cached for the stream lifetime
            persist_new=False,
        )
        rows = matches.collect()
        if len(collected) + len(rows) > _MAX_DRIVER_ROWS:
            raise ValueError(
                "run_incremental_dedup_once accumulated more than "
                f"{_MAX_DRIVER_ROWS} match rows on the driver; route large "
                "outputs through a foreachBatch parquet sink instead"
            )
        collected.extend(rows)

    try:
        q = (
            new_stream.writeStream.foreachBatch(process_batch)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # the index artifacts are persisted + eagerly materialized; without
        # this, repeated calls in a long-lived session (outside the
        # registry's clearCache wrapper) would accumulate pinned corpus
        # hash tables while the per-batch side was carefully persist-free
        for a in (artifacts.ex, artifacts.sizes, artifacts.banded):
            a.unpersist()
    return spark.createDataFrame(collected, out_schema)
