"""Streaming incremental dedup: multi-batch equivalence to the one-shot
batch join, and the bucketed-index co-location plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.dedup import (
    minhash_index,
    minhash_lsh_join,
)
from data_wrangle_openstreetmaps_data_1_spark.streaming.incremental import (
    read_documents_stream,
    run_incremental_dedup_once,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    base = [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(20)]
    index = _mk_docs(spark, base)
    # new docs 100..105: each a near-dup of index doc (id - 100), first
    # token dropped; new docs 200..202 are fresh (no match)
    new_rows = [
        (100 + i, " ".join(f"tok{i}_{j}" for j in range(1, 30))) for i in range(6)
    ] + [(200 + i, " ".join(f"zz{i}_{j}" for j in range(30))) for i in range(3)]
    return index, new_rows


def test_multi_batch_union_equals_batch_join(spark, corpus, tmp_path):
    index, new_rows = corpus
    # 3 single parquet FILES -> 3 micro-batches under maxFilesPerTrigger=1
    # (df.write.parquet makes a directory; the landing-zone layout the
    # stream monitors is flat files, so copy the part file out)
    import glob as globmod
    import os
    import shutil

    os.makedirs(f"{tmp_path}/newdocs", exist_ok=True)
    for i in range(3):
        stage = f"{tmp_path}/stage{i}"
        _mk_docs(spark, new_rows[i * 3 : (i + 1) * 3]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = globmod.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, f"{tmp_path}/newdocs/f{i}.parquet")
    stream = read_documents_stream(
        spark, f"{tmp_path}/newdocs", glob="*.parquet", max_files_per_trigger=1
    )
    streamed = run_incremental_dedup_once(stream, index)
    batch = minhash_lsh_join(_mk_docs(spark, new_rows), index, "doc_id", "text")
    got = {(r.new_id, r.index_id, r.jaccard) for r in streamed.collect()}
    want = {(r.new_id, r.index_id, r.jaccard) for r in batch.collect()}
    assert got == want and len(want) >= 6  # every near-dup found


def test_prepared_index_reuse_matches_fresh(spark, corpus):
    index, new_rows = corpus
    new = _mk_docs(spark, new_rows)
    art = minhash_index(index, "doc_id", "text")
    assert (art.n, art.k, art.bands) == (3, 16, 4)
    with_art = minhash_lsh_join(
        new, None, "doc_id", "text", index_artifacts=art, persist_new=False
    )
    fresh = minhash_lsh_join(new, index, "doc_id", "text")
    assert sorted(map(tuple, with_art.collect())) == sorted(map(tuple, fresh.collect()))


def test_bucketed_index_band_join_no_index_shuffle(spark, corpus):
    """The 100 TB layout: the index's banded signature table lives on disk
    bucketed by band_key, so the per-batch candidate join needs NO exchange
    on the (huge) index side — only the small new batch shuffles."""
    index, new_rows = corpus
    banded_i = minhash_index(index, "doc_id", "text").banded
    spark.sql("DROP TABLE IF EXISTS b_minhash_index")
    banded_i.write.bucketBy(8, "band_key").sortBy("band_key").saveAsTable("b_minhash_index")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stored = spark.table("b_minhash_index")
        banded_n = minhash_index(_mk_docs(spark, new_rows), "doc_id", "text").banded

        def join_plan(index_side):
            j = banded_n.withColumnRenamed("doc_id", "new_id").join(
                index_side.withColumnRenamed("doc_id", "index_id"), "band_key"
            )
            return j, j._jdf.queryExecution().executedPlan().toString()

        jb, plan_bucketed = join_plan(stored)
        _, plan_plain = join_plan(stored.sparkSession.createDataFrame(stored.collect(), stored.schema))
        assert "SortMergeJoin" in plan_bucketed
        # the bucketed scan feeds the join with no exchange of its own:
        # one fewer hash-partition exchange than the identical plain join,
        # and the scan reports its bucketing
        n_bucketed = plan_bucketed.count("Exchange hashpartitioning")
        n_plain = plan_plain.count("Exchange hashpartitioning")
        assert n_bucketed == n_plain - 1
        assert "Bucketed: true" in plan_bucketed
        assert jb.count() >= 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_minhash_index")


def test_parquet_sink_checkpoint_resume_exactly_once(spark, tmp_path):
    """Restart semantics of the durable sink: a second AvailableNow run on
    the SAME checkpoint processes only files that arrived since the first
    run — every input row lands in the output exactly once across runs."""
    import glob as globmod
    import shutil

    from pyspark.sql import functions as F
    from data_wrangle_openstreetmaps_data_1_spark.streaming.finite import (
        run_available_now_to_parquet,
    )

    land = f"{tmp_path}/land"
    out = f"{tmp_path}/out"
    ckpt = f"{tmp_path}/ckpt"
    import os

    os.makedirs(land)

    def drop_file(i, lo, hi):
        stage = f"{tmp_path}/stage{i}"
        spark.range(lo, hi).select(F.col("id")).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(globmod.glob(f"{stage}/part-*.parquet")[0], f"{land}/f{i}.parquet")

    def run_once():
        stream = (
            spark.readStream.schema("id long").format("parquet")
            .option("pathGlobFilter", "*.parquet").load(land)
        )
        run_available_now_to_parquet(stream, out, ckpt)

    drop_file(0, 0, 100)
    run_once()
    assert spark.read.parquet(out).count() == 100

    drop_file(1, 100, 250)
    run_once()  # same checkpoint: must pick up ONLY f1
    got = spark.read.parquet(out)
    assert got.count() == 250
    assert got.select("id").distinct().count() == 250  # exactly once

    run_once()  # nothing new: no duplicates either
    assert spark.read.parquet(out).count() == 250
