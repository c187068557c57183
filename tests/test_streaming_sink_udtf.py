"""§2.11 surface completions: the durable streaming sink (foreachBatch →
parquet, the lake-landing path a real deployment uses instead of the
harness's memory sink) and the Python UDTF escape hatch (Spark 4) — the one
lateral-table form the engine exposes for logic that genuinely can't be a
column expression. Both are deliberately NOT registered queries: the sink
writes files (side effect) and the UDTF is the slow path whose declarative
twin (explode) is the registered form.
"""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_foreachbatch_parquet_sink_equals_memory_sink(spark, tmp_path):
    from data_wrangle_openstreetmaps_data_1_spark.streaming.finite import (
        run_available_now,
        run_available_now_to_parquet,
    )
    from data_wrangle_openstreetmaps_data_1_spark.streaming.ingest import read_events_stream
    from data_wrangle_openstreetmaps_data_1_spark.streaming.rollup import hourly_rollup_stream

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rollup = hourly_rollup_stream(read_events_stream(spark, SF))
    expected = run_available_now(
        hourly_rollup_stream(read_events_stream(spark, SF)), "append"
    ).toPandas()

    run_available_now_to_parquet(rollup, out, ckpt, output_mode="append")
    # files land under batch_id=N/ partitions (dynamic-overwrite idempotence)
    assert glob.glob(os.path.join(out, "batch_id=*", "*.parquet"))
    got = spark.read.parquet(out).drop("batch_id").toPandas()

    key = lambda df: df.sort_values(list(sorted(df.columns)), ignore_index=True)[
        sorted(df.columns)
    ]
    import pandas as pd

    pd.testing.assert_frame_equal(key(expected), key(got), check_dtype=False)


def test_python_udtf_escape_hatch(spark):
    # a lateral form built-ins can't express in one pass: emit one row per
    # (chunk, side-metadata) with per-row python state. The declarative twin
    # for simple splits is explode(); this pins the UDTF surface working.
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="chunk_id: int, start: int, length: int")
    class FixedChunks:
        def eval(self, text: str, size: int):
            if text is None:
                return
            for i, start in enumerate(range(0, len(text), size)):
                yield i, start, min(size, len(text) - start)

    spark.udtf.register("fixed_chunks", FixedChunks)
    rows = spark.sql(
        "SELECT c.* FROM (SELECT 'abcdefghij' AS t), LATERAL fixed_chunks(t, 4) c"
    ).collect()
    assert [(r.chunk_id, r.start, r.length) for r in rows] == [(0, 0, 4), (1, 4, 4), (2, 8, 2)]

    # also callable through the DataFrame API
    out = FixedChunks(lit("xyz"), lit(2)).collect()
    assert [(r.chunk_id, r.length) for r in out] == [(0, 2), (1, 1)]
