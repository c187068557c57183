"""r18: bm25_index_merge validates EVERY sidecar contract before its first
write (r16 ADVICE). Previously the facets/docstore/blockmax presence checks
fired after postings/terms/stats were already written, so a refused merge
left a complete-looking index at out_path that silently served queries
without the sidecar the refusal was about. Pinned: a refused merge writes
NOTHING to out_path."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.text_index import (
    bm25_index_merge,
    write_bm25_index,
    write_doc_store,
)
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

NB = 4


@pytest.fixture(scope="module")
def segs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    seg_a = tempfile.mkdtemp(prefix="pv_seg_a_")
    seg_b = tempfile.mkdtemp(prefix="pv_seg_b_")
    shutil.rmtree(seg_a, ignore_errors=True)
    shutil.rmtree(seg_b, ignore_errors=True)
    da = docs.where(F.col("doc_id") % 2 == 0)
    db = docs.where(F.col("doc_id") % 2 == 1)
    write_bm25_index(spark, da, seg_a, "doc_id", "text", n_buckets=NB)
    write_bm25_index(spark, db, seg_b, "doc_id", "text", n_buckets=NB)
    # docstore on only ONE input: the all-or-none contract must refuse
    write_doc_store(spark, seg_a, da)
    yield seg_a, seg_b
    shutil.rmtree(seg_a, ignore_errors=True)
    shutil.rmtree(seg_b, ignore_errors=True)


def test_refused_merge_writes_nothing(spark, segs):
    seg_a, seg_b = segs
    out = tempfile.mkdtemp(prefix="pv_out_") + "/merged"
    try:
        with pytest.raises(ValueError, match="docstore/ present on only some"):
            bm25_index_merge(spark, out, [seg_a, seg_b])
        # the refusal must precede the first write: no partial index on disk
        assert not os.path.exists(out), (
            f"refused merge left artifacts at {out}: {os.listdir(out)}"
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
