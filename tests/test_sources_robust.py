"""Ingest robustness: quarantined JSONL, schema evolution, compaction."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from data_wrangle_openstreetmaps_data_1_spark.sources.robust import (
    compact_parquet,
    read_jsonl_quarantine,
    read_parquet_evolved,
)

SCHEMA = StructType([StructField("id", LongType()), StructField("name", StringType())])


def test_quarantine_preserves_bad_lines(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "this is not json\n"
        '{"id": 2, "name": "b"}\n'
        '{"id": "not-a-number", "name": "c"}\n'
    )
    good, bad, raw = read_jsonl_quarantine(spark, str(p), SCHEMA)
    assert {(r.id, r.name) for r in good.collect()} == {(1, "a"), (2, "b")}
    bad_lines = [r[0] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "this is not json" in bad_lines
    # the corrupt line is preserved VERBATIM for replay
    assert any("not-a-number" in b for b in bad_lines)
    raw.unpersist()


def test_schema_evolution_merges_columns(spark, tmp_path):
    old = spark.createDataFrame([(1, "a")], ["id", "name"])
    new = spark.createDataFrame([(2, "b", "en")], ["id", "name", "lang"])
    old.write.parquet(f"{tmp_path}/t/v1")
    new.write.parquet(f"{tmp_path}/t/v2")
    merged = read_parquet_evolved(spark, f"{tmp_path}/t/v1", f"{tmp_path}/t/v2")
    assert set(merged.columns) == {"id", "name", "lang"}
    rows = {r.id: r.lang for r in merged.collect()}
    assert rows[1] is None and rows[2] == "en"
    # the default read would silently drop 'lang' for v1-footer-first reads
    # (not asserted: footer order is nondeterministic — the point is the
    # helper makes the safe behavior the named path)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 50).alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
    )
    df.repartition(64).write.parquet(f"{tmp_path}/frag")
    import glob

    n_in = len(glob.glob(f"{tmp_path}/frag/part-*.parquet"))
    assert n_in == 64
    n_out = compact_parquet(spark, f"{tmp_path}/frag", f"{tmp_path}/compact", target_mb=128,
                            sort_by=["k", "id"])
    assert n_out < n_in
    out = spark.read.parquet(f"{tmp_path}/compact")
    assert out.count() == 10000
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(10000))


def test_zorder_layout_localizes_both_columns(spark, tmp_path):
    """Generic multi-column z-order: per-file min/max spans must shrink for
    BOTH layout columns vs an unsorted write (a single-column sort can only
    localize its leading column)."""
    import glob

    import pyarrow.parquet as pq

    from data_wrangle_openstreetmaps_data_1_spark.sources.layout import (
        write_zorder_layout,
    )

    df = spark.range(20000).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 139).alias("y"),
    )

    def mean_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            st = [md.row_group(rg).column(idx).statistics for rg in range(md.num_row_groups)]
            spans.append(max(s.max for s in st) - min(s.min for s in st))
        return sum(spans) / len(spans)

    df.repartition(8).write.parquet(f"{tmp_path}/plain")
    write_zorder_layout(df, f"{tmp_path}/zorder", ["x", "y"], bits=8, num_files=8)

    for col in ("x", "y"):
        assert mean_span(f"{tmp_path}/zorder", col) < 0.7 * mean_span(f"{tmp_path}/plain", col)
    out = spark.read.parquet(f"{tmp_path}/zorder")
    assert out.count() == 20000
    assert out.agg(F.sum("x")).collect()[0][0] == df.agg(F.sum("x")).collect()[0][0]


def test_zorder_layout_read_side_pruning(spark, tmp_path):
    """The OBSERVABLE read-side win (tools/zorder_readwin.py measures the
    sf0.1 numbers): a two-column range predicate over the z-ordered layout
    must let parquet row-group statistics prune most of the table — the
    scan's own numOutputRows metric, read from the executed plan, proves
    rows were skipped at the reader, not filtered afterwards. The plain
    layout reads everything (every row group spans the full value range)."""
    from data_wrangle_openstreetmaps_data_1_spark.sources.layout import (
        write_zorder_layout,
    )

    df = spark.range(40000).select(
        "id",
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
    )
    df.repartition(16).write.parquet(f"{tmp_path}/plain")
    write_zorder_layout(df, f"{tmp_path}/zorder", ["x", "y"], bits=8, num_files=16)

    def scan_rows(path):
        q = (
            spark.read.parquet(path)
            .where(F.col("x").between(100, 160) & F.col("y").between(100, 160))
        )
        res = q.collect()
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        scanned = 0
        for i in range(leaves.size()):
            m = leaves.apply(i).metrics()
            if m.contains("numOutputRows"):
                scanned += m.apply("numOutputRows").value()
        return len(res), scanned

    n_plain, scanned_plain = scan_rows(f"{tmp_path}/plain")
    n_z, scanned_z = scan_rows(f"{tmp_path}/zorder")
    assert n_plain == n_z  # same answer
    assert scanned_plain == 40000  # unsorted: nothing prunes
    # z-ordered: the reader must skip well over half the table
    assert scanned_z < 0.5 * scanned_plain, (scanned_z, scanned_plain)


def test_zorder_key_overflow_guard():
    """bits * n_cols > 63 would overflow the bigint sign bit and silently
    destroy the locality ordering — must refuse loudly."""
    import pytest

    from data_wrangle_openstreetmaps_data_1_spark.sources.layout import zorder_key_expr

    ranges = [(f"c{i}", 0.0, 1.0) for i in range(8)]
    with pytest.raises(ValueError, match="63"):
        zorder_key_expr(ranges, bits=8)  # 64 bits: one too many
    assert zorder_key_expr(ranges[:7], bits=9)  # 63: fine
