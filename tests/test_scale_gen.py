"""tools/gen_scale_rehearsal.py invariants (DuckDB-only, no Spark).

The rehearsal's conclusions are only as good as the generated corpus:
foreign keys must stay join-consistent after per-shard offsets (else join
cardinality silently collapses) and cross-shard document shingle sets must
be DISJOINT (else the shingle self-join is quadratic in shards — the 17x
artifact round 6 measured and fixed, twice)."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale2"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_scale_rehearsal.py"), SRC, dst, "2"],
        check=True,
        capture_output=True,
    )
    return dst


def test_fk_integrity_after_offsets(gen_dir):
    con = duckdb.connect()
    dangling = con.execute(
        f"""
        SELECT
          (SELECT count(*) FROM read_parquet('{gen_dir}/orders.parquet') o
           WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{gen_dir}/customer.parquet') c
                             WHERE c.c_custkey = o.o_custkey)),
          (SELECT count(*) FROM read_parquet('{gen_dir}/lineitem.parquet') l
           WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{gen_dir}/orders.parquet') o
                             WHERE o.o_orderkey = l.l_orderkey)),
          (SELECT count(*) FROM read_parquet('{gen_dir}/lineitem.parquet') l
           WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{gen_dir}/part.parquet') p
                             WHERE p.p_partkey = l.l_partkey))
        """
    ).fetchone()
    assert dangling == (0, 0, 0)


def test_rows_scale_and_keys_unique(gen_dir):
    con = duckdb.connect()
    keys = {
        "customer": "c_custkey",
        "orders": "o_orderkey",
        "lineitem": None,  # composite (orderkey, linenumber); covered via orders
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    for t, key in keys.items():
        n_src = con.execute(f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')").fetchone()[0]
        n_dst = con.execute(f"SELECT count(*) FROM read_parquet('{gen_dir}/{t}.parquet')").fetchone()[0]
        assert n_dst == 2 * n_src, t
        if key:
            dup = con.execute(
                f"SELECT count(*) - count(DISTINCT {key}) FROM read_parquet('{gen_dir}/{t}.parquet')"
            ).fetchone()[0]
            assert dup == 0, f"{t}.{key} collides across shards"


def test_cross_shard_shingles_disjoint(gen_dir):
    # every 3-gram window of a non-zero shard contains that shard's marker,
    # so shard texts share NO shingles with shard 0 (or each other)
    con = duckdb.connect()
    # derive the shard stride exactly as the generator does: max(doc_id)+1
    # of the SOURCE plus the corpus CTE's planted range
    stride = con.execute(
        f"SELECT max(doc_id) + 1 + 20000 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    shared = con.execute(
        f"""
        WITH d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                   FROM read_parquet('{gen_dir}/documents.parquet')),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(t) - 2, 0) + 1),
                 i -> array_to_string(t[i:i+2], ' ')))) AS s
               FROM d),
        x AS (SELECT doc_id // {stride} AS shard, s FROM sh)
        SELECT count(*) FROM (SELECT s FROM x GROUP BY s HAVING count(DISTINCT shard) > 1)
        """
    ).fetchone()[0]
    assert shared == 0


def test_within_shard_near_dup_structure_preserved(gen_dir):
    # the corpus CTE derives near-dups by dropping a doc's FIRST WORD; a
    # marker-injected shard doc and its own first-word-dropped form must
    # still share most shingles, or the planted near-dup relationships
    # would vanish from every non-zero shard
    con = duckdb.connect()
    stride = con.execute(
        f"SELECT max(doc_id) + 1 + 20000 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    j = con.execute(
        f"""
        WITH pair AS (
          SELECT text AS ta, regexp_replace(text, '^\\S+\\s+', '') AS tb
          FROM read_parquet('{gen_dir}/documents.parquet')
          WHERE doc_id = {stride} + 40),
        toks AS (SELECT regexp_split_to_array(lower(trim(ta)), '\\s+') AS x,
                        regexp_split_to_array(lower(trim(tb)), '\\s+') AS y FROM pair),
        sh AS (SELECT list_distinct(list_transform(range(1, greatest(len(x)-2,0)+1),
                        i -> array_to_string(x[i:i+2], ' '))) AS sa,
                      list_distinct(list_transform(range(1, greatest(len(y)-2,0)+1),
                        i -> array_to_string(y[i:i+2], ' '))) AS sb FROM toks)
        SELECT len(list_intersect(sa, sb)) * 1.0 /
               (len(sa) + len(sb) - len(list_intersect(sa, sb))) FROM sh
        """
    ).fetchone()[0]
    assert j > 0.5


@pytest.fixture(scope="module")
def gen_dir_suffix(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale2_suffix"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "gen_scale_rehearsal.py"),
            SRC,
            dst,
            "2",
            "suffix",
        ],
        check=True,
        capture_output=True,
    )
    return dst


def test_suffix_scheme_cross_shard_disjoint(gen_dir_suffix):
    # every WORD of a non-zero shard carries that shard's suffix, so every
    # 3-gram does too — shard shingle sets are pairwise disjoint
    con = duckdb.connect()
    stride = con.execute(
        f"SELECT max(doc_id) + 1 + 20000 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    shared = con.execute(
        f"""
        WITH d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                   FROM read_parquet('{gen_dir_suffix}/documents.parquet')),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(t) - 2, 0) + 1),
                 i -> array_to_string(t[i:i+2], ' ')))) AS s
               FROM d),
        x AS (SELECT doc_id // {stride} AS shard, s FROM sh)
        SELECT count(*) FROM (SELECT s FROM x GROUP BY s HAVING count(DISTINCT shard) > 1)
        """
    ).fetchone()[0]
    assert shared == 0


def test_suffix_scheme_match_structure_exact(gen_dir_suffix):
    """The faithful property the suffix scheme exists for: within a shard,
    shingle-match structure is BIT-IDENTICAL to the source corpus — the
    word→word_sN map is a bijection on 3-grams, so every same-shard pair's
    Jaccard equals the source pair's Jaccard exactly (the insert scheme
    breaks this: it creates 2-word-order matches the source never had)."""
    con = duckdb.connect()
    stride = con.execute(
        f"SELECT max(doc_id) + 1 + 20000 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]

    def pair_jaccards(table_expr: str, a_off: int) -> list:
        # Jaccard of (doc, first-word-dropped doc) for 20 sample docs —
        # the corpus CTE's planted near-dup construction
        return con.execute(
            f"""
            WITH pair AS (
              SELECT doc_id, text AS ta, regexp_replace(text, '^\\S+\\s+', '') AS tb
              FROM {table_expr}
              WHERE doc_id BETWEEN {a_off} AND {a_off} + 19),
            toks AS (SELECT doc_id,
                            regexp_split_to_array(lower(trim(ta)), '\\s+') AS x,
                            regexp_split_to_array(lower(trim(tb)), '\\s+') AS y FROM pair),
            sh AS (SELECT doc_id,
                          list_distinct(list_transform(range(1, greatest(len(x)-2,0)+1),
                            i -> array_to_string(x[i:i+2], ' '))) AS sa,
                          list_distinct(list_transform(range(1, greatest(len(y)-2,0)+1),
                            i -> array_to_string(y[i:i+2], ' '))) AS sb FROM toks)
            SELECT len(list_intersect(sa, sb)) * 1.0 /
                   greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1)
            FROM sh ORDER BY doc_id
            """
        ).fetchall()

    src_j = pair_jaccards(f"read_parquet('{SRC}/documents.parquet')", 40)
    shard_j = pair_jaccards(
        f"read_parquet('{gen_dir_suffix}/documents.parquet')", stride + 40
    )
    assert len(src_j) == len(shard_j) == 20
    for (a,), (b,) in zip(src_j, shard_j):
        assert abs(a - b) < 1e-12
