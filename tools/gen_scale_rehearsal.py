"""Generate an sf1-equivalent LOCAL dataset for the scale rehearsal.

No network in the container (DuckDB's tpch dbgen extension cannot be
downloaded), so sf1 is produced by replicating the driver's sf0.1 tables
``SHARDS``x with foreign-key-consistent key offsets:

- customer/supplier/part/orders/lineitem: every key column shifts by
  ``shard * (max key + 1)`` on BOTH sides of each FK, so join
  cardinalities scale linearly (each shard joins only within itself),
  exactly like a bigger TPC-H run.
- events: event_id/user_id shift (10x users, same per-user distribution).
- documents: doc_id shifts by max(doc_id)+20_001 per shard — clear of the
  corpus CTE's +10_000/+20_000 planted-duplicate ranges — and non-zero
  shards get per-shard text rewritten by one of two SCHEMES:

  * ``suffix`` (default since round 9 — the FAITHFUL fixture): every word
    gains a shard suffix (``word`` -> ``word_s3``; tokens() is whitespace
    split, so each stays one token). 3-grams map bijectively per shard:
    two same-shard docs share a rewritten shingle iff they shared the
    original shingle, so WITHIN-shard match structure (planted near-dups,
    Jaccard values, candidate counts) is byte-equivalent to sf0.1 while
    cross-shard sets are fully disjoint — a true linear 10x corpus.
  * ``insert`` (the pre-r9 scheme, kept as the STRESS fixture): a marker
    token injected after every 2 words. Round-9 root-causing
    (BENCH_sf1_local.json r9_prefix_rootcause) showed this COLLAPSES the
    effective shingle order from 3 words to 2 — every 3-gram window
    contains the marker, so any two same-shard docs sharing a word
    BIGRAM share a shingle — densifying pairwise candidates ~190x at 10x
    data. Useful as an adversarial densification stress (kept so the
    historical /tmp/sf1 ledger rows stay reproducible), WRONG for
    drawing linear-scaling conclusions.

  (Verbatim replication is worse than either: 10-way exact-duplicate
  cliques, measured 17x dd_groups_cc at 10x data.)
- embeddings: vec_id shifts; non-zero shards get a small deterministic
  nonlinear perturbation (cosine is scale-invariant, so a multiplicative
  tweak would leave 10-way exact-duplicate vectors; the additive term
  actually moves directions).

Usage: python tools/gen_scale_rehearsal.py [src_dir] [dst_dir] [shards] [scheme]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1, 10 shards, scheme=suffix
(the FAITHFUL scheme — review r9: defaulting to the known-misleading
insert stress scheme sent every "run gen_scale_rehearsal first" pointer
to a fixture the same round declared wrong for scaling conclusions; pass
``insert`` explicitly to reproduce the historical /tmp/sf1 ledger rows).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SCHEME = sys.argv[4] if len(sys.argv) > 4 else "suffix"
if SCHEME not in ("insert", "suffix"):
    raise SystemExit(f"unknown scheme {SCHEME!r}: use 'insert' or 'suffix'")


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    # Per-shard key offsets COMPUTED as max(key)+1 from the actual source —
    # hardcoded constants would silently collide on any src whose keys
    # exceed them (e.g. re-sharding this tool's own output, or a sparse
    # dbgen orderkey space), invalidating every scaling conclusion.
    def off(table: str, key: str, extra: int = 0) -> int:
        return con.execute(f"SELECT max({key}) + 1 + {extra} FROM {src(table)}").fetchone()[0]

    o_cust = off("customer", "c_custkey")
    o_supp = off("supplier", "s_suppkey")
    o_part = off("part", "p_partkey")
    o_ord = off("orders", "o_orderkey")
    o_evt = off("events", "event_id")
    o_user = off("events", "user_id")
    # documents: the corpus CTE plants duplicates at doc_id + 10k/+20k, so
    # the shard stride must clear the planted range too
    o_doc = off("documents", "doc_id", extra=20000)
    o_vec = off("embeddings", "vec_id")

    doc_rewrite = (
        # insert: marker token after every 2 words (stress scheme)
        "regexp_replace(text, '(\\S+ \\S+) ', '\\1 s' || s || 'x ', 'g')"
        if SCHEME == "insert"
        # suffix: every word tagged in place (faithful scheme)
        else "regexp_replace(text, '(\\S+)', '\\1_s' || s, 'g')"
    )

    copies = {
        # dimension tables don't scale in TPC-H; keep them verbatim
        "region": f"SELECT * FROM {src('region')}",
        "nation": f"SELECT * FROM {src('nation')}",
        "customer": f"""
            SELECT c_custkey + s * {o_cust} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')} CROSS JOIN range({SHARDS}) t(s)""",
        "supplier": f"""
            SELECT s_suppkey + s * {o_supp} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM {src('supplier')} CROSS JOIN range({SHARDS}) t(s)""",
        "part": f"""
            SELECT p_partkey + s * {o_part} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM {src('part')} CROSS JOIN range({SHARDS}) t(s)""",
        "orders": f"""
            SELECT o_orderkey + s * {o_ord} AS o_orderkey,
                   o_custkey + s * {o_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')} CROSS JOIN range({SHARDS}) t(s)""",
        "lineitem": f"""
            SELECT l_orderkey + s * {o_ord} AS l_orderkey,
                   l_partkey + s * {o_part} AS l_partkey,
                   l_suppkey + s * {o_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')} CROSS JOIN range({SHARDS}) t(s)""",
        "events": f"""
            SELECT event_id + s * {o_evt} AS event_id, ts,
                   user_id + s * {o_user} AS user_id, event_type, value, props
            FROM {src('events')} CROSS JOIN range({SHARDS}) t(s)""",
        "documents": f"""
            SELECT doc_id + s * {o_doc} AS doc_id,
                   CASE WHEN s = 0 THEN text
                        ELSE {doc_rewrite}
                   END AS text,
                   lang, source, n_chars
            FROM {src('documents')} CROSS JOIN range({SHARDS}) t(s)""",
        "embeddings": f"""
            SELECT vec_id + s * {o_vec} AS vec_id,
                   CASE WHEN s = 0 THEN embedding
                        ELSE list_transform(embedding,
                             x -> x + 0.0005 * s * (x * x - 0.5))::FLOAT[]
                   END AS embedding,
                   label
            FROM {src('embeddings')} CROSS JOIN range({SHARDS}) t(s)""",
    }
    for t, q in copies.items():
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
