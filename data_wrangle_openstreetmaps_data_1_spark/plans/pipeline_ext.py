"""Round-6 extension tier: lexical retrieval (BM25), quality gating,
line-level dedup, incremental index dedup, and blocked fuzzy matching —
the data-curation operators a production pretraining pipeline runs that
round 5's tiers did not yet cover.

Every oracle here follows the registry's dtype-parity contract (integer
fixed-point scoring, CASTs where DuckDB would widen to HUGEINT, md5
digests instead of shipping rebuilt text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import HASH64_SQL, MERSENNE_P, minhash_coeffs
from ..functions.text import QUALITY_SQL_TEMPLATE
from ..operators.linedup import LINE_TOKENS
from ..operators.dedup import minhash_lsh_join, minhash_lsh_pairs
from ..operators.fuzzy import fuzzy_blocked_pairs
from ..operators.linedup import line_dedup
from ..operators.quality import (
    GATE_STOPWORDS,
    MAX_MEAN_LEN_X10,
    MAX_MODAL_PCT,
    MAX_TOKENS,
    MIN_MEAN_LEN_X10,
    MIN_TOKENS,
    quality_gates,
)
from ..operators.retrieval import B_FP, K1_FP, bm25_topk
from ..sources.tables import load_table, table_row_bound
from .pipeline import (
    _CORPUS_SQL,
    _HASH64_SQL,
    _SHINGLES_SQL,
    _TOKS_SQL,
    _corpus,
    _knn_brute_oracle,
    _minhash_oracle as _minhash_oracle_ref,
)
from .registry import register

# --------------------------------------------------------------------------
# BM25 lexical retrieval
# --------------------------------------------------------------------------

BM25_TERMS = ["spark", "hash", "window"]
_TERMS_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _bm25_oracle(terms_in: str, k: int) -> str:
    """BM25 top-k-per-term CTE chain, parameterized on the term list and k
    (shared by tx_bm25_topk and the hybrid-RRF fusion)."""
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    lens AS (SELECT doc_id, len(toks) AS dl FROM d WHERE len(toks) >= 1),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS avgdl_fp
              FROM lens),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok
             WHERE term IN ({terms_in}) GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
    scored AS (
      SELECT term, doc_id, tf, df,
             (n_docs - df) * 1000 // (df + 1) + 1000 AS idf_fp,
             (1000 - {B_FP}) + ({B_FP} * dl * 1000) // avgdl_fp AS norm_fp
      FROM post JOIN dfreq USING (term) JOIN lens USING (doc_id)
      CROSS JOIN stats),
    s2 AS (SELECT term, doc_id, tf, df,
                  (tf * {K1_FP + 1000} * idf_fp)
                    // (tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM scored),
    r AS (SELECT term, doc_id, tf, df, score_fp,
                 row_number() OVER (PARTITION BY term
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM s2)
    SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score_fp AS BIGINT) AS score_fp, rnk
    FROM r WHERE rnk <= {k}
    """


@register(
    "tx_bm25_topk",
    _bm25_oracle(_TERMS_IN, 5),
    bench=True,
    doc="BM25 top-5 per query term, fixed-point integer scoring (rational "
    "idf surrogate — no ln(), so scores hash identically across engines); "
    "postings = one explode + (term, doc) groupBy; df/avgdl broadcast",
)
def tx_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    return bm25_topk(
        load_table(spark, sf, "documents"), "doc_id", "text", BM25_TERMS, k=5,
        approx_doc_count=table_row_bound(sf, "documents"),
    )


# --------------------------------------------------------------------------
# hybrid retrieval: BM25 + vector, reciprocal-rank fusion
# --------------------------------------------------------------------------

# 5 hybrid queries: term i pairs with query vector vec_id = i (documents
# and embeddings share the id space). Terms chosen from the corpus's
# dense vocabulary so every lexical list is full.
HYBRID_TERMS = ["spark", "hash", "window", "vector", "stream"]
_HYBRID_TERMS_IN = ", ".join(f"'{t}'" for t in HYBRID_TERMS)
_HYBRID_MAP_VALUES = ", ".join(f"({i}, '{t}')" for i, t in enumerate(HYBRID_TERMS))
_HYBRID_N = 20  # per-tier candidate depth fed into the fusion
_RRF_K = 60  # the standard RRF dampening constant (Cormack et al.)


def _hybrid_rrf_oracle() -> str:
    """RRF fusion of the BM25 and brute-force-cosine top-20 lists.

    Both tiers re-rank on their PUBLISHED values (score_fp / rounded
    cos_sim, ties by doc id) — the same re-ranking the Spark side applies
    to the operators' public outputs, so rank parity never depends on
    unpublished float intermediates."""
    return f"""
    WITH lex20 AS ({_bm25_oracle(_HYBRID_TERMS_IN, _HYBRID_N)}),
    vec20 AS ({_knn_brute_oracle(len(HYBRID_TERMS), _HYBRID_N)}),
    m(query_id, term) AS (VALUES {_HYBRID_MAP_VALUES}),
    lexr AS (SELECT CAST(m.query_id AS BIGINT) AS query_id, l.doc_id,
                    CAST(l.rnk AS BIGINT) AS lex_rank
             FROM lex20 l JOIN m ON l.term = m.term),
    vecr AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                    neighbor_id AS doc_id,
                    CAST(row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT)
                      AS vec_rank
             FROM vec20),
    fused AS (
      SELECT coalesce(l.query_id, v.query_id) AS query_id,
             coalesce(l.doc_id, v.doc_id) AS doc_id,
             coalesce(l.lex_rank, 0) AS lex_rank,
             coalesce(v.vec_rank, 0) AS vec_rank,
             coalesce(1000000 // ({_RRF_K} + l.lex_rank), 0)
               + coalesce(1000000 // ({_RRF_K} + v.vec_rank), 0) AS rrf_fp
      FROM lexr l FULL OUTER JOIN vecr v
        ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
    r AS (SELECT query_id, doc_id, lex_rank, vec_rank, rrf_fp,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rrf_fp DESC, doc_id ASC) AS rnk
          FROM fused)
    SELECT query_id, doc_id, lex_rank, vec_rank,
           CAST(rrf_fp AS BIGINT) AS rrf_fp, rnk
    FROM r WHERE rnk <= 10
    """


@register(
    "sim_hybrid_rrf",
    _hybrid_rrf_oracle(),
    bench=True,
    doc="hybrid retrieval: reciprocal-rank fusion (RRF, k=60) of the BM25 "
    "lexical top-20 and the exact-cosine vector top-20, per query — the "
    "production retrieval shape combining both tiers the engine already "
    "ships. Rank-based fusion is integer-exact (1000000 div (60+rank)), "
    "so fused scores hash identically cross-engine; no score "
    "normalization needed across tiers (RRF's whole point). Fusion cost "
    "is O(queries x 20) regardless of corpus size — the tiers do the "
    "heavy lifting",
)
def sim_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import knn_brute

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    mapping = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HYBRID_TERMS)], "query_id long, term string"
    )
    lex = (
        bm25_topk(
            docs, "doc_id", "text", HYBRID_TERMS, k=_HYBRID_N,
            approx_doc_count=table_row_bound(sf, "documents"),
        )
        .join(F.broadcast(mapping), "term")
        .select("query_id", "doc_id", F.col("rnk").alias("lex_rank"))
    )
    vec20 = knn_brute(
        emb, emb.where(F.col("vec_id") < len(HYBRID_TERMS)), "vec_id", "embedding",
        k=_HYBRID_N, approx_target_count=table_row_bound(sf, "embeddings"),
    )
    # re-rank on the PUBLISHED rounded cos_sim (ties by neighbor_id) so the
    # rank is reproducible from the operator's public output on any engine
    wv = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    vec = vec20.withColumn("vec_rank", F.row_number().over(wv)).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "vec_rank"
    )
    # fused candidates per query are exactly the two tier pages: free bound
    return rrf_fuse(lex, vec, k_rrf=_RRF_K, k=10, approx_candidates_per_key=2 * _HYBRID_N)


@register(
    "sim_hybrid_recall",
    f"""
    WITH exact AS ({_knn_brute_oracle(len(HYBRID_TERMS), 10)}),
    hyb AS ({_hybrid_rrf_oracle()}),
    ap AS (SELECT query_id, doc_id AS neighbor_id FROM hyb),
    hits AS (SELECT ap.query_id, count(*) AS hits
             FROM ap JOIN exact USING (query_id, neighbor_id)
             GROUP BY 1),
    q AS (SELECT DISTINCT query_id FROM exact)
    SELECT 'hybrid_rrf' AS method, q.query_id,
           CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
           round(CAST(coalesce(hits.hits, 0) AS DOUBLE) / CAST(10 AS DOUBLE), 6)
             AS recall_at_k
    FROM q LEFT JOIN hits ON q.query_id = hits.query_id
    """,
    doc="recall@10 of the hybrid-RRF fused list against the exact vector "
    "top-10 (sim_recall_at_k framework, method column for union-ability) — "
    "quantifies how much vector recall the lexical tier's votes displace; "
    "with a 20-deep vector list feeding the fusion, a fused top-10 "
    "dominated by lexical-only docs would show here as a low value",
)
def sim_hybrid_recall(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import knn_brute, recall_at_k

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    exact = knn_brute(
        emb, emb.where(F.col("vec_id") < len(HYBRID_TERMS)), "vec_id", "embedding", k=10,
        approx_target_count=table_row_bound(sf, "embeddings"),
    )
    approx = sim_hybrid_rrf(spark, sf).select(
        "query_id", F.col("doc_id").alias("neighbor_id")
    )
    return recall_at_k(exact, approx, 10).select(
        F.lit("hybrid_rrf").alias("method"), "query_id", "hits", "recall_at_k"
    )


# --------------------------------------------------------------------------
# quality gates (Gopher-style conjunction with per-rule verdicts)
# --------------------------------------------------------------------------

_GATE_STOPS_IN = ", ".join(f"'{w}'" for w in GATE_STOPWORDS)


@register(
    "tx_quality_gates",
    rf"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    pt AS (SELECT doc_id, term, count(*) AS cnt,
                  CAST(sum(length(term)) AS BIGINT) AS chars
           FROM tok GROUP BY 1, 2),
    pd AS (SELECT doc_id,
                  CAST(sum(cnt) AS BIGINT) AS n_tokens,
                  CAST(sum(chars) AS BIGINT) AS n_chars,
                  CAST(max(cnt) AS BIGINT) AS modal_cnt,
                  max(CASE WHEN term IN ({_GATE_STOPS_IN}) THEN 1 ELSE 0 END)
                    AS has_stop
           FROM pt GROUP BY 1)
    SELECT doc_id, n_tokens,
           n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS} AS g_len,
           n_chars * 10 // n_tokens
             BETWEEN {MIN_MEAN_LEN_X10} AND {MAX_MEAN_LEN_X10} AS g_wordlen,
           has_stop = 1 AS g_stop,
           modal_cnt * 100 <= n_tokens * {MAX_MODAL_PCT} AS g_rep,
           (n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS})
             AND (n_chars * 10 // n_tokens
                  BETWEEN {MIN_MEAN_LEN_X10} AND {MAX_MEAN_LEN_X10})
             AND has_stop = 1
             AND modal_cnt * 100 <= n_tokens * {MAX_MODAL_PCT} AS passed
    FROM pd
    """,
    doc="Gopher-style quality gate conjunction with per-rule verdicts kept "
    "in the output (token-count bounds, mean-token-length bounds, stopword "
    "presence, modal-token repetition) — all integer fixed-point, no libm",
)
def tx_quality_gates(spark: SparkSession, sf: str) -> DataFrame:
    return quality_gates(load_table(spark, sf, "documents"), "doc_id", "text")


# --------------------------------------------------------------------------
# line-level dedup (CCNet-style)
# --------------------------------------------------------------------------


@register(
    "dd_line_dedup",
    rf"""
    WITH corpus AS ({_CORPUS_SQL}),
    d0 AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM corpus),
    d AS (SELECT doc_id, toks FROM d0 WHERE len(toks) >= 1),
    la AS (SELECT doc_id,
                  list_transform(range(0, (len(toks) - 1) // {LINE_TOKENS} + 1),
                                 i -> array_to_string(
                                   toks[i*{LINE_TOKENS}+1:i*{LINE_TOKENS}+{LINE_TOKENS}], ' '))
                    AS lines
           FROM d),
    lines AS (
      SELECT doc_id, u.pos AS pos, u.line AS line
      FROM (SELECT doc_id,
                   unnest(list_transform(range(0, len(lines)),
                                         j -> {{'pos': j, 'line': lines[j+1]}}))
                     AS u
            FROM la)),
    dup AS (SELECT md5(line) AS lh FROM lines
            GROUP BY md5(line) HAVING count(DISTINCT doc_id) >= 2),
    kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
             LEFT JOIN dup ON md5(l.line) = dup.lh WHERE dup.lh IS NULL),
    tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1),
    reb AS (SELECT doc_id, count(*) AS n_kept,
                   md5(string_agg(line, ' ' ORDER BY pos)) AS clean_md5
            FROM kept GROUP BY 1)
    SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(r.clean_md5, md5('')) AS clean_md5
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    doc="CCNet-style line-level dedup: fixed-width token windows stand in "
    "for lines (no newlines in the synthetic corpus); census on md5(line), "
    "drop lines in >= 2 docs via LEFT ANTI join, ordered rebuild digest",
)
def dd_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return line_dedup(_corpus(spark, sf), "doc_id", "text")


# --------------------------------------------------------------------------
# incremental dedup: new batch vs existing index
# --------------------------------------------------------------------------


def _minhash_side(tag: str, src: str, k: int = 16, bands: int = 4) -> str:
    # full-width hs for the verify, mod-p inside the permutation lambda —
    # mirrors _minhash_oracle / operators/dedup.py (see there for why)
    r = k // bands
    perms = ", ".join(
        f"coalesce(list_min(list_transform(hs, h -> ({a} * (h % {MERSENNE_P}) + {b}) % {MERSENNE_P})), {MERSENNE_P})"
        for a, b in minhash_coeffs(k)
    )
    band_keys = ", ".join(
        f"'{bi},' || array_to_string(sig[{bi * r + 1}:{bi * r + r}], ',')" for bi in range(bands)
    )
    return f"""
    sh_{tag} AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM {src}),
    hashed_{tag} AS (
      SELECT doc_id, len(shingles) AS n_sh,
             list_transform(shingles, s -> {_HASH64_SQL}) AS hs
      FROM sh_{tag} WHERE len(shingles) > 0),
    sigs_{tag} AS (SELECT doc_id, [{perms}] AS sig FROM hashed_{tag}),
    banded_{tag} AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs_{tag})"""


_INCREMENTAL_ORACLE = rf"""
    WITH corpus AS ({_CORPUS_SQL}),
    newb AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 10000),
    idx AS (SELECT doc_id, text FROM corpus WHERE doc_id < 10000),
    {_minhash_side('n', 'newb')},
    {_minhash_side('i', 'idx')},
    cand AS (
      SELECT DISTINCT bn.doc_id AS new_id, bi.doc_id AS index_id
      FROM banded_n bn JOIN banded_i bi USING (band_key)),
    verified AS (
      SELECT new_id, index_id,
             round(len(list_intersect(hn.hs, hi.hs)) /
                   (hn.n_sh + hi.n_sh - len(list_intersect(hn.hs, hi.hs))),
                   6) AS jaccard
      FROM cand JOIN hashed_n hn ON new_id = hn.doc_id
                JOIN hashed_i hi ON index_id = hi.doc_id)
    SELECT new_id, index_id, jaccard FROM verified WHERE jaccard >= 0.4
    """


@register(
    "dd_incremental",
    _INCREMENTAL_ORACLE,
    bench=True,
    doc="incremental ingest dedup: MinHash-band equi-join of a NEW batch "
    "against a stored index — no index×index or batch×batch pairs ever "
    "generated; per-run cost scales with batch size, not corpus size "
    "(the continuously-ingesting pipeline's shape)",
)
def dd_incremental(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)
    new_batch = corpus.where(F.col("doc_id") >= 10000)
    index = corpus.where(F.col("doc_id") < 10000)
    return minhash_lsh_join(new_batch, index, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4)


@register(
    "st_incremental_dedup",
    _INCREMENTAL_ORACLE,
    doc="STREAMING twin of dd_incremental: the planted new-doc batch "
    "arrives via a parquet file-source stream and every micro-batch is "
    "deduped against the static corpus index inside foreachBatch (the "
    "landing-zone admission-control pattern); over the driver's single-file "
    "input the union of batches equals the batch join exactly, which this "
    "shared oracle checks — multi-batch splits are asserted equal in "
    "tests/test_streaming_incremental.py",
)
def st_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.incremental import read_documents_stream, run_incremental_dedup_once

    stream = read_documents_stream(spark, sf).select("doc_id", "text")
    # the planted-corpus new batch, derived with narrow streaming-legal ops:
    # one source, explode of the two planted variants, filter (the batch
    # twin _corpus() uses union of two scans, which on a stream would mean
    # two file sources over the same directory)
    variants = F.array(
        F.struct(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
            (F.col("doc_id") % 5 == 0).alias("keep"),
        ),
        F.struct(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.col("text").alias("text"),
            (F.col("doc_id") % 7 == 0).alias("keep"),
        ),
    )
    new_stream = (
        stream.select(F.explode(variants).alias("v"))
        .where(F.col("v.keep"))
        .select(F.col("v.doc_id").alias("doc_id"), F.col("v.text").alias("text"))
    )
    index = load_table(spark, sf, "documents").select("doc_id", "text")
    return run_incremental_dedup_once(new_stream, index)


# --------------------------------------------------------------------------
# blocked fuzzy matching (entity resolution)
# --------------------------------------------------------------------------


@register(
    "j_fuzzy_blocked",
    r"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    keyed AS (
      SELECT DISTINCT name, u.key AS key
      FROM (SELECT name,
                   unnest(list_transform(
                     range(0, least(len(regexp_split_to_array(name, '\s+')), 2)),
                     j -> {'key': regexp_split_to_array(name, '\s+')[j+1]})) AS u
            FROM names)
      WHERE length(u.key) > 0),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM keyed a JOIN keyed b ON a.key = b.key
      WHERE a.name < b.name)
    SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
    FROM cand WHERE levenshtein(name_a, name_b) <= 2
    """,
    doc="blocked fuzzy entity matching: distinct names -> token blocking "
    "(position-free equi-join on any of the first two tokens; r9: the "
    "positional join missed leading-token insert/delete pairs) -> "
    "Levenshtein <= 2 verify; "
    "never an all-pairs product, edit distance runs once per deduped "
    "candidate pair",
)
def j_fuzzy_blocked(spark: SparkSession, sf: str) -> DataFrame:
    return fuzzy_blocked_pairs(load_table(spark, sf, "part"), "p_name", max_dist=2)


# --------------------------------------------------------------------------
# iterative graph analytics: fixed-point PageRank
# --------------------------------------------------------------------------


def _pagerank_oracle(iters: int = 3) -> str:
    from ..operators.graph import DAMP_PCT, SCALE

    tele = f"({100 - DAMP_PCT} * ({SCALE} // n_nodes)) // 100"
    ctes = [
        """eraw AS (SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "edges AS (SELECT a AS src, b AS dst FROM eraw UNION SELECT b, a FROM eraw)",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "n AS (SELECT count(*) AS n_nodes FROM nodes)",
        f"r0 AS (SELECT node, {SCALE} // n_nodes AS r FROM nodes CROSS JOIN n)",
    ]
    for i in range(iters):
        ctes.append(
            f"""r{i + 1} AS (
          SELECT e.dst AS node,
                 {tele} + ({DAMP_PCT} * sum(p.r // d.outdeg)) // 100 AS r
          FROM edges e JOIN r{i} p ON e.src = p.node JOIN deg d ON e.src = d.src
          CROSS JOIN n
          GROUP BY e.dst, n.n_nodes)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, CAST(r AS BIGINT) AS pr_fp FROM r{iters}"
    )


@register(
    "ml_pagerank",
    _pagerank_oracle(),
    doc="fixed-point PageRank (3 unrolled iterations, damping 0.85) over "
    "the customer<->supplier bipartite graph derived from orders+lineitem; "
    "all-integer trajectory, value-checked against the same iterations "
    "unrolled as DuckDB CTEs (the ml_kmeans pattern); per round one keyed "
    "equi-join + one partial-agg groupBy — bucketable, driver-free",
)
def ml_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import pagerank

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    eraw = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_custkey").alias("src"), (F.col("l_suppkey") + 1000000).alias("dst")
    )
    return pagerank(eraw, iters=3)


# --------------------------------------------------------------------------
# end-to-end curation funnel: gates -> exact dedup -> fingerprint dedup
# --------------------------------------------------------------------------


@register(
    "tx_curation_funnel",
    rf"""
    WITH corpus AS ({_CORPUS_SQL}),
    tokd AS (SELECT doc_id, text, len({_TOKS_SQL}) AS n_toks FROM corpus),
    tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM corpus),
    pt AS (SELECT doc_id, term, count(*) AS cnt,
                  CAST(sum(length(term)) AS BIGINT) AS chars
           FROM tok GROUP BY 1, 2),
    pd AS (SELECT doc_id,
                  CAST(sum(cnt) AS BIGINT) AS n_tokens,
                  CAST(sum(chars) AS BIGINT) AS n_chars,
                  CAST(max(cnt) AS BIGINT) AS modal_cnt,
                  max(CASE WHEN term IN ({_GATE_STOPS_IN}) THEN 1 ELSE 0 END)
                    AS has_stop
           FROM pt GROUP BY 1),
    ok AS (SELECT doc_id FROM pd
           WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
             AND n_chars * 10 // n_tokens
                 BETWEEN {MIN_MEAN_LEN_X10} AND {MAX_MEAN_LEN_X10}
             AND has_stop = 1
             AND modal_cnt * 100 <= n_tokens * {MAX_MODAL_PCT}),
    gated AS (SELECT t.doc_id, t.text, t.n_toks FROM tokd t JOIN ok USING (doc_id)),
    ex_keep AS (SELECT min(doc_id) AS doc_id
                FROM (SELECT doc_id, md5(text) AS h FROM gated) GROUP BY h),
    s3 AS (SELECT g.doc_id, g.text, g.n_toks FROM gated g JOIN ex_keep USING (doc_id)),
    fp_keep AS (SELECT min(doc_id) AS doc_id
                FROM (SELECT doc_id,
                             md5(array_to_string(list_sort(list_distinct({_TOKS_SQL})), ' '))
                               AS fp
                      FROM s3) GROUP BY fp),
    s4 AS (SELECT s.doc_id, s.n_toks FROM s3 s JOIN fp_keep USING (doc_id))
    SELECT * FROM (
      SELECT 0 AS stage_ord, 'raw' AS stage,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM tokd
      UNION ALL
      SELECT 1, 'gated', CAST(count(*) AS BIGINT), CAST(sum(n_toks) AS BIGINT) FROM gated
      UNION ALL
      SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT), CAST(sum(n_toks) AS BIGINT) FROM s3
      UNION ALL
      SELECT 3, 'fingerprint_dedup', CAST(count(*) AS BIGINT), CAST(sum(n_toks) AS BIGINT) FROM s4)
    """,
    doc="the curation pipeline end-to-end as ONE query with per-stage "
    "survivor counts (the report every filtering run produces): quality "
    "gates -> exact dedup keepers -> fingerprint dedup keepers, each stage "
    "feeding the next; composes quality_gates + exact_dedup + "
    "fingerprint_dedup unchanged",
)
def tx_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import token_count
    from ..operators.dedup import exact_dedup, fingerprint_dedup

    corpus = _corpus(spark, sf).withColumn("n_toks", token_count(F.col("text")))
    ok = quality_gates(corpus, "doc_id", "text").where("passed").select("doc_id")
    gated = corpus.join(ok, "doc_id")
    ex_keep = exact_dedup(gated, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("is_ex")
    )
    s3 = gated.join(ex_keep, "doc_id")
    fp_keep = fingerprint_dedup(s3, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("is_fp")
    )
    # one flags table, ONE evaluation: per-doc survival booleans left-joined
    # onto the corpus, then a single conditional aggregation unpivoted with
    # stack() — the naive form (four unioned agg branches, each re-deriving
    # gates+dedups from scratch) re-ran the whole pipeline per stage and
    # measured 39s at sf0.01 vs ~3s for this shape.
    flags = (
        corpus.join(ok.withColumn("is_gated", F.lit(True)), "doc_id", "left")
        .join(ex_keep, "doc_id", "left")
        .join(fp_keep, "doc_id", "left")
        .select(
            "n_toks",
            F.coalesce("is_gated", F.lit(False)).alias("g"),
            F.coalesce("is_ex", F.lit(False)).alias("e"),
            F.coalesce("is_fp", F.lit(False)).alias("p"),
        )
    )
    agg = flags.agg(
        F.count("*").alias("d0"),
        F.sum("n_toks").alias("t0"),
        F.count_if(F.col("g")).alias("d1"),
        F.sum(F.when(F.col("g"), F.col("n_toks")).otherwise(0)).alias("t1"),
        F.count_if(F.col("g") & F.col("e")).alias("d2"),
        F.sum(F.when(F.col("g") & F.col("e"), F.col("n_toks")).otherwise(0)).alias("t2"),
        F.count_if(F.col("g") & F.col("e") & F.col("p")).alias("d3"),
        F.sum(F.when(F.col("g") & F.col("e") & F.col("p"), F.col("n_toks")).otherwise(0)).alias(
            "t3"
        ),
    )
    return agg.selectExpr(
        """stack(4,
             0, 'raw', d0, t0,
             1, 'gated', d1, t1,
             2, 'exact_dedup', d2, t2,
             3, 'fingerprint_dedup', d3, t3)
           AS (stage_ord, stage, n_docs, n_tokens)"""
    )


# --------------------------------------------------------------------------
# quality-weighted sampling + snapshot upsert (batch MERGE)
# --------------------------------------------------------------------------

# quality composite from the single-source template (functions/text.py),
# instantiated over raw `text` (no CTE aliases available here)
_QUALITY_SQL = QUALITY_SQL_TEMPLATE.format(
    n_toks=f"len({_TOKS_SQL})",
    punct=r"(len(regexp_extract_all(text, '[^\w\s]')) / greatest(length(text), 1))",
    atl=(
        f"(list_sum(list_transform({_TOKS_SQL}, x -> length(x)))"
        f" / greatest(len({_TOKS_SQL}), 1))"
    ),
)


@register(
    "tx_weighted_sample",
    rf"""
    WITH t AS (SELECT doc_id, source, {_QUALITY_SQL} AS quality FROM documents)
    SELECT doc_id, source, quality FROM t
    WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':w1'), 1, 15))::BIGINT % 10000
          < quality * 10000 // 100
    """,
    doc="quality-weighted deterministic sampling: keep probability = "
    "quality/100, decided by the portable content-hash rule (pure function "
    "of doc_id+salt+weight — re-runs on re-sharded data keep exactly the "
    "same documents, no RNG state anywhere)",
)
def tx_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import quality_score
    from ..operators.sampling import weighted_hash_sample

    d = load_table(spark, sf, "documents").withColumn(
        "quality", quality_score(F.col("text"))
    )
    return weighted_hash_sample(d, "doc_id", "quality", 100, salt="w1").select(
        "doc_id", "source", "quality"
    )


@register(
    "u_upsert_snapshot",
    r"""
    WITH snap AS (
      SELECT c_custkey AS key, c_name AS name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer),
    mx AS (SELECT max(c_custkey) AS mx FROM customer),
    changes AS (
      SELECT c_custkey AS key, c_name AS name_new,
             CAST(round(c_acctbal * 100) AS BIGINT) + 10000 AS bal_new
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT mx + 1 + s_suppkey, s_name,
             CAST(round(s_acctbal * 100) AS BIGINT)
      FROM supplier CROSS JOIN mx)
    SELECT coalesce(s.key, c.key) AS key,
           coalesce(c.name_new, s.name) AS name,
           coalesce(c.bal_new, s.bal_cents) AS bal_cents,
           CASE WHEN c.key IS NULL THEN 'keep'
                WHEN s.key IS NULL THEN 'insert'
                ELSE 'update' END AS op
    FROM snap s FULL OUTER JOIN changes c ON s.key = c.key
    """,
    doc="batch MERGE/upsert: apply a changes table (updates + inserts) onto "
    "a snapshot via ONE full-outer equi-join with coalesce resolution and a "
    "per-row op verdict — the SCD-style snapshot-maintenance pattern for "
    "stores without a MERGE primitive; integer cents avoid float-rounding "
    "divergence. Insert keys offset by max(c_custkey) (broadcast 1-row "
    "aggregate), so the insert range is disjoint from the update range at "
    "ANY scale factor — a fixed offset collides once custkey outgrows it, "
    "at which point the full-outer join fans out duplicate keys",
)
def u_upsert_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    snap = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    cust_updates = (
        load_table(spark, sf, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name_new"),
            (F.round(F.col("c_acctbal") * 100).cast("long") + 10000).alias("bal_new"),
        )
    )
    mx = load_table(spark, sf, "customer").agg(F.max("c_custkey").alias("mx"))
    supp_inserts = (
        load_table(spark, sf, "supplier")
        .crossJoin(F.broadcast(mx))
        .select(
            # +1: s_suppkey is 0-based, so mx + s_suppkey would collide
            # with the snapshot's max key on the first supplier
            (F.col("mx") + 1 + F.col("s_suppkey")).alias("key"),
            F.col("s_name").alias("name_new"),
            F.round(F.col("s_acctbal") * 100).cast("long").alias("bal_new"),
        )
    )
    changes = cust_updates.unionByName(supp_inserts)
    merged = snap.withColumn("in_snap", F.lit(True)).join(
        changes.withColumn("in_chg", F.lit(True)), "key", "full_outer"
    )
    return merged.select(
        "key",
        F.coalesce("name_new", "name").alias("name"),
        F.coalesce("bal_new", "bal_cents").alias("bal_cents"),
        F.when(F.col("in_chg").isNull(), "keep")
        .when(F.col("in_snap").isNull(), "insert")
        .otherwise("update")
        .alias("op"),
    )


@register(
    "u_snapshot_diff",
    r"""
    WITH v0 AS (
      SELECT c_custkey AS key,
             md5(c_name || '|' || c_mktsegment || '|' ||
                 CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR))
               AS row_hash
      FROM customer),
    v1src AS (
      SELECT c_custkey, c_name, c_mktsegment,
             CASE WHEN c_custkey % 7 = 0
                  THEN CAST(round(c_acctbal * 100) AS BIGINT) + 1
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS bal
      FROM customer WHERE c_custkey % 13 <> 0),
    v1 AS (
      SELECT c_custkey AS key,
             md5(c_name || '|' || c_mktsegment || '|' || CAST(bal AS VARCHAR))
               AS row_hash
      FROM v1src
      UNION ALL
      SELECT (SELECT max(c_custkey) FROM customer) + 1 + s_suppkey,
             md5(s_name || '|' || CAST(s_nationkey AS VARCHAR) || '|' ||
                 CAST(CAST(round(s_acctbal * 100) AS BIGINT) AS VARCHAR))
      FROM supplier),
    diff AS (
      SELECT coalesce(a.key, b.key) AS key,
             CASE WHEN a.key IS NULL THEN 'added'
                  WHEN b.key IS NULL THEN 'removed'
                  WHEN a.row_hash <> b.row_hash THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v0 a FULL OUTER JOIN v1 b ON a.key = b.key)
    SELECT status, count(*) AS n_keys,
           CAST(sum(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT
                    % 1000003) AS BIGINT) AS key_checksum
    FROM diff GROUP BY status
    """,
    doc="snapshot/table-version diff — the data-versioning primitive "
    "(what changed between corpus v0 and v1): per-key row-content hashes "
    "compared through ONE full-outer equi-join, classified "
    "added/removed/changed/unchanged, reported as per-status counts plus "
    "an order-free key checksum (sum of bounded per-key hashes — "
    "mergeable-monoid state, so no collect_list and no per-status key "
    "materialization at any scale; the 16-byte row hashes mean row "
    "CONTENT never rides the shuffle, same argument as dd_exact). v1 is "
    "derived deterministically: every 13th key removed, every 7th "
    "balance bumped, suppliers appended as inserts",
)
def u_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    def row_hash(name, addr, bal_cents):
        return F.md5(F.concat_ws("|", name, addr, bal_cents.cast("string")))

    cust = load_table(spark, sf, "customer")
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    v0 = cust.select(
        F.col("c_custkey").alias("key"),
        row_hash(F.col("c_name"), F.col("c_mktsegment"), bal).alias("row_hash"),
    )
    v1_cust = cust.where(F.col("c_custkey") % 13 != 0).select(
        F.col("c_custkey").alias("key"),
        row_hash(
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.when(F.col("c_custkey") % 7 == 0, bal + 1).otherwise(bal),
        ).alias("row_hash"),
    )
    mx = cust.agg(F.max("c_custkey").alias("mx"))
    v1_supp = (
        load_table(spark, sf, "supplier")
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("mx") + 1 + F.col("s_suppkey")).alias("key"),
            row_hash(
                F.col("s_name"),
                F.col("s_nationkey").cast("string"),
                F.round(F.col("s_acctbal") * 100).cast("long"),
            ).alias("row_hash"),
        )
    )
    v1 = v1_cust.unionByName(v1_supp)
    diff = (
        v0.select("key", F.col("row_hash").alias("h0"))
        .join(v1.select("key", F.col("row_hash").alias("h1")), "key", "full_outer")
        .select(
            "key",
            F.when(F.col("h0").isNull(), "added")
            .when(F.col("h1").isNull(), "removed")
            .when(F.col("h0") != F.col("h1"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
    )
    # per-key term reduced mod a ~1e6 prime so the int64 SUM stays in
    # range to ~1e12 keys per status (2^31-sized terms overflow there)
    key_h = F.expr(
        f"{HASH64_SQL.format(x='cast(key as string)')} % 1000003"
    )
    return diff.groupBy("status").agg(
        F.count("*").alias("n_keys"),
        F.sum(key_h).cast("long").alias("key_checksum"),
    )


# --------------------------------------------------------------------------
# BPE tokenizer training (merge-rule learning)
# --------------------------------------------------------------------------

_BPE_ROUNDS = 6


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE merge loop as DuckDB CTEs, mirroring the Spark
    operator round for round. Per round over s{r}(w_id, pos, sym, cnt):

      p{r}    adjacent-pair counts weighted by word frequency (lead window)
      best{r} argmax pair, ties by (a, b) string order — deterministic
      h/i/t   EXACT greedy left-to-right merge application: hit rows mark
              pair starts; consecutive hits form islands (gaps-and-islands
              via pos - running hit count); within an island greedy takes
              every ODD occurrence (1st, 3rd, ...) — precisely the
              non-overlapping leftmost selection real BPE trainers apply
              (a string replace() can't do this: a replace consumes the
              shared boundary and de-syncs on odd runs like 'aaaa')
      s{r+1}  taken rows become the merged symbol, their right halves
              drop, positions renumber

    The multiply-referenced CTEs (s{r} feeds pair counting AND merge
    application; best{r} is read five times) are AS MATERIALIZED —
    without it DuckDB inlines each reference and the plan grows ~10x per
    round (measured: 4 rounds 2.2s, 6 rounds >150s; materialized, 6
    rounds run in 0.23s). The Spark operator gets the same linearity from
    its per-round localCheckpoint + 1-row argmax collect."""
    final = "\n    UNION ALL ".join(
        f"SELECT {r + 1} AS rnd, a AS lft, b AS rgt, CAST(pc AS BIGINT) AS pair_count FROM best{r}"
        for r in range(rounds)
    )
    return _bpe_with_block(_bpe_round_ctes(rounds)) + final + "\n    "


def _bpe_round_ctes(rounds: int) -> list[str]:
    """Per-round CTE chain shared by the training and encode oracles:
    p{r}/best{r} learn round r's rule, h/i/t/s{r+1} apply it (see
    :func:`_bpe_oracle` for the semantics of each step)."""
    ctes = []
    for r in range(rounds):
        ctes.append(f"""
    p{r} AS (
      SELECT a, b, sum(cnt) AS pc FROM (
        SELECT sym AS a,
               lead(sym) OVER (PARTITION BY w_id ORDER BY pos) AS b, cnt
        FROM s{r}) x
      WHERE b IS NOT NULL GROUP BY a, b),
    best{r} AS MATERIALIZED (
      SELECT a, b, pc FROM p{r} ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
    h{r} AS (
      SELECT w_id, pos, sym, cnt,
             CASE WHEN sym = (SELECT a FROM best{r})
                   AND lead(sym) OVER (PARTITION BY w_id ORDER BY pos)
                       = (SELECT b FROM best{r}) THEN 1 ELSE 0 END AS hit
      FROM s{r}),
    i{r} AS (
      SELECT w_id, pos, sym, cnt, hit,
             pos - sum(hit) OVER (PARTITION BY w_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS island
      FROM h{r}),
    t{r} AS (
      SELECT w_id, pos, sym, cnt, hit,
             CASE WHEN hit = 1 AND (row_number() OVER (
                    PARTITION BY w_id, island, hit ORDER BY pos)) % 2 = 1
                  THEN 1 ELSE 0 END AS taken
      FROM i{r}),
    s{r + 1} AS MATERIALIZED (
      SELECT w_id,
             row_number() OVER (PARTITION BY w_id ORDER BY pos) AS pos,
             CASE WHEN taken = 1
                  THEN (SELECT a FROM best{r}) || (SELECT b FROM best{r})
                  ELSE sym END AS sym,
             cnt
      FROM (SELECT w_id, pos, sym, cnt, taken,
                   coalesce(lag(taken) OVER (PARTITION BY w_id ORDER BY pos),
                            0) AS prev_taken
            FROM t{r}) y
      WHERE prev_taken = 0)""")
    return ctes


def _bpe_with_block(ctes: list[str]) -> str:
    return f"""
    WITH words AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest({_TOKS_SQL}) AS w FROM documents) t
      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
    s0 AS MATERIALIZED (
      SELECT w AS w_id, CAST(i AS BIGINT) AS pos, w[i] AS sym, cnt
      FROM words, unnest(range(1, length(w) + 1)) AS u(i)),
    {",".join(ctes)}
    """


def _bpe_encode_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE ENCODE as DuckDB CTEs: the same training rounds as
    :func:`_bpe_oracle` (each round's argmax rule = the rule the Spark side
    learns from the same corpus, deterministic tie-break) but the final
    select reads s{rounds} — the symbol table AFTER all ``rounds`` rules
    applied (training skips the last application; the CTE chain already
    emits it) — aggregated to corpus token frequencies."""
    return (
        _bpe_with_block(_bpe_round_ctes(rounds))
        + f"""SELECT sym AS token, CAST(count(*) AS BIGINT) AS n_positions,
           CAST(sum(cnt) AS BIGINT) AS occurrences
    FROM s{rounds} GROUP BY sym ORDER BY token
    """
    )


@register(
    "tx_bpe_merges",
    _bpe_oracle(),
    doc="BPE tokenizer training — learn the first 6 merge rules from "
    "corpus word frequencies (the Sennrich'16 algorithm): per round, "
    "count adjacent symbol pairs weighted by word count, take the argmax "
    "(deterministic tie-break), apply the merge with EXACT greedy "
    "leftmost non-overlapping semantics via gaps-and-islands windows "
    "(operators/bpe.py). 100 TB shape: only the word-count groupBy "
    "touches the corpus (one shuffle on word, text never moves); every "
    "merge round operates on the VOCAB table (bounded by distinct words, "
    "~millions at web scale) with per-word windows — short partitions, "
    "no skew; driver state = one (pair, count) row per round. Oracle = "
    "the same rounds unrolled as materialized DuckDB CTEs",
)
def tx_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.bpe import bpe_merges

    return bpe_merges(load_table(spark, sf, "documents"), "text", rounds=_BPE_ROUNDS)


@register(
    "tx_bpe_encode",
    _bpe_encode_oracle(),
    doc="BPE tokenizer APPLICATION — tokenize the corpus with the learned "
    "merge rules (the half a pipeline actually runs at scale, consuming "
    "tx_bpe_merges' output): operators/bpe.py:bpe_encode applies each "
    "rule in rnd order with the SAME greedy leftmost non-overlapping "
    "gaps-and-islands transform the trainer used (shared _apply_merge — "
    "learned rules and their application can never drift), over the "
    "DISTINCT-WORD symbol table, per round localCheckpoint-ed so plan "
    "depth stays O(1) in rules (32-round demo: tests/test_bpe_rounds.py). "
    "100 TB shape: one corpus word-count groupBy, then vocab-bounded "
    "window rounds; the driver holds only the bounded rule list. Output "
    "= corpus token frequencies (count over distinct-word positions, sum "
    "weighted by word frequency); oracle = the training CTE chain read at "
    "s{rounds}, the post-application symbol table",
)
def tx_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.bpe import bpe_encode, bpe_merges

    docs = load_table(spark, sf, "documents")
    rules = bpe_merges(docs, "text", rounds=_BPE_ROUNDS)
    enc = bpe_encode(docs, "text", rules)
    return (
        enc.groupBy(F.col("sym").alias("token"))
        .agg(F.count("*").alias("n_positions"), F.sum("cnt").alias("occurrences"))
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# analytics breadth: TPC-H Q18 shape + sliding-window distinct users
# --------------------------------------------------------------------------


@register(
    "tpch_q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
    SELECT c_custkey, c_name, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape (large-volume customers): HAVING-filtered "
    "aggregate drives the join — the fact table reduces FIRST (groupBy "
    "with map-side partials + having), then only the surviving keys join "
    "orders/customer; the selective aggregate side broadcasts under AQE",
)
def tpch_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_d"))
        .where(F.col("qty_d") > 300)
        .select("l_orderkey", F.col("qty_d").cast("long").alias("qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            "qty",
        )
    )


@register(
    "a_wau_sliding",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
                FROM events),
    ex AS (SELECT user_id, day + i::INTEGER AS wend
           FROM ud, unnest(range(0, 7)) AS t(i)),
    days AS (SELECT DISTINCT day AS wend FROM ud)
    SELECT strftime(wend, '%Y-%m-%d') AS window_end,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM ex JOIN days USING (wend)
    GROUP BY wend
    """,
    doc="7-day sliding distinct users (WAU) via the explode-to-windows "
    "trick: each distinct (user, day) row replicates into the 7 windows it "
    "belongs to, turning a sliding DISTINCT — which has no native window "
    "form — into one plain groupBy-distinct; cost is a bounded 7x on the "
    "already-deduped (user, day) table, never a per-window re-scan of raw "
    "events. Window ends are restricted to observed days (no partial "
    "phantom windows past the data)",
)
def a_wau_sliding(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    ex = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("wend"),
    )
    days = ud.select(F.col("day").alias("wend")).distinct()
    return (
        ex.join(days, "wend", "left_semi")
        .groupBy("wend")
        .agg(F.count_distinct("user_id").alias("wau"))
        .select(F.date_format("wend", "yyyy-MM-dd").alias("window_end"), "wau")
    )


# --------------------------------------------------------------------------
# vector aggregation: per-source embedding centroids (mean-pooling)
# --------------------------------------------------------------------------


@register(
    "sim_source_centroids",
    """
    WITH j AS (
      SELECT d.source, e.embedding
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
    ex AS (
      SELECT source, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
      FROM j, unnest(range(1, len(embedding) + 1)) AS t(i)),
    agg AS (SELECT source, pos, CAST(sum(q) AS BIGINT) AS s,
                   count(*) AS n FROM ex GROUP BY 1, 2)
    SELECT source, CAST(pos AS INT) AS pos, s // n AS centroid_fp FROM agg
    """,
    doc="per-group embedding centroid (mean-pooling — the vector-column "
    "GROUP BY primitive behind class prototypes / per-domain embedding "
    "drift reports): posexplode to (group, dim, component) rows, ONE "
    "groupBy with map-side partial sums. Components are quantized to "
    "1e-6 fixed-point BEFORE summation: float addition is order-dependent "
    "and a distributed sum has no deterministic order, so only the "
    "integer-sum form can hash identically across engines AND across "
    "partitionings (the ml_kmeans determinism argument)",
)
def sim_source_centroids(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    d = load_table(spark, sf, "documents").select("doc_id", "source")
    j = e.join(d, e.vec_id == d.doc_id).select("source", "embedding")
    ex = j.select(
        "source",
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "source",
        "pos",
        # floor(x*1e6 + 0.5), NOT round(): round() tie-breaking differs
        # across engines (registry dtype contract); floor is bit-identical
        # explicit widen to DOUBLE first: float*int promotion differs
        # between engines, and a single-precision product can floor to a
        # different integer near a boundary
        F.floor(F.col("x").cast("double") * 1000000 + 0.5).cast("long").alias("q"),
    )
    return (
        ex.groupBy("source", "pos")
        .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
        .select("source", "pos", F.expr("s div n").alias("centroid_fp"))
    )


# --------------------------------------------------------------------------
# time-series gap fill + join-key skew report
# --------------------------------------------------------------------------


@register(
    "t_gap_fill",
    """
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                      date_trunc('hour', max(ts)) AS h1 FROM events),
    hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS cnt
               FROM events GROUP BY 1, 2)
    SELECT CAST(h AS VARCHAR) AS hour, event_type,
           CAST(coalesce(cnt, 0) AS BIGINT) AS cnt
    FROM hours CROSS JOIN types LEFT JOIN hourly USING (h, event_type)
    """,
    doc="time-series densification: a generated calendar spine (hour range "
    "x distinct types — sequence/explode, no data shuffle to build it) "
    "LEFT JOINs the rollup so silent gaps become explicit zero rows; the "
    "prerequisite for correct moving averages and alerting downstream",
)
def t_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = span.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    types = ev.select("event_type").distinct()
    return (
        hours.crossJoin(F.broadcast(types))
        .join(hourly, ["h", "event_type"], "left")
        .select(
            F.col("h").cast("string").alias("hour"),
            "event_type",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )


@register(
    "a_skew_report",
    """
    WITH per_key AS (SELECT o_custkey AS k, count(*) AS cnt
                     FROM orders GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           CAST(sum(cnt) AS BIGINT) * 100 // count(*) AS mean_cnt_x100,
           CAST(max(cnt) AS BIGINT) * 10000 // CAST(sum(cnt) AS BIGINT)
             AS top1_share_bp
    FROM per_key
    """,
    doc="join-key skew diagnostic over orders.o_custkey: key count, max "
    "per-key multiplicity, integer mean, and the hottest key's share in "
    "basis points — the measurement that decides between a plain shuffle "
    "join, AQE skew handling, and explicit two-path salting "
    "(partitioning.salted_join)",
)
def a_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    per_key = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("cnt"))
    )
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.expr("sum(cnt) * 100 div count(*)").alias("mean_cnt_x100"),
        F.expr("max(cnt) * 10000 div sum(cnt)").alias("top1_share_bp"),
    )


# --------------------------------------------------------------------------
# statistical LM scoring (KenLM-filter stand-in)
# --------------------------------------------------------------------------


@register(
    "tx_lm_score",
    rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 2),
    ex AS (
      SELECT doc_id,
             md5(u.w1 || ' ' || u.w2) AS bg_h,
             md5(u.w1) AS un_h
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> {{'w1': toks[i], 'w2': toks[i+1]}}))
                     AS u
            FROM d2)),
    bgc AS (SELECT bg_h, count(*) AS c_bg FROM ex GROUP BY 1),
    unc AS (SELECT un_h, count(*) AS c_un FROM ex GROUP BY 1),
    scored AS (
      SELECT doc_id, c_bg * 1000000 // c_un AS p_fp
      FROM ex JOIN bgc USING (bg_h) JOIN unc USING (un_h))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(sum(p_fp) AS BIGINT) // count(*) AS BIGINT) AS lm_score_fp
    FROM scored GROUP BY doc_id
    """,
    doc="statistical LM quality score (the KenLM-filter stand-in): mean "
    "bigram continuation probability of each doc under the corpus's own "
    "bigram statistics, integer fixed-point 1e6 — no log-space floats, so "
    "bit-identical across engines; md5-keyed count joins shuffle 16-byte "
    "hashes, never text",
)
def tx_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.lmscore import lm_score

    return lm_score(load_table(spark, sf, "documents"), "doc_id", "text")


# --------------------------------------------------------------------------
# TPC-H breadth: Q10 (returned-items revenue) and Q19 (disjunctive pushdown)
# --------------------------------------------------------------------------


@register(
    "tpch_q10_returns",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-items revenue): returnflag + date-range "
    "filters push to the scans, customer dim broadcasts, top-20 is "
    "TakeOrderedAndProject. Per-ROW integer cents before the sum (not "
    "round-after-sum): a distributed double sum is order-dependent, the "
    "integer sum is exact at any parallelism",
)
def tpch_q10_returns(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn(
            "cents",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("cents").alias("revenue_cents"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape (disjunctive predicates): Catalyst splits the "
    "OR-of-ANDs, pushing the common-column disjunctions (brand/size to the "
    "part scan, quantity to the lineitem scan) below the join so both "
    "sides shrink before shuffling — the classic pushdown-through-OR test",
)
def tpch_q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return joined.where(cond).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        ).alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------
# multimodal: frame-level video near-dup (perceptual-hash shape)
# --------------------------------------------------------------------------


@register(
    "mm_video_neardup",
    rf"""
    WITH corpus AS ({_CORPUS_SQL}),
    frames AS (
      SELECT doc_id, md5(text || CAST(frame_idx AS VARCHAR)) AS frame_md5
      FROM (SELECT doc_id, text,
                   unnest(range(0, CAST(doc_id % 7 + 1 AS INT), 2)) AS frame_idx
            FROM corpus)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_frames
      FROM frames a JOIN frames b USING (frame_md5)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(shared_frames AS BIGINT) AS shared_frames
    FROM pairs
    """,
    doc="frame-level video near-dup (the perceptual-hash dedup shape): "
    "sampled-frame fingerprints equi-join across media assets, pairs "
    "ranked by shared-frame count — candidates come from the frame-hash "
    "join, never an asset×asset product; with a real codec the md5 "
    "stand-in becomes a pHash and the join key a pHash band",
)
def mm_video_neardup(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import attach_media, sample_frames

    # attach_media reads n_chars for the width/height metadata (unused by
    # frame sampling); the planted corpus carries only (doc_id, text)
    corpus = _corpus(spark, sf).withColumn("n_chars", F.length("text"))
    frames = sample_frames(attach_media(corpus), stride=2).select("doc_id", "frame_md5")
    a = frames.select(F.col("doc_id").alias("doc_a"), "frame_md5")
    b = frames.select(F.col("doc_id").alias("doc_b"), "frame_md5")
    return (
        a.join(b, "frame_md5")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        # every pair in the output co-occurs by construction (the groupBy
        # count is >= 1); shared_frames is the RANKING signal — a caller
        # thresholds it per-codec (real pHash would demand >= 2-3
        # corroborating frames; the md5 stand-in has no hash noise)
        .agg(F.count("*").alias("shared_frames"))
    )


# --------------------------------------------------------------------------
# UDF-surface completion: GROUPED_AGG pandas_udf + relational RLE
# --------------------------------------------------------------------------


@register(
    "a_trimmed_mean_grouped",
    """
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents WHERE n_chars IS NOT NULL)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(CAST(sum(n_chars) AS BIGINT) // count(*) AS BIGINT)
             AS trimmed_mean
    FROM r
    WHERE rk > n // 10 AND rk <= n - n // 10
    GROUP BY lang
    """,
    doc="10% trimmed mean of doc length per language via a GROUPED_AGG "
    "pandas_udf (the one Arrow UDF kind the surface matrix lacked): each "
    "group's values arrive as ONE Arrow-backed pandas Series, the trim is "
    "numpy-side, one scalar returns per group. The DuckDB twin ranks with "
    "windows and drops floor(n/10) from each end; ties broken by doc_id "
    "ordering in BOTH engines so the trimmed multiset is identical",
)
def a_trimmed_mean_grouped(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.grouped_agg import trimmed_count_10pct, trimmed_mean_10pct

    # NULLs excluded up front: pandas sum() skips NaN (an all-NULL group
    # would yield 0 where SQL yields NULL) — filter in BOTH engines instead
    d = load_table(spark, sf, "documents").where(F.col("n_chars").isNotNull())
    # the UDF sorts by VALUE only, so the kept multiset is well-defined
    # whatever the doc_id tie order — the oracle's doc_id tiebreak merely
    # fixes WHICH equal values are dropped, which cannot change the sum
    return (
        d.groupBy("lang")
        .agg(
            trimmed_count_10pct(F.col("n_chars")).alias("n_kept"),
            trimmed_mean_10pct(F.col("n_chars")).alias("trimmed_mean"),
        )
        .select("lang", "n_kept", "trimmed_mean")
    )


@register(
    "a_rle_runs",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM s),
    runs AS (
      SELECT user_id, event_type,
             sum(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged)
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
           event_type, CAST(count(*) AS BIGINT) AS run_len
    FROM runs GROUP BY 1, 2, 3
    """,
    doc="run-length encoding of each user's event-type sequence — the "
    "classic gaps-and-islands shape done relationally (lag flags run "
    "starts, a running sum numbers runs, one groupBy collapses them): "
    "two windows over ONE (user, time) sort + one aggregation, no "
    "per-row Python anywhere",
)
def a_rle_runs(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    # the run-numbering window MUST replay the same (ts, event_id) order
    # as the lag window — ordering by a different tiebreak would renumber
    # runs when a user has multiple events at one timestamp
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = flagged.withColumn("run_id", F.sum("is_start").over(w2))
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        F.count("*").alias("run_len")
    )


@register(
    "a_lis_per_user",
    """
    WITH RECURSIVE e AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events WHERE value IS NOT NULL),
    edges AS (
      SELECT a.user_id, a.pos AS i, b.pos AS j
      FROM e a JOIN e b USING (user_id)
      WHERE b.pos > a.pos AND b.value > a.value),
    walk(user_id, pos, len) AS (
      SELECT user_id, pos, 1 FROM e
      UNION
      SELECT w.user_id, ed.j, w.len + 1
      FROM walk w JOIN edges ed ON ed.user_id = w.user_id AND ed.i = w.pos),
    n AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY 1),
    l AS (SELECT user_id, max(len) AS lis_len FROM walk GROUP BY 1)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(lis_len AS BIGINT) AS lis_len
    FROM n JOIN l USING (user_id)
    """,
    doc="per-user longest strictly-increasing subsequence of event values "
    "— batch applyInPandas (grouped map, the last uncovered Arrow UDF "
    "kind): patience sorting in Python per group, because no algebraic "
    "aggregate or window expresses LIS; still fully VALUE-checked against "
    "a recursive-CTE DP oracle (bounded state: (pos, len) pairs dedup "
    "under UNION). Values are compared, never operated on, so float "
    "parity is exact",
)
def a_lis_per_user(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.grouped_agg import lis_per_group

    # NULL values are excluded in BOTH engines: NaN through bisect_left
    # corrupts the patience tails, and SQL comparisons are NULL-safe false
    ev = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    return lis_per_group(ev, "user_id", ["ts", "event_id"], "value")


# --------------------------------------------------------------------------
# graph analytics: triangle counting (oriented-edge relational form)
# --------------------------------------------------------------------------


@register(
    "g_triangle_count",
    rf"""
    WITH mh AS ({_minhash_oracle_ref()}),
    deg AS (SELECT x, count(*) AS d
            FROM (SELECT doc_a AS x FROM mh UNION ALL SELECT doc_b FROM mh)
            GROUP BY 1),
    o AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND doc_a < doc_b)
                  THEN doc_a ELSE doc_b END AS s,
             CASE WHEN da.d < db.d OR (da.d = db.d AND doc_a < doc_b)
                  THEN doc_b ELSE doc_a END AS t
      FROM mh JOIN deg da ON da.x = doc_a JOIN deg db ON db.x = doc_b)
    SELECT CAST((SELECT count(*) FROM o) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM o e1 JOIN o e2 ON e2.s = e1.t
                           JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t)
             AS BIGINT) AS n_triangles
    """,
    doc="triangle counting over the MinHash near-dup pair graph — the "
    "dedup-QA cohesion metric (triangles = mutually-verified triples; a "
    "candidate cluster whose pairs don't close into triangles is LSH "
    "noise, not a duplicate group). Edges come from the LSH band join, so "
    "the graph is SPARSE at any scale by construction — unlike a "
    "co-purchase projection, which this query originally used and which "
    "is near-complete on random purchasing data (measured 31s at sf0.1 "
    "for a meaningless count). Orientation is DEGREE-ORDERED (lower "
    "(deg, id) -> higher), the standard bound: out-degrees <= O(sqrt E), "
    "so two-hop candidates are O(E^1.5) on ANY graph, where id-ordering "
    "alone degrades to sum(deg^2) on skewed graphs; each triangle is "
    "still found exactly once (the order is total)",
)
def g_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    # eager_cache (r18): the (tiny) pair table fans out to THREE consumers
    # (degree census twice via the union, plus the orientation join) under
    # one action — without eager materialization each concurrent stage
    # re-runs the LSH band-join + verify pipeline
    from ..partitioning import eager_cache

    pairs = eager_cache(
        minhash_lsh_pairs(
            _corpus(spark, sf), "doc_id", "text", n=3, k=16, bands=4, threshold=0.4
        ).select("doc_a", "doc_b")
    )
    deg = (
        pairs.select(F.col("doc_a").alias("x"))
        .unionByName(pairs.select(F.col("doc_b").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    keyed = (
        pairs.join(deg.select(F.col("x").alias("doc_a"), F.col("d").alias("da")), "doc_a")
        .join(deg.select(F.col("x").alias("doc_b"), F.col("d").alias("db")), "doc_b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("doc_a") < F.col("doc_b"))
    )
    # eager (r18): o fans out to four consumers (n_edges, e2, e3, tri)
    # under the final action — a lazy persist would recompute the
    # orientation join once per concurrent stage
    o = eager_cache(
        keyed.select(
            F.when(fwd, F.col("doc_a")).otherwise(F.col("doc_b")).alias("s"),
            F.when(fwd, F.col("doc_b")).otherwise(F.col("doc_a")).alias("t"),
        )
    )
    n_edges = o.agg(F.count("*").alias("n_edges"))
    e2 = o.select(F.col("s").alias("t"), F.col("t").alias("w"))
    e3 = o.select(F.col("s").alias("s3"), F.col("t").alias("w3"))
    tri = (
        o.join(e2, "t")
        .join(e3, (F.col("s") == F.col("s3")) & (F.col("w") == F.col("w3")))
        .agg(F.count("*").alias("n_triangles"))
    )
    return n_edges.crossJoin(tri)


# --------------------------------------------------------------------------
# sketch algebra: HLL inclusion-exclusion intersection (audience overlap)
# --------------------------------------------------------------------------


def _hll_intersect_oracle(type_a: str = "click", type_b: str = "view") -> str:
    from ..operators.sketches import hll_estimate_sql, hll_sketch_sql

    def tok_side(tag: str, etype: str) -> str:
        return f"""tok_{tag} AS (
      SELECT DISTINCT user_id::VARCHAR || '@' ||
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS tok
      FROM events WHERE event_type = '{etype}')"""

    return f"""
    WITH {tok_side('a', type_a)},
    {tok_side('b', type_b)},
    {hll_sketch_sql('tok_a', 'a')},
    {hll_sketch_sql('tok_b', 'b')},
    r_u AS (SELECT bucket, max(rho) AS rho
            FROM (SELECT * FROM r_a UNION ALL SELECT * FROM r_b) GROUP BY 1),
    e AS (SELECT {hll_estimate_sql('r_a')} AS est_a,
                 {hll_estimate_sql('r_b')} AS est_b,
                 {hll_estimate_sql('r_u')} AS est_union),
    t AS (SELECT count(*) AS true_inter
          FROM tok_a JOIN tok_b USING (tok))
    SELECT est_a, est_b, est_union,
           est_a + est_b - est_union AS est_inter,
           CAST(true_inter AS BIGINT) AS true_inter
    FROM e CROSS JOIN t
    """


@register(
    "sk_hll_intersect",
    _hll_intersect_oracle(),
    doc="sketch ALGEBRA: audience overlap (distinct user-days doing "
    "'click' AND 'view') by inclusion-exclusion over three HLL sketches — "
    "|A∩B| ≈ est(A) + est(B) - est(A∪B), where the union sketch is just "
    "the groupBy-max merge of the two (the max-monoid property). At 100 TB "
    "the per-segment sketches are 256-row relations maintained "
    "incrementally; ANY pairwise overlap is then computable without "
    "touching raw data — the thing a plain distinct count can never do. "
    "True intersection reported alongside for the accuracy story",
)
def sk_hll_intersect(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketches import hll_build, hll_estimate

    ev = load_table(spark, sf, "events")

    def side(etype: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .select(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("@"),
                    F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd"),
                ).alias("tok")
            )
            .distinct()
        )

    # eager (r18): each TOKEN set feeds two consumers (its sketch and the
    # exact-intersection join) under one action; lazy persist let the
    # concurrent stages run the events scan + distinct shuffle twice per
    # side (partitioning.eager_cache)
    from ..partitioning import eager_cache

    tok_a, tok_b = eager_cache(side("click")), eager_cache(side("view"))
    sk_a = hll_build(tok_a, "tok").persist()
    sk_b = hll_build(tok_b, "tok").persist()
    sk_u = (
        sk_a.unionByName(sk_b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    est_a = hll_estimate(sk_a).select(F.col("est_distinct").alias("est_a"))
    est_b = hll_estimate(sk_b).select(F.col("est_distinct").alias("est_b"))
    est_u = hll_estimate(sk_u).select(F.col("est_distinct").alias("est_union"))
    true_i = tok_a.join(tok_b, "tok").agg(F.count("*").alias("true_inter"))
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .withColumn("est_inter", F.col("est_a") + F.col("est_b") - F.col("est_union"))
        .crossJoin(true_i)
        .select("est_a", "est_b", "est_union", "est_inter", "true_inter")
    )


# --------------------------------------------------------------------------
# distribution drift report (corpus monitoring)
# --------------------------------------------------------------------------


@register(
    "tx_drift_report",
    rf"""
    WITH tok AS (SELECT doc_id % 2 AS slice, unnest({_TOKS_SQL}) AS token
                 FROM documents),
    c AS (SELECT token,
                 count(*) FILTER (WHERE slice = 0) AS ca,
                 count(*) FILTER (WHERE slice = 1) AS cb
          FROM tok GROUP BY token),
    n AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
          FROM c),
    scored AS (
      SELECT token, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
             abs(CAST(ca AS BIGINT) * 100000 // greatest(na, 1)
                 - CAST(cb AS BIGINT) * 100000 // greatest(nb, 1))
               AS drift_bp10,
             row_number() OVER (ORDER BY ca + cb DESC, token ASC) AS rk
      FROM c CROSS JOIN n)
    SELECT token, ca, cb, drift_bp10 FROM scored WHERE rk <= 20
    """,
    doc="distribution-drift monitor between two corpus slices (the "
    "yesterday-vs-today check a production ingest runs before training): "
    "per-token frequency in each slice and the absolute difference of "
    "their corpus shares in 0.1-basis-points, for the top-20 tokens by "
    "combined count — one conditional-aggregation pass (count FILTER "
    "collapses both slices in a single groupBy, no per-slice scans), "
    "totals broadcast, integer shares so the report hashes identically",
)
def tx_drift_report(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens

    tok = load_table(spark, sf, "documents").select(
        (F.col("doc_id") % 2).alias("slice"), F.explode(_tokens(F.col("text"))).alias("token")
    )
    c = tok.groupBy("token").agg(
        F.count_if(F.col("slice") == 0).alias("ca"),
        F.count_if(F.col("slice") == 1).alias("cb"),
    )
    n = c.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    scored = c.crossJoin(F.broadcast(n)).withColumn(
        # greatest(…, 1): an empty slice must yield share 0 in BOTH engines
        # (Spark's div-by-zero is NULL, DuckDB's // raises — neither is a
        # clean comparison)
        "drift_bp10",
        F.abs(
            F.expr(
                "ca * 100000 div greatest(na, 1) - cb * 100000 div greatest(nb, 1)"
            )
        ),
    )
    # top-k via orderBy().limit() -> TakeOrderedAndProject (per-partition
    # partial top-k), NOT a row_number window, which would force the whole
    # token census through ONE partition's sort at corpus scale
    return (
        scored.orderBy(F.desc(F.col("ca") + F.col("cb")), F.asc("token"))
        .limit(20)
        .select("token", "ca", "cb", "drift_bp10")
    )


# --------------------------------------------------------------------------
# data-quality expectation suite (Great-Expectations-lite)
# --------------------------------------------------------------------------


@register(
    "dq_expectations",
    """
    WITH li AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
               AS null_orderkey,
             CAST(count(*) FILTER (WHERE l_quantity IS NULL) AS BIGINT)
               AS null_quantity,
             CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
               AS BIGINT) AS bad_discount,
             CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT)
               AS bad_price
      FROM lineitem),
    o AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_keys
      FROM orders),
    ri AS (
      SELECT CAST(count(*) AS BIGINT) AS orphan_lineitems
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderkey IS NULL)
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey not_null' AS expectation,
             null_orderkey AS violations, n_rows AS checked,
             null_orderkey = 0 AS passed FROM li
      UNION ALL
      SELECT 'lineitem.l_quantity not_null', null_quantity, n_rows,
             null_quantity = 0 FROM li
      UNION ALL
      SELECT 'lineitem.l_discount in [0,1]', bad_discount, n_rows,
             bad_discount = 0 FROM li
      UNION ALL
      SELECT 'lineitem.l_extendedprice > 0', bad_price, n_rows,
             bad_price = 0 FROM li
      UNION ALL
      SELECT 'orders.o_orderkey unique', n_orders - n_distinct_keys,
             n_orders, n_orders = n_distinct_keys FROM o
      UNION ALL
      SELECT 'lineitem.l_orderkey refs orders', orphan_lineitems,
             (SELECT n_rows FROM li), orphan_lineitems = 0 FROM ri)
    """,
    doc="declarative data-quality expectation suite (the pre-ingest "
    "contract gate): null checks, value-range checks, key uniqueness, and "
    "referential integrity, each reported as (expectation, violations, "
    "checked, passed). All single-table checks collapse into ONE "
    "conditional-aggregation scan per table (count FILTER — no per-check "
    "passes); the RI check is one LEFT ANTI-shaped join. At 100 TB this "
    "is the shape that matters: k expectations cost one scan + one join, "
    "not k jobs",
)
def dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    li_stats = li.agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("l_orderkey").isNull()).alias("null_orderkey"),
        F.count_if(F.col("l_quantity").isNull()).alias("null_quantity"),
        F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("bad_discount"),
        F.count_if(F.col("l_extendedprice") <= 0).alias("bad_price"),
    )
    o_stats = o.agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("o_orderkey").alias("n_distinct_keys"),
    )
    orphans = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    wide = li_stats.crossJoin(o_stats).crossJoin(orphans)
    return wide.selectExpr(
        """stack(6,
             'lineitem.l_orderkey not_null', null_orderkey, n_rows, null_orderkey = 0,
             'lineitem.l_quantity not_null', null_quantity, n_rows, null_quantity = 0,
             'lineitem.l_discount in [0,1]', bad_discount, n_rows, bad_discount = 0,
             'lineitem.l_extendedprice > 0', bad_price, n_rows, bad_price = 0,
             'orders.o_orderkey unique', n_orders - n_distinct_keys, n_orders,
               n_orders = n_distinct_keys,
             'lineitem.l_orderkey refs orders', orphan_lineitems, n_rows,
               orphan_lineitems = 0)
           AS (expectation, violations, checked, passed)"""
    )


# --------------------------------------------------------------------------
# deterministic statistical aggregates: integer-moment Pearson correlation
# --------------------------------------------------------------------------


@register(
    "a_corr_pearson",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)
                      * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxx,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                      * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS syy,
             CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)
                      * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sxy
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, n, sx, sy,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS corr
    FROM m
    """,
    doc="Pearson correlation (price vs quantity per returnflag) from "
    "INTEGER moment sums: the built-in corr() accumulates doubles, whose "
    "sum order differs run-to-run on a distributed engine — this form "
    "sums exact int64 moments (map-side partials, order-free), then does "
    "the final arithmetic in a handful of IEEE double ops (sqrt is "
    "correctly-rounded by IEEE 754, unlike ln) — bit-identical across "
    "engines AND partitionings. Exactness bound: sxx ~ 3e9/row at this "
    "value range, so int64 holds to ~1e9 rows per group; beyond that, "
    "widen the moment sums to decimal(38,0) (still a map-side-partial "
    "monoid) before the double finish. The deterministic twin of "
    "corr/covar_samp",
)
def a_corr_pearson(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.floor("l_extendedprice").cast("long").alias("x"),
        # floor() on BOTH engines: DuckDB CAST(double AS BIGINT) rounds to
        # nearest while Spark cast('long') truncates — integral quantities
        # mask the difference today, fractional ones would not
        F.floor("l_quantity").cast("long").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    corr = F.round(
        (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (
            F.sqrt(F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            * F.sqrt(F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
        ),
        6,
    )
    return m.select("l_returnflag", "n", "sx", "sy", corr.alias("corr"))


# --------------------------------------------------------------------------
# incremental aggregate maintenance: rollup merge == direct rollup
# --------------------------------------------------------------------------


@register(
    "t_rollup_backfill",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY 1, 2
    """,
    doc="incremental aggregate maintenance, PROVEN in the correctness "
    "gate: the Spark side builds the rollup as TWO partial rollups (a "
    "base load and a late-arriving backfill batch, split so every "
    "(day, type) key overlaps both) merged by groupBy-sum; the oracle "
    "computes the direct one-pass rollup — the value hash matching means "
    "merge-of-partials == direct on real data across engines, which is "
    "the property that lets a 100 TB pipeline maintain rollups "
    "incrementally instead of recomputing. Sums are integer cents "
    "(floor(v*100+0.5)): the sum monoid must be EXACT for the merge "
    "equivalence to be bit-true at any split",
)
def t_rollup_backfill(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count("*").alias("cnt"), F.sum("cents").alias("value_cents")
        )

    base = partial(ev.where(F.col("event_id") % 2 == 0))
    late = partial(ev.where(F.col("event_id") % 2 == 1))
    return (
        base.unionByName(late)
        .groupBy("day", "event_type")
        .agg(F.sum("cnt").alias("cnt"), F.sum("value_cents").alias("value_cents"))
    )


# --------------------------------------------------------------------------
# point-in-time (PIT) join against a versioned dimension
# --------------------------------------------------------------------------


@register(
    "j_pit_dimension",
    """
    WITH dim AS (
      SELECT o_custkey AS cust, o_orderdate AS valid_from,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
               AS version,
             CAST(sum(day_cents) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cents
      FROM (SELECT o_custkey, o_orderdate,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS day_cents
            FROM orders GROUP BY 1, 2)),
    fact AS (
      SELECT o_custkey AS cust, l_shipdate AS ts,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS item_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    pit AS (
      SELECT f.item_cents, d.version, d.cum_cents
      FROM fact f ASOF JOIN dim d
        ON f.cust = d.cust AND d.valid_from <= f.ts)
    SELECT version, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(item_cents) AS BIGINT) AS item_cents,
           CAST(sum(cum_cents) AS BIGINT) AS cum_cents_sum
    FROM pit GROUP BY version
    """,
    doc="point-in-time join against a VERSIONED dimension — the SCD2 "
    "warehouse pattern: the dim is each customer's order history rolled "
    "into (valid_from, version, cumulative spend) rows via two windows; "
    "every shipment line then attaches the dim version valid AT ITS SHIP "
    "DATE through the backward as-of operator (union + LOCF window: one "
    "shuffle keyed by customer, no range-join candidate blow-up). The "
    "oracle is DuckDB's native ASOF JOIN over the same dim — per-version "
    "aggregates only match if every row's version assignment is exact. "
    "Inner-ASOF semantics: the synthetic generator dates ~half of all "
    "shipments BEFORE their order, and rows preceding their customer's "
    "first dim version (5,168 at sf0.01) have no point-in-time state — "
    "both engines drop them identically (DuckDB's ASOF JOIN is inner; "
    "the Spark side filters the left-outer operator's null versions)",
)
def j_pit_dimension(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    from ..operators.asof import asof_join

    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    daily = o.groupBy(
        F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("valid_from")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("day_cents"))
    w = Window.partitionBy("cust").orderBy("valid_from")
    dim = daily.select(
        "cust",
        "valid_from",
        F.row_number().over(w).alias("version"),
        F.sum("day_cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_cents"),
    )
    fact = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_custkey").alias("cust"),
        F.col("l_shipdate").alias("ts"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("item_cents"),
    )
    pit = asof_join(
        fact,
        dim.withColumnRenamed("valid_from", "ts"),
        on=["cust"],
        value_cols=["version", "cum_cents"],
    )
    # inner-ASOF semantics, matching the oracle's ASOF JOIN: the synthetic
    # generator emits some shipments dated BEFORE their order, which have
    # no dim version yet — DuckDB's inner ASOF drops them, the left-outer
    # operator keeps them as NULLs; drop here so both engines agree
    return pit.where(F.col("version").isNotNull()).groupBy("version").agg(
        F.count("*").alias("n_items"),
        F.sum("item_cents").alias("item_cents"),
        F.sum("cum_cents").alias("cum_cents_sum"),
    )


# --------------------------------------------------------------------------
# streaming deterministic sampling + z-score anomaly detection
# --------------------------------------------------------------------------


@register(
    "st_hash_sample",
    """
    SELECT event_id, user_id, event_type FROM events
    WHERE ('0x' || substr(md5(event_id::VARCHAR || ':st1'), 1, 15))::BIGINT
          % 10000 < 2000
    """,
    doc="STREAMING content-hash sampling: the deterministic keep rule is a "
    "stateless row filter, so it runs on a Structured Stream UNCHANGED — "
    "no watermark, no state store, no foreachBatch; the kept set is a "
    "pure function of each row, so stream and batch agree row-for-row "
    "(which this shared batch oracle checks) and a re-run over re-sharded "
    "files keeps exactly the same events. The streaming admission-control "
    "form of tx_hash_sample",
)
def st_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import portable_hash64
    from ..streaming.finite import run_available_now
    from ..streaming.ingest import read_events_stream

    stream = read_events_stream(spark, sf)
    h = portable_hash64(F.concat(F.col("event_id").cast("string"), F.lit(":st1")))
    kept = stream.where(F.pmod(h, F.lit(10_000)) < 2000).select(
        "event_id", "user_id", "event_type"
    )
    return run_available_now(kept, "append")


@register(
    "a_outliers_zscore",
    """
    WITH q AS (SELECT event_id, event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
               FROM events),
    m AS (SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vc) AS BIGINT) AS s,
                 CAST(sum(vc * vc) AS BIGINT) AS sxx
          FROM q GROUP BY 1)
    SELECT q.event_id, q.event_type, q.vc,
           CAST(round((CAST(m.n AS DOUBLE) * q.vc - CAST(m.s AS DOUBLE))
                      / sqrt(CAST(m.n AS DOUBLE) * m.sxx
                             - CAST(m.s AS DOUBLE) * m.s), 4) AS DOUBLE)
             AS zscore
    FROM q JOIN m USING (event_type)
    WHERE (CAST(m.n AS DOUBLE) * q.vc - CAST(m.s AS DOUBLE))
          * (CAST(m.n AS DOUBLE) * q.vc - CAST(m.s AS DOUBLE))
          > 9.0 * (CAST(m.n AS DOUBLE) * m.sxx - CAST(m.s AS DOUBLE) * m.s)
    """,
    doc="z-score anomaly detection per event_type (|value - mean| > 3 "
    "sigma): per-group moments are EXACT int64 sums over integer cents "
    "(map-side partials, order-free — the corr/covar machinery), the "
    "3-sigma comparison and reported z-score are a handful of IEEE double "
    "ops on those identical exact inputs, so the flagged set is "
    "bit-deterministic across engines and partitionings; the tiny "
    "per-group moment table broadcasts onto the scan",
)
def a_outliers_zscore(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc")
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("sxx"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    num = F.col("n").cast("double") * F.col("vc") - F.col("s").cast("double")
    var_n2 = F.col("n").cast("double") * F.col("sxx") - F.col("s").cast("double") * F.col("s")
    return (
        j.where(num * num > 9.0 * var_n2)
        .select(
            "event_id",
            "event_type",
            "vc",
            F.round(num / F.sqrt(var_n2), 4).cast("double").alias("zscore"),
        )
    )


@register(
    "u_join_ivm",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="incremental view maintenance for a JOIN: with orders split into "
    "(base, delta-A) and lineitem into (base, delta-B), the maintained "
    "view base-join ∪ ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB must equal the direct join "
    "of the updated tables — the oracle computes the DIRECT join, so a "
    "green row proves the algebraic identity the incremental pipeline "
    "relies on (the join twin of t_rollup_backfill's merge-of-partials). "
    "Scale: the three delta terms join a small delta against a base — "
    "broadcast when the delta fits, keyed shuffle otherwise — so view "
    "refresh costs O(Δ·join) instead of re-joining 100 TB; per-row "
    "integer cents keep the aggregate exact at any parallelism",
)
def u_join_ivm(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    # the "existing" state: base tables and their materialized base join
    a0 = o.where(F.col("o_orderkey") % 7 != 0)
    da = o.where(F.col("o_orderkey") % 7 == 0)  # newly arrived orders
    b0 = li.where(F.col("l_linenumber") != 1)
    db = li.where(F.col("l_linenumber") == 1)  # newly arrived lineitems
    on = F.col("o_orderkey") == F.col("l_orderkey")
    base_view = a0.join(b0, on)
    # the refresh: three delta terms, each O(delta x base). No broadcast
    # HINT: the delta scales with the changelog (1/7 of orders here), so a
    # hard hint is a forced OOM at some SF — AQE broadcasts the delta side
    # exactly while it fits, and falls back to the keyed shuffle beyond
    delta = (
        da.join(b0, on)
        .unionByName(a0.join(db, on))
        .unionByName(da.join(db, on))
    )
    maintained = base_view.unionByName(delta)
    return (
        maintained.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "ml_ols_fit",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
             CAST(sum(CAST(round(l_extendedprice) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag AS grp, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 4) AS intercept,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
    FROM m ORDER BY grp
    """,
    doc="distributed closed-form OLS (price ~ quantity per returnflag): "
    "the five moment sums are exact int64 (map-side partials, order-free "
    "at any parallelism — x is integer-valued quantity, y integer dollars; "
    "int64 headroom to ~sf100, documented), finished by one identical IEEE "
    "double expression on both engines — bit-deterministic regression "
    "without MLlib, the model-fit member of the a_corr_pearson family; "
    "k×1 result collects nothing data-sized",
)
def ml_ols_fit(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dn, dsx, dsy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    dsxx, dsxy, dsyy = (F.col(c).cast("double") for c in ("sxx", "sxy", "syy"))
    cov_n2 = dn * dsxy - dsx * dsy
    varx_n2 = dn * dsxx - dsx * dsx
    vary_n2 = dn * dsyy - dsy * dsy
    slope = cov_n2 / varx_n2
    return (
        m.select(
            F.col("l_returnflag").alias("grp"),
            "n",
            F.round(slope, 6).alias("slope"),
            F.round((dsy - slope * dsx) / dn, 4).alias("intercept"),
            F.round((cov_n2 * cov_n2) / (varx_n2 * vary_n2), 6).alias("r2"),
        )
        .orderBy("grp")
    )


_PATTERN_MAX_EVENTS_PER_USER = 10_000_000


def _guard_max_events_per_key(
    df: DataFrame, key: str, cap: int = _PATTERN_MAX_EVENTS_PER_USER
) -> None:
    """Skew guard for per-key full-history materialization: the sequence
    string a_event_pattern_match builds is ONE row per key sized by that
    key's event count, so a bot key with hundreds of millions of events
    becomes a multi-GB single row on one executor inside collect_list —
    after it's too late to fail cleanly. This pre-pass is a count-only
    aggregation (map-side partials; only (key, count) rows shuffle, never
    events) reduced to one driver scalar, and raises loudly with the
    offending cardinality so the caller can switch to chunked matching
    (overlap = pattern_length - 1) or drop/sample the key."""
    top = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(1)
        .collect()
    )
    if top and top[0]["n"] > cap:
        raise ValueError(
            f"event-pattern skew guard: key {key}={top[0][key]!r} has "
            f"{top[0]['n']} events > cap {cap}; its sequence string would "
            f"materialize ~{top[0]['n']} bytes in a single row on one "
            "executor — raise the cap only with executor memory to match, "
            "or chunk the match with overlap = pattern_length - 1"
        )


@register(
    "a_event_pattern_match",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_matches
    FROM seq
    WHERE len(regexp_extract_all(s, 'vc*p')) > 0
    ORDER BY user_id
    """,
    doc="MATCH_RECOGNIZE-style event-sequence detection: each user's "
    "event-type initials collapse to ONE ordered string per user (a "
    "single user-keyed shuffle; per-user state is bounded by their event "
    "count, the same bound any sequence automaton needs), then the "
    "pattern 'view (clicks)* purchase' runs as a regex over that string — "
    "non-overlapping scan semantics agree across engines; ordering is "
    "total via the (ts, event_id) tie-break so the string is unique. "
    "Skew guard: a cheap count-per-key pre-pass (map-side partials, no "
    "data-sized rows) fails LOUDLY before collect_list can materialize a "
    "bot user's multi-GB history on one executor — memory bound is "
    "max_events_per_user bytes of string per key (default 10M ≈ 10 MB); "
    "beyond it, chunked matching with overlap |pattern|-1 is the rewrite",
)
def a_event_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
    )
    _guard_max_events_per_key(ev, "user_id")
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "c"))),
                lambda s: s["c"],
            ),
        ).alias("s")
    )
    n = F.size(F.regexp_extract_all(F.col("s"), F.lit("vc*p"), F.lit(0)))
    return (
        seq.where(n > 0)
        .select("user_id", n.cast("long").alias("n_matches"))
        .orderBy("user_id")
    )


@register(
    "a_pattern_chunked",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    ),
    pos AS (SELECT user_id, s, unnest(generate_series(1, len(s))) AS i FROM seq),
    starts AS (
      SELECT user_id FROM pos
      WHERE regexp_matches(substr(s, CAST(i AS INT), 5), '^vc{0,3}p')
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM starts GROUP BY user_id ORDER BY user_id
    """,
    doc="CHUNKED event-pattern matching — the graceful-degradation path "
    "the a_event_pattern_match skew guard's error message promises: each "
    "key's ordered events split into fixed-size chunk strings (per-ROW "
    "memory bounded by chunk_size, independent of key skew) with a "
    "|pattern|-1-character overlap from the next chunk, and the bounded "
    "pattern vc{0,3}p is counted as ANCHORED MATCH STARTS via a zero-width "
    "lookahead regex — counts in the overlap region cancel exactly "
    "(identical suffixes), so per-chunk counts sum to the unchunked "
    "anchored count (equivalence vs the one-string form asserted in "
    "tests/test_patterns_chunked.py). chunk_size=64 here so sf0.01 "
    "actually exercises chunk boundaries against the oracle (the DuckDB "
    "twin is the position-enumerating form; RE2 has no lookahead) — see "
    "operators/patterns.py",
)
def a_pattern_chunked(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.patterns import anchored_pattern_counts_chunked

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
    )
    return anchored_pattern_counts_chunked(
        ev, "user_id", ["ts", "event_id"], "c", "vc{0,3}p", 5, chunk_size=64
    ).orderBy("user_id")


@register(
    "t_ohlc_bars",
    """
    WITH e AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
             value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts ASC, event_id ASC) AS rk_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rk_close
      FROM events
    )
    SELECT event_type, hour,
           round(max(CASE WHEN rk_open = 1 THEN value END), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(max(CASE WHEN rk_close = 1 THEN value END), 2) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM e GROUP BY event_type, hour
    ORDER BY event_type, hour
    """,
    doc="time-series OHLC downsampling (the financial-bars rollup): "
    "open/close are argmin/argmax by the total (ts, event_id) order — two "
    "window row_numbers over ONE (type, hour)-keyed sort — high/low/count "
    "are plain partial aggs in the same pass; deterministic because the "
    "tie-break order is total",
)
def t_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "value",
        "ts",
        "event_id",
    )
    # open/close are argmin/argmax by (ts, event_id) — min_by/max_by in
    # ONE hash aggregation with map-side partial combine, replacing the
    # two sort-windows that routed every tick of a (type, hour) group
    # through one reducer (same tie-break: struct comparison is
    # field-ordered, ts then event_id)
    return (
        ev.groupBy("event_type", F.col("h").cast("string").alias("hour"))
        .agg(
            F.round(F.min_by("value", F.struct("ts", "event_id")), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", F.struct("ts", "event_id")), 2).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .orderBy("event_type", "hour")
    )
