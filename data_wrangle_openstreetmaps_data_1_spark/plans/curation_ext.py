"""Round-10 curation/analytics extensions: generic column profiling,
event-transition analytics, token-balanced output sharding, HTML
main-content extraction, and product-quantized similarity search.

Registered like every other plans module — Spark callable + DuckDB oracle
twin per query (see registry.py for the cross-engine determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count
from ..operators.htmltext import (
    extract_main_text,
    extract_main_text_sql,
    link_count,
    link_count_sql,
    synth_page,
    synth_page_sql,
)
from ..operators.profiling import profile_columns, profile_columns_sql
from ..sources.tables import load_table
from .registry import register

# --------------------------------------------------------------------------
# generic column profiler
# --------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@register(
    "dq_profile",
    profile_columns_sql("documents", _PROFILE_COLS),
    doc="generic one-scan column profiler (the discovery pass before "
    "dq_expectations' contract gate): nulls, exact distincts, min/max "
    "renders, integer mean-length per column, ALL from one aggregation "
    "over one scan (multi-distinct compiles to the Expand form — the "
    "standard exact single-pass shape in both engines). At 100 TB flip "
    "profile_columns(approximate=True): distincts become mergeable HLL "
    "sketches, Expand disappears (unit-tested, not oracle-checked — "
    "sketch estimates are engine-specific)",
)
def dq_profile(spark: SparkSession, sf: str) -> DataFrame:
    return profile_columns(load_table(spark, sf, "documents"), _PROFILE_COLS)


# --------------------------------------------------------------------------
# event-transition matrix (user-journey Markov counts)
# --------------------------------------------------------------------------


@register(
    "a_transition_matrix",
    """
    SELECT coalesce(prev_type, 'START') AS prev_type, event_type AS next_type,
           count(*) AS n
    FROM (SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
    GROUP BY 1, 2
    """,
    doc="user-journey transition matrix (first-order Markov counts): per "
    "user, order events by (ts, event_id) — event_id breaks timestamp "
    "ties deterministically — lag() the event type, count (prev, next) "
    "pairs with a synthetic START state for each user's first event. ONE "
    "keyed shuffle for the window, then a tiny (|types|+1)^2 rollup that "
    "partial-aggregates map-side. The product-analytics complement to "
    "a_funnel_stages: funnel checks ONE prescribed path, this measures "
    "ALL observed paths",
)
def a_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.coalesce(F.lag("event_type").over(w), F.lit("START")).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# token-balanced output sharding
# --------------------------------------------------------------------------

_N_SHARDS = 8
_DUCK_HASH64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


@register(
    "tx_shard_manifest",
    f"""
    SELECT {_DUCK_HASH64.format(x="CAST(doc_id AS VARCHAR) || ':shard'")}
             % {_N_SHARDS} AS shard,
           count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
                AS BIGINT) AS tokens_total
    FROM documents
    GROUP BY 1
    """,
    doc="token-balanced output sharding manifest: shard = "
    "portable_hash64(doc_id)%N — content-independent hash sharding, the "
    "shape production pipelines use to write N training shards, because "
    "by LLN the per-shard token totals concentrate tightly around "
    "total/N with ZERO coordination (no global sort, no running-sum "
    "window — a row_number-balanced assignment would serialize the whole "
    "corpus through one sort). The manifest reports achieved balance "
    "per shard (the test asserts the spread); one groupBy on a 3-bit "
    "key, fully map-side-partial. Hash is the portable md5 family so "
    "shard membership is reproducible across engines AND runs",
)
def tx_shard_manifest(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    d = load_table(spark, sf, "documents")
    return (
        d.select(
            (
                portable_hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
                % _N_SHARDS
            ).alias("shard"),
            token_count(F.col("text")).alias("toks"),
        )
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("tokens_total"))
    )


# --------------------------------------------------------------------------
# HTML main-content extraction
# --------------------------------------------------------------------------

_PAGE_SQL = synth_page_sql("text", "source", "doc_id")


@register(
    "tx_html_extract",
    f"""
    WITH pages AS (SELECT doc_id, {_PAGE_SQL} AS page FROM documents)
    SELECT doc_id,
           {link_count_sql("page")} AS n_links,
           CAST(length({extract_main_text_sql("page")}) AS BIGINT) AS clean_len,
           md5({extract_main_text_sql("page")}) AS clean_md5
    FROM pages
    """,
    doc="HTML main-content extraction (the CCNet/trafilatura stage of a "
    "web-scale curation pipeline): strip script/style, drop boilerplate "
    "blocks (nav/footer/banner), flatten tags, collapse whitespace; keep "
    "the page's link count for link-density quality gates. Page bodies "
    "are deterministic template fakes (no HTML corpus in the container — "
    "same honesty contract as the multimodal tier) but the extraction "
    "cascade is real: RE2-subset regexes (no backreferences/lookaround) "
    "shared verbatim between engines, and the round-trip test asserts "
    "extraction recovers exactly the original text. Map-only regex "
    "cascade — codegen'd, zero shuffle, scan-speed at 100 TB",
)
def tx_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    page = synth_page(F.col("text"), F.col("source"), F.col("doc_id"))
    clean = extract_main_text(page)
    return d.select(
        "doc_id",
        link_count(page).cast("long").alias("n_links"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# product-quantized similarity search (ADC)
# --------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_DSUB = 8  # dims per subspace (8 x 8 = the 64-dim embedding)
_PQ_K = 16  # codes per subspace
_PQ_ITERS = 1  # Lloyd iterations per codebook
_PQ_R = 6  # centroid quantization decimals
_PQ_NQ = 3  # query vectors: vec_id < _PQ_NQ
_PQ_TOPK = 5


def _pq_cte_list() -> list[str]:
    """Shared CTE builder: unrolled PQ in DuckDB — per subspace, the same
    seeded/quantized Lloyd iteration as ml_kmeans' oracle, then code
    assignment, per-query lookup tables, and the MATERIALIZED linear ADC
    accumulation ending at ``adc(qid, vec_id, adc_d2)``. Trajectory-
    identical to operators/pq.py by the clustering determinism contract.
    Consumed by the sim_pq oracle (exhaustive) and the sim_ivf_pq oracle
    (cluster-pruned)."""
    m, d, k, r = _PQ_M, _PQ_DSUB, _PQ_K, _PQ_R
    ctes = ["e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]

    def d2(vec: str, cent: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {d + 1}), "
            f"i -> ({vec}[i] - {cent}[i]) * ({vec}[i] - {cent}[i])), (a, b) -> a + b)"
        )

    for mi in range(m):
        lo, hi = mi * d + 1, (mi + 1) * d
        ctes.append(f"s{mi} AS (SELECT vec_id, v[{lo}:{hi}] AS s FROM e)")
        ctes.append(
            f"cent{mi}_0 AS (SELECT CAST(vec_id + 1 AS INT) AS code, "
            f"list_transform(s, x -> round(x, {r})) AS c FROM s{mi} WHERE vec_id < {k})"
        )
        for it in range(_PQ_ITERS):
            ctes.append(
                f"asg{mi}_{it} AS (SELECT vec_id, s, code FROM ("
                f"SELECT t.vec_id, t.s, c.code, row_number() OVER (PARTITION BY t.vec_id "
                f"ORDER BY {d2('t.s', 'c.c')} ASC, c.code ASC) AS rk "
                f"FROM s{mi} t, cent{mi}_{it} c) WHERE rk = 1)"
            )
            ctes.append(
                f"dims{mi}_{it} AS (SELECT a.code, u.i AS dim, round(avg(a.s[u.i]), {r}) AS cv "
                f"FROM asg{mi}_{it} a, (SELECT unnest(range(1, {d + 1})) AS i) u "
                f"GROUP BY a.code, u.i)"
            )
            ctes.append(
                f"cent{mi}_{it + 1} AS (SELECT p.code, coalesce(n.c, p.c) AS c "
                f"FROM cent{mi}_{it} p LEFT JOIN (SELECT code, array_agg(cv ORDER BY dim) AS c "
                f"FROM dims{mi}_{it} GROUP BY code) n USING (code))"
            )
        fin = f"cent{mi}_{_PQ_ITERS}"
        ctes.append(
            f"code{mi} AS (SELECT vec_id, code FROM ("
            f"SELECT t.vec_id, c.code, row_number() OVER (PARTITION BY t.vec_id "
            f"ORDER BY {d2('t.s', 'c.c')} ASC, c.code ASC) AS rk "
            f"FROM s{mi} t, {fin} c) WHERE rk = 1)"
        )
        ctes.append(
            f"lut{mi} AS (SELECT q.vec_id AS qid, c.code, {d2('q.s', 'c.c')} AS dd "
            f"FROM s{mi} q, {fin} c WHERE q.vec_id < {_PQ_NQ})"
        )
    # linear accumulation chain, one MATERIALIZED step per subspace: (a) the
    # left-fold addition order is explicit (((d0+d1)+d2)+... — matching the
    # Spark side's element_at sum, which is what keeps float parity), and
    # (b) the optimizer cannot flatten the codes/luts into one 2M-way star
    # join, whose misestimated bushy order cross-joins the lut tables
    # (16^M rows) before any code key connects them
    ctes.append(
        "acc0 AS MATERIALIZED (SELECT c.vec_id, l.qid, l.dd AS acc "
        "FROM code0 c JOIN lut0 l ON l.code = c.code)"
    )
    for mi in range(1, m):
        ctes.append(
            f"acc{mi} AS MATERIALIZED (SELECT a.vec_id, a.qid, a.acc + l.dd AS acc "
            f"FROM acc{mi - 1} a JOIN code{mi} c ON c.vec_id = a.vec_id "
            f"JOIN lut{mi} l ON l.code = c.code AND l.qid = a.qid)"
        )
    ctes.append(
        f"adc AS (SELECT qid, vec_id, round(acc, {r}) AS adc_d2 "
        f"FROM acc{m - 1} WHERE vec_id != qid)"
    )
    return ctes


def _pq_oracle() -> str:
    return (
        "WITH " + ", ".join(_pq_cte_list()) + " "
        "SELECT qid AS query_id, vec_id, adc_d2 FROM ("
        "SELECT *, row_number() OVER (PARTITION BY qid "
        "ORDER BY adc_d2 ASC, vec_id ASC) AS rk FROM adc) "
        f"WHERE rk <= {_PQ_TOPK}"
    )


@register(
    "sim_pq",
    _pq_oracle(),
    doc="product-quantized ANN (Jegou et al. 2011): train per-subspace "
    "k-means codebooks (8 subspaces x 8 dims, 16 codes, the deterministic "
    "quantized one-pass-per-iteration Lloyd trainer), encode every vector "
    "as 8 small int codes — 32x memory compression vs float32, the difference "
    "between an embedding corpus that fits executor RAM and one that "
    "doesn't — then answer queries by asymmetric distance: per-query "
    "16-entry lookup tables (driver-built, tiny) summed via element_at "
    "over the code columns, all codegen'd column math. Per-query top-k is "
    "orderBy+limit = TakeOrderedAndProject (partial top-k per partition, "
    "no global sort). Compose with sim_ivf's cluster bucketing to bound "
    "candidates at 100 TB; here the scan is exhaustive so the measured "
    "recall (tests) isolates pure quantization loss. Fully value-checked: "
    "the oracle unrolls training+encoding+ADC relationally",
)
def sim_pq(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import adc_topk, encode_pq, train_pq_codebooks

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    codebooks = train_pq_codebooks(
        emb, "vec_id", "v", m=_PQ_M, dsub=_PQ_DSUB, ksub=_PQ_K, iters=_PQ_ITERS, round_to=_PQ_R
    )
    encoded = encode_pq(emb, "v", codebooks, _PQ_DSUB).select(
        "vec_id", *[f"code{mi}" for mi in range(_PQ_M)]
    )
    queries = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < _PQ_NQ).orderBy("vec_id").collect()
    ]
    return adc_topk(
        encoded, "vec_id", queries, codebooks, _PQ_DSUB, k=_PQ_TOPK, round_to=_PQ_R
    )


# --------------------------------------------------------------------------
# unigram (SentencePiece-flavored) tokenizer tier: vocab + segmentation
# --------------------------------------------------------------------------

_UNI_V = 48  # segmentation vocabulary size (bounded scalar class)

#: shared DuckDB CTEs: distinct weighted words -> candidate piece masses.
#: positions via end-exclusive range(1, len - l + 2) (empty when len < l,
#: matching the Spark side's if()-guarded sequence)
_UNI_WORDS_SQL = r"""
    words AS (
      SELECT word, count(*) AS wc FROM (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        FROM documents)
      WHERE length(word) > 0 GROUP BY word),
    subs AS (
      SELECT piece, CAST(sum(wc) AS BIGINT) AS mass FROM (
        SELECT substr(word, CAST(i AS INT), 2) AS piece, wc
        FROM (SELECT word, wc, unnest(range(1, length(word))) AS i FROM words)
        UNION ALL
        SELECT substr(word, CAST(i AS INT), 3), wc
        FROM (SELECT word, wc, unnest(range(1, length(word) - 1)) AS i FROM words)
        UNION ALL
        SELECT substr(word, CAST(i AS INT), 4), wc
        FROM (SELECT word, wc, unnest(range(1, length(word) - 2)) AS i FROM words))
      GROUP BY piece)
"""


@register(
    "tx_unigram_vocab",
    f"""
    WITH {_UNI_WORDS_SQL}
    SELECT piece, mass FROM subs ORDER BY mass DESC, piece ASC LIMIT 20
    """,
    doc="unigram-tokenizer candidate vocabulary (Kudo 2018's selection "
    "shape): every 2-4-char substring at every position of every DISTINCT "
    "word, weighted by word count — candidate generation runs over the "
    "word vocabulary (Heaps-law-sized), never the corpus, then one "
    "groupBy sums exact integer masses. Top-k by (mass desc, piece asc) "
    "via TakeOrderedAndProject. The second tokenizer family next to BPE: "
    "BPE grows pieces bottom-up from pair stats, this scores all bounded "
    "substrings at once",
)
def tx_unigram_vocab(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.unigram import piece_masses, word_counts

    words = word_counts(load_table(spark, sf, "documents"), "text")
    return (
        piece_masses(words)
        .orderBy(F.desc("mass"), F.asc("piece"))
        .limit(20)
        .select("piece", "mass")
    )


def _unigram_segment_oracle() -> str:
    from ..operators.unigram import segment_recursive_sql

    return f"""
    WITH RECURSIVE {_UNI_WORDS_SQL},
    vocab AS (SELECT piece FROM subs ORDER BY mass DESC, piece ASC LIMIT {_UNI_V}),
    {segment_recursive_sql("words", "vocab")}
    SELECT piece, CAST(sum(wc) AS BIGINT) AS n_uses FROM (
      SELECT unnest(string_split(substr(seg, 2), '|')) AS piece, wc FROM segd)
    GROUP BY piece ORDER BY n_uses DESC, piece ASC LIMIT 30
    """


@register(
    "tx_unigram_segment",
    _unigram_segment_oracle(),
    doc="greedy longest-match subword segmentation against the top-48 "
    "unigram vocabulary, with single-char fallback (byte-fallback "
    "semantics: unknown chars become their own pieces, guaranteeing "
    "progress). Each DISTINCT word segments once via ONE bounded "
    "aggregate() fold (depth = measured max word length, a scalar agg — "
    "no iteration loop, no lineage growth), pieces re-weighted by word "
    "count; the vocabulary is a bounded driver-side scalar class like "
    "BPE's rules, embedded as codegen'd IN-lists. Oracle re-derives the "
    "same vocab relationally and walks the same greedy states with a "
    "recursive CTE — fully value-checked. Output: top-30 pieces by usage",
)
def tx_unigram_segment(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.unigram import segment_words, select_vocab, word_counts

    words = word_counts(load_table(spark, sf, "documents"), "text")
    vocab = [p for p, _ in select_vocab(words, _UNI_V)]
    max_len = words.agg(F.max(F.length("word"))).collect()[0][0] or 1
    segd = segment_words(words, vocab, max_len)
    pieces = segd.select(
        "wc", F.split(F.expr("substring(seg, 2)"), r"\|").alias("ps")
    ).select("wc", F.explode("ps").alias("piece"))
    return (
        pieces.groupBy("piece")
        .agg(F.sum("wc").alias("n_uses"))
        .orderBy(F.desc("n_uses"), F.asc("piece"))
        .limit(30)
    )


# --------------------------------------------------------------------------
# collocation mining (PMI-family lift score, exact integer-derived ranking)
# --------------------------------------------------------------------------


@register(
    "tx_collocations",
    r"""
    WITH toks AS (
      SELECT doc_id, t, CAST(len(t) AS BIGINT) AS nt FROM (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents)),
    uni AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(t) AS word FROM toks)
      WHERE length(word) > 0 GROUP BY word),
    bi AS (
      SELECT w1 || ' ' || w2 AS bigram, w1, w2, CAST(count(*) AS BIGINT) AS cab
      FROM (SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
            FROM (SELECT t, unnest(range(1, nt)) AS i FROM toks))
      GROUP BY 1, 2, 3),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             (SELECT CAST(sum(cab) AS BIGINT) FROM bi) AS b FROM uni)
    SELECT bigram, cab,
           round(CAST(cab AS DOUBLE) * n * n / (CAST(b AS DOUBLE) * ca.c * cb.c), 6)
             AS lift
    FROM bi JOIN uni ca ON bi.w1 = ca.word JOIN uni cb ON bi.w2 = cb.word, tot
    WHERE cab >= 5
    ORDER BY lift DESC, bigram ASC LIMIT 20
    """,
    doc="collocation / phrase mining: adjacent-bigram lift score "
    "p(ab)/(p(a)p(b)) — the PMI exponent, which ranks identically to PMI "
    "without a log() call (ln is not correctly-rounded IEEE, so engines "
    "drift; the ratio is a handful of exact-order double ops over exact "
    "int64 counts and hashes identically). min-support 5 kills the "
    "singleton-noise tail, top-k via TakeOrderedAndProject. One token "
    "scan feeds both the unigram and bigram counts; the two count joins "
    "are on word keys (the unigram table broadcasts at any realistic "
    "vocabulary size). The standard phrase-detection stage (Mikolov "
    "word2vec phrases, public) for multi-word-expression vocabularies",
)
def tx_collocations(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..partitioning import explode_nonempty, spread

    d = spread(load_table(spark, sf, "documents").select("text"))
    toks = d.select(_tokens(F.col("text")).alias("t"))
    uni = (
        explode_nonempty(toks, [], "t", "word")
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    bi_arr = "if(size(t) >= 2, transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2)), array())"
    bi = (
        explode_nonempty(toks.select(F.expr(bi_arr).alias("bs")), [], "bs", "p")
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cab"))
        .withColumn("bigram", F.concat_ws(" ", "w1", "w2"))
    )
    tot = uni.agg(F.sum("c").alias("n")).crossJoin(
        bi.agg(F.sum("cab").alias("b"))
    )
    ca = uni.select(F.col("word").alias("w1"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("word").alias("w2"), F.col("c").alias("c_b"))
    return (
        bi.where(F.col("cab") >= 5)
        .join(F.broadcast(ca), "w1")
        .join(F.broadcast(cb), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "cab",
            F.round(
                F.expr("cast(cab as double) * n * n / (cast(b as double) * c_a * c_b)"), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("bigram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# exact heavy hitters (two-pass local-threshold; operators/heavy.py)
# --------------------------------------------------------------------------

_HH_K = 31  # phi = 1/31: discriminating at the sf0.01 gate (25 of ~31 pass)
# AND non-empty at sf0.1/sf1, where the flatter census left 1/29 with zero rows


@register(
    "a_heavy_hitters",
    rf"""
    WITH t AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                 AS token FROM documents),
    tt AS (SELECT token FROM t WHERE length(token) > 0)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM tt GROUP BY token
    HAVING count(*) * {_HH_K} > (SELECT count(*) FROM tt)
    """,
    doc="exact phi-frequent tokens WITHOUT a full token census: pass 1 "
    "counts inside Arrow batches (mapInPandas, shuffle-free) and emits "
    "only batch-local threshold beaters — by strict pigeonhole a "
    "guaranteed superset of the true heavy hitters under ANY batching — "
    "pass 2 recounts just those candidates (broadcast semi-join below "
    "the agg) and applies the exact global cut. The answer is exact and "
    "batching-independent, which is what makes it oracle-checkable; the "
    "naive census shuffles every distinct token (billions of keys of "
    "singleton tail at web scale), this shuffles candidates only. See "
    "operators/heavy.py for the proof sketch and the tokenizer-parity "
    "boundary",
)
def a_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.heavy import heavy_hitters

    return heavy_hitters(load_table(spark, sf, "documents"), "text", k=_HH_K)


# --------------------------------------------------------------------------
# SCD type-2 dimension maintenance (operators/scd.py)
# --------------------------------------------------------------------------


@register(
    "u_scd2_apply",
    """
    WITH dim AS (
      SELECT c_custkey AS key,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
             c_mktsegment AS seg
      FROM customer),
    ch AS (
      SELECT key,
             bal_cents + CASE WHEN key % 3 = 0 THEN 0 ELSE 5000 END AS nb,
             seg AS ns
      FROM dim WHERE key % 7 = 0),
    j AS (
      SELECT d.key, d.bal_cents, d.seg, ch.nb, ch.ns,
             ch.key IS NOT NULL
               AND (d.bal_cents IS DISTINCT FROM ch.nb
                    OR d.seg IS DISTINCT FROM ch.ns) AS material
      FROM dim d LEFT JOIN ch ON d.key = ch.key)
    SELECT key, bal_cents, seg, CAST(0 AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to, true AS is_current
    FROM j WHERE NOT material
    UNION ALL
    SELECT key, bal_cents, seg, 0, 1, false FROM j WHERE material
    UNION ALL
    SELECT key, nb, ns, 1, NULL, true FROM j WHERE material
    """,
    doc="slowly-changing-dimension TYPE-2 maintenance (history-preserving "
    "merge — u_upsert_snapshot's type-1 overwrites in place): one "
    "left join dim-current x broadcast change batch does null-safe change "
    "detection, then closed/new/kept branches project from that single "
    "joined frame. Every 7th customer arrives in the batch but every "
    "21st is a NO-OP update (same values) that must not mint a version — "
    "the classic SCD2 bug, pinned by the oracle and tests. The dimension "
    "side never shuffles (batch broadcasts); bucketed dim storage keeps "
    "it that way for big batches (same discipline as the CDC snapshot "
    "merge)",
)
def u_scd2_apply(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.scd import scd2_apply

    base = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = (
        base.where(F.col("key") % 7 == 0)
        .select(
            "key",
            (
                F.col("bal_cents")
                + F.when(F.col("key") % 3 == 0, F.lit(0)).otherwise(F.lit(5000))
            ).alias("bal_cents"),
            F.col("seg"),
        )
    )
    return scd2_apply(base, changes, "key", ["bal_cents", "seg"], batch_id=1)


# --------------------------------------------------------------------------
# interval-overlap join (operators/range_join.py:interval_overlap_join)
# --------------------------------------------------------------------------


@register(
    "j_interval_overlap",
    """
    WITH iv AS (
      SELECT o_orderkey AS k, o_custkey AS cust,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS s
      FROM orders),
    a AS (SELECT k, cust, s, s + 6 AS e FROM iv WHERE k % 2 = 0),
    b AS (SELECT k, cust, s, s + 13 AS e FROM iv WHERE k % 2 = 1)
    SELECT a.cust, a.k AS a_key, b.k AS b_key,
           least(a.e, b.e) - greatest(a.s, b.s) + 1 AS overlap_days
    FROM a JOIN b ON a.cust = b.cust AND a.s <= b.e AND b.s <= a.e
    """,
    doc="interval x interval OVERLAP join (meeting-conflict / "
    "exposure-window shape): per-customer 7-day vs 14-day order windows "
    "that intersect, with overlap length. The two-sided sibling of "
    "j_range_join's point-in-interval: both spans explode to 14-day bins, "
    "keyed equi-join on (customer, bin) + exact overlap predicate; a "
    "k-bin-shared pair is kept ONLY in the bin containing its overlap "
    "start, so dedup is one codegen'd comparison instead of a DISTINCT "
    "exchange over the candidate set. Oracle = the brute per-customer "
    "theta join (semantic pin); the Spark side never plans a product",
)
def j_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.range_join import interval_overlap_join

    iv = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("cust"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("s"),
    )
    a = iv.where(F.col("k") % 2 == 0).select("k", "cust", "s", (F.col("s") + 6).alias("e"))
    b = iv.where(F.col("k") % 2 == 1).select("k", "cust", "s", (F.col("s") + 13).alias("e"))
    out = interval_overlap_join(a, b, on="cust", bin_width=14)
    return out.select(
        "cust",
        F.col("a_k").alias("a_key"),
        F.col("b_k").alias("b_key"),
        (F.least("a_e", "b_e") - F.greatest("a_s", "b_s") + 1).alias("overlap_days"),
    )


# --------------------------------------------------------------------------
# IVF + PQ composed: the full 100 TB ANN serving path
# --------------------------------------------------------------------------

_IVFPQ_NCENT = 16  # coarse centroids = seed vectors (sim_ivf's convention)
_IVFPQ_NPROBE = 2


def _ivf_pq_oracle(cand_filter: str = "") -> str:
    """Coarse-cluster pruning composed onto the shared PQ CTEs: targets sit
    in their single nearest seed centroid (full-64-dim L2, same fold order
    as similarity._l2sq), queries probe their 2 nearest, and the ADC
    ranking runs over cluster-matched candidates only. ``cand_filter``
    (e.g. " WHERE a.vec_id % 3 = 0") restricts the candidate set — the
    relational twin of the filtered probe's pre-ranking semi-join."""
    d2full = (
        "list_reduce(list_transform(range(1, 65), "
        "i -> (e.v[i] - c.c_vec[i]) * (e.v[i] - c.c_vec[i])), (a, b) -> a + b)"
    )
    ctes = _pq_cte_list() + [
        f"cent AS (SELECT vec_id AS c_id, v AS c_vec FROM e WHERE vec_id < {_IVFPQ_NCENT})",
        "cassign AS (SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY d2full ASC, c_id ASC) AS crk FROM (SELECT e.vec_id, c.c_id, {d2full} "
        "AS d2full FROM e, cent c))",
        "tclu AS (SELECT vec_id, c_id AS cluster FROM cassign WHERE crk = 1)",
        f"qclu AS (SELECT vec_id AS qid, c_id AS cluster FROM cassign "
        f"WHERE crk <= {_IVFPQ_NPROBE} AND vec_id < {_PQ_NQ})",
        # target has exactly ONE cluster, so a (qid, target) pair matches at
        # most once — no DISTINCT needed
        "cand AS (SELECT a.qid, a.vec_id, a.adc_d2 FROM adc a "
        "JOIN tclu t USING (vec_id) "
        f"JOIN qclu q ON q.cluster = t.cluster AND q.qid = a.qid{cand_filter})",
    ]
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT qid AS query_id, vec_id, adc_d2 FROM ("
        "SELECT *, row_number() OVER (PARTITION BY qid "
        "ORDER BY adc_d2 ASC, vec_id ASC) AS rk FROM cand) "
        f"WHERE rk <= {_PQ_TOPK}"
    )


@register(
    "sim_ivf_pq",
    _ivf_pq_oracle(),
    doc="IVF-PQ — the composition production ANN systems actually serve "
    "(FAISS IVFPQ shape, public): coarse clusters bound WHICH vectors a "
    "query scores (sim_ivf's cluster equi-join — at 100 TB the target "
    "table partitions by cluster and probes prune partitions) while PQ "
    "codes bound the BYTES each scored vector costs (sim_pq's 32x "
    "compression + ADC lookup sums). Both halves reuse their standalone "
    "operators; the oracle composes the shared unrolled-PQ CTEs with the "
    "cluster-pruning CTEs, fully value-checked. Recall loss = cluster "
    "pruning x quantization, measured against both parents in tests",
)
def sim_ivf_pq(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import adc_topk, encode_pq, train_pq_codebooks
    from ..operators.similarity import ivf_assign

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb = train_pq_codebooks(
        emb, "vec_id", "v", m=_PQ_M, dsub=_PQ_DSUB, ksub=_PQ_K, iters=_PQ_ITERS, round_to=_PQ_R
    )
    enc = encode_pq(emb, "v", cb, _PQ_DSUB)
    cent = emb.where(F.col("vec_id") < _IVFPQ_NCENT)
    # materialize the assigned+encoded index ONCE: the per-query branches
    # below each re-read it, and without the barrier every branch would
    # re-run the centroid window + encode over the corpus (x nq scans). In
    # production this frame IS the stored index — written, grown, compacted
    # and probe-pruned as the sim_ivf_pq_stored lifecycle
    # (operators/ivf_index.py, IVFINDEX_WIN.json); the materialization here
    # is the in-session stand-in for that artifact.
    from ..partitioning import truncate_lineage

    targets = truncate_lineage(
        ivf_assign(enc, cent.select("vec_id", "v"), "vec_id", "v", nprobe=1)
        .select("vec_id", "cluster")
        .join(enc.drop("v"), "vec_id")
    )
    probes = ivf_assign(
        emb.where(F.col("vec_id") < _PQ_NQ), cent, "vec_id", "v", nprobe=_IVFPQ_NPROBE
    ).select("vec_id", "cluster")
    probe_map: dict[int, list[int]] = {}
    for r in probes.collect():  # bounded: nq x nprobe scalar rows
        probe_map.setdefault(r["vec_id"], []).append(r["cluster"])
    queries = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < _PQ_NQ).orderBy("vec_id").collect()
    ]
    if not queries:
        raise ValueError(
            f"sim_ivf_pq: no query vectors (vec_id < {_PQ_NQ}) in this corpus"
        )
    parts = []
    for qid, qvec in queries:
        cand = targets.where(F.col("cluster").isin(probe_map[qid]))
        parts.append(
            adc_topk(cand, "vec_id", [(qid, qvec)], cb, _PQ_DSUB, k=_PQ_TOPK, round_to=_PQ_R)
        )
    out = parts[0]
    for pq_part in parts[1:]:
        out = out.unionByName(pq_part)
    return out


# --------------------------------------------------------------------------
# batch-vs-corpus vocabulary drift (round 12)
# --------------------------------------------------------------------------


def _vocab_drift_oracle() -> str:
    from ..operators.vocab import (
        DL_RATIO_HI_FP,
        DL_RATIO_LO_FP,
        L1_WARN_FP,
        OOV_WARN_FP,
    )
    from .pipeline import _TOKS_SQL

    return rf"""
    WITH bd AS (SELECT {_TOKS_SQL} AS toks FROM documents WHERE doc_id % 5 != 3),
    ad AS (SELECT {_TOKS_SQL} AS toks FROM documents WHERE doc_id % 5 = 3),
    bl AS (SELECT len(toks) AS dl FROM bd WHERE len(toks) >= 1),
    al AS (SELECT len(toks) AS dl FROM ad WHERE len(toks) >= 1),
    bs AS (SELECT CAST(count(*) AS BIGINT) AS base_docs,
                  CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS base_avgdl_fp
           FROM bl),
    asx AS (SELECT CAST(count(*) AS BIGINT) AS batch_docs,
                   CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS batch_avgdl_fp
            FROM al),
    bc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt_base
           FROM (SELECT unnest(toks) AS term FROM bd) GROUP BY 1),
    ac AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt_batch
           FROM (SELECT unnest(toks) AS term FROM ad) GROUP BY 1),
    tb AS (SELECT CAST(sum(cnt_base) AS BIGINT) AS tot_base FROM bc),
    ta AS (SELECT CAST(sum(cnt_batch) AS BIGINT) AS tot_batch FROM ac),
    j AS (SELECT bc.cnt_base, ac.cnt_batch
          FROM bc FULL OUTER JOIN ac ON bc.term = ac.term),
    m AS (SELECT
      CAST(count(*) FILTER (WHERE cnt_base IS NOT NULL) AS BIGINT) AS base_terms,
      CAST(count(*) FILTER (WHERE cnt_batch IS NOT NULL) AS BIGINT) AS batch_terms,
      CAST(count(*) FILTER (WHERE cnt_base IS NULL AND cnt_batch IS NOT NULL)
           AS BIGINT) AS new_terms,
      CAST(coalesce(sum(CASE WHEN cnt_base IS NULL THEN cnt_batch ELSE 0 END), 0)
           AS BIGINT) AS oov_mass,
      CAST(sum(abs(coalesce(cnt_base, 0) * 1000000 // tot_base
                   - coalesce(cnt_batch, 0) * 1000000 // tot_batch))
           AS BIGINT) AS l1_fp
      FROM j CROSS JOIN tb CROSS JOIN ta)
    SELECT base_docs, batch_docs, base_terms, batch_terms, new_terms,
           CAST(oov_mass * 1000000 // tot_batch AS BIGINT) AS oov_rate_fp,
           CAST(batch_avgdl_fp * 1000 // base_avgdl_fp AS BIGINT) AS dl_ratio_fp,
           l1_fp,
           (oov_mass * 1000000 // tot_batch > {OOV_WARN_FP}
            OR batch_avgdl_fp * 1000 // base_avgdl_fp < {DL_RATIO_LO_FP}
            OR batch_avgdl_fp * 1000 // base_avgdl_fp > {DL_RATIO_HI_FP}
            OR l1_fp > {L1_WARN_FP}) AS drift_flag
    FROM m CROSS JOIN bs CROSS JOIN asx CROSS JOIN tb CROSS JOIN ta
    """


@register(
    "tx_vocab_drift",
    _vocab_drift_oracle(),
    doc="batch-vs-corpus vocabulary drift report — the text-side analog "
    "of this round's IVF-PQ drift gauge, with the honest difference "
    "stated in the operator docstring: BM25 carries no trained state "
    "(adds maintain df/stats exactly), so this gates INGESTION (crawler/"
    "domain mix shift detection before a batch lands), not index "
    "correctness. New-term count, OOV token mass per million, mean-doc-"
    "length ratio per mille, and the L1 distance between relative term-"
    "frequency vectors, all integer fixed-point, one row. The single "
    "data-sized exchange is the term-keyed full-outer join of two "
    "pre-aggregated count tables: O(vocabulary), never O(corpus)",
)
def tx_vocab_drift(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.vocab import vocab_drift_report

    docs = load_table(spark, sf, "documents")
    return vocab_drift_report(
        docs.where(F.col("doc_id") % 5 != 3),
        docs.where(F.col("doc_id") % 5 == 3),
        "text",
    )
# --------------------------------------------------------------------------
# exact phrase search (round 12)
# --------------------------------------------------------------------------

_PHRASES = ["table hash", "merge group", "slow hash batch"]


def _phrase_oracle(k: int = 5, phrases: list[str] | None = None) -> str:
    from .pipeline import _TOKS_SQL

    branches = []
    for p in phrases or _PHRASES:
        words = p.split()
        n = len(words)
        conds = " AND ".join(
            f"toks[i + {j}] = '{w}'" for j, w in enumerate(words)
        )
        # DuckDB range(a, b) is EXCLUSIVE of b; Spark sequence(a, b) is
        # INCLUSIVE — range(1, len - n + 2) == sequence(1, size - n + 1)
        branches.append(
            f"SELECT '{p}' AS phrase, doc_id, "
            f"CASE WHEN len(toks) >= {n} THEN "
            f"CAST(len(list_filter(range(1, len(toks) - {n} + 2), i -> {conds})) AS BIGINT) "
            f"ELSE 0 END AS phrase_tf FROM d"
        )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    u AS ({' UNION ALL '.join(branches)}),
    r AS (SELECT phrase, doc_id, phrase_tf,
                 row_number() OVER (PARTITION BY phrase
                                    ORDER BY phrase_tf DESC, doc_id ASC) AS rnk
          FROM u WHERE phrase_tf > 0)
    SELECT phrase, doc_id, phrase_tf, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_phrase_search",
    _phrase_oracle(),
    doc="EXACT phrase search (adjacency, not bag-of-words): per-phrase "
    "top-5 documents by phrase frequency — the positional query BM25 "
    "postings cannot answer. One corpus scan evaluates every phrase as a "
    "codegen'd higher-order filter over the shared token array (phrases "
    "include a trigram — the operator is n-ary, not bigram-only), stack "
    "pivots counts long, non-matching rows drop before the only "
    "exchange (per-phrase top-k window). The oracle replays the same "
    "position arithmetic with DuckDB list ops (range/sequence "
    "inclusivity difference handled explicitly in the SQL)",
)
def tx_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.retrieval import phrase_topk

    return phrase_topk(
        load_table(spark, sf, "documents"), "doc_id", "text", _PHRASES, k=5
    )


@register(
    "tx_phrase_stored",
    _phrase_oracle(),
    doc="phrase search served from the PERSISTED positional sidecar "
    "(operators/text_index.py:write_phrase_positions/phrase_probe) — the "
    "Lucene positional-postings layout: (term, doc_id, sorted positions) "
    "bucketed like the scoring postings, kept as a separate dataset "
    "because positions roughly double index bytes and BM25 probes never "
    "need them. The probe reads ONLY the phrase words' buckets (driver-"
    "side md5 routing -> PartitionFilters) and folds adjacency with "
    "array arithmetic (starts+1 intersected with the next word's "
    "positions), where tx_phrase_search re-scans and re-tokenizes the "
    "whole corpus per phrase batch. Built base + incremental add inside "
    "the query (positions are per-document state: adds append, zero "
    "existing bytes touched) and shares tx_phrase_search's oracle "
    "verbatim — the serving path must be value-invisible",
)
def tx_phrase_stored(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        phrase_positions_add,
        phrase_probe,
        write_bm25_index,
        write_phrase_positions,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="phrase_idx_")
    shutil.rmtree(path, ignore_errors=True)
    # the scoring index provides the layout meta (n_buckets) the
    # positional sidecar routes by — one index dir, two datasets
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    write_phrase_positions(
        spark, docs.where(F.col("doc_id") % 5 != 3), path, "doc_id", "text"
    )
    phrase_positions_add(
        spark, docs.where(F.col("doc_id") % 5 == 3), path, "doc_id", "text"
    )
    return phrase_probe(spark, path, _PHRASES, k=5)


_PROX_PAIRS = [("table", "hash", 0), ("merge", "group", 2), ("slow", "batch", 3)]


def _proximity_oracle(k: int = 5) -> str:
    from .pipeline import _TOKS_SQL

    branches = []
    for w1, w2, slop in _PROX_PAIRS:
        # position arrays per word, then the ordered within-window pair
        # count: sum over p1 of |{p2 : p1 < p2 <= p1 + slop + 1}|.
        # DuckDB list_reduce has no init value -> list_sum(list_transform)
        # instead (equals Spark's aggregate(..., 0, ...) fold)
        p1 = f"list_filter(range(1, len(toks) + 1), i -> toks[i] = '{w1}')"
        p2 = f"list_filter(range(1, len(toks) + 1), i -> toks[i] = '{w2}')"
        branches.append(
            f"SELECT '{w1}' AS w1, '{w2}' AS w2, CAST({slop} AS INT) AS slop, "
            f"doc_id, CAST(coalesce(list_sum(list_transform({p1}, "
            f"p -> len(list_filter({p2}, q -> q > p AND q <= p + {slop + 1})))), 0) "
            f"AS BIGINT) AS prox_tf FROM d"
        )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    u AS ({' UNION ALL '.join(branches)}),
    r AS (SELECT w1, w2, slop, doc_id, prox_tf,
                 row_number() OVER (PARTITION BY w1, w2, slop
                                    ORDER BY prox_tf DESC, doc_id ASC) AS rnk
          FROM u WHERE prox_tf > 0)
    SELECT w1, w2, slop, doc_id, prox_tf, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_proximity_stored",
    _proximity_oracle(),
    doc="ordered within-window co-occurrence (the slop query) served from "
    "the SAME positional sidecar as tx_phrase_stored — the layout pays "
    "for a second query family it was not purpose-built for: (w1, w2, "
    "slop) matches position pairs p1 < p2 <= p1 + slop + 1, so slop=0 is "
    "exact bigram adjacency (asserted against phrase_probe in tests) and "
    "larger slops catch split phrases. Probe prunes to the two words' "
    "buckets (driver md5 routing -> PartitionFilters); the pair count is "
    "a nested fold over tiny per-doc position arrays, off the hot path. "
    "Oracle replays positions + window arithmetic from the raw corpus "
    "with DuckDB list ops (list_sum/list_transform standing in for "
    "Spark's aggregate-with-init, which DuckDB's list_reduce lacks)",
)
def tx_proximity_stored(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        proximity_probe,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="prox_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, positions=True
    )
    return proximity_probe(spark, path, _PROX_PAIRS, k=5)


# round 13: batched phrase serving + the positional-sidecar lifecycle

_PHRASES_BATCH8 = _PHRASES + [
    "hash table",
    "group merge",
    "batch slow",
    "hash group",
    "table group",
]


@register(
    "tx_phrase_batch8",
    _phrase_oracle(phrases=_PHRASES_BATCH8),
    doc="the BATCHED phrase probe at serving batch width — the text twin "
    "of sim_ivf_pq_batched (operators/text_index.py:phrase_probe_batched): "
    "8 phrases answered from ONE positions/ scan pruned to the union of "
    "their words' buckets, a broadcast (phrase, term) fan-out join, one "
    "(phrase, doc) map pivot, and the adjacency fold as a single GENERIC "
    "higher-order expression over each phrase's word array — plan size "
    "constant in the phrase count, where the per-phrase reference form "
    "compiles a scan branch + union per phrase (right for 3, wrong for a "
    "500-phrase serving batch; PHRASEBATCH_WIN.json measures the "
    "crossover). Query words travel as broadcast rows, never interpolated "
    "into SQL. Positions are integers so the generic fold is exactly the "
    "reference chain's arithmetic; tests assert row-identity and the "
    "single-scan plan shape, and this query shares the scan form's "
    "corpus-replay oracle (several phrases legitimately match zero docs — "
    "the empty branches must agree too)",
)
def tx_phrase_batch8(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        phrase_probe_batched,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="phrase_b8_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, positions=True
    )
    return phrase_probe_batched(spark, path, _PHRASES_BATCH8, k=5)


def _phrase_lifecycle_oracle(k: int = 5) -> str:
    """Replays delete -> probe -> compact -> probe -> re-add -> probe for
    the positional sidecar. Victims are each phrase's rank-1 doc over the
    full corpus (chosen inside the query). phrase_tf carries NO corpus
    statistics (unlike BM25's df), so the stale and compacted phases must
    be IDENTICAL — the oracle pins that by emitting the victims-excluded
    ranking twice — and the re-added phase must equal the full-corpus
    ranking exactly (a physically-compacted victim is a legal new doc
    again; its positions rows must come back bit-equal)."""
    from .pipeline import _TOKS_SQL

    branches = []
    for p in _PHRASES:
        words = p.split()
        n = len(words)
        conds = " AND ".join(
            f"toks[i + {j}] = '{w}'" for j, w in enumerate(words)
        )
        branches.append(
            f"SELECT '{p}' AS phrase, doc_id, "
            f"CASE WHEN len(toks) >= {n} THEN "
            f"CAST(len(list_filter(range(1, len(toks) - {n} + 2), i -> {conds})) AS BIGINT) "
            f"ELSE 0 END AS phrase_tf FROM d"
        )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    u AS ({' UNION ALL '.join(branches)}),
    m AS (SELECT phrase, doc_id, phrase_tf FROM u WHERE phrase_tf > 0),
    r0 AS (SELECT phrase, doc_id,
                  row_number() OVER (PARTITION BY phrase
                                     ORDER BY phrase_tf DESC, doc_id ASC) AS rnk
           FROM m),
    vict AS (SELECT DISTINCT doc_id FROM r0 WHERE rnk = 1),
    sr AS (SELECT phrase, doc_id, phrase_tf,
                  row_number() OVER (PARTITION BY phrase
                                     ORDER BY phrase_tf DESC, doc_id ASC) AS rnk
           FROM m WHERE doc_id NOT IN (SELECT doc_id FROM vict)),
    fr AS (SELECT phrase, doc_id, phrase_tf,
                  row_number() OVER (PARTITION BY phrase
                                     ORDER BY phrase_tf DESC, doc_id ASC) AS rnk
           FROM m)
    SELECT 'stale' AS phase, phrase, doc_id, phrase_tf, rnk FROM sr WHERE rnk <= {k}
    UNION ALL
    SELECT 'compacted' AS phase, phrase, doc_id, phrase_tf, rnk FROM sr WHERE rnk <= {k}
    UNION ALL
    SELECT 'readded' AS phase, phrase, doc_id, phrase_tf, rnk FROM fr WHERE rnk <= {k}
    """


@register(
    "tx_phrase_lifecycle",
    _phrase_lifecycle_oracle(),
    doc="delete -> probe -> compact -> probe -> RE-ADD -> probe on the "
    "positional sidecar, all three phases driver-value-checked — the "
    "driver-visible gate for the bug class round 12's verdict found "
    "(compact cleared the tombstones phrase probes anti-join but never "
    "rewrote positions/, so deleted docs RESURRECTED after compaction "
    "and their stale rows blocked legal re-adds). Victims are each "
    "phrase's rank-1 doc (bounded driver collect); phrase_tf carries no "
    "corpus statistics, so stale and compacted phases must be IDENTICAL "
    "(the oracle emits one victims-excluded ranking twice — any "
    "resurrection is a value failure), and the re-added phase must equal "
    "the full-corpus ranking bit-exactly (compaction physically dropped "
    "the victim, so re-adding it is legal again and must restore its "
    "positions rows)",
)
def tx_phrase_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_index_add,
        bm25_index_compact,
        bm25_index_delete,
        phrase_positions_add,
        phrase_probe,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="phrase_lc_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, positions=True
    )
    top1 = phrase_probe(spark, path, _PHRASES, k=1).collect()  # bounded: |phrases|
    victims = sorted({int(r["doc_id"]) for r in top1})
    bm25_index_delete(spark, path, victims)
    cols = ["phase", "phrase", "doc_id", "phrase_tf", "rnk"]
    # collect each phase BEFORE the next lifecycle step rewrites/appends
    # the files a lazy plan would re-read (bounded: |phrases| x k rows)
    stale_rows = (
        phrase_probe(spark, path, _PHRASES, k=5)
        .withColumn("phase", F.lit("stale")).select(cols).collect()
    )
    bm25_index_compact(spark, path)
    comp_rows = (
        phrase_probe(spark, path, _PHRASES, k=5)
        .withColumn("phase", F.lit("compacted")).select(cols).collect()
    )
    vic_docs = docs.where(F.col("doc_id").isin(victims))
    bm25_index_add(spark, vic_docs, path, "doc_id", "text")
    phrase_positions_add(spark, vic_docs, path, "doc_id", "text")
    readded = (
        phrase_probe(spark, path, _PHRASES, k=5)
        .withColumn("phase", F.lit("readded")).select(cols)
    )
    return (
        spark.createDataFrame(stale_rows, readded.schema)
        .unionByName(spark.createDataFrame(comp_rows, readded.schema))
        .unionByName(readded)
    )


def _phrase_bm25_oracle(k: int = 5) -> str:
    """Replays BM25-scored phrase search from the raw corpus: phrase_tf
    via the same list arithmetic as _phrase_oracle, df = matching-doc
    count per phrase, dl/n_docs/avgdl from the corpus, then the exact
    fixed-point BM25 integer forms shared with the bm25_probe oracles."""
    from ..operators.retrieval import B_FP, K1_FP
    from .pipeline import _TOKS_SQL

    branches = []
    for p in _PHRASES:
        words = p.split()
        n = len(words)
        conds = " AND ".join(
            f"toks[i + {j}] = '{w}'" for j, w in enumerate(words)
        )
        branches.append(
            f"SELECT '{p}' AS phrase, doc_id, "
            f"CASE WHEN len(toks) >= {n} THEN "
            f"CAST(len(list_filter(range(1, len(toks) - {n} + 2), i -> {conds})) AS BIGINT) "
            f"ELSE 0 END AS phrase_tf FROM d"
        )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    lens AS (SELECT doc_id, len(toks) AS dl FROM d WHERE len(toks) >= 1),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS avgdl_fp
              FROM lens),
    u AS ({' UNION ALL '.join(branches)}),
    m AS (SELECT phrase, doc_id, phrase_tf FROM u WHERE phrase_tf > 0),
    dfq AS (SELECT phrase, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY 1),
    s AS (SELECT m.phrase, m.doc_id, m.phrase_tf, dfq.df,
                 (n_docs - df) * 1000 // (df + 1) + 1000 AS idf_fp,
                 (1000 - {B_FP}) + ({B_FP} * dl * 1000) // avgdl_fp AS norm_fp
          FROM m JOIN dfq USING (phrase) JOIN lens USING (doc_id)
          CROSS JOIN stats),
    s2 AS (SELECT phrase, doc_id, phrase_tf, df,
                  (phrase_tf * {K1_FP + 1000} * idf_fp)
                    // (phrase_tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM s),
    r AS (SELECT phrase, doc_id, phrase_tf, df,
                 CAST(score_fp AS BIGINT) AS score_fp,
                 row_number() OVER (PARTITION BY phrase
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM s2)
    SELECT phrase, doc_id, phrase_tf, df, score_fp, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_phrase_bm25",
    _phrase_bm25_oracle(),
    doc="BM25-SCORED phrase search from the positional sidecar "
    "(operators/text_index.py:phrase_bm25_probe) — Lucene's PhraseQuery "
    "scoring contract: the phrase frequency rides the same fixed-point "
    "BM25 formula as term queries, with df computed from the matched set "
    "itself (phrases have no precomputed dictionary row) and dl joined "
    "from the pruned postings scan (the denormalized impact-file column "
    "— no corpus-sized join). Top-5 per phrase by score, not raw "
    "phrase_tf: a rare phrase in a short doc now outranks a common one "
    "in a long doc, which raw-count ranking (tx_phrase_stored) cannot "
    "express. Same batched one-scan matched-set core as the other "
    "phrase probes; the oracle replays phrase_tf + df + corpus stats + "
    "the integer BM25 forms relationally",
)
def tx_phrase_bm25(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        phrase_bm25_probe,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="phrase_bm25_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, positions=True
    )
    return phrase_bm25_probe(spark, path, _PHRASES, k=5)


_PREFIXES_Q = ["s", "qu", "c", "zz"]


def _prefix_oracle(k: int = 5) -> str:
    from .pipeline import _TOKS_SQL

    values = ", ".join(f"('{p}')" for p in _PREFIXES_Q)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    pf(prefix) AS (VALUES {values}),
    m AS (SELECT pf.prefix, p.term, p.doc_id, p.tf
          FROM post p JOIN pf ON p.term LIKE pf.prefix || '%'),
    g AS (SELECT prefix, doc_id,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                 CAST(sum(tf) AS BIGINT) AS total_tf
          FROM m GROUP BY 1, 2),
    r AS (SELECT prefix, doc_id, n_terms, total_tf,
                 row_number() OVER (PARTITION BY prefix
                                    ORDER BY total_tf DESC, doc_id ASC) AS rnk
          FROM g)
    SELECT prefix, doc_id, n_terms, total_tf, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_term_prefix",
    _prefix_oracle(),
    doc="prefix term query from the persisted index (Lucene's PrefixQuery "
    "shape, operators/text_index.py:prefix_probe): expansion reads the "
    "VOCABULARY-sized terms/ dictionary (a prefix cannot be hash-routed "
    "— the bucket hashes the whole term; stated honestly, the dictionary "
    "is orders of magnitude smaller than the corpus and startsWith pushes "
    "into its scan), then the DOCUMENT-sized postings read is pruned to "
    "the expanded terms' buckets exactly like bm25_probe. max_expansions "
    "is Lucene's degenerate-prefix guard — the expansion collect is "
    "CAPPED before it can pull an unbounded term list onto the driver. "
    "Per-prefix top-5 docs by summed tf over expanded terms (ties doc_id "
    "asc) with the distinct-term count; one probed prefix ('zz') matches "
    "nothing and must yield the same empty branch in both engines. "
    "Prefixes restricted to [a-z0-9]+ so the oracle's LIKE replay is "
    "metacharacter-exact",
)
def tx_term_prefix(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import prefix_probe, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="prefix_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return prefix_probe(spark, path, _PREFIXES_Q, k=5)


_FUZZY_QUERIES = ["spar", "grup", "windo", "batch", "qzx"]


def _fuzzy_oracle(k: int = 5) -> str:
    from .pipeline import _TOKS_SQL

    values = ", ".join(f"('{q}')" for q in _FUZZY_QUERIES)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    dict AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             FROM tok GROUP BY 1),
    q(query) AS (VALUES {values}),
    m AS (SELECT q.query, dict.term,
                 CAST(levenshtein(q.query, dict.term) AS INTEGER) AS dist,
                 dict.df
          FROM q, dict WHERE levenshtein(q.query, dict.term) <= 1),
    r AS (SELECT query, term, dist, df,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY dist ASC, df DESC, term ASC) AS rnk
          FROM m)
    SELECT query, term, dist, df, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_term_fuzzy",
    _fuzzy_oracle(),
    doc="typo-tolerant term lookup at edit distance <= 1 from the "
    "persisted dictionary (operators/text_index.py:fuzzy_term_probe) — "
    "the SymSpell shape: candidates from an EQUI-join of deletion "
    "neighborhoods (a string plus its single-char deletions; ED<=1 pairs "
    "always share a member), exact levenshtein verifies candidates only. "
    "The naive form is levenshtein over |queries| x |vocabulary| — a "
    "cross join; the neighborhood join shuffles O(vocab x term_len) "
    "short variants instead, the same never-all-pairs discipline as the "
    "LSH dedup tier. Suggestions rank (dist asc, df desc, term asc): "
    "exact hits first, then corpus-attested corrections; one query "
    "('qzx') matches nothing and must yield the same empty branch in "
    "both engines. The ORACLE brute-forces all pairs deliberately — the "
    "vocabulary is tiny in DuckDB and exactness is the point; the Spark "
    "side is the shape that survives a 100M-term dictionary",
)
def tx_term_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import fuzzy_term_probe, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="fuzzy_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return fuzzy_term_probe(spark, path, _FUZZY_QUERIES, k=5)


_MULTI_QUERIES = ["slow hash", "table merge group", "spark window"]


def _bm25_multi_oracle(
    k: int = 5, modes: tuple = ("or", "and"), doc_where: str = ""
) -> str:
    """Replays ranked multi-term retrieval: per-term fixed-point BM25
    (the shared integer forms), summed per (query, doc), OR semantics
    ranked as-is and AND semantics ranked over docs carrying every query
    term — the requested ``modes`` branches under a mode column
    (tx_bm25_maxscore shares the OR branch verbatim: the MaxScore probe
    is value-identical to the exact OR ranking by contract)."""
    from ..operators.retrieval import B_FP, K1_FP
    from .pipeline import _TOKS_SQL

    all_terms = sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    qt_values = ", ".join(
        f"('{q}', '{t}')" for q in _MULTI_QUERIES for t in sorted(set(q.split()))
    )
    nq_values = ", ".join(
        f"('{q}', {len(set(q.split()))})" for q in _MULTI_QUERIES
    )
    branches = " UNION ALL ".join(
        f"""SELECT '{m}' AS mode, query, doc_id, n_terms, score_fp, rnk
    FROM r_{m} WHERE rnk <= {k}"""
        for m in modes
    )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents {doc_where}),
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
    s2 AS (SELECT term, doc_id,
                  (tf * {K1_FP + 1000} * idf_fp)
                    // (tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM scored),
    qt(query, term) AS (VALUES {qt_values}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    nq(query, n) AS (VALUES {nq_values}),
    r_or AS (SELECT query, doc_id, n_terms, score_fp,
                    row_number() OVER (PARTITION BY query
                                       ORDER BY score_fp DESC, doc_id ASC) AS rnk
             FROM g),
    r_and AS (SELECT g.query, g.doc_id, g.n_terms, g.score_fp,
                     row_number() OVER (PARTITION BY g.query
                                        ORDER BY g.score_fp DESC, g.doc_id ASC) AS rnk
              FROM g JOIN nq ON g.query = nq.query AND g.n_terms = nq.n)
    {branches}
    """


@register(
    "tx_bm25_multiterm",
    _bm25_multi_oracle(),
    doc="RANKED multi-term retrieval from the stored index "
    "(operators/text_index.py:bm25_query_topk) — the canonical IR query "
    "shape a search box issues, which per-TERM rankings (tx_bm25_stored) "
    "don't answer: a query is a bag of words, a doc's score is the SUM "
    "of its per-term fixed-point BM25 contributions, top-5 docs per "
    "query. Both boolean modes in one value-checked result: OR (any "
    "term; multi-term docs naturally outrank) and AND (conjunctive — "
    "docs carrying every query term, the n_terms completeness filter). "
    "Batched like every serving probe: one postings scan pruned to the "
    "union of the queries' term buckets, broadcast (query, term) "
    "fan-out, one (query, doc) sum, one window — plan constant in query "
    "count. The oracle replays per-term scores + the per-query sum + "
    "both mode rankings relationally",
)
def tx_bm25_multiterm(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_query_topk, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_multi_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    cols = ["mode", "query", "doc_id", "n_terms", "score_fp", "rnk"]
    o = bm25_query_topk(spark, path, _MULTI_QUERIES, k=5).withColumn(
        "mode", F.lit("or")
    ).select(cols)
    a = bm25_query_topk(spark, path, _MULTI_QUERIES, k=5, require_all=True).withColumn(
        "mode", F.lit("and")
    ).select(cols)
    return o.unionByName(a)


@register(
    "tx_bm25_maxscore",
    _bm25_multi_oracle(modes=("or",)),
    doc="MaxScore / WAND-lite ranked retrieval "
    "(operators/text_index.py:bm25_query_topk_maxscore) — the candidate "
    "bounding every serving engine applies when a query mixes rare and "
    "stop-word-like terms (Lucene MAXSCORE/BlockMaxWAND): the dictionary "
    "stores per-term impact bounds (max_tf, min_dl — maintained through "
    "build/add/compact/merge), the probe computes fixed-point score "
    "upper bounds from LIVE df/stats, lower-bounds the kth final score "
    "with the best term's kth single-term score, and generates "
    "candidates from ESSENTIAL terms only — the common term's "
    "corpus-sized postings never feed the aggregate (WAND_WIN.json "
    "measures the row cut). The bound must never change answers: this "
    "query shares tx_bm25_multiterm's OR-branch oracle verbatim, so the "
    "driver value-checks identity with exact BM25, and "
    "tests/test_text_index_r15.py pins equality across the "
    "add/delete/compact/merge lifecycle",
)
def tx_bm25_maxscore(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_query_topk_maxscore, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_wand_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return (
        # min_docs_for_pruning=0 forces the MaxScore/BMW machinery even at
        # driver scale (the cost dispatch would delegate to the exact
        # probe below 1M docs) so the driver value-checks the pruning
        # path itself, not its bypass
        bm25_query_topk_maxscore(spark, path, _MULTI_QUERIES, k=5, min_docs_for_pruning=0)
        .withColumn("mode", F.lit("or"))
        .select("mode", "query", "doc_id", "n_terms", "score_fp", "rnk")
    )


def _snippet_oracle(k: int = 5, ctx: int = 3) -> str:
    """Replays phrase match starts + ranking + the clamped token-window
    slice from the raw corpus (DuckDB list slices are 1-based and
    inclusive on both ends, clamping out-of-range — matched to Spark's
    slice(toks, lo, hi - lo + 1) exactly)."""
    from .pipeline import _TOKS_SQL

    branches = []
    for p in _PHRASES:
        words = p.split()
        n = len(words)
        conds = " AND ".join(
            f"toks[i + {j}] = '{w}'" for j, w in enumerate(words)
        )
        branches.append(
            f"SELECT '{p}' AS phrase, doc_id, toks, {n} AS n_words, "
            f"CASE WHEN len(toks) >= {n} THEN "
            f"list_filter(range(1, len(toks) - {n} + 2), i -> {conds}) "
            f"ELSE CAST([] AS BIGINT[]) END AS starts FROM d"
        )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    u AS ({' UNION ALL '.join(branches)}),
    m AS (SELECT phrase, doc_id, toks, n_words,
                 CAST(len(starts) AS BIGINT) AS phrase_tf,
                 CAST(starts[1] AS INTEGER) AS first_pos
          FROM u WHERE len(starts) > 0),
    r AS (SELECT phrase, doc_id, toks, n_words, phrase_tf, first_pos,
                 row_number() OVER (PARTITION BY phrase
                                    ORDER BY phrase_tf DESC, doc_id ASC) AS rnk
          FROM m)
    SELECT phrase, doc_id, phrase_tf, first_pos,
           array_to_string(
             toks[greatest(1, first_pos - {ctx}):
                  least(len(toks), first_pos + n_words - 1 + {ctx})], ' ')
             AS snippet,
           rnk
    FROM r WHERE rnk <= {k}
    """


@register(
    "tx_phrase_snippets",
    _snippet_oracle(),
    doc="phrase search WITH SNIPPETS (the Lucene highlighter shape, "
    "operators/text_index.py:phrase_snippet_probe): top-5 docs per "
    "phrase from the positional sidecar's batched one-scan probe, each "
    "with the token window around its FIRST occurrence (3 tokens of "
    "context each side, clamped at document bounds) cut from the doc "
    "store AFTER ranking — the tiny ranked set (|phrases| x k ids + "
    "integer positions) broadcasts against the corpus, so text is "
    "touched only for the winners and never shuffled; rank work never "
    "reads text at all. The match start backs out of the adjacency "
    "fold's final array (min(last-word positions) - |words| + 1). The "
    "oracle replays starts, ranking, and the clamped slice with DuckDB "
    "list ops (1-based inclusive slices on both engines, inclusivity "
    "matched explicitly) — the snippet STRINGS hash bit-identically",
)
def tx_phrase_snippets(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        phrase_snippet_probe,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="phrase_snip_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, positions=True
    )
    return phrase_snippet_probe(spark, path, docs, _PHRASES, k=5, ctx=3)


_SUFFIXES_Q = ["w", "er", "le", "zz"]


def _suffix_oracle(k: int = 5) -> str:
    from .pipeline import _TOKS_SQL

    values = ", ".join(f"('{s}')" for s in _SUFFIXES_Q)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    sf(suffix) AS (VALUES {values}),
    m AS (SELECT sf.suffix, p.term, p.doc_id, p.tf
          FROM post p JOIN sf ON p.term LIKE '%' || sf.suffix),
    g AS (SELECT suffix, doc_id,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                 CAST(sum(tf) AS BIGINT) AS total_tf
          FROM m GROUP BY 1, 2),
    r AS (SELECT suffix, doc_id, n_terms, total_tf,
                 row_number() OVER (PARTITION BY suffix
                                    ORDER BY total_tf DESC, doc_id ASC) AS rnk
          FROM g)
    SELECT suffix, doc_id, n_terms, total_tf, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_term_suffix",
    _suffix_oracle(),
    doc="suffix term query — the leading-wildcard '*ing' shape — served "
    "through the REVERSED dictionary (operators/text_index.py:"
    "write_reversed_terms/suffix_probe — Lucene's reversed-field trick): "
    "rterms/ stores (reverse(term), term, df) GLOBALLY SORTED by rterm, "
    "turning the unsargable endswith into a startsWith RANGE predicate "
    "parquet answers from row-group min/max stats; the document-sized "
    "postings read then prunes to the matched terms' buckets like "
    "prefix_probe. Same max_expansions cap, same constant-score output, "
    "one suffix ('zz') matching nothing. The oracle replays expansion "
    "with LIKE '%'||suffix over the raw corpus",
)
def tx_term_suffix(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        suffix_probe,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="suffix_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, reversed_terms=True
    )
    return suffix_probe(spark, path, _SUFFIXES_Q, k=5)


def _facet_oracle(k_facets: int = 10) -> str:
    from .pipeline import _TOKS_SQL

    all_terms = sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    qt_values = ", ".join(
        f"('{q}', '{t}')" for q in _MULTI_QUERIES for t in sorted(set(q.split()))
    )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT DISTINCT term, doc_id FROM tok WHERE term IN ({terms_in})),
    qt(query, term) AS (VALUES {qt_values}),
    m AS (SELECT DISTINCT qt.query, p.doc_id FROM post p JOIN qt ON p.term = qt.term),
    g AS (SELECT m.query, doc.source AS facet, CAST(count(*) AS BIGINT) AS n_docs
          FROM m JOIN documents doc ON doc.doc_id = m.doc_id
          GROUP BY 1, 2),
    r AS (SELECT query, facet, n_docs,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY n_docs DESC, facet ASC NULLS LAST) AS rnk
          FROM g)
    SELECT query, facet, n_docs, rnk FROM r WHERE rnk <= {k_facets}
    """


@register(
    "tx_bm25_facets",
    _facet_oracle(),
    doc="FACET counts for multi-term queries (the search-engine "
    "aggregation panel — Elasticsearch terms-agg, operators/text_index"
    ".py:bm25_facet_counts): per query, matching-document counts by the "
    "doc-store 'source' column, ranked desc — summarizing the WHOLE "
    "matching set (OR semantics), not the top-k page, which is the "
    "product contract (sidebar counts don't change as you paginate). "
    "Matching pairs ride the same pruned postings scan + broadcast "
    "(query, term) fan-out as tx_bm25_multiterm; the facet column joins "
    "COLUMN-PRUNED from the doc store (two columns, never text) — a "
    "real shuffle join, correctly, because the matching set is corpus-"
    "proportional for common terms. The oracle replays matching + the "
    "facet rollup relationally",
)
def tx_bm25_facets(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_facet_counts, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_facets_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return bm25_facet_counts(spark, path, docs, _MULTI_QUERIES, "source", k_facets=10)


_BOOSTS = {"hash": 2000, "slow": 500, "group": 1500}


def _bm25_boosted_oracle(k: int = 5) -> str:
    """The multi-term replay with query-time term boosts folded in before
    the per-query sum: contribution = (score_fp * boost) // 1000, boost
    defaulting to 1000 (neutral) for unlisted terms."""
    from ..operators.retrieval import B_FP, K1_FP
    from .pipeline import _TOKS_SQL

    all_terms = sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    qt_values = ", ".join(
        f"('{q}', '{t}')" for q in _MULTI_QUERIES for t in sorted(set(q.split()))
    )
    boost_values = ", ".join(f"('{t}', {v})" for t, v in sorted(_BOOSTS.items()))
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
    s2 AS (SELECT term, doc_id,
                  (tf * {K1_FP + 1000} * idf_fp)
                    // (tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM scored),
    b(term, boost) AS (VALUES {boost_values}),
    qt(query, term) AS (VALUES {qt_values}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum((s.score_fp * coalesce(b.boost, 1000)) // 1000)
                      AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term
          LEFT JOIN b ON b.term = s.term GROUP BY 1, 2),
    r AS (SELECT query, doc_id, n_terms, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g)
    SELECT query, doc_id, n_terms, score_fp, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_bm25_boosted",
    _bm25_boosted_oracle(),
    doc="query-time TERM BOOSTING (Lucene's term^2.0) on the ranked "
    "multi-term probe: fixed-point integer multipliers per term (1000 = "
    "neutral, 2000 doubles a term's contribution, 500 halves it), "
    "applied to each per-term BM25 contribution BEFORE the per-query "
    "sum — integer end-to-end, so boosted scores hash bit-identically "
    "in the oracle. The boost table rides the same broadcast (query, "
    "term) fan-out as the unboosted probe: zero extra plan nodes, same "
    "one pruned postings scan. Here 'hash' is doubled, 'slow' halved, "
    "'group' x1.5 across the standard 3-query batch — rank inversions "
    "vs tx_bm25_multiterm are the point and the oracle pins them",
)
def tx_bm25_boosted(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_query_topk, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_boost_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return bm25_query_topk(spark, path, _MULTI_QUERIES, k=5, boosts=_BOOSTS)


def _bm25_paged_oracle(k: int = 5) -> str:
    """Two chained search_after pages replayed as one global ranking:
    the cursor is the exact (score_fp, doc_id) of each query's rank-k
    hit and the order is total (doc_id ties), so page 2 is exactly
    global ranks k+1..2k with page-local rank numbering."""
    from ..operators.retrieval import B_FP, K1_FP
    from .pipeline import _TOKS_SQL

    all_terms = sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    qt_values = ", ".join(
        f"('{q}', '{t}')" for q in _MULTI_QUERIES for t in sorted(set(q.split()))
    )
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
    s2 AS (SELECT term, doc_id,
                  (tf * {K1_FP + 1000} * idf_fp)
                    // (tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM scored),
    qt(query, term) AS (VALUES {qt_values}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    r AS (SELECT query, doc_id, n_terms, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS grk
          FROM g)
    SELECT 1 AS page, query, doc_id, n_terms, score_fp, CAST(grk AS INT) AS rnk
    FROM r WHERE grk <= {k}
    UNION ALL
    SELECT 2 AS page, query, doc_id, n_terms, score_fp,
           CAST(grk - {k} AS INT) AS rnk
    FROM r WHERE grk > {k} AND grk <= {2 * k}
    """


@register(
    "tx_bm25_paged",
    _bm25_paged_oracle(),
    doc="CURSOR pagination (Elasticsearch's search_after, operators/"
    "text_index.py:bm25_query_page): page 2 is served from the page-1 "
    "cursor — each query's (score_fp, doc_id) at rank k, collected "
    "driver-side (|queries| scalars) exactly as a serving client would "
    "chain pages — applied BEFORE the top-k window as a broadcast "
    "strictly-after filter on the total order (score desc, doc_id asc; "
    "the doc_id tie-break is what makes the cursor total, so pages can "
    "never skip or repeat a document). Deep paging stays O(page) where "
    "offset paging recomputes every earlier page. Both pages in one "
    "value-checked result: the oracle replays the GLOBAL ranking and "
    "pins page 2 as exactly ranks k+1..2k with page-local numbering",
)
def tx_bm25_paged(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_query_page, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_paged_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    cols = ["page", "query", "doc_id", "n_terms", "score_fp", "rnk"]
    p1 = bm25_query_page(spark, path, _MULTI_QUERIES, k=5)
    p1_rows = p1.collect()  # bounded: |queries| x k — the client's page
    cursors = {}
    for r in p1_rows:
        cur = cursors.get(r["query"])
        if cur is None or r["rnk"] > cur[2]:
            cursors[r["query"]] = (int(r["score_fp"]), int(r["doc_id"]), r["rnk"])
    after = {q: (s, d) for q, (s, d, _) in cursors.items()}
    p2 = bm25_query_page(spark, path, _MULTI_QUERIES, k=5, after=after)
    p1_df = spark.createDataFrame(p1_rows, p1.schema).withColumn(
        "page", F.lit(1).cast("int")
    ).select(cols)
    return p1_df.unionByName(p2.withColumn("page", F.lit(2).cast("int")).select(cols))


def _suffix_lifecycle_oracle(k: int = 5) -> str:
    """Replays build -> ADD -> probe -> DELETE+COMPACT -> probe for the
    suffix tier. The 'added' phase is the FULL-corpus suffix ranking —
    value-checking it after an incremental add is what proves the
    reversed dictionary rode the lifecycle (a stale rterms/ would
    silently miss terms only the added docs carry; the old contract
    hard-refused until a manual rebuild). Victims are each suffix's
    rank-1 doc; the 'compacted' phase is the victims-excluded ranking
    (suffix results carry no corpus statistics, so exclusion is exact)."""
    from .pipeline import _TOKS_SQL

    values = ", ".join(f"('{s}')" for s in _SUFFIXES_Q)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    sf(suffix) AS (VALUES {values}),
    m AS (SELECT sf.suffix, p.term, p.doc_id, p.tf
          FROM post p JOIN sf ON p.term LIKE '%' || sf.suffix),
    g AS (SELECT suffix, doc_id,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                 CAST(sum(tf) AS BIGINT) AS total_tf
          FROM m GROUP BY 1, 2),
    fr AS (SELECT suffix, doc_id, n_terms, total_tf,
                  row_number() OVER (PARTITION BY suffix
                                     ORDER BY total_tf DESC, doc_id ASC) AS rnk
           FROM g),
    vict AS (SELECT DISTINCT doc_id FROM fr WHERE rnk = 1),
    sr AS (SELECT suffix, doc_id, n_terms, total_tf,
                  row_number() OVER (PARTITION BY suffix
                                     ORDER BY total_tf DESC, doc_id ASC) AS rnk
           FROM g WHERE doc_id NOT IN (SELECT doc_id FROM vict))
    SELECT 'added' AS phase, suffix, doc_id, n_terms, total_tf, rnk
    FROM fr WHERE rnk <= {k}
    UNION ALL
    SELECT 'compacted' AS phase, suffix, doc_id, n_terms, total_tf, rnk
    FROM sr WHERE rnk <= {k}
    """


@register(
    "tx_term_suffix_lifecycle",
    _suffix_lifecycle_oracle(),
    doc="the reversed dictionary RIDING the index lifecycle (r14: "
    "operators/text_index.py bm25_index_add/compact/merge rebuild "
    "rterms/ whenever it exists — it is a pure, vocabulary-sized "
    "function of terms/): build on 80% of the corpus, write_reversed_"
    "terms, ADD the rest, then suffix_probe with NO manual rebuild — "
    "the 'added' phase must equal the full-corpus suffix ranking "
    "(previously this hard-refused on the staleness guard until a "
    "manual write_reversed_terms). Then DELETE each suffix's rank-1 doc "
    "and COMPACT (bucket-selective): the 'compacted' phase must be the "
    "victims-excluded ranking served through the compact-rebuilt "
    "reversed dictionary. The snapshot staleness guard stays as the "
    "backstop for out-of-band mutations",
)
def tx_term_suffix_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_index_add,
        bm25_index_compact,
        bm25_index_delete,
        suffix_probe,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="suffix_lc_")
    shutil.rmtree(path, ignore_errors=True)
    base = docs.where(F.col("doc_id") % 5 != 3)
    write_bm25_index(
        spark, base, path, "doc_id", "text", n_buckets=16, reversed_terms=True
    )
    bm25_index_add(
        spark, docs.where(F.col("doc_id") % 5 == 3), path, "doc_id", "text"
    )
    cols = ["phase", "suffix", "doc_id", "n_terms", "total_tf", "rnk"]
    added = suffix_probe(spark, path, _SUFFIXES_Q, k=5).withColumn(
        "phase", F.lit("added")
    ).select(cols)
    # collect BEFORE compact rewrites the files a lazy plan would re-read
    # (bounded: |suffixes| x k rows); victims = each suffix's rank-1 doc
    added_rows = added.collect()
    victims = sorted({int(r["doc_id"]) for r in added_rows if r["rnk"] == 1})
    bm25_index_delete(spark, path, victims)
    bm25_index_compact(spark, path)
    compacted = suffix_probe(spark, path, _SUFFIXES_Q, k=5).withColumn(
        "phase", F.lit("compacted")
    ).select(cols)
    return spark.createDataFrame(added_rows, compacted.schema).unionByName(compacted)


def _phrase_paged_oracle(k: int = 5) -> str:
    """Two chained search_after pages over the phrase ranking replayed as
    one global ranking (the _bm25_paged_oracle contract on phrase_tf):
    page 2 is exactly global ranks k+1..2k with page-local numbering —
    the (phrase_tf desc, doc_id asc) order is total, so pages can never
    skip or repeat a document."""
    from .pipeline import _TOKS_SQL

    branches = []
    for p in _PHRASES:
        words = p.split()
        n = len(words)
        conds = " AND ".join(
            f"toks[i + {j}] = '{w}'" for j, w in enumerate(words)
        )
        branches.append(
            f"SELECT '{p}' AS phrase, doc_id, "
            f"CASE WHEN len(toks) >= {n} THEN "
            f"CAST(len(list_filter(range(1, len(toks) - {n} + 2), i -> {conds})) AS BIGINT) "
            f"ELSE 0 END AS phrase_tf FROM d"
        )
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    u AS ({' UNION ALL '.join(branches)}),
    m AS (SELECT phrase, doc_id, phrase_tf FROM u WHERE phrase_tf > 0),
    r AS (SELECT phrase, doc_id, phrase_tf,
                 row_number() OVER (PARTITION BY phrase
                                    ORDER BY phrase_tf DESC, doc_id ASC) AS grk
          FROM m)
    SELECT 1 AS page, phrase, doc_id, phrase_tf, CAST(grk AS INT) AS rnk
    FROM r WHERE grk <= {k}
    UNION ALL
    SELECT 2 AS page, phrase, doc_id, phrase_tf, CAST(grk - {k} AS INT) AS rnk
    FROM r WHERE grk > {k} AND grk <= {2 * k}
    """


@register(
    "tx_phrase_paged",
    _phrase_paged_oracle(),
    doc="CURSOR pagination on the PHRASE ranking (search_after for the "
    "positional tier — r14, the bm25_query_page contract extended to "
    "phrase_probe_batched's after=): page 2 is served from each "
    "phrase's page-1 cursor (its (phrase_tf, doc_id) at rank k, "
    "collected driver-side exactly as a paging client would), applied "
    "BEFORE the top-k window as a broadcast strictly-after filter on "
    "the (phrase_tf desc, doc_id asc) total order — later pages rank "
    "strictly fewer rows, deep paging stays O(page). Both pages in one "
    "value-checked result; the oracle replays the GLOBAL phrase ranking "
    "and pins page 2 as exactly ranks k+1..2k",
)
def tx_phrase_paged(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        phrase_probe_batched,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="phrase_paged_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, positions=True
    )
    cols = ["page", "phrase", "doc_id", "phrase_tf", "rnk"]
    p1 = phrase_probe_batched(spark, path, _PHRASES, k=5)
    p1_rows = p1.collect()  # bounded: |phrases| x k — the client's page
    cursors = {}
    for r in p1_rows:
        cur = cursors.get(r["phrase"])
        if cur is None or r["rnk"] > cur[2]:
            cursors[r["phrase"]] = (int(r["phrase_tf"]), int(r["doc_id"]), r["rnk"])
    after = {p: (tf, d) for p, (tf, d, _) in cursors.items()}
    # a phrase with no page-1 hits has no cursor and is not paged further
    # (the search_after client contract: you page what you saw)
    p2_phrases = [p for p in _PHRASES if p in after]
    p1_df = spark.createDataFrame(p1_rows, p1.schema).withColumn(
        "page", F.lit(1).cast("int")
    ).select(cols)
    if not p2_phrases:
        return p1_df
    p2 = phrase_probe_batched(spark, path, p2_phrases, k=5, after=after)
    return p1_df.unionByName(p2.withColumn("page", F.lit(2).cast("int")).select(cols))


@register(
    "tx_bm25_facets_stored",
    _facet_oracle(),
    doc="facet counts answered ENTIRELY from index artifacts (r14: "
    "operators/text_index.py write_doc_facets/bm25_facet_counts_stored "
    "— Lucene doc values / ES doc_values): the facets/ sidecar stores "
    "the column-pruned (doc_id, facet...) rows INSIDE the index dir at "
    "build time, so the serving tier needs no doc-store access at query "
    "time — tx_bm25_facets' ad-hoc form requires the caller to hand the "
    "doc store in. The sidecar RIDES the lifecycle: this query builds "
    "on 75% of the corpus, incrementally adds the rest (bm25_index_add "
    "+ doc_facets_add — per-document rows, appends touch zero existing "
    "bytes), then answers facets from the stored artifacts alone under "
    "the SAME oracle as the ad-hoc form (the lifecycle must be value-"
    "invisible)",
)
def tx_bm25_facets_stored(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_facet_counts_stored,
        bm25_index_add,
        doc_facets_add,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_facets_st_")
    shutil.rmtree(path, ignore_errors=True)
    base = docs.where(F.col("doc_id") % 4 != 1)
    rest = docs.where(F.col("doc_id") % 4 == 1)
    write_bm25_index(
        spark, base, path, "doc_id", "text", n_buckets=16, facet_cols=["source"]
    )
    bm25_index_add(spark, rest, path, "doc_id", "text")
    doc_facets_add(spark, rest, path)
    return bm25_facet_counts_stored(spark, path, _MULTI_QUERIES, "source", k_facets=10)


# --------------------------------------------------------------------------
# round-14 serving extensions: wildcard terms, planned filtered retrieval,
# diversified top-k, more-like-this, tiered segment maintenance
# --------------------------------------------------------------------------

_WILDCARDS_Q = ["ar", "ou", "qq"]


def _wildcard_oracle(k: int = 5) -> str:
    from .pipeline import _TOKS_SQL

    values = ", ".join(f"('{p}')" for p in _WILDCARDS_Q)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    wc(pattern) AS (VALUES {values}),
    m AS (SELECT wc.pattern, p.term, p.doc_id, p.tf
          FROM post p JOIN wc ON p.term LIKE '%' || wc.pattern || '%'),
    g AS (SELECT pattern, doc_id,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                 CAST(sum(tf) AS BIGINT) AS total_tf
          FROM m GROUP BY 1, 2),
    r AS (SELECT pattern, doc_id, n_terms, total_tf,
                 row_number() OVER (PARTITION BY pattern
                                    ORDER BY total_tf DESC, doc_id ASC) AS rnk
          FROM g)
    SELECT pattern, doc_id, n_terms, total_tf, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_term_wildcard",
    _wildcard_oracle(),
    doc="infix term query — the double-wildcard '*sub*' shape (Lucene "
    "WildcardQuery with leading AND trailing *) — served from the "
    "persisted dictionary (operators/text_index.py:wildcard_probe): an "
    "infix match is UNSARGABLE (neither the forward nor the reversed "
    "dictionary can range-skip it), so the expansion is honestly a full "
    "dictionary scan — acceptable because terms/ is VOCABULARY-sized "
    "(Heaps-law sublinear in the corpus) while the corpus-sized postings "
    "read still prunes to the matched terms' buckets. Same "
    "max_expansions driver-collect guard and [a-z0-9]+ charset as "
    "prefix/suffix (LIKE-metacharacter-exact replay); one pattern "
    "('qq') matches nothing. The oracle replays expansion with "
    "LIKE '%'||pattern||'%' over the raw corpus",
)
def tx_term_wildcard(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import wildcard_probe, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="wildcard_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return wildcard_probe(spark, path, _WILDCARDS_Q, k=5)


def _bm25_scored_ctes(doc_pred: str = "TRUE", terms: list[str] | None = None) -> str:
    """Shared per-term fixed-point BM25 CTE scaffold over the documents
    restricted by ``doc_pred`` (corpus stats restrict WITH the predicate —
    used by the per-segment replay in tx_bm25_tiered): yields s2(term,
    doc_id, score_fp) for the given term set (default: _MULTI_QUERIES'
    terms), matching the integer forms in operators/retrieval.py
    exactly."""
    from ..operators.retrieval import B_FP, K1_FP
    from .pipeline import _TOKS_SQL

    all_terms = terms or sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    return rf"""
    d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
          WHERE {doc_pred}),
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
    s2 AS (SELECT term, doc_id,
                  (tf * {K1_FP + 1000} * idf_fp)
                    // (tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM scored)
    """


def _qt_values() -> str:
    return ", ".join(
        f"('{q}', '{t}')" for q in _MULTI_QUERIES for t in sorted(set(q.split()))
    )


_FILTER_SEL = ("source", ["src1", "src3"])
_FILTER_BROAD = ("lang", ["en", "zh", "es"])


def _bm25_filtered_oracle(k: int = 5) -> str:
    sel_in = ", ".join(f"'{v}'" for v in _FILTER_SEL[1])
    broad_in = ", ".join(f"'{v}'" for v in _FILTER_BROAD[1])
    return rf"""
    WITH {_bm25_scored_ctes()},
    qt(query, term) AS (VALUES {_qt_values()}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    f_sel AS (SELECT doc_id FROM documents
              WHERE {_FILTER_SEL[0]} IN ({sel_in})),
    f_broad AS (SELECT doc_id FROM documents
                WHERE {_FILTER_BROAD[0]} IN ({broad_in})),
    r_sel AS (SELECT query, doc_id, n_terms, score_fp,
                     row_number() OVER (PARTITION BY query
                                        ORDER BY score_fp DESC, doc_id ASC) AS rnk
              FROM g JOIN f_sel USING (doc_id)),
    r_broad AS (SELECT query, doc_id, n_terms, score_fp,
                       row_number() OVER (PARTITION BY query
                                          ORDER BY score_fp DESC, doc_id ASC) AS rnk
                FROM g JOIN f_broad USING (doc_id))
    SELECT 'sel' AS mode, query, doc_id, n_terms, score_fp, rnk
    FROM r_sel WHERE rnk <= {k}
    UNION ALL
    SELECT 'broad' AS mode, query, doc_id, n_terms, score_fp, rnk
    FROM r_broad WHERE rnk <= {k}
    """


@register(
    "tx_bm25_filtered",
    _bm25_filtered_oracle(),
    doc="metadata-FILTERED ranked retrieval with a COST-BASED pre/post "
    "strategy (operators/text_index.py:bm25_query_topk_filtered + "
    "choose_filter_strategy — the Elasticsearch filter-context planning "
    "decision): selectivity is estimated from the index's OWN facets/ "
    "sidecar (one column-pruned aggregate, no doc-store access), then "
    "the eligible-set semi-join runs either on the pruned POSTINGS scan "
    "(selective filter — shrinks the aggregate's input) or on the "
    "already-aggregated per-doc rows before the window (broad filter — "
    "skips joining the corpus-sized side). Both strategies are EXACT "
    "pre-filter semantics around a per-doc-independent scorer, which is "
    "what lets the planner act on an estimate without risking a wrong "
    "answer. One value-checked result exercises BOTH paths: mode 'sel' "
    "(10% of docs -> pre) and 'broad' (~70% -> post), under one oracle "
    "that replays the filter relationally either way",
)
def tx_bm25_filtered(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_query_topk_filtered,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_filtered_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16,
        facet_cols=["source", "lang"],
    )
    cols = ["mode", "query", "doc_id", "n_terms", "score_fp", "rnk"]
    s = bm25_query_topk_filtered(
        spark, path, _MULTI_QUERIES, _FILTER_SEL[0], _FILTER_SEL[1], k=5
    ).withColumn("mode", F.lit("sel")).select(cols)
    b = bm25_query_topk_filtered(
        spark, path, _MULTI_QUERIES, _FILTER_BROAD[0], _FILTER_BROAD[1], k=5
    ).withColumn("mode", F.lit("broad")).select(cols)
    return s.unionByName(b)


def _bm25_diverse_oracle(k: int = 5, per_facet: int = 2) -> str:
    return rf"""
    WITH {_bm25_scored_ctes()},
    qt(query, term) AS (VALUES {_qt_values()}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    gf AS (SELECT g.query, g.doc_id, doc.source AS facet, g.n_terms, g.score_fp
           FROM g JOIN documents doc USING (doc_id)),
    c AS (SELECT *, row_number() OVER (PARTITION BY query, facet
                                       ORDER BY score_fp DESC, doc_id ASC)
                    AS facet_rnk
          FROM gf),
    r AS (SELECT query, doc_id, facet, n_terms, score_fp, facet_rnk,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM c WHERE facet_rnk <= {per_facet})
    SELECT query, doc_id, facet, n_terms, score_fp, facet_rnk, rnk
    FROM r WHERE rnk <= {k}
    """


@register(
    "tx_bm25_diverse",
    _bm25_diverse_oracle(),
    doc="DIVERSIFIED ranked retrieval (operators/text_index.py:"
    "bm25_query_topk_diverse — Google host-crowding / Elasticsearch "
    "field collapsing): within each query at most 2 hits per 'source' "
    "facet survive (best-scoring), and the top-5 ranks over the capped "
    "set — one dominant source can't monopolize the page. Served "
    "entirely from index artifacts: scores from the pruned postings "
    "scan, the facet from the index's own facets/ sidecar (column-"
    "pruned, never text). The policy is two stacked window functions — "
    "declarative, no UDFs, no driver work; facet_rnk rides the output "
    "so callers see why a higher-scoring doc was crowded out. The "
    "oracle replays both windows over the raw-corpus score replay",
)
def tx_bm25_diverse(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_query_topk_diverse,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_diverse_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, facet_cols=["source"]
    )
    return bm25_query_topk_diverse(
        spark, path, _MULTI_QUERIES, "source", k=5, per_facet=2
    )


_MLT_SEEDS = [3, 17, 42]


def _mlt_oracle(k: int = 5, m: int = 6) -> str:
    from ..operators.retrieval import B_FP, K1_FP
    from .pipeline import _TOKS_SQL

    seed_values = ", ".join(f"({s})" for s in _MLT_SEEDS)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    lens AS (SELECT doc_id, len(toks) AS dl FROM d WHERE len(toks) >= 1),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS avgdl_fp
              FROM lens),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post_all AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM post_all GROUP BY 1),
    seeds(seed_id) AS (VALUES {seed_values}),
    st AS (SELECT s.seed_id, p.term, p.tf
           FROM post_all p JOIN seeds s ON p.doc_id = s.seed_id
           WHERE regexp_matches(p.term, '^[a-z0-9]+$')),
    sel AS (SELECT seed_id, term,
                   row_number() OVER (
                     PARTITION BY seed_id
                     ORDER BY tf * ((n_docs - df) * 1000 // (df + 1) + 1000)
                              DESC, term ASC) AS trnk
            FROM st JOIN dfreq USING (term) CROSS JOIN stats),
    qt AS (SELECT seed_id, term FROM sel WHERE trnk <= {m}),
    scored AS (
      SELECT term, doc_id, tf, df,
             (n_docs - df) * 1000 // (df + 1) + 1000 AS idf_fp,
             (1000 - {B_FP}) + ({B_FP} * dl * 1000) // avgdl_fp AS norm_fp
      FROM post_all JOIN dfreq USING (term) JOIN lens USING (doc_id)
      CROSS JOIN stats
      WHERE term IN (SELECT term FROM qt)),
    s2 AS (SELECT term, doc_id,
                  (tf * {K1_FP + 1000} * idf_fp)
                    // (tf * 1000 + ({K1_FP} * norm_fp) // 1000) AS score_fp
           FROM scored),
    g AS (SELECT CAST(qt.seed_id AS BIGINT) AS seed_id, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term
          WHERE s.doc_id != qt.seed_id GROUP BY 1, 2),
    r AS (SELECT seed_id, doc_id, n_terms, score_fp,
                 row_number() OVER (PARTITION BY seed_id
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g)
    SELECT seed_id, doc_id, n_terms, score_fp, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_mlt",
    _mlt_oracle(),
    doc="MORE-LIKE-THIS retrieval (operators/text_index.py:mlt_probe — "
    "Lucene MoreLikeThis / Elasticsearch more_like_this): per SEED doc, "
    "a query is derived from the seed's own top-6 terms by tf x "
    "fixed-point idf (ties broken term-asc, charset-guarded to "
    "[a-z0-9]+), then every OTHER doc ranks by summed BM25 over those "
    "terms from the stored index, seed excluded. Seed texts come from a "
    "pushed-doc_id column-pruned doc-store read (|seeds| rows); df from "
    "a dictionary read pruned to the candidate terms' buckets; the "
    "ranking is the shared batched multi-term core (ONE pruned postings "
    "scan for all seeds). The oracle replays term selection AND the "
    "ranking relationally — integer end-to-end, so term choices and "
    "scores hash bit-identically",
)
def tx_mlt(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import mlt_probe, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="mlt_idx_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return mlt_probe(spark, path, docs, _MLT_SEEDS, k=5, max_query_terms=6)


def _tiered_oracle(k: int = 5) -> str:
    seg0 = _bm25_scored_ctes("doc_id % 3 = 0")
    merged = _bm25_scored_ctes()
    return rf"""
    WITH {seg0},
    qt(query, term) AS (VALUES {_qt_values()}),
    g0 AS (SELECT qt.query, s.doc_id,
                  CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                  CAST(sum(s.score_fp) AS BIGINT) AS score_fp
           FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    r0 AS (SELECT query, doc_id, n_terms, score_fp,
                  row_number() OVER (PARTITION BY query
                                     ORDER BY score_fp DESC, doc_id ASC) AS rnk
           FROM g0),
    m AS (WITH {merged},
          g AS (SELECT qt2.query, s.doc_id,
                       CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                       CAST(sum(s.score_fp) AS BIGINT) AS score_fp
                FROM s2 s JOIN (SELECT * FROM qt) qt2 ON s.term = qt2.term
                GROUP BY 1, 2)
          SELECT query, doc_id, n_terms, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g)
    SELECT 'seg0' AS mode, query, doc_id, n_terms, score_fp, rnk
    FROM r0 WHERE rnk <= {k}
    UNION ALL
    SELECT 'merged' AS mode, query, doc_id, n_terms, score_fp, rnk
    FROM m WHERE rnk <= {k}
    """


@register(
    "tx_bm25_tiered",
    _tiered_oracle(),
    doc="TIERED segment maintenance end-to-end (operators/index_admin.py "
    "— Lucene TieredMergePolicy's planning + the existing merge "
    "mechanism): three per-shard indexes build independently (doc_id "
    "mod 3 — the per-source/per-day build pattern), bm25_segment_stats "
    "reads each segment's own tiny stats row, plan_segment_merges "
    "(pure, deterministic, smallest-first, ceiling-aware) decides WHAT "
    "to merge, execute_merge_plan composes bm25_index_merge. Two "
    "value-checked phases: 'seg0' probes one pre-merge segment (scores "
    "use SEGMENT-local df/avgdl — the oracle replays stats restricted "
    "to that shard, pinning that per-segment statistics are honest) "
    "and 'merged' probes the planned 3-way merge result, which must "
    "equal a one-shot full-corpus build exactly (union-and-reaggregate "
    "of already-bucketed rows — no re-tokenization, no retraining)",
)
def tx_bm25_tiered(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.index_admin import (
        bm25_segment_stats,
        execute_merge_plan,
        plan_segment_merges,
    )
    from ..operators.text_index import bm25_query_topk, write_bm25_index

    docs = load_table(spark, sf, "documents")
    base = tempfile.mkdtemp(prefix="bm25_tiered_")
    segs = [os.path.join(base, f"seg{i}") for i in range(3)]
    for p in segs:
        shutil.rmtree(p, ignore_errors=True)

    # the three per-shard builds touch disjoint corpus slices and distinct
    # index dirs — independent jobs, overlapped (guide §2.6)
    from ..operators.text_index import overlap_jobs

    def _build(i: int):
        return lambda: write_bm25_index(
            spark, docs.where(F.col("doc_id") % 3 == i), segs[i], "doc_id",
            "text", n_buckets=16,
        )

    overlap_jobs([_build(i) for i in range(3)])
    stats = bm25_segment_stats(spark, segs)
    plan = plan_segment_merges(stats)
    if plan != [sorted(segs, key=lambda s: (stats[s], s))]:
        raise AssertionError(
            f"tx_bm25_tiered: expected one 3-way merge group, got {plan}"
        )
    outs = execute_merge_plan(spark, plan, base)
    cols = ["mode", "query", "doc_id", "n_terms", "score_fp", "rnk"]
    s0 = bm25_query_topk(spark, segs[0], _MULTI_QUERIES, k=5).withColumn(
        "mode", F.lit("seg0")
    ).select(cols)
    mg = bm25_query_topk(spark, outs[0], _MULTI_QUERIES, k=5).withColumn(
        "mode", F.lit("merged")
    ).select(cols)
    return s0.unionByName(mg)


def _bm25_msm_oracle(k: int = 5, msm: int = 2) -> str:
    return rf"""
    WITH {_bm25_scored_ctes()},
    qt(query, term) AS (VALUES {_qt_values()}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(count(DISTINCT s.term) AS BIGINT) AS n_terms,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    r AS (SELECT query, doc_id, n_terms, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g WHERE n_terms >= {msm})
    SELECT query, doc_id, n_terms, score_fp, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_bm25_msm",
    _bm25_msm_oracle(),
    doc="minimum_should_match retrieval (operators/text_index.py:"
    "bm25_query_topk(min_should_match=2) — the Lucene/Elasticsearch dial "
    "BETWEEN the OR and AND boolean modes): only docs carrying at least "
    "2 of the query's distinct terms rank, which is the standard "
    "precision lever for long queries where pure OR drowns in one-term "
    "matches and pure AND returns nothing. Same single pruned postings "
    "scan and fixed-point scoring as tx_bm25_multiterm; the floor is a "
    "post-aggregate HAVING on the distinct-term count, and a query with "
    "fewer terms than the floor is rejected loudly (Lucene clamps "
    "silently, hiding typos). The oracle replays the HAVING relationally",
)
def tx_bm25_msm(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_query_topk, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_msm_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return bm25_query_topk(spark, path, _MULTI_QUERIES, k=5, min_should_match=2)


_SYN_QUERIES = ["slow join", "big table"]
_SYNONYMS = {"slow": ["fast"], "big": ["small", "large"]}


def _bm25_synonyms_oracle(k: int = 5) -> str:
    mapping = [
        (q, w, t)
        for q in _SYN_QUERIES
        for w in sorted(set(q.split()))
        for t in sorted({w} | set(_SYNONYMS.get(w, [])))
    ]
    m_values = ", ".join(f"('{q}', '{w}', '{t}')" for q, w, t in mapping)
    all_terms = sorted({t for _q, _w, t in mapping})
    return rf"""
    WITH {_bm25_scored_ctes(terms=all_terms)},
    m(query, grp, term) AS (VALUES {m_values}),
    g1 AS (SELECT m.query, m.grp, s.doc_id, max(s.score_fp) AS g_score
           FROM s2 s JOIN m ON s.term = m.term GROUP BY 1, 2, 3),
    g2 AS (SELECT query, doc_id,
                  CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
                  CAST(sum(g_score) AS BIGINT) AS score_fp
           FROM g1 GROUP BY 1, 2),
    r AS (SELECT query, doc_id, n_groups, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g2)
    SELECT query, doc_id, n_groups, score_fp, rnk FROM r WHERE rnk <= {k}
    """


@register(
    "tx_bm25_synonyms",
    _bm25_synonyms_oracle(),
    doc="query-time SYNONYM EXPANSION (operators/text_index.py:"
    "bm25_query_topk_synonyms — Lucene SynonymQuery / Elasticsearch "
    "synonym graph, the standard recall lever): each query word becomes "
    "a concept GROUP (word + synonyms); a doc's group contribution is "
    "the MAX of the members' per-term BM25 scores (synonyms are the "
    "same concept — a doc carrying two spellings must not score it "
    "twice), and the query score sums group contributions. One synonym "
    "('large') is absent from the corpus — expansion adds recall, never "
    "removes a match. Same batched plan as tx_bm25_multiterm with a "
    "(query, group, term) broadcast fan-out and an extra per-group MAX "
    "before the per-doc sum. The oracle replays the max-blend "
    "relationally — integer end-to-end",
)
def tx_bm25_synonyms(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_query_topk_synonyms,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_syn_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return bm25_query_topk_synonyms(spark, path, _SYN_QUERIES, _SYNONYMS, k=5)


_COMPOSED_LANGS = ["en", "zh"]
_COMPOSED_PAGE = 3


def _bm25_composed_oracle() -> str:
    """Replays the 3-dial composition relationally: synonym group-max
    scoring over the corpus-wide stats CTEs, the facet PRE-filter as a
    candidate semi-join (stats stay corpus-wide — the filter-context
    contract), and search_after as global ranks (page, 2*page] re-ranked
    from 1 (the cursor is page 1's last hit, so page 2 is exactly the
    next ranks in the same total order)."""
    mapping = [
        (q, w, t)
        for q in _SYN_QUERIES
        for w in sorted(set(q.split()))
        for t in sorted({w} | set(_SYNONYMS.get(w, [])))
    ]
    m_values = ", ".join(f"('{q}', '{w}', '{t}')" for q, w, t in mapping)
    all_terms = sorted({t for _q, _w, t in mapping})
    langs_in = ", ".join(f"'{x}'" for x in _COMPOSED_LANGS)
    p = _COMPOSED_PAGE
    return rf"""
    WITH {_bm25_scored_ctes(terms=all_terms)},
    m(query, grp, term) AS (VALUES {m_values}),
    elig AS (SELECT doc_id FROM documents WHERE lang IN ({langs_in})),
    g1 AS (SELECT m.query, m.grp, s.doc_id, max(s.score_fp) AS g_score
           FROM s2 s
           JOIN m ON s.term = m.term
           JOIN elig e ON s.doc_id = e.doc_id
           GROUP BY 1, 2, 3),
    g2 AS (SELECT query, doc_id,
                  CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
                  CAST(sum(g_score) AS BIGINT) AS score_fp
           FROM g1 GROUP BY 1, 2),
    r AS (SELECT query, doc_id, n_groups, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g2)
    SELECT query, doc_id, n_groups, score_fp, rnk - {p} AS rnk
    FROM r WHERE rnk > {p} AND rnk <= {2 * p}
    """


@register(
    "tx_bm25_composed",
    _bm25_composed_oracle(),
    doc="THREE query dials composed in one serving call (the r14 verdict's "
    "composability-matrix cell, COVERAGE.md): synonym expansion x "
    "metadata pre-filter x search_after pagination — "
    "operators/text_index.py:bm25_query_topk_synonyms(allowed=, after=). "
    "The dials compose because each is a per-doc-independent restriction "
    "around the same scoring model: the facet filter semi-joins the "
    "pruned postings read (corpus statistics stay corpus-wide), the "
    "synonym groups max-blend per concept, and the cursor filters the "
    "scored rows on the SAME (score desc, doc_id asc) total order the "
    "rank uses — so page 2 under filter+synonyms is exactly global ranks "
    "4..6 re-ranked from 1, which is what the oracle replays. Page 1's "
    "last hits (the cursors) are collected driver-side — |queries| "
    "bounded rows, the search_after serving shape",
)
def tx_bm25_composed(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_query_topk_synonyms,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_composed_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16, facet_cols=["lang"]
    )
    eligible = (
        spark.read.parquet(f"{path}/facets")
        .where(F.col("lang").isin(_COMPOSED_LANGS))
        .select("doc_id")
    )
    page1 = bm25_query_topk_synonyms(
        spark, path, _SYN_QUERIES, _SYNONYMS, k=_COMPOSED_PAGE, allowed=eligible
    ).collect()  # bounded: |queries| x page rows — the cursor read
    last = {
        r["query"]: (int(r["score_fp"]), int(r["doc_id"]))
        for r in page1
        if r["rnk"] == _COMPOSED_PAGE
    }
    short = [q for q in _SYN_QUERIES if q not in last]
    if short:
        raise ValueError(
            f"tx_bm25_composed: queries {short} have fewer than "
            f"{_COMPOSED_PAGE} eligible hits at this sf — the page-2 "
            "cursor would be undefined"
        )
    return bm25_query_topk_synonyms(
        spark, path, _SYN_QUERIES, _SYNONYMS, k=_COMPOSED_PAGE,
        allowed=eligible, after=last,
    )


def _stats_facet_oracle() -> str:
    from .pipeline import _TOKS_SQL

    all_terms = sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT DISTINCT term, doc_id FROM tok WHERE term IN ({terms_in})),
    qt(query, term) AS (VALUES {_qt_values()}),
    m AS (SELECT DISTINCT qt.query, p.doc_id FROM post p JOIN qt ON p.term = qt.term),
    g AS (SELECT m.query,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(min(doc.n_chars) AS BIGINT) AS min_v,
                 CAST(max(doc.n_chars) AS BIGINT) AS max_v,
                 CAST(sum(doc.n_chars) AS BIGINT) AS sum_v
          FROM m JOIN documents doc ON doc.doc_id = m.doc_id
          WHERE doc.n_chars IS NOT NULL
          GROUP BY 1)
    SELECT query, n_docs, min_v, max_v, sum_v,
           sum_v * 1000 // n_docs AS avg_fp
    FROM g
    """


@register(
    "tx_bm25_statsfacet",
    _stats_facet_oracle(),
    doc="numeric STATS aggregation over each query's whole matching set "
    "(operators/text_index.py:bm25_stats_facet — Elasticsearch's stats "
    "agg, the numeric sibling of the counts facet): count/min/max/sum "
    "and a fixed-point mean of the n_chars doc-values column, served "
    "entirely from index artifacts (matching ids from the pruned "
    "postings scan, the numeric column from the facets/ sidecar — "
    "never text). OR semantics over the WHOLE matching set (stats "
    "don't change as you paginate); NULL values excluded per the "
    "Elasticsearch missing-value contract; mean = sum*1000 div count, "
    "integer end-to-end. The oracle replays the rollup relationally",
)
def tx_bm25_statsfacet(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_stats_facet,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_statsf_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16,
        facet_cols=["source", "n_chars"],
    )
    return bm25_stats_facet(spark, path, _MULTI_QUERIES, "n_chars")


def _stats_by_facet_oracle(k_facets: int = 10) -> str:
    from .pipeline import _TOKS_SQL

    all_terms = sorted({w for q in _MULTI_QUERIES for w in q.split()})
    terms_in = ", ".join(f"'{t}'" for t in all_terms)
    return rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
    post AS (SELECT DISTINCT term, doc_id FROM tok WHERE term IN ({terms_in})),
    qt(query, term) AS (VALUES {_qt_values()}),
    m AS (SELECT DISTINCT qt.query, p.doc_id FROM post p JOIN qt ON p.term = qt.term),
    g AS (SELECT m.query, doc.source AS facet,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(doc.n_chars) AS BIGINT) AS n_vals,
                 CAST(min(doc.n_chars) AS BIGINT) AS min_v,
                 CAST(max(doc.n_chars) AS BIGINT) AS max_v,
                 CAST(sum(doc.n_chars) AS BIGINT) AS sum_v
          FROM m JOIN documents doc ON doc.doc_id = m.doc_id
          GROUP BY 1, 2),
    r AS (SELECT query, facet, n_docs, n_vals, min_v, max_v, sum_v,
                 CASE WHEN n_vals > 0 THEN sum_v * 1000 // n_vals END AS avg_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY n_docs DESC, facet ASC NULLS LAST) AS rnk
          FROM g)
    SELECT query, facet, n_docs, n_vals, min_v, max_v, sum_v, avg_fp, rnk
    FROM r WHERE rnk <= {k_facets}
    """


@register(
    "tx_bm25_statsbyfacet",
    _stats_by_facet_oracle(),
    doc="per-FACET numeric stats over each query's matching set "
    "(operators/text_index.py:bm25_stats_by_facet — Elasticsearch "
    "terms-agg + stats SUB-aggregation, composing tx_bm25_facets and "
    "tx_bm25_statsfacet into the full sidebar panel): per (query, "
    "source), match count plus count/min/max/sum and fixed-point mean "
    "of n_chars, ONE sidecar join feeding both the bucketing and the "
    "numeric column, ranked like the counts facet so the two panels "
    "paginate identically. NULL numerics count in n_docs but none of "
    "the stats (n_vals reports how many did). The oracle replays the "
    "grouped rollup relationally",
)
def tx_bm25_statsbyfacet(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_stats_by_facet,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_statsbf_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(
        spark, docs, path, "doc_id", "text", n_buckets=16,
        facet_cols=["source", "n_chars"],
    )
    return bm25_stats_by_facet(
        spark, path, _MULTI_QUERIES, "source", "n_chars", k_facets=10
    )


def _bm25_snippet_oracle(k: int = 5, ctx: int = 3) -> str:
    return rf"""
    WITH {_bm25_scored_ctes()},
    qt(query, term) AS (VALUES {_qt_values()}),
    g AS (SELECT qt.query, s.doc_id,
                 CAST(sum(s.score_fp) AS BIGINT) AS score_fp
          FROM s2 s JOIN qt ON s.term = qt.term GROUP BY 1, 2),
    r AS (SELECT query, doc_id, score_fp,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY score_fp DESC, doc_id ASC) AS rnk
          FROM g),
    win AS (SELECT query, doc_id, score_fp, rnk FROM r WHERE rnk <= {k}),
    sw AS (SELECT qt.query, s.doc_id, s.term, s.score_fp AS t_score
           FROM s2 s JOIN qt ON s.term = qt.term
           JOIN win ON win.query = qt.query AND win.doc_id = s.doc_id),
    best AS (SELECT query, doc_id, max(t_score) AS b FROM sw GROUP BY 1, 2),
    bt AS (SELECT sw.query, sw.doc_id, min(sw.term) AS best_term
           FROM sw JOIN best ON best.query = sw.query
                            AND best.doc_id = sw.doc_id
                            AND sw.t_score = best.b
           GROUP BY 1, 2),
    pos AS (SELECT win.query, win.doc_id, win.score_fp, win.rnk,
                   bt.best_term,
                   CAST(list_position(d.toks, bt.best_term) AS BIGINT)
                     AS first_pos,
                   d.toks
            FROM win JOIN bt ON bt.query = win.query
                            AND bt.doc_id = win.doc_id
            JOIN d ON d.doc_id = win.doc_id),
    cut AS (SELECT query, doc_id, score_fp, best_term, first_pos, rnk,
                   greatest(1, first_pos - {ctx}) AS lo,
                   least(len(toks), first_pos + {ctx}) AS hi,
                   toks
            FROM pos)
    SELECT query, doc_id, score_fp, best_term, first_pos,
           array_to_string(toks[lo:hi], ' ') AS snippet, rnk
    FROM cut
    """


@register(
    "tx_bm25_snippets",
    _bm25_snippet_oracle(),
    doc="ranked multi-term retrieval WITH SNIPPETS (operators/"
    "text_index.py:bm25_snippet_probe — the Lucene highlighter over "
    "bm25_query_topk; tx_phrase_snippets is the phrase twin): each "
    "top-5 hit carries the token window around the first occurrence of "
    "its BEST term — the matched term with the highest per-term "
    "fixed-point BM25 contribution for that doc (ties term-asc), i.e. "
    "why the doc ranked. Ranking and anchor selection ride ONE pruned "
    "per-(term, doc) score read; per-term rows restrict to the "
    "broadcast top-k winners before the arg-max, so anchor work is "
    "page-sized; text is touched only for winners AFTER ranking, never "
    "shuffled. The oracle replays the arg-max, list_position, and the "
    "clamped slice with DuckDB list ops — snippet STRINGS hash "
    "bit-identically",
)
def tx_bm25_snippets(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import bm25_snippet_probe, write_bm25_index

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_snip_")
    shutil.rmtree(path, ignore_errors=True)
    write_bm25_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    return bm25_snippet_probe(spark, path, docs, _MULTI_QUERIES, k=5, ctx=3)


@register(
    "tx_bm25_snippets_stored",
    _bm25_snippet_oracle(),
    doc="the highlighter served ENTIRELY from index artifacts "
    "(operators/text_index.py:bm25_snippet_probe_stored, r15): an opt-in "
    "STORED-FIELDS sidecar (write_doc_store -> docstore/ = (doc_id, "
    "toks), Lucene's stored fields / Elasticsearch _source) replaces the "
    "caller-supplied doc store, so snippets come off index artifacts "
    "like facets do. The sidecar RIDES the lifecycle (add appends "
    "O(batch), compact drops victims before clearing tombstones, merge "
    "unions all-or-none) and a count-vs-stats staleness guard refuses a "
    "sidecar that missed an add — a silently missing doc would DROP "
    "from snippets via the join, the rterms wrong-answer class. Shares "
    "tx_bm25_snippets' oracle verbatim: the stored form must be "
    "value-identical to the docs= form",
)
def tx_bm25_snippets_stored(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.text_index import (
        bm25_snippet_probe_stored,
        write_bm25_index,
    )

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="bm25_snipstore_")
    shutil.rmtree(path, ignore_errors=True)
    # base/delta split exercises the sidecar's lifecycle ride inside the
    # value-checked query (the tx_bm25_stored discipline)
    from ..operators.text_index import bm25_index_add

    write_bm25_index(
        spark, docs.where(F.col("doc_id") % 5 != 3), path, "doc_id", "text",
        n_buckets=16, docstore=True,
    )
    bm25_index_add(
        spark, docs.where(F.col("doc_id") % 5 == 3), path, "doc_id", "text"
    )
    return bm25_snippet_probe_stored(spark, path, _MULTI_QUERIES, k=5, ctx=3)
