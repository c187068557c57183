"""LLM-training-data pipeline queries over ``documents``/``embeddings``
(BASELINE.json north star: dedup, similarity search, text analysis —
first-class operators alongside the SURVEY §2 inventory).

The DuckDB oracles for MinHash/SimHash are *generated from the same
coefficients* as the Spark implementation (functions/hashing.py), using the
portable md5-based hash — so even the LSH pipelines are fully value-checked,
not just row-counted.

A ``corpus`` CTE plants deterministic near- and exact duplicates (perturbed
copies of existing docs) so the dedup queries have non-trivial positives to
find at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, minhash_coeffs
from ..functions.text import (
    LANG_MARKERS,
    QUALITY_SQL_TEMPLATE,
    avg_token_len,
    bpe_ish_token_count,
    predict_lang,
    punct_ratio,
    quality_score,
    token_count,
)
from ..operators.components import dedup_groups
from ..partitioning import eager_cache, explode_nonempty
from ..operators.packing import pack_concat_chunks
from ..operators.sampling import hash_sample, shuffle_order, stratified_sample
from ..operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    jaccard_prefix_pairs,
    jaccard_pairs_auto,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_table,
    winnow_fingerprints,
)
from ..operators.multimodal import (
    attach_audio,
    attach_media,
    chunk_audio,
    extract_features,
    sample_frames,
)
from ..operators.similarity import (
    _hyperplanes,
    ann_lsh,
    embedding_neardup_pairs,
    neardup_band_planes,
    ivf_search,
    knn_brute,
)
from ..sources.tables import load_table, table_row_bound
from .registry import register

# --------------------------------------------------------------------------
# shared corpus with planted duplicates
# --------------------------------------------------------------------------

_CORPUS_SQL = r"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, regexp_replace(text, '^\S+\s+', '') AS text
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""

_TOKS_SQL = r"regexp_split_to_array(lower(trim(text)), '\s+')"
# 3-gram word shingles, distinct (DuckDB list slicing is 1-based inclusive).
_SHINGLES_SQL = (
    r"list_distinct(list_transform(range(1, greatest(len(" + _TOKS_SQL + r") - 2, 0) + 1), "
    r"i -> array_to_string((" + _TOKS_SQL + r")[i:i+2], ' ')))"
)
# DuckDB twin of functions.hashing.HASH64_SQL: full-width 60-bit portable
# hash (verify joins), and its mod-p reduction (signature permutations).
_HASH64_SQL = "('0x' || substr(md5(s), 1, 15))::BIGINT"
_HASH_P_SQL = _HASH64_SQL + " % " + str(MERSENNE_P)


def _corpus(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    near = (
        d.where(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
        )
    )
    exact = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    return d.unionByName(near).unionByName(exact)


# --------------------------------------------------------------------------
# dedup tier
# --------------------------------------------------------------------------


@register(
    "dd_exact",
    f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM corpus GROUP BY md5(text)
    """,
    bench=True,
    doc="exact dedup by md5(text): shuffle 16-byte hashes, not documents",
)
def dd_exact(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup(_corpus(spark, sf), "doc_id", "text").select(
        "text_hash", "keep_id", "dup_count"
    )


@register(
    "dd_fingerprint",
    f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT md5(array_to_string(list_sort(list_distinct({_TOKS_SQL})), ' ')) AS fp,
           min(doc_id) AS keep_id, count(*) AS dup_count
    FROM corpus GROUP BY 1
    """,
    doc="fingerprint dedup: md5 of sorted distinct token set (catches "
    "reordering)",
)
def dd_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return fingerprint_dedup(_corpus(spark, sf), "doc_id", "text").select(
        "fp", "keep_id", "dup_count"
    )


@register(
    "dd_ngram_jaccard",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    sized AS (SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh),
    ex AS (SELECT doc_id, n_sh, unnest(shingles) AS shingle FROM sized),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
             count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, round(inter / (na + nb - inter), 6) AS jaccard
    FROM pairs WHERE round(inter / (na + nb - inter), 6) >= 0.5
    """,
    doc="exact n-gram Jaccard near-dup pairs; candidates share >= 1 shingle "
    "(equi-join on shingle, no all-pairs product)",
)
def dd_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_jaccard_pairs(_corpus(spark, sf), "doc_id", "text", n=3, threshold=0.5)


@register(
    "dd_jaccard_prefix",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    sized AS (SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh),
    ex AS (SELECT doc_id, n_sh, unnest(shingles) AS shingle FROM sized),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
             count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, round(inter / (na + nb - inter), 6) AS jaccard
    FROM pairs WHERE 5 * inter >= 3 * (na + nb - inter)
    """,
    doc="prefix-filtered exact Jaccard join (AllPairs/PPJoin rule): "
    "candidates must share an element of BOTH docs' rarest-first prefixes, "
    "bounding hot-shingle fanout by prefix rows instead of df^2; lossless "
    "(the oracle is the BRUTE all-shared-shingle join at the same rational "
    "3/5 threshold, so a green row proves no pair was pruned); integer "
    "threshold arithmetic on both engines — see "
    "operators/dedup.py:jaccard_prefix_pairs",
)
def dd_jaccard_prefix(spark: SparkSession, sf: str) -> DataFrame:
    return jaccard_prefix_pairs(_corpus(spark, sf), "doc_id", "text", n=3, t_num=3, t_den=5)


@register(
    "dd_jaccard_auto",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    sized AS (SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh),
    ex AS (SELECT doc_id, n_sh, unnest(shingles) AS shingle FROM sized),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
             count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, round(inter / (na + nb - inter), 6) AS jaccard
    FROM pairs WHERE 5 * inter >= 3 * (na + nb - inter)
    """,
    doc="ADAPTIVE exact-Jaccard join: a one-row scalar pre-pass over the "
    "shingle df table picks the plain all-shared-shingle candidate rule or "
    "the AllPairs/PPJoin prefix rule per corpus (hot-key join output "
    "C(max_df,2) > 4M, or total volume over the per-core budget, => "
    "prefix) — the crossover constants come from the measured "
    "PREFIXJOIN_WIN.json cases; both paths share one persisted exploded "
    "build and the same integer threshold, so the oracle (the brute join) "
    "proves the choice is output-invisible — see "
    "operators/dedup.py:jaccard_pairs_auto",
)
def dd_jaccard_auto(spark: SparkSession, sf: str) -> DataFrame:
    return jaccard_pairs_auto(_corpus(spark, sf), "doc_id", "text", n=3, t_num=3, t_den=5)


_PASSAGE_SCRUB_SQL = """
    WITH corpus AS ({_CORPUS_SQL}),
    d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM corpus),
    b AS (SELECT doc_id, t, len(t) AS n FROM d),
    pos AS (SELECT doc_id, t, CAST(unnest(range(1, greatest(n - 3, 1))) AS INT) AS i FROM b),
    occ AS (SELECT doc_id, i,
                   ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT AS gh
            FROM pos),
    freq AS (SELECT gh, count(*) AS cnt, min(struct_pack(d := doc_id, i := i)) AS first_occ
             FROM occ GROUP BY gh),
    flagged AS (SELECT o.doc_id, o.i FROM occ o JOIN freq f USING (gh)
                WHERE f.cnt >= 2{keepfirst}),
    covered AS (SELECT DISTINCT doc_id, CAST(unnest(range(i, i + 5)) AS INT) AS p FROM flagged),
    tpos AS (SELECT doc_id, t[CAST(p AS INT)] AS tok, p FROM
             (SELECT doc_id, t, CAST(unnest(range(1, n + 1)) AS INT) AS p FROM b)),
    kept AS (SELECT x.doc_id, x.p, x.tok FROM tpos x
             WHERE NOT EXISTS (SELECT 1 FROM covered c
                               WHERE c.doc_id = x.doc_id AND c.p = x.p)),
    cleaned AS (SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS cl,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id)
    SELECT b.doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(n - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           md5(coalesce(cl, '')) AS cleaned_hash
    FROM b LEFT JOIN cleaned USING (doc_id) ORDER BY doc_id
    """


@register(
    "tx_passage_scrub",
    _PASSAGE_SCRUB_SQL.replace("{_CORPUS_SQL}", _CORPUS_SQL).replace("{keepfirst}", ""),
    doc="repeated-passage scrubbing (Lee et al. 2022, substring-level "
    "dedup): any 5-token gram occurring more than once in the corpus "
    "marks the positions it covers; covered tokens are cut and the doc "
    "re-joined. Interval union is DISTINCT covered positions - per "
    "position, not per span, so overlapping/adjacent repeats merge with "
    "no gaps-and-islands pass. Portable 60-bit gram hash (md5 tier) makes "
    "the DuckDB twin bit-identical; output carries md5(cleaned_text) so "
    "the value compare sees fixed-width rows - see "
    "operators/passages.py:repeated_passage_scrub",
)
def tx_passage_scrub(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.passages import repeated_passage_scrub

    return repeated_passage_scrub(_corpus(spark, sf), "doc_id", "text", k=5).orderBy(
        "doc_id"
    )


@register(
    "tx_passage_keepfirst",
    _PASSAGE_SCRUB_SQL.replace("{_CORPUS_SQL}", _CORPUS_SQL).replace(
        "{keepfirst}",
        " AND struct_pack(d := o.doc_id, i := o.i) != f.first_occ",
    ),
    doc="Lee-et-al dedup mode of tx_passage_scrub: the globally-first "
    "occurrence ((doc_id, i)-minimal) of each repeated 5-gram survives, "
    "every other occurrence is cut - information kept exactly once. "
    "First-occurrence selection is a min(struct) running aggregate inside "
    "the same gram groupBy (no per-gram window sort: a million-occurrence "
    "boilerplate gram costs one running min, not a skewed sort); struct "
    "min/inequality is lexicographic on both engines",
)
def tx_passage_keepfirst(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.passages import repeated_passage_scrub

    return repeated_passage_scrub(
        _corpus(spark, sf), "doc_id", "text", k=5, keep_first=True
    ).orderBy("doc_id")


@register(
    "dd_contamination",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    train AS (SELECT doc_id, md5(text) AS h FROM corpus WHERE doc_id % 7 <> 0),
    heldout AS (SELECT doc_id, md5(text) AS h FROM corpus WHERE doc_id % 7 = 0)
    SELECT t.doc_id AS train_id, e.doc_id AS heldout_id
    FROM train t JOIN heldout e USING (h)
    """,
    doc="train/eval decontamination: exact-text collisions between the "
    "training split and a held-out split, joined on md5 so the shuffle "
    "moves 16-byte hashes — the standard pre-training leakage check",
)
def dd_contamination(spark: SparkSession, sf: str) -> DataFrame:
    # split on doc_id % 7: the corpus's exact-dup copies live at
    # doc_id + 20000 and 20000 % 7 == 1, so every planted duplicate lands
    # in the OPPOSITE split from its original — real leakage to find
    corpus = _corpus(spark, sf).select("doc_id", F.md5("text").alias("h"))
    train = corpus.where(F.col("doc_id") % 7 != 0).select(F.col("doc_id").alias("train_id"), "h")
    heldout = corpus.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("heldout_id"), "h"
    )
    return train.join(heldout, "h").select("train_id", "heldout_id")


_GROUPS_CC_SQL = f"""
    WITH RECURSIVE corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    sized AS (SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh),
    ex AS (SELECT doc_id, n_sh, unnest(shingles) AS shingle FROM sized),
    jpairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
               count(*) AS inter
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
      WHERE round(inter / (na + nb - inter), 6) >= 0.5),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
              UNION SELECT doc_b, doc_a FROM jpairs),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.label < e.b
    )
    SELECT id AS doc_id, min(label) AS group_id, id = min(label) AS is_keeper
    FROM walk GROUP BY id
    """


@register(
    "dd_groups_cc",
    _GROUPS_CC_SQL,
    bench=True,
    doc="dedup GROUP resolution: connected components (min-id label "
    "propagation) over n-gram-Jaccard near-dup pairs + keeper selection — "
    "the transitive-closure step every pair generator needs before dropping "
    "rows; oracle is the same closure as a recursive CTE. Label propagation "
    "is the measured-fastest algorithm for this shape (dense shallow "
    "near-dup clusters); see dd_groups_cc_star for the deep-graph variant",
)
def dd_groups_cc(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    return dedup_groups(corpus, pairs, id_col="doc_id", pair_a="doc_a", pair_b="doc_b")


@register(
    "dd_groups_cc_star",
    _GROUPS_CC_SQL,
    doc="same closure as dd_groups_cc computed by alternating large-star/"
    "small-star (Kiveris et al. SoCC'14): O(log^2) rounds vs O(diameter), "
    "edge-only working set — the variant for chain-shaped or unknown-"
    "diameter graphs, value-checked against the identical recursive-CTE "
    "oracle so both algorithms carry a driver-green row",
)
def dd_groups_cc_star(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    return dedup_groups(
        corpus, pairs, id_col="doc_id", pair_a="doc_a", pair_b="doc_b", algorithm="star"
    )


@register(
    "dd_apply_stats",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    g AS (SELECT md5(text) AS th, count(*) AS cnt, min(length(text)) AS nc
          FROM corpus GROUP BY 1)
    SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
           count(*) AS n_kept,
           CAST(sum(cnt) - count(*) AS BIGINT) AS n_dropped,
           CAST(sum((cnt - 1) * nc) AS BIGINT) AS chars_dropped
    FROM g
    """,
    doc="dedup APPLICATION summary — the step after pair/group resolution "
    "that every pipeline actually ships: keep min-id per exact-hash group, "
    "report corpus rows kept/dropped and characters saved. Rows never "
    "leave the executors; the answer is one aggregate over the 16-byte "
    "hash groups",
)
def dd_apply_stats(spark: SparkSession, sf: str) -> DataFrame:
    h = _corpus(spark, sf).select(F.md5("text").alias("th"), F.length("text").alias("nc"))
    g = h.groupBy("th").agg(F.count("*").alias("cnt"), F.min("nc").alias("nc"))
    return g.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count("*").alias("n_kept"),
        (F.sum("cnt") - F.count("*")).cast("long").alias("n_dropped"),
        F.sum((F.col("cnt") - 1) * F.col("nc")).cast("long").alias("chars_dropped"),
    )


@register(
    "tx_domain_mix",
    r"""
    WITH s AS (SELECT source, count(*) AS n_docs,
                      CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
                           AS BIGINT) AS n_tokens
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                 CAST(sum(n_tokens) AS BIGINT) AS tt FROM s)
    SELECT source, n_docs, n_tokens,
           round(n_docs / td, 6) AS pct_docs,
           round(n_tokens / tt, 6) AS pct_tokens
    FROM s, t
    """,
    doc="data-mixture report: per-source document and token counts with "
    "corpus proportions — the sampling-weight input every pretraining "
    "mixture needs (and the report regenerated after every filter pass). "
    "One partial-agg'd groupBy plus a broadcast 1-row total; token counts "
    "share the whitespace tokenizer with tx_token_stats",
)
def tx_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    stats = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )
    tot = stats.agg(
        F.sum("n_docs").alias("td"), F.sum("n_tokens").alias("tt")
    )
    return stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.col("td"), 6).alias("pct_docs"),
        F.round(F.col("n_tokens") / F.col("tt"), 6).alias("pct_tokens"),
    )


def _minhash_oracle(k: int = 16, bands: int = 4, threshold: float = 0.4) -> str:
    # hs holds the FULL-WIDTH 60-bit hash (collision-free verify via
    # list_intersect, matching Spark's count(*) over the h equi-join); the
    # permutations reduce mod p inside the lambda — identical signature
    # values (hence band keys and candidates) to the old mod-p-up-front
    # form. Mirrors operators/dedup.py minhash_lsh_pairs exactly.
    r = k // bands
    perms = ", ".join(
        f"coalesce(list_min(list_transform(hs, h -> ({a} * (h % {MERSENNE_P}) + {b}) % {MERSENNE_P})), {MERSENNE_P})"
        for a, b in minhash_coeffs(k)
    )
    band_keys = ", ".join(
        f"'{bi},' || array_to_string(sig[{bi * r + 1}:{bi * r + r}], ',')" for bi in range(bands)
    )
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    hashed AS (
      SELECT doc_id, shingles, len(shingles) AS n_sh,
             list_transform(shingles, s -> {_HASH64_SQL}) AS hs
      FROM sh WHERE len(shingles) > 0),
    sigs AS (SELECT doc_id, [{perms}] AS sig FROM hashed),
    banded AS (SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sigs),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM banded x JOIN banded y USING (band_key)
      WHERE x.doc_id < y.doc_id),
    verified AS (
      SELECT doc_a, doc_b,
             round(len(list_intersect(sa.hs, sb.hs)) /
                   (sa.n_sh + sb.n_sh - len(list_intersect(sa.hs, sb.hs))),
                   6) AS jaccard
      FROM cand JOIN hashed sa ON doc_a = sa.doc_id
                JOIN hashed sb ON doc_b = sb.doc_id)
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
    """


@register(
    "dd_minhash_lsh",
    _minhash_oracle(),
    bench=True,
    doc="MinHash(16) + LSH banding(4x4) candidates + exact-Jaccard verify; "
    "oracle SQL generated from the same portable hash + coefficients",
)
def dd_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(_corpus(spark, sf), "doc_id", "text", n=3, k=16, bands=4, threshold=0.4)


@register(
    "dd_groups_minhash",
    f"""
    WITH RECURSIVE mh_pairs AS ({_minhash_oracle()}),
    corpus AS ({_CORPUS_SQL}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
              UNION SELECT doc_b, doc_a FROM mh_pairs),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.label < e.b
    )
    SELECT id AS doc_id, min(label) AS group_id, id = min(label) AS is_keeper
    FROM walk GROUP BY id
    """,
    bench=True,
    doc="the PRODUCTION dedup pipeline end-to-end: MinHash-LSH candidate "
    "generation (band equi-join, never all-pairs) -> exact-Jaccard verify "
    "-> connected components -> keeper selection. dd_groups_cc composes "
    "the same closure over the EXACT ngram pair generator, whose shingle "
    "self-join is the heaviest stage at scale; this is the scale path "
    "that replaces it — measured at the sf1 rehearsal: 13.7s vs 33.3s, "
    "identical groups on this corpus. Oracle = the generated "
    "minhash-oracle CTEs composed with the same recursive-CTE closure, "
    "fully value-checked",
)
def dd_groups_minhash(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4)
    return dedup_groups(corpus, pairs, id_col="doc_id", pair_a="doc_a", pair_b="doc_b")


@register(
    "dd_keep_best",
    f"""
    WITH RECURSIVE mh_pairs AS ({_minhash_oracle()}),
    corpus AS ({_CORPUS_SQL}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
              UNION SELECT doc_b, doc_a FROM mh_pairs),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.label < e.b
    ),
    g AS (SELECT id AS doc_id, min(label) AS group_id FROM walk GROUP BY id),
    scored AS (SELECT g.group_id, g.doc_id, length(c.text) AS len
               FROM g JOIN corpus c ON c.doc_id = g.doc_id),
    r AS (SELECT group_id, doc_id, len,
                 row_number() OVER (PARTITION BY group_id
                                    ORDER BY len DESC, doc_id ASC) AS rk,
                 count(*) OVER (PARTITION BY group_id) AS n_members
          FROM scored)
    SELECT group_id, doc_id AS best_doc, CAST(len AS BIGINT) AS best_len,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rk = 1 AND n_members > 1
    """,
    doc="canonical-copy selection per near-dup group — the production "
    "dedup keep rule upgraded from min-id to BEST-copy: groups from the "
    "same LSH->verify->CC closure as dd_groups_minhash, then one window "
    "argmax per group by (length DESC, doc_id ASC) picks the most complete "
    "copy (the planted near-dups are head-trimmed, so length is the "
    "completeness signal); only multi-member groups emit. One extra "
    "group-keyed shuffle over the closure output",
)
def dd_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4)
    groups = dedup_groups(corpus, pairs, id_col="doc_id", pair_a="doc_a", pair_b="doc_b")
    scored = groups.select("doc_id", "group_id").join(
        corpus.select("doc_id", F.length("text").cast("long").alias("len")), "doc_id"
    )
    w = Window.partitionBy("group_id").orderBy(F.desc("len"), F.asc("doc_id"))
    wc = Window.partitionBy("group_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .where((F.col("rk") == 1) & (F.col("n_members") > 1))
        .select(
            "group_id",
            F.col("doc_id").alias("best_doc"),
            F.col("len").alias("best_len"),
            "n_members",
        )
    )


@register(
    "dd_minhash_lsh_fast",
    None,  # xxhash64 has no DuckDB twin -> rows-only driver check; the
    # candidate-independent property (every emitted pair really has
    # Jaccard >= threshold) is asserted in tests/test_vector_hash_utils.py
    doc="MinHash-LSH on the xxhash64 fast tier — the 100 TB hot path "
    "(identical plan shape to dd_minhash_lsh, Spark-native hashing; "
    "verified Jaccard values are hash-independent). Rows-only at the "
    "driver but value-checked-by-PROXY: tests/test_lsh_tier_proxy.py "
    "pins its values exactly equal to the oracle-checked portable tier "
    "on their pair-set intersection, any tier disagreement to be "
    "true-pairs-only (banding recall, never precision) and bounded "
    "<= 2% of the union; dd_lsh_tier_audit pins precision == 0 false "
    "positives in-oracle, and dd_lsh_fast_equiv value-checks the same "
    "four invariants at the DRIVER (oracle-green, not rows-only)",
)
def dd_minhash_lsh_fast(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(
        _corpus(spark, sf), "doc_id", "text", n=3, k=16, bands=4, threshold=0.4, hash_tier="fast"
    )


@register(
    "dd_lsh_tier_audit",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    hashed AS (SELECT doc_id,
                      list_distinct(list_transform(shingles, s -> {_HASH_P_SQL})) AS hs
               FROM sh WHERE len(shingles) > 0),
    sized AS (SELECT doc_id, len(hs) AS n_h, hs FROM hashed),
    ex AS (SELECT doc_id, n_h, unnest(hs) AS h FROM sized),
    scored AS (
      SELECT doc_a, doc_b, round(inter / (na + nb - inter), 6) AS jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_h AS na, b.n_h AS nb,
               count(*) AS inter
        FROM ex a JOIN ex b USING (h) WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)),
    truth AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.4),
    portable AS ({_minhash_oracle()})
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM portable) AS BIGINT) AS n_portable,
           CAST((SELECT count(*) FROM portable p JOIN truth t
                 ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b) AS BIGINT)
             AS n_portable_in_truth,
           CAST(0 AS BIGINT) AS n_fast_outside_truth
    """,
    doc="LSH tier audit bounding the oracle-less fast tier: n_truth = ALL "
    "pairs with exact Jaccard >= 0.4 (full shingle-hash equi-join, portable "
    "hash, DISTINCT-deduped on both engines); n_portable / "
    "n_portable_in_truth audit the portable tier's yield and precision "
    "against that ground truth; n_fast_outside_truth pins the xxhash64 "
    "fast tier's PRECISION to exactly zero false positives. The zero is "
    "asserted against truth at threshold MINUS 0.02 slack: both LSH tiers "
    "now verify on full-width collision-free hashes (exact shingle "
    "Jaccard), while the truth tier's mod-p distinct-hash Jaccard can "
    "differ from exact only by a mod-p collision's worth, far below "
    "0.02 — so a boundary pair can never flip across the slack and the "
    "hardcoded oracle zero is a genuine invariant, not a per-dataset "
    "accident. Closes the dd_minhash_lsh_fast 'rows-only, nothing bounds "
    "its values' gap",
)
def dd_lsh_tier_audit(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import jaccard_truth_pairs

    corpus = _corpus(spark, sf)
    # eager_cache (r18): the final crossJoin action consumes scored via two
    # branches (n_truth, n_pit/n_fot) and portable via two (n_portable,
    # n_pit) — AQE submits those stages concurrently, and a lazy persist
    # would recompute the full truth join / LSH pipeline once per branch
    # (see partitioning.eager_cache)
    scored = eager_cache(
        jaccard_truth_pairs(corpus, "doc_id", "text", n=3, threshold=0.38)
    )
    truth = scored.where(F.col("jaccard") >= 0.4).select("doc_a", "doc_b")
    truth_loose = scored.select("doc_a", "doc_b")
    portable = eager_cache(
        minhash_lsh_pairs(corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4)
        .select("doc_a", "doc_b")
    )
    fast = minhash_lsh_pairs(
        corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4, hash_tier="fast"
    ).select("doc_a", "doc_b")
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_portable = portable.agg(F.count("*").alias("n_portable"))
    n_pit = (
        portable.join(truth, ["doc_a", "doc_b"]).agg(F.count("*").alias("n_portable_in_truth"))
    )
    n_fot = (
        fast.join(truth_loose, ["doc_a", "doc_b"], "left_anti")
        .agg(F.count("*").alias("n_fast_outside_truth"))
    )
    return n_truth.crossJoin(n_portable).crossJoin(n_pit).crossJoin(n_fot)


@register(
    "dd_lsh_fast_equiv",
    f"""
    WITH portable AS ({_minhash_oracle()})
    SELECT CAST((SELECT count(*) FROM portable) AS BIGINT) AS n_portable,
           CAST(0 AS BIGINT) AS n_value_mismatch,
           CAST(0 AS BIGINT) AS n_below_threshold,
           CAST(1 AS BIGINT) AS sym_diff_within_bound
    """,
    doc="fast-vs-portable MinHash tier EQUIVALENCE, driver-value-checked: "
    "full-outer join of the xxhash64 fast tier's verified pair set against "
    "the portable-md5 tier's on the same corpus/params. Emits four "
    "invariants the oracle pins exactly: n_portable (recomputed "
    "independently in DuckDB — ties the Spark-side portable set to the "
    "cross-engine ground truth inside the SAME query the fast tier is "
    "compared in), n_value_mismatch = 0 (intersection pairs must agree on "
    "jaccard to the last digit — both tiers verify on collision-free "
    "full-width hashes, so verified Jaccard is hash-independent), "
    "n_below_threshold = 0 (no tier may emit a sub-threshold pair — "
    "precision is exact by construction), and sym_diff_within_bound = 1 "
    "(|fast XOR portable| <= 2% of the union — banding recall is the only "
    "legal disagreement and it is probabilistically small). This is the "
    "value-grade check the rows-only dd_minhash_lsh_fast lacked: any fast-"
    "tier value corruption, threshold leak, or recall collapse turns a "
    "pinned zero nonzero and the driver goes red",
)
def dd_lsh_fast_equiv(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)
    fast = minhash_lsh_pairs(
        corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4, hash_tier="fast"
    ).select("doc_a", "doc_b", F.col("jaccard").alias("j_fast"))
    portable = minhash_lsh_pairs(
        corpus, "doc_id", "text", n=3, k=16, bands=4, threshold=0.4
    ).select("doc_a", "doc_b", F.col("jaccard").alias("j_port"))
    both = fast.join(portable, ["doc_a", "doc_b"], "full_outer")
    agg = both.agg(
        F.sum(F.when(F.col("j_port").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_portable"),
        F.sum(
            F.when(
                F.col("j_fast").isNotNull()
                & F.col("j_port").isNotNull()
                & (F.col("j_fast") != F.col("j_port")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_value_mismatch"),
        F.sum(F.when(F.coalesce("j_fast", "j_port") < 0.4, 1).otherwise(0))
        .cast("long")
        .alias("n_below_threshold"),
        F.sum(F.when(F.col("j_fast").isNull() | F.col("j_port").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_sym"),
        F.count("*").cast("long").alias("n_union"),
    )
    # bound as a pinned 0/1 so the oracle row is corpus-independent: the
    # raw n_sym/n_union counts are xxhash64-banding-dependent (DuckDB
    # cannot reproduce them), but "<= 2% of the union" holds on any corpus
    # where banding recall is healthy — the same bound the proxy test pins.
    return agg.select(
        "n_portable",
        "n_value_mismatch",
        "n_below_threshold",
        F.when(F.col("n_sym") * 50 <= F.col("n_union"), F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("sym_diff_within_bound"),
    )


def _simhash_oracle(bits: int = 32) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs64, h -> CASE WHEN ((h >> {b}) & 1) = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
    hashed AS (
      SELECT doc_id,
             list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs64
      FROM sh)
    SELECT doc_id, {terms} AS simhash FROM hashed
    """


@register(
    "dd_simhash",
    _simhash_oracle(),
    doc="per-doc 32-bit SimHash over 3-gram shingles; oracle generated from "
    "the same portable hash",
)
def dd_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return simhash_table(_corpus(spark, sf), "doc_id", "text", n=3, bits=32)


_ORDERED_SHINGLES_SQL = (
    r"list_transform(range(1, greatest(len(" + _TOKS_SQL + r") - 2, 0) + 1), "
    r"i -> array_to_string((" + _TOKS_SQL + r")[i:i+2], ' '))"
)


def _winnow_oracle(window: int = 4) -> str:
    w = window
    mins = (
        f"list_distinct(CASE WHEN len(hs) < {w} THEN hs ELSE "
        f"list_transform(range(1, len(hs) - {w} + 2), i -> list_min(hs[i:i+{w - 1}])) END)"
    )
    return f"""
    WITH t AS (SELECT doc_id, {_ORDERED_SHINGLES_SQL} AS shingles FROM documents),
    hashed AS (SELECT doc_id, list_transform(shingles, s -> {_HASH_P_SQL}) AS hs FROM t)
    SELECT doc_id, len({mins}) AS n_fingerprints,
           md5(array_to_string(list_sort({mins}), ',')) AS fp_digest
    FROM hashed
    """


@register(
    "dd_winnow",
    _winnow_oracle(),
    doc="winnowing rolling-hash fingerprints (Schleimer et al. SIGMOD'03): "
    "min of every 4 consecutive ordered 3-gram hashes, distinct set digested; "
    "oracle shares the portable hash so digests match bit-for-bit",
)
def dd_winnow(spark: SparkSession, sf: str) -> DataFrame:
    return winnow_fingerprints(load_table(spark, sf, "documents"), "doc_id", "text", n=3, window=4)


# --------------------------------------------------------------------------
# similarity search tier
# --------------------------------------------------------------------------

_DOT = "list_reduce(list_transform(range(1, 65), i -> qv[i] * tv[i]), (a, b) -> a + b)"
_NQ = "sqrt(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b))"
_NT = "sqrt(list_reduce(list_transform(tv, x -> x * x), (a, b) -> a + b))"


def _knn_brute_oracle(max_qid: int = 5, k: int = 10) -> str:
    """Brute-force cosine top-k CTE chain, parameterized on the query-id
    range and k (shared by sim_knn_brute and the hybrid-RRF fusion)."""
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {max_qid}),
    t AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS tv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_DOT} / ({_NQ} * {_NT}) AS cs
      FROM t, q WHERE query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim
    FROM ranked WHERE rk <= {k}
    """


_KNN_BRUTE_SQL = _knn_brute_oracle()


@register(
    "sim_knn_brute",
    _KNN_BRUTE_SQL,
    bench=True,
    doc="brute-force top-10 cosine ANN baseline: broadcast query vectors, "
    "expression-only dot/norm (zip_with+aggregate), per-query window top-k",
)
def sim_knn_brute(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    return knn_brute(
        emb, queries, "vec_id", "embedding", k=10,
        approx_target_count=table_row_bound(sf, "embeddings"),
    )


_QUANT_SQL = """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_reduce(
                   list_transform(v, y -> y * y), (a, b) -> a + b))) AS vn
          FROM v),
    st AS (SELECT max(abs(x)) AS m FROM (SELECT unnest(vn) AS x FROM n)),
    q8 AS (SELECT vec_id,
                  list_transform(vn,
                    x -> floor(x * (CAST(127 AS DOUBLE) / m))::BIGINT) AS q
           FROM n CROSS JOIN st),
    qq AS (SELECT vec_id AS query_id, q AS qa FROM q8 WHERE vec_id < 5),
    tt AS (SELECT vec_id AS neighbor_id, q AS qb FROM q8),
    scored AS (
      SELECT query_id, neighbor_id,
             list_reduce(list_transform(range(1, 65), i -> qa[i] * qb[i]),
                         (a, b) -> a + b) AS qscore
      FROM tt CROSS JOIN qq WHERE query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, qscore,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qscore DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, qscore FROM ranked WHERE rk <= 10
    """


@register(
    "sim_quantized",
    _QUANT_SQL,
    doc="int8 scalar-quantized top-10 retrieval: global-min/max codebook "
    "(floor levels — round() ties differ across engines, floor doesn't), "
    "exact int64 dot-product scoring, so the WHOLE query is integer "
    "arithmetic — bit-stable under any partitioning, unlike float cosine "
    "whose sum order matters. 4x less scan bandwidth than the float "
    "baseline; production re-ranks these candidates with exact cosine "
    "(sim_recall_at_k quantifies the quantization loss per query)",
)
def sim_quantized(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import knn_quantized

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    return knn_quantized(
        emb, queries, "vec_id", "embedding", k=10,
        approx_target_count=table_row_bound(sf, "embeddings"),
    )


_QUANT50_SQL = _QUANT_SQL.replace("rk <= 10", "rk <= 50")


@register(
    "sim_rerank_pipeline",
    f"""
    WITH cand AS ({_QUANT50_SQL}),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_reduce(list_transform(range(1, 65), i -> q.v[i] * t.v[i]), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(t.v, x -> x * x), (a, b) -> a + b))) AS cs
      FROM cand JOIN e q ON cand.query_id = q.vec_id
                JOIN e t ON cand.neighbor_id = t.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim
    FROM ranked WHERE rk <= 10
    """,
    doc="the production TWO-STAGE retrieval: int8 symmetric-quantized scan "
    "selects top-50 candidates at 4x less bandwidth (integer arithmetic, "
    "bit-stable), then exact float cosine re-ranks only those 50 per "
    "query to the final top-10. At 100 TB the quantized stage is the only "
    "full scan; the re-rank touches 50 vectors per query via an id "
    "equi-join. Value-checked end-to-end — and with the symmetric "
    "codebook's measured recall, the output matches sim_knn_brute's "
    "exact top-10 on this corpus",
)
def sim_rerank_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vectors import cosine
    from ..operators.similarity import knn_quantized
    from pyspark.sql import Window

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    cand = knn_quantized(
        emb, queries, "vec_id", "embedding", k=50,
        approx_target_count=table_row_bound(sf, "embeddings"),
    ).select("query_id", "neighbor_id")
    # broadcast the QUERY vectors only (5 rows) — broadcasting the full
    # embeddings table would ship the corpus to every executor
    qv = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    tv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("t_vec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(tv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("t_vec")).alias("cos_raw"))
    )
    from ..operators.topk import topk_per_key

    return topk_per_key(
        scored,
        ["query_id"],
        [F.desc("cos_raw"), F.asc("neighbor_id")],
        10,
        "neighbor_id",
        rank_col="rk",
        approx_candidates_per_key=50,  # exact: re-rank page is the quantized top-50
    ).select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))


def _neardup_oracle(tau: float = 0.45, dim: int = 64, n_planes: int = 8, bands: int = 4) -> str:
    """DuckDB twin of banded sign-LSH near-dup pairs: same deterministic
    hyperplanes per band (neardup_band_planes), same left-fold dot order, so
    bucket membership — and therefore the candidate set — agrees exactly."""
    band_keys = []
    for bi, planes in enumerate(neardup_band_planes(dim, n_planes, bands)):
        bits = []
        for p in planes:
            arr = ", ".join(repr(float(x)) for x in p)
            d = f"list_reduce(list_transform(range(1, {dim + 1}), i -> v[i] * [{arr}][i]), (a, b) -> a + b)"
            bits.append(f"(CASE WHEN {d} >= 0 THEN '1' ELSE '0' END)")
        band_keys.append(f"'{bi}:' || " + " || ".join(bits))
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    banded AS (SELECT vec_id, unnest([{", ".join(band_keys)}]) AS bucket FROM v),
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM banded x JOIN banded y USING (bucket)
      WHERE x.vec_id < y.vec_id),
    pairs AS (
      SELECT id_a, id_b,
             round(
               list_reduce(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y))),
               6) AS cos_sim
      FROM cand JOIN v a ON id_a = a.vec_id JOIN v b ON id_b = b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {tau}
    """


@register(
    "sim_neardup_cosine",
    _neardup_oracle(),
    doc="embedding near-duplicate pairs (cosine >= 0.45) via banded sign-LSH "
    "candidates + exact cosine verify — keyed equi-join, no all-pairs "
    "product; oracle generated from the same hyperplanes",
)
def sim_neardup_cosine(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return embedding_neardup_pairs(emb, "vec_id", "embedding", tau=0.45)


def _ann_lsh_oracle(dim: int = 64, n_planes: int = 8, k: int = 10) -> str:
    """DuckDB twin of sign-LSH bucketed ANN, generated from the SAME
    deterministic hyperplanes (left-fold dot product order matches Spark's
    ``aggregate``, so bucket bits agree bit-for-bit)."""
    planes = _hyperplanes(dim, n_planes)
    bits = []
    for p in planes:
        arr = ", ".join(repr(float(x)) for x in p)
        dot = f"list_reduce(list_transform(range(1, {dim + 1}), i -> v[i] * [{arr}][i]), (a, b) -> a + b)"
        bits.append(f"(CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END)")
    bucket = " || ".join(bits)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
    t AS (SELECT vec_id AS neighbor_id, v AS tv, bucket FROM b),
    scored AS (
      SELECT query_id, neighbor_id, {_DOT} / ({_NQ} * {_NT}) AS cs
      FROM t JOIN q USING (bucket) WHERE query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim
    FROM ranked WHERE rk <= {k}
    """


_L2SQ = "list_reduce(list_transform(range(1, 65), i -> (e.v[i] - c.c_vec[i]) * (e.v[i] - c.c_vec[i])), (a, b) -> a + b)"


_IVF_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS c_vec FROM e WHERE vec_id < 16),
    assign AS (
      SELECT vec_id, v, c_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS crk
      FROM (SELECT e.vec_id, e.v, c.c_id, {_L2SQ} AS d2 FROM e, cent c)),
    t AS (SELECT vec_id AS neighbor_id, v AS tv, c_id AS cluster FROM assign WHERE crk = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, c_id AS cluster
          FROM assign WHERE crk <= 2 AND vec_id < 5),
    scored AS (
      SELECT DISTINCT query_id, neighbor_id, {_DOT} / ({_NQ} * {_NT}) AS cs
      FROM t JOIN q USING (cluster) WHERE query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim
    FROM ranked WHERE rk <= 10
    """


@register(
    "sim_ivf",
    _IVF_SQL,
    doc="IVF approximate top-k cosine: coarse-quantize to the 16 seed "
    "centroids, queries probe their 2 nearest clusters (cluster equi-join "
    "replaces the full scan; at 100 TB the target table is partitioned by "
    "cluster so probes prune partitions); oracle replays the identical "
    "assignment arithmetic",
)
def sim_ivf(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    centroids = emb.where(F.col("vec_id") < 16)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_search(
        emb, queries, centroids, "vec_id", "embedding", k=10, nprobe=2,
        approx_target_count=table_row_bound(sf, "embeddings"),
    )


@register(
    "sim_ann_lsh",
    _ann_lsh_oracle(),
    doc="approximate top-k cosine via sign-LSH bucketing (the 100 TB path: "
    "bucket equi-join replaces the full scan; recall < 1 by design); oracle "
    "generated from the same deterministic hyperplanes",
)
def sim_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    return ann_lsh(
        emb, queries, "vec_id", "embedding", k=10, dim=64, n_planes=8,
        approx_target_count=table_row_bound(sf, "embeddings"),
    )


def _ann_multiband_oracle(dim: int = 64, n_planes: int = 8, bands: int = 4, k: int = 10) -> str:
    """DuckDB twin of ann_lsh_multiband: same per-band hyperplanes as the
    neardup path (neardup_band_planes), candidates = union of band-bucket
    matches, exact cosine, top-k."""
    band_keys = []
    for bi, planes in enumerate(neardup_band_planes(dim, n_planes, bands)):
        bits = []
        for p in planes:
            arr = ", ".join(repr(float(x)) for x in p)
            d = f"list_reduce(list_transform(range(1, {dim + 1}), i -> v[i] * [{arr}][i]), (a, b) -> a + b)"
            bits.append(f"(CASE WHEN {d} >= 0 THEN '1' ELSE '0' END)")
        band_keys.append(f"'{bi}:' || " + " || ".join(bits))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    banded AS (SELECT vec_id, v, unnest([{", ".join(band_keys)}]) AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM banded WHERE vec_id < 5),
    t AS (SELECT vec_id AS neighbor_id, v AS tv, bucket FROM banded),
    scored AS (
      SELECT DISTINCT query_id, neighbor_id, {_DOT} / ({_NQ} * {_NT}) AS cs
      FROM t JOIN q USING (bucket) WHERE query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim
    FROM ranked WHERE rk <= {k}
    """


@register(
    "sim_ann_multiband",
    _ann_multiband_oracle(n_planes=6, bands=8),
    doc="multi-probe sign-LSH ANN: candidates are the UNION of 8 "
    "independent 6-plane band buckets (the LSH OR-construction; same "
    "banding as the neardup pair path) + exact-cosine top-k. Config chosen "
    "by a measured sweep on this corpus (sim_recall_at_k ground truth): "
    "8x4 planes = 0.10 mean recall@10, 6x8 = 0.40 at ~12% candidate "
    "volume, 4x8 = 0.68 but scores HALF the corpus (no better than brute "
    "force) — synthetic near-uniform embeddings are LSH's worst case; "
    "clustered real-embedding spaces do far better at the same config. "
    "Oracle generated from the identical hyperplanes",
)
def sim_ann_multiband(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import ann_lsh_multiband

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    return ann_lsh_multiband(
        emb, queries, "vec_id", "embedding", k=10, n_planes=6, bands=8,
        approx_target_count=table_row_bound(sf, "embeddings"),
    )


@register(
    "sim_recall_at_k",
    f"""
    WITH exact AS ({_KNN_BRUTE_SQL}),
    ann AS ({_ann_lsh_oracle()}),
    annmb AS ({_ann_multiband_oracle(n_planes=6, bands=8)}),
    ivf AS ({_IVF_SQL}),
    quant AS ({_QUANT_SQL}),
    ap AS (SELECT 'ann_lsh' AS method, query_id, neighbor_id FROM ann
           UNION ALL
           SELECT 'ann_multiband' AS method, query_id, neighbor_id FROM annmb
           UNION ALL
           SELECT 'ivf' AS method, query_id, neighbor_id FROM ivf
           UNION ALL
           SELECT 'quantized' AS method, query_id, neighbor_id FROM quant),
    hits AS (SELECT method, ap.query_id, count(*) AS hits
             FROM ap JOIN exact ON ap.query_id = exact.query_id
                               AND ap.neighbor_id = exact.neighbor_id
             GROUP BY 1, 2),
    base AS (SELECT m.method, q.query_id
             FROM (SELECT DISTINCT query_id FROM exact) q
             CROSS JOIN (SELECT 'ann_lsh' AS method
                         UNION ALL SELECT 'ann_multiband'
                         UNION ALL SELECT 'ivf'
                         UNION ALL SELECT 'quantized') m)
    SELECT base.method, base.query_id,
           CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
           round(CAST(coalesce(hits.hits, 0) AS DOUBLE) / CAST(10 AS DOUBLE), 6)
             AS recall_at_k
    FROM base LEFT JOIN hits
      ON base.method = hits.method AND base.query_id = hits.query_id
    """,
    doc="ANN retrieval QUALITY, value-checked: recall@10 of single-band "
    "sign-LSH, multi-band sign-LSH, IVF, and int8-quantized candidates "
    "against the brute-force exact top-10 (per query, per method; "
    "zero-hit queries still get a row). All sides are deterministic — "
    "shared hyperplanes/centroid seeds/codebooks — so the oracle replays "
    "the identical retrievals and pins the recall VALUES, closing the "
    "'approximate operators are only checked for determinism, never for "
    "quality' gap. The quantized row doubles as the measured quantization "
    "loss of the int8 scan path",
)
def sim_recall_at_k(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import ann_lsh_multiband, knn_quantized, recall_at_k

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    centroids = emb.where(F.col("vec_id") < 16)
    n_emb = table_row_bound(sf, "embeddings")
    exact = knn_brute(emb, queries, "vec_id", "embedding", k=10, approx_target_count=n_emb)
    ann = ann_lsh(
        emb, queries, "vec_id", "embedding", k=10, dim=64, n_planes=8,
        approx_target_count=n_emb,
    )
    annmb = ann_lsh_multiband(
        emb, queries, "vec_id", "embedding", k=10, n_planes=6, bands=8,
        approx_target_count=n_emb,
    )
    ivf = ivf_search(
        emb, queries, centroids, "vec_id", "embedding", k=10, nprobe=2,
        approx_target_count=n_emb,
    )
    quant = knn_quantized(
        emb, queries, "vec_id", "embedding", k=10, approx_target_count=n_emb
    )
    out = (
        recall_at_k(exact, ann, 10)
        .withColumn("method", F.lit("ann_lsh"))
        .unionByName(recall_at_k(exact, annmb, 10).withColumn("method", F.lit("ann_multiband")))
        .unionByName(recall_at_k(exact, ivf, 10).withColumn("method", F.lit("ivf")))
        .unionByName(recall_at_k(exact, quant, 10).withColumn("method", F.lit("quantized")))
    )
    return out.select("method", "query_id", "hits", "recall_at_k")


def _kmeans_ctes(k: int = 8, iters: int = 3, dim: int = 64, r: int = 6) -> list[str]:
    """Relationally-unrolled Lloyd iterations (shared by the ml_kmeans and
    dd_semantic oracles). Parity contract with the Spark operator
    (operators/clustering.py): centroids quantized to ``r`` decimals each
    iteration; assignment d2 is the same left-fold over (v[i]-c[i])^2;
    ties to the lowest cluster index; empty clusters keep their centroid.
    The final assignment CTE is ``assign{iters-1}``."""
    d2 = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])), (a, b) -> a + b)"
    )
    ctes = [
        f"e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"cent0 AS (SELECT CAST(vec_id + 1 AS INT) AS cluster, "
        f"list_transform(v, x -> round(x, {r})) AS c FROM e WHERE vec_id < {k})",
    ]
    for it in range(iters):
        ctes.append(
            f"assign{it} AS (SELECT vec_id, v, cluster FROM ("
            f"SELECT e.vec_id, e.v, c.cluster, "
            f"row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cluster ASC) AS rk "
            f"FROM e, cent{it} c) WHERE rk = 1)"
        )
        ctes.append(
            f"dims{it} AS (SELECT a.cluster, u.i AS dim, round(avg(a.v[u.i]), {r}) AS cv "
            f"FROM assign{it} a, (SELECT unnest(range(1, {dim + 1})) AS i) u "
            f"GROUP BY a.cluster, u.i)"
        )
        ctes.append(
            f"cent{it + 1} AS (SELECT p.cluster, coalesce(n.c, p.c) AS c FROM cent{it} p "
            f"LEFT JOIN (SELECT cluster, array_agg(cv ORDER BY dim) AS c "
            f"FROM dims{it} GROUP BY cluster) n USING (cluster))"
        )
    return ctes


def _kmeans_oracle(k: int = 8, iters: int = 3, dim: int = 64, r: int = 6) -> str:
    ctes = _kmeans_ctes(k, iters, dim, r)
    return f"""
    WITH {", ".join(ctes)}
    SELECT a.cluster, count(*) AS n_members,
           any_value(round(sqrt(list_reduce(list_transform(f.c, x -> x * x), (a2, b2) -> a2 + b2)), 6)) AS centroid_norm
    FROM assign{iters - 1} a JOIN cent{iters} f USING (cluster)
    GROUP BY a.cluster
    """


@register(
    "ml_kmeans",
    _kmeans_oracle(),
    doc="ITERATIVE algorithm, fully value-checked: 3 Lloyd k-means "
    "iterations (k=8) over embeddings. Spark iterates driver-side over tiny "
    "centroid matrices (data never collected); the oracle unrolls the same "
    "iterations relationally. Per-iteration centroid quantization makes the "
    "trajectories bit-identical across engines",
)
def ml_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.clustering import kmeans_summary

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return kmeans_summary(emb, "vec_id", "embedding", k=8, iters=3)


# --------------------------------------------------------------------------
# multimodal tier (binary media columns; operators/multimodal.py)
# --------------------------------------------------------------------------


@register(
    "mm_features",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           upper(hex(encode(substring(text, 1, 8)))) AS head_hex,
           md5(text) AS content_md5
    FROM documents
    """,
    doc="binary-media feature extraction via Arrow-batched mapInPandas "
    "(byte length / head hex / md5 computed in Python from the raw bytes); "
    "oracle recomputes each feature in SQL — valid because the corpus is "
    "ASCII (char substr == byte substr, verified octet_length==length)",
)
def mm_features(spark: SparkSession, sf: str) -> DataFrame:
    media = attach_media(load_table(spark, sf, "documents"))
    return extract_features(media)


@register(
    "mm_frame_sample",
    """
    SELECT doc_id, frame_idx,
           md5(text || CAST(frame_idx AS VARCHAR)) AS frame_md5
    FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(doc_id % 7 + 1 AS INT), 2)) AS frame_idx
          FROM documents)
    """,
    doc="video-path frame sampling: one input row fans out to every 2nd "
    "frame index from the typed metadata (multi-row mapInPandas emission); "
    "frame fingerprints are deterministic codec-free stand-ins",
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    media = attach_media(load_table(spark, sf, "documents"))
    return sample_frames(media, stride=2)


@register(
    "mm_audio_chunks",
    """
    SELECT doc_id,
           CAST(start_sample / 8000 AS INT) AS chunk_idx,
           start_sample,
           least(8000, n_samples - start_sample) AS n_samples,
           md5(text || CAST(CAST(start_sample / 8000 AS INT) AS VARCHAR)) AS chunk_md5
    FROM (SELECT doc_id, text, CAST(n_chars AS BIGINT) * 100 AS n_samples,
                 unnest(range(0, CAST(n_chars AS BIGINT) * 100, 8000)) AS start_sample
          FROM documents)
    """,
    doc="audio-path chunking: fixed 8000-sample windows from the typed "
    "metadata (ragged tail), multi-row mapInPandas emission with "
    "deterministic per-chunk fingerprints",
)
def mm_audio_chunks(spark: SparkSession, sf: str) -> DataFrame:
    return chunk_audio(attach_audio(load_table(spark, sf, "documents")), chunk_samples=8000)


# --------------------------------------------------------------------------
# text-analysis tier
# --------------------------------------------------------------------------


@register(
    "tx_token_stats",
    f"""
    WITH t AS (
      SELECT source, len({_TOKS_SQL}) AS n_tok,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe,
             n_chars
      FROM documents)
    SELECT source, count(*) AS docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(avg(n_tok), 4) AS avg_tokens,
           CAST(sum(n_bpe) AS BIGINT) AS total_bpe,
           round(avg(n_chars), 4) AS avg_chars
    FROM t GROUP BY source
    """,
    doc="token counting (whitespace + BPE-ish regex) rolled up per source",
)
def tx_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select(
        "source",
        token_count(F.col("text")).alias("n_tok"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        "n_chars",
    )
    return d.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.sum("n_bpe").alias("total_bpe"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def _langid_oracle() -> str:
    hit_cols = ", ".join(
        "len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in words)
        + f"], x))) AS h_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    best = "greatest(h_en, h_fr, h_de, h_es)"
    return f"""
    WITH t AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks FROM documents),
    h AS (SELECT doc_id, lang, text, {hit_cols} FROM t)
    SELECT doc_id, lang AS actual,
           CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
                WHEN {best} = 0 THEN 'und'
                WHEN h_en = {best} THEN 'en'
                WHEN h_fr = {best} THEN 'fr'
                WHEN h_de = {best} THEN 'de'
                ELSE 'es' END AS predicted
    FROM h
    """


@register(
    "tx_langid",
    _langid_oracle(),
    doc="language-ID stopword/charset heuristic (n-gram marker hits, Han "
    "codepoint check); deterministic tie order en>fr>de>es",
)
def tx_langid(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual"),
        predict_lang(F.col("text")).alias("predicted"),
    )


@register(
    "tx_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS_SQL} AS toks,
             len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) AS punct,
             list_sum(list_transform({_TOKS_SQL}, x -> length(x)))
               / greatest(len({_TOKS_SQL}), 1) AS atl
      FROM documents)
    SELECT doc_id, len(toks) AS n_tokens,
           round(punct, 6) AS punct_ratio,
           round(atl, 4) AS avg_token_len,
           {QUALITY_SQL_TEMPLATE.format(n_toks="len(toks)", punct="punct", atl="atl")} AS quality
    FROM t
    """,
    doc="document quality scoring: length/punctuation/token-shape heuristics "
    "composited into a deterministic integer score",
)
def tx_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(avg_token_len(F.col("text")), 4).alias("avg_token_len"),
        quality_score(F.col("text")).alias("quality"),
    )


@register(
    "tx_tfidf_top_terms",
    rf"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM d),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE doc_id % 20 = 0 GROUP BY 1, 2),
    scored AS (
      SELECT doc_id, token, tf, df, tf * ((n_docs * 1000) // df) AS score
      FROM tf JOIN dfreq USING (token) CROSS JOIN n),
    r AS (SELECT doc_id, token, tf, df, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token ASC) AS term_rank
          FROM scored)
    SELECT doc_id, token, tf, df, score, term_rank FROM r WHERE term_rank <= 3
    """,
    doc="inverted-index / TF-IDF: document frequency over the FULL corpus, "
    "term frequency for the sampled docs, fixed-point idf (integer "
    "(N*1000) div df — no transcendental, so scores hash identically "
    "across engines), top-3 distinctive terms per doc",
)
def tx_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    tf = (
        tok.where(F.col("doc_id") % 20 == 0)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.expr("(n_docs * 1000) div df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "term_rank")
    )


# content-hash sampling + packing tier (operators/sampling.py, packing.py)

_SAMPLE_HASH_SQL = "('0x' || substr(md5(doc_id::VARCHAR || ':s1'), 1, 15))::BIGINT"


@register(
    "tx_hash_sample",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_SAMPLE_HASH_SQL} % 10000 < 2000
    """,
    doc="deterministic 20% content-hash sample (portable md5 tier): the "
    "keep/drop decision is a pure function of the row — stable across "
    "runs, partitionings, and engines, unlike df.sample(seed)",
)
def tx_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return hash_sample(d, "doc_id", 2000).select("doc_id", "source")


@register(
    "tx_stratified_sample",
    f"""
    WITH r AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_SAMPLE_HASH_SQL} ASC, doc_id ASC)
               AS sample_rank
      FROM documents)
    SELECT lang, doc_id, sample_rank FROM r WHERE sample_rank <= 20
    """,
    doc="deterministic per-language reservoir: exactly min(20, |stratum|) "
    "docs per lang chosen by content-hash order — one shuffle on the "
    "stratum key, skew handled by AQE",
)
def tx_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return stratified_sample(d, "lang", "doc_id", 20).select("lang", "doc_id", "sample_rank")


# leakage-safe splitting tier (operators/splits.py): split by DUP-GROUP key
# so duplicate clusters never straddle train/eval. Both queries run on the
# planted-duplicate corpus, grouped by the exact-dup fingerprint md5(text)
# (any group key dedup computed works the same way — MinHash component
# root, canonical URL domain).

_SPLITS = [("train", 9000), ("val", 500), ("test", 500)]
_SPLIT_CASE = (
    "CASE WHEN {r} < 9000 THEN 'train' WHEN {r} < 9500 THEN 'val' "
    "ELSE 'test' END"
)
_SPLIT_R = "(('0x' || substr(md5({k} || ':split1'), 1, 15))::BIGINT % 10000)"


@register(
    "tx_split_assign",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    g AS (SELECT doc_id, md5(text) AS g FROM corpus),
    a AS (SELECT doc_id, g,
                 {_SPLIT_CASE.format(r=_SPLIT_R.format(k="g"))} AS split
          FROM g),
    pg AS (SELECT split, g, count(*) AS n FROM a GROUP BY 1, 2)
    SELECT split, sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_groups
    FROM pg GROUP BY 1
    """,
    doc="group-aware train/val/test split census: the split is a pure "
    "function of the exact-dup group key (portable md5 tier), so every "
    "duplicate lands with its keeper — assignment is a stateless map-only "
    "projection (no shuffle, no join); this census is one small-key "
    "groupBy",
)
def tx_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.splits import split_summary

    c = _corpus(spark, sf).withColumn("g", F.md5("text"))
    return split_summary(c, "doc_id", "g", _SPLITS)


@register(
    "tx_split_leakage_audit",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    g AS (SELECT doc_id, md5(text) AS g FROM corpus),
    a AS (SELECT doc_id, g,
                 {_SPLIT_CASE.format(r=_SPLIT_R.format(k="doc_id::VARCHAR"))}
                   AS split_naive,
                 {_SPLIT_CASE.format(r=_SPLIT_R.format(k="g"))} AS split_group
          FROM g),
    n1 AS (SELECT g, split_naive AS split, count(*) AS c FROM a GROUP BY 1, 2),
    g1 AS (SELECT g, sum(c) AS n, sum(c * c) AS sq FROM n1 GROUP BY 1),
    n2 AS (SELECT g, split_group AS split, count(*) AS c FROM a GROUP BY 1, 2),
    g2 AS (SELECT g, sum(c) AS n, sum(c * c) AS sq FROM n2 GROUP BY 1)
    SELECT 'naive_by_doc' AS strategy,
           sum(n * (n - 1) // 2)::BIGINT AS dup_pairs,
           sum((n * n - sq) // 2)::BIGINT AS straddling_pairs,
           sum(CASE WHEN sq < n * n THEN 1 ELSE 0 END)::BIGINT
             AS groups_straddling
    FROM g1
    UNION ALL
    SELECT 'group_aware' AS strategy,
           sum(n * (n - 1) // 2)::BIGINT AS dup_pairs,
           sum((n * n - sq) // 2)::BIGINT AS straddling_pairs,
           sum(CASE WHEN sq < n * n THEN 1 ELSE 0 END)::BIGINT
             AS groups_straddling
    FROM g2
    """,
    doc="train/eval contamination audit, naive doc-hash split vs "
    "group-aware split on the same corpus: straddling intra-group pairs "
    "are counted per group as (n^2 - sum c_s^2)/2 from (group, split) "
    "counts — exact int64 combinatorics, NO pairwise join (quadratic in "
    "the hottest group at scale). group_aware straddling is proven 0 from "
    "the data, not asserted",
)
def tx_split_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.splits import leakage_audit

    c = _corpus(spark, sf).withColumn("g", F.md5("text"))
    return leakage_audit(c, "doc_id", "g", _SPLITS)


@register(
    "tx_vocab_coverage",
    r"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      FROM documents),
    tc AS (SELECT token, count(*) AS freq FROM tok
           WHERE length(token) > 0 GROUP BY 1),
    hist AS (SELECT freq, count(*) AS n_tokens, freq * count(*) AS mass
             FROM tc GROUP BY 1),
    cum AS (SELECT freq, n_tokens,
                   sum(mass) OVER (ORDER BY freq DESC) AS cum_mass,
                   sum(n_tokens) OVER (ORDER BY freq DESC) AS cum_tokens
            FROM hist),
    tot AS (SELECT max(cum_mass) AS total FROM cum),
    bps AS (SELECT unnest([5000, 9000, 9900]) AS coverage_bp),
    sel AS (SELECT coverage_bp, freq, n_tokens, cum_tokens, cum_mass,
                   cum_mass - freq * n_tokens AS cum_before,
                   coverage_bp * total AS target
            FROM cum, tot, bps),
    hit AS (SELECT *,
                   (target - 10000 * cum_before + 10000 * freq - 1)
                     // (10000 * freq) AS k
            FROM sel
            WHERE 10000 * cum_mass >= target AND 10000 * cum_before < target)
    SELECT coverage_bp,
           (cum_tokens - n_tokens + k)::BIGINT AS vocab_size,
           (cum_before + k * freq)::BIGINT AS covered_tokens
    FROM hit
    """,
    doc="tokenizer-sizing coverage curve: smallest greedy-by-count vocab "
    "covering 50/90/99% of token occurrences. Scale design: coverage "
    "depends only on the FREQUENCY-OF-FREQUENCIES histogram "
    "(O(sqrt(corpus)) rows by the harmonic bound), so the vocab is never "
    "globally sorted — one token-key shuffle, one tiny-histogram window, "
    "boundary class resolved in exact int64 (operators/vocab.py)",
)
def tx_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.vocab import vocab_coverage

    d = load_table(spark, sf, "documents").select("text")
    return vocab_coverage(d, "text", [5000, 9000, 9900])


@register(
    "tx_pack_chunks",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens,
             doc_id % 8 AS shard
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens, shard,
             -- CAST: integer sum() is HUGEINT in DuckDB -> float64 in pandas,
             -- and every derived column (chunk_id/offset/n_chunks) inherits it
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT)
               - n_tokens AS start
      FROM t)
    SELECT doc_id, n_tokens, shard,
           start // 512 AS chunk_id,
           start % 512 AS chunk_offset,
           CASE WHEN n_tokens <= 0 THEN 0
                ELSE (start + n_tokens - 1) // 512 - start // 512 + 1 END AS n_chunks
    FROM c
    """,
    bench=True,
    doc="sequence packing (concat-then-chunk, the pretraining layout): "
    "per-shard running token total maps every doc to its chunk id / offset "
    "/ span without materializing the stream; per-shard windows keep the "
    "plan scale-safe (no global ordering)",
)
def tx_pack_chunks(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select(
        "doc_id", bpe_ish_token_count(F.col("text")).alias("n_tokens")
    )
    return pack_concat_chunks(d, "doc_id", "n_tokens", max_tokens=512, n_shards=8)


# --------------------------------------------------------------------------
# repetition / filtering / shuffle tier
# --------------------------------------------------------------------------

_BIGRAMS_SQL = (
    "list_transform(range(1, greatest(len(toks) - 1, 0) + 1), "
    "i -> array_to_string(toks[i:i+1], ' '))"
)


@register(
    "tx_rep_signals",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, n_tokens, tok, count(*) AS c FROM tok GROUP BY 1, 2, 3),
    tstat AS (SELECT doc_id, n_tokens, count(*) AS n_types,
                     max(c) AS top_token_count
              FROM tc GROUP BY 1, 2),
    bg AS (SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bigram FROM t),
    bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
    bstat AS (SELECT doc_id, max(c) AS top_bigram_count FROM bc GROUP BY 1)
    SELECT doc_id, n_tokens, n_types, top_token_count,
           coalesce(top_bigram_count, 0) AS top_bigram_count,
           round(n_types / n_tokens, 6) AS ttr
    FROM tstat LEFT JOIN bstat USING (doc_id)
    """,
    doc="Gopher-style repetition signals per doc: type-token ratio, modal "
    "token frequency, modal bigram frequency. Per-doc modes via exploded "
    "(doc, term) partial aggregation — the distributed shape (a long doc "
    "never has to fit one row's expression eval); shuffles carry (id, term, "
    "count) triples, not text",
)
def tx_rep_signals(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..functions.text import word_shingles

    t = load_table(spark, sf, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    # explode_nonempty avoids the inferred size>0 filter a plain explode of
    # the named `toks` column would push into the scan (re-running the
    # tokenizer per row at scan parallelism; see partitioning.explode_nonempty)
    tok = explode_nonempty(
        t.select("doc_id", F.size("toks").alias("n_tokens"), "toks"),
        ["doc_id", "n_tokens"],
        "toks",
        "tok",
    )
    tstat = (
        tok.groupBy("doc_id", "n_tokens", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_tokens")
        .agg(F.count("*").alias("n_types"), F.max("c").alias("top_token_count"))
    )
    bstat = (
        t.select("doc_id", F.explode(word_shingles(F.col("toks"), 2)).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return tstat.join(bstat, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_types",
        "top_token_count",
        F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
    )


@register(
    "tx_ngram_counts",
    f"""
    WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    bg AS (SELECT unnest({_BIGRAMS_SQL}) AS bigram FROM t)
    SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram ASC LIMIT 50
    """,
    doc="corpus bigram census, top 50 (tie-broken lexically): the n-gram "
    "counting primitive behind contamination screens and LM eval overlap "
    "checks; map-side partial agg does the heavy lifting, only (bigram, "
    "count) pairs shuffle, top-k is TakeOrderedAndProject (no global sort)",
)
def tx_ngram_counts(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..functions.text import word_shingles

    d = load_table(spark, sf, "documents")
    return (
        d.select(F.explode(word_shingles(_tokens(F.col("text")), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(50)
    )


def _pii_oracle() -> str:
    from ..functions.text import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE

    aug = (
        "text || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id "
        "|| '@example.com' ELSE '' END "
        "|| CASE WHEN doc_id % 5 = 0 THEN ' call 555-0142 now' ELSE '' END "
        "|| CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || doc_id % 256 "
        "|| '.77' ELSE '' END"
    )
    return f"""
    WITH aug AS (SELECT doc_id, {aug} AS text FROM documents),
    scrub AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS n_phones,
             len(regexp_extract_all(text, '{PII_IP_RE}')) AS n_ips,
             regexp_replace(regexp_replace(regexp_replace(text,
               '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_PHONE_RE}', '<PHONE>', 'g'),
               '{PII_IP_RE}', '<IP>', 'g') AS clean
      FROM aug)
    SELECT doc_id, n_emails, n_phones, n_ips, md5(clean) AS clean_hash
    FROM scrub
    """


@register(
    "tx_pii_scrub",
    _pii_oracle(),
    doc="PII redaction (emails / 555-phones / dotted-quad IPs) with per-type "
    "counts. The synthetic corpus carries no PII, so the query first plants "
    "it deterministically (doc_id-derived emails/phones/IPs on residue "
    "classes) on BOTH engines, then scrubs — the oracle value-checks the "
    "scrubbed text via md5. Pure regexp built-ins, no UDF; identical "
    "Java-regex/RE2 syntax subset (functions/text.py PII_*_RE)",
)
def tx_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        char_count,
        scrub_pii,
    )

    d = load_table(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-0142 now")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".77"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        char_count(F.col("text"), PII_EMAIL_RE).alias("n_emails"),
        char_count(F.col("text"), PII_PHONE_RE).alias("n_phones"),
        char_count(F.col("text"), PII_IP_RE).alias("n_ips"),
        F.md5(scrub_pii(F.col("text"))).alias("clean_hash"),
    )


@register(
    "tx_shuffle_order",
    f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR || ':sh1'), 1, 15))::BIGINT AS hv
      FROM documents)
    SELECT doc_id, hv % 16 AS shard,
           row_number() OVER (PARTITION BY hv % 16
                              ORDER BY hv ASC, doc_id ASC) AS pos
    FROM h
    """,
    doc="deterministic training-shuffle addressing: every doc gets a "
    "(shard, pos) from its content hash — a rerun/partitioning/engine-"
    "stable global permutation with NO global sort (one shuffle on the "
    "shard key + per-shard rank); a seeded orderBy(rand()) would need a "
    "range exchange and is not rerun-stable",
)
def tx_shuffle_order(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return shuffle_order(d, "doc_id", n_shards=16).select("doc_id", "shard", "pos")


_NGRAMS8_SQL = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS_SQL}) - 7, 0) + 1), "
    f"i -> array_to_string(({_TOKS_SQL})[i:i+7], ' ')))"
)


@register(
    "dd_ngram_contamination",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    g AS (SELECT doc_id, unnest({_NGRAMS8_SQL}) AS gram FROM corpus),
    h AS (SELECT doc_id, md5(gram) AS gh FROM g),
    train AS (SELECT doc_id, gh FROM h WHERE doc_id % 7 <> 0),
    heldout AS (SELECT doc_id, gh FROM h WHERE doc_id % 7 = 0)
    SELECT t.doc_id AS train_id, e.doc_id AS heldout_id, count(*) AS n_shared
    FROM train t JOIN heldout e USING (gh)
    GROUP BY 1, 2
    """,
    doc="n-gram-overlap decontamination (the GPT-3-style screen, 8-gram "
    "here for the short synthetic docs): distinct 8-grams per doc, "
    "train x heldout equi-join on the gram's md5 so the shuffle carries "
    "16-byte keys, shared-gram count per crossing pair. Catches partial "
    "leakage that dd_contamination's exact-text join cannot",
)
def dd_ngram_contamination(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..functions.text import word_shingles

    corpus = _corpus(spark, sf)
    h = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(_tokens(F.col("text")), 8))).alias("gram"),
    ).select("doc_id", F.md5("gram").alias("gh"))
    train = h.where(F.col("doc_id") % 7 != 0).select(F.col("doc_id").alias("train_id"), "gh")
    heldout = h.where(F.col("doc_id") % 7 == 0).select(F.col("doc_id").alias("heldout_id"), "gh")
    return (
        train.join(heldout, "gh")
        .groupBy("train_id", "heldout_id")
        .agg(F.count("*").alias("n_shared"))
    )


@register(
    "tx_mixture_sample",
    f"""
    WITH rated AS (
      SELECT doc_id, source,
             CASE regexp_extract(source, 'src([0-9]+)', 1)::INT % 3
                  WHEN 0 THEN 1000 WHEN 1 THEN 2500 ELSE 5000 END AS rate_bp
      FROM documents)
    SELECT source, rate_bp, count(*) AS n_kept
    FROM rated
    WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':mx1'), 1, 15))::BIGINT % 10000 < rate_bp
    GROUP BY 1, 2
    """,
    doc="mixture weighting: per-source sampling rates (10% / 25% / 50% by "
    "source class) applied through the content-hash keep rule — the "
    "training-mix recipe step; rerun/partitioning/engine stable, nested "
    "across recipe revisions (raising a rate strictly extends the kept "
    "set), and a stateless filter that pushes through the scan",
)
def tx_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sampling import mixture_sample

    d = load_table(spark, sf, "documents")
    rate = (
        F.when(F.regexp_extract("source", r"src([0-9]+)", 1).cast("int") % 3 == 0, F.lit(1000))
        .when(F.regexp_extract("source", r"src([0-9]+)", 1).cast("int") % 3 == 1, F.lit(2500))
        .otherwise(F.lit(5000))
    )
    kept = mixture_sample(d.withColumn("rate_bp", rate), "doc_id", F.col("rate_bp"))
    return kept.groupBy("source", "rate_bp").agg(F.count("*").alias("n_kept"))


_CM_BUCKET_SQL = "('0x' || substr(md5(tok || ':cm' || i), 1, 15))::BIGINT % 64"


@register(
    "sk_countmin",
    f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    rows_ AS (SELECT unnest([0, 1, 2, 3]) AS i),
    buckets AS (
      SELECT i, {_CM_BUCKET_SQL} AS bucket, CAST(sum(c) AS BIGINT) AS bc
      FROM cnt CROSS JOIN rows_ GROUP BY 1, 2),
    probes AS (SELECT tok, c AS true_cnt FROM cnt
               ORDER BY c DESC, tok ASC LIMIT 10),
    est AS (
      SELECT p.tok, p.true_cnt, min(b.bc) AS est_cnt
      FROM probes p CROSS JOIN rows_
      JOIN buckets b ON b.i = rows_.i AND b.bucket =
        ('0x' || substr(md5(p.tok || ':cm' || rows_.i), 1, 15))::BIGINT % 64
      GROUP BY 1, 2)
    SELECT tok, true_cnt, est_cnt FROM est
    """,
    doc="count-min sketch (4 x 64, portable md5 hash family — bit-identical "
    "across engines, unlike approx_* sketches): the mergeable frequency "
    "summary for heavy-hitter tracking when the exact term table is too "
    "big. Sketch is O(d*w) rows regardless of corpus size; merging "
    "partition/day sketches is the same groupBy-sum (associative monoid); "
    "point queries broadcast-join the tiny sketch. Oracle checks the "
    "overcount-only estimates for the top-10 true heavy hitters",
)
def sk_countmin(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..operators.sketches import countmin_build, countmin_estimate

    d = load_table(spark, sf, "documents")
    # eager (r18): feeds both the sketch build and the probe top-k under
    # one action — lazy persist would recompute the token count per stage
    cnt = eager_cache(
        d.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    sketch = countmin_build(cnt, "tok", "c", d=4, w=64, salt="cm")
    probes = (
        cnt.orderBy(F.desc("c"), F.asc("tok"))
        .limit(10)
        .select("tok", F.col("c").alias("true_cnt"))
    )
    return countmin_estimate(sketch, probes, "tok", d=4, w=64, salt="cm")


@register(
    "sk_bloom_contamination",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    g AS (SELECT doc_id, unnest({_NGRAMS8_SQL}) AS gram FROM corpus),
    ks AS (SELECT unnest([0, 1, 2]) AS i),
    train_bits AS (
      SELECT DISTINCT
        ('0x' || substr(md5(gram || ':bl' || i), 1, 15))::BIGINT % 1024 AS bit
      FROM g CROSS JOIN ks WHERE doc_id % 7 <> 0),
    ho AS (SELECT doc_id, gram FROM g WHERE doc_id % 7 = 0),
    probe AS (
      SELECT ho.doc_id, ho.gram, count(*) AS bits_present
      FROM ho CROSS JOIN ks
      JOIN train_bits tb
        ON tb.bit = ('0x' || substr(md5(ho.gram || ':bl' || ks.i), 1, 15))::BIGINT % 1024
      GROUP BY 1, 2),
    hits AS (SELECT doc_id, count(*) AS n_hits FROM probe
             WHERE bits_present = 3 GROUP BY 1),
    totals AS (SELECT doc_id, count(*) AS n_grams FROM ho GROUP BY doc_id)
    SELECT t.doc_id AS heldout_id, t.n_grams, coalesce(h.n_hits, 0) AS n_hits
    FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
    doc="bloom-filter contamination screen: train-side 8-grams populate a "
    "k=3/m=1024 bloom (portable-hash bits — value-checkable, unlike "
    "engine-private blooms), heldout grams probe it. Per heldout doc: gram "
    "count + grams-in-bloom count (includes deterministic false positives "
    "— the bloom guarantee is no false NEGATIVES, so n_hits bounds true "
    "overlap from above). The filter is one broadcast relation; a real "
    "deployment packs the same bits into bitmap words and keeps the "
    "incremental union-merge property",
)
def sk_bloom_contamination(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..functions.text import word_shingles
    from ..operators.sketches import bloom_build, bloom_member

    corpus = _corpus(spark, sf)
    g = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(_tokens(F.col("text")), 8))).alias("gram"),
    )
    train_g = g.where(F.col("doc_id") % 7 != 0)
    # eager (r18): probed twice (totals + hits) under one action
    ho = eager_cache(g.where(F.col("doc_id") % 7 == 0))
    bloom = bloom_build(train_g, "gram", k=3, m=1024, salt="bl")
    hits = (
        bloom_member(bloom, ho, "gram", k=3, m=1024, salt="bl")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    totals = ho.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return totals.join(hits, "doc_id", "left").select(
        F.col("doc_id").alias("heldout_id"),
        "n_grams",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
    )


def _hll_oracle() -> str:
    """DuckDB twin of the portable HLL sketch, composed from the shared
    SQL builders in operators/sketches.py (hll_sketch_sql /
    hll_estimate_sql — ONE copy of the bucket/rho/estimator arithmetic
    across every sketching oracle)."""
    from ..operators.sketches import hll_estimate_sql, hll_sketch_sql

    return f"""
    WITH tok AS (SELECT doc_id::VARCHAR || ':' || unnest({_TOKS_SQL}) AS tok
                 FROM documents),
    {hll_sketch_sql('tok', 'x')},
    est AS (SELECT {hll_estimate_sql('r_x')} AS est_distinct,
                   (SELECT count(*) FROM r_x) AS nonempty_buckets),
    t AS (SELECT count(DISTINCT tok) AS true_distinct FROM tok)
    SELECT est_distinct, true_distinct, nonempty_buckets,
           abs(est_distinct - true_distinct) * 10000 // true_distinct AS err_bp
    FROM est CROSS JOIN t
    """


@register(
    "sk_hll",
    _hll_oracle(),
    doc="HyperLogLog distinct-count sketch (m=256, portable md5 hash family "
    "— bit-identical across engines, unlike approx_count_distinct's "
    "engine-private HLL++). rho = trailing-zeros rank read off bin(rem & "
    "-rem): pure integer ops, no float log; estimator sum is exact-dyadic "
    "so the double math is order-independent and value-checkable. The "
    "sketch is a 256-row max-monoid relation — merging per-partition/day "
    "sketches is the same groupBy-max, the 100 TB alternative to a global "
    "distinct shuffle. Counted domain: distinct (doc, term) incidence "
    "pairs (the DF denominator) — large enough (~12k at sf0.01) that the "
    "raw estimator is in its accurate range without the small-range "
    "linear-counting branch. Oracle checks estimate, true count, error bp",
)
def sk_hll(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..operators.sketches import hll_build, hll_estimate

    d = load_table(spark, sf, "documents")
    # eager (r18): feeds the HLL build and the exact-count twin under one
    # action — lazy persist would explode+concat the corpus per stage
    toks = eager_cache(
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("t"))
        .select(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("t")).alias("tok"))
    )
    est = hll_estimate(hll_build(toks, "tok"))
    true = toks.agg(F.count_distinct("tok").alias("true_distinct"))
    return est.crossJoin(true).select(
        "est_distinct",
        "true_distinct",
        "nonempty_buckets",
        F.expr("abs(est_distinct - true_distinct) * 10000 div true_distinct").alias("err_bp"),
    )


@register(
    "sk_histogram_quantiles",
    """
    WITH s AS (
      SELECT least(255, greatest(0, cast(floor(l_extendedprice / 512.0) AS int))) AS bucket,
             count(*) AS c
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT bucket, c,
             sum(c) OVER (ORDER BY bucket) AS cum,
             sum(c) OVER () AS n
      FROM s),
    qs(q) AS (VALUES (0.5), (0.9), (0.99))
    SELECT q, round(512.0 * (bucket + (q * n - (cum - c)) / c), 2) AS est
    FROM cum, qs
    WHERE cum >= q * n AND (cum - c) < q * n
    ORDER BY q
    """,
    doc="one-pass mergeable quantile sketch: fixed-width histogram (<= 256 "
    "rows whatever the input size; power-of-two width keeps the bucket "
    "arithmetic float-exact across engines) + linear interpolation inside "
    "the crossing bucket — the verifiable stand-in for approx_percentile, "
    "whose t-digest is engine-private. Merging per-partition/day sketches "
    "is the same groupBy-sum (sum-monoid, like sk_countmin); at 100 TB the "
    "quantile query never re-touches the data, only the sketch",
)
def sk_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketches import histogram_build, histogram_quantiles

    li = load_table(spark, sf, "lineitem")
    sketch = histogram_build(li, "l_extendedprice", lo=0.0, width=512.0, nb=256)
    return histogram_quantiles(sketch, [0.5, 0.9, 0.99], lo=0.0, width=512.0)


@register(
    "sk_quantiles_adaptive",
    """
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    mm AS (SELECT min(value) AS lo, max(value) AS hi FROM v),
    p AS (SELECT lo, CASE WHEN hi > lo THEN (hi - lo) / 256.0 ELSE 1.0 END AS w
          FROM mm),
    s AS (SELECT least(255, greatest(0,
                   CAST(floor((value - p.lo) / p.w) AS INT))) AS bucket,
                 count(*) AS c
          FROM v, p GROUP BY 1),
    cum AS (SELECT bucket, c,
                   sum(c) OVER (ORDER BY bucket) AS cum,
                   sum(c) OVER () AS n FROM s),
    qs(q) AS (VALUES (0.25), (0.5), (0.95))
    SELECT q, round((SELECT lo FROM p) + (SELECT w FROM p)
                    * (bucket + (q * n - (cum - c)) / c), 2) AS est
    FROM cum, qs
    WHERE cum >= q * n AND (cum - c) < q * n
    ORDER BY q
    """,
    doc="unbounded-domain quantile sketch: pass 1 discovers the range "
    "(min/max, one scalar row), pass 2 is the fixed-width 256-bucket "
    "histogram with lo=min, width=(max-min)/256 and linear interpolation "
    "in the crossing bucket - rank error <= one bucket width with no "
    "prior range knowledge, vs sk_histogram_quantiles' schema-assumed "
    "range; identical IEEE expression order on both engines makes the "
    "estimate bit-reproducible - see "
    "operators/sketches.py:histogram_quantiles_adaptive",
)
def sk_quantiles_adaptive(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketches import histogram_quantiles_adaptive

    ev = load_table(spark, sf, "events")
    return histogram_quantiles_adaptive(ev, "value", [0.25, 0.5, 0.95])


def _hll_grouped_oracle() -> str:
    """DuckDB twin of the GROUPED portable HLL sketch (same constants as
    _hll_oracle; grouped by event_type over user-day incidence items)."""
    from ..operators.sketches import HLL_ALPHA, HLL_M, HLL_P, HLL_RHO_BITS

    mask = (1 << HLL_RHO_BITS) - 1
    alpha_m2 = HLL_ALPHA * HLL_M * HLL_M
    return f"""
    WITH it AS (SELECT event_type,
                       user_id::VARCHAR || ':' || CAST(CAST(ts AS DATE) AS VARCHAR) AS item
                FROM events),
    h AS (SELECT event_type,
                 ('0x' || substr(md5(item || ':hll'), 1, 15))::BIGINT AS h FROM it),
    br AS (SELECT event_type, h % {HLL_M} AS bucket, (h >> {HLL_P}) & {mask} AS rem FROM h),
    r AS (SELECT event_type, bucket,
                 max(CASE WHEN rem = 0 THEN {HLL_RHO_BITS + 1}
                          ELSE length(bin(rem & -rem)) END) AS rho
          FROM br GROUP BY 1, 2),
    s AS (SELECT event_type, count(*) AS nb,
                 sum(CAST(1 AS DOUBLE) / (1::BIGINT << rho)) AS s_ne
          FROM r GROUP BY event_type),
    est AS (SELECT event_type,
                   CAST(floor(CAST('{alpha_m2!r}' AS DOUBLE)
                              / (CAST({HLL_M} - nb AS DOUBLE) + s_ne)) AS BIGINT)
                     AS est_distinct,
                   nb AS nonempty_buckets FROM s),
    t AS (SELECT event_type, count(DISTINCT item) AS true_distinct
          FROM it GROUP BY event_type)
    SELECT est.event_type, est_distinct, true_distinct, nonempty_buckets,
           abs(est_distinct - true_distinct) * 10000 // true_distinct AS err_bp
    FROM est JOIN t USING (event_type)
    """


@register(
    "sk_hll_grouped",
    _hll_grouped_oracle(),
    doc="per-group HyperLogLog: distinct active user-days per event_type in "
    "ONE pass over the events table — (group, bucket, rho) sketches of at "
    "most 256 rows per group, so the shuffle carries sketch rows instead "
    "of every raw (user, day) pair: THE 100 TB shape for per-day/source "
    "distinct telemetry. Same portable hash family and exact-dyadic "
    "estimator as sk_hll; oracle checks per-group estimate, true count, "
    "and error bp",
)
def sk_hll_grouped(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketches import hll_build_grouped, hll_estimate_grouped

    e = load_table(spark, sf, "events")
    items = e.select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.to_date("ts").cast("string")
        ).alias("item"),
    )
    est = hll_estimate_grouped(hll_build_grouped(items, "item", ["event_type"]), ["event_type"])
    true = items.groupBy("event_type").agg(F.count_distinct("item").alias("true_distinct"))
    return est.join(true, "event_type").select(
        "event_type",
        "est_distinct",
        "true_distinct",
        "nonempty_buckets",
        F.expr("abs(est_distinct - true_distinct) * 10000 div true_distinct").alias("err_bp"),
    )


@register(
    "tx_sliding_chunks",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ch AS (
      SELECT doc_id, unnest(list_transform(
               range(0, CASE WHEN len(toks) = 0 THEN 0
                             ELSE (len(toks) - 1) // 48 + 1 END),
               i -> struct_pack(
                      chunk_id := i,
                      chunk := array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' '))
             )) AS c
      FROM t)
    SELECT doc_id, c.chunk_id AS chunk_id,
           len({_TOKS_SQL.replace("text", "c.chunk")}) AS chunk_tokens,
           md5(c.chunk) AS chunk_md5
    FROM ch JOIN documents USING (doc_id)
    """,
    doc="sliding-window chunking with overlap (window 64 tokens, stride 48): "
    "the RAG / pretraining windowing primitive. Per-doc array slices — "
    "strictly local work, no shuffle at all until a downstream consumer "
    "groups; chunk text value-checked by md5 like tx_pii_scrub. The last "
    "chunk may be short (clamped slice); empty docs emit no chunks",
)
def tx_sliding_chunks(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import tokens as _tokens

    window, stride = 64, 48
    d = load_table(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    n_chunks = F.when(F.size(toks) == 0, F.lit(0)).otherwise(
        (F.size(toks) - 1) / F.lit(stride) + 1
    ).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.concat_ws(" ", F.slice(toks, i * stride + 1, window)).alias("chunk"),
            ),
        )
    )
    # sequence(0, -1) would generate a DESCENDING range for empty docs;
    # filter them before the generator instead
    ch = d.where(F.size(toks) > 0).select("doc_id", chunk.alias("c"))
    return ch.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size(F.split(F.lower(F.trim(F.col("c.chunk"))), r"\s+")).alias("chunk_tokens"),
        F.md5(F.col("c.chunk")).alias("chunk_md5"),
    )


def _url_oracle() -> str:
    """DuckDB twin of canonical_url (functions/text.py) over the same
    deterministically planted URL variants. RE2 replacement syntax (\\1,
    explicit 'g' flag) vs Spark's Java ($1, global by default) — same
    outputs, rule for rule."""
    plant = (
        "CASE doc_id % 4 "
        "WHEN 0 THEN 'HTTPS://Example.COM:443/articles/' || (doc_id % 50) "
        "WHEN 1 THEN 'https://example.com/articles/' || (doc_id % 50) || '/' "
        "WHEN 2 THEN 'https://example.com/articles/' || (doc_id % 50) "
        "|| '?utm_source=feed&utm_campaign=x' "
        "ELSE 'https://example.com/articles/' || (doc_id % 50) || '#section-2' END"
    )
    return f"""
    WITH raw AS (SELECT doc_id, {plant} AS url FROM documents),
    c0 AS (SELECT doc_id,
                  lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*'))
                  || substr(url, length(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1)
                  AS u FROM raw),
    c1 AS (SELECT doc_id, regexp_replace(u, '#.*', '', 'g') AS u FROM c0),
    c2 AS (SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
                    '^https://([^/:?#]+):443/', 'https://\\1/'),
                    '^https://([^/:?#]+):443$', 'https://\\1'),
                    '^http://([^/:?#]+):80/', 'http://\\1/'),
                    '^http://([^/:?#]+):80$', 'http://\\1') AS u FROM c1),
    c3 AS (SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(u,
                    '([?&])((?:utm_[a-z]+|gclid|fbclid)=[^&#]*&?)+', '\\1', 'g'),
                    '\\?&+', '?', 'g'),
                    '[?&]+$', '', 'g') AS u FROM c2),
    canon AS (SELECT doc_id, regexp_replace(u, '/+$', '', 'g') AS canonical_url FROM c3)
    SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keep_doc
    FROM canon GROUP BY canonical_url
    """


@register(
    "tx_url_canonicalize",
    _url_oracle(),
    doc="URL canonicalization + dedup-by-URL (the CommonCrawl-style crawl "
    "dedup key): lowercase scheme/host, drop fragments, strip default "
    "ports and utm/gclid/fbclid tracking params, trim trailing slashes — "
    "pure regexp built-ins kept to RE2-compatible syntax so the oracle "
    "mirrors every rule. The corpus has no URL column, so variants are "
    "planted deterministically on doc_id residues (the tx_pii_scrub "
    "pattern): 4 surface forms per target collapse to one canonical key",
)
def tx_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import canonical_url

    d = load_table(spark, sf, "documents")
    k = (F.col("doc_id") % 50).cast("string")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("HTTPS://Example.COM:443/articles/"), k))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("https://example.com/articles/"), k, F.lit("/")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://example.com/articles/"), k, F.lit("?utm_source=feed&utm_campaign=x")),
        )
        .otherwise(F.concat(F.lit("https://example.com/articles/"), k, F.lit("#section-2")))
    )
    canon = d.select("doc_id", canonical_url(raw).alias("canonical_url"))
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc")
    )


def _semdedup_oracle(k: int = 8, iters: int = 3, dim: int = 64, r: int = 6, tau: float = 0.45) -> str:
    """DuckDB twin of semantic_dedup: the unrolled k-means CTEs (shared with
    _kmeans_oracle) + within-cluster pairwise cosine + greedy keep-first."""
    ctes = _kmeans_ctes(k, iters, dim, r)
    fa = f"assign{iters - 1}"
    cos = (
        f"round(list_reduce(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]), (x, y) -> x + y)"
        f" / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))"
        f" * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y))), 6)"
    )
    ctes.append(
        f"drops AS (SELECT DISTINCT a.cluster, b.vec_id FROM {fa} a JOIN {fa} b "
        f"ON a.cluster = b.cluster AND a.vec_id < b.vec_id WHERE {cos} >= {tau})"
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT m.cluster, m.n_members, coalesce(d.n_dropped, 0) AS n_dropped
    FROM (SELECT cluster, count(*) AS n_members FROM {fa} GROUP BY cluster) m
    LEFT JOIN (SELECT cluster, count(*) AS n_dropped FROM drops GROUP BY cluster) d
    USING (cluster)
    """


@register(
    "dd_semantic",
    _semdedup_oracle(),
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023): k-means cluster "
    "the embeddings (the same value-checked 3-iteration Lloyd trajectory "
    "as ml_kmeans), then drop within-cluster items with a >= 0.45-cosine "
    "smaller-id neighbor (greedy keep-first, deterministic). Clustering "
    "confines the pairwise stage to sum(|cluster|^2) instead of n^2 — at "
    "scale k grows with n to bound cluster sizes, and the pair stage is a "
    "cluster-keyed equi-join AQE can split. Cosine rounded to 6 before "
    "thresholding so both engines decide identically",
)
def dd_semantic(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.clustering import semantic_dedup

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return semantic_dedup(emb, "vec_id", "embedding", k=8, iters=3, tau=0.45)
