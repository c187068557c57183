"""Round-10 operators: column profiler, transition matrix, shard manifest,
HTML extraction, product quantization.

The oracle gate (tools/check_oracle.py) value-checks each registered query
against DuckDB; these tests cover what the oracle can't: the approximate
profiler path, the HTML round-trip property, shard balance, and PQ's
recall / determinism / code-range invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.operators.htmltext import extract_main_text, synth_page
from data_wrangle_openstreetmaps_data_1_spark.operators.pq import (
    adc_topk,
    encode_pq,
    train_pq_codebooks,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.profiling import profile_columns
from data_wrangle_openstreetmaps_data_1_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# dq_profile
# --------------------------------------------------------------------------


def test_profile_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (2, "bbbb"), (None, "cc")], "k int, s string"
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_repr"], k["max_repr"]) == ("1", "2")
    # lengths of "1","2","2" -> 3*100 div 3 = 100
    assert k["avg_len_x100"] == 100
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 3)
    # "aa","bbbb","cc" -> 8*100 div 3 = 266
    assert s["avg_len_x100"] == 266


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    r = profile_columns(df, ["x"]).collect()[0]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (2, 2, 0)
    assert r["min_repr"] is None and r["max_repr"] is None
    assert r["avg_len_x100"] == 0  # coalesce(sum, 0) / greatest(count, 1)


def test_profile_approximate_path_drops_expand(spark):
    d = load_table(spark, SF, "documents")
    exact_plan = profile_columns(d, ["lang", "source"])._jdf.queryExecution().executedPlan().toString()
    approx = profile_columns(d, ["lang", "source"], approximate=True)
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the honest multi-distinct cost
    assert "Expand" not in approx_plan  # HLL sketches: no row replication
    rows = {r["col_name"]: r for r in approx.collect()}
    # sketch estimates on tiny cardinalities are exact-ish; sanity-bound them
    assert 0 < rows["lang"]["n_distinct"] <= 10


# --------------------------------------------------------------------------
# tx_html_extract round-trip
# --------------------------------------------------------------------------


def test_html_extract_roundtrip_recovers_text(spark):
    d = load_table(spark, SF, "documents")
    page = synth_page(F.col("text"), F.col("source"), F.col("doc_id"))
    bad = d.select("text", extract_main_text(page).alias("clean")).where(
        F.col("clean") != F.col("text")
    )
    assert bad.count() == 0


def test_html_extract_link_counts(spark):
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    rows = query_map()["tx_html_extract"](spark, SF).collect()
    for r in rows:
        # template: 2 nav + 1 footer links, +1 banner link on every 3rd doc
        assert r["n_links"] == (4 if r["doc_id"] % 3 == 0 else 3)
        assert r["clean_len"] > 0


# --------------------------------------------------------------------------
# a_transition_matrix invariants
# --------------------------------------------------------------------------


def test_transition_matrix_mass_conservation(spark):
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    e = load_table(spark, SF, "events")
    out = query_map()["a_transition_matrix"](spark, SF)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == e.count()  # every event is a transition target exactly once
    starts = out.where(F.col("prev_type") == "START").agg(F.sum("n")).collect()[0][0]
    assert starts == e.select("user_id").distinct().count()


# --------------------------------------------------------------------------
# tx_shard_manifest balance
# --------------------------------------------------------------------------


def test_shard_manifest_covers_and_balances(spark):
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    rows = query_map()["tx_shard_manifest"](spark, "/root/testdata/sf0.01").collect()
    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    toks = [r["tokens_total"] for r in rows]
    # LLN balance: with ~60 docs/shard the spread stays well under 2x
    assert max(toks) < 2 * min(toks)


# --------------------------------------------------------------------------
# product quantization
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_parts(spark):
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb = train_pq_codebooks(emb, "vec_id", "v", m=8, dsub=8, ksub=16, iters=1, round_to=6)
    return emb, cb


def test_pq_codebook_shape_and_quantization(pq_parts):
    _, cb = pq_parts
    assert len(cb) == 8 and all(len(b) == 16 for b in cb)
    for book in cb:
        for cent in book:
            assert len(cent) == 8
            for x in cent:
                assert x == round(x, 6)  # per-iteration quantization contract


def test_pq_codes_in_range_and_deterministic(spark, pq_parts):
    emb, cb = pq_parts
    enc = encode_pq(emb, "v", cb, 8).select("vec_id", *[f"code{i}" for i in range(8)])
    pdf = enc.orderBy("vec_id").toPandas()
    for i in range(8):
        assert pdf[f"code{i}"].between(1, 16).all()
    # retrain + re-encode: bit-identical codes (no RNG anywhere)
    cb2 = train_pq_codebooks(emb, "vec_id", "v", m=8, dsub=8, ksub=16, iters=1, round_to=6)
    assert cb2 == cb
    pdf2 = encode_pq(emb, "v", cb2, 8).select(
        "vec_id", *[f"code{i}" for i in range(8)]
    ).orderBy("vec_id").toPandas()
    assert pdf.equals(pdf2)


def test_pq_adc_recall_vs_exact(spark, pq_parts):
    """Exhaustive ADC vs exact L2 top-5 over 20 queries: quantization-only
    recall. The floor is intentionally modest — 8x8 PQ on 64-dim data is a
    coarse 32x compression — but it must stay meaningfully above the
    ~0.01 random-pick baseline (5 of 499)."""
    emb, cb = pq_parts
    enc = encode_pq(emb, "v", cb, 8).select("vec_id", *[f"code{i}" for i in range(8)])
    nq = 20
    queries = [
        (r["vec_id"], list(r["v"]))
        for r in emb.where(F.col("vec_id") < nq).orderBy("vec_id").collect()
    ]
    pq_top = adc_topk(enc, "vec_id", queries, cb, 8, k=5).collect()
    approx = {}
    for r in pq_top:
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = 0
    for qid, qvec in queries:
        lit = "array(" + ", ".join(repr(float(x)) + "D" for x in qvec) + ")"
        exact = (
            emb.where(F.col("vec_id") != qid)
            .select(
                "vec_id",
                F.expr(
                    f"aggregate(zip_with(v, {lit}, (a, b) -> (a - b) * (a - b)), "
                    "cast(0.0 as double), (acc, x) -> acc + x)"
                ).alias("d2"),
            )
            .orderBy("d2", "vec_id")
            .limit(5)
            .collect()
        )
        hits += len(approx[qid] & {t["vec_id"] for t in exact})
    recall = hits / (5 * nq)
    assert recall >= 0.15, f"recall@5 collapsed to {recall}"


def test_pq_seed_contract_raises(spark):
    df = spark.createDataFrame(
        [(5, [1.0] * 16), (6, [2.0] * 16)], "vec_id long, v array<double>"
    )
    with pytest.raises(ValueError, match="seed contract"):
        train_pq_codebooks(df, "vec_id", "v", m=2, dsub=8, ksub=4, iters=1)


# --------------------------------------------------------------------------
# unigram tokenizer tier
# --------------------------------------------------------------------------


def test_unigram_segment_roundtrip_and_vocab_membership(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.unigram import (
        segment_words,
        select_vocab,
        word_counts,
    )

    words = word_counts(load_table(spark, SF, "documents"), "text")
    vocab = [p for p, _ in select_vocab(words, 48)]
    assert len(vocab) == 48 and all(2 <= len(p) <= 4 for p in vocab)
    max_len = words.agg(F.max(F.length("word"))).collect()[0][0]
    segd = segment_words(words, vocab, max_len).collect()
    vset = set(vocab)
    for r in segd:
        pieces = r["seg"][1:].split("|")
        # lossless: pieces concatenate back to the word
        assert "".join(pieces) == r["word"]
        # every piece is a vocab entry or a single-char fallback
        for p in pieces:
            assert p in vset or len(p) == 1
        # greedy: a multi-char vocab piece is never split when it could
        # have been taken — spot-check position 1
        for plen in (4, 3, 2):
            if r["word"][:plen] in vset:
                assert pieces[0] == r["word"][:plen]
                break


def test_unigram_segment_raises_on_overlong_word(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.unigram import segment_words

    df = spark.createDataFrame([("abcdefghij", 1)], "word string, wc long")
    with pytest.raises(ValueError, match="max_len"):
        segment_words(df, ["ab"], max_len=4)


def test_unigram_registered_mass_conservation(spark):
    """Sum over ALL segmented pieces of len(piece)*uses equals the total
    character mass of the corpus' words (computed over the full piece set,
    not the top-30 the registered query returns)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.unigram import (
        segment_words,
        select_vocab,
        word_counts,
    )

    words = word_counts(load_table(spark, SF, "documents"), "text")
    vocab = [p for p, _ in select_vocab(words, 48)]
    max_len = words.agg(F.max(F.length("word"))).collect()[0][0]
    segd = segment_words(words, vocab, max_len)
    piece_mass = (
        segd.select("wc", F.explode(F.split(F.expr("substring(seg, 2)"), r"\|")).alias("p"))
        .agg(F.sum(F.length("p") * F.col("wc")))
        .collect()[0][0]
    )
    char_mass = words.agg(F.sum(F.length("word") * F.col("wc"))).collect()[0][0]
    assert piece_mass == char_mass


# --------------------------------------------------------------------------
# collocations
# --------------------------------------------------------------------------


def test_collocations_support_and_lift(spark):
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    rows = query_map()["tx_collocations"](spark, "/root/testdata/sf0.01").collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["cab"] >= 5
        assert r["lift"] > 0
        assert len(r["bigram"].split(" ")) == 2
    # ranked descending by lift
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


# --------------------------------------------------------------------------
# heavy hitters
# --------------------------------------------------------------------------


def test_heavy_hitters_matches_census_and_partitioning_invariant(spark):
    from data_wrangle_openstreetmaps_data_1_spark.functions.text import tokens as _tokens
    from data_wrangle_openstreetmaps_data_1_spark.operators.heavy import heavy_hitters

    d = load_table(spark, SF, "documents")
    toks = d.select(F.explode(_tokens(F.col("text"))).alias("t")).where(F.length("t") > 0)
    n = toks.count()
    for k in (10, 29, 100):
        got = {(r["token"], r["cnt"]) for r in heavy_hitters(d, "text", k).collect()}
        want = {
            (r["t"], r["c"])
            for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
            if r["c"] * k > n
        }
        assert got == want, f"k={k}"
    # batching/partitioning must not change the answer
    re4 = heavy_hitters(d.repartition(4), "text", 29).collect()
    re1 = heavy_hitters(d.coalesce(1), "text", 29).collect()
    assert {(r["token"], r["cnt"]) for r in re4} == {(r["token"], r["cnt"]) for r in re1}


# --------------------------------------------------------------------------
# SCD2
# --------------------------------------------------------------------------


def _scd_base(spark):
    return spark.createDataFrame(
        [
            (1, 100, "A", 0, None, True),
            (2, 200, "B", 0, None, True),
            (3, 300, "C", 0, None, True),
            # pre-existing history row: must pass through untouched
            (1, 90, "A", -1, 0, False),
        ],
        "key long, bal long, seg string, valid_from long, valid_to long, is_current boolean",
    )


def test_scd2_versions_changes_and_ignores_noops(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.scd import scd2_apply

    changes = spark.createDataFrame(
        [(1, 150, "A"), (2, 200, "B"), (9, 900, "Z")],  # 2 = no-op, 9 = unknown key
        "key long, bal long, seg string",
    )
    out = scd2_apply(_scd_base(spark), changes, "key", ["bal", "seg"], batch_id=1)
    rows = {(r["key"], r["valid_from"]): r for r in out.collect()}
    assert len(rows) == 5  # 4 input rows + exactly ONE new version (key 1)
    closed = rows[(1, 0)]
    assert closed["valid_to"] == 1 and not closed["is_current"] and closed["bal"] == 100
    newv = rows[(1, 1)]
    assert newv["is_current"] and newv["valid_to"] is None and newv["bal"] == 150
    # no-op update: key 2 untouched and still current
    assert rows[(2, 0)]["is_current"] and rows[(2, 0)]["valid_to"] is None
    # history row untouched
    assert rows[(1, -1)]["valid_to"] == 0
    # unknown key in batch: ignored (dim drives SCD2; inserts are type-1's job)
    assert (9, 1) not in rows


def test_scd2_null_transitions_are_material(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, None, "A", 0, None, True), (2, 5, None, 0, None, True)],
        "key long, bal long, seg string, valid_from long, valid_to long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, 10, "A"), (2, 5, None)],  # 1: NULL->10 material; 2: NULL==NULL no-op
        "key long, bal long, seg string",
    )
    out = scd2_apply(dim, changes, "key", ["bal", "seg"], batch_id=1).collect()
    by = {(r["key"], r["valid_from"]): r for r in out}
    assert (1, 1) in by and by[(1, 1)]["bal"] == 10
    assert (2, 1) not in by  # NULL-to-NULL is not a change


def test_scd2_chained_batches(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.scd import scd2_apply

    changes1 = spark.createDataFrame([(1, 150, "A")], "key long, bal long, seg string")
    changes2 = spark.createDataFrame([(1, 175, "B")], "key long, bal long, seg string")
    v1 = scd2_apply(_scd_base(spark), changes1, "key", ["bal", "seg"], batch_id=1)
    v2 = scd2_apply(v1, changes2, "key", ["bal", "seg"], batch_id=2)
    k1 = sorted(
        [r for r in v2.collect() if r["key"] == 1],
        key=lambda r: (r["valid_from"]),
    )
    spans = [(r["valid_from"], r["valid_to"], r["is_current"], r["bal"]) for r in k1]
    assert spans == [(-1, 0, False, 90), (0, 1, False, 100), (1, 2, False, 150), (2, None, True, 175)]


# --------------------------------------------------------------------------
# interval-overlap join
# --------------------------------------------------------------------------


def test_interval_overlap_matches_brute_and_dedups(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.range_join import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [
            (1, 10, 0, 6),     # overlaps b10 (touching at 6) and b11
            (2, 10, 100, 130), # spans 3 bins shared with b12 -> must count ONCE
            (3, 10, 50, 40),   # inverted: dropped
            (4, 20, 0, 6),     # other entity: no cross-entity pairs
        ],
        "k long, ent long, s long, e long",
    )
    b = spark.createDataFrame(
        [
            (10, 10, 6, 9),      # touches a1 at exactly 6
            (11, 10, 3, 4),      # inside a1
            (12, 10, 95, 135),   # long overlap with a2 across bins
            (13, 10, 7, 9),      # misses a1 (starts after its end)
            (14, 20, 100, 101),  # other entity, no overlap with a4
        ],
        "k long, ent long, s long, e long",
    )
    out = interval_overlap_join(a, b, on="ent", bin_width=14).collect()
    pairs = sorted((r["a_k"], r["b_k"]) for r in out)
    assert pairs == [(1, 10), (1, 11), (2, 12)]  # each exactly once
    # brute-force equivalence on the same frames
    brute = (
        a.where(F.col("e") >= F.col("s"))
        .alias("x")
        .join(b.alias("y"), (F.col("x.ent") == F.col("y.ent")))
        .where((F.col("x.s") <= F.col("y.e")) & (F.col("y.s") <= F.col("x.e")))
        .select(F.col("x.k").alias("ak"), F.col("y.k").alias("bk"))
        .collect()
    )
    assert sorted((r["ak"], r["bk"]) for r in brute) == pairs


# --------------------------------------------------------------------------
# IVF-PQ composition
# --------------------------------------------------------------------------


def test_ivf_pq_prunes_by_cluster_and_tracks_pq(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.similarity import ivf_assign
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    sf = "/root/testdata/sf0.01"
    ivfpq = query_map()["sim_ivf_pq"](spark, sf).collect()
    assert len(ivfpq) == 15  # 3 queries x top-5
    # every returned neighbor's cluster must be among its query's probes
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.where(F.col("vec_id") < 16)
    tclu = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cent, "vec_id", "v", nprobe=1).collect()
    }
    qclu = {}
    for r in ivf_assign(
        emb.where(F.col("vec_id") < 3), cent, "vec_id", "v", nprobe=2
    ).collect():
        qclu.setdefault(r["vec_id"], set()).add(r["cluster"])
    for r in ivfpq:
        assert tclu[r["vec_id"]] in qclu[r["query_id"]]
    # composition sanity: IVF-PQ ranks a SUBSET of sim_pq's candidate pool,
    # so per query its ADC distances are >= the exhaustive PQ top-5's floor
    pq = query_map()["sim_pq"](spark, sf).collect()
    best = {}
    for r in pq:
        best[r["query_id"]] = min(best.get(r["query_id"], float("inf")), r["adc_d2"])
    for r in ivfpq:
        assert r["adc_d2"] >= best[r["query_id"]] - 1e-9


# --------------------------------------------------------------------------
# streaming transition matrix
# --------------------------------------------------------------------------


def test_transition_stream_multi_batch_equals_batch(spark, tmp_path):
    """Time-split multi-batch stream must chain transitions across batch
    boundaries through the frontier state and equal the batch matrix."""
    import uuid

    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map
    from data_wrangle_openstreetmaps_data_1_spark.streaming.transitions import transition_stream

    out = str(tmp_path / "events_multi")
    events = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    bounds = events.select(
        F.expr("percentile(ts_us, array(0.25, 0.5, 0.75))").alias("p")
    ).collect()[0]["p"]
    lo = float("-inf")
    for hi in [*bounds, float("inf")]:
        chunk = events.where((F.col("ts_us") > lo) & (F.col("ts_us") <= hi))
        chunk.coalesce(1).write.mode("append").parquet(out)
        lo = hi
    raw = (
        spark.readStream.schema("event_id long, user_id long, event_type string, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(out)
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )
    sink = f"st_trans_{uuid.uuid4().hex[:10]}"
    q = (
        transition_stream(raw)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.table(sink)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    batch = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in query_map()["a_transition_matrix"](spark, SF).collect()
    }
    assert streamed == batch


def test_transition_walk_frontier_semantics():
    import pandas as pd

    from data_wrangle_openstreetmaps_data_1_spark.streaming.transitions import transition_walk

    b1 = pd.DataFrame({"ts_us": [10, 20], "event_id": [1, 2], "event_type": ["v", "c"]})
    rows, frontier = transition_walk(iter([b1]), None)
    assert sorted(rows) == [("START", "v", 1), ("v", "c", 1)]
    assert frontier == (20, 2, "c")
    # next batch chains from the frontier, not from START
    b2 = pd.DataFrame({"ts_us": [30], "event_id": [3], "event_type": ["p"]})
    rows2, frontier2 = transition_walk(iter([b2]), frontier)
    assert rows2 == [("c", "p", 1)]
    assert frontier2 == (30, 3, "p")
    # timestamp tie broken by event_id; multi-chunk concat before sort
    c1 = pd.DataFrame({"ts_us": [40], "event_id": [5], "event_type": ["b"]})
    c2 = pd.DataFrame({"ts_us": [40], "event_id": [4], "event_type": ["a"]})
    rows3, _ = transition_walk(iter([c1, c2]), frontier2)
    assert ("p", "a", 1) in rows3 and ("a", "b", 1) in rows3
    # empty batch: state passes through untouched
    rows4, frontier4 = transition_walk(iter([]), frontier2)
    assert rows4 == [] and frontier4 == frontier2


# --------------------------------------------------------------------------
# grid kNN join
# --------------------------------------------------------------------------


def _brute_knn(a_rows, b_rows, k):
    import math

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[1], p[2], q[1], q[2]))
        x = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(x))

    out = set()
    for p in a_rows:
        ranked = sorted(((hav(p, q), q[0]) for q in b_rows))[:k]
        for rk, (_, bid) in enumerate(ranked, 1):
            out.add((p[0], bid, rk))
    return out


def test_grid_knn_ring1_and_escalation_match_brute(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import grid_knn_join

    # dense cluster (ring-1 final) + one COUNT-DEFICIENT point: its 3x3
    # block holds only 2 of k=3 neighbors, the third sits 2 cell indices
    # below but only ~1.35 km away — inside the ring-2 guarantee
    # (2 spans at max_abs_lat=48: ~1.49 km), so phase 2 must fire AND
    # certify, returning the exact brute answer. (A point whose kth
    # neighbor is FARTHER than the guarantee is correctly uncertifiable —
    # that case is the raise test below.)
    b_rows = [(i, 47.60 + 0.0002 * i, -117.50 + 0.0002 * i) for i in range(8)] + [
        (20, 47.6002, -117.4601),  # for the deficient point's cell area
        (21, 47.6003, -117.4602),
        (22, 47.5880, -117.4601),  # 2 cell indices below, ~1.35 km
    ]
    a_rows = [
        (100, 47.6001, -117.5001),  # dense: ring-1 final
        (101, 47.6005, -117.5003),  # dense: ring-1 final
        (102, 47.6001, -117.4601),  # count-deficient: escalates + certifies
    ]
    a = spark.createDataFrame(a_rows, "id_a long, lat double, lon double")
    b = spark.createDataFrame(b_rows, "id_b long, lat double, lon double")
    got = {
        (r["id_a"], r["id_b"], r["rk"])
        for r in grid_knn_join(a, b, k=3, cell_deg=0.01, max_abs_lat=48.0).collect()
    }
    assert got == _brute_knn(a_rows, b_rows, 3)


def test_grid_knn_raises_on_unsatisfiable_point(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import grid_knn_join

    # only 2 b-points exist in the straggler's 5x5 ring and k=3 -> must
    # raise loudly, not silently return 2 neighbors
    a = spark.createDataFrame([(1, 47.60, -117.50)], "id_a long, lat double, lon double")
    b = spark.createDataFrame(
        [(10, 47.601, -117.501), (11, 47.602, -117.502)],
        "id_b long, lat double, lon double",
    )
    with pytest.raises(ValueError, match="cannot certify"):
        grid_knn_join(a, b, k=3, cell_deg=0.01)


def test_grid_knn_empty_neighborhood_point_is_picked_up(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import grid_knn_join

    # a-point whose 3x3 block holds NO b at all (it never enters the ring-1
    # candidate frame) must still get its answer from the 5x5 ring: the b
    # cluster is 2 cell indices up but only ~1.35 km away, inside the
    # ring-2 guarantee
    a = spark.createDataFrame([(1, 47.6001, -117.500)], "id_a long, lat double, lon double")
    b_rows = [(i, 47.6001 + 0.0121, -117.500 + 0.0001 * i) for i in range(3)]
    b = spark.createDataFrame(b_rows, "id_b long, lat double, lon double")
    got = {
        (r["id_a"], r["id_b"], r["rk"])
        for r in grid_knn_join(a, b, k=3, cell_deg=0.01, max_abs_lat=48.0).collect()
    }
    assert got == _brute_knn([(1, 47.6001, -117.500)], b_rows, 3)


# --------------------------------------------------------------------------
# review fixes (round-10 self-review)
# --------------------------------------------------------------------------


def test_scd2_null_is_current_rows_pass_through(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, 100, 0, None, True), (2, 50, 0, None, None)],  # NULL flag row
        "key long, bal long, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame([(1, 150), (2, 999)], "key long, bal long")
    out = scd2_apply(dim, ch, "key", ["bal"], batch_id=1).collect()
    # the NULL-flagged row must survive untouched (history passthrough),
    # not vanish, and must NOT be versioned by the batch
    null_rows = [r for r in out if r["key"] == 2]
    assert len(null_rows) == 1 and null_rows[0]["bal"] == 50
    assert len(out) == 3  # 2 originals + 1 new version for key 1


def test_grid_knn_raises_beyond_max_abs_lat(spark):
    from data_wrangle_openstreetmaps_data_1_spark.operators.geo_queries import grid_knn_join

    a = spark.createDataFrame([(1, 70.0, 10.0)], "id_a long, lat double, lon double")
    b = spark.createDataFrame([(2, 70.1, 10.1)], "id_b long, lat double, lon double")
    with pytest.raises(ValueError, match="exceeds"):
        grid_knn_join(a, b, k=1, cell_deg=1.0, max_abs_lat=60.0)


def test_adc_topk_empty_queries_raises(spark, pq_parts):
    emb, cb = pq_parts
    enc = encode_pq(emb, "v", cb, 8)
    with pytest.raises(ValueError, match="non-empty"):
        adc_topk(enc, "vec_id", [], cb, 8)
