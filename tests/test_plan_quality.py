"""Physical-plan quality gates (SURVEY §4): these assert the *plan shape*,
not results — pushdown reaching the scan, pruned read schemas, broadcast
joins for small dims, true top-k, and partial aggregation. A regression
here means a 100 TB run pays for it even though small-SF results stay
correct."""

from __future__ import annotations

import pytest

from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return query_map()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "tpch_q1_pricing")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only the 7 needed
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double" in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_q3_broadcast_and_topk(spark):
    plan = plan_of(spark, "tpch_q3_revenue")
    assert "TakeOrderedAndProject(limit=10" in plan  # no full sort for top-k
    assert plan.count("BroadcastHashJoin") >= 2  # dims broadcast, fact never shuffled
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_top_users_topk_and_pruning(spark):
    plan = plan_of(spark, "a2_top_users")
    assert "TakeOrderedAndProject(limit=10" in plan
    assert "partial_count" in plan
    # events has 6 columns; the scan must read exactly one
    assert "ReadSchema: struct<user_id:bigint>" in plan


def test_semi_and_anti_join_shapes(spark):
    semi = plan_of(spark, "j_semi_join")
    anti = plan_of(spark, "j_anti_join")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_exact_dedup_shuffles_hashes_not_text(spark):
    plan = plan_of(spark, "dd_exact")
    # the exchange key is the md5, and the full text column is not carried
    # through the aggregate output
    assert "md5" in plan
    assert "partial_min" in plan or "partial_first" in plan or "partial_count" in plan


def test_knn_broadcasts_queries_not_targets(spark):
    plan = plan_of(spark, "sim_knn_brute")
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan


def test_neardup_cosine_has_no_cartesian_product(spark):
    # candidates must come from the banded-LSH equi-join; an all-pairs
    # product here is the textbook 100 TB scale-killer (r1 verdict)
    plan = plan_of(spark, "sim_neardup_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_factfact_uses_sortmerge(spark):
    plan = plan_of(spark, "j_merge_factfact")
    assert "SortMergeJoin" in plan  # fact-fact path; neither side broadcast


def test_range_join_is_equi_not_nested_loop(spark):
    plan = plan_of(spark, "j_range_join")
    # the bucketized rewrite must join on the bucket key, not theta-scan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_shuffle_order_has_no_global_sort(spark):
    # the whole point vs orderBy(rand()): hash-partition by shard + local
    # sort inside the window — a rangepartitioning exchange would be the
    # global total-order the operator exists to avoid
    plan = plan_of(spark, "tx_shuffle_order")
    assert "rangepartitioning" not in plan.lower()
    assert "Window" in plan


def test_ngram_counts_topk_and_partial_agg(spark):
    plan = plan_of(spark, "tx_ngram_counts")
    assert "TakeOrderedAndProject(limit=50" in plan
    assert "partial_count" in plan  # map-side combine before the bigram shuffle


def test_pii_scrub_is_one_codegen_pass(spark):
    # pure per-row expressions: no exchange, no UDF eval node
    plan = plan_of(spark, "tx_pii_scrub")
    assert "Exchange" not in plan
    assert "Python" not in plan and "InPandas" not in plan


def test_mixture_sample_filter_precedes_shuffle(spark):
    # the content-hash keep rule is a stateless filter; only the final
    # per-source rollup may shuffle
    plan = plan_of(spark, "tx_mixture_sample")
    assert plan.count("Exchange") <= 2  # agg exchange (+AQE wrapper at most)
    assert "partial_count" in plan


def test_ngram_contamination_no_cartesian(spark):
    plan = plan_of(spark, "dd_ngram_contamination")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_explode_nonempty_defeats_inferred_filter(spark):
    """InferFiltersFromGenerate regression guard: a plain explode of a named
    computed array column infers a size>0 filter that pushes the array
    builder below exchanges (re-evaluated per input row at scan
    parallelism); explode_nonempty must not."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_1_spark.partitioning import explode_nonempty

    base = spark.range(100).select(
        "id", F.expr("transform(sequence(1, cast(id % 5 as int)), x -> x * id)").alias("arr")
    )
    control = base.select("id", F.explode("arr").alias("x"))
    control_plan = control._jdf.queryExecution().optimizedPlan().toString()
    fixed = explode_nonempty(base, ["id"], "arr", "x")
    fixed_plan = fixed._jdf.queryExecution().optimizedPlan().toString()

    def filter_mentions_builder(plan: str) -> bool:
        return any("transform(" in ln for ln in plan.splitlines() if "Filter" in ln)

    # the control documents the trap exists; if Spark ever stops inferring
    # the filter, the helper (and this test) can be retired
    assert filter_mentions_builder(control_plan), control_plan
    assert not filter_mentions_builder(fixed_plan), fixed_plan
    # semantics: identical rows
    assert sorted(map(tuple, fixed.collect())) == sorted(map(tuple, control.collect()))


def test_jaccard_scan_side_free_of_shingle_recompute(spark):
    """The shingle builder must appear in exactly one Generate input, never
    in a Filter pushed to the scan side of the spread() exchange."""
    plan = plan_of(spark, "dd_ngram_jaccard")
    for ln in plan.splitlines():
        if "Filter" in ln or "FileScan" in ln:
            assert "array_distinct" not in ln, ln
            assert "concat_ws" not in ln, ln


def test_minhash_is_aggregate_shaped_no_lambdas(spark):
    """MinHash runs as min() aggregates over exploded hash rows (codegen),
    not interpreted transform() lambdas over per-doc arrays."""
    plan = plan_of(spark, "dd_minhash_lsh")
    # the shingle builder's transform() is the one legitimate lambda (one
    # eval per doc); hashing and permutation arithmetic must NOT be inside
    # any lambda — they run per shingle and belong in codegen
    for ln in plan.splitlines():
        if "lambdafunction" in ln:
            assert "md5" not in ln and "xxhash64" not in ln, ln
    assert "partial_min" in plan  # map-side partial aggregation of the k mins
    assert "CartesianProduct" not in plan


def test_salted_skew_join_spreads_hot_keys(spark):
    """The salted join must key its exchange on (user_id, __salt) so a hot
    user's rows spread over `salt` tasks, stay a hash join (no cartesian
    fallback from the synthetic key), and show the round-6 TWO-PATH shape:
    a Union of the salted hot join and the untouched cold join."""
    plan = plan_of(spark, "j_salted_skew")
    assert "__salt" in plan
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_query_single_window_no_join(spark):
    plan = plan_of(spark, "j_asof_backward")
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert bad not in plan, bad


def test_funnel_single_shuffle_three_windows(spark):
    """Three stacked unordered window mins must reuse ONE (user, day)
    partitioning: a second exchange keyed on the same cols would mean the
    100 TB events table moves twice; the final stage rollup's exchange is
    AQE-coalesced and tiny."""
    plan = plan_of(spark, "a_funnel_stages")
    assert plan.count("Window") >= 3
    # exchanges: 1 for the window partitioning + (distinct/rollup aggs on
    # tiny per-key rows); the window partitioning must appear exactly once
    import re

    window_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "user_id" in ln and "day" in ln and "stage" not in ln
    ]
    assert len(window_exchanges) == 1, plan


def test_bm25_broadcasts_stats_prunes_scan(spark):
    plan = plan_of(spark, "tx_bm25_topk")
    # df and corpus stats are tiny aggregates: both reach the postings as
    # broadcasts, never shuffling the posting table by anything but term
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # the documents scan reads exactly the two needed columns
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "partial_count" in plan  # postings tf: map-side combine


def test_line_dedup_census_and_antijoin(spark):
    plan = plan_of(spark, "dd_line_dedup")
    # boilerplate drop is a LEFT ANTI equi-join on the 16-byte line hash
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the census pre-aggregates map-side before shuffling line hashes
    assert "partial_count" in plan


def test_incremental_join_never_pairs_index_with_itself(spark):
    plan = plan_of(spark, "dd_incremental")
    # every join is an equi-join (band key / hash / id) — no products
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan  # minhash signature: k min() partial aggs


def test_pagerank_round_is_join_plus_partial_agg(spark):
    plan = plan_of(spark, "ml_pagerank")
    assert "CartesianProduct" not in plan
    # 3 rounds => 3 contribution aggregations, each with map-side partials
    assert plan.count("partial_sum") >= 3


def test_fuzzy_blocked_is_equi_join(spark):
    plan = plan_of(spark, "j_fuzzy_blocked")
    # blocking must be an equi-join on (kpos, key); the Levenshtein verify
    # is a post-join filter, never a join condition forcing a product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q10_topk_and_broadcasts(spark):
    plan = plan_of(spark, "tpch_q10_returns")
    assert "TakeOrderedAndProject(limit=20" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_q19_disjunction_pushes_through_or(spark):
    plan = plan_of(spark, "tpch_q19_disjunctive")
    # Catalyst must extract the common-column disjunctions from the
    # OR-of-ANDs and push them to EACH scan — quantity bounds reach the
    # lineitem scan, brand/size reach the part scan, both below the join
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan
    assert "EqualTo(p_brand,Brand#" in plan
    assert "CartesianProduct" not in plan


def test_no_unexpected_products_registry_wide(spark):
    """Registry-wide plan lint: NO CartesianProduct anywhere, and the set
    of queries using BroadcastNestedLoopJoin is pinned — every entry below
    is an intentional crossJoin of a broadcast 1-row aggregate (corpus
    stats, hash constants) or the sanctioned tiny-theta-side geo/kNN
    shape. A new query accidentally introducing a product join fails here
    by name instead of shipping."""
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import query_map

    BNLJ_ALLOWED = {
        # broadcast 1-row corpus-stat / constant aggregates
        "tx_bm25_topk", "tx_domain_mix", "tx_tfidf_top_terms", "ml_pagerank",
        # the stored-index probe inherits tx_bm25_topk's 1-row stats cross
        "tx_bm25_stored",
        # both phases are bm25_probe results: same 1-row stats cross
        "tx_bm25_lifecycle",
        # multi-term sum scoring and phrase BM25 reuse the identical
        # broadcast 1-row corpus-stats crossJoin (text_index.py:
        # bm25_query_topk / phrase_bm25_probe); the merged-index query
        # probes through bm25_probe (same stats cross)
        "tx_bm25_multiterm", "tx_phrase_bm25", "tx_bm25_merged",
        "tx_bm25_boosted", "tx_bm25_paged",
        # r14b: all four rank through _bm25_query_scored — the identical
        # broadcast 1-row corpus-stats crossJoin; their filter/facet/seed
        # joins are equi- or semi-joins, adding no product shape
        "tx_bm25_filtered", "tx_bm25_diverse", "tx_mlt", "tx_bm25_tiered",
        "tx_bm25_msm", "tx_bm25_synonyms",
        # highlighter: ranking + anchor selection share the scored read
        # (same 1-row stats cross), winners broadcast for the snippet cut
        "tx_bm25_snippets",
        # r15: all four rank through _bm25_term_scores — the identical
        # broadcast 1-row corpus-stats crossJoin. maxscore adds only
        # equi-/semi-joins around it (essential-term candidates); the
        # composed query's filter/cursor joins are equi-/semi-joins; the
        # stored highlighter swaps the docs= join for the docstore read;
        # the maintain-cycle row probes the merged segment via
        # bm25_query_topk (sim_ivf_pq_filtered_auto is NOT here: the IVF
        # probe's LUT joins are all equi-joins, no product shape)
        "tx_bm25_maxscore", "tx_bm25_composed", "tx_bm25_snippets_stored",
        "tx_maintain_cycle",
        # lexical tier = bm25_probe (1-row stats cross); the stored vector
        # tier assigns clusters driver-side, so it adds no product join
        "sim_hybrid_stored",
        # filtered hybrid: the lexical leg is bm25_query_topk (the same
        # broadcast 1-row corpus-stats crossJoin); the allowed= semi-joins
        # on both legs are equi-joins, adding no product shape
        "sim_hybrid_filtered",
        # broadcast 1-row totals (tot_base/tot_batch/doc stats) crossed
        # onto the O(vocabulary) term join — see vocab_drift_report
        "tx_vocab_drift",
        "t_gap_fill", "sk_hll", "sk_histogram_quantiles", "dd_lsh_tier_audit",
        # adaptive form: same <=256-row sketch x 3-quantile broadcast cross
        "sk_quantiles_adaptive",
        # O(sqrt(corpus))-row freq histogram x broadcast 1-row total x
        # broadcast tiny coverage-target table (see vocab.py docstring)
        "tx_vocab_coverage",
        # bigram stats x broadcast 1-row (N, B) corpus totals
        "tx_collocations",
        "g_triangle_count", "sk_hll_intersect", "tx_drift_report", "dq_expectations",
        # broadcast tiny query/probe side (the deliberate theta shapes)
        "sim_knn_brute", "sim_ivf", "sim_quantized", "sim_rerank_pipeline",
        # same ivf_assign broadcast-centroid shape as sim_ivf
        "sim_ivf_pq",
        "sim_recall_at_k", "g3_near_radius", "g3_haversine_pairs",
        # hybrid fusion: the vector tier is the same broadcast-query kNN,
        # and BM25's corpus-stat crossJoin is a broadcast 1-row aggregate
        "sim_hybrid_rrf", "sim_hybrid_recall",
        # broadcast 1-row max(c_custkey) offset for scale-safe insert keys
        "u_upsert_snapshot", "u_snapshot_diff",
        # TPC-H scalar-subquery shapes: q11's global value threshold and
        # q22's global average balance are broadcast 1-row aggregates
        # (q15's max-revenue scalar collapses to an equi-join in the plan)
        "tpch_q11_important_stock", "tpch_q22_idle_customers",
    }
    # skipped: streaming queries EXECUTE on construction; iterative /
    # multi-action queries run real work during plan building (covered by
    # their own plan tests above)
    SKIP_PREFIXES = ("st_",)
    SKIP = {"dd_groups_cc", "dd_groups_cc_star", "dd_groups_minhash",
            "ml_kmeans", "dd_semantic", "tx_bpe_merges", "tx_bpe_encode",
            "dd_jaccard_prefix"}
    # plan construction runs real work for the stored-index queries (their
    # builds execute while the frame is assembled), so the sequential walk
    # was the suite's second-largest cost (471s of the r19 duration
    # profile). Constructions are independent — overlap them from a small
    # pool (guide §2.6) — but UNWRAPPED (registry raw functions, not
    # query_map()): the driver-contract wrapper's clearCache-at-start is
    # only safe BETWEEN queries; fired concurrently it evicts another
    # in-flight query's pre-rewrite persist barrier (see
    # tests/test_smoke.py::test_all_queries_execute_small). The lint
    # reads each query's own plan text, unaffected by neighbors.
    from concurrent.futures import ThreadPoolExecutor

    from data_wrangle_openstreetmaps_data_1_spark.plans import registry

    def lint(item):
        name, fn = item
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            return name, "CartesianProduct"
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            return name, "unexpected BroadcastNestedLoopJoin"
        return None

    registry._load_all()
    items = [
        (name, spec.spark)
        for name, spec in registry.QUERIES.items()
        if not name.startswith(SKIP_PREFIXES) and name not in SKIP
    ]
    try:
        with ThreadPoolExecutor(max_workers=6) as pool:
            offenders = dict(r for r in pool.map(lint, items) if r is not None)
    finally:
        spark.catalog.clearCache()
    assert not offenders, offenders


def test_core11_membership_pinned_against_registry():
    """bench.py's CORE11 is THE round-over-round comparator; a registry
    rename that drops a member would silently kill cross-round comparison
    (bench.py exits hard at runtime, but this catches it at test time,
    before a bench run ships a broken artifact)."""
    import bench
    from data_wrangle_openstreetmaps_data_1_spark.plans.registry import bench_queries

    assert len(bench.CORE11) == 11
    missing = [q for q in bench.CORE11 if q not in bench_queries()]
    assert not missing, (
        f"core11 queries missing from the bench registry: {missing} — "
        "restore the name or update CORE11 + document the comparator break"
    )
