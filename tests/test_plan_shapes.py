"""Physical-plan-shape gates for the headline queries.

Correctness tests prove the answers match the oracle; these prove the
PLANS are the ones that survive a 100x scale-up: pushed filters reach the
parquet scan, small dims broadcast instead of shuffling the fact, and the
shuffle count stays at the designed minimum.  A regression here is a
performance bug even when every value still matches.
"""

from __future__ import annotations

import re

from gmallrealtime02_spark.plans.registry import load_all
from gmallrealtime02_spark.sources.tables import load_table

QUERIES = load_all()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _strip_cached_subplans(plan: str) -> str:
    """Drop the stored build plan printed under every InMemoryRelation
    node.  A persisted intermediate's internal exchange executes ONCE
    (at cache population) but its textual dump repeats under every
    InMemoryTableScan consumer, inflating counts ~Nx.  (Until round 5
    ``caching.materialized`` eagerly localCheckpointed results, which
    hid cached subplans from these gates entirely; the lazy-release
    rewrite made the full true plan visible.)"""
    out = []
    skip_indent = None
    for line in plan.splitlines():
        indent = len(re.match(r"[\s:+|-]*", line).group(0))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
        out.append(line)
    return "\n".join(out)


def _exchanges(plan: str) -> int:
    """Count shuffle exchanges per execution (broadcast exchanges excluded
    — those are the cheap, intended data movement for dim sides; cached
    subplans excluded — they run once at population, see above)."""
    return len(
        re.findall(
            r"Exchange (?:hash|range|rounds|SinglePartition)",
            _strip_cached_subplans(plan),
        )
    )


def test_ts_bound_pushes_to_parquet_scan(spark, sf_dir):
    """Bounds must appear as parquet PushedFilters, not as residuals above
    the conversion Project — at scale this is the difference between
    reading row-group stats and reading the whole fact table.  events.ts
    is TIMESTAMP(NANOS) (surfaced as an epoch-nanos long), so its bound
    pushes as a raw-long compare; l_shipdate is native-unit and pushes as
    an ordinary timestamp predicate."""
    df = load_table(
        spark, sf_dir, "events", ts_bounds={"ts": ("2024-01-02", None)}
    )
    m = re.search(r"PushedFilters: \[([^\]]*)\]", _executed_plan(df))
    assert m and "GreaterThanOrEqual(ts" in m.group(1), m and m.group(1)

    df = load_table(
        spark, sf_dir, "lineitem", ts_bounds={"l_shipdate": (None, "1998-09-02")}
    )
    m = re.search(r"PushedFilters: \[([^\]]*)\]", _executed_plan(df))
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1), m and m.group(1)


def test_ts_bound_matches_post_conversion_filter(spark, sf_dir):
    """Raw-nanos bound semantics == filtering the converted µs timestamp."""
    from pyspark.sql import functions as F

    bounded = load_table(
        spark, sf_dir, "lineitem", ts_bounds={"l_shipdate": (None, "1998-09-02")}
    ).count()
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .count()
    )
    assert bounded == plain


def test_star_join_broadcasts_dims(spark, sf_dir):
    """revenue_by_nation: customer/nation ride broadcast exchanges; only
    the fact⋈orders equi join and the final agg may shuffle."""
    plan = _executed_plan(QUERIES["revenue_by_nation"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_snowflake_chain_is_all_broadcast(spark, sf_dir):
    """detail_snowflake: the 4-dim chain (sku→spu/tm/category) must be
    broadcast joins end to end — zero shuffle exchanges for the joins
    themselves (J3's scale contract: the fact never moves)."""
    plan = _executed_plan(QUERIES["detail_snowflake"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_order_wide_single_shuffle(spark, sf_dir):
    """order_wide: pre-clustering both sides on the join key leaves ONE
    shuffle in the whole plan (the co-partitioning exchange); the join
    and downstream dedup reuse that partitioning."""
    plan = _executed_plan(QUERIES["order_wide"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan


def test_pricing_summary_partial_agg(spark, sf_dir):
    """Q1 shape: hash aggregate must run in partial+final mode (map-side
    combine) so the exchange carries group rows, not fact rows."""
    plan = _executed_plan(QUERIES["pricing_summary"].fn(spark, sf_dir))
    assert "HashAggregate" in plan, plan
    assert _exchanges(plan) <= 2, plan


def test_min_cost_supplier_uses_partial_agg_not_window(spark, sf_dir):
    """The argmin is a min(struct) aggregate — no Window node (a ranking
    window would shuffle the FULL fact and keep every row until the
    filter).  Struct min compiles to SortAggregate (no fixed-width hash
    buffer), but crucially in partial+final mode: one row per key per map
    task crosses the exchange."""
    plan = _executed_plan(QUERIES["min_cost_supplier"].fn(spark, sf_dir))
    assert "Window" not in plan, plan
    assert plan.count("Aggregate") >= 2, plan  # partial + final


def test_top_customers_takeordered(spark, sf_dir):
    """Global top-k compiles to TakeOrderedAndProject — no full sort."""
    plan = _executed_plan(QUERIES["top_customers"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_forecast_revenue_all_predicates_push(spark, sf_dir):
    """Q6 shape: the ship-year bound AND the discount/quantity bands must
    all reach the parquet scan as PushedFilters — at scale this query is
    pure row-group-pruned scan + partial agg, no shuffle of fact rows."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = _executed_plan(QUERIES["forecast_revenue"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed


def test_returned_items_pushes_both_scans(spark, sf_dir):
    """Q10 shape: l_returnflag='R' pushes to the lineitem scan and the
    quarter bound pushes to the orders scan — both inputs pre-reduced
    before the join; top-20 is TakeOrdered."""
    plan = _executed_plan(QUERIES["returned_item_customers"].fn(spark, sf_dir))
    assert "EqualTo(l_returnflag,R)" in plan, plan
    assert re.search(r"GreaterThanOrEqual\(o_orderdate", plan), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set must BROADCAST; the training corpus's shingles
    must never cross a shuffle for the join itself (only the final
    per-pair count aggregates)."""
    plan = _executed_plan(QUERIES["decontamination"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_volume_shipping_single_fact_shuffle(spark, sf_dir):
    """Q7 shape: supplier/customer/nation x2 all broadcast; the only
    shuffles are the fact⋈orders join side(s) and the final agg."""
    plan = _executed_plan(QUERIES["volume_shipping"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert _exchanges(plan) <= 3, plan


def test_moments_are_partial_aggregated(spark, sf_dir):
    """Power-sum moments must partial-aggregate map-side: the exchange
    carries one row per event_type per task, not events."""
    plan = _executed_plan(QUERIES["value_moments"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan
    assert _exchanges(plan) <= 1, plan


def test_quantization_has_no_exchange(spark, sf_dir):
    """Per-vector quantization is scan-side only — zero shuffles."""
    plan = _executed_plan(QUERIES["embedding_quantization"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan


def test_near_dup_queries_have_no_pair_product(spark, sf_dir):
    """The registered simhash/embedding near-dup queries are the banded/
    LSH-pruned forms: candidates come from equality joins on small keys,
    so the physical plan must contain NO quadratic pair product (a
    cartesian/nested-loop join over the corpus is the scale-killer the
    quadratic test twins are quarantined for)."""
    from gmallrealtime02_spark.functions.similarity import (
        embedding_near_dup_lsh_plan,
        simhash_banded_pairs_plan,
    )

    banded, b_caches = simhash_banded_pairs_plan(
        load_table(spark, sf_dir, "documents"), 3
    )
    lsh, l_caches = embedding_near_dup_lsh_plan(
        load_table(spark, sf_dir, "embeddings"), 0.4
    )
    try:
        for name, df in (("simhash_pairs", banded), ("dedup_embedding_cosine", lsh)):
            plan = _executed_plan(df)
            assert "CartesianProduct" not in plan, (name, plan)
            assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
    finally:
        for c in (*b_caches, *l_caches):
            c.unpersist()
        spark.catalog.clearCache()


def test_intra_doc_dedup_has_no_exchange(spark, sf_dir):
    """Within-doc repetition removal is scan-side array work — zero
    shuffles (the whole point of array_distinct over explode)."""
    plan = _executed_plan(QUERIES["intra_doc_dedup"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan


def test_paragraph_dedup_two_small_key_shuffles(spark, sf_dir):
    """Corpus-wide paragraph dedup: min-struct winner agg on chunk text +
    per-doc reassembly — exactly two shuffle exchanges, no join, no
    ranking window."""
    plan = _executed_plan(QUERIES["dedup_paragraphs_global"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_scan_side_filters_have_no_exchange(spark, sf_dir):
    """The cleaning/filter family (gopher rules, PII scrub, repetition
    signals) is pure per-row column math — zero shuffles by design."""
    for name in ("gopher_quality_filter", "pii_scrub", "repetition_filter"):
        plan = _executed_plan(QUERIES[name].fn(spark, sf_dir))
        assert _exchanges(plan) == 0, (name, plan)


def test_source_mix_single_grouped_exchange(spark, sf_dir):
    """source_mix: one hash exchange for the (source, lang) agg plus the
    single-partition window over the tiny grouped result — nothing that
    scales with corpus size crosses the wire twice."""
    plan = _executed_plan(QUERIES["source_mix"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan


def test_scd2_single_exchange(spark, sf_dir):
    """SCD2 history: lag change-detect, lead interval close, and version
    row_number all share one (user_id) partitioning + (ts, event_id)
    sort — exactly ONE hash exchange end-to-end."""
    plan = _executed_plan(QUERIES["scd2_history"].fn(spark, sf_dir))
    assert _exchanges(plan) == 1, plan


def test_corpus_top_ngrams_two_stage_topk(spark, sf_dir):
    """Heavy hitters: ONE exchange (the count agg) and the top-k planned
    as TakeOrderedAndProject (per-partition top-k + merge) — no global
    sort shuffle of the distinct-ngram table."""
    plan = _executed_plan(QUERIES["corpus_top_ngrams"].fn(spark, sf_dir))
    assert _exchanges(plan) == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pack_sequences_reuses_window_partitioning(spark, sf_dir):
    """Materialized packing: the per-bin reassembly groups on
    (lang, shard, bin), a superset of the window's (lang, shard)
    partitioning — Catalyst must plan ONE exchange total."""
    plan = _executed_plan(QUERIES["pack_sequences_text"].fn(spark, sf_dir))
    assert _exchanges(plan) == 1, plan


def test_lm_perplexity_trains_and_scores_from_cached_bigrams(spark, sf_dir):
    """The LM scorer reads the corpus ONCE: the exploded bigram table is
    persisted (LM training + scoring = 2 consumers) and every LM table
    derives from the persisted (lang, bigram) counts (context counts,
    vocab sizes, prob join = 3 consumers) — so the plan shows ≥5
    InMemoryTableScans and at most the one original parquet scan."""
    from gmallrealtime02_spark.plans.llm_pipeline import _doc_lm_perplexity_plan

    df, caches = _doc_lm_perplexity_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert plan.count("InMemoryTableScan") >= 5, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_ngram_jaccard_computes_shingles_once(spark, sf_dir):
    """Exact-Jaccard's shingle table feeds three consumers (both self-join
    sides and the per-doc size agg); the shingle expression dominates the
    operator's cost, so all three must read the persisted table — three
    InMemoryTableScans, not three re-runs of scan + shingle transform."""
    from gmallrealtime02_spark.functions.similarity import exact_jaccard_pairs_plan

    df, caches = exact_jaccard_pairs_plan(load_table(spark, sf_dir, "documents"), 0.5)
    try:
        plan = _executed_plan(df)
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_large_order_customers_broadcasts_survivors(spark, sf_dir):
    """Q18 shape: the HAVING-filtered survivor set and the customer dim
    ride broadcast exchanges — the orders fact never shuffles; the only
    hash exchange is the lineitem per-order aggregation, and the global
    top-100 plans as TakeOrderedAndProject, not a full sort."""
    plan = _executed_plan(QUERIES["large_order_customers"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert _exchanges(plan) <= 1, plan


def test_bigram_pmi_single_corpus_pass(spark, sf_dir):
    """PMI: marginals re-aggregate the persisted bigram counts, never the
    corpus — the exploded corpus crosses the wire once into the (bigram)
    agg; no n² product.  The marginal joins carry NO broadcast hint (the
    token vocabulary is unbounded at 100 TB — a forced broadcast OOMs the
    driver; AQE may still choose broadcast from measured size), and the
    top-50 is a distributed TakeOrderedAndProject, not a global-window
    sort of the vocabulary on one reducer."""
    from gmallrealtime02_spark.plans.llm_pipeline import _bigram_pmi_plan

    c12, ranked = _bigram_pmi_plan(spark, sf_dir)
    try:
        assert "ResolvedHint" not in ranked._jdf.queryExecution().analyzed().toString()
        plan = _executed_plan(ranked)
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan
        assert "TakeOrderedAndProject" in plan, plan
        # the only Window left ranks the 50 survivors, downstream of the
        # distributed top-k limit
        assert plan.index("TakeOrderedAndProject") > plan.index("Window"), plan
    finally:
        c12.unpersist()
        spark.catalog.clearCache()


def test_inverted_index_no_global_hotspot(spark, sf_dir):
    """Sharded inverted index: grouping key is (word, shard) so no single
    reducer owns a whole term's postings; bounded exchanges (distinct +
    grouped agg), no sort shuffle of the corpus."""
    plan = _executed_plan(QUERIES["inverted_index"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_keep_best_no_pair_product(spark, sf_dir):
    """Keep-best dedup: candidates come from the banded LSH join and the
    keep rule is a canonical_id-keyed window — no all-pairs product
    anywhere in the physical plan."""
    plan = _executed_plan(QUERIES["dedup_keep_best"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_important_stock_value_single_fact_shuffle(spark, sf_dir):
    """Q11 shape: the nation's supplier set broadcasts into the lineitem
    scan; the per-part DECIMAL aggregation is the only fact shuffle, and
    the scalar threshold arrives as a literal (no join for it)."""
    from gmallrealtime02_spark.plans.tpch_extra import _important_stock_value_plan

    df, caches = _important_stock_value_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "InMemoryTableScan" in plan, plan  # grouped table reused
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_bm25_only_matching_postings_shuffle(spark, sf_dir):
    """BM25: the word-IN-terms filter sits below the tf exchange (only
    matching postings cross the wire), idf broadcasts, and the top-20
    plans as TakeOrderedAndProject, not a global sort."""
    from gmallrealtime02_spark.plans.llm_pipeline import _bm25_search_plan

    df, caches = _bm25_search_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        # corpus scan is cached+projected once; both consumers read the cache
        assert plan.count("InMemoryTableScan") >= 2, plan
        # top-20 is a distributed TakeOrdered, not a global-window sort
        assert "TakeOrderedAndProject" in plan, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_event_funnel_one_fact_exchange(spark, sf_dir):
    """Funnel: the fact repartitions ONCE on user_id; each stage's
    aggregation and join reuses that partitioning (AQE sees
    co-partitioned children), so no further full-fact exchanges appear."""
    from gmallrealtime02_spark.plans.analytics import _event_funnel_plan

    df, caches = _event_funnel_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan  # v/c/p read cache
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_cross_doc_span_overlap_reuses_span_exchange(spark, sf_dir):
    """Repeated-span coverage: the exploded span table is persisted and
    feeds both the span-frequency agg and the doc join-back — the corpus
    explodes once, and no pair product appears (a span shared by k docs
    costs k rows, not k^2)."""
    from gmallrealtime02_spark.plans.llm_pipeline import (
        _cross_doc_span_overlap_plan,
    )

    df, caches = _cross_doc_span_overlap_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_dsir_weights_single_corpus_explode(spark, sf_dir):
    """DSIR: source and target LM counts both derive from the SAME
    persisted exploded-bigram table (lang filter, no second corpus
    read); the smoothing scalars are driver literals, not joins."""
    from gmallrealtime02_spark.plans.llm_pipeline import _dsir_weights_plan

    df, caches = _dsir_weights_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        # bg persisted: scoring + src counts + tgt counts all read cache
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_dedup_incremental_probe_is_asymmetric(spark, sf_dir):
    """Incremental dedup: the signature table is persisted (one scan
    pipeline feeds probe keys, index keys, and both verify sides) and no
    pair product appears — candidates come only from the new-batch probe
    against the corpus band index."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.functions.similarity import (
        minhash_incremental_survivors_plan,
    )

    df, caches = minhash_incremental_survivors_plan(
        load_table(spark, sf_dir, "documents"), (F.col("doc_id") % 5) == 4, 0.5
    )
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_doc_similar_topk_term_selective(spark, sf_dir):
    """Sparse TF-IDF similarity: the query vector broadcasts, scoring
    touches only postings of the query's terms (no doc x doc product),
    and the weight table is persisted for both consumers."""
    from gmallrealtime02_spark.plans.llm_pipeline import _doc_similar_topk_plan

    df, caches = _doc_similar_topk_plan(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 2, plan
        assert "TakeOrderedAndProject" in plan, plan
        for c in caches:
            c.unpersist()
    finally:
        spark.catalog.clearCache()


def test_kmeans_assignment_zero_exchange(spark, sf_dir):
    """Lloyd assignment must be scan-side: centroids ride the Arrow
    kernel's closure (nearest_centroid_table) so the assignment plan has
    NO join and NO corpus shuffle.  (The earlier crossJoin(broadcast) +
    groupBy(vec_id) revision re-shuffled the full corpus — embeddings
    included — once per iteration.)  The only Exchange allowed in the
    returned plan is ensure_parallelism's one-time input spread that
    materializes the persisted corpus."""
    # inspect the fit IMPL: the memoized wrapper (kmeans_fit) returns a
    # checkpointed-RDD scan on a repeat call, which hides the plan this
    # gate exists to pin
    from gmallrealtime02_spark.functions.clustering import _kmeans_fit_impl

    emb = load_table(spark, sf_dir, "embeddings")
    df, _ = _kmeans_fit_impl(emb, 4, 2, "vec_id")
    try:
        plan = _executed_plan(df)
        assert "Join" not in plan, plan
        assert "hashpartitioning(vec_id" not in plan, plan
        assert "MapInPandas" in plan, plan
    finally:
        spark.catalog.clearCache()


def test_doc_top_terms_no_vocab_broadcast_single_word_exchange(spark, sf_dir):
    """tf-idf top terms: no broadcast HINT on the vocabulary-sized df
    table (unbounded cardinality at 100 TB), and the word-keyed exchange
    happens ONCE — tf agg, df agg, and the tf⋈df join all reuse the
    word repartition; only the per-doc top-5 window re-keys on doc_id."""
    df = QUERIES["doc_top_terms"].fn(spark, sf_dir)
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()
    # static plan: one word repartition per branch (tf / df), nothing more
    plan = _executed_plan(df)
    assert len(re.findall(r"Exchange hashpartitioning\(word", plan)) <= 2, plan
    # runtime: AQE dedupes the two canonically-identical word shuffles, so
    # only ONE executes — the second branch reads a ReusedExchange
    df.collect()  # count() would build a separate QueryExecution
    final = _executed_plan(df)
    assert "isFinalPlan=true" in final, final
    assert "ReusedExchange" in final, final


def test_paged_detail_is_takeordered_not_global_window(spark, sf_dir):
    """Serving pagination must fetch the page as a distributed
    TakeOrderedAndProject (per-task local top-k, driver merge) — never a
    no-partition window, which sorts every matching row on ONE task."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.serving import paged_detail_plan

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("order_date"),
    )
    plan = _executed_plan(paged_detail_plan(d, 40))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_order_page_is_takeordered_not_global_window(spark, sf_dir):
    """order_page fetches the page via a distributed TakeOrderedAndProject
    over the orders fact; the only Window ranks the page*size survivors
    downstream of the limit."""
    plan = _executed_plan(QUERIES["order_page"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("TakeOrderedAndProject") > plan.index("Window"), plan


def test_hll_sketch_is_two_exchange_partial_agg(spark, sf_dir):
    """hll_distinct_daily: the register fold is a (dt, reg)->max partial
    aggregate then a per-dt re-agg — two keyed exchanges total, never a
    distinct-keys shuffle or a single-partition collapse."""
    plan = _executed_plan(QUERIES["hll_distinct_daily"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "SinglePartition" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_cms_topk_is_distributed_take_ordered(spark, sf_dir):
    """cms_heavy_hitters: exact top-20 must plan as TakeOrderedAndProject
    (distributed partial top-k), and the probe join must broadcast the
    fixed-size cell table, not shuffle it."""
    from gmallrealtime02_spark.plans.sketches import _cms_heavy_hitters_plan

    result, caches = _cms_heavy_hitters_plan(spark, sf_dir)
    try:
        plan = _executed_plan(result)
        assert "TakeOrderedAndProject" in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
    finally:
        for c in caches:
            c.unpersist()


def test_bloom_probe_is_scan_side(spark, sf_dir):
    """bloom_decontamination: the training-side membership test is a
    literal-bitmap expression (zero joins for the bloom flag); the only
    joins are the broadcast exact-audit join, and the only exchanges are
    the eval-bits distinct and the final per-doc aggregate."""
    plan = _executed_plan(QUERIES["bloom_decontamination"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert _exchanges(plan) <= 2, plan


def test_pagerank_iterations_broadcast_rank_tables(spark, sf_dir):
    """coview_pagerank: every iteration joins the O(catalog) rank/degree
    tables INTO the persisted edges table via broadcast — no sort-merge
    join anywhere, so the corpus-scale side never re-shuffles per pass."""
    from gmallrealtime02_spark.plans.sketches import _coview_pagerank_plan

    result, caches = _coview_pagerank_plan(spark, sf_dir)
    try:
        plan = _executed_plan(result)
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
    finally:
        for c in caches:
            c.unpersist()


def test_token_budget_mix_single_exchange(spark, sf_dir):
    """token_budget_mix: the per-lang running sum and the per-lang result
    aggregate share one lang-keyed exchange."""
    plan = _executed_plan(QUERIES["token_budget_mix"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan
    assert "Window" in plan, plan


def test_pq_scoring_never_touches_vectors(spark, sf_dir):
    """ann_pq_topk: ADC candidate scoring reads 4 small int codes + the
    per-query literal lookup tables — the embedding column must not
    appear in the scoring subplan (no vector crossJoin), and the top-5
    window is qid-partitioned, never a single global sort."""
    plan = _executed_plan(QUERIES["ann_pq_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_jl_projection_zero_exchange(spark, sf_dir):
    """jl_projection: the sign matrix is a scan-side arithmetic formula,
    so the whole 64-d -> 16-d projection must shuffle NOTHING (the only
    allowed Exchange is ensure_parallelism's input respray)."""
    plan = _executed_plan(QUERIES["jl_projection"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_bpe_pair_counts_vocab_scale(spark, sf_dir):
    """bpe_pair_counts: one corpus-scale exchange (word counts, map-side
    partials), one vocab-scale exchange (pair aggregate), and the top-50
    plans as distributed TakeOrderedAndProject — never a single-reducer
    global sort."""
    plan = _executed_plan(QUERIES["bpe_pair_counts"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 3, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_record_linkage_blocked_no_pair_product(spark, sf_dir):
    """record_linkage: candidate pairs come from an equi-join on the
    blocking key — never an all-pairs product (the thing blocking
    exists to avoid); the custkey ordering rides along as a residual
    join condition."""
    plan = _executed_plan(QUERIES["record_linkage"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_curation_pipeline_one_corpus_exchange(spark, sf_dir):
    """curation_pipeline: all four stage flags are scan-side column math
    over ONE corpus read; the only corpus-scale exchange is the
    canonical-member window on the synthetic digest key (plus
    ensure_parallelism's input respray).  Never a pair product, never a
    global sort."""
    plan = _executed_plan(QUERIES["curation_pipeline"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_bpe_encode_stage_zero_exchange(spark, sf_dir):
    """bpe_encode: once the merges are driver-side literals, encoding is
    a pure corpus scan — char-split + greedy fold inside codegen.  The
    only allowed Exchange in the encode stage is ensure_parallelism's
    input respray; no join, no aggregation, no sort."""
    from gmallrealtime02_spark.plans.corpus_tools import bpe_encode_plan
    from gmallrealtime02_spark.sources import load_table
    from gmallrealtime02_spark.sources.tables import ensure_parallelism

    merges = [(1, "e", "n", 0), (2, "t", "h", 0), (3, "en", "t", 0)]
    plan = _executed_plan(
        bpe_encode_plan(
            ensure_parallelism(load_table(spark, sf_dir, "documents")), merges
        )
    )
    assert _exchanges(plan) <= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_boilerplate_lines_no_body_shuffle(spark, sf_dir):
    """boilerplate_lines: chunking is scan-side (posexplode below the
    first exchange); shuffles stay on (source, chunk)-shaped keys and the
    per-source totals join is broadcast, not sort-merge."""
    plan = _executed_plan(QUERIES["boilerplate_lines"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 4, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_knn_label_propagation_single_corpus_exchange(spark, sf_dir):
    """knn_label_propagation: the query batch broadcasts; the labeled
    corpus is scored scan-side and shuffles ONCE on qid — the vote
    aggregate reuses the window's qid partitioning (groupBy(qid, label)
    is a sub-key), so no second corpus-scale exchange exists."""
    plan = _executed_plan(QUERIES["knn_label_propagation"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnowing_fingerprint_zero_exchange(spark, sf_dir):
    """winnowing_fingerprint: rolling hashes, window minima, and the
    checksum are all per-row array ops — nothing may shuffle."""
    plan = _executed_plan(QUERIES["winnowing_fingerprint"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan  # ensure_parallelism respray only


def test_minhash_containment_no_pair_product(spark, sf_dir):
    """minhash_containment: every join is an equi-join on a small key
    (shingle hash / doc id) — never a cartesian pair product — and the
    df-cap bounds the postings self-join fan-out.  The exchange budget
    covers the df count, the cap join, the sizes aggregate, the pair
    join + aggregate, and the two (small) sizes joins; all keys are
    8-byte ids, no document bodies shuffle."""
    plan = _executed_plan(QUERIES["minhash_containment"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert _exchanges(plan) <= 8, plan


def test_curriculum_stages_no_global_sort(spark, sf_dir):
    """curriculum_stages: the only SinglePartition exchange feeds the
    2-value corpus-stats aggregate (bytes, not rows); ranking is
    partitioned per stage — no corpus-scale global sort exists."""
    plan = _executed_plan(QUERIES["curriculum_stages"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 3, plan
    assert re.search(r"Exchange SinglePartition[\s\S]{0,400}?partial_sum", plan) or \
        "partial_sum" in plan, plan
    # the window exchange is stage-keyed, not a global ordering
    assert "Exchange rangepartitioning" not in plan, plan


def test_zorder_layout_zero_exchange(spark, sf_dir):
    """zorder_layout: the Morton key is pure scan-side bit arithmetic —
    nothing may shuffle (the layout job's repartitionByRange write is
    the only shuffle the pattern adds, and it is not part of the op)."""
    plan = _executed_plan(QUERIES["zorder_layout"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan  # ensure_parallelism respray only


def test_diversity_sample_one_exchange_after_fit(spark, sf_dir):
    """diversity_sample: both ranking windows share the single
    cid-keyed exchange; assignment stays the zero-exchange scan-side
    argmin (no crossJoin re-shuffle regression)."""
    plan = _executed_plan(QUERIES["diversity_sample"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning\(cid", plan)) <= 2, plan


def test_rolling_active_users_bounded_fanout(spark, sf_dir):
    """rolling_active_users: the distinct-over-trailing-window runs as a
    bounded x7 contribution explode over DISTINCT (user, day) pairs —
    never a days-by-events join blow-up, never a global sort.  All
    exchange keys are user/day-sized."""
    plan = _executed_plan(QUERIES["rolling_active_users"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert _exchanges(plan) <= 4, plan


def test_gap_fill_two_exchanges(spark, sf_dir):
    """gap_fill: the (user, day) day-sum aggregate plus ONE user_id
    exchange shared by the span agg, the densify join, and the
    carry-forward window — the calendar explode and the window itself
    add no shuffle."""
    plan = _executed_plan(QUERIES["gap_fill"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_triangle_count_no_pair_product(spark, sf_dir):
    """triangle_count: wedges come from equi-joins on oriented edges —
    no cartesian/nested-loop pair product anywhere; the final top-k is
    a distributed TakeOrdered, not a single-reducer sort."""
    from gmallrealtime02_spark.plans.behavior import _triangle_count_plan

    result, caches = _triangle_count_plan(spark, sf_dir)
    plan = _executed_plan(result)
    for c in caches:
        c.unpersist()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_doc_chunks_zero_exchange(spark, sf_dir):
    """doc_chunks: the overlapping-window explode is scan-side — no
    shuffle of any kind (the bounded ~2x blow-up happens inside the
    scan stage, embarrassingly parallel at 100 TB)."""
    plan = _executed_plan(QUERIES["doc_chunks"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan


def test_table_stats_single_scan_expand(spark, sf_dir):
    """table_stats: k exact NDVs compile to ONE scan + Catalyst Expand +
    partial aggregation — never k separate scans of the table, never a
    global sort."""
    plan = _executed_plan(QUERIES["table_stats"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_ewma_bounded_fanout_two_exchanges(spark, sf_dir):
    """ewma_daily_value: bounded x8 contribution explode over the
    (user, day) day-sums — exactly the day-sum aggregate exchange plus
    the (user, day2) decay aggregate; no event-sized shuffle, no join,
    no global sort."""
    plan = _executed_plan(QUERIES["ewma_daily_value"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_hashed_ngram_score_zero_exchange(spark, sf_dir):
    """hashed_ngram_score: classifier inference is a pure scan-side
    array fold — zero exchange, no Python runner in the plan (all
    arithmetic stays JVM-side)."""
    plan = _executed_plan(QUERIES["hashed_ngram_score"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan
    assert "Python" not in plan, plan


def test_event_trigrams_takeordered(spark, sf_dir):
    """event_trigrams: one user_id exchange for the lead() window, a
    small path-keyed partial aggregate, and a distributed TakeOrdered —
    never a single-reducer global sort."""
    plan = _executed_plan(QUERIES["event_trigrams"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert _exchanges(plan) <= 3, plan


def test_exact_substring_scrub_no_body_in_span_exchange(spark, sf_dir):
    """exact_substring_scrub: spans explode scan-side and shuffle on the
    span key (one exchange reused by the stats aggregate and the flagged
    join-back); covered positions collapse to ints keyed by doc_id; the
    rebuild filters the words array in place — document bodies are never
    the payload of a pair product (no cross/nested-loop join anywhere)."""
    plan = _executed_plan(QUERIES["exact_substring_scrub"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert _exchanges(plan) <= 5, plan


def test_corpus_diff_hashes_below_join(spark, sf_dir):
    """corpus_diff: both snapshot sides reduce to (doc_id, md5) AT THE
    SCAN — the md5 projections sit below the full-outer join, so text
    never enters the exchange. The join itself is the only shuffle pair."""
    plan = _executed_plan(QUERIES["corpus_diff"].fn(spark, sf_dir))
    assert "FullOuter" in plan or "full_outer" in plan, plan
    # text column must not appear in any Exchange's output schema
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)
    assert _exchanges(plan) <= 2, plan


def test_shard_assignment_single_shard_exchange(spark, sf_dir):
    """shard_assignment: shard + sort key derive scan-side; exactly one
    exchange (on shard — the writer's fan-out), and the within-shard
    rank never plans as a single-partition global sort."""
    plan = _executed_plan(QUERIES["shard_assignment"].fn(spark, sf_dir))
    assert _exchanges(plan) == 1, plan
    assert "SinglePartition" not in plan, plan


def test_anomaly_zscore_two_exchanges(spark, sf_dir):
    """anomaly_zscore: the daily rollup (map-side decimal partials) plus
    the event_type window re-key — two exchanges, no join, no global
    sort; the window runs over the tiny (type, day) table."""
    plan = _executed_plan(QUERIES["anomaly_zscore"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_dedup_eval_reuses_production_pair_plans(spark, sf_dir):
    """dedup_eval: the scoring side joins pair KEYS only (two ints) and
    reduces to one row — no pair product beyond the production LSH/
    postings shapes (cross joins of the three 1-row aggregates are the
    intended scalar combine)."""
    plan = _executed_plan(QUERIES["dedup_eval"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_quality_classifier_final_pass_is_scalar_reduce(spark, sf_dir):
    """quality_classifier_train: the returned pass aggregates the
    persisted 4-double feature table to one row — a partial-combine
    tree whose only exchange moves per-partition partials (no join, no
    sort, no Python runner; the sigmoid/GD math is all JVM-side)."""
    plan = _executed_plan(QUERIES["quality_classifier_train"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_hll_rollup_sketch_sized_exchanges(spark, sf_dir):
    """hll_rollup: after the first (dt, reg) partial aggregate every
    exchange moves sketch-sized rows (<= days x 64), never raw events —
    three keyed aggregates, no join, no sort."""
    plan = _executed_plan(QUERIES["hll_rollup"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 3, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_hll_overlap_sketch_sized_after_first_agg(spark, sf_dir):
    """hll_overlap: one raw-event exchange (the (segment, reg) partial
    max); everything downstream — union re-merge, three scalar reduces,
    the final algebra row — moves sketch-sized or scalar data. No
    sort-merge join anywhere (the combines are broadcast-scalar)."""
    plan = _executed_plan(QUERIES["hll_overlap"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 6, plan
    assert "SortMergeJoin" not in plan, plan


def test_grouping_sets_single_expand_exchange(spark, sf_dir):
    """grouping_sets_revenue: one Expand (3 grouping sets) + ONE shuffle;
    partial aggregation collapses the expanded rows map-side, so the
    exchange carries distinct-keys x 3 rows at any scale."""
    plan = _executed_plan(QUERIES["grouping_sets_revenue"].fn(spark, sf_dir))
    assert "Expand" in plan, plan
    assert _exchanges(plan) == 1, plan
    assert "partial" in plan.lower(), plan


def test_weighted_sample_scan_side_takeordered(spark, sf_dir):
    """weighted_sample: the A-ES keys are computed inside the scan stage
    (zero shuffle) and selection is a distributed TakeOrdered — never a
    global sort, never a Python runner."""
    plan = _executed_plan(QUERIES["weighted_sample"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert _exchanges(plan) == 0, plan
    assert "Python" not in plan, plan


def test_domain_quality_no_text_in_exchange(spark, sf_dir):
    """domain_quality: per-doc features reduce to numbers + a 16-byte
    digest BEFORE the source-key exchange — the text column must never
    cross a shuffle (at 100 TB that is the difference between shuffling
    kilobyte documents and shuffling ~40-byte feature rows)."""
    plan = _executed_plan(QUERIES["domain_quality"].fn(spark, sf_dir))
    for line in plan.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text#" not in line, line
    # source agg + countDistinct two-phase: bounded exchange count
    assert _exchanges(plan) <= 2, plan


def test_rfm_windows_share_one_segment_exchange(spark, sf_dir):
    """rfm_segmentation: the three ntile windows are all partitioned by
    segment — one segment exchange (plus the custkey aggregate/join),
    three in-partition sorts, and NO global (range) sort anywhere."""
    plan = _executed_plan(QUERIES["rfm_segmentation"].fn(spark, sf_dir))
    assert "Exchange rangepartitioning" not in plan, plan
    assert _exchanges(plan) <= 3, plan


def test_scd2_pit_join_stays_on_user_key(spark, sf_dir):
    """Point-in-time SCD2 join must be the union + carry-forward rewrite:
    every shuffle keyed on user_id (the SCD2 build + one interleave
    exchange), never a range/theta join (no nested-loop product) and
    never a global sort."""
    plan = _executed_plan(QUERIES["scd2_pit_join"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert _exchanges(plan) <= 3, plan
    keys = set(re.findall(r"Exchange hashpartitioning\(([a-z_]+)#", plan))
    assert keys == {"user_id"}, (keys, plan)


def test_dq_checks_single_scan_key_only_broadcast(spark, sf_dir):
    """All six constraints must ride ONE orders scan: the referential
    check is a broadcast LEFT join on the customer KEY column (read
    schema = c_custkey alone) with a null-mark sum — no separate
    anti-join branch re-reading the fact, no extra exchanges beyond
    the COUNT DISTINCT's."""
    plan = _executed_plan(QUERIES["dq_checks"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan
    assert plan.count("orders.parquet") == 1, plan
    assert _exchanges(plan) <= 3, plan
    m = re.search(r"ReadSchema: struct<c_custkey", plan)
    assert m, plan


def test_bitext_mine_has_no_pair_product(spark, sf_dir):
    """Bitext candidates must come from (table, bucket) equality joins of
    id-only key rows — no |src|×|tgt| product anywhere in the plan."""
    plan = _executed_plan(QUERIES["bitext_mine"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_retention_cohorts_two_small_key_exchanges(spark, sf_dir):
    """Cohort matrix: distinct (day,user) + cohort-min window share the
    user_id exchange; the matrix agg shuffles (cohort, age) keys — two
    exchanges, no self-join of the log, no global sort."""
    plan = _executed_plan(QUERIES["retention_cohorts"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "Join" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\(([a-z_]+)#", plan))
    assert "user_id" in keys, (keys, plan)


def test_attribution_last_touch_one_user_exchange(spark, sf_dir):
    """Last-touch attribution: carry-forward window + channel rollup —
    one user_id exchange plus the |event_type|-key aggregate, nothing
    else; no join, no global window."""
    plan = _executed_plan(QUERIES["attribution_last_touch"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    assert "Join" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\(([a-z_]+)", plan))
    assert any(k == "user_id" for k in keys), (keys, plan)


def test_bpe_lang_rollup_adds_one_exchange(spark, sf_dir):
    """Per-language compression must NOT re-join documents — lang rides
    the encode scan (extra_cols passthrough), so the post-training plan
    is the zero-exchange encode + exactly one |languages|-key rollup."""
    plan = _executed_plan(QUERIES["bpe_compression_by_lang"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan
    assert "Join" not in plan, plan


def test_basket_affinity_pairs_only_within_baskets(spark, sf_dir):
    """Pair generation must be an equi-join ON the order key (pairs only
    materialize within a basket) and the support/lift denominators must
    join AFTER the top-k cut — no corpus-wide pair product, no
    |parts|-sized broadcast, top-k as distributed TakeOrdered."""
    from gmallrealtime02_spark.plans.behavior import _basket_affinity_plan

    result, caches = _basket_affinity_plan(spark, sf_dir)
    try:
        plan = _executed_plan(result)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan.replace(
            "BroadcastNestedLoopJoin BuildRight, Cross", "", 1
        ), plan  # the single allowed nested-loop is the 1-row n_orders cross
        assert "TakeOrdered" in plan, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_seasonality_profile_two_tiny_exchanges(spark, sf_dir):
    """One corpus aggregate to |event_type|x7 cells, then the share
    window over the tiny cell table — both exchanges keyed on
    event_type, nothing corpus-scale past the first."""
    plan = _executed_plan(QUERIES["seasonality_profile"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(k == "event_type" for k in keys), (keys, plan)


def test_daily_trend_two_exchanges_all_typed(spark, sf_dir):
    """OLS trend: the corpus collapses at the (event_type, day) aggregate;
    the day-index window and the power-sum reduce run over the tiny cell
    table — ≤2 exchanges, every key rooted at event_type."""
    plan = _executed_plan(QUERIES["daily_trend"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 2, plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and all(k == "event_type" for k in keys), (keys, plan)


def test_doc_novelty_single_span_exchange(spark, sf_dir):
    """Novelty scoring must reuse the one span-key exchange for both the
    first-owner aggregate and the join-back (cross_doc_span_overlap's
    shape) — no pair product, no second corpus shuffle."""
    plan = _executed_plan(QUERIES["doc_novelty"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_key_skew_profile_takeordered_no_global_sort(spark, sf_dir):
    """The skew profiler's top-k must plan as distributed TakeOrdered
    over the per-key counts; the scalar totals broadcast back."""
    from gmallrealtime02_spark.plans.behavior import _key_skew_profile_plan

    result, caches = _key_skew_profile_plan(spark, sf_dir)
    try:
        plan = _executed_plan(result)
        assert "TakeOrdered" in plan, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        for c in caches:
            c.unpersist()
        spark.catalog.clearCache()


def test_ab_test_zscore_collapses_at_user_aggregate(spark, sf_dir):
    """The experiment readout's only corpus-scale exchange is the
    per-user conversion aggregate; everything after is ≤|variants|
    rows."""
    plan = _executed_plan(QUERIES["ab_test_zscore"].fn(spark, sf_dir))
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(k in ("user_id", "variant") for k in keys), (keys, plan)


def test_time_to_convert_no_range_join(spark, sf_dir):
    """The as-of match must be the carry-forward rewrite — user_id-keyed
    window, no nested-loop range join."""
    plan = _executed_plan(QUERIES["time_to_convert"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert "user_id" in keys, (keys, plan)


def test_unpivot_plans_as_expand(spark, sf_dir):
    """The melt must be the native Expand operator over the tiny wide
    table — only the pivot's own (dt, type) + dt aggregates exchange,
    nothing corpus-scale after."""
    plan = _executed_plan(QUERIES["unpivot_event_counts"].fn(spark, sf_dir))
    assert "Expand" in plan, plan
    assert _exchanges(plan) <= 2, plan


def test_contamination_report_corpus_never_shuffles(spark, sf_dir):
    """contamination_report: the corpus-sized sides (per-doc totals,
    train shingles) move through broadcast joins only — the sole shuffle
    exchanges carry hit rows / small aggregates, and there is no
    sort-merge join anywhere."""
    plan = _executed_plan(QUERIES["contamination_report"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert _exchanges(plan) <= 2, plan


def test_mmr_rerank_no_corpus_pair_product(spark, sf_dir):
    """mmr_rerank: candidate scoring is the broadcast-query scan (one
    intended 10-row broadcast nested loop); everything after operates on
    queries x 20 candidate rows.  The corpus itself must never enter a
    cartesian product."""
    plan = _executed_plan(QUERIES["mmr_rerank"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_char_ngram_entropy_zero_exchange(spark, sf_dir):
    """char_ngram_entropy: per-doc entropy is a single Arrow mapInPandas
    over the corpus scan — no (doc, trigram) shuffle (the oracle's
    relational phrasing), no exchange at all."""
    plan = _executed_plan(QUERIES["char_ngram_entropy"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan


def test_span_corruption_masks_zero_exchange(spark, sf_dir):
    """span_corruption_masks: block explode + hash-derived span position
    are scan-side codegen expressions — zero exchange, no Python."""
    plan = _executed_plan(QUERIES["span_corruption_masks"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan
    assert "MapInPandas" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_pack_boundary_masks_single_stream_exchange(spark, sf_dir):
    """pack_boundary_masks: same shape as pack_bins — ONE exchange on the
    (lang, shard) stream key for the running-offset window; the bin
    explode and interval arithmetic stay scan-side."""
    plan = _executed_plan(QUERIES["pack_boundary_masks"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_quality_classifier_score_is_zero_exchange_scan(spark, sf_dir):
    """quality_classifier_score: the scoring pass is a pure map over the
    cached feature table with the learned weights folded in as literals
    — ZERO exchanges, no join, no Python runner.  This is the plan that
    must hold at 100 TB: inference cost == one scan."""
    plan = _executed_plan(QUERIES["quality_classifier_score"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan
    assert "Join" not in _strip_cached_subplans(plan), plan
    assert "Python" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_kn_bigram_lm_single_corpus_pass(spark, sf_dir):
    """kn_bigram_lm: like bigram_pmi, the corpus crosses the wire once
    into the bigram-type count; the left marginal, continuation counts,
    and scalar type total all re-aggregate the PERSISTED c12 (>= 3
    InMemoryTableScan consumers), no pair product, and the top-50 is a
    distributed TakeOrderedAndProject feeding a 50-row window."""
    plan = _executed_plan(QUERIES["kn_bigram_lm"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("TakeOrderedAndProject") > plan.index("Window"), plan


def test_ann_recall_eval_no_cartesian_blowup(spark, sf_dir):
    """ann_recall_eval: the two exact baselines broadcast the bounded
    query block (BroadcastNestedLoopJoin, never CartesianProduct), every
    approximate tier keeps its production pruned plan, and hit counting
    joins k-by-n_queries-row frames."""
    plan = _executed_plan(QUERIES["ann_recall_eval"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_doc_kn_perplexity_single_corpus_pass(spark, sf_dir):
    """doc_kn_perplexity: the exploded (doc, bigram) table and the
    bigram-type counts both persist; LM tables re-aggregate c12, the
    scoring join re-reads the cached explode — the corpus text is
    scanned exactly once (>= 3 cache consumers), no pair product."""
    plan = _executed_plan(QUERIES["doc_kn_perplexity"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_hard_negative_mining_broadcasts_query_block(spark, sf_dir):
    """hard_negative_mining: the bounded query block broadcasts
    (BroadcastNestedLoopJoin over the candidate stream, never a
    CartesianProduct shuffle); the per-(query, kind) top-3 window keys
    on qid so no global single-partition sort."""
    plan = _executed_plan(QUERIES["hard_negative_mining"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_lsh_tuning_curve_banded_joins_only(spark, sf_dir):
    """lsh_tuning_curve: every configuration's candidate join is an
    equality join on (band, key) — no CartesianProduct anywhere — and
    all five configs read the one persisted Arrow-kernel signature
    scan."""
    plan = _executed_plan(QUERIES["lsh_tuning_curve"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 5, plan


def test_corpus_datasheet_single_scan(spark, sf_dir):
    """corpus_datasheet: one corpus scan through an Expand feeding
    partial aggregates — no join, no window, no Python; exchanges carry
    digest-sized partials only."""
    plan = _executed_plan(QUERIES["corpus_datasheet"].fn(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_epoch_shuffle_single_exchange(spark, sf_dir):
    """epoch_shuffle: the epoch fan-out explodes scan-side; exactly one
    exchange on (epoch, shard) — the writer's own fan-out — feeds the
    within-shard rank."""
    plan = _executed_plan(QUERIES["epoch_shuffle"].fn(spark, sf_dir))
    assert _exchanges(plan) <= 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Join" not in plan, plan


def test_cross_source_overlap_no_pair_product(spark, sf_dir):
    """cross_source_overlap: near-dup pairs come from the banded LSH
    plan (never a CartesianProduct); the source attach joins the tiny
    id-pair table against the id->source projection."""
    plan = _executed_plan(QUERIES["cross_source_overlap"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_curation_funnel_single_pass(spark, sf_dir):
    """curation_funnel: all ten stage sums ride ONE partial-aggregate
    tree over the provenance frame to a single row; the 5-row funnel is
    a constant-width Expand (stack) — no second corpus scan, no join
    above the provenance plan."""
    plan = _executed_plan(QUERIES["curation_funnel"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_cluster_top_terms_no_pair_product(spark, sf_dir):
    """cluster_top_terms: assignment reuses the zero-exchange kmeans
    argmin scan; the word count exchange is vocabulary-sized and the
    top-3 window partitions by cid (never a single global partition)."""
    plan = _executed_plan(QUERIES["cluster_top_terms"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_media_dedup_phash_banded_no_pair_product(spark, sf_dir):
    """media_dedup_phash: pairing is the pigeonhole banded hamming join
    (equality keys on (segment, value)) — never the signature-table
    product — and the binary payload stays scan-side: no exchange
    carries the content/payload column."""
    plan = _executed_plan(QUERIES["media_dedup_phash"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "content" not in line and "payload" not in line, line


def test_source_jsd_matrix_single_scan_no_product(spark, sf_dir):
    """source_jsd_matrix: the corpus is scanned ONCE (the persisted
    (source, word, p) table feeds both sides of the pair join); the pair
    expansion is a word-keyed equi-join, never a source-pair product, and
    no single-partition exchange appears."""
    plan = _executed_plan(QUERIES["source_jsd_matrix"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    stripped = _strip_cached_subplans(plan)
    # above the persisted (source, word, p) cache: only InMemoryTableScan
    # consumers, no direct parquet re-read
    assert stripped.count("Scan parquet") == 0, stripped
    assert stripped.count("InMemoryTableScan") >= 2, stripped
    assert "Exchange SinglePartition" not in stripped, stripped


def test_embedding_norm_stats_scan_side_profile(spark, sf_dir):
    """embedding_norm_stats: profiles compute scan-side and the
    embedding column prunes immediately (no exchange carries it); the
    percentile thresholds attach as a broadcast 1-row join, never a
    single-partition window."""
    plan = _executed_plan(QUERIES["embedding_norm_stats"].fn(spark, sf_dir))
    assert "Window" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "embedding#" not in line, line


def test_cluster_balance_sample_scan_side_filter(spark, sf_dir):
    """cluster_balance_sample: the keep verdict is a scan-side predicate
    over the zero-exchange kmeans assignment — no window (a per-cid rank
    would single-reduce 1/k of the corpus), no pair product; the only
    aggregation is the k-row cluster-size table broadcast back."""
    plan = _executed_plan(QUERIES["cluster_balance_sample"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_ann_cosine_filtered_broadcast_prefilter(spark, sf_dir):
    """ann_cosine_filtered: the query block broadcasts and the label
    predicate rides the join (pre-filtering) — no cartesian product, no
    single-partition exchange of the candidate side."""
    plan = _executed_plan(QUERIES["ann_cosine_filtered"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_hybrid_search_rrf_no_product_fusion(spark, sf_dir):
    """hybrid_search_rrf: both legs keep their audited shapes (no pair
    product anywhere) and the fusion joins two top-10 lists — constant
    work; nothing exchanges the corpus for the fusion itself."""
    plan = _executed_plan(QUERIES["hybrid_search_rrf"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_ann_multiprobe_probe_fanout_stays_on_query_side(spark, sf_dir):
    """ann_multiprobe_lsh: the 5-bucket probe explode rides the BOUNDED
    query side and broadcasts into the corpus key table (BroadcastHashJoin
    on (tbl, bkt)); no pair product, and the corpus fan-out is 4 tables
    (half of ann_lsh_topk's), which is the op's entire point."""
    from gmallrealtime02_spark.functions import similarity as S
    from gmallrealtime02_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    result, caches = S.ann_multiprobe_lsh_topk_plan(emb, 10, 5)
    plan = _strip_cached_subplans(_executed_plan(result))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for c in caches:
        c.unpersist()


def test_semantic_decontamination_argmax_is_partial_agg(spark, sf_dir):
    """semantic_decontamination: the eval block broadcasts (corpus
    vectors never shuffle), and the per-corpus-row argmax folds through
    the single integer encoding as a map-side partial max — the exchange
    carries one row per corpus vector, no window over the pair stream."""
    from gmallrealtime02_spark.plans.registry import QUERIES

    plan = _executed_plan(
        QUERIES["semantic_decontamination"].fn(spark, sf_dir)
    )
    assert "CartesianProduct" not in plan, plan
    assert "partial_max" in plan, plan
    assert "Window" not in plan, plan


def test_coview_item_similarity_no_pair_product(spark, sf_dir):
    """coview_item_similarity: the pair fan-out comes from the per-user
    equi-join (bounded by the heavy-user gate), never a cartesian; the
    degree joins are plain equi-joins on item keys."""
    from gmallrealtime02_spark.plans.registry import QUERIES

    plan = _executed_plan(QUERIES["coview_item_similarity"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_perplexity_mix_single_corpus_pass(spark, sf_dir):
    """perplexity_mix: the per-source NLL table persists and feeds both
    the output select and the min/denominator scalar (each an
    InMemoryTableScan of src; the bigram/count caches live inside src's
    stored build plan), the scalar attaches as a broadcast one-row
    frame, and no global window single-partitions anything — the corpus
    text is scanned exactly once."""
    from gmallrealtime02_spark.plans.registry import QUERIES

    plan = _strip_cached_subplans(
        _executed_plan(QUERIES["perplexity_mix"].fn(spark, sf_dir))
    )
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "Window" not in plan, plan


def test_coview_clustering_coefficient_reuses_edge_cache(spark, sf_dir):
    """coview_clustering_coefficient: one persisted edge cache feeds the
    wedge join (twice), the closing probe, and the degree union — the
    co-view edge build runs once, and no neighborhood cross product
    forms."""
    from gmallrealtime02_spark.plans.registry import QUERIES

    plan = _strip_cached_subplans(
        _executed_plan(
            QUERIES["coview_clustering_coefficient"].fn(spark, sf_dir)
        )
    )
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 4, plan


def test_bucketed_order_wide_zero_exchange(spark, sf_dir, tmp_path):
    """The order_wide docstring's 100 TB claim, proven: with both facts
    written bucketed by the order key, the SAME join+dedup plan contains
    ZERO exchanges — the join reads co-located buckets and the bucket
    hash partitioning satisfies the dedup's clustering too.  Broadcast
    is disabled so the zero is the bucketing's doing, and the result is
    row-identical to the shuffling order_wide."""
    from gmallrealtime02_spark.operators.order_wide import (
        bucketed_order_wide,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df, cleanup = bucketed_order_wide(
            spark, sf_dir, str(tmp_path), n_buckets=8, tag="gate"
        )
        try:
            plan = _executed_plan(df)
            assert _exchanges(plan) == 0, plan
            assert "SortMergeJoin" in plan, plan  # a real fact-fact join
            got = sorted(
                (r.order_id, r.detail_seq, r.sku_id, r.final_detail_amount)
                for r in df.collect()
            )
        finally:
            cleanup()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    want = sorted(
        (r.order_id, r.detail_seq, r.sku_id, r.final_detail_amount)
        for r in QUERIES["order_wide"].fn(spark, sf_dir).collect()
    )
    assert got == want


def test_edit_verify_is_candidate_bounded(spark, sf_dir):
    """dedup_lsh_edit_verify computes levenshtein ONLY on LSH candidate
    pairs: the plan must contain the banded equality self-join and NO
    quadratic pair product — the all-pairs edit-distance formulation is
    the scale-killer this query exists to avoid."""
    from gmallrealtime02_spark.plans.registry import load_all

    df = load_all()["dedup_lsh_edit_verify"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "levenshtein" in plan.lower(), plan  # JVM builtin, not a UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ann_cell_assignment_is_shuffle_free(spark, sf_dir):
    """The manifest ANN index's write-path cell assignment must stay a
    per-row whole-stage-codegen expression (struct array_max over
    unrolled centroid folds) — ZERO Exchange, ZERO Window, ZERO join.
    A rank-per-row window here would shuffle the entire corpus on
    every commit at 100 TB."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.streaming.annindex import assign_cells

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    plan = _executed_plan(assign_cells(emb, "embedding", cents))
    body = _strip_cached_subplans(plan)
    assert "Exchange" not in body, body
    assert "Window" not in body, body
    assert "Join" not in body, body


def test_read_changes_scans_only_touched_files(spark, sf_dir, tmp_path):
    """Row-level CDC cost gate: the net-diff read references ONLY the
    files the range touched, never the untouched bulk of the table —
    the property that makes a retention delete O(files it rewrote)
    downstream instead of O(table)."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.streaming.manifest import ManifestTable

    t = ManifestTable(str(tmp_path / "t"), stats_cols=["event_id"])
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for lo in range(0, 400, 100):  # four stat-tight files
        t.append(
            ev.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < lo + 100)
            ).coalesce(1)
        )
    v = t.current_version()
    untouched_before = set(t.manifest()["files"])
    t.delete_where(spark, "event_id < 50")  # touches ONE file
    add, dele = t.read_changes(spark, v)
    for df in (add, dele):
        plan = _executed_plan(df)
        for f in untouched_before & set(t.manifest()["files"]):
            assert f not in plan, f"untouched file {f} in CDC scan"
    assert dele.count() > 0  # the range genuinely deleted rows
