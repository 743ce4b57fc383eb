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


def _exchanges(plan: str) -> int:
    """Count shuffle exchanges (broadcast exchanges excluded — those are
    the cheap, intended data movement for dim sides)."""
    return len(re.findall(r"Exchange (?:hash|range|rounds|SinglePartition)", plan))


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
    for name in ("simhash_pairs", "dedup_embedding_cosine"):
        plan = _executed_plan(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


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
    df = QUERIES["doc_lm_perplexity"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert plan.count("InMemoryTableScan") >= 5, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        spark.catalog.clearCache()


def test_ngram_jaccard_computes_shingles_once(spark, sf_dir):
    """Exact-Jaccard's shingle table feeds three consumers (both self-join
    sides and the per-doc size agg); the shingle expression dominates the
    operator's cost, so all three must read the persisted table — three
    InMemoryTableScans, not three re-runs of scan + shingle transform."""
    df = QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
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
    """PMI: marginals re-aggregate the persisted bigram counts (vocab-
    sized), never the corpus — the exploded corpus crosses the wire once
    into the (bigram) agg; both marginal joins broadcast; no n² product."""
    df = QUERIES["bigram_pmi"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
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
    df = QUERIES["important_stock_value"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "InMemoryTableScan" in plan, plan  # grouped table reused
    finally:
        spark.catalog.clearCache()


def test_bm25_only_matching_postings_shuffle(spark, sf_dir):
    """BM25: the word-IN-terms filter sits below the tf exchange (only
    matching postings cross the wire), idf broadcasts, and the top-20
    plans as TakeOrderedAndProject, not a global sort."""
    df = QUERIES["bm25_search"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        # corpus scan is cached+projected once; both consumers read the cache
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        spark.catalog.clearCache()


def test_event_funnel_one_fact_exchange(spark, sf_dir):
    """Funnel: the fact repartitions ONCE on user_id; each stage's
    aggregation and join reuses that partitioning (AQE sees
    co-partitioned children), so no further full-fact exchanges appear."""
    df = QUERIES["event_funnel"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan  # v/c/p read cache
    finally:
        spark.catalog.clearCache()


def test_cross_doc_span_overlap_reuses_span_exchange(spark, sf_dir):
    """Repeated-span coverage: the exploded span table is persisted and
    feeds both the span-frequency agg and the doc join-back — the corpus
    explodes once, and no pair product appears (a span shared by k docs
    costs k rows, not k^2)."""
    df = QUERIES["cross_doc_span_overlap"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        spark.catalog.clearCache()


def test_dsir_weights_single_corpus_explode(spark, sf_dir):
    """DSIR: source and target LM counts both derive from the SAME
    persisted exploded-bigram table (lang filter, no second corpus
    read); the smoothing scalars are driver literals, not joins."""
    df = QUERIES["dsir_weights"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        # bg persisted: scoring + src counts + tgt counts all read cache
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        spark.catalog.clearCache()


def test_dedup_incremental_probe_is_asymmetric(spark, sf_dir):
    """Incremental dedup: the signature table is persisted (one scan
    pipeline feeds probe keys, index keys, and both verify sides) and no
    pair product appears — candidates come only from the new-batch probe
    against the corpus band index."""
    df = QUERIES["dedup_incremental"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        spark.catalog.clearCache()


def test_doc_similar_topk_term_selective(spark, sf_dir):
    """Sparse TF-IDF similarity: the query vector broadcasts, scoring
    touches only postings of the query's terms (no doc x doc product),
    and the weight table is persisted for both consumers."""
    df = QUERIES["doc_similar_topk"].fn(spark, sf_dir)
    try:
        plan = _executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        spark.catalog.clearCache()
