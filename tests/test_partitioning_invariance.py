"""Partitioning-invariance gates.

Round 3's determinism claim is operational, not cosmetic: on a real
cluster, task count and task completion order change run-to-run, so any
order-dependent float accumulation makes results non-reproducible (and
breaks the cross-engine oracle).  These tests re-run the
determinism-critical queries under a very different shuffle-partition
setting and require BIT-IDENTICAL results — the strongest cheap proxy
for "same answer on any cluster layout" available in local mode.
"""

from __future__ import annotations

import numpy as np

from gmallrealtime02_spark.plans.registry import load_all

QUERIES = load_all()

# Queries whose docstrings claim partitioning-invariance through exact
# decimal accumulation, fold-ordered arithmetic, or integer-only logic.
INVARIANCE_CRITICAL = [
    "kmeans_clusters",       # decimal-exact centroid sums
    "dedup_semantic",        # k-means + rounded cosine pairs
    "dedup_embedding_cosine",  # deterministic LSH + rounded cosine
    "important_stock_value",   # decimal cross-multiplied threshold
    "value_moments",           # exact decimal power sums
    "dsir_weights",            # decimal-summed rounded log-ratios
    "doc_lm_perplexity",       # decimal-summed rounded NLL terms
    "bm25_search",             # rounded idf + fixed-order pivot sum
    "bigram_pmi",              # double factors, integer counts
    "doc_similar_topk",        # decimal-summed quantized weight products
    "bitext_mine",             # deterministic LSH + decimal margin sums
    "kn_bigram_lm",            # pinned-order double chain over int counts
    "doc_kn_perplexity",       # decimal-summed rounded KN NLL terms
    "quality_classifier_score",  # decimal-gradient weights, pinned logit
    "ann_recall_eval",         # deterministic ladder + integer hit counts
    "media_dedup_phash",       # integer-only aHash + banded hamming
    "source_jsd_matrix",       # decimal-summed rounded KL terms + exact masses
    "embedding_norm_stats",    # array-order folds + exact percentiles
    "cluster_balance_sample",  # integer threshold over md5 draw + exact kmeans
    "ann_cosine_filtered",     # rounded fold cosines + cid tiebreak
    "hybrid_search_rrf",       # integer ranks from deterministic legs
    "coview_components",       # min-label fixpoint — pure edge-set function
    "coview_bfs_depth",        # frontier BFS — pure edge-set function
    "ann_multiprobe_lsh",      # deterministic XOR probes + rounded cosines
    "semantic_decontamination",  # single-integer argmax encoding
    "perplexity_mix",          # decimal NLL sums + integer excess weights
    "coview_clustering_coefficient",  # integer-only triangle/degree ratio
    "quality_percentile_by_source",   # total order + integer micro rank
]


def _run_sorted(spark, name, sf_dir):
    pdf = QUERIES[name].fn(spark, sf_dir).toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    for c in cols:
        if len(pdf) and isinstance(pdf[c].iloc[0], (list, np.ndarray)):
            pdf[c] = pdf[c].map(tuple)
    return pdf.sort_values(cols).reset_index(drop=True)


def test_results_identical_across_shuffle_partitionings(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in INVARIANCE_CRITICAL:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = _run_sorted(spark, name, sf_dir)
            spark.catalog.clearCache()
            spark.conf.set("spark.sql.shuffle.partitions", "29")
            b = _run_sorted(spark, name, sf_dir)
            spark.catalog.clearCache()
            assert a.equals(b), f"{name} differs across partitionings"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
