"""Semantic gates for the corpus-tools family (plan shapes live in
test_plan_shapes, oracle parity in test_registry_oracles): the BPE merge
fold must implement greedy left-to-right pair merging exactly, and the
JL projection must actually decorrelate output dimensions (the bug class
this guards: a degenerate sign matrix where every dim is +/-p0)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmallrealtime02_spark.plans.corpus_tools import _merge_fold


@pytest.mark.parametrize(
    "seq,a,b,want",
    [
        ("l l l", "l", "l", "ll l"),      # greedy: leftmost wins, no re-merge
        ("a b a b a", "a", "b", "ab ab a"),
        ("a l l", "l", "l", "a ll"),
        ("al l", "l", "l", "al l"),        # token-boundary: 'al' suffix 'l' no match
        ("a b b", "a", "b", "ab b"),       # merged token not re-used as left side
        ("x", "a", "b", "x"),
        ("ab c ab c", "ab", "c", "abc abc"),  # multi-char tokens merge too
    ],
)
def test_merge_fold_greedy_semantics(spark, seq, a, b, want):
    row = (
        spark.range(1)
        .select(
            _merge_fold(F.split(F.lit(seq), " "), F.lit(a), F.lit(b)).alias("m")
        )
        .collect()[0]
    )
    assert row.m == want, (seq, a, b, row.m)


def test_jl_projection_dims_decorrelated(spark, sf_dir):
    """No output dim may be a constant multiple of another across the
    corpus — the failure mode of a parity-degenerate sign matrix."""
    from gmallrealtime02_spark.plans.registry import load_all

    rows = load_all()["jl_projection"].fn(spark, sf_dir).limit(50).collect()
    cols = [[getattr(r, f"p{j}") for r in rows] for j in range(16)]
    for j in range(1, 16):
        same = sum(1 for x, y in zip(cols[0], cols[j]) if abs(x) == abs(y))
        assert same < len(rows), f"dim {j} is +/- dim 0 on every row"


def test_zorder_bucket_prunes_both_dimensions(spark, sf_dir):
    """The point of the z-key: a single-dimension predicate touches only
    a small fraction of z-buckets (file-skipping for EITHER column),
    which a one-column sort cannot give for the other column."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.plans.registry import load_all
    from gmallrealtime02_spark.sources.tables import load_table

    z = load_all()["zorder_layout"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    joined = z.join(ev, "event_id")
    total = z.select("zbucket").distinct().count()
    one_user = (
        joined.filter(F.col("user_id") == 7).select("zbucket").distinct().count()
    )
    assert one_user <= max(4, total * 0.25), (one_user, total)


def test_winnowing_shared_run_shares_fingerprint_across_offsets(spark):
    """The MOSS guarantee, cross-document: two documents containing the
    same >=(w+n-1)-shingle run at DIFFERENT offsets must share at least
    one emitted fingerprint VALUE (regression: the first revision
    emitted hash*2^20+pos, which never matched across documents)."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.functions.similarity import shingle_hashes_fast
    from gmallrealtime02_spark.plans.corpus_tools import winnow_fps

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, run),
            (2, "pre1 pre2 pre3 pre4 pre5 " + run),
        ],
        "doc_id long, text string",
    )
    fps = F.transform(F.array(shingle_hashes_fast(F.col("text"))), winnow_fps)[0]
    rows = {r.doc_id: set(r.fps) for r in docs.select("doc_id", fps.alias("fps")).collect()}
    assert rows[1] & rows[2], rows


def test_bpe_encode_kernel_matches_fold(spark, sf_dir):
    """The Arrow BPE-encode kernel must be BIT-IDENTICAL to the
    bpe_encode_plan fold spec — bpe_encode and bpe_compression_by_lang
    read it.  Exercised on the real corpus with the real learned merges
    plus edge words (chained same-char merges where greedy
    non-rematching matters, multi-space runs, all-space docs that hit
    the NULL chars_per_token path, BMP accents)."""
    import pandas as pd

    from gmallrealtime02_spark.plans.corpus_tools import (
        _learn_merges,
        bpe_encode_plan,
        bpe_encode_table,
    )
    from gmallrealtime02_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    merges = _learn_merges(spark, sf_dir)

    def norm(df):
        return df.toPandas().sort_values("doc_id").reset_index(drop=True)

    spec = norm(bpe_encode_plan(d, merges, extra_cols=("lang", "n_chars")))
    got = norm(bpe_encode_table(d, merges, extra_cols=("lang", "n_chars")))
    pd.testing.assert_frame_equal(got, spec, check_exact=True, check_dtype=False)

    edge = spark.createDataFrame(
        [
            (1, "l l l l", 7, "en"),
            (2, "  a  b ", 7, "en"),
            (3, "lll llll", 8, "fr"),
            (4, "café ll", 7, "de"),
            (5, " ", 1, "en"),
        ],
        "doc_id long, text string, n_chars int, lang string",
    )
    em = [(1, "l", "l", 0), (2, "ll", "l", 0), (3, "a", "b", 0)]
    s2 = norm(bpe_encode_plan(edge, em, extra_cols=("lang",)))
    g2 = norm(bpe_encode_table(edge, em, extra_cols=("lang",)))
    pd.testing.assert_frame_equal(g2, s2, check_exact=True, check_dtype=False)
    assert list(s2.n_tokens) == [4, 2, 3, 5, 0]
