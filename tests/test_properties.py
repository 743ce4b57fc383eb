"""Property-based tests (hypothesis): algebraic invariants the operators
rely on, checked over randomized inputs.

The rolling-hash composition law is pure arithmetic, so it's exercised
densely in-process (hundreds of cases, no Spark); the dedup equivalence
draws a handful of randomized tables through real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gmallrealtime02_spark.functions.similarity import N_SHINGLE
from gmallrealtime02_spark.functions.text import HASH_MOD

# --- pure mirrors of the column-level arithmetic ---------------------------


def _char_fold(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % HASH_MOD
    return acc


def _word_h_p(w: str) -> tuple[int, int]:
    h, p = 0, 1
    for c in w:
        h = (h * 31 + ord(c)) % HASH_MOD
        p = (p * 31) % HASH_MOD
    return h, p


def _composed_shingle_hash(words: list[str]) -> int:
    h, _ = _word_h_p(words[0])
    for w in words[1:]:
        nh, np_ = _word_h_p(w)
        h = (h * 31 + 32) % HASH_MOD  # ' ' separator
        h = (h * np_ + nh) % HASH_MOD
    return h


_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF), max_size=12
)


@given(st.lists(_word, min_size=N_SHINGLE, max_size=8))
@settings(max_examples=300, deadline=None)
def test_rolling_hash_composition_law(words):
    """H(w1·' '·w2·…) computed word-compositionally equals the direct
    char fold of the joined string — the identity shingle_hashes_fast
    (similarity.py) depends on for oracle bit-exactness, including empty
    words (consecutive spaces)."""
    assert _composed_shingle_hash(words) == _char_fold(" ".join(words))


# --- Spark-side invariant: min(struct) dedup == ROW_NUMBER()=1 -------------

_row = st.tuples(
    st.integers(min_value=0, max_value=3),   # key
    st.integers(min_value=0, max_value=5),   # ord1
    st.integers(min_value=0, max_value=9),   # ord2
    st.integers(min_value=-100, max_value=100),  # payload
)


@given(st.lists(_row, min_size=1, max_size=25))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_first_seen_dedup_equals_ranked_window(spark, rows):
    """For any table, the min(struct) hash-agg dedup picks exactly the
    lexicographically-first row per key — the same multiset a ranking
    window with a total-order tiebreak yields."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.operators.dau import first_seen_dedup

    df = spark.createDataFrame(rows, "k int, o1 int, o2 int, payload int")
    got = {
        tuple(r)
        for r in first_seen_dedup(df, ["k"], ["o1", "o2", "payload"]).collect()
    }
    w = Window.partitionBy("k").orderBy("o1", "o2", "payload")
    want = {
        tuple(r)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .collect()
    }
    assert got == want
