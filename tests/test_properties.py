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


# --- Spark-side invariant: dau_first_ts == dau_rows on the count columns ---

_event = st.tuples(
    st.integers(min_value=0, max_value=99),        # event_id
    st.integers(min_value=0, max_value=3),         # user_id
    st.integers(min_value=0, max_value=60),        # hours offset (ties likely)
)


@given(st.lists(_event, min_size=1, max_size=25, unique_by=lambda t: t[0]))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dau_first_ts_matches_dau_rows(spark, rows):
    """The count-only DAU core (min(ts) hash agg) must pick the same
    (mid, dt, hr, ts) winners as the general struct-min dedup — the
    equivalence dau_hourly/dau_total/dau_today_yesterday stand on.
    Randomized event tables include same-(dt, user) ts ties (won on
    event_id by dau_rows, value-irrelevant to min(ts)) and day
    boundaries."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from gmallrealtime02_spark.operators.dau import dau_first_ts, dau_rows

    base = datetime(2024, 1, 1, 12, 30, 0)
    data = [
        (eid, base + timedelta(hours=hrs), uid, "view", float(eid))
        for eid, uid, hrs in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double"
    ).withColumn("props", F.lit("{}"))
    got = {
        tuple(map(str, r))
        for r in dau_first_ts(df).collect()
    }
    want = {
        tuple(map(str, r))
        for r in dau_rows(df).select("mid", "dt", "hr", "ts").collect()
    }
    assert got == want


# --- packing conservation + quantization edge cases ------------------------

_doc = st.tuples(
    st.integers(min_value=0, max_value=50),         # doc_id (dups possible → distinct below)
    st.sampled_from(["en", "de", "fr"]),            # lang
    st.integers(min_value=0, max_value=5000),       # ntok
)


@given(st.lists(_doc, min_size=1, max_size=30, unique_by=lambda t: t[0]))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sequence_packing_conserves_tokens_and_fills_contiguously(spark, rows):
    """For any corpus, per (lang, shard) stream: (a) bin token totals sum
    to the stream's corpus token total (nothing dropped or double-packed —
    oversized docs are SPLIT across bins, not skipped over); (b) bin ids
    are exactly the contiguous prefix 0..max_bin; (c) every bin except the
    last holds exactly PACK_BUDGET tokens (perfect fill)."""
    from gmallrealtime02_spark.plans.training_data import (
        PACK_BUDGET,
        PACK_SHARDS,
        pack_bins,
    )

    df = spark.createDataFrame(rows, "doc_id long, lang string, ntok int")
    packed = pack_bins(df).collect()

    by_stream_tokens: dict[tuple, int] = {}
    by_stream_bins: dict[tuple, dict] = {}
    for r in packed:
        key = (r.lang, r.shard)
        by_stream_tokens[key] = by_stream_tokens.get(key, 0) + r.bin_tokens
        by_stream_bins.setdefault(key, {})[r.bin] = r.bin_tokens
    want_tokens: dict[tuple, int] = {}
    for doc_id, lang, ntok in rows:
        key = (lang, doc_id % PACK_SHARDS)
        want_tokens[key] = want_tokens.get(key, 0) + ntok
    assert by_stream_tokens == want_tokens
    for key, bins in by_stream_bins.items():
        last = max(bins)
        assert set(bins) == set(range(last + 1)), (key, sorted(bins))
        for b, toks in bins.items():
            if b < last:
                assert toks == PACK_BUDGET, (key, b, toks)


@given(
    st.lists(
        st.floats(
            min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_quantization_roundtrip_bound_any_vector(spark, vec):
    """For ANY float vector (constant vectors, single elements, negatives):
    codes in [0,255] and mse ≤ (span/255)²/4 + ulp slack; span=0 vectors
    quantize to code 0 with zero error."""
    from gmallrealtime02_spark.functions.clustering import quantize_per_vector

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    row = quantize_per_vector(df).collect()[0]
    assert all(0 <= c <= 255 for c in row.codes)
    span = row.qmax - row.qmin
    if span == 0:
        assert row.mse == 0.0
        assert set(row.codes) == {0}
    else:
        step = span / 255.0
        assert row.mse <= step * step / 4.0 + 1e-9 * max(1.0, span * span)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
                      allow_infinity=False),
        ),
        min_size=4,
        max_size=40,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_power_sum_variance_matches_numpy(spark, rows):
    """The exact-decimal power-sum variance equals numpy's two-pass ddof=1
    variance within float tolerance for any group with n ≥ 2 (the
    one-pass-with-exact-sums formula has no catastrophic cancellation at
    these magnitudes)."""
    import numpy as np
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g string, value double")
    v = F.col("value").cast("decimal(18,6)")
    got = {
        r.g: r.var_value
        for r in df.groupBy("g")
        .agg(F.count("value").alias("n"), F.sum(v).alias("s1"), F.sum(v * v).alias("s2"))
        .select(
            "g",
            "n",
            (
                (F.col("s2").cast("double")
                 - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("var_value"),
        )
        .filter(F.col("n") >= 2)
        .collect()
    }
    for g, var in got.items():
        # mirror the operator's quantization: values enter as DECIMAL(18,6)
        xs = np.round(
            np.array([x for k, x in rows if k == g], dtype=np.float64), 6
        )
        np.testing.assert_allclose(var, xs.var(ddof=1), rtol=1e-6, atol=1e-9)


# --- cleaning family: Spark column math vs pure-python mirrors -------------

_pii_atom = st.one_of(
    st.sampled_from(
        [
            "plain", "words", "x1", "a-b", "semi@colon",  # near-misses
            "bob.smith+x@example.co.uk", "a@b.io",        # emails
            "555-867-5309", "123-456-7890",               # phones
            "10.0.255.1", "1.2.3.4",                      # ipv4
        ]
    ),
    st.text(alphabet="abc@.-0123456789", min_size=1, max_size=8),
)


@given(st.lists(_pii_atom, min_size=1, max_size=8).map(" ".join))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pii_scrub_matches_re_and_is_idempotent(spark, text):
    """Spark's scrub/count == Python re with the same patterns (the
    patterns are restricted to the Java∩RE2∩`re` common subset), and
    scrubbing is idempotent (placeholders never re-match)."""
    import re

    from pyspark.sql import functions as F

    from gmallrealtime02_spark.functions import text as TX

    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        TX.pii_scrub(F.col("text")).alias("clean"),
        TX.pii_counts(F.col("text"))["n_emails"].alias("ne"),
        TX.pii_counts(F.col("text"))["n_phones"].alias("np"),
        TX.pii_counts(F.col("text"))["n_ipv4"].alias("ni"),
        TX.pii_scrub(TX.pii_scrub(F.col("text"))).alias("clean2"),
    ).collect()[0]
    assert row.ne == len(re.findall(TX.PII_EMAIL_RE, text))
    assert row.np == len(re.findall(TX.PII_PHONE_RE, text))
    assert row.ni == len(re.findall(re.sub(r"\((.*?)\)", r"(?:\1)", TX.PII_IPV4_RE), text))
    want = re.sub(TX.PII_EMAIL_RE, "<EMAIL>", text)
    want = re.sub(TX.PII_PHONE_RE, "<PHONE>", want)
    want = re.sub(TX.PII_IPV4_RE, "<IP>", want)
    assert row.clean == want
    assert row.clean2 == row.clean


@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=2), min_size=2, max_size=12).map(" ".join))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_signals_match_counter(spark, text):
    """Bigram repetition stats == a collections.Counter mirror over the
    identical whitespace tokenization (heavy-repeat alphabet 'a'/'b'
    stresses the dup/top fractions)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from gmallrealtime02_spark.functions import text as TX

    ws = text.split(" ")
    grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    cnt = Counter(grams)
    df = spark.createDataFrame([(text,)], "text string")
    bg = TX.word_bigrams(F.col("text"))
    dist = F.array_distinct(bg)
    row = df.select(
        F.size(bg).alias("n"),
        F.size(dist).alias("d"),
        F.array_max(
            F.transform(dist, lambda x: F.size(F.filter(bg, lambda y: y == x)))
        ).alias("top"),
    ).collect()[0]
    assert row.n == len(grams)
    assert row.d == len(cnt)
    assert row.top == max(cnt.values())


# --- funnel: relational min-ts chaining == brute-force state machine -------


_funnel_event = st.tuples(
    st.integers(min_value=1, max_value=6),      # user_id
    st.integers(min_value=0, max_value=50),     # ts offset (minutes)
    st.sampled_from(["view", "click", "purchase", "error"]),
)


def _brute_funnel(rows):
    """Per-user state machine over ts-ordered events (event_id breaks
    ties): first view anchors, first click strictly after it, first
    purchase strictly after that."""
    order = {"view": 1, "click": 2, "purchase": 3}
    by_user: dict[int, list] = {}
    for eid, (uid, ts, et) in enumerate(rows):
        by_user.setdefault(uid, []).append((ts, eid, et))
    counts = {1: 0, 2: 0, 3: 0}
    for evs in by_user.values():
        stage, anchor = 0, None
        for ts, _eid, et in sorted(evs):
            if stage < 3 and order.get(et) == stage + 1 and (
                anchor is None or ts > anchor
            ):
                stage += 1
                anchor = ts
        for s in range(1, stage + 1):
            counts[s] += 1
    return counts


@given(st.lists(_funnel_event, min_size=0, max_size=40))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_event_funnel_matches_brute_force(spark, events):
    """The registered event_funnel's min-ts-chained relational form must
    equal a brute-force per-user state machine on arbitrary event
    streams (ties, repeats, out-of-order stages, missing stages)."""
    from datetime import datetime, timedelta

    from gmallrealtime02_spark.plans.analytics import event_funnel

    t0 = datetime(2024, 1, 1)
    rows = [
        (eid, t0 + timedelta(minutes=ts), uid, et, 1.0)
        for eid, (uid, ts, et) in enumerate(events)
    ]
    sdf = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    import gmallrealtime02_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda _s, _d, _t: sdf  # inject the random table
        # plans.analytics imported load_table by name — patch there too
        import gmallrealtime02_spark.plans.analytics as an

        an_orig = an.load_table
        an.load_table = lambda _s, _d, _t: sdf
        try:
            got = {
                r.stage: r.users for r in event_funnel(spark, "unused").collect()
            }
        finally:
            an.load_table = an_orig
    finally:
        tables.load_table = orig
    assert got == _brute_funnel(events), (got, _brute_funnel(events))


# --- PIT join: carry-forward rewrite == brute-force interval lookup --------


_pit_event = st.tuples(
    st.integers(min_value=1, max_value=5),      # user_id
    st.integers(min_value=0, max_value=30),     # ts offset (minutes)
    st.sampled_from(["view", "click", "purchase", "error", "signup"]),
)


def _brute_pit(rows):
    """Brute-force point-in-time lookup: per user, build the collapsed
    SCD2 change list from non-purchase events in (ts, event_id) order,
    then each purchase takes the last change at-or-before it (state
    rows win timestamp ties against purchases)."""
    by_user: dict[int, list] = {}
    for eid, (uid, ts, et) in enumerate(rows):
        by_user.setdefault(uid, []).append((ts, eid, et))
    out = {}
    for uid, evs in by_user.items():
        changes = []  # (ts, eid, state, version)
        prev = None
        for ts, eid, et in sorted(
            (t, e, y) for t, e, y in evs if y != "purchase"
        ):
            if prev is None or et != prev:
                changes.append((ts, eid, et, len(changes) + 1))
                prev = et
        for ts, eid, et in sorted(evs):
            if et != "purchase":
                continue
            cur = None
            for cts, ceid, cstate, cver in changes:
                # state-first tie order: a change AT the purchase ts applies
                if (cts, 0) <= (ts, 1):
                    cur = (cstate, cts, cver)
                else:
                    break
            out[eid] = cur  # None -> no prior state (nulls)
    return out


@given(st.lists(_pit_event, min_size=0, max_size=40))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_pit_join_matches_brute_force(spark, events):
    """The union + carry-forward rewrite of scd2_pit_join must equal a
    brute-force per-purchase interval lookup on arbitrary streams
    (shared timestamps, repeated states, purchases before any state)."""
    from datetime import datetime, timedelta

    from gmallrealtime02_spark.plans.warehouse import scd2_pit_join

    t0 = datetime(2024, 1, 1)
    rows = [
        (eid, t0 + timedelta(minutes=ts), uid, et, 1.0)
        for eid, (uid, ts, et) in enumerate(events)
    ]
    sdf = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    import gmallrealtime02_spark.plans.warehouse as wh

    orig = wh.load_table
    try:
        wh.load_table = lambda _s, _d, _t: sdf
        got = {
            r.event_id: (
                None
                if r.state is None
                else (r.state, r.state_since, r.state_version)
            )
            for r in scd2_pit_join(spark, "unused").collect()
        }
    finally:
        wh.load_table = orig
    want = {
        eid: (None if cur is None else (cur[0], t0 + timedelta(minutes=cur[1]), cur[2]))
        for eid, cur in _brute_pit(events).items()
    }
    assert got == want, (got, want)
