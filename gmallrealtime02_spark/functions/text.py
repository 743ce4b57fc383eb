"""Text-analysis column functions for LLM-data pipelines (north-star ops,
no reference analogue — BASELINE.json ``north_star``).

Everything here is built from codegen'd ``pyspark.sql.functions`` (array
lambdas, regex, arithmetic) — no Python UDFs — so at 100 TB the operators
run entirely JVM-side inside whole-stage codegen, scan-parallel with zero
shuffle.  Each has an exact DuckDB-SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .numeric import ratio_micro

# Regex kept to portable character classes (identical semantics in Java
# regex and RE2): words, numbers, or a single other non-space symbol.
BPE_ISH_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

HASH_MOD = 2_147_483_647  # 2^31 - 1 (prime)


def words(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def word_count(text: Column) -> Column:
    return F.size(words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via regex segmentation (a cheap stand-in
    for a BPE tokenizer's token count; same formula as the oracle)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_RE), F.lit(0)))


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """How many tokens are in the stopword list (array filter, JVM-side)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(text), lambda w: F.array_contains(sw, w)))


# Marker words per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht"],
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker-hit count, ties broken by language
    code order (deterministic; 'und' = undetermined when nothing matches)."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse alphabetical order: on equal scores a later
    # (alphabetically earlier) language replaces, so ties go to the
    # alphabetically-first code — same as the oracle's CASE ordering
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        best_lang = F.when(s >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s >= best_score, s).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9 ]"), F.lit(0)))


def quality_feature_micros(text: Column) -> dict[str, Column]:
    """Exact micro-unit (1e-6) LONG integers of the four quality ratios,
    rounded half-away in EXACT integer arithmetic (functions.numeric).
    Why not ``F.round(ratio, 6)``: these are exact int/int ratios, and
    round-on-double resolves decimal midpoints engine-dependently — a
    doc with n_words = 2^a·5^b (640, 3200, ...) and an odd numerator
    lands its ratio exactly on a NON-representable 5e-7-grid midpoint,
    where Spark (HALF_UP on the shortest repr) and DuckDB (binary round)
    disagree by 1e-6.  Integer half-away has no midpoint ambiguity."""
    n_chars = F.length(text)
    n_words = word_count(text)
    n_stop = stopword_hits(text, LANG_MARKERS["en"])
    n_punct = punct_count(text)
    uniq_words = F.size(F.array_distinct(words(text)))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "awl_micro": ratio_micro(n_chars - (n_words - 1), n_words),
        "stop_micro": ratio_micro(n_stop, n_words),
        "punct_micro": ratio_micro(n_punct, n_chars),
        "ttr_micro": ratio_micro(uniq_words, n_words),
    }


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: integer counts + the micro-exact
    6-dp ratios of :func:`quality_feature_micros` emitted as doubles
    (same exact integer divided by 1e6 on every engine)."""
    m = quality_feature_micros(text)
    return {
        "n_chars": m["n_chars"],
        "n_words": m["n_words"],
        "avg_word_len": m["awl_micro"].cast("double") / 1000000,
        "stopword_ratio": m["stop_micro"].cast("double") / 1000000,
        "punct_ratio": m["punct_micro"].cast("double") / 1000000,
        "type_token_ratio": m["ttr_micro"].cast("double") / 1000000,
    }


def quality_score(text: Column) -> Column:
    """Composite 0-1 quality score (higher = better): rewards lexical
    diversity and stopword presence, penalizes symbol soup.

    Computed in exact integer micro-units end-to-end — the inputs ARE
    the micro integers (quality_feature_micros), so no float re-derive
    and no engine-dependent halfway points anywhere in the path.
    """
    m = quality_feature_micros(text)
    mill = F.lit(1_000_000).cast("long")
    a, b, c = m["ttr_micro"], m["stop_micro"], m["punct_micro"]
    micro = 4 * a + 3 * F.least(b * 5, mill) + 3 * (mill - F.least(c * 10, mill))
    return micro.cast("double") / F.lit(10_000_000.0)


# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language
# Models", Table A1 — adapted to the fixture corpus's flat word streams).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_AVG_WORD_LEN = 3.0
GOPHER_MAX_AVG_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.80
GOPHER_MIN_STOPWORD_HITS = 2


def alpha_word_count(text: Column) -> Column:
    """How many whitespace tokens contain at least one ASCII letter."""
    return F.size(F.filter(words(text), lambda w: w.rlike("[a-zA-Z]")))


def gopher_rules(text: Column) -> dict[str, Column]:
    """Per-document Gopher quality-rule booleans.  Every comparison is on
    exact int/int IEEE division (bit-identical across engines), so the
    booleans — unlike raw float features — hash-compare safely."""
    n_chars = F.length(text)
    n_words = word_count(text)
    avg_wl = (n_chars - (n_words - 1)).cast("double") / n_words
    symbol_ratio = punct_count(text).cast("double") / n_words
    alpha_ratio = alpha_word_count(text).cast("double") / n_words
    return {
        "ok_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "ok_avg_word_len": (avg_wl >= GOPHER_MIN_AVG_WORD_LEN)
        & (avg_wl <= GOPHER_MAX_AVG_WORD_LEN),
        "ok_symbol_ratio": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "ok_alpha_words": alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO,
        "ok_stopwords": stopword_hits(text, LANG_MARKERS["en"])
        >= GOPHER_MIN_STOPWORD_HITS,
    }


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): literal classes, bounded repetition,
# no backreferences or lookaround.
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence counts per PII class (codegen'd regexp_extract_all)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), F.lit(0))),
        "n_ipv4": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), F.lit(0))),
    }


def pii_scrub(text: Column) -> Column:
    """Redact emails → <EMAIL>, phones → <PHONE>, IPv4 → <IP> (order
    matters: emails first so their domain dots never half-match as IPs)."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def word_bigrams_of(ws: Column) -> Column:
    """All consecutive bigrams of a words-ARRAY column, duplicates
    preserved (the repetition signals need multiplicity — unlike the
    deduped shingles LSH uses).  zip_with over the array and its
    shift-by-one slice: one pass, no index arithmetic.  Callers must
    pass a MATERIALIZED array column (projected in a prior select) —
    inlining ``split(text)`` here re-evaluates the split inside the
    lambda per element, which profiled ~10× slower at sf0.1."""
    grams = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # slice with length < 1 throws / misbehaves; guard sub-2-word docs.
    return F.when(F.size(ws) >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_bigrams(text: Column) -> Column:
    """Bigrams straight from text — convenience for small/test inputs;
    hot paths should project ``words(text)`` first and call
    ``word_bigrams_of`` (see its docstring)."""
    return word_bigrams_of(words(text))


def char_codepoints(s: Column) -> Column:
    """Array of codepoints (empty-string guard on both engines)."""
    return F.transform(
        F.filter(F.split(s, ""), lambda c: c != ""), lambda c: F.ascii(c)
    )


def hash_sql(s: str) -> str:
    """DuckDB expression mirroring ``portable_hash`` over a string
    expression ``{s}`` — the oracle-side twin of the polynomial fold.
    ONE definition for every oracle builder (llm_pipeline, sketches,
    corpus_tools): the fold must stay bit-identical to the Spark column
    above, so it lives next to it."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split({s}, ''), c -> c != ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc*31 + c) % {HASH_MOD})"
    )


def portable_hash(s: Column) -> Column:
    """Polynomial rolling hash ``acc*31 + codepoint (mod 2^31-1)`` — exactly
    reproducible in any engine with a list fold (DuckDB: list_reduce), used
    wherever the oracle must agree with a hash (minhash, fingerprints)."""
    return F.aggregate(
        char_codepoints(s),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % HASH_MOD,
    )


def positional_fingerprint(text: Column) -> Column:
    """Order-sensitive document checksum: Σ position·codepoint (mod 2^31-1).

    Distinguishes anagrams (unlike a bag-of-chars sum); cheap enough to
    compute scan-side on every document.

    Empty-text guard: ``sequence(1, 0)`` is the DESCENDING array [1, 0]
    in Spark (not empty as in DuckDB's generate_series), so zip_with
    null-pads against the empty codepoint array and the fold yields
    NULL where the oracle yields 0 — pin 0 explicitly.
    """
    pos_products = F.zip_with(
        F.sequence(F.lit(1), F.length(text)),
        char_codepoints(text),
        lambda i, c: (i * c) % HASH_MOD,
    )
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            pos_products,
            F.lit(0).cast("long"),
            lambda acc, x: (acc + x) % HASH_MOD,
        )
    )


# ---------------------------------------------------------------------------
# Arrow text-profile kernel — the 100 TB text-scan fast path
# ---------------------------------------------------------------------------

# Which Catalyst formulation above each kernel column must match
# bit-for-bit (parity pinned in tests/test_llm_ops.py::
# test_text_profile_kernel_matches_catalyst):
#   n_chars/n_words/avg_word_len/stopword_ratio/punct_ratio/
#   type_token_ratio/quality  -> quality_features / quality_score
#   n_bpe_tokens              -> bpe_ish_token_count
#   pred_lang                 -> lang_id
#   ok_*                      -> gopher_rules
#   gopher_ok                 -> AND of all gopher_rules
#   text_md5                  -> F.md5(text.cast("binary"))
TEXT_PROFILE_COLS = (
    "n_chars",
    "n_words",
    "avg_word_len",
    "stopword_ratio",
    "punct_ratio",
    "type_token_ratio",
    "quality",
    "n_bpe_tokens",
    "pred_lang",
    "ok_word_count",
    "ok_avg_word_len",
    "ok_symbol_ratio",
    "ok_alpha_words",
    "ok_stopwords",
    "gopher_ok",
    "text_md5",
)


def text_profile_table(
    df, keep: tuple[str, ...], cols: tuple[str, ...], text_col: str = "text"
):
    """(keep..., cols...) via ONE Arrow-batched Python kernel over the
    text column — bit-identical to the Catalyst expression trees above
    (see TEXT_PROFILE_COLS for the column -> spec map; parity pinned in
    tests/test_llm_ops.py).

    Why this exists: the Catalyst formulation of quality features +
    language ID is ~30 interpreted/regex expressions per document
    (repeated splits survive codegen CSE, but regexp_extract_all
    materializes every match and the 25 marker-filter lambdas dominate) —
    measured 7 MB/s aggregate on 32 cores in ``bench.py --stress``, which
    at 100 TB makes the quality scan THE corpus bottleneck.  This kernel
    computes all features in one pass over each document (split once,
    one translate for punctuation, one marker-dict sweep) at ~40-100x
    the per-core throughput.  The Catalyst functions above remain the
    semantic spec and serve ad-hoc single-feature use.

    Exactness notes (same discipline as ``minhash_sig_table``):
    - every 6-dp ratio rounds in EXACT integer micro-units (half-away,
      the functions.numeric discipline) — identical to the Catalyst
      spec's ratio_micro columns and to the DuckDB oracles, with no
      engine-dependent decimal-midpoint resolution anywhere;
    - the composite quality score is exact integer micro-unit math
      over those same micro ints;
    - ``str.translate`` deletion of [a-zA-Z0-9 ] counts the same
      codepoints as the Java regex on the BMP (the non-BMP caveat is
      the same UTF-16 code-unit one documented on the minhash kernel);
    - md5 of the UTF-8 encoding == ``F.md5(text.cast("binary"))``.

    Assumes non-null text and (for the ratio columns) non-empty text —
    the documents-corpus contract; the parity test runs the whole
    fixture corpus through both formulations.
    """
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in df.schema.fields}
    _types = {
        "n_chars": T.IntegerType(),
        "n_words": T.IntegerType(),
        "avg_word_len": T.DoubleType(),
        "stopword_ratio": T.DoubleType(),
        "punct_ratio": T.DoubleType(),
        "type_token_ratio": T.DoubleType(),
        "quality": T.DoubleType(),
        "n_bpe_tokens": T.IntegerType(),
        "pred_lang": T.StringType(),
        "ok_word_count": T.BooleanType(),
        "ok_avg_word_len": T.BooleanType(),
        "ok_symbol_ratio": T.BooleanType(),
        "ok_alpha_words": T.BooleanType(),
        "ok_stopwords": T.BooleanType(),
        "gopher_ok": T.BooleanType(),
        "text_md5": T.StringType(),
    }
    unknown = set(cols) - set(_types)
    if unknown:
        raise ValueError(f"unknown text-profile columns: {sorted(unknown)}")
    out_schema = T.StructType(
        [
            *(in_fields[c] for c in keep),
            *(T.StructField(c, _types[c], False) for c in cols),
        ]
    )

    # plan-time constants shipped into the kernel closure
    marker_langs: dict[str, tuple[str, ...]] = {}
    for lang, ms in LANG_MARKERS.items():
        for m in ms:
            marker_langs.setdefault(m, ())
            marker_langs[m] = (*marker_langs[m], lang)
    lang_order = sorted(LANG_MARKERS)
    en_markers = frozenset(LANG_MARKERS["en"])
    want = tuple(cols)

    def kernel(batches):
        import hashlib  # noqa: PLC0415 — worker-side imports
        import re as _re  # noqa: PLC0415
        import string as _string  # noqa: PLC0415
        # same alternation order/greediness in Python re and Java regex
        bpe_re = _re.compile(BPE_ISH_TOKEN_RE)

        del_alnumsp = str.maketrans(
            "", "", _string.ascii_letters + _string.digits + " "
        )
        alpha = frozenset(_string.ascii_letters)

        def rm6(num: int, den: int) -> int:
            """micro-int of the num/den ratio, half-away in EXACT int
            arithmetic — identical to functions.numeric.py_ratio_micro
            (inlined: num >= 0 here) and to the Catalyst spec's
            ratio_micro column.  Replaces the earlier Decimal(repr)
            HALF_UP on the double ratio, which (with the F.round spec)
            diverged from DuckDB at non-representable grid midpoints."""
            return (2 * num * 1_000_000 + den) // (2 * den)

        need_quality = bool(
            {
                "avg_word_len",
                "stopword_ratio",
                "punct_ratio",
                "type_token_ratio",
                "quality",
            }
            & set(want)
        )
        need_punct = need_quality or "ok_symbol_ratio" in want or "gopher_ok" in want
        need_lang = "pred_lang" in want
        need_gopher = any(
            c.startswith("ok_") or c == "gopher_ok" for c in want
        )

        for pdf in batches:
            if not len(pdf):
                continue
            out_cols: dict[str, list] = {c: [] for c in want}
            for t in pdf[text_col]:
                ws = t.split(" ")
                n_chars = len(t)
                n_words = len(ws)
                n_punct = (
                    len(t.translate(del_alnumsp)) if need_punct else 0
                )
                n_stop = sum(1 for w in ws if w in en_markers)
                row: dict[str, object] = {}
                if "n_chars" in want:
                    row["n_chars"] = n_chars
                if "n_words" in want:
                    row["n_words"] = n_words
                if need_quality:
                    k_awl = rm6(n_chars - (n_words - 1), n_words)
                    k_stop = rm6(n_stop, n_words)
                    k_punct = rm6(n_punct, n_chars) if n_chars else 0
                    k_ttr = rm6(len(set(ws)), n_words)
                    if "avg_word_len" in want:
                        row["avg_word_len"] = k_awl / 1e6
                    if "stopword_ratio" in want:
                        row["stopword_ratio"] = k_stop / 1e6
                    if "punct_ratio" in want:
                        row["punct_ratio"] = k_punct / 1e6
                    if "type_token_ratio" in want:
                        row["type_token_ratio"] = k_ttr / 1e6
                    if "quality" in want:
                        micro = (
                            4 * k_ttr
                            + 3 * min(k_stop * 5, 1_000_000)
                            + 3 * (1_000_000 - min(k_punct * 10, 1_000_000))
                        )
                        row["quality"] = micro / 10_000_000.0
                if "n_bpe_tokens" in want:
                    row["n_bpe_tokens"] = len(bpe_re.findall(t))
                if need_lang:
                    counts = dict.fromkeys(lang_order, 0)
                    for w in ws:
                        for lang in marker_langs.get(w, ()):
                            counts[lang] += 1
                    best_lang, best = "und", 0
                    for lang in lang_order:
                        if counts[lang] > best:
                            best_lang, best = lang, counts[lang]
                    row["pred_lang"] = best_lang
                if need_gopher:
                    avg_wl = (n_chars - (n_words - 1)) / n_words
                    oks = {
                        "ok_word_count": GOPHER_MIN_WORDS
                        <= n_words
                        <= GOPHER_MAX_WORDS,
                        "ok_avg_word_len": GOPHER_MIN_AVG_WORD_LEN
                        <= avg_wl
                        <= GOPHER_MAX_AVG_WORD_LEN,
                        "ok_symbol_ratio": n_punct / n_words
                        <= GOPHER_MAX_SYMBOL_RATIO,
                        "ok_alpha_words": sum(
                            1 for w in ws if not alpha.isdisjoint(w)
                        )
                        / n_words
                        >= GOPHER_MIN_ALPHA_WORD_RATIO,
                        "ok_stopwords": n_stop >= GOPHER_MIN_STOPWORD_HITS,
                    }
                    for k, v in oks.items():
                        if k in want:
                            row[k] = v
                    if "gopher_ok" in want:
                        row["gopher_ok"] = all(oks.values())
                if "text_md5" in want:
                    row["text_md5"] = hashlib.md5(
                        t.encode("utf-8")
                    ).hexdigest()
                for c in want:
                    out_cols[c].append(row[c])
            out = pdf[list(keep)].copy()
            for c in want:
                out[c] = out_cols[c]
            yield out

    return df.select(*keep, text_col).mapInPandas(kernel, out_schema)
