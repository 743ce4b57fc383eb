"""Deduplication + similarity-search operators for LLM-data pipelines
(north-star ops — BASELINE.json ``north_star``; no reference analogue).

Design for 100 TB:

- **Exact dedup** — hash-groupBy on md5(text): one shuffle keyed by a
  16-byte digest instead of the full document body.
- **MinHash + LSH** — per-document signatures computed scan-side (array
  lambdas over shingles: no shuffle, no UDF, whole-stage codegen).  The
  only exchanges are the band-bucket join (shuffling small
  (band_key, doc_id) pairs — classic sub-quadratic candidate generation)
  and the per-candidate verify.  Candidate count ≈ O(near-dups), not
  O(n²).
- **N-gram Jaccard** — the exact verifier: a shingle self-join counts
  intersections only for pairs sharing ≥1 shingle.  At scale it runs
  AFTER LSH pruning; the standalone form here is also its own oracle.
- **SimHash** — compact bit signature from word-hash sign sums, computed
  scan-side; near-dup pairs by hamming distance.  At scale, pairing goes
  through bit-segment banding (same LSH trick) instead of the
  all-pairs join used at test scale.
- **Cosine top-k** — brute-force double-precision fold (the exact
  baseline); the LSH variant buckets vectors by random-hyperplane sign
  bits so each query scans only its bucket.

All hashing uses ``portable_hash`` (31-polynomial mod 2^31-1), so the
DuckDB oracle reproduces every signature bit-for-bit — engine-independent
exact correctness, not just statistical agreement.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import ratio_micro

from .text import HASH_MOD, char_codepoints, portable_hash

N_SHINGLE = 3
N_HASHES = 16
N_BANDS = 4          # 4 bands × 4 rows — t ≈ (1/4)^(1/4) ≈ 0.71 S-curve midpoint
SIMHASH_BITS = 24

# Frozen permutation constants for (a*h + b) mod P, seeded so every run —
# and the generated DuckDB oracle — uses identical values.
_rng = random.Random(42)
MINHASH_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, HASH_MOD), _rng.randrange(0, HASH_MOD)) for _ in range(N_HASHES)
]


from ..caching import materialized  # noqa: E402
from ..sources.tables import ensure_parallelism  # noqa: E402  (re-export)


def word_shingles(text: Column, n: int = N_SHINGLE) -> Column:
    """Distinct n-word shingles (array<string>), scan-side; empty array for
    texts shorter than n words.

    The words array is bound to a lambda variable first (``_bind``): HOF
    lambda variables hold materialized values, so every ``element_at``
    inside the shingle transform is an O(1) lookup — inlining the split
    instead re-parses the text once per (shingle, word-of-shingle), which
    measured ~3n× slower on long documents."""

    def shingles_of(ws: Column) -> Column:
        sh = F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + j + 1) for j in range(n)]
            ),
        )
        return F.when(F.size(ws) >= n, F.array_distinct(sh)).otherwise(
            F.array().cast("array<string>")
        )

    return _bind(F.split(text, " "), shingles_of)


def shingle_hashes(text: Column, n: int = N_SHINGLE) -> Column:
    """array<long> of portable shingle hashes (distinct shingles)."""
    return F.transform(word_shingles(text, n), portable_hash)


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row and let ``fn`` reference it freely.

    ``transform(array(col), fn)[0]`` binds the value to a lambda variable;
    HOF lambda variables hold materialized values, so every reference
    inside ``fn`` is a lookup — unlike plain expression reuse, which
    re-evaluates the whole subtree at each occurrence."""
    return F.transform(F.array(col), fn)[0]


def _word_hash_pows(text: Column) -> Column:
    """Per word: (rolling hash h, 31^len mod P) — each character of the
    document is folded exactly once."""
    return F.transform(
        F.split(text, " "),
        lambda w: F.aggregate(
            char_codepoints(w),
            F.struct(
                F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")
            ),
            lambda acc, c: F.struct(
                ((acc["h"] * 31 + c) % HASH_MOD).alias("h"),
                ((acc["p"] * 31) % HASH_MOD).alias("p"),
            ),
        ),
    )


def shingle_hashes_fast(text: Column, n: int = N_SHINGLE) -> Column:
    """array<long> of shingle hashes via rolling-hash composition:
    ``H(a||b) = H(a)·31^len(b) + H(b) (mod P)``, with the space separator
    contributing ``·31 + 32``.

    Bit-identical to hashing each n-word shingle string char-by-char (the
    oracle's formulation) but touches every character once instead of n
    times and allocates no shingle strings.  May contain duplicate hash
    values (no array_distinct) — irrelevant to the min-fold consumer.
    """

    def _combine(wh, i):
        h = F.element_at(wh, i)["h"]
        for j in range(1, n):
            nxt = F.element_at(wh, i + j)
            h = (h * 31 + 32) % HASH_MOD  # the ' ' separator char (code 32)
            h = (h * nxt["p"] + nxt["h"]) % HASH_MOD
        return h

    return _bind(
        _word_hash_pows(text),
        lambda wh: F.when(
            F.size(wh) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(wh) - (n - 1)),
                lambda i: _combine(wh, i),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )


def minhash_signature_array(text: Column) -> Column:
    """The k-permutation minhash signature as ONE ``array<long>`` column,
    computed scan-side in a single fold over the shingle-hash array.

    One pass: ``acc[j] = min(acc[j], (a_j*h + b_j) mod P)`` via
    ``aggregate`` + ``zip_with`` — the shingle/char-fold pipeline is
    evaluated once per row instead of once per permutation (k× cheaper),
    and keeping the signature as a single column stops Catalyst's project
    collapsing from ever duplicating the fold."""
    hs = shingle_hashes_fast(text)
    perms = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in MINHASH_PERMS
        ]
    )
    init = F.array_repeat(F.lit(HASH_MOD).cast("long"), N_HASHES)
    return F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc, perms, lambda m, p: F.least(m, (p["a"] * h + p["b"]) % HASH_MOD)
        ),
    )


def _shingle_hash_stream(texts: list, n: int):
    """Worker-side numpy core shared by the Arrow kernels: the flat
    positional shingle-hash sequence (int64 mod-P, bit-identical to
    ``shingle_hashes_fast``) plus per-doc segment (starts, counts).
    Docs with < n words contribute empty segments.  See
    ``minhash_sig_table`` for the overflow audit and the UTF-16/BMP
    caveat."""
    import numpy as np  # noqa: PLC0415 — worker-side import

    P = HASH_MOD
    doc_words = [t.split(" ") for t in texts]
    nwords = np.array([len(ws) for ws in doc_words], dtype=np.int64)
    wlens = np.array([len(w) for ws in doc_words for w in ws], dtype=np.int64)
    flat = "".join(w for ws in doc_words for w in ws)
    cp = (
        np.frombuffer(flat.encode("utf-32-le"), dtype="<u4").astype(np.int64)
        if flat
        else np.zeros(0, dtype=np.int64)
    )
    max_len = int(wlens.max()) if len(wlens) else 0
    pow31 = np.ones(max_len + 1, dtype=np.int64)
    for k in range(1, max_len + 1):
        pow31[k] = (pow31[k - 1] * 31) % P
    # per-word rolling hash as a power-sum over its chars; empty words
    # (consecutive/leading/trailing spaces) hash to 0 and occupy no
    # chars, so reducing only over NONEMPTY segments still spans each
    # word's exact char range (and keeps every reduceat index < len,
    # which a trailing empty word violates)
    starts = np.cumsum(wlens) - wlens
    w_h = np.zeros(len(wlens), dtype=np.int64)
    nonempty = wlens > 0
    if cp.size and nonempty.any():
        pos = np.arange(len(cp), dtype=np.int64) - np.repeat(starts, wlens)
        exp = np.repeat(wlens, wlens) - 1 - pos
        prod = (cp * pow31[exp]) % P
        w_h[nonempty] = np.add.reduceat(prod, starts[nonempty]) % P
    w_p = pow31[wlens]
    # shingle start indices into the flat word arrays
    sh_counts = np.maximum(nwords - (n - 1), 0)
    sh_doc_starts = np.cumsum(sh_counts) - sh_counts
    word_doc_starts = np.cumsum(nwords) - nwords
    total_sh = int(sh_counts.sum())
    sh = (
        np.arange(total_sh, dtype=np.int64)
        - np.repeat(sh_doc_starts, sh_counts)
        + np.repeat(word_doc_starts, sh_counts)
    )
    h = w_h[sh]
    for j in range(1, n):
        h = (h * 31 + 32) % P  # ' ' separator (code 32)
        h = (h * w_p[sh + j] + w_h[sh + j]) % P
    return h, sh_doc_starts, sh_counts


def shingle_hash_table(
    df: DataFrame,
    keep: tuple[str, ...],
    text_col: str = "text",
    n: int = N_SHINGLE,
) -> DataFrame:
    """(keep..., hs: array<long>) — the POSITIONAL shingle-hash sequence
    per row (empty array below n words), via the Arrow kernel;
    bit-identical to ``shingle_hashes_fast`` (parity pinned in
    tests/test_llm_ops.py).  The at-scale form for every consumer that
    explodes or windows shingle hashes (containment postings, winnowing,
    Bloom probes): the interpreted per-char HOF fold is the corpus-scan
    cost the kernel removes."""
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            *(in_fields[c] for c in keep),
            T.StructField("hs", T.ArrayType(T.LongType(), False), False),
        ]
    )

    def kernel(batches):
        import numpy as np  # noqa: PLC0415 — worker-side import
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            h, sh_starts, sh_counts = _shingle_hash_stream(
                list(pdf[text_col]), n
            )
            out = pdf[list(keep)].copy()
            out["hs"] = np.split(h, (sh_starts + sh_counts)[:-1])
            yield out

    return df.select(*keep, text_col).mapInPandas(kernel, out_schema)


def word_shingle_table(
    df: DataFrame,
    keep: tuple[str, ...],
    text_col: str = "text",
    n: int = N_SHINGLE,
) -> DataFrame:
    """(keep..., shingles: array<string>) — DISTINCT n-word shingles in
    first-occurrence order (empty below n words), replicating
    ``word_shingles`` exactly but via plain Python string slicing in an
    Arrow batch instead of an interpreted per-(shingle, word) HOF
    concat (parity pinned in tests/test_llm_ops.py).  For consumers
    that join on shingle STRINGS (exact Jaccard, decontamination)."""
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            *(in_fields[c] for c in keep),
            T.StructField(
                "shingles", T.ArrayType(T.StringType(), False), False
            ),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            col = []
            for t in pdf[text_col]:
                ws = t.split(" ")
                if len(ws) < n:
                    col.append([])
                else:
                    col.append(
                        list(
                            dict.fromkeys(
                                " ".join(ws[i : i + n])
                                for i in range(len(ws) - n + 1)
                            )
                        )
                    )
            out = pdf[list(keep)].copy()
            out["shingles"] = col
            yield out

    return df.select(*keep, text_col).mapInPandas(kernel, out_schema)


def minhash_sig_table(
    eligible: DataFrame, keep: tuple[str, ...], text_col: str = "text"
) -> DataFrame:
    """(keep..., sig: array<long>) via an Arrow-batched exact-integer
    kernel — BIT-IDENTICAL to the Catalyst fold spec
    (``minhash_signature_array``; parity pinned in
    tests/test_llm_ops.py::test_minhash_kernel_matches_fold).

    Why this exists: the fold pipeline (char rolling hash → rolling
    shingle composition → 16-permutation min) is interpreted
    higher-order expressions at ~0.6 µs per element-op — the dominant
    cost of every minhash consumer and, at 100 TB of text, THE corpus
    scan.  The kernel does the identical arithmetic vectorized: all of
    it is int64 mod-P ring math, so unlike the float LSH case there is
    no rounding-order concern at all — h(word) folds to
    Σ cᵢ·31^(L−1−i) (mod P) (the mod-at-each-step fold and the
    power-sum are the same residue), shingle composition and the
    permutation min are elementwise, and segment reductions use
    ``np.add.reduceat``/``minimum.reduceat`` over word/doc boundaries.
    Overflow audit: codepoint (<2²¹)·pow31 (<2³¹) < 2⁵², reduced mod P
    before the ≤L-term sum (<L·2³¹); a·h+b < 2⁶²; all inside int64.

    Caveat (documented, corpus-checked): the fold's ``split(s, '')``
    walks UTF-16 code units while the kernel decodes codepoints — they
    agree on the Basic Multilingual Plane (the test corpus is ASCII;
    the parity test would catch a divergence on real data).

    ``eligible`` must already be filtered to ≥ N_SHINGLE words."""
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in eligible.schema.fields}
    out_schema = T.StructType(
        [
            *(in_fields[c] for c in keep),
            T.StructField("sig", T.ArrayType(T.LongType(), False), False),
        ]
    )
    perms_a = [a for a, _ in MINHASH_PERMS]
    perms_b = [b for _, b in MINHASH_PERMS]
    n = N_SHINGLE

    def kernel(batches):
        import numpy as np  # noqa: PLC0415 — worker-side import
        import pandas as pd  # noqa: PLC0415

        P = HASH_MOD
        for pdf in batches:
            if not len(pdf):
                continue
            h, sh_doc_starts, _ = _shingle_hash_stream(list(pdf[text_col]), n)
            # every eligible doc has >= 1 shingle, so reduceat segments
            # are non-empty and min(init=P, values) == min(values)
            sig = np.empty((len(pdf), len(perms_a)), dtype=np.int64)
            for j, (a, b) in enumerate(zip(perms_a, perms_b)):
                sig[:, j] = np.minimum.reduceat((a * h + b) % P, sh_doc_starts)
            out = pdf[list(keep)].copy()
            out["sig"] = list(sig)
            yield out

    return eligible.select(*keep, text_col).mapInPandas(kernel, out_schema)


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<long>) for every doc with ≥ N_SHINGLE words —
    the same population the oracle's shingles CTE covers (short docs have
    no shingles, hence no signature).  Computed by the Arrow kernel
    (``minhash_sig_table``); ``minhash_signatures_fold`` is the Catalyst
    spec it must match bit-for-bit."""
    eligible = docs.filter(F.size(F.split(F.col(text_col), " ")) >= N_SHINGLE)
    return minhash_sig_table(eligible, ("doc_id",), text_col)


def minhash_signatures_fold(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Catalyst-fold formulation — the semantic spec for the kernel
    (slow: interpreted HOFs; not used by any registered query)."""
    eligible = docs.filter(F.size(F.split(F.col(text_col), " ")) >= N_SHINGLE)
    return eligible.select(
        "doc_id", minhash_signature_array(F.col(text_col)).alias("sig")
    )


def band_keys_col(sig: Column | None = None) -> Column:
    """array<string> of the N_BANDS LSH band keys of a signature column —
    the SINGLE definition of the banding layout; every consumer
    (symmetric pairs, the incremental probe, the DuckDB _BANDS_SQL
    mirror) must band identically or candidates silently diverge."""
    sig = F.col("sig") if sig is None else sig
    rows_per_band = N_HASHES // N_BANDS
    return F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    sig[b * rows_per_band + r].cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(N_BANDS)
        ]
    )


def sig_agreement(sig_a: Column, sig_b: Column) -> Column:
    """Count of agreeing minhash positions (the est-Jaccard numerator) —
    shared by the symmetric and incremental verify stages."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signature and self-join per band: docs agreeing on all rows
    of any band become candidates.  One scan pass (posexplode of the band
    keys), shuffling only (band, key, doc_id) pairs."""
    bands = sig.select(
        "doc_id", F.posexplode(band_keys_col()).alias("band", "bkey")
    )
    a, b_ = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Candidate pairs + estimated Jaccard (fraction of agreeing minhashes),
    filtered to ``est_jaccard >= threshold``.

    The signature table is persisted: banding, the band self-join, and the
    two verify joins all reuse one materialization instead of recomputing
    the char-fold scan pipeline per branch.  At 100 TB the same shape
    holds — signatures (17 longs/doc) are a ~1000× reduction of the corpus
    and get persisted/written once, everything downstream touches only
    them."""
    result, caches = minhash_lsh_pairs_plan(docs, threshold)
    return materialized(result, *caches)


def minhash_lsh_pairs_plan(
    docs: DataFrame, threshold: float = 0.5
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this; the public
    fn materializes and releases the signature cache."""
    sig = minhash_signatures(ensure_parallelism(docs)).persist()
    cand = lsh_candidate_pairs(sig)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = sig_agreement(F.col("sig_a"), F.col("sig_b"))
    result = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / N_HASHES).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return result, (sig,)


def exact_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard for every pair sharing ≥1 shingle.

    The exploded shingle table is persisted: it feeds three consumers
    (both self-join sides and the per-doc size agg), and without the
    persist each one re-runs the scan + shingle expression — the
    shingle construction, not the tiny (doc_id, shingle) shuffle, is
    the dominant cost of this operator."""
    result, caches = exact_jaccard_pairs_plan(docs, threshold)
    return materialized(result, *caches)


def exact_jaccard_pairs_plan(
    docs: DataFrame, threshold: float = 0.5
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this; the public
    fn materializes and releases the shingle cache."""
    sh = (
        word_shingle_table(docs, ("doc_id",))
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .persist()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    result = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        # cheap double PREFILTER first, derived from the exact integer
        # cut itself (NOT from `threshold`, which may sit off the 1e-6
        # grid): the exact cut is jac_micro >= cut with jac_micro =
        # HALF_UP(ratio*1e6), so a ratio survives iff ratio >=
        # (cut - 0.5)/1e6.  Compare against that bound minus a 1e-7
        # guard (double error ~1e-16 << guard) — lossless for ANY
        # threshold, and it keeps the DECIMAL micro rounding off the
        # full candidate-pair set — decimal ops run on survivors only
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= (round(threshold * 1_000_000) - 0.5) / 1e6 - 1e-7
        )
        .select(
            "doc_a",
            "doc_b",
            # exact integer micro rounding AND an exact-integer threshold
            # (functions.numeric): jaccard is an exact int ratio, so both
            # the 6-dp round and the >= cut are midpoint-unambiguous and
            # identical in the oracle
            ratio_micro(
                F.col("inter"), F.col("na") + F.col("nb") - F.col("inter")
            ).alias("jac_micro"),
        )
        .filter(F.col("jac_micro") >= round(threshold * 1_000_000))
        .select(
            "doc_a",
            "doc_b",
            (F.col("jac_micro").cast("double") / 1000000).alias("jaccard"),
        )
    )
    return result, (sh,)


def simhash_col(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Scan-side simhash: per bit, sign of Σ±1 over distinct word hashes.

    Single pass: one fold accumulates all ``bits`` signed counts at once
    (the word-hash array is evaluated once, not once per bit), then a
    second fold packs sign bits — the hash pipeline appears exactly once
    in the expression tree."""
    hs = F.transform(F.array_distinct(F.split(text, " ")), portable_hash)
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.array(
            *[
                acc[i] + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)
                for i in range(bits)
            ]
        ),
    )
    # pow(2,i) is exact in double for i < 53; fold keeps `counts` single-use
    weights = F.zip_with(
        counts,
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda c, i: F.when(
            c > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(weights, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All-pairs hamming-≤k join (test scale).  At 100 TB: band the bits
    into (max_hamming+1) segments — any near-pair matches exactly on ≥1
    segment (pigeonhole) — and only join within segments."""
    sig = (
        ensure_parallelism(docs)
        .select("doc_id", simhash_col(F.col("text")).alias("simhash"))
        .persist()
    )
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    result = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return materialized(result, sig)


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------


def simhash_banded_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-≤k simhash pairs WITHOUT the all-pairs product — the 100 TB
    form of ``simhash_pairs``.

    Pigeonhole: split the ``SIMHASH_BITS`` signature into ``max_hamming+1``
    contiguous segments; two signatures within hamming ``max_hamming``
    must agree exactly on ≥1 segment.  Candidates come from equality
    joins on (segment_idx, segment_value) — shuffling only small keys —
    then the exact hamming verify runs per candidate.  Result is
    identical to the quadratic form (tests assert it)."""
    result, caches = simhash_banded_pairs_plan(docs, max_hamming)
    return materialized(result, *caches)


def simhash_banded_pairs_plan(
    docs: DataFrame, max_hamming: int = 3
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this; the public
    fn materializes and releases the signature cache."""
    sig = ensure_parallelism(docs).select(
        "doc_id", simhash_col(F.col("text")).alias("simhash")
    )
    return banded_hamming_pairs_plan(
        sig, SIMHASH_BITS, max_hamming, sig_col="simhash"
    )


def banded_hamming_pairs_plan(
    sig: DataFrame, bits: int, max_hamming: int, sig_col: str = "sig"
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Generic pigeonhole hamming-≤k pair join over ANY (doc_id, <sig>)
    signature table (simhash, perceptual aHash, ...): split the ``bits``
    signature into ``max_hamming+1`` contiguous segments — signatures
    within hamming ``max_hamming`` must agree exactly on ≥1 segment —
    and join only on (segment_idx, segment_value) equality keys, then
    hamming-verify each candidate.  Identical output to the O(n²) form;
    the shuffle carries (doc_id, 2 small ints) per segment, never the
    signature-table product."""
    n_seg = max_hamming + 1
    seg_bits = [bits // n_seg + (1 if i < bits % n_seg else 0)
                for i in range(n_seg)]
    offsets = [sum(seg_bits[:i]) for i in range(n_seg)]
    sig = sig.persist()
    segs = sig.select(
        "doc_id",
        sig_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(sig_col), offsets[i]).bitwiseAND(
                        F.lit((1 << seg_bits[i]) - 1)
                    )
                    for i in range(n_seg)
                ]
            )
        ).alias("seg_idx", "seg_val"),
    )
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col(f"a.{sig_col}").alias("sh_a"),
            F.col(f"b.{sig_col}").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    result = cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
    return result, (sig,)


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold double dot product — identical op order to the
    oracle's list_reduce, so results are bit-exact."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for the first ``n_queries``
    vectors.  One broadcast of the (tiny) query set; candidates stream
    scan-side — at 100 TB this is the per-partition scoring baseline that
    IVF/LSH variants are measured against."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("qn"),
    )
    # norms are folded once per row BELOW the join (not once per pair)
    c = ensure_parallelism(emb).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("cn"),
    )
    dot = _dot(F.col("qe"), F.col("ce"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a, b) with cosine ≥ threshold.

    Norms are precomputed per vector (one fold each, persisted) so the
    pair stage does exactly one dot-fold per pair.  Test-scale uses the
    all-pairs product; at 100 TB the identical verify stage runs AFTER
    LSH/IVF candidate pruning (see ``ann_lsh_topk``/``ann_ivf_topk``) so
    the quadratic product never materializes."""
    v = (
        ensure_parallelism(emb)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .persist()
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    result = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return materialized(result, v)


N_TABLES = 8     # OR-amplification: candidate if bucket-equal in ANY table
PLANES_PER_TABLE = 4
MAX_LSH_TABLES = 16  # embedding_near_dup_lsh's table budget

_plane_rng = random.Random(1337)
# Sized for MAX_LSH_TABLES so every table's planes are distinct — the RNG
# prefix is stable, so the first N_TABLES tables (ann_lsh_topk) are
# byte-identical to when the list was 32 long; previously tables 8..15
# wrapped onto 0..7 (identical buckets: 2x fan-out, zero recall gain).
PLANE_PERMS: list[tuple[int, int]] = [
    (_plane_rng.randrange(1, HASH_MOD), _plane_rng.randrange(0, HASH_MOD))
    for _ in range(MAX_LSH_TABLES * PLANES_PER_TABLE)
]


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_tables: int = MAX_LSH_TABLES,
    n_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs WITHOUT the all-pairs product — the
    100 TB form of ``embedding_near_dup_pairs``.

    Candidates come from a self-join on (table, bucket) keys of
    ``n_tables`` random-hyperplane LSH tables (OR-amplification), then
    the EXACT cosine verify runs per deduped candidate — so precision is
    exact (output ⊆ the quadratic form's output with identical cosines)
    and recall is the LSH collision probability: a pair at angle θ
    collides per-table with (1−θ/π)^n_planes and is missed with
    (1−(1−θ/π)^n_planes)^n_tables.  At the near-dup regime this engine
    targets (cos ≥ 0.9 ⇒ θ ≤ 26°) the miss rate is < 1e-3 at the
    defaults; this synthetic corpus's borderline 0.4-cosine pairs sit
    near the recall cliff, which tests measure explicitly.  Shuffle cost:
    ONLY (vec_id, table, bucket) triples explode and self-join — vectors
    never ride the n_tables fan-out, and the candidate dedup is a
    distinct over two longs, not over embedding arrays; the vectors join
    back exactly once per side after dedup.  The pair product only ever
    materializes within buckets (n/2^n_planes expected occupancy),
    never globally."""
    result, caches = embedding_near_dup_lsh_plan(emb, threshold, n_tables, n_planes)
    return materialized(result, *caches)


def embedding_near_dup_lsh_plan(
    emb: DataFrame,
    threshold: float = 0.4,
    n_tables: int = MAX_LSH_TABLES,
    n_planes: int = 4,
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this; the public
    fn materializes and releases the vector cache."""
    v = (
        ensure_parallelism(emb)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .persist()
    )
    keys = lsh_keys(v, n_tables, n_planes=n_planes)
    a = keys.select(F.col("vec_id").alias("vec_a"), "tbl", "bkt")
    b = keys.select(F.col("vec_id").alias("vec_b"), "tbl", "bkt")
    cand = (
        a.join(b, ["tbl", "bkt"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    pa = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    pb = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    result = (
        cand.join(pa, "vec_a")
        .join(pb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return result, (v,)


def _plane_component(j: int, d: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in (-0.5, 0.5):
    ((a_j·(d+1)+b_j) mod P)/P − 0.5 — reproducible in any engine.

    Indexes PLANE_PERMS directly (IndexError past MAX_LSH_TABLES): a
    silent modulo wrap here is exactly how tables 8-15 once aliased onto
    0-7 — doubled fan-out, zero recall gain."""
    a, b = PLANE_PERMS[j]
    term = (F.lit(a).cast("long") * (d + 1).cast("long") + F.lit(b)) % HASH_MOD
    return term / F.lit(float(HASH_MOD)) - 0.5


def lsh_keys(
    df: DataFrame,
    n_tables: int,
    extra_cols: tuple[str, ...] = (),
    n_planes: int = PLANES_PER_TABLE,
) -> DataFrame:
    """(vec_id, [extra_cols...,] tbl, bkt) key rows for ``n_tables`` LSH
    tables — the shared ids-only fan-out every LSH consumer builds
    (near-dup dedup, ANN probe, bitext mining).  One definition so a
    bucket-derivation fix (e.g. the PLANE_PERMS aliasing bug
    ``_plane_component`` warns about) lands everywhere at once.
    ``extra_cols`` ride the fan-out (e.g. lang for bitext); vectors
    never do.

    Computed by an Arrow-batched numpy kernel, BIT-IDENTICAL to the
    Catalyst-fold formulation (``lsh_keys_fold``, kept as the parity
    reference): the per-plane projection is an index-ordered float64
    accumulation (``np.add.accumulate`` row-wise == the fold's
    sequential ``acc + x``), and the plane components are the same
    int64-mod arithmetic — so the DuckDB oracles that unroll the fold
    still hash-match.  The fold version costs ~0.6 µs per element-op
    (higher-order Catalyst expressions are interpreted, not codegen'd):
    n_tables·n_planes·dim ops/row made lsh_keys the dominant cost of
    every LSH consumer (5.2 s of dedup_embedding_cosine's 7.3 s at
    sf0.1); the vectorized kernel does the identical FLOPs in C at
    ~100× the throughput, which at 100 TB is the difference between the
    signature scan being a footnote and being the bottleneck."""
    from pyspark.sql import types as T

    extra = list(extra_cols)
    need = n_tables * n_planes
    if need > len(PLANE_PERMS):  # same explicit failure as _plane_component
        raise IndexError(
            f"{n_tables} tables × {n_planes} planes exceeds PLANE_PERMS "
            f"({len(PLANE_PERMS)}) — raise MAX_LSH_TABLES, don't wrap"
        )
    perms = PLANE_PERMS[:need]
    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            in_fields["vec_id"],
            *(in_fields[c] for c in extra),
            T.StructField("tbl", T.IntegerType(), False),
            T.StructField("bkt", T.IntegerType(), False),
        ]
    )

    def kernel(batches):
        import numpy as np  # noqa: PLC0415 — worker-side import
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = np.arange(E.shape[1], dtype=np.int64)
            frames = []
            for t in range(n_tables):
                bkt = np.zeros(len(pdf), dtype=np.int64)
                for p in range(n_planes):
                    a, b = perms[t * n_planes + p]
                    comp = (
                        ((a * (d + 1) + b) % HASH_MOD).astype(np.float64)
                        / float(HASH_MOD)
                        - 0.5
                    )
                    s = np.add.accumulate(E * comp, axis=1)[:, -1]
                    bkt += np.where(s > 0, 1 << p, 0)
                f = pdf[["vec_id", *extra]].copy()
                f["tbl"] = np.int32(t)
                f["bkt"] = bkt.astype(np.int32)
                frames.append(f)
            yield pd.concat(frames, ignore_index=True)

    return df.select("vec_id", *extra, "embedding").mapInPandas(kernel, out_schema)


def lsh_keys_fold(
    df: DataFrame,
    n_tables: int,
    extra_cols: tuple[str, ...] = (),
    n_planes: int = PLANES_PER_TABLE,
) -> DataFrame:
    """Catalyst-fold formulation of ``lsh_keys`` — the semantic spec the
    Arrow kernel must match bit-for-bit (pinned in
    tests/test_llm_ops.py::test_lsh_keys_kernel_matches_fold).  Slow
    (interpreted HOFs); not used by any registered query."""
    extra = list(extra_cols)
    return df.select(
        "vec_id",
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket_col(F.col("embedding"), t, n_planes).alias(
                            "bkt"
                        ),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(
        "vec_id", *extra, F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt")
    )


def lsh_bucket_col(vec: Column, table: int, n_planes: int = PLANES_PER_TABLE) -> Column:
    """Sign-bit bucket id for one LSH table, computed scan-side."""

    def _proj_term(j: int):
        return lambda x, d: x.cast("double") * _plane_component(j, d)

    out = F.lit(0)
    for p in range(n_planes):
        j = table * n_planes + p
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), _proj_term(j)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return out


def ann_lsh_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    A candidate is scored iff it shares a bucket with the query in ANY of
    the ``n_tables`` tables (OR-amplification) — single-table sign-LSH has
    unusably low recall when neighbors sit at cos≈0.3-0.4, as this
    dataset's do.  Tuning rule: more planes/table ⇒ fewer candidates &
    lower recall; more tables ⇒ the reverse.  At scale: each vector is
    exploded into its n_tables (table, bucket) keys once and repartitioned
    by key; a query probes n_tables co-located partitions instead of the
    full scan — the all-pairs cross join never happens.
    """
    result, caches = ann_lsh_topk_plan(emb, n_queries, k, n_tables)
    return materialized(result, *caches)


def ann_lsh_topk_plan(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_tables: int = N_TABLES,
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this; the public
    fn materializes and releases the base-vector cache."""
    base = ensure_parallelism(emb).select("vec_id", "embedding").persist()
    table_keys = lsh_keys(base, n_tables)
    # ids-only probe: vectors never ride the n_tables fan-out, the
    # candidate dedup is a distinct over two longs, and each side's
    # vector joins back once after dedup (query side broadcast).
    qk = table_keys.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), "tbl", "bkt"
    )
    cand = (
        F.broadcast(qk)
        .join(table_keys.select(F.col("vec_id").alias("cid"), "tbl", "bkt"), ["tbl", "bkt"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    qv = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cv = base.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    dot = _dot(F.col("qe"), F.col("ce"))
    qn = F.sqrt(_dot(F.col("qe"), F.col("qe")))
    cn = F.sqrt(_dot(F.col("ce"), F.col("ce")))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select("qid", "cid", F.round(dot / (qn * cn), 6).alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    result = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    return result, (base,)


MULTIPROBE_TABLES = 4  # half of ann_lsh_topk's 8 — probes buy the recall back


def ann_multiprobe_lsh_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_tables: int = MULTIPROBE_TABLES,
    n_planes: int = PLANES_PER_TABLE,
) -> DataFrame:
    """Multi-probe LSH (Lv et al. 2007): instead of building more tables
    for recall, each query ALSO probes the ``n_planes`` buckets one
    sign-flip away from its own (the nearest-boundary perturbations).
    Same hyperplanes as ``ann_lsh_topk`` but HALF the tables: the corpus
    fan-out — the dominant index cost at 10⁹ vectors (rows × tables keys
    shuffled and stored) — halves, while the probe set only grows on the
    bounded query side.  This is the memory/recall dial production LSH
    actually ships.  Deterministic end to end (integer-ring hyperplanes,
    XOR probes, fold-ordered cosine rerank), so fully hash-oracled."""
    result, caches = ann_multiprobe_lsh_topk_plan(
        emb, n_queries, k, n_tables, n_planes
    )
    return materialized(result, *caches)


def ann_multiprobe_lsh_topk_plan(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_tables: int = MULTIPROBE_TABLES,
    n_planes: int = PLANES_PER_TABLE,
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this."""
    base = ensure_parallelism(emb).select("vec_id", "embedding").persist()
    table_keys = lsh_keys(base, n_tables)
    # probe fan-out rides the BOUNDED query side only: base bucket plus
    # one single-bit flip per plane, (1 + n_planes) keys per (query, table)
    qk = table_keys.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        "tbl",
        F.explode(
            F.array(
                F.col("bkt"),
                *[
                    F.col("bkt").bitwiseXOR(F.lit(1 << p))
                    for p in range(n_planes)
                ],
            )
        ).alias("bkt"),
    )
    cand = (
        F.broadcast(qk)
        .join(
            table_keys.select(F.col("vec_id").alias("cid"), "tbl", "bkt"),
            ["tbl", "bkt"],
        )
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    qv = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cv = base.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    dot = _dot(F.col("qe"), F.col("ce"))
    qn = F.sqrt(_dot(F.col("qe"), F.col("qe")))
    cn = F.sqrt(_dot(F.col("ce"), F.col("ce")))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select("qid", "cid", F.round(dot / (qn * cn), 6).alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    result = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    return result, (base,)


N_CELLS = 16
N_PROBE = 4


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Every vector is assigned to its nearest of ``n_cells`` centroids; a
    query scores only vectors in its ``n_probe`` nearest cells.  The
    centroids here are the first ``n_cells`` vectors (deterministic --
    production IVF would k-means them; the partition/probe mechanics are
    identical).  At 100 TB the assignment table is written partitioned BY
    cell, so a probe reads n_probe/n_cells of the data with partition
    pruning instead of a full scan -- the classic IVF speed/recall dial.
    """
    result, caches = ann_ivf_topk_plan(emb, n_queries, k, n_cells, n_probe)
    return materialized(result, *caches)


def ann_ivf_topk_plan(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — plan gates inspect this; the public
    fn materializes and releases the cell-ranked cache."""
    cent = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec")
    )
    base = ensure_parallelism(emb).select("vec_id", "embedding")
    scored_cells = base.join(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "cell",
        (
            _dot(F.col("embedding"), F.col("cvec"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))
            )
        ).alias("ccos"),
    )
    from pyspark.sql import Window

    wc = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell").asc())
    ranked = scored_cells.withColumn("crnk", F.row_number().over(wc)).persist()
    assign = ranked.filter(F.col("crnk") == 1).select("vec_id", "embedding", "cell")
    probes = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("crnk") <= n_probe)
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "cell")
    cand = (
        F.broadcast(probes)
        .join(assign, "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "qe", F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    )
    dot = _dot(F.col("qe"), F.col("ce"))
    qn = F.sqrt(_dot(F.col("qe"), F.col("qe")))
    cn = F.sqrt(_dot(F.col("ce"), F.col("ce")))
    scored = cand.select("qid", "cid", F.round(dot / (qn * cn), 6).alias("cosine"))
    wq = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    result = scored.withColumn("rnk", F.row_number().over(wq)).filter(
        F.col("rnk") <= k
    )
    return result, (ranked,)


def cosine_topk_np(
    emb: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k, vectorized: the query block is collected
    (tiny) and broadcast as a normalized numpy matrix; candidates stream
    through ``mapInPandas`` in Arrow batches and are scored with one
    BLAS matmul per batch.  Each partition emits only its local top-k per
    query, so the final exchange carries O(n_queries * k * partitions)
    rows — this is the 100 TB exact-scoring shape (and the scoring kernel
    IVF/LSH variants reuse after pruning).

    Results match the fold-based ``cosine_topk`` (same neighbors; cosine
    differs only by float summation order, far below ranking precision).
    Ranking uses the SAME tie discipline as the fold form — 6-dp-rounded
    cosine, then cid ascending.  The rounding that decides ties is
    Spark's own ``F.round`` (repr-based HALF_UP) applied in the global
    window stage — NOT numpy's round-half-to-even, whose half-boundary
    behavior differs and would let the np form pick a different
    k-boundary neighbor.  To keep the partial correct under that
    discipline without re-implementing JVM rounding in Python, each
    partition emits a small SUPERSET: its raw top-k per query plus every
    candidate within 2e-6 of the kth raw score (rounding is monotone, so
    nothing below that margin can enter the rounded top-k); the global
    window then ranks by the Spark-rounded value, resolving ties
    identically to the fold form instead of by Arrow batch order.
    """
    import numpy as np
    import pandas as pd  # noqa: PLC0415 — worker-side

    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Q = np.array([r.embedding for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    b = emb.sparkSession.sparkContext.broadcast((qids, Qn))

    def op(batches):
        bqids, bQn = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = bQn @ Cn.T  # (n_queries, batch)
            out_q, out_c, out_s = [], [], []
            for qi, qid in enumerate(bqids):
                row = S[qi]
                mask = cids != qid
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                # superset emission: raw top-k plus the 2e-6 tie margin
                # around the kth raw score — any candidate whose Spark-
                # rounded (HALF_UP, 6 dp) value could tie into the top-k
                # survives to the global stage, which owns tie-breaking
                if len(idx) > k:
                    kth = np.partition(row[idx], -k)[-k]
                    keep = idx[row[idx] >= kth - 2e-6]
                else:
                    keep = idx
                out_q.extend([qid] * len(keep))
                out_c.extend(cids[keep])
                out_s.extend(row[keep])
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out_q, dtype="int64"),
                    "cid": pd.Series(out_c, dtype="int64"),
                    "cosine": pd.Series(out_s, dtype="float64"),
                }
            )

    partial = ensure_parallelism(emb.select("vec_id", "embedding")).mapInPandas(
        op, "qid long, cid long, cosine double"
    )
    from pyspark.sql import Window

    rounded = partial.withColumn("cosine", F.round(F.col("cosine"), 6))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        rounded.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over an undirected pair graph by iterative
    min-label propagation: every vertex repeatedly adopts the smallest
    label among itself and its neighbors, converging in O(component
    diameter) rounds.  Near-dup components are tiny and dense, so this
    terminates in 2-4 rounds in practice at any corpus size; each round
    is one join + one aggregation on (vertex, label) pairs only.

    Input: (doc_a, doc_b) edges.  Output: (doc_id, component) where
    component is the minimum doc_id reachable.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    # max_iters bounds the number of label-CHANGING rounds; one extra
    # round is allowed purely to observe changed == 0, so a component of
    # diameter exactly max_iters converges instead of being rejected
    # (its last change lands in round max_iters and the verification
    # round confirms the fixpoint).
    changed = 0
    for _ in range(max_iters + 1):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # localCheckpoint truncates lineage each round (the logical plan
        # would otherwise deepen linearly with iterations) and lets the
        # superseded round's cache be dropped immediately — storage stays
        # O(1) rounds, not O(iters).
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # still changing after max_iters changing rounds + the verify
        # round: a component with diameter > max_iters would return
        # WRONG (unconverged) labels — split clusters, silently kept
        # duplicates, and an oracle mismatch.  Fail loudly instead;
        # callers with genuinely long chains raise max_iters.
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "label-changing iterations (a component's diameter exceeds "
            "the bound); raise max_iters"
        )
    return labels.select("doc_id", "component")


def dedup_canonical(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Full dedup assignment: MinHash+LSH near-dup pairs → connected
    components → each clustered doc mapped to its canonical (minimum)
    doc_id.  Docs with no near-dup are their own canonical and are
    omitted here (identity rows add nothing and at 100 TB would dominate
    the output)."""
    pairs = minhash_lsh_pairs(docs, threshold).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        "doc_id", F.col("component").alias("canonical_id")
    )


def minhash_incremental_survivors(
    docs: DataFrame, new_pred: Column, threshold: float = 0.5
) -> DataFrame:
    """Incremental-ingest dedup: documents of a NEW batch (``new_pred``)
    that are NOT near-dups of the existing corpus — the shape a
    continuously-ingesting pipeline runs per batch, where re-deduping
    the whole corpus would be quadratic over time.

    The probe is ASYMMETRIC: only the new batch's (band, bkey) keys join
    against the corpus index — corpus×corpus pairs are never generated
    (the symmetric form wastes the dominant share of candidate work on
    already-deduped history).  At 100 TB the corpus side IS the
    persisted band index (written once, bucketed by (band, bkey)); each
    incremental batch shuffles only its own keys plus matching corpus
    postings.  Verification is the same est-Jaccard signature compare as
    ``minhash_lsh_pairs``, so survivors match the symmetric pipeline's
    answer exactly (pinned by the registered query's oracle).

    Returns surviving new-batch (doc_id, lang); new docs too short to
    carry a signature survive trivially (no shingles ⇒ no near-dup)."""
    from ..caching import materialized

    result, caches = minhash_incremental_survivors_plan(docs, new_pred, threshold)
    return materialized(result, *caches)


def minhash_incremental_survivors_plan(
    docs: DataFrame, new_pred: Column, threshold: float = 0.5
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Lazy (result, caches) pair — the plan gate inspects this; the
    public fn materializes and releases the signature cache."""
    base = ensure_parallelism(docs)
    eligible = base.filter(
        F.size(F.split(F.col("text"), " ")) >= N_SHINGLE
    ).withColumn("is_new", new_pred)
    sig = minhash_sig_table(eligible, ("doc_id", "is_new")).persist()
    bands = sig.select(
        "doc_id", "is_new", F.posexplode(band_keys_col()).alias("band", "bkey")
    )
    probe = bands.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band", "bkey"
    )
    index = bands.filter(~F.col("is_new")).select(
        F.col("doc_id").alias("old_id"), "band", "bkey"
    )
    cand = probe.join(index, ["band", "bkey"]).select("new_id", "old_id").distinct()
    sa = sig.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_b"))
    matches = sig_agreement(F.col("sig_a"), F.col("sig_b"))
    dup_ids = (
        cand.join(sa, "new_id")
        .join(sb, "old_id")
        .filter((matches.cast("double") / N_HASHES) >= threshold)
        .select("new_id")
        .distinct()
    )
    result = base.filter(new_pred).join(
        dup_ids, F.col("doc_id") == F.col("new_id"), "left_anti"
    ).select("doc_id", "lang")
    return result, (sig,)
