"""Corpus-preparation operators beyond the round-3 LLM-pipeline family:
tokenizer training (distributed BPE pair statistics + merge learning),
per-source boilerplate detection, random-projection dimensionality
reduction, and embedding label propagation.

Like the rest of the north-star family these have no reference citation
(the reference — gmallrealtime/src/main/scala — is an e-commerce
streaming warehouse); they are the operations a 100 TB training-data
pipeline needs, expressed Spark-first.  Every oracle is generated from
the same frozen integer constants the Spark operators use, so DuckDB
reproduces each value bit-for-bit.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.numeric import ratio_micro, ratio_micro_sql
from ..functions.similarity import N_SHINGLE, _dot, shingle_hashes_fast
from ..sources import load_table
from ..sources.tables import ensure_parallelism
from .registry import register

P = TX.HASH_MOD
CHUNK_WORDS = 10  # pseudo-paragraph width, matches llm_pipeline chunking


# ---------------------------------------------------------------------------
# Per-source boilerplate detection
# ---------------------------------------------------------------------------

_SRC_CHUNKS_CTE = f"""
w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
ch AS (
    SELECT doc_id, source,
           array_to_string(ws[i*{CHUNK_WORDS}+1 : i*{CHUNK_WORDS}+{CHUNK_WORDS}],
                           ' ') AS chunk
    FROM w, unnest(generate_series(0,
        CAST(ceil(len(ws) / {CHUNK_WORDS}.0) AS BIGINT) - 1)) AS t(i)
)
"""


@register(
    "boilerplate_lines",
    oracle=f"""
    WITH {_SRC_CHUNKS_CTE.strip()},
    d AS (SELECT DISTINCT source, chunk, doc_id FROM ch),
    g AS (SELECT source, chunk, count(*) AS n_docs, min(doc_id) AS first_doc
          FROM d GROUP BY source, chunk),
    tot AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source)
    SELECT g.source AS source, g.chunk AS chunk, g.n_docs AS n_docs,
           CAST({ratio_micro_sql("g.n_docs", "tot.n_src")} AS DOUBLE)
               / 1000000 AS doc_frac,
           g.first_doc AS first_doc
    FROM g JOIN tot ON g.source = tot.source
    WHERE g.n_docs >= 2
    """,
    tags=("text", "boilerplate", "training-data"),
)
def boilerplate_lines(spark, sf_dir):
    """Per-source boilerplate detection (the CCNet/WET cleaning step that
    precedes global paragraph dedup): a pseudo-paragraph repeated across
    >=2 distinct documents of the SAME source (nav bars, cookie banners,
    footers) is flagged with its within-source document frequency.

    Scale shape: chunking is scan-side (one posexplode, bodies never
    shuffle); the only corpus-scale exchange is on (source, chunk) with
    map-side distinct partials.  The per-source totals table has one row
    per source — a bounded dim even on web corpora (domains), joined
    without a hint so AQE broadcasts it while it fits and degrades to a
    shuffle join when it does not.
    """
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ws_d = d.select("doc_id", "source", F.split("text", " ").alias("ws"))
    n_chunks = F.ceil(F.size("ws") / CHUNK_WORDS).cast("int")
    chunks = ws_d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice("ws", i * CHUNK_WORDS + 1, CHUNK_WORDS), " "
                ),
            )
        ).alias("chunk"),
    )
    per_chunk = (
        chunks.distinct()
        .groupBy("source", "chunk")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") >= 2)
    )
    totals = d.groupBy("source").agg(F.count("*").alias("n_src"))
    return per_chunk.join(totals, "source").select(
        "source",
        "chunk",
        "n_docs",
        (
            ratio_micro(F.col("n_docs"), F.col("n_src")).cast("double")
            / 1000000
        ).alias("doc_frac"),
        "first_doc",
    )


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training
# ---------------------------------------------------------------------------


@register(
    "bpe_pair_counts",
    oracle="""
    WITH ws AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT w, count(*) AS cnt FROM ws WHERE w != '' GROUP BY w),
    p AS (
        SELECT substr(w, CAST(i AS INT), 1) || substr(w, CAST(i AS INT) + 1, 1)
               AS pair, cnt
        FROM wc, unnest(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM p GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 50
    """,
    tags=("tokenizer", "bpe", "training-data"),
)
def bpe_pair_counts(spark, sf_dir):
    """BPE iteration 0: corpus-weighted adjacent-character-pair counts,
    top 50 by frequency (total order: count desc, pair asc).

    The scale trick is the same one real BPE trainers use: aggregate the
    corpus to WORD COUNTS first (one corpus-scale exchange on the word,
    map-side partials), then explode character pairs over the DISTINCT
    vocabulary only — pair statistics cost O(|vocab| * word_len), not
    O(corpus).  The final top-50 is orderBy+limit, which plans as a
    distributed TakeOrderedAndProject (per-partition partial top-k), not
    a single-reducer sort.
    """
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    w = F.col("w")
    pair_idx = F.when(
        F.length(w) >= 2, F.sequence(F.lit(1), F.length(w) - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    pairs = wc.select(
        F.explode(pair_idx).alias("i"), "w", "cnt"
    ).select(
        F.concat(w.substr(F.col("i"), F.lit(1)), w.substr(F.col("i") + 1, F.lit(1)))
        .alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(50)
    )


N_MERGES = 3  # unrolled merge iterations (each is a vocab-scale pass)


def _merge_fold(tokens: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right BPE merge of adjacent token pair (a, b) via a
    sequential fold: append ``x`` without a separator when the
    accumulator's LAST token is exactly ``a`` and ``x == b``; else append
    ``' ' || x``.  Tokens are single-space-joined, so the ``' ' || a``
    suffix test is an exact token-boundary match, and a token produced by
    a merge in this same pass is never re-merged (matching the reference
    greedy semantics: 'l l l' -> 'll l').  Identical fold order in the
    DuckDB oracle makes the result string bit-identical.
    """
    sep_a = F.concat(F.lit(" "), a)
    return F.ltrim(
        F.aggregate(
            tokens,
            F.lit(""),
            lambda acc, x: F.concat(
                acc,
                F.when(acc.endswith(sep_a) & (x == b), x).otherwise(
                    F.concat(F.lit(" "), x)
                ),
            ),
        )
    )


def _bpe_ctes(n_merges: int) -> str:
    """Shared unrolled DuckDB CTE chain for the BPE training loop: v0 is
    the char-spaced vocabulary; each stage counts token pairs, picks the
    arg-max pair (count desc, pair asc), and folds the merge with
    list_reduce in the same order as the Spark ``F.aggregate``.  Exposes
    b1..b{n} (the learned merges) for downstream consumers."""
    ctes = [
        """
v0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq, cnt
       FROM (SELECT w, count(*) AS cnt
             FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             WHERE w != '' GROUP BY w))
"""
    ]
    for k in range(1, n_merges + 1):
        ctes.append(f"""
t{k} AS (SELECT string_split(seq, ' ') AS ts, cnt FROM v{k - 1}),
p{k} AS (
    SELECT ts[CAST(i AS INT)] AS pa, ts[CAST(i AS INT) + 1] AS pb,
           CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM t{k}, unnest(generate_series(1, len(ts) - 1)) AS u(i)
    WHERE len(ts) >= 2 GROUP BY pa, pb
),
b{k} AS (SELECT pa, pb, pair_count FROM p{k}
         ORDER BY pair_count DESC, pa, pb LIMIT 1),
v{k} AS (
    SELECT ltrim(list_reduce(
               list_prepend('', ts),
               (acc, x) -> acc ||
                   CASE WHEN ends_with(acc, ' ' || b{k}.pa) AND x = b{k}.pb
                        THEN x ELSE ' ' || x END
           )) AS seq, cnt
    FROM t{k} CROSS JOIN b{k}
)
""")
    return "WITH " + ",".join(c.strip() for c in ctes)


def _bpe_oracle_sql(n_merges: int) -> str:
    selects = " UNION ALL ".join(
        f"SELECT {k} AS merge_rank, pa AS pair_a, pb AS pair_b, pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"{_bpe_ctes(n_merges)} {selects}"


def _bpe_encode_oracle_sql(n_merges: int) -> str:
    """DuckDB mirror of ``bpe_encode``: learn the merges via the shared
    CTE chain, then re-encode every document with the same char-split +
    greedy-fold sequence the Spark scan applies."""
    enc = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for k in range(1, n_merges + 1):
        enc = (
            f"ltrim(list_reduce(list_prepend('', string_split({enc}, ' ')), "
            f"(acc, x) -> acc || CASE WHEN ends_with(acc, ' ' || b{k}.pa) "
            f"AND x = b{k}.pb THEN x ELSE ' ' || x END))"
        )
    crosses = " ".join(f"CROSS JOIN b{k}" for k in range(1, n_merges + 1))
    return f"""{_bpe_ctes(n_merges)},
    enc AS (
        SELECT doc_id, n_chars,
               list_transform(
                   list_filter(string_split(text, ' '), w0 -> w0 != ''),
                   w -> {enc}) AS encw
        FROM documents {crosses}
    ),
    tok AS (
        SELECT doc_id, n_chars,
               CAST(coalesce(list_sum(list_transform(
                   encw, s -> len(string_split(s, ' ')))), 0) AS INT)
                   AS n_tokens,
               substr(array_to_string(encw, ' '), 1, 120) AS enc_preview
        FROM enc
    )
    SELECT doc_id, n_tokens, enc_preview,
           CAST({ratio_micro_sql("n_chars", "nullif(n_tokens, 0)")}
                AS DOUBLE) / 1000000 AS chars_per_token
    FROM tok"""


# Session-scoped merges memo (the _pq_fit_session pattern): the training
# loop is deterministic (pair-count arg-max with (count desc, pair asc)
# tie-break over exact integer sums), so its merge list is a pure
# function of the corpus — yet four registered queries
# (bpe_learn_merges, bpe_encode, bpe_compression_by_lang,
# tokenizer_fertility_by_lang) each re-ran the identical N_MERGES
# vocab-scale Lloyd-style passes.  Unlike the k-means memo the value is
# a tiny fully-materialized Python list, so there is no checkpoint
# lifecycle to manage.  Keyed by (application, sf_dir) — same
# immutable-input assumption as every session memo here.  Lock-guarded
# single-flight for driver thread pools.
_MERGES_MEMO: dict = {}
_MERGES_LOCK = threading.RLock()


def _learn_merges(spark, sf_dir) -> list[tuple[int, str, str, int]]:
    key = (spark.sparkContext.applicationId, sf_dir)
    with _MERGES_LOCK:
        hit = _MERGES_MEMO.get(key)
        if hit is None:
            _MERGES_MEMO.clear()
            hit = _MERGES_MEMO[key] = _learn_merges_impl(spark, sf_dir)
    return hit


def _learn_merges_impl(spark, sf_dir) -> list[tuple[int, str, str, int]]:
    """The BPE training loop shared by ``bpe_learn_merges`` (returns the
    merge table itself) and ``bpe_encode`` (bakes the merges into a
    scan-side encoder).  Returns [(rank, pair_a, pair_b, count), ...]."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "cnt"
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for rank in range(1, N_MERGES + 1):
        ts = vocab.select(F.split("seq", " ").alias("ts"), "cnt")
        idx = F.when(
            F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
        ).otherwise(F.expr("array()").cast("array<int>"))
        best = (
            ts.select(F.explode(idx).alias("i"), "ts", "cnt")
            .select(
                F.element_at("ts", F.col("i")).alias("pa"),
                F.element_at("ts", F.col("i") + 1).alias("pb"),
                "cnt",
            )
            .groupBy("pa", "pb")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "pa", "pb")
            .limit(1)
            .collect()[0]  # bounded driver pull: one (pa, pb, count) row
        )
        merges.append((rank, best.pa, best.pb, int(best.pair_count)))
        nxt = vocab.select(
            _merge_fold(
                F.split("seq", " "), F.lit(best.pa), F.lit(best.pb)
            ).alias("seq"),
            "cnt",
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle_sql(N_MERGES),
    tags=("tokenizer", "bpe", "training-data", "iterative"),
)
def bpe_learn_merges(spark, sf_dir):
    merges = _learn_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, pair_a string, pair_b string, pair_count bigint"
    )


bpe_learn_merges.__doc__ = """Distributed BPE merge learning, {n} iterations: the actual
tokenizer-training loop (count pairs -> pick arg-max -> merge ->
repeat), returning (merge_rank, pair_a, pair_b, pair_count).

Scale shape: exactly ONE corpus-scale pass (the word-count exchange);
every Lloyd-style iteration after that runs on the distinct-word
vocabulary (|V| << corpus) with map-side pair partials, the arg-max
is a 1-row driver pull (same bounded pattern as the k-means centroid
pull), and the merge itself is a scan-side fold — zero additional
corpus exchanges.  localCheckpoint bounds lineage growth across
iterations exactly as in dedup_canonical's label propagation.
""".format(n=N_MERGES)


@register(
    "bpe_encode",
    oracle=_bpe_encode_oracle_sql(N_MERGES),
    tags=("tokenizer", "bpe", "training-data"),
)
def bpe_encode(spark, sf_dir):
    """Apply the learned BPE merges to encode every document — the
    train->apply other half of ``bpe_learn_merges`` (what a tokenizer
    actually does to a corpus before packing): per doc, the token count
    under the learned vocabulary, an encoded-text preview, and the
    chars-per-token compression ratio.

    Scale shape: training costs what ``bpe_learn_merges`` costs (one
    corpus exchange + vocab-scale iterations); the merges come back to
    the driver as N_MERGES tiny literals, so ENCODING is a pure
    zero-exchange corpus scan — each word is char-split and greedily
    folded per merge rank entirely inside whole-stage codegen, exactly
    how a production tokenizer ships its merge table to every worker.
    Plan-gated: the encode stage contains no Exchange.  Encoding runs
    through the Arrow kernel (``bpe_encode_table``, parity-pinned to
    the ``bpe_encode_plan`` fold spec).
    """
    merges = _learn_merges(spark, sf_dir)
    return bpe_encode_table(
        ensure_parallelism(load_table(spark, sf_dir, "documents")), merges
    )


def bpe_encode_table(d, merges, extra_cols=()):
    """Arrow-kernel encode stage — bit-identical to ``bpe_encode_plan``
    (the Catalyst spec, parity pinned in tests/test_corpus_tools.py)
    and the at-scale form: the spec's per-word chain of N_MERGES
    string-accumulating HOF folds is interpreted AND O(len²) in
    allocations, the worst per-byte constant in the engine after the
    pre-kernel quality scan.  The kernel applies the same greedy
    left-to-right non-rematching merge passes with O(len) list folds
    and MEMOIZES per distinct word within each Arrow batch — corpora
    repeat words heavily, so most rows reduce to a dict hit.  Same
    merge-rank order, same single-space joins, same substring(1, 120)
    preview, and chars_per_token rounds in exact integer micro-units
    (the functions.numeric discipline, == the spec's ratio_micro
    column); NULL when a doc has zero tokens, exactly like the spec's
    unguarded F.when."""
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in d.schema.fields}
    extra = list(extra_cols)
    out_schema = T.StructType(
        [
            in_fields["doc_id"],
            T.StructField("n_tokens", T.IntegerType(), False),
            T.StructField("enc_preview", T.StringType(), False),
            *(in_fields[c] for c in extra),
            T.StructField("chars_per_token", T.DoubleType(), True),
        ]
    )
    pairs = [(pa, pb) for _, pa, pb, _ in merges]
    in_cols = ["doc_id", "n_chars", *[c for c in extra if c != "n_chars"],
               "text"]

    def kernel(batches):
        cache: dict[str, tuple[str, int]] = {}

        def enc_word(w: str) -> tuple[str, int]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            toks = list(w)
            for a, b in pairs:
                out: list[str] = []
                for x in toks:
                    # merged tokens never re-match within the pass:
                    # out[-1] must equal a EXACTLY (token-boundary test)
                    if out and x == b and out[-1] == a:
                        out[-1] = out[-1] + x
                    else:
                        out.append(x)
                toks = out
            res = (" ".join(toks), len(toks))
            cache[w] = res
            return res

        for pdf in batches:
            if not len(pdf):
                continue
            n_toks, previews, cpts = [], [], []
            for t, nc in zip(pdf["text"], pdf["n_chars"]):
                enc_words = [enc_word(w) for w in t.split(" ") if w != ""]
                n = sum(k for _, k in enc_words)
                n_toks.append(n)
                previews.append(" ".join(s for s, _ in enc_words)[:120])
                # exact integer micro rounding — functions.numeric
                # discipline, == the spec's ratio_micro column
                cpts.append(
                    ((2 * int(nc) * 1_000_000 + n) // (2 * n)) / 1e6
                    if n > 0
                    else None
                )
            out = pdf[["doc_id", *extra]].copy()
            out["n_tokens"] = n_toks
            out["enc_preview"] = previews
            out["chars_per_token"] = cpts
            yield out[
                ["doc_id", "n_tokens", "enc_preview", *extra,
                 "chars_per_token"]
            ]

    return d.select(*dict.fromkeys(in_cols)).mapInPandas(kernel, out_schema)


def bpe_encode_plan(d, merges, extra_cols=()):
    """Lazy encode stage over a documents frame with driver-side merges —
    split out so the plan gate can assert it is exchange-free.
    ``extra_cols`` ride through the scan (e.g. lang for the per-language
    compression rollup) so consumers never re-join documents."""

    def enc_word(w: Column) -> Column:
        seq = F.trim(F.regexp_replace(w, "(.)", "$1 "))
        for _, pa, pb, _ in merges:
            seq = _merge_fold(F.split(seq, " "), F.lit(pa), F.lit(pb))
        return seq

    # n_chars already rides the scan; requesting it in extra_cols just
    # keeps it in the output projection
    extra = [c for c in extra_cols if c != "n_chars"]
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    enc = d.select(
        "doc_id", "n_chars", *extra, F.transform(toks, enc_word).alias("encw")
    )
    tok = enc.select(
        "doc_id",
        "n_chars",
        *extra,
        F.aggregate(
            "encw", F.lit(0), lambda acc, s: acc + F.size(F.split(s, " "))
        ).alias("n_tokens"),
        F.substring(F.array_join("encw", " "), 1, 120).alias("enc_preview"),
    )
    return tok.select(
        "doc_id",
        "n_tokens",
        "enc_preview",
        *extra_cols,
        (
            ratio_micro(
                F.col("n_chars"), F.when(F.col("n_tokens") > 0, F.col("n_tokens"))
            ).cast("double")
            / 1000000
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------

D_IN = 64
D_OUT = 16
_JL_A, _JL_B, _JL_C = 2654435761, 40503, 2246822519


# sign(i, j) = parity of a two-step LCG: h1 = (A*i + B) mod P, then
# (h1 * (2j+1) + C) mod P.  The single-step form (A*i + B*j + C) is
# DEGENERATE: B*j is small vs P, so stepping j almost never wraps the
# modulus and the parity just alternates — every output dim collapses to
# +/-p0.  The per-dim odd multiplier (2j+1) on the mixed h1 decorrelates
# dims; all intermediates stay < 2^37, far from int64 overflow in both
# engines.


def _jl_proj_sql(j: int) -> str:
    sign = (
        f"CASE WHEN (((({_JL_A} * i + {_JL_B}) % {P}) * {2 * j + 1} + {_JL_C}) "
        f"% {P}) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    )
    return (
        f"round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {D_IN}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({sign}))), "
        f"(x, y) -> x + y) / {float(D_OUT) ** 0.5!r}, 6)"
    )


@register(
    "jl_projection",
    oracle="SELECT vec_id, "
    + ", ".join(f"{_jl_proj_sql(j)} AS p{j}" for j in range(D_OUT))
    + " FROM embeddings",
    tags=("similarity", "projection", "training-data"),
)
def jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss sign random projection 64-d -> 16-d, the
    standard pre-shrink before LSH/clustering on billion-vector corpora
    (distance-preserving to ~1/sqrt(16) distortion).

    The +/-1 projection matrix is a deterministic integer-arithmetic
    formula, never materialized: each output dim is a scan-side
    sequential fold over the input vector in index order (bit-exact vs
    the oracle's list_reduce), so the whole operator is ZERO-EXCHANGE —
    gated in test_plan_shapes — and shuffles nothing at any scale.
    """
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    emb = F.col("embedding")

    def proj(j: int) -> Column:
        fold = F.aggregate(
            F.sequence(F.lit(1), F.lit(D_IN)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(emb, i).cast("double")
            * F.when(
                (
                    (((F.lit(_JL_A) * i + _JL_B) % P) * (2 * j + 1) + _JL_C) % P
                )
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        return F.round(fold / F.lit(float(D_OUT) ** 0.5), 6).alias(f"p{j}")

    return e.select("vec_id", *[proj(j) for j in range(D_OUT)])


# ---------------------------------------------------------------------------
# k-NN label propagation
# ---------------------------------------------------------------------------

_DOT_FOLD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT_FOLD.format(a=a, b=b)
    na = _DOT_FOLD.format(a=a, b=a)
    nb = _DOT_FOLD.format(a=b, b=b)
    return f"round({dot} / (sqrt({na}) * sqrt({nb})), 6)"


KNN_K = 5


@register(
    "knn_label_propagation",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id % 10 = 0),
    c AS (SELECT vec_id AS cid, embedding AS ce, label FROM embeddings
          WHERE vec_id % 10 != 0),
    s AS (SELECT qid, cid, label, {_cos_sql('qe', 'ce')} AS cosine
          FROM q CROSS JOIN c),
    top AS (SELECT qid, label FROM (
        SELECT qid, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, cid) AS rnk
        FROM s) WHERE rnk <= {KNN_K}),
    v AS (SELECT qid, label, count(*) AS votes FROM top GROUP BY qid, label)
    SELECT qid AS vec_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
    FROM (SELECT qid, label, votes,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY votes DESC, label) AS rn
          FROM v) WHERE rn = 1
    """,
    tags=("similarity", "labeling", "training-data"),
)
def knn_label_propagation(spark, sf_dir):
    """Weak-supervision label propagation: every 10th vector plays
    "unlabeled" and receives the majority label of its KNN_K nearest
    labeled neighbors by cosine (neighbor ties -> lower cid; vote ties ->
    lower label — a total order, so the answer is engine-independent).

    Scale shape: the unlabeled batch broadcasts against the scan-side
    labeled corpus (norms folded once per row below the join), per-query
    top-k via a qid-partitioned window, then an O(batch * k) vote
    aggregate.  For corpus-scale batches the identical vote/argmax tail
    composes with ann_lsh_topk / ann_ivf_topk candidate pruning instead
    of the exact scorer — the same exact-verify split every ANN operator
    in this family uses.
    """
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    q = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        nrm.alias("qn"),
    )
    c = e.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        nrm.alias("cn"),
        "label",
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .select("qid", "cid", "label", cos.alias("cosine"))
    )
    w_nn = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    votes = (
        scored.withColumn("rnk", F.row_number().over(w_nn))
        .filter(F.col("rnk") <= KNN_K)
        .groupBy("qid", "label")
        .agg(F.count("*").alias("votes"))
    )
    w_vote = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .filter(F.col("rn") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("label").alias("pred_label"),
            "votes",
        )
    )


# ---------------------------------------------------------------------------
# Containment dedup / winnowing fingerprints / curriculum staging
# ---------------------------------------------------------------------------

# portable_hash(s) as a DuckDB expression (same char fold as functions.text)
_hash_sql = TX.hash_sql


_SHINGLE_HASH_CTE = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
    SELECT doc_id, list_transform(
        generate_series(1, len(ws) - {N_SHINGLE - 1}),
        i -> {_hash_sql(
            " || ' ' || ".join(f"ws[i+{k}]" for k in range(N_SHINGLE))
        )}) AS hs
    FROM w WHERE len(ws) >= {N_SHINGLE}
)
"""

CONTAINMENT_T = 0.8
DF_CAP = 64  # discriminative-shingle cap: drop shingles in > DF_CAP docs


@register(
    "minhash_containment",
    oracle=f"""
    WITH {_SHINGLE_HASH_CTE.strip()},
    post AS (SELECT doc_id, unnest(list_distinct(hs)) AS h FROM sh),
    dfc AS (SELECT h, count(*) AS df FROM post GROUP BY h),
    capped AS (SELECT doc_id, post.h, df FROM post JOIN dfc ON post.h = dfc.h
               WHERE df <= {DF_CAP}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
    g AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM capped a JOIN capped b
          ON a.h = b.h AND a.doc_id < b.doc_id AND a.df >= 2
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           CAST({ratio_micro_sql("inter", "least(sa.sz, sb.sz)")} AS DOUBLE)
               / 1000000 AS containment
    FROM g JOIN sizes sa ON g.doc_a = sa.doc_id
           JOIN sizes sb ON g.doc_b = sb.doc_id
    WHERE CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= {CONTAINMENT_T}
    """,
    tags=("dedup", "containment"),
)
def minhash_containment(spark, sf_dir):
    from ..functions.similarity import shingle_hash_table

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    post = shingle_hash_table(d, ("doc_id",)).select(
        "doc_id", F.explode(F.array_distinct("hs")).alias("h")
    )
    dfc = post.groupBy("h").agg(F.count("*").alias("df"))
    capped = post.join(dfc, "h").filter(F.col("df") <= DF_CAP)
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("sz"))
    joinable = capped.filter(F.col("df") >= 2)
    a = joinable.select(F.col("doc_id").alias("doc_a"), "h")
    b = joinable.select(F.col("doc_id").alias("doc_b"), "h")
    pairs = (
        a.join(b, ["h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb"))
    cont = F.col("inter").cast("double") / F.least("sa", "sb")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        # raw-double cut first (matches the oracle's raw-ratio WHERE);
        # the exact micro rounding then runs on survivors only — the
        # decimal ops never touch the full candidate-pair set
        .filter(cont >= CONTAINMENT_T)
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (
                ratio_micro(F.col("inter"), F.least("sa", "sb")).cast(
                    "double"
                )
                / 1000000
            ).alias("containment"),
        )
    )


minhash_containment.__doc__ = """Containment near-dup pairs: |A ∩ B| / min(|A|, |B|) over
DISCRIMINATIVE shingle-hash sets — catches SUBSET duplicates (a doc
embedded inside a longer one) that symmetric Jaccard misses
(|A∩B|/|A∪B| stays low when |B| >> |A|).

"Discriminative" = document frequency <= {cap}: background-vocabulary
shingles shared by more docs than that are excluded from both the
intersection AND the set sizes (the stopword-removal move plagiarism
detectors make).  The cap is also what makes the op scale: postings
self-join cost is bounded by df_cap * |postings| instead of going
QUADRATIC on hot shingles (the uncapped first cut measured 16 s at
sf0.1; capped, ~1 s).  df=1 shingles are additionally dropped from
the JOIN side only (they cannot intersect; they still count toward
sizes).  At 100 TB the cap becomes a df quantile instead of an
absolute; the plan shape is identical.
""".format(cap=DF_CAP)


WINNOW_W = 4  # fingerprint window: guarantee a match on any 7-shingle run
_POS_SHIFT = 1 << 20  # encode = hash * 2^20 + position (h < 2^31 -> < 2^51)


@register(
    "winnowing_fingerprint",
    oracle=f"""
    WITH {_SHINGLE_HASH_CTE.strip()},
    fp AS (
        SELECT doc_id,
               CASE WHEN len(hs) >= {WINNOW_W} THEN list_distinct(
                   list_transform(
                       list_distinct(list_transform(
                           generate_series(1, len(hs) - {WINNOW_W - 1}),
                           i -> list_min(list_transform(
                               generate_series(0, {WINNOW_W - 1}),
                               k -> hs[i+k] * {_POS_SHIFT} + (i+k))))),
                       x -> x // {_POS_SHIFT}))
               ELSE [] END AS fps
        FROM sh
    )
    SELECT doc_id, CAST(len(fps) AS INT) AS n_fp,
           list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
                       (acc, x) -> acc + x) AS fp_sum
    FROM fp
    """,
    tags=("text", "fingerprint", "winnowing"),
)
def winnowing_fingerprint(spark, sf_dir):
    from ..functions.similarity import shingle_hash_table

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    hashed = shingle_hash_table(
        d.filter(F.size(F.split("text", " ")) >= N_SHINGLE), ("doc_id",)
    )
    fps = winnow_fps(F.col("hs"))
    return hashed.select(
        "doc_id",
        F.size(fps).alias("n_fp"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "fp_sum"
        ),
    )


winnowing_fingerprint.__doc__ = """Winnowing document fingerprints (the MOSS scheme): slide a
{w}-wide window over the positional shingle-hash sequence and keep
each window's minimum — any shared run of {t} consecutive shingles
between two documents is then GUARANTEED to share a fingerprint,
with ~2/(w+1) of positions selected.  Window minima are taken over
the hash*2^20+pos encoding (leftmost-position tie-break, one
integer min per window, same fold both engines), then the POSITION
IS STRIPPED — the emitted fingerprints are bare hashes, so two
documents sharing a run at different offsets share the same
fingerprint VALUE (the cross-doc join the scheme exists for; the
first revision emitted the encoded form, which never matched
across documents).

Entirely scan-side: rolling shingle hashes (each char folded once),
window minima, and the checksum are per-row array ops — ZERO
exchanges at any corpus size (gated).  Downstream span-level
contamination joins shuffle only the selected (doc_id, fingerprint)
pairs, ~2/(w+1) of the shingle volume.
""".format(w=WINNOW_W, t=WINNOW_W + N_SHINGLE - 1)


def winnow_fps(hs_b: Column) -> Column:
    """Winnowing fingerprint array (bare hashes, distinct) from a bound
    shingle-hash array — module-level so the cross-doc shared-run
    guarantee is directly testable on synthetic documents."""
    encoded = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(hs_b) - (WINNOW_W - 1)),
            lambda i: F.array_min(
                F.transform(
                    F.sequence(F.lit(0), F.lit(WINNOW_W - 1)),
                    lambda k: F.element_at(hs_b, i + k) * _POS_SHIFT
                    + (i + k),
                )
            ),
        )
    )
    # strip the position: emit bare hashes so fingerprints match
    # across documents regardless of offset
    return F.when(
        F.size(hs_b) >= WINNOW_W,
        F.array_distinct(
            F.transform(encoded, lambda x: F.shiftright(x, 20))
        ),
    ).otherwise(F.array().cast("array<long>"))


@register(
    "curriculum_stages",
    oracle="""
    WITH n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS c FROM n),
    staged AS (
        SELECT doc_id, n_tokens,
               CASE WHEN 2 * n_tokens * c < s THEN 1
                    WHEN n_tokens * c < s THEN 2
                    WHEN 2 * n_tokens * c < 3 * s THEN 3
                    ELSE 4 END AS stage
        FROM n CROSS JOIN tot
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, stage,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY stage
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
           AS stage_rank
    FROM staged
    """,
    tags=("training-data", "curriculum"),
)
def curriculum_stages(spark, sf_dir):
    """Length-curriculum staging for training-data loaders: docs are
    binned against the corpus mean token count (<0.5x, <1x, <1.5x, >=)
    and given a deterministic intra-stage order by md5-of-key.  The
    stage thresholds compare INTEGER cross-products (2*n*count vs sum)
    — no float mean, so the banding is exact in any engine.

    Scale shape: one tiny 2-value aggregate broadcast back over the
    scan, stage assignment scan-side, and ranking windows partitioned
    PER STAGE — a loader shards on (stage, stage_rank), so no global
    total order (and no single-reducer sort) is ever materialized.
    """
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    tot = n.agg(
        F.sum("n_tokens").cast("long").alias("s"), F.count("*").alias("c")
    )
    nt, s, c = F.col("n_tokens").cast("long"), F.col("s"), F.col("c")
    staged = n.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.when(2 * nt * c < s, 1)
        .when(nt * c < s, 2)
        .when(2 * nt * c < 3 * s, 3)
        .otherwise(4)
        .alias("stage"),
    )
    w = Window.partitionBy("stage").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return staged.withColumn(
        "stage_rank", F.row_number().over(w).cast("int")
    )


# ---------------------------------------------------------------------------
# Z-order layout key / cluster-stratified diversity sampling
# ---------------------------------------------------------------------------

Z_BITS = 16
Z_BUCKET_SHIFT = 8  # bucket = z-prefix: fixes the top bits of BOTH dims
# (granularity knob: production picks the shift so a bucket ~= one file;
# 8 keeps >= 4 high bits per dimension even on the fixture's small
# user-id range, so both-dimension pruning is observable at every SF)

_Z_EPOCH = "1970-01-01 00:00:00"
_ZKEY_SQL = " + ".join(
    f"(((a >> {k}) & 1) << {2 * k}) + (((b >> {k}) & 1) << {2 * k + 1})"
    for k in range(Z_BITS)
)


@register(
    "zorder_layout",
    oracle=f"""
    WITH d AS (
        SELECT event_id,
               user_id % {1 << Z_BITS} AS a,
               date_diff('hour', TIMESTAMP '{_Z_EPOCH}', ts) % {1 << Z_BITS} AS b
        FROM events
    )
    SELECT event_id, CAST({_ZKEY_SQL} AS BIGINT) AS zkey,
           CAST(({_ZKEY_SQL}) >> {Z_BUCKET_SHIFT} AS BIGINT) AS zbucket
    FROM d
    """,
    tags=("layout", "zorder"),
)
def zorder_layout(spark, sf_dir):
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    hour_idx = F.timestamp_diff(
        "HOUR", F.lit(_Z_EPOCH).cast("timestamp_ntz"), F.col("ts")
    )
    a = (F.col("user_id") % (1 << Z_BITS)).alias("a")
    b = (hour_idx % (1 << Z_BITS)).alias("b")
    from ..functions.layout import morton_key

    d = e.select("event_id", a, b)
    zkey = morton_key(F.col("a"), F.col("b"), Z_BITS)
    return d.select(
        "event_id",
        zkey.alias("zkey"),
        F.shiftright(zkey, Z_BUCKET_SHIFT).cast("long").alias("zbucket"),
    )


zorder_layout.__doc__ = """Z-order (Morton) clustering key over (user_id, event hour) — the
write-time layout that makes BOTH `WHERE user_id = ?` and
`WHERE ts BETWEEN ?` prune files at 100 TB: sorting by zkey before
the partitioned write puts each file inside a small rectangle of the
(user, time) plane, so min/max footer stats skip it for either
predicate (a single-column sort prunes only its own column).

The key is pure bit arithmetic — interleave the low {bits} bits of
each dimension — computed scan-side with ZERO exchanges (gated; the
downstream `repartitionByRange(zkey)` write is the only shuffle the
layout job would add).  The hour index is exact integer arithmetic
from a midnight epoch (hour-boundary counting == floor(duration)
when the origin sits on the boundary), so the key is
engine-reproducible.
""".format(bits=Z_BITS)


try:  # kmeans CTE helper lives in the (import-guarded) llm_pipeline module
    from ..functions.clustering import kmeans_assign
    from .llm_pipeline import _kmeans_ctes

    DIVERSITY_K = 10
    DIVERSITY_ITERS = 3
    DIVERSITY_PER_ROLE = 3

    @register(
        "diversity_sample",
        oracle="WITH "
        + _kmeans_ctes(DIVERSITY_K, DIVERSITY_ITERS)
        + f""",
        ranked AS (
            SELECT vec_id, cid, d2,
                   row_number() OVER (PARTITION BY cid
                                      ORDER BY d2 ASC, vec_id ASC) AS r_core,
                   row_number() OVER (PARTITION BY cid
                                      ORDER BY d2 DESC, vec_id ASC) AS r_frontier
            FROM a{DIVERSITY_ITERS}
        )
        SELECT vec_id, cid, round(d2, 6) AS d2, 'core' AS role
        FROM ranked WHERE r_core <= {DIVERSITY_PER_ROLE}
        UNION ALL
        SELECT vec_id, cid, round(d2, 6) AS d2, 'frontier' AS role
        FROM ranked WHERE r_frontier <= {DIVERSITY_PER_ROLE}
        """,
        tags=("training-data", "sampling", "clustering"),
    )
    def diversity_sample(spark, sf_dir):
        """Cluster-stratified diversity sample (the SemDeDup/DsDm-style
        curation primitive): k-means the corpus, then per cluster keep
        the {m} most-central vectors ('core' — prototypes) and the {m}
        farthest ('frontier' — the diversity/boundary picks).  A vector
        can be both in a small cluster; the roles are separate rows.

        Scale shape: assignment inherits kmeans_assign's zero-exchange
        scan-side argmin; the only additions are cid-partitioned ranking
        windows (k partitions, embarrassingly parallel) — the whole
        sampler adds ONE exchange after the fit.  Deterministic by the
        same contract that lets k-means itself carry a hash-exact
        oracle (quantized inputs, decimal centroid sums, fold-ordered
        distances, total-order ranks).
        """
        emb = load_table(spark, sf_dir, "embeddings")
        assign = kmeans_assign(emb, k=DIVERSITY_K, iters=DIVERSITY_ITERS)
        w_core = Window.partitionBy("cid").orderBy(F.col("d2").asc(), F.col("vec_id"))
        w_frontier = Window.partitionBy("cid").orderBy(
            F.col("d2").desc(), F.col("vec_id")
        )
        ranked = assign.select(
            "vec_id",
            "cid",
            "d2",
            F.row_number().over(w_core).alias("r_core"),
            F.row_number().over(w_frontier).alias("r_frontier"),
        )
        core = ranked.filter(F.col("r_core") <= DIVERSITY_PER_ROLE).select(
            "vec_id", "cid", F.round("d2", 6).alias("d2"), F.lit("core").alias("role")
        )
        frontier = ranked.filter(F.col("r_frontier") <= DIVERSITY_PER_ROLE).select(
            "vec_id",
            "cid",
            F.round("d2", 6).alias("d2"),
            F.lit("frontier").alias("role"),
        )
        return core.unionAll(frontier)

    diversity_sample.__doc__ = diversity_sample.__doc__.format(
        m=DIVERSITY_PER_ROLE
    )
except ImportError:  # pragma: no cover - numpy-less environments
    pass


# ---------------------------------------------------------------------------
# Tokenizer fairness: per-language compression under the learned BPE
# ---------------------------------------------------------------------------


def _bpe_lang_oracle_sql(n_merges: int) -> str:
    """Per-language rollup of the ``bpe_encode`` oracle: learn merges via
    the shared CTE chain, re-encode, then aggregate chars/tokens per
    lang with exact integer sums."""
    enc = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for k in range(1, n_merges + 1):
        enc = (
            f"ltrim(list_reduce(list_prepend('', string_split({enc}, ' ')), "
            f"(acc, x) -> acc || CASE WHEN ends_with(acc, ' ' || b{k}.pa) "
            f"AND x = b{k}.pb THEN x ELSE ' ' || x END))"
        )
    crosses = " ".join(f"CROSS JOIN b{k}" for k in range(1, n_merges + 1))
    return f"""{_bpe_ctes(n_merges)},
    enc AS (
        SELECT doc_id, lang, n_chars,
               list_transform(
                   list_filter(string_split(text, ' '), w0 -> w0 != ''),
                   w -> {enc}) AS encw
        FROM documents {crosses}
    ),
    tok AS (
        SELECT lang, n_chars,
               CAST(coalesce(list_sum(list_transform(
                   encw, s -> len(string_split(s, ' ')))), 0) AS BIGINT)
                   AS n_tokens
        FROM enc
    )
    SELECT lang, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST({ratio_micro_sql("sum(n_chars)", "nullif(sum(n_tokens), 0)")}
                AS DOUBLE) / 1000000 AS chars_per_token
    FROM tok GROUP BY lang"""


@register(
    "bpe_compression_by_lang",
    oracle=_bpe_lang_oracle_sql(N_MERGES),
    tags=("tokenizer", "bpe", "multilingual", "fairness"),
)
def bpe_compression_by_lang(spark, sf_dir):
    """Tokenizer-fairness audit: per-language compression rate
    (chars-per-token) under the SAME learned BPE vocabulary — the
    standard check that a tokenizer trained on a mixed corpus does not
    tax some languages with far more tokens per character than others
    (which silently skews any token-budgeted training mix toward the
    well-compressed languages; cf. ``token_budget_mix``).

    Scale shape: identical to ``bpe_encode`` — training is one corpus
    exchange + vocab-scale iterations, the merges ship to workers as
    tiny literals, and encoding is a zero-exchange codegen scan; the
    only addition is a |languages|-key rollup with map-side partials
    over exact integer char/token sums."""
    merges = _learn_merges(spark, sf_dir)
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    per_doc = bpe_encode_table(d, merges, extra_cols=("lang", "n_chars"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("n_chars")).cast("bigint").alias("total_chars"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
            (
                ratio_micro(
                    F.sum(F.col("n_chars")).cast("bigint"),
                    F.when(
                        F.sum(F.col("n_tokens").cast("bigint")) > 0,
                        F.sum(F.col("n_tokens").cast("bigint")),
                    ),
                ).cast("double")
                / 1000000
            ).alias("chars_per_token"),
        )
    )


def _bpe_fertility_oracle_sql(n_merges: int) -> str:
    """DuckDB mirror of ``tokenizer_fertility_by_lang``: learn the merges
    via the shared CTE chain, re-encode, then aggregate nonempty words
    and BPE tokens per lang with exact integer sums."""
    enc = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for k in range(1, n_merges + 1):
        enc = (
            f"ltrim(list_reduce(list_prepend('', string_split({enc}, ' ')), "
            f"(acc, x) -> acc || CASE WHEN ends_with(acc, ' ' || b{k}.pa) "
            f"AND x = b{k}.pb THEN x ELSE ' ' || x END))"
        )
    crosses = " ".join(f"CROSS JOIN b{k}" for k in range(1, n_merges + 1))
    return f"""{_bpe_ctes(n_merges)},
    enc AS (
        SELECT lang,
               len(list_filter(string_split(text, ' '), w0 -> w0 != ''))
                   AS n_words,
               list_transform(
                   list_filter(string_split(text, ' '), w0 -> w0 != ''),
                   w -> {enc}) AS encw
        FROM documents {crosses}
    ),
    tok AS (
        SELECT lang, n_words,
               CAST(coalesce(list_sum(list_transform(
                   encw, s -> len(string_split(s, ' ')))), 0) AS BIGINT)
                   AS n_tokens
        FROM enc
    )
    SELECT lang, count(*) AS docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST({ratio_micro_sql("sum(n_tokens)", "nullif(sum(n_words), 0)")}
                AS DOUBLE) / 1000000 AS fertility
    FROM tok GROUP BY lang"""


@register(
    "tokenizer_fertility_by_lang",
    oracle=_bpe_fertility_oracle_sql(N_MERGES),
    tags=("tokenizer", "bpe", "multilingual", "fairness"),
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility (BPE tokens per word) per language under the
    shared learned vocabulary — the OTHER standard multilingual
    tokenizer-fairness metric next to ``bpe_compression_by_lang``'s
    chars-per-token: fertility is what sets each language's effective
    context length and per-word training cost (a fertility-2 language
    sees half the text in the same sequence budget).

    Scale shape: identical to ``bpe_encode`` — one corpus exchange for
    training, merges ship as literals, encoding is the zero-exchange
    memoized Arrow kernel; the fertility rollup is a |languages|-key
    partial aggregate over exact integer word/token sums."""
    merges = _learn_merges(spark, sf_dir)
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n_words = F.size(
        F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    )
    per_doc = bpe_encode_table(
        d.withColumn("n_words", n_words),
        merges,
        extra_cols=("lang", "n_words"),
    )
    tok = F.sum(F.col("n_tokens").cast("bigint"))
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(F.col("n_words").cast("bigint")).alias("total_words"),
        tok.alias("total_tokens"),
        (
            ratio_micro(
                tok,
                F.when(
                    F.sum(F.col("n_words").cast("bigint")) > 0,
                    F.sum(F.col("n_words").cast("bigint")),
                ),
            ).cast("double")
            / 1000000
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Source-divergence matrix (mixing/curation diagnostics)
# ---------------------------------------------------------------------------

LN2 = 0.6931471805599453  # python-computed literal, injected into BOTH
# engines (the lsh_tuning_curve discipline) so no cross-engine ln(2)
LN2_NANO = 693147181  # round(LN2 * 1e9): ln2 as an exact nano-unit
# integer, so the missing-mass terms and the final jsd assemble in EXACT
# integer arithmetic on both engines (functions.numeric) — round(double,
# 6) resolved decimal midpoints differently per engine: at sf0.1 three
# fully-overlapping pairs hit jsd = kl/2 with kl an odd-last-digit exact
# decimal, i.e. a 5e-7-grid midpoint (Spark HALF_UP 0.000501 vs DuckDB
# binary-round 0.000500).  Magnitude bound: (ta−na)·LN2_NANO must stay
# below 2^62, i.e. per-source token totals ≤ ~6.6e9; beyond that drop to
# micro-precision or shard sources.

_JSD_PA = "(CAST(a.n AS DOUBLE) / a.total)"
_JSD_PB = "(CAST(b.n AS DOUBLE) / b.total)"
_JSD_MMA = ratio_micro_sql(f"(ta - na) * {LN2_NANO}", "ta * 1000", scale=1)
_JSD_MMB = ratio_micro_sql(f"(tb - nb) * {LN2_NANO}", "tb * 1000", scale=1)
_JSD_FINAL = ratio_micro_sql(
    f"CAST(kl * 1000000 AS BIGINT) + ({_JSD_MMA}) + ({_JSD_MMB})",
    "2",
    scale=1,
)


@register(
    "source_jsd_matrix",
    oracle=f"""
    WITH wc AS (
        SELECT source, word, count(*) AS n FROM (
            SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
        WHERE word != '' GROUP BY source, word
    ), tot AS (SELECT source, sum(n) AS total FROM wc GROUP BY source),
    c AS (SELECT wc.source, word, n, total FROM wc JOIN tot USING (source)),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_common,
               sum(CAST(round({_JSD_PA} * ln(2 * {_JSD_PA} / ({_JSD_PA} + {_JSD_PB})), 6) AS DECIMAL(18,6))
                   + CAST(round({_JSD_PB} * ln(2 * {_JSD_PB} / ({_JSD_PA} + {_JSD_PB})), 6) AS DECIMAL(18,6))) AS kl,
               sum(a.n) AS na, sum(b.n) AS nb,
               min(a.total) AS ta, min(b.total) AS tb
        FROM c a JOIN c b ON a.word = b.word AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, CAST(n_common AS BIGINT) AS n_common,
           CAST({_JSD_FINAL} AS DOUBLE) / 1000000 AS jsd
    FROM pairs
    """,
    tags=("corpus", "mixing", "divergence"),
)
def source_jsd_matrix(spark, sf_dir):
    """Pairwise Jensen–Shannon divergence between every two sources'
    unigram distributions — the domain-similarity matrix behind mixture
    design (which sources are near-duplicates of each other in
    DISTRIBUTION, which add diversity; the signal DoReMi-style mix
    tuning and `cross_source_overlap`'s document-level matrix summarize
    from opposite ends).  JSD is symmetric and bounded by ln 2, so the
    190 cells are directly comparable.

    Engine-exactness: per-word KL terms are rounded to 1e-6 and summed
    as DECIMAL(18,6) (the `doc_lm_perplexity` discipline); the
    missing-mass closed form avoids per-pair outer joins — a word absent
    from the other source contributes exactly p·ln2, and Σp over the
    SHARED words is the exact integer ratio Σn/total, so the complement
    (1−Σp)·ln2 uses only exact sums and the injected nano-integer ln2
    (no cross-engine transcendental beyond the rounded terms).  The
    missing-mass terms and the final halving assemble in EXACT integer
    micro-units (functions.numeric half-away) — the former round(double,
    6) hit engine-divergent 5e-7-grid midpoints at sf0.1 on pairs whose
    shared words covered the full token mass (jsd = kl/2 exactly).

    Scale shape: one corpus scan → the persisted (source, word, n)
    count table (vocabulary-sized), which feeds the per-source totals
    (broadcast back) AND both pair-join sides; the pair expansion
    self-joins on WORD (vocabulary-sized shuffle, ≤ |sources| rows per
    word side) and collapses immediately to |sources|² pair rows — the
    corpus is never re-read and nothing driver-side exceeds the matrix
    itself."""
    from ..caching import materialized

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count("*").alias("n"))
        .persist()  # ONE corpus scan; feeds totals + both pair-join sides
    )
    tot = wc.groupBy("source").agg(F.sum("n").alias("total"))
    c = wc.join(F.broadcast(tot), "source")
    a, b = c.alias("a"), c.alias("b")
    pa = F.col("a.n").cast("double") / F.col("a.total")
    pb = F.col("b.n").cast("double") / F.col("b.total")
    term = (
        F.round(pa * F.log(F.lit(2.0) * pa / (pa + pb)), 6).cast("decimal(18,6)")
        + F.round(pb * F.log(F.lit(2.0) * pb / (pa + pb)), 6).cast("decimal(18,6)")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count("*").alias("n_common"),
            F.sum(term).alias("kl"),
            F.sum("a.n").alias("na"),
            F.sum("b.n").alias("nb"),
            F.min("a.total").alias("ta"),
            F.min("b.total").alias("tb"),
        )
    )
    kl_micro = (F.col("kl") * 1000000).cast("long")
    mm_a = ratio_micro(
        (F.col("ta") - F.col("na")) * F.lit(LN2_NANO).cast("long"),
        F.col("ta") * 1000,
        scale=1,
    )
    mm_b = ratio_micro(
        (F.col("tb") - F.col("nb")) * F.lit(LN2_NANO).cast("long"),
        F.col("tb") * 1000,
        scale=1,
    )
    jsd_micro = ratio_micro(
        kl_micro + mm_a + mm_b, F.lit(2).cast("long"), scale=1
    )
    result = pairs.select(
        "source_a",
        "source_b",
        "n_common",
        (jsd_micro.cast("double") / 1000000).alias("jsd"),
    )
    return materialized(result, wc)


_N_GROWTH_CHECKPOINTS = 5

@register(
    "vocab_growth",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
    cp AS (SELECT i, (m * i) // {_N_GROWTH_CHECKPOINTS} AS c
           FROM mx,
           (VALUES {", ".join(f"({i})" for i in range(1, _N_GROWTH_CHECKPOINTS + 1))}) t(i)),
    firsts AS (
        SELECT term, MIN(doc_id) AS fd
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY term
    ),
    tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents)
    SELECT i AS checkpoint, c AS docs_limit,
           (SELECT count(*) FROM tok WHERE doc_id < c) AS n_docs,
           (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM tok
            WHERE doc_id < c) AS n_tokens,
           (SELECT count(*) FROM firsts WHERE fd < c) AS vocab
    FROM cp
    """,
    tags=("corpus-analysis", "heaps-law", "vocabulary"),
)
def vocab_growth(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    mx = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    cps = [
        (i, (mx * i) // _N_GROWTH_CHECKPOINTS)
        for i in range(1, _N_GROWTH_CHECKPOINTS + 1)
    ]
    firsts = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.min("doc_id").alias("fd"))
    )
    vocab_row = firsts.agg(
        *[
            F.sum((F.col("fd") < c).cast("long")).alias(f"v{i}")
            for i, c in cps
        ]
    )
    tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    tok_row = tok.agg(
        *(
            [
                F.sum((F.col("doc_id") < c).cast("long")).alias(f"d{i}")
                for i, c in cps
            ]
            + [
                F.sum(
                    F.when(F.col("doc_id") < c, F.col("n")).otherwise(0)
                ).alias(f"t{i}")
                for i, c in cps
            ]
        )
    )
    wide = vocab_row.crossJoin(tok_row)  # 1 row x 1 row
    stack = ", ".join(
        f"{i}L, {c}L, d{i}, t{i}, v{i}" for i, c in cps
    )
    return wide.selectExpr(
        f"stack({len(cps)}, {stack}) as "
        "(checkpoint, docs_limit, n_docs, n_tokens, vocab)"
    )


vocab_growth.__doc__ = """Vocabulary-growth (Heaps'-law) instrumentation: distinct-term
count and token count at {n} doc-id checkpoints — the curve that
tells a corpus builder whether more data still buys new vocabulary
or only repeats it (guides dedup aggressiveness and tokenizer vocab
sizing).  All-integer outputs, so the curve is hash-exact.

Scale shape: ONE corpus scan → per-term first-occurrence (a single
groupBy on term, map-side combinable), then the {n}-checkpoint
memberships fold to ONE wide row of conditional sums (no join, no
window, no explode against checkpoints) unpivoted driver-lessly via
stack(); the doc/token sums are a second 1-row fold over the doc
table.  Nothing here grows with checkpoint count but the literal
list.""".format(n=_N_GROWTH_CHECKPOINTS)
