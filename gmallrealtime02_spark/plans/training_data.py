"""Training-data assembly operators, part 2 (north-star ops — no
reference analogue; BASELINE.json ``north_star``): sequence packing,
benchmark decontamination, stratified sampling, and
partitioning-invariant moment statistics.

Shared scale discipline: the heavy side of every operator stays
scan-parallel (shingles, token counts, power sums are computed map-side
inside codegen); only small keyed artifacts (bin keys, eval-set
shingles, power sums) cross an exchange.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..functions import text as TX
from ..operators.aggregates import dsum
from ..sources import load_table
from ..functions.numeric import ratio_micro, ratio_micro_sql
from .registry import register

PACK_BUDGET = 2048  # tokens per packed training sequence
PACK_SHARDS = 4  # independent fill streams per language


def pack_bins(t, budget: int = PACK_BUDGET, n_shards: int = PACK_SHARDS):
    """Core packing operator over a (doc_id, lang, ntok) DataFrame.

    Each document occupies the half-open token interval
    ``[prior, prior + ntok)`` of its (lang, shard) stream, where
    ``prior`` is the exclusive cumulative token offset in doc_id order
    and ``shard = doc_id % n_shards``.  The doc contributes tokens to
    EVERY budget-aligned bin its interval spans — a doc larger than the
    budget is split across consecutive bins (real packing semantics),
    so within each stream bin ids are the exact contiguous prefix
    0..max_bin and every bin except the last holds exactly ``budget``
    tokens.  Zero-token docs are counted (n_docs) in the bin at their
    offset with zero token contribution.

    Scale: the per-stream running sum is a ROWS-frame window — one
    exchange on (lang, shard) — and the shard split keeps a single
    giant language from serializing onto one task: fills are
    independent per shard, so parallelism is n_langs × n_shards.  The
    bin explode is scan-side (no extra exchange); spanned-bin fan-out
    is bounded by ntok/budget, i.e. total exploded rows ≈ corpus
    tokens / budget + n_docs.
    """
    t = t.withColumn("shard", (F.col("doc_id") % n_shards).cast("int"))
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("ntok").over(w), F.lit(0)).cast("long")
    t = t.withColumn("prior", prior)
    start_bin = F.floor(F.col("prior") / budget)
    end_bin = F.floor(
        (F.col("prior") + F.greatest(F.col("ntok"), F.lit(1)) - 1) / budget
    )
    b = t.withColumn("bin", F.explode(F.sequence(start_bin, end_bin)))
    tok_in_bin = F.least(
        (F.col("bin") + 1) * budget, F.col("prior") + F.col("ntok")
    ) - F.greatest(F.col("bin") * budget, F.col("prior"))
    return b.groupBy("lang", "shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(tok_in_bin).cast("bigint").alias("bin_tokens"),
    )


@register(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
               len(string_split(text, ' ')) AS ntok
        FROM documents
    ),
    c AS (
        SELECT lang, shard, ntok,
               CAST(coalesce(sum(ntok) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS prior
        FROM t
    ),
    b AS (
        SELECT lang, shard, ntok, prior,
               unnest(generate_series(prior // {PACK_BUDGET},
                   (prior + greatest(ntok, 1) - 1) // {PACK_BUDGET})) AS bin
        FROM c
    )
    SELECT lang, CAST(shard AS INTEGER) AS shard, bin, count(*) AS n_docs,
           CAST(sum(least((bin + 1) * {PACK_BUDGET}, prior + ntok)
                    - greatest(bin * {PACK_BUDGET}, prior)) AS BIGINT)
               AS bin_tokens
    FROM b GROUP BY 1, 2, 3
    """,
    tags=("training-data", "packing", "window"),
)
def sequence_packing(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    return pack_bins(d.select("doc_id", "lang", ntok.alias("ntok")))


sequence_packing.__doc__ = """Sequence packing: split documents into fixed token-budget training
bins ({budget} tokens) by sequential interval fill in doc_id order
within each (lang, shard) stream — see :func:`pack_bins`.
Deterministic (no first-fit heuristic state), one exchange on
(lang, shard), parallel independent fills per shard.""".format(
    budget=PACK_BUDGET
)


@register(
    "pack_efficiency_report",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
               len(string_split(text, ' ')) AS ntok
        FROM documents
    ),
    c AS (
        SELECT lang, shard, ntok,
               CAST(coalesce(sum(ntok) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS prior
        FROM c0
    ),
    b AS (
        SELECT lang, shard, ntok, prior,
               unnest(generate_series(prior // {PACK_BUDGET},
                   (prior + greatest(ntok, 1) - 1) // {PACK_BUDGET})) AS bin
        FROM c
    ),
    bins AS (
        SELECT lang, shard, bin,
               CAST(sum(least((bin + 1) * {PACK_BUDGET}, prior + ntok)
                        - greatest(bin * {PACK_BUDGET}, prior)) AS BIGINT)
                   AS bin_tokens
        FROM b GROUP BY 1, 2, 3
    )
    SELECT lang, count(*) AS n_bins,
           CAST(sum(bin_tokens) AS BIGINT) AS packed_tokens,
           CAST(count(*) * {PACK_BUDGET} AS BIGINT) AS capacity,
           CAST(count(*) * {PACK_BUDGET} - sum(bin_tokens) AS BIGINT)
               AS padding_tokens,
           CAST({ratio_micro_sql(
               "sum(bin_tokens)", f"count(*) * {PACK_BUDGET}"
           )} AS DOUBLE) / 1000000 AS fill_ratio
    FROM bins GROUP BY lang
    """.replace("FROM c0", "FROM t"),
    tags=("training-data", "packing", "eval"),
)
def pack_efficiency_report(spark, sf_dir):
    """Packing-efficiency readout over ``sequence_packing``'s bins — the
    number a training-infra team actually watches: per language, bin
    count, packed tokens, capacity (bins × budget), padding waste, and
    the fill ratio.  By construction every non-final bin of a (lang,
    shard) stream is exactly full, so padding = shards × (budget −
    final-bin fill) and the report quantifies the shard-count/padding
    trade (more shards ⇒ more parallel fill streams ⇒ more partial final
    bins).

    Scale shape: the bins frame costs what sequence_packing costs (one
    (lang, shard) exchange); the report is a |languages|-key partial
    aggregate on top.  Exact integer micro fill ratio."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    bins = pack_bins(d.select("doc_id", "lang", ntok.alias("ntok")))
    cap = F.count("*") * PACK_BUDGET
    toks = F.sum("bin_tokens").cast("bigint")
    return bins.groupBy("lang").agg(
        F.count("*").alias("n_bins"),
        toks.alias("packed_tokens"),
        cap.cast("bigint").alias("capacity"),
        (cap - F.sum("bin_tokens")).cast("bigint").alias("padding_tokens"),
        (
            ratio_micro(toks, cap.cast("bigint")).cast("double") / 1000000
        ).alias("fill_ratio"),
    )


_SH4 = """
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(0, len(string_split(text, ' ')) - 4),
        i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
             || ' ' || string_split(text, ' ')[i+3] || ' ' ||
             string_split(text, ' ')[i+4]
    ))) AS shingle
    FROM documents
    WHERE len(string_split(text, ' ')) >= 4
"""


@register(
    "decontamination",
    oracle=f"""
    WITH sh AS ({_SH4}),
    ev AS (SELECT * FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc,
           count(*) AS shared_shingles
    FROM tr JOIN ev ON tr.shingle = ev.shingle
    GROUP BY 1, 2
    """,
    tags=("training-data", "decontamination", "ngram"),
)
def decontamination(spark, sf_dir):
    """Benchmark decontamination: flag training documents that share any
    4-word shingle with a held-out eval set (here: doc_id % 97 == 0 —
    in production, the benchmark corpus).  The eval shingle set is tiny
    relative to the corpus, so it BROADCASTS: the training side streams
    through a map-side hash join with zero shuffle of train shingles —
    the only exchange is the final per-pair count.  Same skeleton as the
    LSH candidate join, but asymmetric smallness makes it cheaper."""
    d = load_table(spark, sf_dir, "documents")
    sh = S.word_shingle_table(
        d.filter(F.size(F.split("text", " ")) >= 4), ("doc_id",), n=4
    ).select("doc_id", F.explode("shingles").alias("shingle"))
    ev = sh.filter(F.col("doc_id") % 97 == 0).withColumnRenamed(
        "doc_id", "eval_doc"
    )
    tr = sh.filter(F.col("doc_id") % 97 != 0).withColumnRenamed(
        "doc_id", "train_doc"
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("shared_shingles"))
    )


@register(
    "contamination_report",
    oracle=f"""
    WITH sh AS ({_SH4}),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
    hits AS (
        SELECT tr.doc_id, count(*) AS n_hits
        FROM tr JOIN ev ON tr.shingle = ev.shingle
        GROUP BY tr.doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.n_hits, 0) AS n_hits,
           CAST({ratio_micro_sql("COALESCE(h.n_hits, 0)", "t.n_shingles")}
                AS DOUBLE) / 1000000 AS overlap_frac,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
    tags=("training-data", "decontamination", "ngram", "report"),
)
def contamination_report(spark, sf_dir):
    """Contamination SCORING (vs ``decontamination``, which pairs/filters):
    for every training document, the fraction of its distinct 4-word
    shingles that appear anywhere in the eval set — the overlap metric a
    data audit reports per document (and aggregates per source) before
    deciding a removal threshold, GPT-3-appendix style, rather than the
    binary any-collision flag.

    Scale shape: the shingle arrays come from ONE Arrow-kernel pass over
    the corpus (persisted: totals, eval set, and hits all read it — no
    per-consumer re-shingling); the per-doc total is ``size`` of the
    array (no explode, no shuffle for the denominator); only hit rows
    (train shingle ∈ broadcast eval set) enter the one small groupBy
    exchange, and the hits table joins back broadcast, so the
    corpus-sized side never shuffles.  Eval shingles are eval-set-sized
    (tiny) by construction."""
    from ..caching import materialized
    from ..sources.tables import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    eligible = d.filter(F.size(F.split("text", " ")) >= 4)
    shingled = S.word_shingle_table(eligible, ("doc_id",), n=4).persist()
    tr = shingled.filter(F.col("doc_id") % 97 != 0)
    totals = tr.select("doc_id", F.size("shingles").alias("n_shingles"))
    ev = (
        shingled.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    hits = (
        tr.select("doc_id", F.explode("shingles").alias("shingle"))
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    result = (
        totals.join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (
                ratio_micro(
                    F.coalesce("n_hits", F.lit(0).cast("long")),
                    F.col("n_shingles"),
                ).cast("double")
                / 1000000
            ).alias("overlap_frac"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
    return materialized(result, shingled)


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents) t
    WHERE rn <= 20
    """,
    tags=("training-data", "sampling", "stratified"),
)
def stratified_sample(spark, sf_dir):
    """Stratified fixed-quota sample: exactly 20 docs per language,
    selected by md5-of-key order — a deterministic shuffle that is
    reproducible across engines and cluster layouts (unlike rand(seed),
    whose draws depend on row→partition assignment).  One exchange on
    lang; at scale, rank-by-hash within strata is the standard
    reservoir-free exact-quota sampler."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


# Efraimidis–Spirakis weighted sampling: mix constants (Numerical
# Recipes LCG) decorrelate the sampling uniform from every other
# hash-derived draw in the engine; (A*h + B) stays < 2^52, exact BIGINT.
WS_MIX_A, WS_MIX_B = 1_664_525, 1_013_904_223
WS_N = 100  # sample size


@register(
    "weighted_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars, sample_key FROM (
        SELECT doc_id, source, n_chars,
               round(-ln(CAST(({WS_MIX_A} * list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(string_split(CAST(doc_id AS VARCHAR), ''),
                       c -> c != ''), c -> CAST(ascii(c) AS BIGINT))),
                   (acc, c) -> (acc*31 + c) % {TX.HASH_MOD}) + {WS_MIX_B})
                   % {TX.HASH_MOD} + 1 AS DOUBLE) / {TX.HASH_MOD + 1})
                   / n_chars, 6) AS sample_key
        FROM documents
    ) ORDER BY sample_key, doc_id LIMIT {WS_N}
    """,
    tags=("training-data", "sampling", "weighted"),
)
def weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006
    A-ES): each document draws key = -ln(u)/w for a per-doc uniform u
    and weight w = n_chars; the N smallest keys ARE a weighted sample
    without replacement — longer documents proportionally likelier, no
    sequential reservoir needed.

    Determinism: u derives from the portable polynomial hash of doc_id
    through an LCG scramble — exact integer arithmetic in both engines,
    reproducible across cluster layouts (unlike rand(seed), whose draws
    depend on row→partition assignment).  The one float step (ln) is
    rounded to 1e-6 with a doc_id tie-break, the engine's standard
    discipline for transcendental steps.

    Scale shape: keys are computed scan-side (zero exchange); selection
    is orderBy+limit — Spark plans TakeOrderedAndProject, a per-partition
    top-N fold + O(N·partitions) driver merge, never a global sort."""
    d = load_table(spark, sf_dir, "documents")
    h = TX.portable_hash(F.col("doc_id").cast("string"))
    u = (
        ((F.lit(WS_MIX_A) * h + WS_MIX_B) % TX.HASH_MOD + 1).cast("double")
        / F.lit(float(TX.HASH_MOD + 1))
    )
    key = F.round(-F.ln(u) / F.col("n_chars"), 6)
    return (
        d.select("doc_id", "source", "n_chars", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(WS_N)
    )


@register(
    "value_moments",
    oracle=f"""
    SELECT event_type, n,
           CAST({ratio_micro_sql(
               "CAST(CAST(s1 AS DECIMAL(38,6)) * 1000000 AS HUGEINT)",
               "n * 1000000",
           )} AS DOUBLE) / 1000000 AS mean_value,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                 / (n - 1), 6) AS var_value,
           round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)), 6) AS std_value
    FROM (
        SELECT event_type, count(value) AS n,
               sum(CAST(value AS DECIMAL(18,6))) AS s1,
               sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
        FROM events GROUP BY event_type) t
    """,
    tags=("stats", "moments", "A3"),
)
def value_moments(spark, sf_dir):
    """Sample variance/stddev per event type from EXACT decimal power sums
    (n, Σx, Σx²): the map-side partials are decimals, so the moments are
    partitioning-invariant — a double-accumulating stddev differs between
    runs at the last ulp and would break oracle hashing AND cross-run
    reproducibility at 100 TB.  The double math happens once, on the
    three exact totals, in the same expression shape as the oracle."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    sums = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    s1d, s2d, n = F.col("s1").cast("double"), F.col("s2").cast("double"), F.col("n")
    var = (s2d - s1d * s1d / n) / (n - 1)
    return sums.select(
        "event_type",
        "n",
        (
            ratio_micro(F.col("s1") * 1000000, n * 1000000).cast("double")
            / 1000000
        ).alias("mean_value"),
        F.round(var, 6).alias("var_value"),
        F.round(F.sqrt(var), 6).alias("std_value"),
    )


@register(
    "quantity_price_corr",
    oracle="""
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS qty_price_corr
    FROM (
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        FROM lineitem GROUP BY l_returnflag) t
    """,
    tags=("stats", "corr"),
)
def quantity_price_corr(spark, sf_dir):
    """Pearson correlation of quantity vs extended price per return flag,
    from five exact decimal power sums — same single-pass map-side-partial
    shape as `value_moments` (a built-in corr() accumulates doubles in
    visit order and is not partitioning-invariant)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    corr = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    return sums.select(
        "l_returnflag", "n", F.round(corr, 6).alias("qty_price_corr")
    )


@register(
    "pack_sequences_text",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
               string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS ntok
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, shard, ws, ntok,
               CAST(coalesce(sum(ntok) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS prior
        FROM t WHERE ntok > 0
    ),
    b AS (
        SELECT doc_id, lang, shard, ws, ntok, prior,
               unnest(generate_series(prior // {PACK_BUDGET},
                   (prior + ntok - 1) // {PACK_BUDGET})) AS bin
        FROM c
    ),
    pieces AS (
        SELECT lang, shard, bin, doc_id,
               array_to_string(ws[
                   CAST(greatest(bin * {PACK_BUDGET} - prior, 0) AS BIGINT) + 1 :
                   CAST(greatest(bin * {PACK_BUDGET} - prior, 0) AS BIGINT)
                   + CAST(least((bin + 1) * {PACK_BUDGET}, prior + ntok)
                          - greatest(bin * {PACK_BUDGET}, prior) AS BIGINT)
               ], ' ') AS piece,
               CAST(least((bin + 1) * {PACK_BUDGET}, prior + ntok)
                    - greatest(bin * {PACK_BUDGET}, prior) AS BIGINT) AS n_piece
        FROM b
    )
    SELECT lang, CAST(shard AS INTEGER) AS shard, bin,
           string_agg(piece, ' ' ORDER BY doc_id) AS seq_text,
           CAST(sum(n_piece) AS BIGINT) AS seq_tokens
    FROM pieces GROUP BY 1, 2, 3
    """,
    tags=("training-data", "packing", "materialize"),
)
def pack_sequences_text(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("int").alias("shard"),
        F.split("text", " ").alias("ws"),
    ).withColumn("ntok", F.size("ws")).filter(F.col("ntok") > 0)
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "prior", F.coalesce(F.sum("ntok").over(w), F.lit(0)).cast("long")
    )
    b = t.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("prior") / PACK_BUDGET),
                F.floor((F.col("prior") + F.col("ntok") - 1) / PACK_BUDGET),
            )
        ),
    )
    start_in_doc = F.greatest(
        F.col("bin") * PACK_BUDGET - F.col("prior"), F.lit(0).cast("long")
    )
    n_piece = F.least(
        (F.col("bin") + 1) * PACK_BUDGET, F.col("prior") + F.col("ntok")
    ) - F.greatest(F.col("bin") * PACK_BUDGET, F.col("prior"))
    pieces = b.select(
        "lang",
        "shard",
        "bin",
        "doc_id",
        F.array_join(
            F.slice(F.col("ws"), (start_in_doc + 1).cast("int"), n_piece.cast("int")),
            " ",
        ).alias("piece"),
        n_piece.cast("long").alias("n_piece"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("doc_id", "piece")))
    return pieces.groupBy("lang", "shard", "bin").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["piece"]), " "
        ).alias("seq_text"),
        F.sum("n_piece").cast("bigint").alias("seq_tokens"),
    )


pack_sequences_text.__doc__ = """MATERIALIZED packed training sequences: where `sequence_packing`
emits bin accounting, this emits the actual {budget}-token sequence
text per (lang, shard, bin) — documents are sliced at exact token
boundaries where they span bins, pieces concatenate in doc_id order.
Same single (lang, shard) window exchange as pack_bins, plus the
per-bin reassembly agg; each output row is <= budget tokens, so the
collect never exceeds one training sequence.  Zero-token docs are
excluded (they contribute no text; the accounting query counts
them).""".format(budget=PACK_BUDGET)


@register(
    "pack_boundary_masks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
               len(string_split(text, ' ')) AS ntok
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, shard, ntok,
               CAST(coalesce(sum(ntok) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS prior
        FROM t WHERE ntok > 0
    ),
    b AS (
        SELECT doc_id, lang, shard, ntok, prior,
               unnest(generate_series(prior // {PACK_BUDGET},
                   (prior + ntok - 1) // {PACK_BUDGET})) AS bin
        FROM c
    )
    SELECT lang, CAST(shard AS INTEGER) AS shard, bin, doc_id,
           CAST(greatest(prior - bin * {PACK_BUDGET}, 0) AS BIGINT)
               AS start_in_bin,
           CAST(greatest(bin * {PACK_BUDGET} - prior, 0) AS BIGINT)
               AS start_in_doc,
           CAST(least((bin + 1) * {PACK_BUDGET}, prior + ntok)
                - greatest(bin * {PACK_BUDGET}, prior) AS BIGINT) AS n_piece
    FROM b
    """,
    tags=("training-data", "packing", "loss-mask"),
)
def pack_boundary_masks(spark, sf_dir):
    """Document-boundary masks for the packed training sequences: for
    every (lang, shard, bin) produced by ``sequence_packing`` /
    ``pack_sequences_text``, the exact half-open token interval each
    document piece occupies WITHIN the bin (start_in_bin, n_piece) and
    within its source document (start_in_doc) — precisely what a
    trainer needs to (a) reset cross-document attention at piece
    boundaries and (b) mask the loss on tokens that continue a document
    split from the previous bin.  Same interval arithmetic as the
    packing ops, so the three queries are mutually consistent by
    construction.

    Scale shape: identical to ``pack_bins`` — one exchange on
    (lang, shard) for the running-offset window; the bin explode and
    interval arithmetic are scan-side.  Output rows ≈ corpus_tokens /
    budget + n_docs (one row per piece)."""
    d = load_table(spark, sf_dir, "documents")
    t = (
        d.select(
            "doc_id",
            "lang",
            (F.col("doc_id") % PACK_SHARDS).cast("int").alias("shard"),
            F.size(F.split("text", " ")).alias("ntok"),
        )
        .filter(F.col("ntok") > 0)
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "prior", F.coalesce(F.sum("ntok").over(w), F.lit(0)).cast("long")
    )
    b = t.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("prior") / PACK_BUDGET),
                F.floor((F.col("prior") + F.col("ntok") - 1) / PACK_BUDGET),
            )
        ),
    )
    zero = F.lit(0).cast("long")
    return b.select(
        "lang",
        "shard",
        "bin",
        "doc_id",
        F.greatest(F.col("prior") - F.col("bin") * PACK_BUDGET, zero)
        .cast("bigint")
        .alias("start_in_bin"),
        F.greatest(F.col("bin") * PACK_BUDGET - F.col("prior"), zero)
        .cast("bigint")
        .alias("start_in_doc"),
        (
            F.least(
                (F.col("bin") + 1) * PACK_BUDGET,
                F.col("prior") + F.col("ntok"),
            )
            - F.greatest(F.col("bin") * PACK_BUDGET, F.col("prior"))
        )
        .cast("bigint")
        .alias("n_piece"),
    )
