"""Sketch, probabilistic-membership, and graph operators (north-star
ops — no reference analogue; BASELINE.json ``north_star``): HyperLogLog
distinct counts, count-min heavy hitters, Bloom-filter decontamination,
fixed-point PageRank over the co-view graph, and temperature /
token-budget corpus mixing.

Why sketches are first-class at 100 TB: exact distinct/top-k/membership
over a web corpus either shuffles the full key set or broadcasts it;
a sketch replaces that with a FIXED-SIZE, MERGEABLE summary — HLL's 64
registers, CMS's 1024 cells, Bloom's 8 KB bitmap — so the exchange
carries kilobytes per group regardless of corpus size, and partial
aggregation (map-side max / sum / bit-or) does the heavy fold before
any shuffle.

Determinism discipline (same as the round-3 work): every hash is the
portable polynomial fold shared with the DuckDB oracles, float sums are
either exactly representable (sums of powers of two), decimal, or
integer micro-units, and the one genuinely-float step (HLL's ln in the
linear-counting branch, pow in temperature scaling) is rounded to 1e-6
— so even the approximate operators carry full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..caching import materialized
from ..functions import text as TX
from ..functions.numeric import ratio_micro, ratio_micro_sql
from ..sources import load_table
from .registry import register

P = TX.HASH_MOD

# oracle-side portable hash — single shared definition (functions.text)
_hash_sql = TX.hash_sql


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (p = 6)
HLL_W_BITS = 25  # remaining hash bits after the register index (31 - 6)
HLL_ALPHA = 0.709  # bias constant for m = 64 (Flajolet et al. 2007)
# The raw polynomial fold of a SHORT string stays far below 2^31 (a
# 5-digit key folds to < 31^5 ≈ 2^25), leaving the high bits — exactly
# the bits rho() reads — systematically zero.  One multiplicative
# scramble mod P redistributes the value across the full range; both
# engines compute it in exact BIGINT arithmetic (product < 2^61).
HLL_MIX_A, HLL_MIX_B = 1_103_515_245, 12_345

# rho(w) = leading zeros of w in HLL_W_BITS bits, + 1  ==  (W_BITS + 1)
# - bit_length(w).  bit_length via unrolled integer comparisons — no
# float log2, so the value is exact in any engine.
_RHO_TERMS = [(1 << i) for i in range(HLL_W_BITS)]


def _rho_spark(w):
    bitlen = sum(
        (F.when(w >= t, 1).otherwise(0) for t in _RHO_TERMS), F.lit(0)
    )
    return F.lit(HLL_W_BITS + 1) - bitlen


def _rho_sql(w: str) -> str:
    bitlen = " + ".join(f"CASE WHEN {w} >= {t} THEN 1 ELSE 0 END" for t in _RHO_TERMS)
    return f"({HLL_W_BITS + 1} - ({bitlen}))"


def hll_reg_rho_cols(key_col):
    """(register, rho) columns for a string key — the scan-side half of
    the HLL sketch, shared by the batch query and the streaming twin
    (the stream computes these JVM-side so the stateful Python op only
    merges per-register maxima, never hashes rows)."""
    h = (F.lit(HLL_MIX_A) * TX.portable_hash(key_col) + HLL_MIX_B) % P
    return h.bitwiseAND(HLL_M - 1), _rho_spark(F.shiftright(h, 6))


def hll_estimate_py(regs: list[int]) -> tuple[int, float]:
    """Scalar mirror of the batch estimator (same branch structure and
    1e-6 rounding) for the streaming state op."""
    import math

    hit = sum(1 for r in regs if r > 0)
    z = sum(2.0 ** -r for r in regs if r > 0) + (HLL_M - hit)
    raw = (HLL_ALPHA * HLL_M * HLL_M) / z
    if raw <= 2.5 * HLL_M and hit < HLL_M:
        est = HLL_M * math.log(HLL_M / (HLL_M - hit))
    else:
        est = raw
    return hit, round(est, 6)


def hll_estimate(hit: Column, z_hit: Column) -> Column:
    """HLL estimate (round-6) from hit-register count + hit-side 2^-m
    sum: the bias-corrected raw estimate with the small-range
    linear-counting branch (Flajolet et al. 2007).  ONE definition for
    every consumer (daily, rollup, overlap) — a threshold or rounding
    change lands everywhere at once, keeping the merge-invariance gate
    (rolled-up estimates == direct ones) meaningful."""
    raw = (HLL_ALPHA * HLL_M * HLL_M) / (z_hit + (HLL_M - hit))
    linear = HLL_M * F.log(F.lit(float(HLL_M)) / (HLL_M - hit))
    return F.round(
        F.when((raw <= 2.5 * HLL_M) & (hit < HLL_M), linear).otherwise(raw), 6
    )


_HLL_EST_SQL = f"""
SELECT dt,
       CAST(hit AS INTEGER) AS hit_registers,
       round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                       / (z_hit + ({HLL_M} - hit)) <= 2.5 * {HLL_M}
                   AND hit < {HLL_M}
             THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - hit))
             ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}) / (z_hit + ({HLL_M} - hit))
             END, 6) AS hll_distinct
FROM regs_per_dt
"""

_HLL_ORACLE = f"""
WITH h AS (
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           ({HLL_MIX_A} * {_hash_sql("CAST(user_id AS VARCHAR)")}
            + {HLL_MIX_B}) % {P} AS h
    FROM events
),
regs AS (
    SELECT dt, h & {HLL_M - 1} AS reg,
           max({_rho_sql(f"(h >> {6})")}) AS m
    FROM h GROUP BY 1, 2
),
regs_per_dt AS (
    SELECT dt, count(*) AS hit, sum(power(2.0, -m)) AS z_hit
    FROM regs GROUP BY dt
)
{_HLL_EST_SQL}
"""


@register(
    "hll_distinct_daily",
    oracle=_HLL_ORACLE,
    tags=("sketch", "hll", "approx", "A4"),
)
def hll_distinct_daily(spark, sf_dir):
    """Daily distinct users via a deterministic HyperLogLog sketch
    (m=64 registers, portable polynomial hash).

    The scale story is the whole point: exact COUNT(DISTINCT user) over
    100 TB shuffles every distinct key; the HLL register table is a
    fixed 64 rows per day, built by a (dt, register)→max(rho) partial
    aggregate — map-side combine collapses each task's contribution to
    ≤ days×64 rows BEFORE the exchange, and register tables from any
    partitioning/any day-split MERGE by max.  Standard HLL estimator
    with the small-range linear-counting branch (Flajolet et al. 2007);
    the power-of-two register sum is exactly representable in a double
    (exponent span < 53 bits), so the only true float — ln in the
    linear-counting branch — is rounded to 1e-6, making the whole
    estimate hash-oracle-safe.  Accuracy ~1.04/sqrt(64) ≈ 13%
    (pinned against exact counts in tests/test_approx.py)."""
    e = load_table(spark, sf_dir, "events")
    reg, rho = hll_reg_rho_cols(F.col("user_id").cast("string"))
    regs = (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("dt", "reg")
        .agg(F.max("rho").alias("m"))
    )
    per_dt = regs.groupBy("dt").agg(
        F.count("*").alias("hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_hit"),
    )
    return per_dt.select(
        "dt",
        F.col("hit").cast("int").alias("hit_registers"),
        hll_estimate(F.col("hit"), F.col("z_hit")).alias("hll_distinct"),
    )


_HLL_ROLLUP_ORACLE = f"""
WITH h AS (
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           ({HLL_MIX_A} * {_hash_sql("CAST(user_id AS VARCHAR)")}
            + {HLL_MIX_B}) % {P} AS h
    FROM events
),
daily AS (
    SELECT dt, h & {HLL_M - 1} AS reg,
           max({_rho_sql(f"(h >> {6})")}) AS m
    FROM h GROUP BY 1, 2
),
merged AS (
    SELECT substr(dt, 1, 7) || '-D'
               || CAST((CAST(substr(dt, 9, 2) AS INT) - 1) // 10 AS VARCHAR)
               AS dt,
           reg, max(m) AS m
    FROM daily GROUP BY 1, 2
),
regs_per_dt AS (
    SELECT dt, count(*) AS hit, sum(power(2.0, -m)) AS z_hit
    FROM merged GROUP BY dt
)
{_HLL_EST_SQL}
"""


@register(
    "hll_rollup",
    oracle=_HLL_ROLLUP_ORACLE,
    tags=("sketch", "hll", "approx", "rollup", "A4"),
)
def hll_rollup(spark, sf_dir):
    """Sketch RE-AGGREGATION: the persisted daily HLL register tables
    merge into 10-day-bucket distinct estimates WITHOUT touching raw
    events again — max over registers is the merge operator, so any
    rollup level (day→dekad→month→all-time) reads only the 64-row/day
    sketch table.  This is the property that makes sketches the scale
    path: exact COUNT(DISTINCT) cannot re-aggregate (distinct users/day
    don't sum to distinct users/month), so every exact rollup level
    re-shuffles 100 TB of raw keys; the sketch rollup reads days×64
    rows.  Estimator and rounding identical to ``hll_distinct_daily``;
    merge-invariance (same registers whether built from raw events or
    merged from daily tables) is the max-commutativity the streaming
    twin already pins."""
    e = load_table(spark, sf_dir, "events")
    reg, rho = hll_reg_rho_cols(F.col("user_id").cast("string"))
    daily = (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("dt", "reg")
        .agg(F.max("rho").alias("m"))
    )
    bucket = F.concat(
        F.substring("dt", 1, 7),
        F.lit("-D"),
        F.floor((F.substring("dt", 9, 2).cast("int") - 1) / 10).cast("string"),
    )
    merged = daily.groupBy(bucket.alias("dt"), F.col("reg")).agg(
        F.max("m").alias("m")
    )
    per_dt = merged.groupBy("dt").agg(
        F.count("*").alias("hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_hit"),
    )
    return per_dt.select(
        "dt",
        F.col("hit").cast("int").alias("hit_registers"),
        hll_estimate(F.col("hit"), F.col("z_hit")).alias("hll_distinct"),
    )


def _est_sql(hit: str, z: str) -> str:
    """The HLL estimator as a SQL expression over a hit-count and a
    2^-m register sum (same branches/rounding as ``hll_estimate_py``)."""
    return f"""round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                       / ({z} + ({HLL_M} - {hit})) <= 2.5 * {HLL_M}
                   AND {hit} < {HLL_M}
             THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - {hit}))
             ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}) / ({z} + ({HLL_M} - {hit}))
             END, 6)"""


_HLL_OVERLAP_ORACLE = f"""
WITH h AS (
    SELECT event_type,
           ({HLL_MIX_A} * {_hash_sql("CAST(user_id AS VARCHAR)")}
            + {HLL_MIX_B}) % {P} AS h
    FROM events WHERE event_type IN ('view', 'purchase')
),
seg AS (
    SELECT event_type, h & {HLL_M - 1} AS reg,
           max({_rho_sql(f"(h >> {6})")}) AS m
    FROM h GROUP BY 1, 2
),
uni AS (SELECT reg, max(m) AS m FROM seg GROUP BY reg),
stats AS (
    SELECT
        (SELECT count(*) FROM seg WHERE event_type = 'view') AS hit_a,
        (SELECT sum(power(2.0, -m)) FROM seg WHERE event_type = 'view') AS z_a,
        (SELECT count(*) FROM seg WHERE event_type = 'purchase') AS hit_b,
        (SELECT sum(power(2.0, -m)) FROM seg
         WHERE event_type = 'purchase') AS z_b,
        (SELECT count(*) FROM uni) AS hit_u,
        (SELECT sum(power(2.0, -m)) FROM uni) AS z_u
)
SELECT {_est_sql("hit_a", "z_a")} AS est_viewers,
       {_est_sql("hit_b", "z_b")} AS est_purchasers,
       {_est_sql("hit_u", "z_u")} AS est_union,
       round({_est_sql("hit_a", "z_a")} + {_est_sql("hit_b", "z_b")}
             - {_est_sql("hit_u", "z_u")}, 6) AS est_overlap
FROM stats
"""


@register(
    "hll_overlap",
    oracle=_HLL_OVERLAP_ORACLE,
    tags=("sketch", "hll", "approx", "set-ops"),
)
def hll_overlap(spark, sf_dir):
    """Sketch SET ALGEBRA: approximate |viewers ∩ purchasers| by
    inclusion-exclusion over HLL sketches — union merges by register
    max, intersection = est(A) + est(B) − est(A∪B).  The audience-
    overlap question (§2.7's semi-join family, answered without an
    exact pairwise join): exact overlap of two 100 TB segments shuffles
    every distinct key of both; this reads two 64-register tables.
    Inclusion-exclusion error grows when the overlap is small relative
    to either set (the known HLL-intersection caveat — theta sketches
    fix it; documented, and the estimate is still hash-exact here
    because every term uses the deterministic estimator).

    Scale shape: one event scan → (segment, reg) partial max (≤ 2×64
    rows past the exchange); union registers re-merge from the segment
    tables (sketch-sized), and the final row is scalar algebra."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    reg, rho = hll_reg_rho_cols(F.col("user_id").cast("string"))
    seg = (
        e.select("event_type", reg.alias("reg"), rho.alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m"))
        .persist()
    )
    uni = seg.groupBy("reg").agg(F.max("m").alias("m"))

    est = hll_estimate

    def stats(df, name):
        return df.agg(
            F.count("*").alias(f"hit_{name}"),
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias(f"z_{name}"),
        )

    a = stats(seg.filter(F.col("event_type") == "view"), "a")
    b = stats(seg.filter(F.col("event_type") == "purchase"), "b")
    u = stats(uni, "u")
    row = a.crossJoin(b).crossJoin(u)
    ea = est(F.col("hit_a"), F.col("z_a"))
    eb = est(F.col("hit_b"), F.col("z_b"))
    eu = est(F.col("hit_u"), F.col("z_u"))
    result = row.select(
        ea.alias("est_viewers"),
        eb.alias("est_purchasers"),
        eu.alias("est_union"),
        F.round(ea + eb - eu, 6).alias("est_overlap"),
    )
    from ..caching import materialized

    return materialized(result, seg)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_W = 256  # cells per hash row
# (a, b) pairwise-independent hash params, frozen; pos = ((a*h + b) % P) % W
CMS_PARAMS = [
    (1_000_003, 12_345),
    (999_983, 54_321),
    (1_000_033, 7),
    (1_000_037, 99_991),
]
CMS_TOPK = 20

_CMS_COUNTS_CTE = f"""
counts AS (
    SELECT word, count(*) AS n, {_hash_sql("word")} AS h
    FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w != ''))
                 AS word
          FROM documents)
    GROUP BY word
)
"""

_CMS_CELLS_SQL = " UNION ALL ".join(
    f"SELECT {i} AS row, (({a} * h + {b}) % {P}) % {CMS_W} AS pos, n FROM counts"
    for i, (a, b) in enumerate(CMS_PARAMS)
)

_CMS_PROBE_SQL = " UNION ALL ".join(
    f"SELECT word, n, {i} AS row, (({a} * h + {b}) % {P}) % {CMS_W} AS pos FROM topk"
    for i, (a, b) in enumerate(CMS_PARAMS)
)

_CMS_ORACLE = f"""
WITH {_CMS_COUNTS_CTE.strip()},
cells AS (
    SELECT row, pos, CAST(sum(n) AS BIGINT) AS cell
    FROM ({_CMS_CELLS_SQL}) GROUP BY row, pos
),
topk AS (
    SELECT word, n, h FROM counts ORDER BY n DESC, word LIMIT {CMS_TOPK}
),
probes AS ({_CMS_PROBE_SQL})
SELECT p.word, CAST(min(p.n) AS BIGINT) AS exact_count,
       min(c.cell) AS cms_count
FROM probes p JOIN cells c ON p.row = c.row AND p.pos = c.pos
GROUP BY p.word
"""


@register(
    "cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    tags=("sketch", "count-min", "heavy-hitters", "approx"),
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (d=4 rows × w=256 cells) over corpus tokens,
    probed at the exact top-20 words: exact vs sketch estimate per word
    (CMS never underestimates — gated in tests/test_approx.py).

    One word-keyed exchange builds the per-word counts (partial agg
    collapses repeats map-side); the 1024-cell sketch is then a
    re-aggregation of that table — the corpus is scanned ONCE.  At
    100 TB the sketch itself is the artifact that ships: 1024 mergeable
    cells summarize the full token frequency table, and any node's
    sketch adds cell-wise.  The top-k probe is a broadcast join of 80
    probe rows against the 1024-cell table; exact top-20 selection is a
    distributed TakeOrderedAndProject, not a single-reducer sort."""
    result, caches = _cms_heavy_hitters_plan(spark, sf_dir)
    return materialized(result, *caches)


def _cms_heavy_hitters_plan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .withColumn("h", TX.portable_hash(F.col("word")))
    )
    counts = counts.persist()
    cells = (
        counts.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"),
                            (((F.lit(a) * F.col("h") + b) % P) % CMS_W).alias("pos"),
                        )
                        for i, (a, b) in enumerate(CMS_PARAMS)
                    ]
                )
            ).alias("rp"),
            "n",
        )
        .groupBy(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .agg(F.sum("n").cast("bigint").alias("cell"))
    )
    topk = counts.orderBy(F.col("n").desc(), "word").limit(CMS_TOPK)
    probes = topk.select(
        "word",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (((F.lit(a) * F.col("h") + b) % P) % CMS_W).alias("pos"),
                    )
                    for i, (a, b) in enumerate(CMS_PARAMS)
                ]
            )
        ).alias("rp"),
    ).select("word", "n", "rp.row", "rp.pos")
    result = (
        probes.join(F.broadcast(cells), ["row", "pos"])
        .groupBy("word")
        .agg(
            F.min("n").cast("bigint").alias("exact_count"),
            F.min("cell").alias("cms_count"),
        )
    )
    return result, [counts]


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

BLOOM_M = 65_536  # bits (8 KB bitmap)
BLOOM_PARAMS = [(1_000_003, 1), (999_983, 2), (1_000_033, 3)]  # k = 3 hashes


def bloom_bitmap_words(hashes, col: str = "h") -> list[int]:
    """Build the eval-set Bloom bitmap as 1024 signed-wrapped longs from
    a DataFrame of shingle hashes — the OFFLINE artifact both the batch
    audit (``bloom_decontamination``) and the ingest-stream filter
    (``streaming.jobs.streaming_bloom_decontamination``) ship into their
    plans as one 8 KB array literal.  Bounded driver pull: ≤ BLOOM_M
    distinct bit positions, eval-set-size independent."""
    pos_cols = [
        (((F.lit(a) * F.col(col) + b) % P) % BLOOM_M).cast("int")
        for a, b in BLOOM_PARAMS
    ]
    bit_rows = (
        hashes.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_M // 64)
    for r in bit_rows:
        words[r["pos"] >> 6] |= 1 << (r["pos"] & 63)
    # wrap to signed 64-bit — bit 63 set would overflow a JVM long literal
    return [x - (1 << 64) if x >= (1 << 63) else x for x in words]

_BLOOM_SH4 = """
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(0, len(string_split(text, ' ')) - 4),
        i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
             || ' ' || string_split(text, ' ')[i+3] || ' ' ||
             string_split(text, ' ')[i+4]
    ))) AS shingle
    FROM documents
    WHERE len(string_split(text, ' ')) >= 4
"""

_BLOOM_POS = " UNION ALL ".join(
    f"SELECT doc_id, h, (({a} * h + {b}) % {P}) % {BLOOM_M} AS pos,"
    f" {j} AS j FROM {{src}}"
    for j, (a, b) in enumerate(BLOOM_PARAMS)
)

# Shingles are carried as their 0..P-1 polynomial hashes end-to-end (the
# membership test is hash-equality in both branches; with P ~ 1e9+7 a
# cross-shingle collision is rare and identically mirrored in both
# engines).  Spark never materializes shingle STRINGS at all
# (shingle_hashes_fast rolling composition) — strings were ~60% of this
# query's runtime.
_BLOOM_ORACLE = f"""
WITH sh AS ({_BLOOM_SH4}),
shh AS (SELECT DISTINCT doc_id, {_hash_sql("shingle")} AS h FROM sh),
ev AS (SELECT * FROM shh WHERE doc_id % 97 = 0),
tr AS (SELECT * FROM shh WHERE doc_id % 97 <> 0),
bits AS (SELECT DISTINCT pos FROM ({_BLOOM_POS.format(src="ev")})),
tr_pos AS ({_BLOOM_POS.format(src="tr")}),
tr_flag AS (
    SELECT t.doc_id, t.h,
           CASE WHEN count(b.pos) = {len(BLOOM_PARAMS)} THEN 1 ELSE 0 END
               AS bloom_hit
    FROM tr_pos t LEFT JOIN bits b ON t.pos = b.pos
    GROUP BY t.doc_id, t.h
),
ev_set AS (SELECT DISTINCT h FROM ev),
tr_exact AS (
    SELECT t.doc_id, t.h,
           CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
    FROM tr t
    LEFT JOIN ev_set e ON t.h = e.h
)
SELECT f.doc_id AS train_doc,
       count(*) AS n_shingles,
       CAST(sum(f.bloom_hit) AS BIGINT) AS bloom_hits,
       CAST(sum(x.exact_hit) AS BIGINT) AS exact_hits
FROM tr_flag f
JOIN tr_exact x ON f.doc_id = x.doc_id AND f.h = x.h
GROUP BY f.doc_id
"""


@register(
    "bloom_decontamination",
    oracle=_BLOOM_ORACLE,
    tags=("sketch", "bloom", "decontamination", "training-data"),
)
def bloom_decontamination(spark, sf_dir):
    """Decontamination via a Bloom filter of the eval set's 4-gram
    shingles (m=65,536 bits, k=3 portable hashes), audited against the
    exact join: per training doc, how many of its distinct shingles the
    Bloom filter flags vs how many truly appear in the eval set (the
    difference is the sketch's false positives — Bloom never misses).

    Scale story vs `decontamination`'s broadcast of raw eval shingles:
    the Bloom bitmap is 8 KB REGARDLESS of eval-set size, so the probe
    side stays a scan-local bitmap test — zero shuffle of training
    shingles, no giant broadcast.  The bitmap pull is a bounded
    driver-side collect (≤ m distinct bit positions, the same class as
    the k-means centroid pull); the only exchange is the final per-doc
    count aggregation.  Shingles never exist as STRINGS on the Spark
    side: membership is hash-equality end-to-end (see oracle comment),
    so the rolling composition (`shingle_hashes_fast`) touches each
    character once and allocates nothing — measured 5.5 s -> ~1.5 s at
    sf0.1 vs the string-building form."""
    from ..functions import similarity as S
    from ..sources.tables import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sh = S.shingle_hash_table(d, ("doc_id",), n=4).select(
        "doc_id", F.explode(F.array_distinct("hs")).alias("h")
    )
    ev = sh.filter(F.col("doc_id") % 97 == 0)
    tr = sh.filter(F.col("doc_id") % 97 != 0)

    pos_cols = [
        (((F.lit(a) * F.col("h") + b) % P) % BLOOM_M).cast("int")
        for a, b in BLOOM_PARAMS
    ]
    words = bloom_bitmap_words(ev)
    # one true array LITERAL, not CreateArray(1024 exprs): the latter
    # rebuilds the array per row per probe (3x1024 allocs/row measured at
    # 5.5 s for this query; the folded literal takes it to ~1 s)
    bitmap = F.lit(words).cast("array<long>")

    probe = tr.select(
        "doc_id", "h", *[c.alias(f"p{j}") for j, c in enumerate(pos_cols)]
    )
    # per-bit test: bitmap[pos >> 6] & (1 << (pos & 63)) != 0, scan-side
    hit = F.lit(True)
    for j in range(len(BLOOM_PARAMS)):
        pj = F.col(f"p{j}")
        word = F.element_at(bitmap, (F.shiftright(pj, 6) + 1).cast("int"))
        hit = hit & (word.bitwiseAND(F.expr(f"shiftleft(1L, p{j} % 64)")) != 0)
    ev_set = ev.select("h").distinct()
    flagged = probe.withColumn("bloom_hit", F.when(hit, 1).otherwise(0)).join(
        F.broadcast(ev_set.withColumn("exact_hit", F.lit(1))), "h", "left"
    )
    return flagged.groupBy(F.col("doc_id").alias("train_doc")).agg(
        F.count("*").alias("n_shingles"),
        F.sum("bloom_hit").cast("bigint").alias("bloom_hits"),
        F.sum(F.coalesce(F.col("exact_hit"), F.lit(0))).cast("bigint").alias("exact_hits"),
    )


# ---------------------------------------------------------------------------
# PageRank over the co-view item graph (fixed-point integer arithmetic)
# ---------------------------------------------------------------------------

PR_ITERS = 3
PR_SCALE = 10**12  # micro-rank units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def _pr_iter_sql(prev: str, out: str) -> str:
    return f""",
{out}_in AS (
    SELECT e.dst AS item, sum(r.rank_u // d.deg) AS inc
    FROM edges e
    JOIN {prev} r ON e.src = r.item
    JOIN deg d ON e.src = d.item
    GROUP BY e.dst
),
{out} AS (
    SELECT n.item,
           (({PR_DAMP_DEN} - {PR_DAMP_NUM}) * ({PR_SCALE} // nn.n)) // {PR_DAMP_DEN}
           + ({PR_DAMP_NUM} * coalesce(i.inc, 0)) // {PR_DAMP_DEN} AS rank_u
    FROM nodes n CROSS JOIN nn LEFT JOIN {out}_in i ON n.item = i.item
)"""


_PR_ORACLE = (
    f"""
WITH ui AS (
    SELECT DISTINCT user_id, CAST(props->>'$.k' AS INTEGER) AS item
    FROM events WHERE event_type = 'view'
),
edges AS (
    SELECT DISTINCT a.item AS src, b.item AS dst
    FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
),
nodes AS (SELECT DISTINCT item FROM ui),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src AS item, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT n.item, {PR_SCALE} // nn.n AS rank_u
       FROM nodes n CROSS JOIN nn)"""
    + "".join(_pr_iter_sql(f"r{i}", f"r{i+1}") for i in range(PR_ITERS))
    + f"""
SELECT item, CAST(rank_u AS BIGINT) AS rank_micro,
       CAST(rank_u AS DOUBLE) / {PR_SCALE} AS rank
FROM r{PR_ITERS}
"""
)


@register(
    "coview_pagerank",
    oracle=_PR_ORACLE,
    tags=("graph", "pagerank", "iterative"),
)
def coview_pagerank(spark, sf_dir):
    result, caches = _coview_pagerank_plan(spark, sf_dir)
    return materialized(result, *caches)


coview_pagerank.__doc__ = """PageRank ({iters} iterations, damping 0.85) over the item co-view
graph: items are nodes, an edge a→b exists when some user viewed
both.  Ranks are exact fixed-point integers (micro-units ×1e12,
integer division for the per-edge split) — bit-identical across
engines, partitionings, and iteration schedules, with no
order-dependent float accumulation anywhere.

Scale shape: the (user, item) distinct projection bounds the
self-join fan-out by the per-user catalog slice; the EDGES table is
built once, persisted partitioned by src, and every iteration joins
the O(nodes) rank table INTO it — the big table's exchange happens
once, each Lloyd-style pass shuffles only rank partials keyed by
dst.  Heavy-hitter users (crawlers) would be capped upstream in
production; the cap is a one-line filter on per-user distinct items.
""".format(iters=PR_ITERS)


def _coview_pagerank_plan(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ui = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    b = ui.select(F.col("user_id").alias("uid"), F.col("item").alias("item_b"))
    edges = (
        ui.join(b, (ui.user_id == b.uid) & (ui.item != b.item_b))
        .select(F.col("item").alias("src"), F.col("item_b").alias("dst"))
        .distinct()
        .repartition("src")
        .persist()
    )
    # isolated items (viewed but never co-viewed) still hold base rank,
    # so nodes come from the user-item projection, not the edge list
    nodes = ui.select("item").distinct().persist()
    nn = nodes.agg(F.count("*").alias("n"))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "item", F.expr(f"{PR_SCALE} div n").alias("rank_u"), "n"
    )
    # rank/degree tables are O(catalog items) — bounded smallness, so the
    # broadcast hints hold at any corpus scale: each iteration's join
    # against the big persisted edges table is map-side, and the only
    # per-iteration exchange is the O(nodes) dst-keyed rank partial.
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(
                F.broadcast(ranks.select("item", "rank_u")),
                edges.src == F.col("item"),
            )
            .join(
                F.broadcast(deg.withColumnRenamed("src", "ditem")),
                F.col("ditem") == edges.src,
            )
            .select("dst", F.expr("rank_u div deg").alias("c"))
        )
        inc = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(F.broadcast(inc), nodes.item == inc.dst, "left")
            .select(
                "item",
                (
                    F.expr(
                        f"(({PR_DAMP_DEN - PR_DAMP_NUM}) * ({PR_SCALE} div n))"
                        f" div {PR_DAMP_DEN}"
                    )
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(inc, 0L)) div {PR_DAMP_DEN}"
                    )
                ).alias("rank_u"),
                "n",
            )
        )
    result = ranks.select(
        "item",
        F.col("rank_u").alias("rank_micro"),
        (F.col("rank_u").cast("double") / PR_SCALE).alias("rank"),
    )
    return result, [edges, nodes, deg]


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing + token-budget selection
# ---------------------------------------------------------------------------

TEMP_ALPHA_NUM, TEMP_ALPHA_DEN = 7, 10  # alpha = 0.7
TEMP_BUDGET_DOCS = 100_000

_TEMP_ORACLE = f"""
WITH c AS (SELECT source, count(*) AS docs FROM documents GROUP BY source),
t AS (SELECT sum(docs) AS total FROM c),
w AS (
    SELECT source, docs,
           CAST(round(power(CAST(docs AS DOUBLE) / t.total,
                            {TEMP_ALPHA_NUM}.0 / {TEMP_ALPHA_DEN}) * 1e6, 0)
                AS BIGINT) AS w_u
    FROM c CROSS JOIN t
),
d AS (SELECT sum(w_u) AS denom FROM w)
SELECT source, docs,
       CAST({ratio_micro_sql("w_u", "d.denom")} AS DOUBLE) / 1000000
           AS weight,
       CAST((w_u * {TEMP_BUDGET_DOCS}) // d.denom AS BIGINT) AS planned_docs
FROM w CROSS JOIN d
"""


@register(
    "temperature_mix",
    oracle=_TEMP_ORACLE,
    tags=("training-data", "mixing", "sampling"),
)
def temperature_mix(spark, sf_dir):
    """Temperature-scaled source sampling weights (alpha = 0.7, the
    multilingual-LM rebalancing rule: w_s ∝ p_s^alpha): flattens the
    source distribution so rare sources are upsampled.  The pow() output
    is immediately quantized to integer micro-units, so the normalizing
    sum is an exact BIGINT — order-independent and hash-oracle-safe
    (a raw float sum over sources would vary with aggregation order).
    Two tiny aggregates over an O(sources) table; the corpus is scanned
    once for the counts."""
    result, caches = _temperature_mix_plan(spark, sf_dir)
    return materialized(result, *caches)


def _temperature_mix_plan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count("*").alias("docs")).persist()
    t = c.agg(F.sum("docs").alias("total"))
    w = c.crossJoin(F.broadcast(t)).select(
        "source",
        "docs",
        F.round(
            F.pow(
                F.col("docs").cast("double") / F.col("total"),
                F.lit(TEMP_ALPHA_NUM / TEMP_ALPHA_DEN),
            )
            * 1e6,
            0,
        )
        .cast("bigint")
        .alias("w_u"),
    )
    denom = w.agg(F.sum("w_u").alias("denom"))
    result = w.crossJoin(F.broadcast(denom)).select(
        "source",
        "docs",
        (
            ratio_micro(F.col("w_u"), F.col("denom")).cast("double")
            / 1000000
        ).alias("weight"),
        F.expr(f"(w_u * {TEMP_BUDGET_DOCS}) div denom").alias("planned_docs"),
    )
    return result, [c]


TOKEN_BUDGET_PER_LANG = 20_000

_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS ntok
    FROM documents
),
c AS (
    SELECT lang, ntok,
           CAST(sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
    FROM t
)
SELECT lang, count(*) AS docs_selected,
       CAST(sum(ntok) AS BIGINT) AS tokens_selected
FROM c WHERE cum <= {TOKEN_BUDGET_PER_LANG}
GROUP BY lang
"""


@register(
    "token_budget_mix",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("training-data", "mixing", "window"),
)
def token_budget_mix(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    t = d.select("doc_id", "lang", ntok.alias("ntok"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("cum", F.sum("ntok").over(w).cast("long"))
    return (
        c.filter(F.col("cum") <= TOKEN_BUDGET_PER_LANG)
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs_selected"),
            F.sum("ntok").cast("bigint").alias("tokens_selected"),
        )
    )


token_budget_mix.__doc__ = """Token-budget corpus selection: per language, admit documents in
doc_id order until the cumulative token count hits the budget
({budget} tokens) — the deterministic greedy fill used to hold a
per-language token quota in a training mixture.  One (lang) window
exchange (same shape as sequence_packing's stream fill); selection
and accounting happen in the same pass.""".format(
    budget=TOKEN_BUDGET_PER_LANG
)


# ---------------------------------------------------------------------------
# Banded interval join (big-big range join)
# ---------------------------------------------------------------------------

INTERVAL_US = 3_600_000_000  # ±1 hour, in microseconds

_IVJ_ORACLE = f"""
WITH e AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS t
           FROM events WHERE event_type = 'error'),
p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'purchase')
SELECT e.error_id, p.purchase_id, p.t - e.t AS delta_us
FROM e JOIN p ON e.user_id = p.user_id
WHERE abs(p.t - e.t) <= {INTERVAL_US}
"""


@register(
    "interval_error_purchase_join",
    oracle=_IVJ_ORACLE,
    tags=("join", "range", "interval"),
)
def interval_error_purchase_join(spark, sf_dir):
    """Interval self-join: pair every error event with the same user's
    purchases within ±1 hour — the big-big RANGE join that a plain theta
    join would execute as a per-user cross product.

    The banded rewrite (the standard distributed interval-join shape,
    cf. Flink's interval join): quantize time into 1-hour buckets, give
    each purchase its one bucket, explode each error to its bucket ±1,
    equi-join on (user_id, bucket), then apply the exact |Δt| filter.
    Each true pair matches exactly once (the purchase's bucket is always
    within 1 of the error's), the fan-out is a fixed 3x on one side
    only, and the join is a hash equi-join Catalyst can shuffle/AQE
    like any other — no nested-loop, no per-user quadratic blowup from
    hot users.  `price_band_join` covers the small-side theta join;
    this covers the case where BOTH sides are corpus-scale.

    delta_us is exact integer µs (timestamp_diff), hash-oracle-safe."""
    e = load_table(spark, sf_dir, "events")
    epoch = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        epoch.alias("te"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        epoch.alias("tp"),
    )
    bucket_e = F.floor(F.col("te") / INTERVAL_US)
    eb = errors.withColumn(
        "bucket", F.explode(F.array(bucket_e - 1, bucket_e, bucket_e + 1))
    )
    pb = purchases.withColumn("bucket", F.floor(F.col("tp") / INTERVAL_US))
    return (
        eb.join(pb, (eb.user_id == pb.p_user) & (eb.bucket == pb.bucket))
        .filter(F.abs(F.col("tp") - F.col("te")) <= INTERVAL_US)
        .select(
            "error_id",
            "purchase_id",
            (F.col("tp") - F.col("te")).alias("delta_us"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

HIST_BINS = 256

_HQ_PCTS = (("p50", 0.5), ("p90", 0.9))

# explicit floor-based half-up rounding: round()'s tie rule differs
# between engines on negative values; floor(x*1e6 + 0.5)/1e6 is the
# same deterministic function of the (bit-identical) interpolation x
# CAST the percentile literals to DOUBLE: DuckDB parses a bare
# fractional literal as DECIMAL and would compute exact decimal
# intermediates where Spark uses doubles (the round-3 bm25 lesson).
# arg_min/min_by picks the FIRST crossing bin's estimate (the estimate
# expression is not monotone in bin, so a plain min() over values is
# wrong past the crossing).
_HQ_EST_SQL = ", ".join(
    f"""floor(arg_min(CASE WHEN cum >= CAST({p} AS DOUBLE) * n THEN
        lo + (hi - lo) * (bin + (CAST({p} AS DOUBLE) * n - (cum - ct)) / ct)
            / {HIST_BINS} END,
        CASE WHEN cum >= CAST({p} AS DOUBLE) * n THEN bin
             ELSE {HIST_BINS} END) * 1e6 + 0.5) / 1e6 AS {name}"""
    for name, p in _HQ_PCTS
)

_HQ_ORACLE = f"""
WITH bounds AS (
    SELECT event_type, min(value) AS lo, max(value) AS hi,
           count(value) AS n
    FROM events GROUP BY event_type
),
bins AS (
    SELECT e.event_type,
           CASE WHEN b.hi = b.lo THEN 0
                ELSE least(CAST(floor((e.value - b.lo) / (b.hi - b.lo)
                                      * {HIST_BINS})
                           AS BIGINT), {HIST_BINS - 1}) END AS bin,
           count(*) AS ct
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY 1, 2
),
cums AS (
    SELECT event_type, bin, ct,
           sum(ct) OVER (PARTITION BY event_type ORDER BY bin
                         ROWS UNBOUNDED PRECEDING) AS cum
    FROM bins
)
SELECT c.event_type, b.n, {_HQ_EST_SQL}
FROM cums c JOIN bounds b ON c.event_type = b.event_type
GROUP BY c.event_type, b.n
"""


@register(
    "histogram_quantiles",
    oracle=_HQ_ORACLE,
    tags=("sketch", "quantile", "approx"),
)
def histogram_quantiles(spark, sf_dir):
    """Approximate p50/p90 per event type from a fixed 256-bin equi-width
    histogram — the deterministic, MERGEABLE quantile sketch (t-digest /
    GK summaries are order-dependent: the same data in a different
    partition layout yields different centroids, which breaks both
    reproducibility and cross-engine oracling; a histogram's integer bin
    counts merge by addition in any order).

    Two passes, both partial-agg-shaped: (1) per-type min/max/count —
    O(types) rows cross the exchange; (2) per-(type, bin) counts —
    ≤ types×256 rows.  The percentile is linear interpolation inside the
    first bin whose cumulative count crosses p·n; worst-case error is
    one bin width, (hi−lo)/256 (gated vs the exact percentiles in
    tests/test_approx.py).  At 100 TB the histogram is the artifact that
    ships, and day-over-day histograms add cell-wise for windowed
    quantiles — what no exact-percentile plan can do."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("value").alias("n"),
    )
    binned = (
        e.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            # hi == lo (constant series) guard: Spark's x/0 is NULL and
            # DuckDB's 0/0 is NaN — divergent AND oracle-crashing; a
            # degenerate range is one bin holding everything, so pin
            # bin 0 explicitly on both sides
            F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * HIST_BINS
                    ).cast("bigint"),
                    F.lit(HIST_BINS - 1).cast("bigint"),
                )
            )
            .alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("ct"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = binned.withColumn("cum", F.sum("ct").over(w))
    j = cums.join(F.broadcast(bounds), "event_type")
    aggs = [
        (
            F.floor(
                F.min_by(
                    F.when(
                        F.col("cum") >= p * F.col("n"),
                        F.col("lo")
                        + (F.col("hi") - F.col("lo"))
                        * (
                            F.col("bin")
                            + (p * F.col("n") - (F.col("cum") - F.col("ct")))
                            / F.col("ct")
                        )
                        / HIST_BINS,
                    ),
                    F.when(
                        F.col("cum") >= p * F.col("n"), F.col("bin")
                    ).otherwise(F.lit(HIST_BINS)),
                )
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias(name)
        for name, p in _HQ_PCTS
    ]
    return j.groupBy("event_type", "n").agg(*aggs)
