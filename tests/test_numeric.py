"""Cross-engine exact rounding (functions.numeric).

``round(double, 6)`` resolves decimal midpoints DIFFERENTLY per engine
(Spark: HALF_UP on the shortest decimal repr; DuckDB: the binary value,
which for a non-representable decimal like 0.0005005 sits a hair below
the midpoint).  The sf0.1 oracle sweep surfaced three queries flipped by
exactly 1e-6 on such midpoints (char_ngram_entropy with a power-of-two
trigram count, source_jsd_matrix on fully-overlapping pairs where
jsd = kl/2 exactly, hashed_ngram_score's integer weight ratios) — all
now rounded via the exact-integer half-away helper this file pins.

The three twins (Spark Column / DuckDB snippet / Python int) must agree
bit-for-bit on adversarial inputs: exact midpoints both signs, values
just off the midpoint, zero, and den=1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallrealtime02_spark.functions.numeric import (
    py_ratio_micro,
    ratio_micro,
    ratio_micro_sql,
)

# (num, den) covering: exact .5 midpoints at 6 dp for both signs (the
# engine-divergent class), off-by-one-ulp neighbours, zero, den=1, and
# the jsd halving shape (odd micro sum / 2).
CASES = [
    (1001, 2_000_000),  # 0.0005005 — the observed jsd midpoint, up
    (-1001, 2_000_000),  # negative midpoint — away from zero, down
    (1, 2_000_000),  # 5e-7: smallest positive midpoint
    (-1, 2_000_000),
    (3, 2),  # integer-range half: 1.5
    (1001, 1),  # den=1 passthrough (scale multiplies out)
    (0, 7),
    (123456789, 987654),  # generic non-midpoint
    (-123456789, 987654),
    (812_4426_5, 128 * 10),  # the 128-trigram entropy shape
]


def test_ratio_micro_three_way_parity(spark, duck):
    rows = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(CASES)], "i long, num long, den long"
    )
    got = {
        r.i: r.m
        for r in rows.select(
            "i", ratio_micro(F.col("num"), F.col("den")).alias("m")
        ).collect()
    }
    sql_vals = "), (".join(f"{i}, {n}, {d}" for i, (n, d) in enumerate(CASES))
    want = dict(
        duck.execute(
            f"SELECT i, {ratio_micro_sql('num', 'den')} FROM "
            f"(VALUES ({sql_vals})) AS t(i, num, den)"
        ).fetchall()
    )
    py = {i: py_ratio_micro(n, d) for i, (n, d) in enumerate(CASES)}
    assert got == {k: int(v) for k, v in want.items()}
    assert got == py
    # the observed midpoints resolve half AWAY FROM ZERO on every engine
    assert py[0] == 501 and py[1] == -501 and py[2] == 1 and py[3] == -1


def test_ratio_micro_scale_one(spark, duck):
    """scale=1 is the integer-rounding form used by the entropy quotient
    and the jsd halving: half_away(num/den) with no micro scaling."""
    cases = [(3, 2), (-3, 2), (1001, 2), (5, 10), (-5, 10), (7, 3)]
    rows = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(cases)], "i long, num long, den long"
    )
    got = {
        r.i: r.m
        for r in rows.select(
            "i", ratio_micro(F.col("num"), F.col("den"), scale=1).alias("m")
        ).collect()
    }
    sql_vals = "), (".join(f"{i}, {n}, {d}" for i, (n, d) in enumerate(cases))
    want = dict(
        duck.execute(
            f"SELECT i, {ratio_micro_sql('num', 'den', scale=1)} FROM "
            f"(VALUES ({sql_vals})) AS t(i, num, den)"
        ).fetchall()
    )
    py = {i: py_ratio_micro(n, d, scale=1) for i, (n, d) in enumerate(cases)}
    assert got == {k: int(v) for k, v in want.items()}
    assert got == py
    assert py[0] == 2 and py[1] == -2  # 1.5 rounds away from zero
    assert py[3] == 1 and py[4] == -1  # 0.5 rounds away from zero


def test_ratio_micro_fuzz_three_way(spark, duck):
    """Hypothesis-style fuzz (deterministic seed, no hypothesis dep
    needed for a pure-integer domain): random (num, den) across the
    magnitudes the call sites produce — micro sums, counts, cent-scaled
    decimals — plus forced near-midpoint constructions.  All three twins
    must agree exactly."""
    import random

    rng = random.Random(20260815)
    cases = []
    for _ in range(400):
        den = rng.randint(1, 10**12)
        num = rng.randint(-(10**12), 10**12)
        cases.append((num, den))
    for _ in range(200):
        # force exact/near midpoints: num/den*1e6 = k +- {0, 1} halves
        den = rng.randint(1, 10**6) * 2
        k = rng.randint(0, 10**6)
        base = (2 * k + 1) * den  # num*2e6 == (2k+1)*den -> exact .5
        if base % (2 * 10**6) == 0:
            cases.append((base // (2 * 10**6), den))
    rows = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(cases)],
        "i long, num long, den long",
    )
    got = {
        r.i: r.m
        for r in rows.select(
            "i", ratio_micro(F.col("num"), F.col("den")).alias("m")
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _rmf(i BIGINT, num BIGINT, den BIGINT)")
    duck.executemany(
        "INSERT INTO _rmf VALUES (?, ?, ?)",
        [(i, n, d) for i, (n, d) in enumerate(cases)],
    )
    want = dict(
        duck.execute(
            f"SELECT i, {ratio_micro_sql('num', 'den')} FROM _rmf"
        ).fetchall()
    )
    duck.execute("DROP TABLE _rmf")
    py = {i: py_ratio_micro(n, d) for i, (n, d) in enumerate(cases)}
    assert got == {k: int(v) for k, v in want.items()}
    assert got == py


def test_ratio_micro_spark_sql_form_parity(spark):
    """The Spark-SQL TEXT twin (for queries written through the
    spark.sql surface) matches the Column form and the Python reference
    bit-for-bit across signs, midpoints, and the 2^53+ magnitudes that
    broke the old int64/double formulation."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.functions.numeric import (
        py_ratio_micro,
        ratio_micro,
        ratio_micro_spark_sql,
    )

    rows = [
        (n, d)
        for n in [-1000001, -5, -3, -1, 0, 1, 3, 5, 1000001]
        for d in [1, 2, 3, 7, 2000000]
    ]
    rows += [
        (2**53 + 1, 10**12),
        (10**12 + 1, 10**12),
        (-(10**12 + 1), 10**12),
        (10**12, 2 * 10**12),
    ]
    df = spark.createDataFrame(rows, "n long, d long")
    out = df.select(
        "n",
        "d",
        ratio_micro(F.col("n"), F.col("d")).alias("col_form"),
        F.expr(ratio_micro_spark_sql("n", "d")).alias("sql_form"),
    ).collect()
    for r in out:
        assert r.col_form == r.sql_form == py_ratio_micro(r.n, r.d), r
