"""Opt-in sf0.1 oracle sweep — the scale-correctness gate.

The regular suite (and the grading driver) verify oracles at sf0.01;
this file re-runs EVERY registered oracle at sf0.1, 10× the data.  The
first such sweep (round 5) caught a failure class invisible at small
scale: engine-divergent decimal-midpoint resolution in
``round(exact_integer_ratio, 6)`` outputs (see ``functions/numeric.py``)
— a 128-trigram doc, fully-overlapping jsd pairs, and integer weight
ratios each flipped by exactly 1e-6 only once the data was big enough
to land a ratio on the 5e-7 grid.

Opt in with ``SPARK_GRAFT_SCALE_TESTS=1 python -m pytest
tests/test_scale_oracles.py`` (~10 min on 32 cores); skipped otherwise
so the default suite stays fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from gmallrealtime02_spark.plans.registry import load_all
from gmallrealtime02_spark.schemas import TESTDATA_TABLES

from .conftest import assert_matches_oracle

SCALE_SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_TESTS"),
    reason="sf0.1 oracle sweep is opt-in: set SPARK_GRAFT_SCALE_TESTS=1",
)

QUERIES = load_all()


@pytest.fixture(scope="module")
def duck_scale():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SCALE_SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_at_scale(name, spark, duck_scale):
    q = QUERIES[name]
    df = q.fn(spark, SCALE_SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck_scale, q.oracle)
