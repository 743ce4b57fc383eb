"""Oracle gate: every registered query with an oracle must hash-match
DuckDB at the correctness scale factor — the same check the driver runs
for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from gmallrealtime02_spark.plans.registry import load_all

from .conftest import assert_matches_oracle

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    assert_matches_oracle(df, duck, q.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # contract: every queries() key with an oracle appears in oracle_sql()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
