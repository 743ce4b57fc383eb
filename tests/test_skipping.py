"""Predicate-bounds analysis (streaming/skipping.py): SQL predicate →
per-column allowed-range unions, the data-skipping derivation behind
ManifestTable.delete_where.  Soundness = overapproximation: every case
here checks that derived bounds never exclude a matching row."""

from __future__ import annotations

import pytest

from gmallrealtime02_spark.streaming.skipping import (
    predicate_bounds,
    ranges_overlap_stats,
)


@pytest.mark.parametrize(
    "cond,want",
    [
        ("l_quantity <= 10", {"l_quantity": [(None, 10)]}),
        ("l_quantity < 10 AND l_quantity > 2", {"l_quantity": [(2, 10)]}),
        (
            "l_shipmode IN ('AIR','RAIL') AND l_quantity <= 10",
            {
                "l_shipmode": [("AIR", "AIR"), ("RAIL", "RAIL")],
                "l_quantity": [(None, 10)],
            },
        ),
        (
            "dt = '2026-01-01' OR dt = '2026-01-03'",
            {"dt": [("2026-01-01", "2026-01-01"), ("2026-01-03", "2026-01-03")]},
        ),
        ("a = 1 OR b = 2", {}),  # OR across columns: nothing learnable
        ("NOT (a = 1)", {}),  # negation: conservative TOP
        ("a = 1 AND (b = 2 OR b = 4)", {"a": [(1, 1)], "b": [(2, 2), (4, 4)]}),
        ("a BETWEEN 3 AND 7", {"a": [(3, 7)]}),
        ("a != 5", {}),
        ("a IS NULL", {}),
        ("a = 1 OR a IS NULL", {}),  # the IS NULL side admits anything
        ("5 < a", {"a": [(5, None)]}),
        ("upper(a) = 'X'", {}),  # function call: unparseable -> TOP
        ("a = 1 AND junk ~~ 3", {}),  # garbage anywhere -> whole TOP
        ("price >= 1.5 AND price <= 2.5", {"price": [(1.5, 2.5)]}),
        ("a = 'it''s'", {"a": [("it's", "it's")]}),
        ("a = b", {}),  # col-vs-col: nothing learnable
    ],
)
def test_predicate_bounds(cond, want):
    assert predicate_bounds(cond) == want


def test_ranges_overlap_stats_conservative():
    assert ranges_overlap_stats([(2, 10)], 5, 7)
    assert not ranges_overlap_stats([(2, 10)], 11, 20)
    assert not ranges_overlap_stats([(None, 10)], 11, 20)
    assert ranges_overlap_stats([(None, 10)], 10, 20)  # boundary touches
    assert not ranges_overlap_stats([("AIR", "AIR")], "MAIL", "TRUCK")
    assert ranges_overlap_stats([("AIR", "AIR")], "AIB", "AIS")
    assert not ranges_overlap_stats([(5, None)], 1, 4)
    # type-incomparable encodings: keep the file (skip-only contract)
    assert ranges_overlap_stats([(5, 6)], "a", "b")
