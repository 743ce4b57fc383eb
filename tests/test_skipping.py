"""Predicate-bounds analysis (streaming/skipping.py): SQL predicate →
per-column allowed-range unions, the data-skipping derivation behind
ManifestTable.delete_where.  Soundness = overapproximation: every case
here checks that derived bounds never exclude a matching row."""

from __future__ import annotations

import pytest

from gmallrealtime02_spark.streaming.skipping import (
    predicate_bounds,
    ranges_overlap_stats,
    temporal_canon,
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


def test_temporal_canon_forms():
    # space separator -> 'T'; date-only -> midnight; seconds padded;
    # trailing-zero fractions stripped: equal instants, equal strings
    assert temporal_canon("2024-06-15 12:00:00") == "2024-06-15T12:00:00"
    assert temporal_canon("2024-06-15T12:00:00") == "2024-06-15T12:00:00"
    assert temporal_canon("2024-06-15") == "2024-06-15T00:00:00"
    assert temporal_canon("2024-06-15 12:00") == "2024-06-15T12:00:00"
    assert (
        temporal_canon("2024-06-15 12:00:00.500000")
        == "2024-06-15T12:00:00.5"
    )
    assert temporal_canon("2024-06-15 12:00:00.000") == "2024-06-15T12:00:00"
    assert temporal_canon("not a timestamp") is None
    assert temporal_canon(42) is None
    assert temporal_canon("2024-6-15") is None  # unpadded: not the shape


def test_timestamp_literal_shape_vs_iso_stats():
    """The GDPR-delete soundness case: a space-form SQL timestamp
    literal vs datetime.isoformat() 'T'-form stats.  Raw lexicographic
    order has ' ' < 'T', which wrongly declared a file disjoint
    (ts <= '2024-06-15 12:00:00' vs file min '2024-06-15T11:00:00');
    with temporal=True (column is timestamp-typed per schema) the
    comparison happens on instants."""
    rng = [(None, "2024-06-15 12:00:00")]  # ts <= space-form literal
    iso_lo, iso_hi = "2024-06-15T11:00:00", "2024-06-15T23:00:00"
    # temporal column: 11:00 <= 12:00 -> file MAY hold matching rows
    assert ranges_overlap_stats(rng, iso_lo, iso_hi, temporal=True)
    # and a genuinely disjoint file still prunes
    assert not ranges_overlap_stats(
        [(None, "2024-06-15 10:00:00")], iso_lo, iso_hi, temporal=True
    )
    assert ranges_overlap_stats(
        [("2024-06-15 12:00:00", None)], iso_lo, iso_hi, temporal=True
    )
    assert not ranges_overlap_stats(
        [("2024-06-16 00:00:00", None)], iso_lo, iso_hi, temporal=True
    )
    # date-only literal = midnight instant, not a string prefix
    assert ranges_overlap_stats(
        [(None, "2024-06-15")], "2024-06-15T00:00:00", iso_hi, temporal=True
    )
    # WITHOUT the schema's say-so (plain string column), mixed shapes
    # are incomparable -> file kept, never pruned on a guess
    assert ranges_overlap_stats(rng, iso_lo, iso_hi, temporal=False)
    assert ranges_overlap_stats(
        [(None, "2024-06-15 10:00:00")], iso_lo, iso_hi, temporal=False
    )
    # same shape on both sides: raw order == instant order, prune holds
    # for any column type even without the flag
    assert not ranges_overlap_stats(
        [(None, "2024-06-15T10:00:00")], iso_lo, iso_hi, temporal=False
    )


def test_mixed_shape_literals_widen_intersection():
    """AND-combined literals in different timestamp shapes: the range
    algebra must not pick a tighter bound whose order depends on the
    column's type — the ambiguous side widens to unbounded."""
    assert predicate_bounds(
        "ts >= '2024-06-15 06:00:00' AND ts >= '2024-06-15T08:00:00'"
    ) == {"ts": [(None, None)]}
    # same-shape literals still intersect tightly
    assert predicate_bounds(
        "ts >= '2024-06-15 06:00:00' AND ts >= '2024-06-15 08:00:00'"
    ) == {"ts": [("2024-06-15 08:00:00", None)]}
