"""Regression pins for the differential checker's comparison layering
(tools/check_correctness.py:compare_result) — every layer must actually
run; a broken if/elif chain once made the value comparison dead for all
healthy queries (round-4 self-review finding #1)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_correctness import compare_result

COLS = ["a", "b"]
DT = [("a", "bigint"), ("b", "double")]
DS = [("a", "BIGINT"), ("b", "DOUBLE")]


def test_identical_results_pass():
    rows = [(1, 1.5), (2, 2.5)]
    assert compare_result(COLS, rows, DT, COLS, rows, DS) == []


def test_value_mismatch_is_caught_even_when_everything_else_matches():
    """THE regression: same columns, same types, same row count,
    different values — must fail."""
    s = [(1, 1.5), (2, 2.5)]
    d = [(1, 1.5), (2, 99.0)]
    probs = compare_result(COLS, s, DT, COLS, d, DS)
    assert len(probs) == 1 and "value mismatch" in probs[0]


def test_row_count_mismatch_caught():
    probs = compare_result(COLS, [(1, 1.5)], DT, COLS, [(1, 1.5), (2, 2.5)], DS)
    assert any("rows spark=1 duck=2" in p for p in probs)


def test_type_family_mismatch_caught_alongside_value_check():
    """HUGEINT class: declared-type divergence flags even when the
    fetched Python values hash equal — and does NOT suppress the value
    comparison for other columns."""
    s = [(1, 1.5)]
    d = [(1, 9.9)]
    probs = compare_result(
        COLS, s, DT, COLS, d, [("a", "HUGEINT"), ("b", "DOUBLE")]
    )
    assert any("type-family" in p for p in probs)
    assert any("value mismatch" in p for p in probs)


def test_int_float_value_divergence_caught():
    """Counter would hash 6 == 6.0 identically without the type tags."""
    probs = compare_result(
        ["a"], [(6,)], [("a", "bigint")], ["a"], [(6.0,)], [("a", "DOUBLE")]
    )
    assert probs  # type family AND tagged-value layers both flag it


def test_column_set_mismatch_short_circuits():
    probs = compare_result(["a"], [(1,)], [("a", "bigint")], ["z"], [(1,)], [("z", "BIGINT")])
    assert len(probs) == 1 and "columns" in probs[0]


def test_order_insensitive_and_unordered_duplicates():
    s = [(1, 1.5), (1, 1.5), (2, 2.5)]
    d = [(2, 2.5), (1, 1.5), (1, 1.5)]
    assert compare_result(COLS, s, DT, COLS, d, DS) == []
    # duplicate multiplicity matters
    d2 = [(2, 2.5), (1, 1.5), (2, 2.5)]
    assert compare_result(COLS, s, DT, COLS, d2, DS)


def test_first_50_window_names_all_registered():
    """Every driver-window name must exist in the registry (a typo would
    otherwise silently hand the correctness window to a different
    query), and the rotated dict must lead with exactly that window."""
    import __spark_entry__ as e
    from orion_etl_oracle_to_postgres_spark import queries as q

    assert len(e._FIRST_50) == 50
    assert len(set(e._FIRST_50)) == 50
    qs = e.queries()
    assert list(qs)[:50] == e._FIRST_50
    assert set(qs) == set(q.QUERIES)
    import pytest

    with pytest.raises(KeyError, match="not in the registry"):
        e._rotated({"only": 1}, strict=True)
