"""Property-based tests (SURVEY.md §5.4) — hypothesis over the pure
driver-side layers (cell grammars, spec normalization), where thousands
of examples run in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from orion_etl_oracle_to_postgres_spark import configgen as cg
from orion_etl_oracle_to_postgres_spark.spec import MappingSpec

# identifiers as they appear in spreadsheet cells: no grammar
# metacharacters (: = . ,) and no surrounding whitespace
_ident = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: not s.isdigit())


@st.composite
def lookup_specs(draw):
    spec = {"table": draw(_ident), "key_column": draw(_ident)}
    if draw(st.booleans()):
        spec["value_column"] = draw(_ident)
    om = draw(st.sampled_from([None, "skip", "error", "default"]))
    if om:
        spec["on_missing"] = om
    return spec


@given(lookup_specs())
@settings(max_examples=300)
def test_lookup_cell_round_trip(spec):
    assert cg.parse_lookup_cell(cg.format_lookup_cell(spec)) == spec


@st.composite
def validation_rules(draw):
    typ = draw(st.sampled_from(["regex", "range", "lookup"]))
    if typ == "regex":
        # any pattern without the list separator survives the cell format
        pat = draw(st.text(min_size=1, max_size=20).filter(lambda s: "," not in s and s.strip() == s and s))
        return {"type": "regex", "pattern": pat}
    if typ == "range":
        lo, hi = draw(st.integers(-1000, 1000)), draw(st.integers(-1000, 1000))
        return {"type": "range", "pattern": f"{lo}-{hi}"}
    rule = {
        "type": "lookup",
        "lookup": {"table": draw(_ident), "key_column": draw(_ident)},
    }
    of = draw(st.sampled_from([None, "skip", "error"]))
    if of:
        rule["lookup"]["on_missing"] = of
        rule["on_fail"] = of
    return rule


@given(st.lists(validation_rules(), min_size=1, max_size=5))
@settings(max_examples=300)
def test_validation_cell_round_trip(rules):
    assert cg.parse_validation_cell(cg.format_validation_cell(rules)) == rules


@given(st.lists(_ident, min_size=0, max_size=6))
@settings(max_examples=200)
def test_transform_string_normalization(ops):
    """MappingSpec accepts 'a, b ,c' and yields the clean list — the
    reference's comma-grammar (mappings/parser.py:71-75)."""
    joined = " , ".join(ops)
    spec = MappingSpec(source="s", target="t", transform=joined)
    assert (spec.transform or []) == ops


@given(st.lists(st.one_of(_ident, st.just("")), max_size=6))
@settings(max_examples=200)
def test_cell_list_drops_blanks(items):
    out = cg.cell_list(",".join(items))
    expected = [i for i in items if i.strip()] or None
    assert out == expected


# ---- round-4 pure helpers ----

from orion_etl_oracle_to_postgres_spark.compiler import _watermark_sql_literal


@given(st.text(max_size=40))
@settings(max_examples=300)
def test_watermark_string_column_always_quoted_and_escaped(s):
    """For a string-typed watermark column the literal is ALWAYS a
    quoted string (lexicographic compare, matching the Spark-side
    filter) with embedded quotes doubled — no value can break out of
    the literal."""
    lit = _watermark_sql_literal(s, "string")
    assert lit == "'" + s.replace("'", "''") + "'"
    # interior of the literal never contains a lone quote
    assert "''" * lit[1:-1].count("''") or "'" not in lit[1:-1]


@given(st.integers(-10**12, 10**12))
@settings(max_examples=200)
def test_watermark_numeric_column_unquoted(n):
    assert _watermark_sql_literal(n, "bigint") == str(n)
    assert _watermark_sql_literal(str(n), "bigint") == str(n)


import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
from check_correctness import compare_result  # noqa: E402

_cell = st.one_of(
    st.integers(-5, 5),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=5),
    st.none(),
)


@given(st.lists(st.tuples(_cell, _cell), min_size=1, max_size=8), st.data())
@settings(max_examples=150)
def test_compare_result_reflexive_and_change_sensitive(rows, data):
    """Identical result sets always pass; changing any single cell to a
    DIFFERENT value is always caught (the layering bug this guards
    against made healthy queries skip the value comparison)."""
    cols = ["a", "b"]
    dt = [("a", "string"), ("b", "string")]
    ds = [("a", "VARCHAR"), ("b", "VARCHAR")]
    assert compare_result(cols, rows, dt, cols, list(rows), ds) == []
    i = data.draw(st.integers(0, len(rows) - 1))
    j = data.draw(st.integers(0, 1))
    old = rows[i][j]
    new = data.draw(_cell.filter(lambda v: v != old and not (
        isinstance(v, float) and isinstance(old, (int, float)) and v == old)))
    mutated = list(rows)
    t = list(mutated[i]); t[j] = new; mutated[i] = tuple(t)
    assert compare_result(cols, rows, dt, cols, mutated, ds)


# ---------------- KMV set-algebra invariants ----------------
# The sketch math is portable md5 arithmetic, so a pure-Python replay
# IS the model (the same construction the DuckDB oracles replay);
# hypothesis drives the model hard, and test_aggstate pins Spark ==
# model on representative cases (Spark-per-example would be ~1000x
# slower than the property is worth).

import hashlib as _hashlib


def _py_hash60(v, seed: str) -> int:
    return int(
        _hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16
    )


def _py_kmv(vals, k: int, seed: str = "t"):
    return sorted({_py_hash60(v, seed) for v in vals})[:k]


def _py_set_est(a_hashes, b_hashes, k: int):
    ua = set(a_hashes) | set(b_hashes)
    bk = sorted(ua)[:k]
    n_kept = len(bk)
    both = sum(1 for h in bk if h in set(a_hashes) and h in set(b_hashes))
    if n_kept < k:
        union_d = float(n_kept)
    else:
        union_d = round((k - 1) / (bk[-1] / float(1 << 60)), 0)
    rho = both / n_kept if n_kept else 0.0
    return n_kept, int(union_d), int(round(rho * union_d, 0)), round(rho, 6)


@given(
    st.sets(st.integers(0, 10_000), max_size=200),
    st.sets(st.integers(0, 10_000), max_size=200),
    st.integers(4, 64),
)
@settings(max_examples=200)
def test_kmv_set_estimates_model_invariants(a, b, k):
    if not a and not b:
        return
    ha, hb = _py_kmv(a, k), _py_kmv(b, k)
    n_kept, union_est, intersect_est, jac = _py_set_est(ha, hb, k)
    # exact branch: union kept < k  =>  every estimate is exact
    if n_kept < k:
        assert union_est == len(a | b)
        assert intersect_est == len(a & b)
        truth = len(a & b) / len(a | b) if (a | b) else 0.0
        assert abs(jac - round(truth, 6)) <= 1e-6
    # identity: A vs A
    ni, ui, ii, ji = _py_set_est(ha, ha, k)
    assert ii == ui and (ji == 1.0 or ni == 0)
    # bounds: intersection never exceeds union; jaccard in [0, 1]
    assert 0 <= intersect_est <= union_est
    assert 0.0 <= jac <= 1.0
    # disjointness: no shared value => no shared hash (md5 is a pure
    # function) => estimated intersection exactly 0
    if not (a & b):
        assert intersect_est == 0 and jac == 0.0


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=300),
    st.integers(1, 5),
    st.integers(4, 32),
)
@settings(max_examples=200)
def test_kmv_fold_equals_full_build_any_split(vals, n_parts, k):
    """Bottom-k of the union of per-part bottom-k sets == bottom-k of
    everything, for ANY partitioning — the merge exactness the Spark
    operators rely on (the k smallest of a union are each within their
    part's k smallest)."""
    parts = [vals[i::n_parts] for i in range(n_parts)]
    folded = sorted(
        {h for p in parts for h in _py_kmv(p, k)}
    )[:k]
    assert folded == _py_kmv(vals, k)
