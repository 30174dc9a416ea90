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
