"""Validation rules V1-V4 × the full on_fail ladder (SURVEY.md §2.7)."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark.operators.validations import (
    apply_validations,
)
from orion_etl_oracle_to_postgres_spark.spec import LookupSpec, ValidationSpec


def _df(spark, rows, schema="id int, v string"):
    return spark.createDataFrame(rows, schema)


def _vals(df, col="v"):
    return [r[col] for r in df.orderBy("id").collect()]


def test_regex_null_policy(spark):
    df = _df(spark, [(1, "abc"), (2, "123"), (3, None)])
    out, _ = apply_validations(df, [("v", ValidationSpec(type="regex", pattern="[a-z]+"))])
    assert _vals(out) == ["abc", None, None]  # NULL passes untouched (ref :18-19)


def test_regex_skip_policy(spark):
    df = _df(spark, [(1, "abc"), (2, "123"), (3, None)])
    out, _ = apply_validations(
        df, [("v", ValidationSpec(type="regex", pattern="[a-z]+", on_fail="skip"))]
    )
    assert _vals(out) == ["abc", None]  # NULL row is kept


def test_regex_default_policy(spark):
    df = _df(spark, [(1, "abc"), (2, "123")])
    out, _ = apply_validations(
        df, [("v", ValidationSpec(type="regex", pattern="[a-z]+", on_fail="default:zz"))]
    )
    assert _vals(out) == ["abc", "zz"]


def test_regex_error_policy_raises(spark):
    df = _df(spark, [(1, "abc"), (2, "123")])
    with pytest.raises(RuntimeError, match="validation regex failed"):
        apply_validations(
            df, [("v", ValidationSpec(type="regex", pattern="[a-z]+", on_fail="error"))]
        )


def test_regex_match_is_start_anchored(spark):
    # reference uses re.match → anchored at start only (ref :25)
    df = _df(spark, [(1, "abc9"), (2, "9abc")])
    out, _ = apply_validations(df, [("v", ValidationSpec(type="regex", pattern="[a-z]+"))])
    assert _vals(out) == ["abc9", None]


def test_range_min_max(spark):
    df = _df(spark, [(1, "5"), (2, "50"), (3, "abc"), (4, None)], "id int, v string")
    out, _ = apply_validations(df, [("v", ValidationSpec(type="range", pattern="0-10"))])
    # non-numeric passes (reference: float() raises → caught → row passes)
    assert _vals(out) == ["5", None, "abc", None]


def test_range_comparator_grammar(spark):
    # the shipped example's ">=0" grammar (table_example.yaml:60) — implemented
    df = _df(spark, [(1, 5.0), (2, -1.0)], "id int, v double")
    out, _ = apply_validations(
        df, [("v", ValidationSpec(type="range", pattern=">=0", on_fail="skip"))]
    )
    assert _vals(out) == [5.0]


def test_range_negative_bounds(spark):
    df = _df(spark, [(1, -5.0), (2, -20.0)], "id int, v double")
    out, _ = apply_validations(df, [("v", ValidationSpec(type="range", pattern="-10-10"))])
    assert _vals(out) == [-5.0, None]


def test_range_unparseable_passes(spark):
    # ref :59-60 — unparseable pattern logged, rows pass
    df = _df(spark, [(1, 5.0)], "id int, v double")
    out, _ = apply_validations(df, [("v", ValidationSpec(type="range", pattern="oops"))])
    assert _vals(out) == [5.0]


def test_lookup_skip_semi_join(spark):
    df = _df(spark, [(1, "a"), (2, "zz"), (3, None)])
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    rule = ValidationSpec(
        type="lookup", lookup=LookupSpec(table="d", key_column="k"), on_fail="skip"
    )
    out, _ = apply_validations(df, [("v", rule)], lookup_resolver=lambda lk: dim)
    assert _vals(out) == ["a", None]  # miss dropped, NULL bypasses


def test_lookup_null_policy(spark):
    df = _df(spark, [(1, "a"), (2, "zz")])
    dim = spark.createDataFrame([("a",)], "k string")
    rule = ValidationSpec(type="lookup", lookup=LookupSpec(table="d", key_column="k"))
    out, _ = apply_validations(df, [("v", rule)], lookup_resolver=lambda lk: dim)
    assert _vals(out) == ["a", None]


def test_lookup_default_policy(spark):
    df = _df(spark, [(1, "a"), (2, "zz")])
    dim = spark.createDataFrame([("a",)], "k string")
    rule = ValidationSpec(
        type="lookup", lookup=LookupSpec(table="d", key_column="k"), on_fail="default:miss"
    )
    out, _ = apply_validations(df, [("v", rule)], lookup_resolver=lambda lk: dim)
    assert _vals(out) == ["a", "miss"]


def test_lookup_error_policy(spark):
    df = _df(spark, [(1, "a"), (2, "zz")])
    dim = spark.createDataFrame([("a",)], "k string")
    rule = ValidationSpec(
        type="lookup", lookup=LookupSpec(table="d", key_column="k"), on_fail="error"
    )
    with pytest.raises(RuntimeError, match="validation lookup failed"):
        apply_validations(df, [("v", rule)], lookup_resolver=lambda lk: dim)


def test_lookup_text_normalized_keys(spark):
    # int probe vs string dim key — both cast to text (ref default_lookup.py:60-68)
    df = _df(spark, [(1, 7), (2, 8)], "id int, v int")
    dim = spark.createDataFrame([("7",)], "k string")
    rule = ValidationSpec(
        type="lookup", lookup=LookupSpec(table="d", key_column="k"), on_fail="skip"
    )
    out, _ = apply_validations(df, [("v", rule)], lookup_resolver=lambda lk: dim)
    assert _vals(out) == [7]


def test_multiple_rules_first_fail_wins(spark):
    # _skip short-circuit ≡ OR of skip predicates (§7.4.6)
    df = _df(spark, [(1, "abc"), (2, "123"), (3, "ab")])
    rules = [
        ("v", ValidationSpec(type="regex", pattern="[a-z]+", on_fail="skip")),
        ("v", ValidationSpec(type="regex", pattern=".{3}", on_fail="skip")),
    ]
    out, _ = apply_validations(df, rules)
    assert _vals(out) == ["abc"]


def test_error_checks_run_before_write(spark):
    # collect mode defers; run_error_checks raises with violation count
    from orion_etl_oracle_to_postgres_spark.operators.validations import run_error_checks

    df = _df(spark, [(1, "abc"), (2, "123"), (3, "456")])
    out, checks = apply_validations(
        df,
        [("v", ValidationSpec(type="regex", pattern="[a-z]+", on_fail="error"))],
        error_mode="collect",
    )
    assert len(checks) == 1
    with pytest.raises(RuntimeError, match="2 violating rows"):
        run_error_checks(out, checks)
