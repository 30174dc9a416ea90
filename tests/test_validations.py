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


# ------------------------------------------------------------ quarantine


def _quar_job(spark, tmp_path, quarantine_table="rejects"):
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, run_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        TableSpec,
        ValidationSpec,
    )

    src = tmp_path / "src"
    rows = [
        (1, "AA", 10.0),   # clean
        (2, "xx", 20.0),   # regex reject
        (3, "BB", -5.0),   # range reject
        (4, "yy", 999.0),  # both rules
    ]
    spark.createDataFrame(rows, ["id", "code", "val"]).write.parquet(
        str(src / "t.parquet")
    )
    conns = ConnectorsSpec(
        source_files=FilesConnectorSpec(base_path=str(src)),
        target_files=FilesConnectorSpec(base_path=str(tmp_path / "out")),
    )
    ctx = JobContext(spark, GlobalSpec(connectors=conns))
    spec = TableSpec(
        source_table="t",
        target_table="t_clean",
        quarantine_table=quarantine_table,
        mappings=[
            MappingSpec(source="id", target="id"),
            MappingSpec(
                source="code",
                target="code",
                validation=[
                    ValidationSpec(type="regex", pattern="[A-Z]+", on_fail="quarantine")
                ],
            ),
            MappingSpec(
                source="val",
                target="val",
                validation=[
                    ValidationSpec(type="range", pattern="0-100", on_fail="quarantine")
                ],
            ),
        ],
    )
    run_table(ctx, spec)
    return tmp_path / "out"


def test_quarantine_splits_and_writes_both_outputs(spark, tmp_path):
    out = _quar_job(spark, tmp_path)
    clean = spark.read.parquet(str(out / "t_clean")).collect()
    assert sorted(r["id"] for r in clean) == [1]
    rej = {r["id"]: r["_quarantine_rules"] for r in
           spark.read.parquet(str(out / "rejects")).collect()}
    assert rej == {
        2: "regex:code",
        3: "range:val",
        4: "regex:code,range:val",  # every failed rule, declaration order
    }
    # quarantine rows keep the full pipeline schema + the label column
    cols = set(spark.read.parquet(str(out / "rejects")).columns)
    assert cols == {"id", "code", "val", "_quarantine_rules"}


def test_quarantine_without_sink_degrades_to_skip(spark, tmp_path, caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        out = _quar_job(spark, tmp_path, quarantine_table=None)
    clean = spark.read.parquet(str(out / "t_clean")).collect()
    assert sorted(r["id"] for r in clean) == [1]
    assert not (out / "rejects").exists()
    assert any("quarantine" in r.message for r in caplog.records)


def test_per_rule_violation_metrics_ride_the_write(spark, tmp_path, caplog):
    """Rule-level reject accounting comes from the sink's own action —
    the counters are CollectMetrics accumulators, not a second scan."""
    import logging

    from orion_etl_oracle_to_postgres_spark.compiler import (
        JobContext,
        compile_table,
        run_table,
    )
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        TableSpec,
        ValidationSpec,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "ok", 5.0), (2, "??", 5.0), (3, "ok", -1.0), (4, "??", -2.0)],
        ["id", "code", "val"],
    ).write.parquet(str(src / "t.parquet"))
    conns = ConnectorsSpec(
        source_files=FilesConnectorSpec(base_path=str(src)),
        target_files=FilesConnectorSpec(base_path=str(tmp_path / "out")),
    )
    ctx = JobContext(spark, GlobalSpec(connectors=conns))
    spec = TableSpec(
        source_table="t",
        target_table="t2",
        mappings=[
            MappingSpec(source="id", target="id"),
            MappingSpec(
                source="code",
                target="code",
                validation=[ValidationSpec(type="regex", pattern="[a-z]+", on_fail="skip")],
            ),
            MappingSpec(
                source="val",
                target="val",
                validation=[ValidationSpec(type="range", pattern="0-100")],  # null-fill
            ),
        ],
    )
    with caplog.at_level(logging.WARNING):
        run_table(ctx, spec)
    msgs = [r.message for r in caplog.records if "violating rows" in r.message]
    assert any("regex:code — 2" in m for m in msgs)
    # sequential semantics: the skip rule already dropped row 4, so the
    # range rule sees (and counts) only row 3
    assert any("range:val — 1" in m for m in msgs)

    # compiled form exposes the same counters programmatically
    compiled = compile_table(ctx, spec)
    compiled.df.count()
    got = {label: obs.get["violations"] for label, obs in compiled.validation_metrics}
    assert got == {"regex:code": 2, "range:val": 1}


def test_quarantined_row_survives_later_skip_rule(spark):
    """A row failing an earlier quarantine rule AND a later skip rule
    must still reach the quarantine output (the audit contract), while
    untagged rows get normal skip semantics."""
    from orion_etl_oracle_to_postgres_spark.operators.validations import (
        apply_validations,
        split_quarantine,
    )

    df = spark.createDataFrame(
        [
            (1, "??", "bad"),   # quarantine (code) AND skip (flag)
            (2, "ok", "bad"),   # skip only -> silently dropped
            (3, "??", "good"),  # quarantine only
            (4, "ok", "good"),  # clean
        ],
        ["id", "code", "flag"],
    )
    out, _ = apply_validations(
        df,
        [
            ("code", ValidationSpec(type="regex", pattern="[a-z]+", on_fail="quarantine")),
            ("flag", ValidationSpec(type="regex", pattern="good", on_fail="skip")),
        ],
    )
    clean, quar = split_quarantine(out)
    assert sorted(r["id"] for r in clean.collect()) == [4]
    q = {r["id"]: r["_quarantine_rules"] for r in quar.collect()}
    assert q == {1: "regex:code", 3: "regex:code"}
