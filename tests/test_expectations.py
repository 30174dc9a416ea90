"""[EXT] Table-level data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark.operators.expectations import (
    Expect,
    enforce,
    run_expectations,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", "X", 5.0),
            (2, "b", "Y", 50.0),
            (3, None, "X", -5.0),
            (3, "d", "Z", 500.0),
        ],
        ["id", "name", "cat", "val"],
    )


def test_report_rows_and_verdicts(spark):
    checks = [
        Expect(type="row_count", min=2, max=10),
        Expect(type="not_null", columns=("name",), max_null_frac=0.3),  # lax: passes
        Expect(type="unique", columns=("id",)),      # fails (two id=3)
        Expect(type="accepted_values", columns=("cat",), values=("X", "Y")),  # Z fails
        Expect(type="bounds", columns=("val",), min=0.0, max=100.0),  # -5, 500 fail
    ]
    rep = {r["check"]: r for r in run_expectations(_df(spark), checks).collect()}
    assert rep["row_count:*"]["passed"] and rep["row_count:*"]["observed"] == 4.0
    assert rep["not_null:name"]["passed"] is True  # 1/4 null <= 0.3
    strict = run_expectations(
        _df(spark), [Expect(type="not_null", columns=("name",))]
    ).collect()
    assert strict[0]["passed"] is False  # strict twin fails (1/4 null)
    assert not rep["unique:id"]["passed"] and rep["unique:id"]["observed"] == 1.0
    assert not rep["accepted_values:cat"]["passed"]
    assert rep["bounds:val"]["observed"] == 2.0 and not rep["bounds:val"]["passed"]
    # the lax and strict twins share a base label -> the second gets a
    # deterministic #2 suffix (input order) so both stay addressable
    twin = {
        r["check"]: r["passed"]
        for r in run_expectations(
            _df(spark),
            [Expect(type="not_null", columns=("name",), max_null_frac=0.3),
             Expect(type="not_null", columns=("name",))],
        ).collect()
    }
    assert twin == {"not_null:name": True, "not_null:name#2": False}


def test_enforce_raises_with_every_failure_listed(spark):
    with pytest.raises(ValueError, match="unique:id.*bounds:val"):
        enforce(
            _df(spark),
            [
                Expect(type="unique", columns=("id",)),
                Expect(type="bounds", columns=("val",), min=0.0, max=100.0),
            ],
        )
    # all-green returns the report
    rep = enforce(_df(spark), [Expect(type="row_count", min=1)])
    assert rep.count() == 1


def test_unknown_type_rejected(spark):
    with pytest.raises(ValueError, match="unknown expectation"):
        run_expectations(_df(spark), [Expect(type="nope")])


def test_declarative_expectations_gate_the_load(spark, tmp_path):
    """TableSpec.expectations: a failing table contract aborts BEFORE
    the write (nothing published); a passing one loads normally."""
    import orion_etl_oracle_to_postgres_spark.spec as spec_mod
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, run_table

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c")], ["id", "name"]
    ).write.parquet(str(src / "t.parquet"))
    g = spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src)),
            target_files=spec_mod.FilesConnectorSpec(base_path=str(out)),
        )
    )
    ctx = JobContext(spark=spark, global_spec=g)

    def mk(checks):
        return spec_mod.TableSpec(
            source_table="t",
            target_table="t_clean",
            mappings=[
                spec_mod.MappingSpec(source="id", target="id"),
                spec_mod.MappingSpec(source="name", target="name"),
            ],
            expectations=checks,
        )

    with pytest.raises(ValueError, match="unique:id"):
        run_table(ctx, mk([spec_mod.ExpectSpec(type="unique", columns=["id"])]))
    assert not (out / "t_clean").exists()  # nothing was published

    run_table(ctx, mk([spec_mod.ExpectSpec(type="row_count", min=3)]))
    assert spark.read.parquet(str(out / "t_clean")).count() == 3


def test_expect_spec_rejects_unknown_type():
    import pytest as _pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod

    with _pytest.raises(Exception, match="expectation type"):
        spec_mod.ExpectSpec(type="nope")


def test_arity_validation_names_the_check(spark):
    d = _df(spark)
    with pytest.raises(ValueError, match="exactly one column"):
        run_expectations(d, [Expect(type="not_null", columns=("id", "name"))])
    with pytest.raises(ValueError, match="exactly one column"):
        run_expectations(d, [Expect(type="bounds")])
    with pytest.raises(ValueError, match="at least one column"):
        run_expectations(d, [Expect(type="unique")])
    with pytest.raises(ValueError, match="takes no columns"):
        run_expectations(d, [Expect(type="row_count", columns=("id",))])


def test_fk_expectation_passes_and_fails(spark):
    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        enforce,
        run_expectations,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    refs = {"parent": parent}
    checks = [Expect(type="fk", columns=("fk",), ref_table="parent", ref_column="pk")]
    rep = run_expectations(child, checks, resolve_ref=refs.__getitem__).collect()
    assert rep[0]["passed"] and rep[0]["observed"] == 0.0  # NULL fk ok
    # orphan -> gate raises with the check named
    bad = spark.createDataFrame([(1, 99)], "id long, fk long")
    import pytest

    with pytest.raises(ValueError, match="fk:fk"):
        enforce(bad, checks, resolve_ref=refs.__getitem__)
    # arity/requirements validated loudly
    with pytest.raises(ValueError, match="fk"):
        run_expectations(child, [Expect(type="fk", columns=("fk",))])
    with pytest.raises(ValueError, match="resolve_ref"):
        run_expectations(child, checks)


def test_fk_expectation_through_compiler(spark, tmp_path):
    import pytest
    from pydantic import ValidationError

    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table, run_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        ExpectSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        TableSpec,
    )

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long").write.parquet(
        str(src / "child.parquet")
    )
    spark.createDataFrame([(10,), (20,)], "pk long").write.parquet(
        str(src / "parent.parquet")
    )
    ctx = JobContext(
        spark,
        GlobalSpec(
            connectors=ConnectorsSpec(
                source_files=FilesConnectorSpec(base_path=str(src)),
                target_files=FilesConnectorSpec(base_path=str(out)),
            )
        ),
    )
    spec = TableSpec(
        source_table="child",
        target_table="child_out",
        mappings=[
            MappingSpec(source="id", target="id"),
            MappingSpec(source="fk", target="fk"),
        ],
        expectations=[
            ExpectSpec(
                type="fk", columns=["fk"], ref_table="parent", ref_column="pk"
            )
        ],
    )
    # fk=99 has no parent -> the gate aborts BEFORE the write
    with pytest.raises(ValueError, match="expectations failed"):
        run_table(ctx, spec)
    assert not (out / "child_out").exists()
    with pytest.raises(ValidationError, match="fk"):
        ExpectSpec(type="fk", columns=["fk"])


def test_freshness_expectation(spark):
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        run_expectations,
    )

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10, 6, 0)), (2, dt.datetime(2024, 1, 10, 12, 0))],
        "id int, ts timestamp",
    )
    fresh = Expect(type="freshness", columns=("ts",),
                   as_of="2024-01-10T13:00:00", max_lag_hours=2.0)
    row = run_expectations(df, [fresh]).collect()[0]
    assert row.passed and abs(row.observed - 1.0) < 1e-9
    stale = Expect(type="freshness", columns=("ts",),
                   as_of="2024-01-12T00:00:00", max_lag_hours=2.0)
    assert run_expectations(df, [stale]).collect()[0].passed is False
    # all-NULL ts: stale by definition, observed inf
    nulls = spark.createDataFrame([(1, None)], "id int, ts timestamp")
    r = run_expectations(nulls, [fresh]).collect()[0]
    assert r.passed is False and r.observed == float("inf")
    # missing as_of / lag fails loudly (wall-clock would be non-replayable)
    import pytest as _pt

    with _pt.raises(ValueError, match="freshness"):
        run_expectations(df, [Expect(type="freshness", columns=("ts",))])


def test_warn_severity_reports_but_never_blocks(spark, caplog):
    import logging

    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        enforce,
    )
    import pytest as _pt

    df = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    warn = Expect(type="not_null", columns=("v",), severity="warn")
    hard = Expect(type="not_null", columns=("v",))
    with caplog.at_level(logging.WARNING):
        report = enforce(df, [warn])  # fails the check but returns
    assert any("WARN" in r.message for r in caplog.records)
    assert report.collect()[0].passed is False
    with _pt.raises(ValueError, match="expectations failed"):
        enforce(df, [hard])  # the error-severity twin still aborts
    # same base label at BOTH severities: the suffix keeps the routing
    # exact — the warn twin logs, the error twin (suffixed #2) aborts,
    # never an 'error wins' collapse over the warn one (ADVICE r6 +
    # review finding r7: rejection outlawed legitimate twins)
    with _pt.raises(ValueError, match="not_null:v#2"):
        enforce(df, [warn, hard])
    with caplog.at_level(logging.WARNING):
        with _pt.raises(ValueError) as ei:
            enforce(df, [hard, warn])  # reversed: #2 is the WARN one
    assert "not_null:v#2" not in str(ei.value)  # warn twin never fatal
    # spec-level validation catches typos
    from pydantic import ValidationError

    from orion_etl_oracle_to_postgres_spark.spec import ExpectSpec

    with _pt.raises(ValidationError, match="severity"):
        ExpectSpec(type="not_null", columns=["v"], severity="loud")


def test_k_anonymity_expectation_gate(spark):
    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        enforce,
        run_expectations,
    )

    rows = [("a", 1)] * 5 + [("b", 2)] * 5 + [("c", 3)]  # (c,3) is a size-1 group
    df = spark.createDataFrame(rows, "seg string, zone int")
    chk = [Expect(type="k_anonymity", columns=("seg", "zone"), min=3)]
    rep = run_expectations(df, chk).collect()
    assert rep[0]["passed"] is False and rep[0]["observed"] == 1.0
    with pytest.raises(ValueError, match="k_anonymity"):
        enforce(df, chk)
    # dropping the singleton group makes the table 3-anonymous
    ok = run_expectations(df.filter("seg <> 'c'"), chk).collect()
    assert ok[0]["passed"] is True
    # validation: k must be >= 2 and columns required
    with pytest.raises(ValueError, match="min"):
        run_expectations(df, [Expect(type="k_anonymity", columns=("seg",))])
    with pytest.raises(ValueError, match="quasi-identifier"):
        run_expectations(df, [Expect(type="k_anonymity", min=3)])
    # warn severity: reported but does not block
    warn = [Expect(type="k_anonymity", columns=("seg", "zone"), min=3, severity="warn")]
    enforce(df, warn)  # no raise


def test_benford_expectation_gate(spark):
    """A Benford-weighted column passes a tight chi-square bar; a
    uniform-leading-digit column fails it; zero/NULL-only columns fail
    vacuously; spec validation demands the bar."""
    import math

    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        run_expectations,
    )

    counts = {d: round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    good = [(float(d),) for d, n in counts.items() for _ in range(n)]
    df_good = spark.createDataFrame(good, "x double")
    out = run_expectations(
        df_good, [Expect(type="benford", columns=("x",), max=20.09)]
    ).collect()
    assert len(out) == 1 and out[0]["passed"]
    assert out[0]["observed"] < 1.0  # near-perfect conformance

    # uniform leading digits: wildly non-Benford at n=900
    df_bad = spark.createDataFrame(
        [(float(d),) for d in range(1, 10) for _ in range(100)], "x double"
    )
    bad = run_expectations(
        df_bad, [Expect(type="benford", columns=("x",), max=20.09)]
    ).collect()
    assert not bad[0]["passed"] and bad[0]["observed"] > 100

    # zero/NULL-only: no leading digit exists -> gate fails loudly
    df_zero = spark.createDataFrame([(0.0,), (None,)], "x double")
    z = run_expectations(
        df_zero, [Expect(type="benford", columns=("x",), max=20.09)]
    ).collect()
    assert not z[0]["passed"] and z[0]["observed"] == float("inf")

    with pytest.raises(ValueError, match="needs max"):
        run_expectations(
            df_good, [Expect(type="benford", columns=("x",))]
        )
    with pytest.raises(ValueError, match="exactly one"):
        run_expectations(
            df_good, [Expect(type="benford", columns=("x", "y"), max=1.0)]
        )

    # the declarative spec accepts the new type (and k_anonymity, which
    # the validator previously rejected despite engine support)
    import orion_etl_oracle_to_postgres_spark.spec as spec_mod

    spec_mod.ExpectSpec(type="benford", columns=["x"], max=20.09)
    spec_mod.ExpectSpec(type="k_anonymity", columns=["a", "b"], min=2)


def test_quantile_expectation_gate(spark):
    """q-quantile banding: a median inside [min, max] passes, a
    shifted distribution fails even though its BOUNDS stay identical
    (the contract bounds can't express); empty/all-NULL fails
    unverifiable; spec demands q and a band."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        run_expectations,
    )
    from orion_etl_oracle_to_postgres_spark.spec import ExpectSpec

    # 0..100 uniform: median 50
    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    chk = Expect(type="quantile", columns=("x",), q=0.5, min=40.0, max=60.0)
    out = run_expectations(df, [chk]).collect()
    assert len(out) == 1 and out[0]["passed"]
    assert abs(out[0]["observed"] - 50.0) <= 1.0
    assert out[0]["check"] == "quantile:x"

    # same bounds (0 and 100 present), mass piled at the top: the
    # bounds check would still pass; the median contract fails
    shifted = spark.createDataFrame(
        [(0.0,)] + [(float(90 + i % 11),) for i in range(100)], "x double"
    )
    bad = run_expectations(shifted, [chk]).collect()
    assert not bad[0]["passed"] and bad[0]["observed"] > 60.0
    both = run_expectations(
        shifted,
        [chk, Expect(type="bounds", columns=("x",), min=0.0, max=100.0)],
    ).collect()
    assert [r["passed"] for r in both] == [False, True]

    # all-NULL: no quantile exists — unverifiable, fail
    nul = spark.createDataFrame([(None,), (None,)], "x double")
    nr = run_expectations(nul, [chk]).collect()
    assert not nr[0]["passed"]

    # validation: q required and in (0,1); a band required; one column
    with pytest.raises(ValueError, match="q in \\(0, 1\\)"):
        run_expectations(df, [Expect(type="quantile", columns=("x",), min=1.0)])
    with pytest.raises(ValueError, match="q in \\(0, 1\\)"):
        ExpectSpec(type="quantile", columns=["x"], q=1.5, min=1.0)
    with pytest.raises(ValueError, match="min and/or max"):
        ExpectSpec(type="quantile", columns=["x"], q=0.5)
    with pytest.raises(ValueError, match="exactly one"):
        run_expectations(
            df, [Expect(type="quantile", columns=("x", "y"), q=0.5, min=0.0)]
        )


def test_distinct_count_expectation_gate(spark):
    """Cardinality banding: exact count(DISTINCT col) in [min, max] —
    the contract neither unique (duplicates) nor row_count (volume)
    expresses; NULLs don't count; a band is demanded at spec parse."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.expectations import (
        Expect,
        run_expectations,
    )
    from orion_etl_oracle_to_postgres_spark.spec import ExpectSpec

    # 300 rows, 25 distinct users, plus NULLs that must not count
    df = spark.createDataFrame(
        [(i % 25,) for i in range(300)] + [(None,)] * 5, "uid int"
    )
    chk = Expect(type="distinct_count", columns=("uid",), min=20, max=30)
    out = run_expectations(df, [chk]).collect()
    assert len(out) == 1 and out[0]["passed"]
    assert out[0]["observed"] == 25.0
    assert out[0]["check"] == "distinct_count:uid"

    # band violated both ways
    low = run_expectations(
        df, [Expect(type="distinct_count", columns=("uid",), min=26)]
    ).collect()
    assert not low[0]["passed"]
    high = run_expectations(
        df, [Expect(type="distinct_count", columns=("uid",), max=24)]
    ).collect()
    assert not high[0]["passed"]

    # composes with plain aggregates in the one wide pass
    both = run_expectations(
        df,
        [chk, Expect(type="not_null", columns=("uid",), max_null_frac=0.1)],
    ).collect()
    assert [r["passed"] for r in both] == [True, True]

    # contracts: band required (operator + spec), one column
    with pytest.raises(ValueError, match="min and/or max"):
        run_expectations(df, [Expect(type="distinct_count", columns=("uid",))])
    with pytest.raises(ValueError, match="min and/or max"):
        ExpectSpec(type="distinct_count", columns=["uid"])
    with pytest.raises(ValueError, match="exactly one"):
        run_expectations(
            df, [Expect(type="distinct_count", columns=("a", "b"), min=1)]
        )
