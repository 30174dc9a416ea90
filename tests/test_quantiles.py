"""approx_group_quantiles — the bounded-memory percentile scale path
(VERDICT r2 #2; exact gate remains ``agg_exact_percentiles``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.quantiles import (
    approx_group_quantiles,
)


def test_approx_group_quantiles_values_and_shape(spark):
    # two groups, known uniform ranks: 0..999 and 0..99
    df = spark.range(0, 1000).select(
        F.lit("big").alias("g"), F.col("id").cast("double").alias("v")
    ).union(
        spark.range(0, 100).select(
            F.lit("small").alias("g"), F.col("id").cast("double").alias("v")
        )
    )
    out = approx_group_quantiles(df, ["g"], "v", (0.5, 0.9, 0.99), accuracy=10000)
    assert set(out.columns) == {"g", "p50", "p90", "p99", "n"}
    rows = {r["g"]: r for r in out.collect()}
    assert rows["big"]["n"] == 1000 and rows["small"]["n"] == 100
    # rank error <= 1/accuracy -> essentially exact at this size
    assert abs(rows["big"]["p50"] - 499.5) <= 1.0
    assert abs(rows["big"]["p90"] - 899.1) <= 1.0
    assert abs(rows["big"]["p99"] - 989.01) <= 1.5
    assert abs(rows["small"]["p50"] - 49.5) <= 1.0


def test_approx_group_quantiles_is_partial_aggregated(spark):
    """The sketch must combine map-side (two-phase aggregate) — that is
    what keeps the shuffle payload one sketch per group per mapper
    instead of every raw value."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("double").alias("v")
    )
    out = approx_group_quantiles(df, ["g"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") >= 2  # partial + final
    assert "approx_percentile" in plan


def test_winsorize_clamps_and_passes_through(spark):
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("a", 10_000.0), ("a", -5_000.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = winsorize(df, ["g"], "v", lo=0.05, hi=0.95, exact=True)
    vals = {r["v"]: r["v_wins"] for r in out.collect()}
    assert vals[10_000.0] < 10_000.0 and vals[-5_000.0] > -5_000.0
    assert vals[50.0] == 50.0  # interior values untouched
    assert out.count() == df.count()


def test_winsorize_approx_matches_exact_at_high_accuracy(spark):
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import winsorize

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1000)], ["g", "v"]
    )
    ex = {r["v"]: r["v_wins"] for r in winsorize(df, ["g"], "v", exact=True).collect()}
    ap = {r["v"]: r["v_wins"] for r in winsorize(df, ["g"], "v", accuracy=100000).collect()}
    diffs = [abs(ex[k] - ap[k]) for k in ex]
    assert max(diffs) <= 1.0  # rank error 1/accuracy over 1000 values


def test_frequency_bins_balanced_and_deterministic(spark):
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import frequency_bins

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(800)], ["g", "v"]
    )
    out = frequency_bins(df, ["g"], "v", n_bins=8, exact=True)
    counts = {r["bin"]: r["n"] for r in out.groupBy("bin").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert set(counts) == set(range(8))
    assert all(90 <= c <= 110 for c in counts.values())  # ~100 each
    # deterministic under repartitioning
    out2 = frequency_bins(df.repartition(13), ["g"], "v", n_bins=8, exact=True)
    assert {(r["v"], r["bin"]) for r in out.collect()} == {
        (r["v"], r["bin"]) for r in out2.collect()
    }


def test_normalize_columns_zscore_and_minmax(spark):
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import normalize_columns

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 5.0)],
        ["g", "v"],
    )
    z = {(r["g"], r["v"]): r["v_norm"] for r in normalize_columns(df, ["g"], ["v"]).collect()}
    assert z[("a", 10.0)] == 0.0
    assert abs(z[("a", 20.0)] - 1.224745) < 1e-6  # (20-10)/sqrt(200/3)
    assert z[("b", 5.0)] == 0.0  # constant group
    m = {(r["g"], r["v"]): r["v_norm"] for r in normalize_columns(
        df, ["g"], ["v"], method="minmax").collect()}
    assert m[("a", 0.0)] == 0.0 and m[("a", 20.0)] == 1.0 and m[("a", 10.0)] == 0.5
    assert m[("b", 5.0)] == 0.0
    import pytest

    with pytest.raises(ValueError, match="zscore"):
        normalize_columns(df, ["g"], ["v"], method="nope")


def test_null_group_keys_survive_quantile_joins(spark):
    """Rows with NULL group keys must pass through winsorize /
    frequency_bins / normalize_columns, not vanish in a null-rejecting
    equi-join (review r4 #4)."""
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import (
        frequency_bins,
        normalize_columns,
        winsorize,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 6.0)], ["g", "v"]
    )
    for out in (
        winsorize(df, ["g"], "v", exact=True),
        frequency_bins(df, ["g"], "v", n_bins=2, exact=True),
        normalize_columns(df, ["g"], ["v"]),
    ):
        assert out.count() == 4
        assert out.filter("g IS NULL").count() == 2


def test_exact_quantiles_wide_rational_no_overflow(spark):
    """q = 1/3 has a 16-digit numerator in its float repr — the rank
    product must run in DECIMAL(38,0), not longs (silent wrap under
    non-ANSI, ARITHMETIC_OVERFLOW under ANSI, past ~2767 rows)."""
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import (
        exact_quantiles,
    )

    from pyspark.sql import functions as F

    df = spark.range(1, 9001).select(F.col("id").cast("double").alias("v"))
    got = {r.q: r.value for r in exact_quantiles(df, "v", [1 / 3, 0.5]).collect()}
    import math

    assert got[0.5] == 4500.0
    assert got[1 / 3] == float(math.ceil((1 / 3) * 9000))
