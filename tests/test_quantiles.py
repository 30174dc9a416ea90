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
