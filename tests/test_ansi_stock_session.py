"""Portability gate: every registered query must execute under a STOCK
SparkSession — ANSI mode on (the Spark 4 default), no legacy confs, none
of session.py's settings. This is exactly the environment the external
correctness harness builds, and round 1 lost 4 queries to conf coupling
(nanosAsLong never set at the read site; a MinHash band family that
relied on non-ANSI mod-2^64 wraparound).

The full differential check runs in tools/check_correctness.py (needs
DuckDB); here we assert the cheaper invariant that used to break: the
plan builds and executes without throwing on a stock session.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from orion_etl_oracle_to_postgres_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stock_spark(spark):
    """A session with ANSI ON and the legacy parquet conf cleared —
    reusing the shared JVM (a second local SparkContext would be slow),
    restoring conf afterwards so other test modules are unaffected."""
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    prev_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev_ansi)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)


@pytest.mark.parametrize("name", sorted(q.QUERIES))
def test_query_runs_under_ansi(stock_spark: SparkSession, name: str):
    df = q.QUERIES[name](stock_spark, SF_DIR)
    # executing (not just building) the plan is what catches ANSI
    # overflow / illegal-parquet-type errors
    assert df.count() >= 0
    # read paths may set nanosAsLong themselves (that IS the fix); ANSI
    # must never be touched by the engine
    assert stock_spark.conf.get("spark.sql.ansi.enabled") == "true"
