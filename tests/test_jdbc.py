"""JDBC source/sink option construction (S1/S5/S6/K1/K2) — no live
database in the dev loop (SURVEY.md §7.5), so these pin everything up to
the Spark reader/writer boundary: URLs, option maps, partitioning."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark.sources.jdbc import jdbc_options
from orion_etl_oracle_to_postgres_spark.spec import (
    OracleConnectorSpec,
    PostgresConnectorSpec,
)

ORA = OracleConnectorSpec(
    user="u", password="p", host="dbhost", port=1521, service_name="ORCL"
)
PG = PostgresConnectorSpec(
    user="u", password="p", host="pghost", port=5432, database="dwh"
)


def test_jdbc_urls():
    assert ORA.jdbc_url == "jdbc:oracle:thin:@//dbhost:1521/ORCL"
    assert PG.jdbc_url == "jdbc:postgresql://pghost:5432/dwh"


def test_basic_table_options():
    opts = jdbc_options(ORA, "CUSTOMER", "SRC")
    assert opts["dbtable"] == "SRC.CUSTOMER"
    assert opts["url"] == ORA.jdbc_url
    # reference batch_size default (mappings/parser.py:143) → fetchsize
    assert opts["fetchsize"] == "5000"
    assert "partitionColumn" not in opts


def test_schemaless_table():
    assert jdbc_options(PG, "customer")["dbtable"] == "customer"


def test_partitioned_read_options():
    opts = jdbc_options(
        PG,
        "orders",
        partition_column="o_orderkey",
        num_partitions=64,
        lower_bound=1,
        upper_bound=6_000_000,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "64"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")


def test_partitioning_defaults_to_32():
    assert jdbc_options(PG, "t", partition_column="id")["numPartitions"] == "32"


def test_query_option_excludes_dbtable():
    opts = jdbc_options(PG, "ignored", query="SELECT 1 AS x")
    assert opts["query"] == "SELECT 1 AS x"
    assert "dbtable" not in opts


def test_fetchsize_override():
    assert jdbc_options(PG, "t", fetchsize=200)["fetchsize"] == "200"
