"""Bucketed co-located joins: the proof that two tables bucketed on the
join key join with NO exchange — the single biggest join cost at 100 TB
(SURVEY.md §4). Also covers the file source/sink format matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.sinks.bucketed import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # saveAsTable uses the session's default warehouse (static conf);
    # DROP TABLE below removes the managed data again
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", bucket_by="o_orderkey", num_buckets=8,
                   sort_by="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", bucket_by="l_orderkey", num_buckets=8,
                   sort_by="l_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Same bucket count + key on both sides ⇒ the shuffle join runs
    with ZERO Exchange operators — each task joins one pre-hashed
    bucket. (Broadcast disabled so the tiny fixture exercises the same
    join strategy a 100 TB ⋈ 100 TB join would use.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed(spark, "b_orders")
        li = read_bucketed(spark, "b_lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "o_orderstatus", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    o = read_bucketed(spark, "b_orders")
    li = read_bucketed(spark, "b_lineitem")
    bucketed_n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    plain_n = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n > 0


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_file_sink_source_round_trip(spark, sf_dir, tmp_path, fmt):
    """The files connector round-trips every supported format, through
    the same source/sink code paths the compiler uses."""
    from orion_etl_oracle_to_postgres_spark.sinks.files import write_file_table
    from orion_etl_oracle_to_postgres_spark.sources.files import read_file_table
    from orion_etl_oracle_to_postgres_spark.spec import FilesConnectorSpec

    conn = FilesConnectorSpec(base_path=str(tmp_path), format=fmt)
    src = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    )
    write_file_table(src, conn, "region_rt")
    back = read_file_table(spark, conn, "region_rt")
    got = {(int(r["r_regionkey"]), r["r_name"]) for r in back.collect()}
    want = {(int(r["r_regionkey"]), r["r_name"]) for r in src.collect()}
    assert got == want
