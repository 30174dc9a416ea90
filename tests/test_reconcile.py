"""Snapshot reconciliation: classification, null-safety, errors."""

import pytest

from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
    diff_summary,
    snapshot_diff,
)


def test_classification_matrix(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["diff_status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "same",
        2: "changed",   # s differs
        3: "removed",
        4: "same",      # NULL == NULL is same (null-safe compare)
        5: "added",
    }
    summary = {r["diff_status"]: r["n"] for r in
               diff_summary(snapshot_diff(old, new, ["k"])).collect()}
    assert summary == {"same": 2, "changed": 1, "removed": 1, "added": 1}


def test_null_key_rows_match_across_sides(spark):
    old = spark.createDataFrame([(None, "x")], "k string, v string")
    new = spark.createDataFrame([(None, "x")], "k string, v string")
    rows = snapshot_diff(old, new, ["k"]).collect()
    # NULL keys join null-safely: present on both sides, same payload
    assert [(r["k"], r["diff_status"]) for r in rows] == [(None, "same")]


def test_compare_cols_subset_and_errors(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "ZZZ", 1.0)], "k long, s string, v double")
    # comparing only v: the s difference is ignored
    got = snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()
    assert got[0]["diff_status"] == "same"
    with pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="lacks key columns"):
        snapshot_diff(old, new, ["nope"])
    with pytest.raises(ValueError, match="lacks columns"):
        snapshot_diff(old, new, ["k"], compare_cols=["nope"])
