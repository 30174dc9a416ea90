"""[EXT] CDC changelog application (operators/cdc.py)."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark.operators import cdc


def _log(spark):
    rows = [
        # key, ts, seq, op, val
        (1, "2024-01-01 10:00:00", 1, "I", 10.0),
        (1, "2024-01-02 10:00:00", 2, "U", 11.0),
        (2, "2024-01-01 09:00:00", 3, "I", 20.0),
        (2, "2024-01-03 09:00:00", 4, "D", None),
        (3, "2024-01-01 08:00:00", 5, "I", 30.0),
        (3, "2024-01-01 08:00:00", 6, "U", 31.0),  # same-ts tie -> seq wins
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "op", "val"])
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_cdc_apply_state(spark):
    state = {r["k"]: r["val"] for r in cdc.cdc_apply(_log(spark), ["k"], "ts", "op", seq_col="seq").collect()}
    assert state == {1: 11.0, 3: 31.0}  # key 2 deleted; tie broke to seq 6


def test_cdc_snapshot_at_resurrects_predelete_state(spark):
    snap = cdc.cdc_snapshot_at(
        _log(spark), "2024-01-02 23:59:59", ["k"], "ts", "op", seq_col="seq"
    )
    state = {r["k"]: r["val"] for r in snap.collect()}
    assert state == {1: 11.0, 2: 20.0, 3: 31.0}  # delete not yet applied


def test_cdc_latest_requires_keys_and_is_single_aggregate(spark):
    with pytest.raises(ValueError, match="key column"):
        cdc.cdc_latest(_log(spark), [], "ts")
    plan = cdc.cdc_latest(_log(spark), ["k"], "ts", seq_col="seq")._jdf.queryExecution().executedPlan().toString()
    # the property that matters at scale: a PARTIAL max_by runs before
    # the exchange (shuffle carries one candidate per key per partition)
    # and no Window node sorts the whole log
    assert "partial_max_by" in plan and "Window" not in plan
