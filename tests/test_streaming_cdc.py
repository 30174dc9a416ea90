"""Streaming CDC latest-state parity vs batch cdc_latest
(streaming/cdc_stream.py ≡ operators/cdc.py)."""

from __future__ import annotations

import datetime as dt

from orion_etl_oracle_to_postgres_spark.operators.cdc import cdc_latest
from orion_etl_oracle_to_postgres_spark.streaming.cdc_stream import (
    latest_state_stream,
)

SCHEMA = "k long, ts timestamp, seq long, op string, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows_batch1():
    return [
        (1, T0, 1, "I", 10.0),
        (1, T0 + dt.timedelta(minutes=1), 2, "U", 11.0),
        (2, T0, 3, "I", 20.0),
    ]


def _rows_batch2():
    return [
        (2, T0 + dt.timedelta(minutes=5), 4, "D", None),
        (3, T0 + dt.timedelta(minutes=5), 5, "I", 30.0),
        # out-of-order straggler older than key 1's current latest:
        # must NOT regress the state and must emit nothing for key 1
        (1, T0 - dt.timedelta(minutes=9), 0, "I", 9.0),
    ]


def test_latest_state_stream_matches_batch_cdc_latest(spark, tmp_path):
    land = tmp_path / "cdc_land"
    (land).mkdir()

    def feed(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(land))

    feed(_rows_batch1())
    stream = spark.readStream.schema(SCHEMA).parquet(str(land))
    out = latest_state_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cdc_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["k"]: (r["seq"], r["op"], r["value"])
            for r in spark.sql("SELECT * FROM cdc_out").collect()
        }
        assert first == {1: (2, "U", 11.0), 2: (3, "I", 20.0)}
        feed(_rows_batch2())
        q.processAllAvailable()
        emissions = spark.sql("SELECT * FROM cdc_out").collect()
    finally:
        q.stop()

    # last emission per key == batch cdc_latest over the whole log
    last = {}
    for r in emissions:  # memory sink appends in batch order
        last[r["k"]] = (r["ts"], r["seq"], r["op"], r["value"])
    batch = cdc_latest(
        spark.createDataFrame(_rows_batch1() + _rows_batch2(), SCHEMA),
        ["k"],
        "ts",
        seq_col="seq",
    )
    expect = {r["k"]: (r["ts"], r["seq"], r["op"], r["value"]) for r in batch.collect()}
    assert last == expect
    # the straggler for key 1 produced no third emission
    assert sum(1 for r in emissions if r["k"] == 1) == 1
