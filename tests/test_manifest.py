"""[EXT] Dataset manifest sink (sinks/manifest.py)."""

from __future__ import annotations

from orion_etl_oracle_to_postgres_spark.sinks.manifest import (
    read_manifest,
    write_manifest,
)


def test_manifest_round_trip_and_invisibility(spark, tmp_path):
    path = str(tmp_path / "ds")
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["id", "v"]
    ).repartition(2).write.parquet(path)
    m = write_manifest(spark, path, extra={"job": "unit"})
    assert m["n_rows"] == 3 and m["job"] == "unit"
    cols = {c["name"]: c for c in m["schema"]}
    assert cols["v"]["n_nulls"] == 1 and cols["id"]["n_nulls"] == 0
    assert cols["id"]["type"] == "bigint"
    assert m["n_files"] >= 1 and m["total_bytes"] > 0

    # underscore file is invisible to the data reader
    back = spark.read.parquet(path)
    assert back.count() == 3 and set(back.columns) == {"id", "v"}

    assert read_manifest(spark, path) == m
