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


def test_declarative_manifest_after_load(spark, tmp_path):
    """TableSpec.manifest writes the dataset card beside the target
    after the load; JDBC targets refuse."""
    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, run_table

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame([(1, "a"), (2, None)], ["id", "v"]).write.parquet(
        str(src / "t.parquet")
    )
    g = spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src)),
            target_files=spec_mod.FilesConnectorSpec(base_path=str(out)),
        )
    )
    ctx = JobContext(spark=spark, global_spec=g)
    t = spec_mod.TableSpec(
        source_table="t",
        target_table="t_m",
        manifest=True,
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="v", target="v"),
        ],
    )
    run_table(ctx, t)
    m = read_manifest(spark, str(out / "t_m"))
    assert m["n_rows"] == 2 and m["target_table"] == "t_m"
    assert {c["name"] for c in m["schema"]} == {"id", "v"}
