"""[EXT] Deterministic training-shard export."""

from __future__ import annotations

import json

import pytest

from orion_etl_oracle_to_postgres_spark.sinks.export import export_training_shards


def test_export_shards_deterministic_and_complete(spark, tmp_path):
    df = spark.range(0, 200).selectExpr("id", "id * 2 AS v")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_training_shards(df, p1, "id", n_shards=4, seed="s")
    m2 = export_training_shards(df, p2, "id", n_shards=4, seed="s")
    assert m1["rows_total"] == 200
    assert m1["rows_per_shard"] == m2["rows_per_shard"]
    # same rows per shard, same intra-shard ORDER, across runs
    for k in range(4):
        a = spark.read.parquet(f"{p1}/shard={k}").collect()
        b = spark.read.parquet(f"{p2}/shard={k}").collect()
        assert [r["id"] for r in a] == [r["id"] for r in b]
    # no shard empty at this size, all ids present exactly once
    assert all(v > 0 for v in m1["rows_per_shard"].values())
    back = spark.read.parquet(p1)
    assert back.count() == 200 and back.select("id").distinct().count() == 200
    # manifest on disk matches the return
    assert json.loads((tmp_path / "a" / "_manifest.json").read_text()) == m1


def test_export_shards_reseed_redeals(spark, tmp_path):
    df = spark.range(0, 100)
    m1 = export_training_shards(df, str(tmp_path / "x"), "id", n_shards=3, seed="s1")
    m2 = export_training_shards(df, str(tmp_path / "y"), "id", n_shards=3, seed="s2")
    a = [r["id"] for r in spark.read.parquet(str(tmp_path / "x") + "/shard=0").collect()]
    b = [r["id"] for r in spark.read.parquet(str(tmp_path / "y") + "/shard=0").collect()]
    assert a != b  # different deal
    assert m1["rows_total"] == m2["rows_total"] == 100


def test_export_shards_guards(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="n_shards"):
        export_training_shards(df, str(tmp_path / "z"), "id", n_shards=0)
    with pytest.raises(ValueError, match="id_col"):
        export_training_shards(df, str(tmp_path / "z"), "nope", n_shards=2)


def test_declarative_shards_in_table_spec(spark, tmp_path):
    """TableSpec.shards routes the files write through the shard
    exporter; layout conflicts are refused at spec build."""
    import json

    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, run_table

    src = tmp_path / "src"
    spark.range(0, 60).selectExpr("id", "id % 7 AS v").write.parquet(
        str(src / "t.parquet")
    )
    g = spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src)),
            target_files=spec_mod.FilesConnectorSpec(base_path=str(tmp_path / "out")),
        )
    )
    t = spec_mod.TableSpec(
        source_table="t",
        target_table="t_sharded",
        shards=spec_mod.ShardsSpec(n=3, id_column="id", seed="s"),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="v", target="v"),
        ],
    )
    run_table(JobContext(spark=spark, global_spec=g), t)
    out_path = tmp_path / "out" / "t_sharded"
    m = json.loads((out_path / "_manifest.json").read_text())
    assert m["n_shards"] == 3 and m["rows_total"] == 60
    back = spark.read.parquet(str(out_path))
    assert back.count() == 60
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) == {0, 1, 2}

    with pytest.raises(ValueError, match="layout choice"):
        t.model_copy(update={"partition_by": ["v"]}).model_validate(
            t.model_copy(update={"partition_by": ["v"]}).model_dump()
        )


def test_shards_layout_conflicts_refused():
    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod

    base = dict(
        source_table="t",
        target_table="o",
        shards=spec_mod.ShardsSpec(n=2, id_column="id"),
        mappings=[spec_mod.MappingSpec(source="id", target="id")],
    )
    with pytest.raises(ValueError, match="incremental"):
        spec_mod.TableSpec(
            **base, incremental=spec_mod.IncrementalSpec(watermark_column="id")
        )
    with pytest.raises(ValueError, match="write_mode=overwrite"):
        spec_mod.TableSpec(**base, write_mode="append")
    with pytest.raises(ValueError, match="_manifest"):
        spec_mod.TableSpec(**base, manifest=True)


def test_shards_reserved_column_refused(spark, tmp_path):
    import pytest

    df = spark.range(5).selectExpr("id", "id AS shard")
    with pytest.raises(ValueError, match="shard"):
        export_training_shards(df, str(tmp_path / "s"), "id", n_shards=2)
