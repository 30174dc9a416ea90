"""Reconstructed declared-but-missing reference plugins (SURVEY.md §2.6)."""

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table, run_table
from orion_etl_oracle_to_postgres_spark.spec import (
    ConnectorsSpec,
    FilesConnectorSpec,
    GlobalSpec,
    MappingSpec,
    TableSpec,
)


def _ctx(spark, tmp_path, **gkw):
    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "x", "1990-06-15"), (2, "y", "2005-01-01")],
        ["CustomerID", "Some-Name", "birth_date"],
    ).write.mode("overwrite").parquet(str(src / "t.parquet"))
    conns = ConnectorsSpec(
        source_files=FilesConnectorSpec(base_path=str(src)),
        target_files=FilesConnectorSpec(base_path=str(tmp_path / "out")),
    )
    return JobContext(spark, GlobalSpec(connectors=conns, **gkw))


def test_normalize_names_snake_cases_columns(spark, tmp_path):
    ctx = _ctx(spark, tmp_path)
    spec = TableSpec(
        source_table="t",
        target_table="t2",
        transform_plugins=["normalize_names"],
    )
    df = compile_table(ctx, spec).df
    assert set(df.columns) >= {"customer_id", "some_name"}


def test_calculate_age_from_birth_date(spark, tmp_path):
    import datetime as dt

    ctx = _ctx(spark, tmp_path)
    spec = TableSpec(
        source_table="t",
        target_table="t2",
        transform_plugins=["calculate_age_transform"],
        mappings=[
            MappingSpec(source="CustomerID", target="cid"),
            MappingSpec(source="birth_date", target="birth_date"),
        ],
    )
    rows = {r["cid"]: r["age"] for r in compile_table(ctx, spec).df.collect()}
    today = dt.date.today()
    dob = dt.date(1990, 6, 15)
    expect = today.year - dob.year - ((today.month, today.day) < (dob.month, dob.day))
    assert rows[1] == expect


def test_bulk_loader_writes_files(spark, tmp_path):
    ctx = _ctx(spark, tmp_path)
    spec = TableSpec(
        source_table="t",
        target_table="t_bulk",
        loader_plugin="bulk_loader",
        mappings=[MappingSpec(source="CustomerID", target="cid")],
    )
    run_table(ctx, spec)
    assert spark.read.parquet(str(tmp_path / "out" / "t_bulk")).count() == 2


def test_directory_column_mapping_reads_csv_rules(spark, tmp_path, monkeypatch):
    mdir = tmp_path / "mappings"
    mdir.mkdir()
    (mdir / "t.csv").write_text("source,target\nCustomerID,cid\nSome-Name,label\n")
    monkeypatch.setenv("MAPPING_DIR", str(mdir))
    ctx = _ctx(spark, tmp_path, auto_mapping_plugin="directory_column_mapping")
    df = compile_table(ctx, TableSpec(source_table="t", target_table="t2")).df
    assert set(df.columns) == {"cid", "label"}


def test_directory_column_mapping_falls_back_without_file(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("MAPPING_DIR", str(tmp_path / "nope"))
    ctx = _ctx(spark, tmp_path, auto_mapping_plugin="directory_column_mapping")
    df = compile_table(ctx, TableSpec(source_table="t", target_table="t2")).df
    assert set(df.columns) == {"CustomerID", "Some-Name", "birth_date"}


def test_directory_column_mapping_bad_row_raises(spark, tmp_path, monkeypatch):
    mdir = tmp_path / "mappings"
    mdir.mkdir()
    (mdir / "t.csv").write_text("source,target\nonlyonefield\n")
    monkeypatch.setenv("MAPPING_DIR", str(mdir))
    ctx = _ctx(spark, tmp_path, auto_mapping_plugin="directory_column_mapping")
    with pytest.raises(ValueError, match="expected 'source,target'"):
        compile_table(ctx, TableSpec(source_table="t", target_table="t2"))
