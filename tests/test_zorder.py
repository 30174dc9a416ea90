"""Z-order clustering: pruning power vs linear sort, key correctness."""

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.sinks.zorder import zorder_key, zorder_write


def _xy(spark, n=40_000):
    # two independent uniform columns derived from hashes
    return spark.range(n).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) % 1000).alias("x"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 1000).alias("y"),
    )


def _files_intersecting(files, col, lo, hi):
    import pyarrow.parquet as pq

    n = 0
    for f in files:
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        idx = md.schema.to_arrow_schema().names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) <= hi and max(maxs) >= lo:
            n += 1
    return n


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    df = _xy(spark)
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(lin)
    )
    zorder_write(df, zo, ["x", "y"], n_files=16)

    lin_files = spark.read.parquet(lin).inputFiles()
    zo_files = spark.read.parquet(zo).inputFiles()
    assert len(zo_files) == 16

    # x-box: both layouts prune
    assert _files_intersecting(lin_files, "x", 100, 150) <= 3
    assert _files_intersecting(zo_files, "x", 100, 150) <= 8
    # y-box: linear sort can't prune at all; z-order must
    lin_y = _files_intersecting(lin_files, "y", 100, 150)
    zo_y = _files_intersecting(zo_files, "y", 100, 150)
    assert lin_y == 16
    assert zo_y < lin_y

    # layout change must not change the data
    assert (
        sorted(r["id"] for r in spark.read.parquet(zo).collect())
        == sorted(r["id"] for r in df.collect())
    )


def test_zorder_key_orders_quadrants(spark):
    # the Morton curve visits quadrants in (low,low) (high,low)
    # (low,high) (high,high) order for 2 columns x 1 bit
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)], ["x", "y"]
    )
    out = df.withColumn("z", zorder_key(df, ["x", "y"], bits=1)).collect()
    z = {(r["x"], r["y"]): r["z"] for r in out}
    assert z[(0.0, 0.0)] < z[(1.0, 0.0)] < z[(0.0, 1.0)] < z[(1.0, 1.0)]


def test_zorder_rejects_bad_args(spark):
    df = _xy(spark, 10)
    with pytest.raises(ValueError):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=40)


def test_declarative_zorder_spec(spark, tmp_path):
    """TableSpec.zorder_by routes the write through zorder_write;
    invalid combinations refuse loudly."""
    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, run_table

    src = tmp_path / "src"
    out = tmp_path / "out"
    rows = [(i, float(i % 50), float((i * 7) % 50)) for i in range(2000)]
    spark.createDataFrame(rows, ["id", "x", "y"]).write.parquet(str(src / "t.parquet"))
    g = spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src)),
            target_files=spec_mod.FilesConnectorSpec(base_path=str(out)),
        )
    )
    ctx = JobContext(spark=spark, global_spec=g)
    t = spec_mod.TableSpec(
        source_table="t",
        target_table="t_z",
        zorder_by=["x", "y"],
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="x", target="x"),
            spec_mod.MappingSpec(source="y", target="y"),
        ],
    )
    run_table(ctx, t)
    got = spark.read.parquet(str(out / "t_z"))
    assert got.count() == 2000 and set(got.columns) == {"id", "x", "y"}

    # invalid combos are config errors caught at SPEC VALIDATION (before
    # any compute), not at write time
    with pytest.raises(Exception, match="mutually exclusive"):
        spec_mod.TableSpec(
            source_table="t", target_table="t_z",
            zorder_by=["x", "y"], sort_by=["x"],
        )
    with pytest.raises(Exception, match="scd2"):
        spec_mod.TableSpec(
            source_table="t", target_table="t_z",
            zorder_by=["x", "y"],
            scd2=spec_mod.Scd2Spec(
                key="x", compare_columns=["y"], effective_time="2024-01-01"
            ),
        )
    with pytest.raises(Exception, match="streaming"):
        spec_mod.TableSpec(
            source_table="t", target_table="t_z",
            zorder_by=["x", "y"],
            incremental=spec_mod.IncrementalSpec(
                watermark_column="x", mode="streaming"
            ),
        )
