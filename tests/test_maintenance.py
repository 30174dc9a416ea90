"""Small-file compaction: row preservation, layout, swap safety."""

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.sinks.maintenance import (
    compact_dataset,
    dataset_bytes,
)


def test_compact_merges_small_files_preserving_rows(spark, tmp_path):
    path = str(tmp_path / "shattered")
    spark.range(0, 10_000).repartition(64).write.parquet(path)
    before = spark.read.parquet(path)
    assert len(before.inputFiles()) == 64
    rows_before = sorted(r["id"] for r in before.collect())

    stats = compact_dataset(spark, path, target_file_mb=512)
    after = spark.read.parquet(path)
    assert stats["files_before"] == 64
    assert stats["files_out"] < 64
    assert len(after.inputFiles()) == stats["files_out"]
    assert sorted(r["id"] for r in after.collect()) == rows_before
    # no leftover staging/backup dirs
    assert not (tmp_path / "shattered.__compact").exists()
    assert not (tmp_path / "shattered.__old").exists()


def test_compact_preserves_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "parts")
    (
        spark.range(0, 2_000)
        .withColumn("p", (F.col("id") % 3).cast("int"))
        .repartition(24)
        .write.partitionBy("p")
        .parquet(path)
    )
    compact_dataset(spark, path, target_file_mb=512, partition_by=["p"])
    after = spark.read.parquet(path)
    assert sorted(r["p"] for r in after.select("p").distinct().collect()) == [0, 1, 2]
    assert after.count() == 2_000
    # hive layout survived: partition dirs exist, files are partition-pure
    assert (tmp_path / "parts" / "p=0").exists()


def test_compact_sorted_runs(spark, tmp_path):
    path = str(tmp_path / "sorted")
    spark.range(0, 5_000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id")
    ).repartition(32).write.parquet(path)
    compact_dataset(spark, path, target_file_mb=512, sort_by=["k"])
    # every output file holds a contiguous sorted k-run
    import pyarrow.parquet as pq

    files = spark.read.parquet(path).inputFiles()
    for f in files:
        ks = pq.read_table(f.replace("file:", "")).column("k").to_pylist()
        assert ks == sorted(ks)


def test_compact_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact_dataset(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        compact_dataset(spark, str(tmp_path), target_file_mb=0)


def test_dataset_bytes_counts(spark, tmp_path):
    path = str(tmp_path / "b")
    spark.range(0, 1000).write.parquet(path)
    assert dataset_bytes(spark, path) > 0


# ------------------------------------------------------------- merge_upsert


def _seed_target(spark, tmp_path, partitioned=False):
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert  # noqa: F401

    path = str(tmp_path / "tgt")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(100)], ["id", "val", "p"]
    )
    w = df.write
    if partitioned:
        w = w.partitionBy("p")
    w.parquet(path)
    return path


def test_merge_upsert_full_rewrite(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert

    path = _seed_target(spark, tmp_path)
    ups = spark.createDataFrame(
        [(5, "NEW5", 1), (200, "NEW200", 0)], ["id", "val", "p"]
    )
    stats = merge_upsert(spark, path, ups, ["id"])
    assert stats == {"updated_partitions": None, "upserts": 2}
    got = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 101 and got[5] == "NEW5" and got[200] == "NEW200"
    assert got[6] == "v6"


def test_merge_upsert_partition_scoped(spark, tmp_path):
    import pyarrow.parquet as pq

    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert

    path = _seed_target(spark, tmp_path, partitioned=True)
    before_files = {
        p: sorted((tmp_path / "tgt" / f"p={p}").glob("*.parquet")) for p in range(4)
    }
    ups = spark.createDataFrame([(1, "NEW1", 1), (101, "NEW101", 1)], ["id", "val", "p"])
    stats = merge_upsert(spark, path, ups, ["id"], partition_by=["p"])
    assert stats == {"updated_partitions": 1, "upserts": 2}
    got = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 101 and got[1] == "NEW1" and got[101] == "NEW101"
    # untouched partitions keep their exact files (no rewrite happened)
    for p in (0, 2, 3):
        assert sorted((tmp_path / "tgt" / f"p={p}").glob("*.parquet")) == before_files[p]
    assert not (tmp_path / "tgt.__merge").exists()


def test_merge_upsert_rejects_dup_keys_and_schema_drift(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert

    path = _seed_target(spark, tmp_path)
    dup = spark.createDataFrame([(1, "a", 0), (1, "b", 0)], ["id", "val", "p"])
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, path, dup, ["id"])
    drift = spark.createDataFrame([(1, "a")], ["id", "other"])
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, path, drift, ["id"])


def test_merge_upsert_escaped_and_null_partition_values(spark, tmp_path):
    """Partition values Spark escapes on disk (spaces) and NULL
    partition values must still swap correctly — the swap walks the
    staging output's real directory names, never re-formats values."""
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert

    path = str(tmp_path / "esc")
    spark.createDataFrame(
        [(1, "a", "North America"), (2, "b", "North America"), (3, "c", None)],
        ["id", "val", "region"],
    ).write.partitionBy("region").parquet(path)
    ups = spark.createDataFrame(
        [(1, "A", "North America"), (3, "C", None)], ["id", "val", "region"]
    )
    stats = merge_upsert(spark, path, ups, ["id"], partition_by=["region"])
    assert stats["upserts"] == 2 and stats["updated_partitions"] == 2
    got = {r["id"]: (r["val"], r["region"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("A", "North America"), 2: ("b", "North America"), 3: ("C", None)}


def test_merge_upsert_key_moving_partitions(spark, tmp_path):
    """An update may carry a different partition value than the stored
    row with the same key (partition_by not a subset of key_cols) — the
    stale old-partition copy must be deleted, not left as a duplicate
    key (ADVICE r3)."""
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert

    path = str(tmp_path / "mv")
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 1)], ["id", "val", "p"]
    ).write.partitionBy("p").parquet(path)
    # id 1 moves p=0 -> p=2; p=0 keeps id 2, so its dir is rewritten
    ups = spark.createDataFrame([(1, "a2", 2)], ["id", "val", "p"])
    merge_upsert(spark, path, ups, ["id"], partition_by=["p"])
    rows = {(r["id"], r["val"], r["p"]) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "a2", 2), (2, "b", 0), (3, "c", 1)}


def test_merge_upsert_move_empties_old_partition(spark, tmp_path):
    """If the moved key was its old partition's ONLY row, the staging
    write produces no directory for it — the emptied home must still be
    removed from the target."""
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import merge_upsert

    path = str(tmp_path / "mv2")
    spark.createDataFrame(
        [(1, "a", 0), (3, "c", 1)], ["id", "val", "p"]
    ).write.partitionBy("p").parquet(path)
    ups = spark.createDataFrame([(1, "a2", 2)], ["id", "val", "p"])
    merge_upsert(spark, path, ups, ["id"], partition_by=["p"])
    rows = {(r["id"], r["val"], r["p"]) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "a2", 2), (3, "c", 1)}
    assert not (tmp_path / "mv2" / "p=0").exists()


def test_snapshot_diff_rejects_duplicate_keys(spark):
    """snapshot_diff asserts per-side key uniqueness up front — dups
    would fan out through the full-outer join (ADVICE r3)."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.reconcile import snapshot_diff

    a = spark.createDataFrame([(1, "x"), (1, "y")], ["id", "v"])
    b = spark.createDataFrame([(1, "x")], ["id", "v"])
    with pytest.raises(ValueError, match="duplicate keys"):
        snapshot_diff(a, b, ["id"])
    with pytest.raises(ValueError, match="duplicate keys"):
        snapshot_diff(b, a, ["id"])
    # opt-out path still builds a plan
    assert snapshot_diff(b, b, ["id"], check_duplicates=False).count() == 1


def test_retention_delete_drops_old_partitions(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import (
        retention_delete,
    )

    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2, 3, 4) for i in range(5)],
        "id int, day string",
    )
    df.write.partitionBy("day").parquet(path)
    out = retention_delete(
        spark, path, partition_col="day", keep_from="2024-01-03",
        value_type="date",
    )
    assert out["deleted"] == ["2024-01-01", "2024-01-02"]
    assert out["kept"] == 2
    back = spark.read.parquet(path)
    # partition-value inference reads the dir values back as DateType
    assert sorted(str(r["day"]) for r in back.select("day").distinct().collect()) == [
        "2024-01-03", "2024-01-04",
    ]


def test_retention_delete_int_ordering_and_flat_refusal(spark, tmp_path):
    import pytest

    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import (
        retention_delete,
    )

    path = str(tmp_path / "ds2")
    df = spark.createDataFrame(
        [(i, b) for b in (2, 9, 10) for i in range(3)], "id int, batch int"
    )
    df.write.partitionBy("batch").parquet(path)
    # int compare: 9 < 10 (lexicographic would wrongly delete '10')
    out = retention_delete(
        spark, path, partition_col="batch", keep_from="10", value_type="int"
    )
    assert out["deleted"] == ["2", "9"] and out["kept"] == 1

    flat = str(tmp_path / "flat")
    spark.range(3).write.parquet(flat)
    with pytest.raises(ValueError, match="partition directories"):
        retention_delete(spark, flat, partition_col="day", keep_from="x")


def test_retention_delete_keeps_null_partition(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import (
        retention_delete,
    )

    path = str(tmp_path / "ds3")
    spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-05"), (3, None)], "id int, day string"
    ).write.partitionBy("day").parquet(path)
    out = retention_delete(
        spark, path, partition_col="day", keep_from="2024-01-03",
        value_type="date",
    )
    # null partition survives (unorderable), old date dropped
    assert out["deleted"] == ["2024-01-01"] and out["kept"] == 2


def test_small_file_report(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.sinks.maintenance import (
        small_file_report,
    )
    import pytest as _pt

    path = str(tmp_path / "frag")
    # 8 tiny files
    spark.range(0, 800).repartition(8).write.parquet(path)
    rep = small_file_report(spark, path, small_mb=1.0)
    assert rep["n_files"] == 8
    assert rep["small_files"] == 8 and rep["small_frac"] == 1.0
    assert rep["min_bytes"] <= rep["median_bytes"] <= rep["max_bytes"]
    assert rep["total_bytes"] > 0
    # _SUCCESS and hidden files are excluded from the census
    import os

    assert any(f.startswith("_") for f in os.listdir(path))
    with _pt.raises(FileNotFoundError):
        small_file_report(spark, str(tmp_path / "nope"))
