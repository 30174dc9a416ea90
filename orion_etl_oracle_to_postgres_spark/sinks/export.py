"""[EXT] Training-shard export (SURVEY.md §2.11): write a corpus as N
equal-ish shards in a DETERMINISTIC pseudo-random order — the layout a
training loader consumes (shard files it can assign to workers, rows
pre-shuffled so sequential reads are already mixed). The reference's
loaders only append to DB tables; an LLM-data engine must also publish
file corpora with reproducible shuffles.

Determinism contract: shard assignment AND within-shard order derive
from the portable md5 hash of (id, seed) — the same rows land in the
same shard in the same order on any engine, any partitioning, any
cluster size. Changing ``seed`` re-deals the global shuffle.

Scale shape: one hash-partitioned exchange ON the shard id (each
output file = one partition), sortWithinPartitions for the intra-shard
order (no global sort), exactly ``n_shards`` files. A `_manifest.json`
beside the data records shard count/seed/row counts so consumers can
verify completeness.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import md5_hash60
from .maintenance import _fs_and_path


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    n_shards: int,
    seed: str = "shard0",
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` to ``path`` as ``n_shards`` shard files (hive dir
    ``shard=K/``), rows pseudo-randomly ordered by the portable hash.
    Returns the manifest dict (also written as ``_manifest.json``)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if id_col not in df.columns:
        raise ValueError(f"id_col {id_col!r} not in {df.columns}")
    for reserved in ("shard", "__h"):
        if reserved in df.columns:
            # silently replacing a user column and consuming it as the
            # hive partition key would drop it from the data files
            raise ValueError(
                f"input already has a {reserved!r} column — rename it "
                "before shard export"
            )
    h = md5_hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
    sharded = (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__h", id_col)
    )
    writer = sharded.drop("__h").write.mode("overwrite").partitionBy("shard")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
    spark: SparkSession = df.sparkSession
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    counts = {
        int(r["shard"]): r["n"]
        for r in reader.load(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "format": fmt,
        "rows_total": sum(counts.values()),
        "rows_per_shard": {str(k): counts.get(k, 0) for k in range(n_shards)},
    }
    # Hadoop FileSystem API, not local Path: hdfs:///s3a:// targets work
    # the same as local ones (mirrors sinks/manifest.write_manifest)
    fs, _ = _fs_and_path(spark, path)
    jvm = spark.sparkContext._jvm
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_manifest.json"), True
    )
    try:
        out.write(bytearray(json.dumps(manifest, indent=2).encode("utf-8")))
    finally:
        out.close()
    return manifest
