"""Dataset maintenance: small-file compaction.

At 100 TB the silent killer isn't a slow operator — it's a table that
has accreted millions of kilobyte files (streaming micro-batches,
per-task partitioned writes, incremental appends). Every downstream
scan then pays file-open and footer-read costs that dwarf the data
read, and the driver burns minutes listing. Compaction rewrites a
dataset into files near a target size and is the standard periodic
chore (Delta/Iceberg `OPTIMIZE` — here for plain directories).

The reference engine (Dims24/orion-etl-oracle-to-postgres) writes to
Postgres and has no file layout concern; this is [EXT] engine surface
for the file-backed side (SURVEY.md §2.11).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _fs_and_path(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` — works for file://, hdfs://,
    s3a://... (the same resolution Spark's own writers use)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` (recursive, data files only)."""
    fs, jpath = _fs_and_path(spark, path)
    summary = fs.getContentSummary(jpath)
    return int(summary.getLength())


def compact_dataset(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the dataset at ``path`` into ~``target_file_mb`` files.

    Output file count = ceil(current total bytes / target) — computed
    from the actual layout, not guessed. ``partition_by`` preserves a
    hive-style layout (each partition directory is compacted, files
    stay partition-pure); ``sort_by`` re-clusters rows within output
    files for row-group pruning. The rewrite goes to ``<path>.__compact``
    first, then swaps via two renames — crash-safe in the sense that
    the original survives any failure before the final rename pair
    (re-run to finish); readers racing the swap should be scheduled
    around it, same as any non-transactional table format.

    Returns ``{"bytes": ..., "files_before": ..., "files_out": ...}``.
    """
    if target_file_mb <= 0:
        raise ValueError(f"target_file_mb must be positive, got {target_file_mb}")
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        raise FileNotFoundError(path)

    total = dataset_bytes(spark, path)
    df = spark.read.format(fmt).load(path)
    files_before = len(df.inputFiles())
    n_out = max(1, -(-total // (target_file_mb * 1024 * 1024)))

    if partition_by:
        # partition-pure files: shuffle on the partition columns so each
        # output task holds whole partition values (same rule as
        # sinks/files.py); n_out caps the per-value file explosion
        staged = df.repartition(int(n_out), *[F.col(c) for c in partition_by])
    elif sort_by:
        # range partition on the sort key: globally ordered file runs
        staged = df.repartitionByRange(int(n_out), *[F.col(c) for c in sort_by])
    else:
        staged = df.coalesce(int(n_out))
    if sort_by:
        staged = staged.sortWithinPartitions(*sort_by)

    tmp = path.rstrip("/") + ".__compact"
    old = path.rstrip("/") + ".__old"
    jvm = spark.sparkContext._jvm
    for stale in (tmp, old):
        sp = jvm.org.apache.hadoop.fs.Path(stale)
        if fs.exists(sp):
            fs.delete(sp, True)

    writer = staged.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(tmp)

    files_out = len(spark.read.format(fmt).load(tmp).inputFiles())
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if not fs.rename(jpath, jold):
        raise IOError(f"compact swap failed: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        # roll back so the dataset is never missing
        fs.rename(jold, jpath)
        raise IOError(f"compact swap failed: could not move {tmp} into place")
    fs.delete(jold, True)
    logger.info(
        "compacted %s: %d files -> %d (%.1f MiB total)",
        path, files_before, files_out, total / 1048576,
    )
    return {"bytes": total, "files_before": files_before, "files_out": files_out}
