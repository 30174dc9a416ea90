"""Bucketed-table sink — the co-located-join scale path (SURVEY.md §4).

A fact table bucketed on its join key can be joined against another
table bucketed the same way with NO exchange on either side: Spark
reads each bucket as a pre-hashed partition, so a 100 TB ⋈ 100 TB join
skips the dominant shuffle entirely. Bucketing requires the catalog
(``saveAsTable``) — path-based writes can't record bucket metadata.

Use for the repeated-join workloads the reference's per-row probes
imply (fact ⋈ dimension on the same key across many pipelines): pay
one bucketed write, then every subsequent join is shuffle-free. See
``tests/test_bucketing.py`` for the plan proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    num_buckets: int = 64,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a catalog table bucketed (and optionally sorted)
    on the join key(s). ``sort_by`` additionally pre-sorts inside each
    bucket, letting sort-merge joins skip their sort too."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *cols)
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*s)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (the bucket spec only applies when
    reading through the catalog, never through a bare path)."""
    return spark.table(table)
