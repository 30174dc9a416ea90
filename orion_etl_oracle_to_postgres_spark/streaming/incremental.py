"""Incremental mode — realizes the reference's declared-but-missing
``incremental_fetcher`` (``table_example.yaml:10``, SURVEY.md §2.9).

Two strategies:

1. **High-water-mark batch** (`incremental_read`): persist the max seen
   value of a monotonic column (timestamp/sequence); each run reads only
   ``col > mark``. The predicate is pushed into the scan (JDBC WHERE /
   parquet min-max pruning), so cost is proportional to new data.
2. **Structured Streaming** (`stream_source` + ``writeStream
   .foreachBatch`` with the batch JDBC sink, wrapped by
   ``foreach_sink.idempotent_foreach_batch`` for exactly-once):
   file-stream source for landed files; JDBC has no streaming source, so
   DB increments use (1) on a schedule.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


class HighWaterMark:
    """Tiny driver-side state store: one JSON file per (table, column).
    On a cluster, point ``state_path`` at shared storage (HDFS/S3 via a
    mounted path) or swap in a metastore-backed implementation."""

    def __init__(self, state_path: str):
        self.path = Path(state_path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def get(self, key: str) -> Optional[str]:
        if not self.path.exists():
            return None
        return json.loads(self.path.read_text()).get(key)

    def set(self, key: str, value: str) -> None:
        state = json.loads(self.path.read_text()) if self.path.exists() else {}
        state[key] = value
        self.path.write_text(json.dumps(state, default=str))


def incremental_read(
    read_full: Callable[[], DataFrame],
    watermark_column: str,
    state: HighWaterMark,
    key: str,
    bound_snapshot: bool = True,
    max_probe: Callable[[Optional[str]], Optional[str]] | None = None,
) -> tuple[DataFrame, Callable[[], None]]:
    """Read only rows newer than the stored mark.

    Returns ``(df, commit)`` — call ``commit()`` after the downstream
    write succeeds to advance the mark (at-least-once semantics: a failed
    run re-reads the same increment, pair with idempotent upsert sinks).

    The increment is SNAPSHOT-BOUNDED: the new mark (max of the
    watermark column) is computed up front and the read is filtered to
    ``col <= new_mark``, so rows arriving between the downstream write
    and ``commit()`` cannot advance the mark past data that was never
    written — they fall into the next increment. (Re-computing the max
    at commit time against the live source would silently drop them.)
    The bounding probe defaults to ``df.agg(max(col))`` — near-free on
    parquet (footer stats), but Spark's V1 JDBC source does NOT push
    aggregates down, so on a JDBC source that default streams every new
    row's watermark value just to take the max (double I/O with the real
    read). Pass ``max_probe(current_mark) -> max_value`` to push the
    aggregate to the database instead — the compiler wires a
    ``SELECT max(col) WHERE col > mark`` query-option read for JDBC
    sources.

    ``bound_snapshot=False`` skips the probe entirely (NO action runs) —
    for plan-review/explain mode only; the returned ``commit`` then
    refuses to advance the mark.
    """
    df = read_full()
    mark = state.get(key)
    if mark is not None:
        df = df.filter(F.col(watermark_column) > F.lit(mark))

    if not bound_snapshot:
        def no_commit() -> None:
            raise RuntimeError(
                "incremental_read(bound_snapshot=False) built an explain-only "
                "plan — it cannot commit a high-water mark"
            )

        return df, no_commit

    if max_probe is not None:
        new_mark = max_probe(mark)
    else:
        new_mark = df.agg(F.max(watermark_column).alias("m")).collect()[0]["m"]
    if new_mark is not None:
        df = df.filter(F.col(watermark_column) <= F.lit(new_mark))

    def commit() -> None:
        if new_mark is not None:
            state.set(key, str(new_mark))
            logger.info("advanced high-water mark %s -> %s", key, new_mark)

    # the snapshot bound, exposed for consumers that label per-window
    # artifacts (the declarative state: block keys its increment
    # directory on it so a retried window overwrites its own piece);
    # None = the source had no new rows
    commit.new_mark = new_mark
    return df, commit


def stream_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    watermark_column: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """File-landing streaming source with optional event-time watermark
    for late data."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if watermark_column:
        df = df.withWatermark(watermark_column, delay)
    return df


