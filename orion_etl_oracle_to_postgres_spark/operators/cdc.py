"""[EXT] Change-data-capture changelog application (SURVEY.md §2.11).

The reference can only full-reload a table (truncate-and-replace,
``/root/reference/plugins/default_loader.py:38-45``); real migrations
ship a CHANGELOG instead — a stream of (key, op ∈ {I,U,D}, ts, attrs)
events from the source DB's redo/WAL log. These operators materialize
table state from such a log with plain relational algebra:

- ``cdc_latest``: last event per key — one aggregate using ``max_by``
  over a (ts, seq) ordering struct with map-side partial aggregation:
  the shuffle carries one candidate row per key per partition, never
  the log. (Struct-valued max_by plans as SortAggregate — a linear-ish
  per-partition sort on the GROUP key — but the partial/final split is
  what matters at scale; the window formulation would shuffle every log
  row and sort by key+ts.)
- ``cdc_apply``: current state = latest events that are not deletes.
- ``cdc_snapshot_at``: state as of time T — the same aggregate over the
  log filtered to ``ts <= T`` (time travel from the log alone).

Determinism: ties on ``ts`` break by the monotonic ``seq`` column
(changelogs without one can pass any unique tiebreaker, e.g. the log
offset). At 100 TB the log is partitioned by event date; state rebuilds
prune to the partitions after the last checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_latest(
    log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    seq_col: str | None = None,
) -> DataFrame:
    """Latest changelog event per key: all log columns, one row per key.

    ``max_by(struct(all columns), struct(ts, seq))`` — a single
    aggregate, no window sort. Pass ``seq_col`` whenever the log can
    carry same-timestamp events for one key: without a tiebreaker,
    which of two ts-equal events wins is partitioning-dependent."""
    if not key_cols:
        raise ValueError("cdc_latest needs at least one key column")
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    payload = F.struct(*[F.col(c) for c in log.columns])
    return (
        log.groupBy(*key_cols)
        .agg(F.max_by(payload, F.struct(*order)).alias("__e"))
        .select(*[F.col(f"__e.{c}").alias(c) for c in log.columns])
    )


def cdc_apply(
    log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    *,
    seq_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Materialize current table state from a changelog: the latest
    event per key, minus keys whose latest event is a delete. Output
    drops the op column (state rows are rows, not events)."""
    latest = cdc_latest(log, key_cols, ts_col, seq_col=seq_col)
    return latest.filter(F.col(op_col) != F.lit(delete_op)).drop(op_col)


def cdc_snapshot_at(
    log: DataFrame,
    ts: str,
    key_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    *,
    seq_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Table state as of ``ts`` (inclusive): time travel by filtering
    the log BEFORE the latest-per-key aggregate — the filter prunes
    date-partitioned logs to the relevant prefix."""
    bounded = log.filter(F.col(ts_col) <= F.lit(ts).cast("timestamp"))
    return cdc_apply(
        bounded, key_cols, ts_col, op_col, seq_col=seq_col, delete_op=delete_op
    )
