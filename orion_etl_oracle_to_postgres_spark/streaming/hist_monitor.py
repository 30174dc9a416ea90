"""Streaming histogram-quantile state (SURVEY.md §2.9/§2.11): the
STREAMING twin of the batch mergeable histogram family
(``operators/aggstate.py:build/merge/finalize_hist_state``, batch
anchor query ``agg_hist_quantile_state``) — an ingestion stream keeps
per-key order statistics (p50/p99 latency, value distributions)
current without ever rescanning history.

Design: APPEND-ONLY increments, fold-on-read. Each micro-batch writes
its own keys-sized histogram state rows (one bounded aggregate over the
batch) to the state path; reading the state folds every increment with
``merge_hist_states`` — which is exact (bucket-count sums), so the
stream's finalized quantiles are BIT-IDENTICAL to a batch build over
the union of all batches (the parity the unit test pins). No
read-modify-write of the state table per batch — the hazard (and the
rewrite cost) of overwrite-in-place state at scale; the trade is file
count, reclaimed by any OPTIMIZE/compaction pass
(``sinks/maintenance.py``) since increments are plain parquet.

Exactly-once: wrap the writer with
``foreach_sink.idempotent_foreach_batch`` — a replayed micro-batch
would otherwise append its increment twice and silently double those
bucket counts (exactness makes duplication VISIBLE in the counts, but
the ledger prevents it).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggstate import (
    build_hist_state,
    finalize_hist_quantiles,
    merge_hist_states,
)


def hist_increment_writer(
    keys: list[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 128,
    state_path: str,
) -> Callable[[DataFrame, int], None]:
    """→ a ``foreachBatch`` writer appending one keys-sized histogram
    increment per micro-batch. The layout (lo/hi/n_buckets) travels in
    the rows, so a config change between deploys fails loudly at the
    next fold instead of silently mixing bucket widths."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        inc = build_hist_state(
            batch_df, keys, value_col, lo=lo, hi=hi, n_buckets=n_buckets
        )
        inc.write.mode("append").parquet(state_path)

    return write


def folded_hist_state(
    spark: SparkSession, state_path: str, keys: list[str]
) -> DataFrame:
    """Read every appended increment and fold to one state row per key
    (exact bucket-count sums; layout validated)."""
    return merge_hist_states([spark.read.parquet(state_path)], keys)


def hist_quantiles(
    spark: SparkSession,
    state_path: str,
    keys: list[str],
    qs: list[float],
) -> DataFrame:
    """Current quantiles from the persisted stream state — the monitor
    read side (alert layer compares these against a baseline)."""
    return finalize_hist_quantiles(
        folded_hist_state(spark, state_path, keys), keys, qs
    )
