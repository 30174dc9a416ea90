"""Streaming KMV distinct-count state (SURVEY.md §2.9/§2.11): the
STREAMING twin of the batch mergeable KMV bottom-k sketch
(``operators/aggstate.py:build/merge/finalize_kmv_state``, batch anchor
query ``agg_kmv_incremental_users``) — an ingestion stream keeps
per-key "distinct values so far" current without rescanning history,
and EXACTLY REPLAYABLY: every kept hash is a plain portable md5-derived
integer, so the stream's running estimates are hash-for-hash identical
to a batch build over the union of all batches (the KMV fold property;
no error envelope, unlike an HLL twin would need).

Design: the monitor-family shape (bloom/cms/hist) — APPEND-ONLY
increments, fold-on-read. Each micro-batch writes its own ≤ k-rows-per-
key bottom-k increment into a ``batch_id=N`` subdirectory with
mode("overwrite"), so a crash-replayed batch overwrites its own piece
(no double-counted state — though KMV folds are duplicate-PROOF anyway:
the fold distinct-unions hash sets, so a replayed increment merges to
nothing new; the overwrite contract still matters for half-written
crash leftovers). Reading the state folds every increment with
``merge_kmv_states`` — re-taking the bottom-k of the distinct union,
exact. Layout (k/seed) travels in the rows; drift fails loudly at the
next fold, the family contract.

Exactly-once: wrap the writer with
``foreach_sink.idempotent_foreach_batch`` like the sibling monitors —
here the ledger saves the redundant replay WORK, not correctness
(KMV's distinct-union fold is idempotent by construction).

Scale shape: the increment is one distinct-shuffle of (keys, hash)
integers + a map-side-partial bottom-k per key; the state is ≤ k longs
per key per batch before folding, ≤ k per key after — the O(day)
nightly-fold contract, same as the batch family.

This module also hosts the SAMPLE-PANEL twin (``sample_increment_
writer`` / ``folded_sample_state`` / ``current_panel``): the same
bottom-k-by-hash machinery with the ID kept (``operators/aggstate.py:
build_sample_state``), so an ingestion stream maintains a fixed-size
uniform eval panel per key — mergeable, prefix-consistent, and
row-for-row batch-identical, the properties RNG reservoirs lack.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggstate import (
    build_kmv_state,
    build_sample_state,
    finalize_kmv,
    finalize_sample,
    finalize_sample_quantiles,
    merge_kmv_states,
    merge_sample_states,
)


def kmv_increment_writer(
    keys: "list[str]",
    value_col: str,
    *,
    k: int = 64,
    seed: str = "kmv",
    state_path: str,
) -> Callable[[DataFrame, int], None]:
    """→ a ``foreachBatch`` writer appending one bottom-k KMV increment
    per micro-batch (per-batch-id subdirectory, overwrite-on-replay)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        build_kmv_state(
            batch_df, keys, value_col, k=k, seed=seed
        ).write.mode("overwrite").parquet(
            f"{state_path}/batch_id={int(batch_id)}"
        )

    return write


def folded_kmv_state(
    spark: SparkSession, state_path: str, keys: "list[str]"
) -> DataFrame:
    """Read every appended increment and fold to one bottom-k set per
    key (exact — the k smallest of a union are each within their side's
    k smallest; layout validated)."""
    return merge_kmv_states([spark.read.parquet(state_path)], keys)


def kmv_distinct(
    spark: SparkSession, state_path: str, keys: "list[str]"
) -> DataFrame:
    """Current per-key distinct estimates from the persisted stream
    state — the monitor read side (exact below k, (k−1)/U(k) above;
    deterministic, so an alert layer can diff runs value-exactly)."""
    return finalize_kmv(folded_kmv_state(spark, state_path, keys), keys)


def sample_increment_writer(
    keys: "list[str]",
    id_col: str,
    *,
    k: int = 64,
    seed: str = "smp",
    state_path: str,
    carry: "list[str] | None" = None,
) -> Callable[[DataFrame, int], None]:
    """→ a ``foreachBatch`` writer appending one bottom-k ID-sample
    increment per micro-batch (per-batch-id subdirectory,
    overwrite-on-replay; duplicate-proof fold like the KMV twin).
    ``carry`` keeps payload columns with each id (function-of-the-id
    contract) for the quantile read side."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        build_sample_state(
            batch_df, keys, id_col, k=k, seed=seed, carry=carry
        ).write.mode("overwrite").parquet(
            f"{state_path}/batch_id={int(batch_id)}"
        )

    return write


def folded_sample_state(
    spark: SparkSession,
    state_path: str,
    keys: "list[str]",
    id_col: str,
    *,
    carry: "list[str] | None" = None,
) -> DataFrame:
    """Read every appended increment and fold to one bottom-k ID set
    per key (exact, row-for-row the full-history build)."""
    return merge_sample_states(
        [spark.read.parquet(state_path)], keys, id_col, carry=carry
    )


def current_panel(
    spark: SparkSession,
    state_path: str,
    keys: "list[str]",
    id_col: str,
    *,
    carry: "list[str] | None" = None,
) -> DataFrame:
    """The stream's current uniform eval panel: (keys…, sample_rank,
    id) — rank ≤ j is itself the uniform j-panel (prefix consistency),
    so one persisted stream state serves every panel size up to k."""
    return finalize_sample(
        folded_sample_state(spark, state_path, keys, id_col, carry=carry),
        keys,
        id_col,
    )


def panel_quantiles(
    spark: SparkSession,
    state_path: str,
    keys: "list[str]",
    id_col: str,
    value_col: str,
    qs: "list[float]",
    *,
    carry: "list[str] | None" = None,
) -> DataFrame:
    """The stream's range-free nearest-rank quantiles of a CARRIED
    value (``operators/aggstate.py:finalize_sample_quantiles`` over
    the folded stream state) — per-group value quantiles of everything
    ingested so far with no [lo, hi) bucket layout, identical to a
    batch build over the same rows (fold == full-build)."""
    return finalize_sample_quantiles(
        folded_sample_state(
            spark, state_path, keys, id_col, carry=carry or [value_col]
        ),
        keys,
        id_col,
        value_col,
        qs,
    )
