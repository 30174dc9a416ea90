"""Streaming first-sighting monitor on Bloom membership state
(SURVEY.md §2.9/§2.11): the STREAMING twin of the batch mergeable
Bloom family (``operators/aggstate.py:build/merge_bloom_states``,
``probe_bloom``; batch anchors ``dedup_bloom_history_probe`` /
``agg_bloom_incremental_users``) — an ingestion stream answers "which
of this micro-batch's keys have we EVER seen before?" without joining
against history.

Design: the hist-monitor pattern — APPEND-ONLY increments,
fold-on-read. Each micro-batch first PROBES the fold of every prior
increment (one-sided: a miss is a definite first sighting, a hit is
"maybe seen" at the Bloom false-positive rate), appends a one-row
report (batch_id, n_rows, n_definite_new, n_maybe_seen), then appends
its OWN keys-sized Bloom increment. Because the fold is exact set
union, the probed state is bit-identical to a single batch build over
all prior batches (the parity the unit test pins) — a stream restart
from the same increments can never change a verdict.

Contract notes:
* First-sighting is CROSS-batch: duplicates within one micro-batch all
  probe against the pre-batch state (dedup inside the batch first if
  within-batch repeats matter).
* Every write lands in a PER-BATCH ``batch_id=N`` subdirectory with
  mode("overwrite"), so the writer is idempotent at the WRITE level: a
  crash between the report and the increment replays the batch and
  each piece overwrites its own path — no duplicate report rows, no
  double-OR'd increments, regardless of where the failure fell. The
  ``foreach_sink.idempotent_foreach_batch`` ledger remains worth
  stacking on top (it skips the probe work entirely on replay), but
  correctness no longer depends on it.
* Layout (m_bits/k/seed/hash_family) travels in the state rows; a
  config change between deploys fails loudly at the next fold, the
  ``merge_bloom_states`` contract.

Scale shape: the probe is the batch-side zero-join projection against
the collected word array (≤ 512 KiB); the increment is one
map-side-combined bit_or aggregate; the report is one row. Nothing
grows with history except the fixed-size bitmap's fill factor — size
``m_bits`` for the key cardinality horizon, and rotate the state path
when the false-positive budget is spent.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.aggstate import (
    build_bloom_state,
    merge_bloom_states,
    probe_bloom,
)


def _read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Prior increments, or None before the first batch lands.

    Missing-path is told apart from real failures STRUCTURALLY — the
    ``AnalysisException`` error class (``getCondition`` on Spark 4,
    ``getErrorClass`` on 3.4+), not message-substring matching, which
    breaks across Spark versions and locales."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(state_path)
    except AnalysisException as exc:
        cond = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(exc, probe, None)
            if fn is not None:
                try:
                    cond = fn()
                except Exception:
                    cond = None
                if cond:
                    break
        if cond is not None:
            if cond == "PATH_NOT_FOUND":
                return None
            raise
        # pre-error-class Spark only: last-resort message match
        if "does not exist" in str(exc):
            return None
        raise


def bloom_increment_writer(
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: str = "bloom",
    state_path: str,
    report_path: str,
) -> Callable[[DataFrame, int], None]:
    """→ a ``foreachBatch`` writer: probe the batch against the folded
    prior state, append the per-batch first-sighting report, then
    append this batch's Bloom increment. NULL keys are counted in
    ``n_rows`` but in neither verdict column (membership of NULL is
    meaningless — the ``probe_bloom`` contract)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        probed = _probe_prior(batch_df, key_col, state_path, batch_id)
        _write_report_and_increment(
            batch_df,
            probed,
            key_col,
            m_bits=m_bits,
            k=k,
            seed=seed,
            state_path=state_path,
            report_path=report_path,
            batch_id=batch_id,
        )

    return write


def _probe_prior(
    batch_df: DataFrame, key_col: str, state_path: str, batch_id: int
) -> DataFrame:
    """The batch with a ``__maybe`` verdict column probed against the
    fold of every earlier increment — the shared first stage of the
    monitor and the declarative first-sighting gate. Prior state
    excludes this batch's own subdir (a replay may have half-written
    it before the crash — reading it back would make the batch see
    itself as history). NULL keys get NULL verdicts."""
    spark = batch_df.sparkSession
    prior = _read_state(spark, state_path)
    if prior is not None and "batch_id" in prior.columns:
        prior = prior.filter(F.col("batch_id") != int(batch_id))
    if prior is None or not prior.limit(1).count():
        return batch_df.withColumn(
            "__maybe",
            F.when(F.col(key_col).isNotNull(), F.lit(False)),
        )
    return probe_bloom(
        batch_df, key_col, merge_bloom_states([prior]), out_col="__maybe"
    )


def _write_report_and_increment(
    batch_df: DataFrame,
    probed: DataFrame,
    key_col: str,
    *,
    m_bits: int,
    k: int,
    seed: str,
    state_path: str,
    report_path: str,
    batch_id: int,
) -> None:
    """Append the per-batch first-sighting report and this batch's
    Bloom increment — per-batch overwrite subdirs (hive-style, so
    batch_id comes back as a partition column on read): each piece is
    idempotent on its own; a replay after a crash between the two
    writes can only overwrite, never duplicate."""
    # sums coalesced to 0: over an EMPTY micro-batch F.sum returns
    # SQL NULL, and a NULL verdict count silently drops out of any
    # alert layer's aggregate (same fix as cms_monitor)
    report = probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(~F.col("__maybe"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_definite_new"),
        F.coalesce(
            F.sum(F.when(F.col("__maybe"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_maybe_seen"),
    )
    report.write.mode("overwrite").parquet(
        f"{report_path}/batch_id={int(batch_id)}"
    )
    build_bloom_state(
        batch_df, key_col, m_bits=m_bits, k=k, seed=seed
    ).write.mode("overwrite").parquet(
        f"{state_path}/batch_id={int(batch_id)}"
    )


def first_sighting_split(
    batch_df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: str = "bloom",
    state_path: str,
    report_path: str,
    batch_id: int,
) -> "tuple[DataFrame, DataFrame]":
    """Route one micro-batch through the cross-drain ingestion dedup:
    returns ``(new, maybe_seen)`` row frames and writes the per-batch
    report + this batch's Bloom increment (the monitor side effects).
    A row lands in ``new`` iff the folded index PROVES its key was
    never ingested by an earlier drain — the one-sided guarantee: no
    real first sighting is ever lost. ``maybe_seen`` holds the hits —
    real re-ingests plus the ε false-positive sliver, which is why the
    declarative surface routes it to an overflow table for the exact
    anti-join-against-history check instead of dropping it when the
    dedup must be lossless. Verdicts are CROSS-batch: within-batch
    repeats all probe the pre-batch index (pair with the watermarked
    ``dedup:`` stage for within-horizon exactness). NULL keys carry no
    verdict and are always kept. The increment records the FULL
    batch's keys (ingested, both verdicts): the index answers "seen at
    ingestion", not "kept".

    Execution contract: EAGER (foreachBatch territory) — reads the
    prior state, writes the report and increment, returns two lazy row
    frames over the already-materialized batch.

    Scale shape: the probe is the zero-join codegen projection against
    the folded ≤ 512 KiB word array; routing is two pure row filters
    on the verdict column (no join at all — the verdict is in-row);
    the report is one row and the increment one map-side-combined
    bit_or over ≤ m/64 groups. Nothing scales with history."""
    probed = _probe_prior(batch_df, key_col, state_path, batch_id)
    _write_report_and_increment(
        batch_df,
        probed,
        key_col,
        m_bits=m_bits,
        k=k,
        seed=seed,
        state_path=state_path,
        report_path=report_path,
        batch_id=batch_id,
    )
    new = probed.where(
        F.col(key_col).isNull() | ~F.col("__maybe")
    ).drop("__maybe")
    maybe = probed.where(
        F.col(key_col).isNotNull() & F.col("__maybe")
    ).drop("__maybe")
    return new, maybe


def folded_bloom_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Read every appended increment and fold to one row per occupied
    word (exact set union; layout validated)."""
    return merge_bloom_states([spark.read.parquet(state_path)])


def first_sighting_report(spark: SparkSession, report_path: str) -> DataFrame:
    """Per-batch report rows — the monitor read side (an alert layer
    watches ``n_maybe_seen`` spike on a supposedly-fresh source, or
    ``n_definite_new`` collapse on a supposedly-rotating one)."""
    return spark.read.parquet(report_path).orderBy("batch_id")
