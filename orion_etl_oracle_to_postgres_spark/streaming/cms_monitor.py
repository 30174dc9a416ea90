"""Streaming frequency-cap monitor on Count-Min Sketch state
(SURVEY.md §2.9/§2.11): the STREAMING twin of the batch mergeable CMS
family (``operators/aggstate.py:build/merge_cms_states``,
``estimate_cms``; batch anchor ``agg_cms_heavy_hitters``) — an
ingestion stream answers "which of this micro-batch's keys have we
already seen at least ``cap`` times?" without re-aggregating history.
The training-data use case: frequency-capping repeated documents/URLs
at ingestion (a key whose running frequency passed the cap stops
contributing; the classic repeated-boilerplate guard) with fixed
state, no key-cardinality shuffle, no history join.

Design: the hist/bloom-monitor pattern — APPEND-ONLY increments,
fold-on-read. Each micro-batch first ESTIMATES its distinct keys'
PRIOR frequencies against the fold of every earlier increment (CMS is
one-sided: an estimate below the cap PROVES the key is under it;
over-cap verdicts can carry collision mass, at the sketch's documented
ε — route only that sliver to an exact check if the cap must be
strict), appends a one-row report (batch_id, n_rows, n_keys,
n_over_cap, n_under_cap), then appends its OWN keys-sized CMS
increment. Because the fold is exact count addition, the estimated
state is cell-identical to a single batch build over all prior batches
(the parity the unit test pins) — a stream restart from the same
increments can never change a verdict.

Contract notes (shared with ``bloom_monitor``):
* Cap verdicts are CROSS-batch: within-batch repeats all estimate
  against the pre-batch state.
* Every write lands in a PER-BATCH ``batch_id=N`` subdirectory with
  mode("overwrite"), so a crash-replayed batch overwrites its own
  pieces — no duplicate reports, no double-summed increments.
* Layout (width/depth/seed) travels in the state rows; drift fails
  loudly at the next fold, the ``merge_cms_states`` contract.

Scale shape: the estimate is the batch-side zero-join projection
against the folded ≤ 512 KiB cell literal; the increment is one
map-side-combined sum aggregate over ≤ width·depth groups; the report
is one row. Nothing grows with history except the cell counts
themselves — size ``width`` for the key cardinality horizon.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.aggstate import (
    build_cms_state,
    estimate_cms,
    merge_cms_states,
)
from .bloom_monitor import _read_state


def cms_increment_writer(
    key_col: str,
    *,
    width: int = 1 << 12,
    depth: int = 4,
    seed: str = "cms",
    cap: int = 1,
    state_path: str,
    report_path: str,
) -> Callable[[DataFrame, int], None]:
    """→ a ``foreachBatch`` writer: estimate the batch's DISTINCT keys
    against the folded prior state, append the per-batch frequency-cap
    report, then append this batch's CMS increment. NULL keys are
    counted in ``n_rows`` but carry no verdict (frequency of NULL is
    meaningless — the ``estimate_cms`` contract)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        est = _prior_key_estimates(batch_df, key_col, state_path, batch_id)
        _write_report_and_increment(
            batch_df,
            est,
            key_col,
            cap=cap,
            width=width,
            depth=depth,
            seed=seed,
            state_path=state_path,
            report_path=report_path,
            batch_id=batch_id,
        )

    return write


def _prior_key_estimates(
    batch_df: DataFrame, key_col: str, state_path: str, batch_id: int
) -> DataFrame:
    """The batch's DISTINCT non-NULL keys with their PRIOR estimated
    frequencies (``__est``) against the fold of every earlier
    increment — the shared first stage of the monitor and the
    declarative cap. Prior state excludes this batch's own subdir (a
    replay may have half-written it before the crash)."""
    spark = batch_df.sparkSession
    prior = _read_state(spark, state_path)
    if prior is not None and "batch_id" in prior.columns:
        prior = prior.filter(F.col("batch_id") != int(batch_id))
    keys = batch_df.where(F.col(key_col).isNotNull()).select(
        key_col
    ).distinct()
    if prior is None or not prior.limit(1).count():
        return keys.withColumn("__est", F.lit(0).cast("long"))
    # raw appended increments go straight in: estimate_cms folds them
    # DISTRIBUTED and validates the layout itself — a merge_cms_states
    # pre-pass would just pay the same aggregation twice (parity pinned
    # by test_cms_unmerged_increments_estimate_bounded)
    return estimate_cms(keys, key_col, prior, out_col="__est")


def _write_report_and_increment(
    batch_df: DataFrame,
    est: DataFrame,
    key_col: str,
    *,
    cap: int,
    width: int,
    depth: int,
    seed: str,
    state_path: str,
    report_path: str,
    batch_id: int,
) -> None:
    """Append the per-batch frequency-cap report and this batch's CMS
    increment — per-batch-id subdirectories with mode("overwrite"), so
    a crash-replayed batch overwrites its own pieces."""
    n_rows = batch_df.count()
    # sums coalesced to 0: over an EMPTY key frame (an all-NULL or
    # empty batch) F.sum returns SQL NULL, and a NULL n_over_cap
    # silently drops out of any alert layer's aggregate
    report = est.agg(
        F.lit(int(n_rows)).alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.coalesce(
            F.sum(F.when(F.col("__est") >= int(cap), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_over_cap"),
        F.coalesce(
            F.sum(F.when(F.col("__est") < int(cap), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_under_cap"),
    )
    report.write.mode("overwrite").parquet(
        f"{report_path}/batch_id={int(batch_id)}"
    )
    build_cms_state(
        batch_df, key_col, width=width, depth=depth, seed=seed
    ).write.mode("overwrite").parquet(
        f"{state_path}/batch_id={int(batch_id)}"
    )


def frequency_cap_split(
    batch_df: DataFrame,
    key_col: str,
    *,
    cap: int,
    width: int = 1 << 12,
    depth: int = 4,
    seed: str = "cms",
    state_path: str,
    report_path: str,
    batch_id: int,
) -> "tuple[DataFrame, DataFrame]":
    """Route one micro-batch through the frequency cap: returns
    ``(kept, over_cap)`` row frames and writes the per-batch report +
    this batch's CMS increment (the monitor side effects). A row lands
    in ``over_cap`` iff its key's PRIOR estimated ingested frequency is
    already >= ``cap`` — one-sided per the CMS contract (``kept`` keys
    are PROVEN under the cap; ``over_cap`` can carry collision mass at
    the documented ε, which is why the declarative surface routes it to
    an overflow table when the cap must be strict). Verdicts are
    CROSS-batch: within-batch repeats all estimate against the
    pre-batch state, so a key's rows stop flowing from the first batch
    AFTER its running count reaches the cap. NULL keys carry no verdict
    and are always kept. The increment counts the FULL batch (ingested
    occurrences, over-cap rows included): the running frequency is
    "times seen at ingestion", not "times kept".

    Execution contract: EAGER (foreachBatch territory) — reads the
    prior state, writes the report and increment, and returns two lazy
    row frames over the already-materialized batch.

    Scale shape: the estimate is the zero-join codegen projection
    against the folded ≤ 512 KiB cell literal over the batch's DISTINCT
    keys; routing is two key-equi-joins of the batch against that
    keys-sized flagged frame (AQE broadcasts it when small); the report
    is one row and the increment is one map-side-combined sum over
    ≤ width·depth groups. Nothing scales with history."""
    est = _prior_key_estimates(batch_df, key_col, state_path, batch_id)
    _write_report_and_increment(
        batch_df,
        est,
        key_col,
        cap=cap,
        width=width,
        depth=depth,
        seed=seed,
        state_path=state_path,
        report_path=report_path,
        batch_id=batch_id,
    )
    flagged = est.where(F.col("__est") >= int(cap)).select(key_col)
    kept = batch_df.join(flagged, key_col, "left_anti")
    over = batch_df.join(flagged, key_col, "left_semi")
    return kept, over


def folded_cms_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Read every appended increment and fold to one row per occupied
    cell (exact count addition; layout validated)."""
    return merge_cms_states([spark.read.parquet(state_path)])


def frequency_cap_report(spark: SparkSession, report_path: str) -> DataFrame:
    """Per-batch report rows — the monitor read side (an alert layer
    watches ``n_over_cap`` spike on a supposedly-fresh source: the
    signature of a scraper re-ingesting the same site)."""
    return spark.read.parquet(report_path).orderBy("batch_id")
