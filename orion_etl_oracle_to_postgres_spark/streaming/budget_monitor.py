"""Streaming per-group token-budget gate (SURVEY.md §2.9/§2.11): the
``mode: streaming`` twin of the batch token-budget samplers
(``operators/curation.py:token_budget`` / UniMax / DoReMi-tokens) — an
ingestion stream stops admitting a group's documents once the group's
RUNNING ADMITTED token total passes the budget: "collect at most B
tokens per domain, across however many drains it takes", with exact
integer state (one long per group per batch before folding — domains
are bounded cardinality, so no sketch is needed; this family member is
EXACT where frequency_cap is one-sided).

Design: the monitor-family shape — APPEND-ONLY per-batch increments
(group, admitted tokens), fold-on-read by plain sum (exact), per-batch
``batch_id=N`` overwrite subdirs for crash-replay idempotency, and a
one-row report per batch. Verdicts are CROSS-batch and GROUP-level:
a group whose prior admitted total sits below the budget admits its
WHOLE batch (overshoot bounded by one batch's worth per group — the
same one-batch-granularity contract as ``frequency_cap``'s
cross-batch verdicts; size micro-batches accordingly via
``max_files_per_trigger``); a group at/over budget routes its rows to
the overflow side. NULL group values always pass and contribute no
state (group of NULL is meaningless — the family's NULL rule); NULL
weights count 0.

Scale shape: the fold is one map-side-combined sum over
groups × batches rows; routing is two group-keyed joins of the batch
against the over-budget group list (AQE broadcasts it — it is
group-cardinality-bounded); the increment is one aggregate row per
admitted group. Nothing scales with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .bloom_monitor import _read_state


def _folded_totals(
    spark: SparkSession,
    state_path: str,
    group_cols: "list[str]",
    batch_id: "int | None" = None,
) -> "DataFrame | None":
    """Per-group admitted totals from every increment (excluding this
    batch's own subdir when ``batch_id`` is given — the half-written
    crash-replay rule), or None before the first increment."""
    prior = _read_state(spark, state_path)
    if prior is None:
        return None
    if batch_id is not None and "batch_id" in prior.columns:
        prior = prior.filter(F.col("batch_id") != int(batch_id))
    return prior.groupBy(*group_cols).agg(
        F.sum("__tokens").alias("__total")
    )


def token_budget_split(
    batch_df: DataFrame,
    group_cols: "list[str]",
    weight_col: str,
    *,
    budget: int,
    state_path: str,
    report_path: str,
    batch_id: int,
) -> "tuple[DataFrame, DataFrame]":
    """Route one micro-batch through the budget gate: returns
    ``(kept, over)`` row frames and writes the per-batch report + this
    batch's admitted-token increment. A row lands in ``over`` iff its
    group's PRIOR admitted total is already >= ``budget`` (exact —
    the fold is integer addition). Within-batch rows all judge against
    the pre-batch state, so a group can overshoot by at most one
    batch's tokens before the gate closes.

    Execution contract: EAGER (foreachBatch territory) — reads the
    prior state, writes the report and increment, returns two lazy row
    frames over the already-materialized batch."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    spark = batch_df.sparkSession
    totals = _folded_totals(spark, state_path, group_cols, batch_id)
    if totals is None:
        over_groups = None
        kept, over = batch_df, batch_df.limit(0)
    else:
        over_groups = totals.where(
            F.col("__total") >= int(budget)
        ).select(*group_cols)
        # NULL-group rows never match a join key -> always kept, the
        # family's NULL rule
        kept = batch_df.join(over_groups, list(group_cols), "left_anti")
        over = batch_df.join(over_groups, list(group_cols), "left_semi")
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    grp_ok = None
    for c in group_cols:
        cond = F.col(c).isNotNull()
        grp_ok = cond if grp_ok is None else grp_ok & cond
    # report from ONE aggregate over the batch (verdict recomputed
    # in-row against the same over-group list)
    report = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.coalesce(F.sum(F.when(grp_ok, w).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("tokens_admitted"),
    ).crossJoin(
        over.agg(F.count(F.lit(1)).cast("long").alias("n_over_budget"))
    )
    report.write.mode("overwrite").parquet(
        f"{report_path}/batch_id={int(batch_id)}"
    )
    (
        kept.where(grp_ok)
        .groupBy(*group_cols)
        .agg(F.sum(w).alias("__tokens"))
        .write.mode("overwrite")
        .parquet(f"{state_path}/batch_id={int(batch_id)}")
    )
    return kept, over


def budget_totals(
    spark: SparkSession, state_path: str, group_cols: "list[str]"
) -> DataFrame:
    """Current per-group admitted token totals — the monitor read side
    (compare against the budget to see which groups are closed)."""
    t = _folded_totals(spark, state_path, group_cols)
    if t is None:
        # the missing-path case the sibling monitors surface as a
        # parquet AnalysisException; FileNotFoundError carries the same
        # meaning here and the runner's _read_monitor wrapper catches
        # both uniformly
        raise FileNotFoundError(f"no increments at {state_path}")
    return t.select(*group_cols, F.col("__total").alias("tokens_admitted"))


def budget_report(spark: SparkSession, report_path: str) -> DataFrame:
    """Per-batch report rows — (batch_id, n_kept, tokens_admitted,
    n_over_budget), ordered by batch."""
    return spark.read.parquet(report_path).orderBy("batch_id")
