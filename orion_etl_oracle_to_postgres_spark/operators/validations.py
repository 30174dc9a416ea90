"""Validation operators V1-V4 — row-quality rules compiled to Column
predicates + conditional rewrites / filters.

Reference engine: ``/root/reference/plugins/default_validation.py:11-93``;
rule model ``/root/reference/mappings/parser.py:42-55``. Key semantics
reproduced:

* rules read the **target** (post-transform) field (``:16`` — SURVEY.md
  §7.4.5);
* NULL values always pass (``:18-19``);
* on_fail ladder (``:26-38``): ``None`` → set field NULL; ``skip`` → drop
  row; ``default:X`` → replace with X; anything else → **error**
  (fail fast);
* range grammar ``"min-max"`` with float comparison; a pattern that fails
  to parse (e.g. the example's ``">=0"``,
  ``table_example.yaml:60``) is logged and the row passes (``:59-60``) —
  we additionally *implement* the comparator grammar
  ``>=x | <=x | >x | <x`` since the shipped example clearly intends it
  (SURVEY.md §2.7 V2);
* non-numeric values under ``range`` pass (reference: ``float(val)``
  raises → caught → row passes);
* ``lookup`` existence probes (``:63-91``) become semi/anti joins against
  the dimension DataFrame instead of one ``SELECT 1 ... LIMIT 1`` per row
  (SURVEY.md §2.5 J3) — text-normalized key comparison both sides.

Fail-fast under lazy evaluation (SURVEY.md §7.4.1): the reference raises
mid-stream after some batches committed; we surface ``error`` rules as
eager pre-write checks (abort *before* anything is written) — a
deliberate, cleaner difference. ``apply_validations(..., error_mode)``:
``"eager"`` runs the checks immediately; ``"collect"`` returns them for
the caller (the compiler runs them right before the sink).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spec import ValidationSpec

logger = logging.getLogger(__name__)

#: staging column carrying the labels of quarantine rules a row failed;
#: ``split_quarantine`` consumes it at the end of the validation stage
QUARANTINE_COL = "_quarantine_rules"

# "min-max" where min may be negative: split on the dash that separates
# two numbers (reference uses a plain split("-", 1); we keep its behavior
# for non-negative mins and extend to negative bounds).
_RANGE_RE = re.compile(r"^\s*(-?\d+(?:\.\d+)?)\s*-\s*(-?\d+(?:\.\d+)?)\s*$")
_CMP_RE = re.compile(r"^\s*(>=|<=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$")


@dataclass
class ErrorCheck:
    """A deferred fail-fast check: if any row matches ``condition`` the
    job must abort before writing."""

    column: str
    rule_type: str
    condition: Column
    message: str


def violation_condition(
    col: Column,
    rule: ValidationSpec,
) -> Optional[Column]:
    """Build the predicate that is TRUE when the rule is VIOLATED.
    Returns None when the rule cannot apply (unparseable range — the
    reference's pass-through path). NULLs never violate."""
    if rule.type == "regex":
        pattern = rule.pattern or ""
        anchored = pattern if pattern.startswith("^") else "^" + pattern
        # re.match anchors at start only (ref :25)
        return col.isNotNull() & ~col.cast("string").rlike(anchored)
    if rule.type == "range":
        pattern = rule.pattern or ""
        m = _RANGE_RE.match(pattern)
        # try_cast, not cast: non-numeric values must PASS (reference
        # catches float() failures — ref :59-60) under any session conf;
        # a plain cast aborts the query under ANSI mode.
        num = col.try_cast("double")
        if m:
            lo, hi = float(m.group(1)), float(m.group(2))
            return num.isNotNull() & ~num.between(lo, hi)
        c = _CMP_RE.match(pattern)
        if c:
            op, bound = c.group(1), float(c.group(2))
            ok = {
                ">=": num >= bound,
                "<=": num <= bound,
                ">": num > bound,
                "<": num < bound,
            }[op]
            return num.isNotNull() & ~ok
        logger.error("unparseable range pattern %r — rule skipped (ref :59-60)", pattern)
        return None
    if rule.type == "lookup":
        # handled in apply_validations (needs a join, not a scalar predicate)
        return None
    logger.warning("unknown validation type %r — ignored", rule.type)
    return None


def _observe_rule(
    df: DataFrame,
    label: str,
    violated: Column,
    metrics: Optional[list],
) -> DataFrame:
    """Attach a CollectMetrics accumulator counting this rule's
    violations — the per-rule reject accounting the reference only has
    as log lines (SURVEY.md §7.4.6). Free: the counter rides the sink's
    own action, no second pass. ``metrics`` gets ``(label, Observation)``."""
    if metrics is None:
        return df
    from pyspark.sql import Observation

    obs = Observation(f"vrule_{len(metrics)}_{label}")
    metrics.append((label, obs))
    return df.observe(
        obs,
        F.sum(
            F.when(F.coalesce(violated, F.lit(False)), 1).otherwise(0)
        ).alias("violations"),
    )


def _apply_policy(
    df: DataFrame,
    target: str,
    violated: Column,
    on_fail: Optional[str],
    rule_type: str,
    checks: list[ErrorCheck],
    metrics: Optional[list] = None,
) -> DataFrame:
    """The on_fail ladder (ref :26-38)."""
    df = _observe_rule(df, f"{rule_type}:{target}", violated, metrics)
    if on_fail is None:
        return df.withColumn(
            target, F.when(violated, F.lit(None)).otherwise(F.col(target))
        )
    if on_fail == "skip":
        keep = ~F.coalesce(violated, F.lit(False))
        if QUARANTINE_COL in df.columns:
            # a row an earlier rule already quarantined must reach the
            # audit sink even if a later skip rule also rejects it —
            # it is leaving the main output at split time regardless
            keep = keep | (F.size(F.col(QUARANTINE_COL)) > 0)
        return df.filter(keep)
    if on_fail.startswith("default:"):
        default_raw = on_fail.split(":", 1)[1]
        dtype = dict(df.dtypes).get(target, "string")
        default_lit = F.lit(default_raw).cast(dtype)
        return df.withColumn(
            target, F.when(violated, default_lit).otherwise(F.col(target))
        )
    if on_fail == "quarantine":
        # [engine extension] tag, don't drop: the row leaves the main
        # output at split_quarantine() and lands in the reject sink with
        # every failed rule labeled. One pass — no side-branch rescan of
        # the source per rule. Later rules still see (and may further
        # label) the row; its rewrites are moot since the row is leaving.
        if QUARANTINE_COL not in df.columns:
            df = df.withColumn(QUARANTINE_COL, F.array().cast("array<string>"))
        label = F.lit(f"{rule_type}:{target}")
        return df.withColumn(
            QUARANTINE_COL,
            F.when(
                F.coalesce(violated, F.lit(False)),
                F.array_union(F.col(QUARANTINE_COL), F.array(label)),
            ).otherwise(F.col(QUARANTINE_COL)),
        )
    # anything else → fail-fast error
    checks.append(
        ErrorCheck(
            column=target,
            rule_type=rule_type,
            condition=violated,
            message=f"validation {rule_type} failed for column {target!r}",
        )
    )
    return df


def apply_validations(
    df: DataFrame,
    rules: list[tuple[str, ValidationSpec]],
    lookup_resolver: Optional[Callable[..., DataFrame]] = None,
    error_mode: str = "eager",
    metrics_out: Optional[list] = None,
    eager_lookup_errors: bool = True,
) -> tuple[DataFrame, list[ErrorCheck]]:
    """Apply ``[(target_column, rule), ...]`` in declared order.

    ``lookup_resolver(lookup_spec) -> DataFrame`` supplies dimension
    tables for ``type: lookup`` rules. Returns (df, pending error checks);
    with ``error_mode="eager"`` the checks already ran (and raised on
    violation). Pass a list as ``metrics_out`` to receive
    ``(rule_label, Observation)`` pairs counting each rule's violations
    off the plan's own execution (read them AFTER an action ran).
    """
    checks: list[ErrorCheck] = []
    for target, rule in rules:
        if target not in df.columns:
            logger.warning("validation target %r not in plan — skipped", target)
            continue
        if rule.type == "lookup" and rule.lookup is not None:
            df = _apply_lookup_validation(
                df,
                target,
                rule,
                lookup_resolver,
                checks,
                metrics_out,
                eager_errors=eager_lookup_errors,
            )
            continue
        violated = violation_condition(F.col(target), rule)
        if violated is None:
            continue
        df = _apply_policy(
            df, target, violated, rule.on_fail, rule.type, checks, metrics_out
        )

    if error_mode == "eager":
        run_error_checks(df, checks)
        checks = []
    return df, checks


def _apply_lookup_validation(
    df: DataFrame,
    target: str,
    rule: ValidationSpec,
    lookup_resolver: Optional[Callable[..., DataFrame]],
    checks: list[ErrorCheck],
    metrics: Optional[list] = None,
    eager_errors: bool = True,
) -> DataFrame:
    """V3/J3: existence check against a dimension, text-normalized key
    (ref ``:63-71`` probes ``SELECT 1 ... WHERE key = str(val) LIMIT 1``).

    on_fail=skip → left SEMI join (plus NULL rows, which always pass);
    other policies → broadcast left join against distinct keys + marker.
    """
    lk = rule.lookup
    if lookup_resolver is None:
        raise ValueError(f"lookup validation on {target!r} needs a lookup_resolver")
    dim = lookup_resolver(lk)
    keys = (
        dim.select(F.col(lk.key_column).cast("string").alias("__vk"))
        .distinct()
    )
    on_fail = rule.on_fail
    probe = F.col(target).cast("string")

    if on_fail == "skip":
        # ONE left join + filter (matched ∪ NULL rows) instead of a
        # semi-join plus a separate null-filter branch — the latter
        # scans the fact side twice. ``keys`` is distinct, so the left
        # join never multiplies rows.
        joined = df.join(F.broadcast(keys), probe == F.col("__vk"), "left")
        joined = _observe_rule(
            joined,
            f"lookup:{target}",
            F.col(target).isNotNull() & F.col("__vk").isNull(),
            metrics,
        )
        keep = F.col("__vk").isNotNull() | F.col(target).isNull()
        if QUARANTINE_COL in df.columns:
            # same contract as the scalar skip path: already-quarantined
            # rows survive to the split and reach the audit sink
            keep = keep | (F.size(F.col(QUARANTINE_COL)) > 0)
        return joined.filter(keep).drop("__vk")

    if (
        on_fail is not None
        and on_fail != "quarantine"
        and not on_fail.startswith("default:")
    ):
        # fail-fast: anti-join count, checked eagerly here (the deferred
        # ErrorCheck protocol can't reference the probe join's marker
        # column after it is dropped). Skipped in plan-review mode —
        # ``runner --explain`` promises no execution.
        if eager_errors:
            n = (
                df.filter(F.col(target).isNotNull())
                .join(F.broadcast(keys), probe == F.col("__vk"), "left_anti")
                .count()
            )
            if n > 0:
                raise RuntimeError(
                    f"validation lookup failed for column {target!r}: "
                    f"{n} rows missing from {lk.table}.{lk.key_column}"
                )
        return df

    joined = df.join(F.broadcast(keys), probe == F.col("__vk"), "left")
    missing = F.col(target).isNotNull() & F.col("__vk").isNull()
    out = _apply_policy(joined, target, missing, on_fail, "lookup", checks, metrics)
    return out.drop("__vk")


def split_quarantine(df: DataFrame) -> tuple[DataFrame, Optional[DataFrame]]:
    """Split the validation stage's output into (clean rows, quarantined
    rows). Quarantined rows keep every pipeline column plus
    ``_quarantine_rules`` (comma-joined labels of all rules they
    failed, in declaration order — a plain string so any sink, JDBC
    included, can store it). Returns ``(df, None)`` when no quarantine
    rule exists in the plan. The two outputs share the plan prefix —
    with a persisted/checkpointed upstream they cost one scan total."""
    if QUARANTINE_COL not in df.columns:
        return df, None
    clean = df.filter(F.size(QUARANTINE_COL) == 0).drop(QUARANTINE_COL)
    quarantined = df.filter(F.size(QUARANTINE_COL) > 0).withColumn(
        QUARANTINE_COL, F.array_join(F.col(QUARANTINE_COL), ",")
    )
    return clean, quarantined


def run_error_checks(df: DataFrame, checks: list[ErrorCheck]) -> None:
    """Eagerly verify fail-fast rules: one pass, count violations per
    rule, abort before any write (cleaner than the reference's
    mid-stream abort — SURVEY.md §7.4.1)."""
    if not checks:
        return
    aggs = [
        F.sum(F.when(c.condition, 1).otherwise(0)).alias(f"c{i}")
        for i, c in enumerate(checks)
    ]
    counts = df.agg(*aggs).collect()[0]
    for i, c in enumerate(checks):
        n = counts[f"c{i}"] or 0
        if n > 0:
            raise RuntimeError(f"{c.message}: {n} violating rows")
