"""[EXT] Table-level data-quality expectations (SURVEY.md §2.11) — the
dbt-test / Great-Expectations-shaped contract check that complements
the reference's per-COLUMN validation rules (``validations.py`` rewrites
or drops individual rows; expectations judge the TABLE and gate the
load).

``run_expectations`` evaluates every check in ONE wide aggregate pass
over the table (a single scan, map-side partials — no per-check rescans)
plus one tiny grouped aggregate per ``unique`` check, and returns the
report frame ``(check, column, observed, threshold, passed)``.
``enforce`` raises if any check failed — the fail-fast gate between a
load and publishing it downstream.

Check types:
- ``row_count``: min ≤ count(*) ≤ max
- ``not_null``: null fraction of a column ≤ max_null_frac
- ``unique``: no duplicate values over the column tuple
- ``accepted_values``: no value outside the allowed set (NULLs are the
  ``not_null`` check's business, not this one's)
- ``min``/``max``: column bounds within [lo, hi]
- ``freshness``: max(ts_column) within ``max_lag_hours`` of ``as_of``
  (an EXPLICIT reference instant — never wall-clock, so the gate is
  deterministic and replayable; the orchestrator passes "now")
- ``k_anonymity``: no quasi-identifier group over ``columns`` smaller
  than ``min`` rows (``operators/privacy.py`` semantics as a GATE:
  refuse to publish a re-identifiable table; the report variant is
  ``privacy.k_anonymity_report``)
- ``quantile``: the ``q``-quantile of a column within [min, max] — the
  DISTRIBUTION contract ``bounds`` can't express (a few outliers never
  move the median; a shifted corpus does). Evaluated with
  ``percentile_approx`` (one-pass mergeable GK sketch, rank error
  ≤ 1/accuracy — scale-clean, rides the same wide aggregate); band the
  limits wider than the sketch error, not at exact row values
- ``distinct_count``: exact count(DISTINCT column) within [min, max] —
  the CARDINALITY contract (``unique`` gates duplicates, ``row_count``
  gates volume; neither says "tonight's load carries roughly the usual
  number of users"). NULLs don't count (count-distinct semantics).
  EXACT — the distinct aggregate adds an Expand to the shared wide
  pass (Spark plans mixed distinct/plain aggregates in one job); at
  extreme scale prefer the nightly ``state: {kind: kmv}`` estimate and
  band that instead
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    type: str  # row_count | not_null | unique | accepted_values | bounds | fk | freshness | k_anonymity | benford
    columns: tuple = ()
    min: Optional[float] = None
    max: Optional[float] = None
    max_null_frac: float = 0.0
    values: tuple = ()
    ref_table: Optional[str] = None
    ref_column: Optional[str] = None
    as_of: Optional[str] = None
    max_lag_hours: Optional[float] = None
    q: Optional[float] = None  # quantile only
    accuracy: int = 10_000  # quantile only: rank error <= n/accuracy
    severity: str = "error"  # error aborts the load; warn only reports

    @property
    def label(self) -> str:
        return f"{self.type}:{','.join(self.columns) or '*'}"

    @classmethod
    def from_spec(cls, e) -> "Expect":
        """The ONE ExpectSpec→Expect conversion — used by both the
        compiler's pre-write gate and the CLI --expect dry run so the
        two can never evaluate different contracts (review finding r5:
        a new field added in only one hand-copied kwargs list would
        silently diverge them)."""
        return cls(
            type=e.type,
            columns=tuple(e.columns),
            min=e.min,
            max=e.max,
            max_null_frac=e.max_null_frac,
            values=tuple(e.values),
            ref_table=e.ref_table,
            ref_column=e.ref_column,
            as_of=e.as_of,
            max_lag_hours=e.max_lag_hours,
            q=e.q,
            accuracy=e.accuracy,
            severity=e.severity,
        )


_SINGLE_COL_TYPES = (
    "not_null", "accepted_values", "bounds", "freshness", "quantile",
    "distinct_count",
)


def _parse_as_of(c: "Expect"):
    """ISO parse with a named error; tz-aware instants are rejected
    because Spark collects TimestampType as NAIVE session-local
    datetimes — subtracting mixed-awareness datetimes raises, and
    silently assuming a zone would move the freshness bar."""
    import datetime as _dt

    try:
        ref = _dt.datetime.fromisoformat(c.as_of)
    except ValueError as e:
        raise ValueError(
            f"expectation {c.label!r}: as_of {c.as_of!r} is not ISO-8601: {e}"
        ) from None
    if ref.tzinfo is not None:
        raise ValueError(
            f"expectation {c.label!r}: as_of must be a NAIVE timestamp in "
            "the Spark session timezone (collected ts values are naive; "
            "a zoned instant cannot be compared against them)"
        )
    return ref


def _validate_check(c: Expect) -> None:
    """Arity errors must name the offending check, not die as a bare
    tuple-unpack ValueError deep in the aggregate builder (review
    finding r4) — and a zero-column ``unique`` would degrade to a
    meaningless global groupBy that always passes."""
    if c.type in _SINGLE_COL_TYPES and len(c.columns) != 1:
        raise ValueError(
            f"expectation {c.label!r}: type {c.type!r} takes exactly one "
            f"column, got {list(c.columns)} (declare one check per column)"
        )
    if c.type == "unique" and not c.columns:
        raise ValueError("expectation 'unique' needs at least one column")
    if c.type == "k_anonymity":
        if not c.columns:
            raise ValueError(
                "expectation 'k_anonymity' needs the quasi-identifier columns"
            )
        if c.min is None or c.min < 2:
            raise ValueError(
                f"expectation {c.label!r}: k_anonymity needs min (= k) >= 2"
            )
    if c.type == "row_count" and c.columns:
        raise ValueError(
            f"expectation {c.label!r}: row_count takes no columns"
        )
    if c.type == "fk":
        if len(c.columns) != 1 or not c.ref_table or not c.ref_column:
            raise ValueError(
                f"expectation {c.label!r}: fk takes exactly one column "
                "plus ref_table and ref_column"
            )
    if c.type == "freshness":
        if c.as_of is None or c.max_lag_hours is None:
            raise ValueError(
                f"expectation {c.label!r}: freshness needs as_of (explicit "
                "reference instant — wall-clock would make the gate "
                "non-replayable) and max_lag_hours"
            )
        _parse_as_of(c)  # malformed/tz-aware as_of fails HERE, not at gate time
    if c.type == "benford":
        if len(c.columns) != 1:
            raise ValueError(
                f"expectation {c.label!r}: benford takes exactly one "
                "numeric column"
            )
        if c.max is None or c.max <= 0:
            raise ValueError(
                f"expectation {c.label!r}: benford needs max (the χ² bar "
                "over 8 df — e.g. 20.09 for p=0.01)"
            )
    if c.type == "quantile":
        if c.q is None or not (0.0 < c.q < 1.0):
            raise ValueError(
                f"expectation {c.label!r}: quantile needs q in (0, 1) "
                f"(got {c.q}; for the max use a bounds check)"
            )
        if c.min is None and c.max is None:
            raise ValueError(
                f"expectation {c.label!r}: quantile needs min and/or max "
                "— the allowed band for the observed quantile"
            )
        if c.accuracy < 100:
            raise ValueError(
                f"expectation {c.label!r}: accuracy must be >= 100, "
                f"got {c.accuracy}"
            )
    if c.type == "distinct_count" and c.min is None and c.max is None:
        raise ValueError(
            f"expectation {c.label!r}: distinct_count needs min and/or "
            "max — the allowed band for the distinct cardinality"
        )


def _report_labels(checks: Sequence[Expect]) -> list[str]:
    """Per-check report labels, disambiguated: the base label is
    ``type:columns``, and when two checks share it (two ``bounds`` on
    one column with different limits, two ``fk``s against different
    ref tables — both legitimate) later occurrences get a
    deterministic ``#2``/``#3`` suffix in INPUT order. The label is
    the identity key for report rows and ``enforce``'s severity
    routing, so it must be unique per check — but rejecting duplicate
    base labels outright would outlaw those legitimate patterns
    (review finding r7 on the ADVICE r6 fix)."""
    seen: dict[str, int] = {}
    out = []
    for c in checks:
        k = c.label
        seen[k] = seen.get(k, 0) + 1
        out.append(k if seen[k] == 1 else f"{k}#{seen[k]}")
    return out


def run_expectations(
    df: DataFrame,
    checks: Sequence[Expect],
    *,
    resolve_ref=None,
) -> DataFrame:
    """→ ``(check, column, observed, threshold, passed)``, one row per
    expectation, deterministic order (the input order); duplicate base
    labels are suffixed per ``_report_labels``. ``resolve_ref``
    (table name → DataFrame) is required when any check is ``fk`` — the
    compiler passes its target-first lookup resolution."""
    labels = _report_labels(checks)
    for c in checks:
        _validate_check(c)
        if c.type == "fk" and resolve_ref is None:
            raise ValueError(
                f"expectation {c.label!r}: fk checks need resolve_ref"
            )
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(checks):
        if c.type == "not_null":
            (col,) = c.columns
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"__e{i}")
            )
        elif c.type == "accepted_values":
            (col,) = c.columns
            bad = F.col(col).isNotNull() & ~F.col(col).isin(list(c.values))
            aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"__e{i}"))
        elif c.type == "bounds":
            (col,) = c.columns
            lo = F.lit(c.min) if c.min is not None else None
            hi = F.lit(c.max) if c.max is not None else None
            viol = F.lit(False)
            if lo is not None:
                viol = viol | (F.col(col) < lo)
            if hi is not None:
                viol = viol | (F.col(col) > hi)
            aggs.append(F.sum(F.when(viol, 1).otherwise(0)).alias(f"__e{i}"))
        elif c.type == "freshness":
            (col,) = c.columns
            aggs.append(F.max(F.col(col)).alias(f"__e{i}"))
        elif c.type == "benford":
            # leading-significant-digit counts via EXACT integer units
            # (profile.benford_report's parity trick: leading digit is
            # invariant under *10^k for exact values; double→string
            # would differ across engines). Values with |x| < 5e-7
            # carry no digit at this scale and are excluded.
            (col,) = c.columns
            ival = F.round(F.abs(F.col(col)) * 1_000_000).cast("long")
            digit = F.when(
                F.col(col).isNotNull() & (ival > 0),
                F.substring(ival.cast("string"), 1, 1).cast("int"),
            )
            for dgt in range(1, 10):
                aggs.append(
                    F.sum(F.when(digit == dgt, 1).otherwise(0)).alias(
                        f"__e{i}_{dgt}"
                    )
                )
        elif c.type == "quantile":
            # one-pass mergeable GK sketch riding the same wide
            # aggregate; rank error <= n/accuracy (exact below it)
            (col,) = c.columns
            aggs.append(
                F.percentile_approx(
                    F.col(col), F.lit(float(c.q)), F.lit(int(c.accuracy))
                ).alias(f"__e{i}")
            )
        elif c.type == "distinct_count":
            # exact; Spark plans mixed distinct/plain aggregates in one
            # job via Expand — still a single pass over the table
            (col,) = c.columns
            aggs.append(F.countDistinct(F.col(col)).alias(f"__e{i}"))
        elif c.type in ("row_count", "unique", "fk", "k_anonymity"):
            pass
        else:
            raise ValueError(f"unknown expectation type {c.type!r}")
    wide = df.agg(*aggs).collect()[0]
    n = wide["__n"]

    rows = []
    for i, (c, _lbl) in enumerate(zip(checks, labels)):
        col = ",".join(c.columns)
        if c.type == "row_count":
            ok = (c.min is None or n >= c.min) and (c.max is None or n <= c.max)
            rows.append((_lbl, col, float(n), f"[{c.min},{c.max}]", ok))
        elif c.type == "not_null":
            frac = (wide[f"__e{i}"] or 0) / n if n else 0.0
            rows.append(
                (_lbl, col, round(frac, 6), f"null_frac<={c.max_null_frac}",
                 frac <= c.max_null_frac)
            )
        elif c.type == "accepted_values":
            bad = wide[f"__e{i}"] or 0
            rows.append((_lbl, col, float(bad), "no values outside set", bad == 0))
        elif c.type == "bounds":
            bad = wide[f"__e{i}"] or 0
            rows.append((_lbl, col, float(bad), f"[{c.min},{c.max}]", bad == 0))
        elif c.type == "freshness":
            mx = wide[f"__e{i}"]
            if mx is None:  # empty table / all-NULL ts: stale by definition
                rows.append(
                    (_lbl, col, float("inf"),
                     f"lag_hours<={c.max_lag_hours} @ {c.as_of}", False)
                )
            else:
                import datetime as _dt

                ref = _parse_as_of(c)
                if isinstance(mx, _dt.date) and not isinstance(mx, _dt.datetime):
                    mx = _dt.datetime.combine(mx, _dt.time.min)  # DateType col
                lag_h = (ref - mx).total_seconds() / 3600.0
                rows.append(
                    (_lbl, col, round(lag_h, 6),
                     f"lag_hours<={c.max_lag_hours} @ {c.as_of}",
                     lag_h <= c.max_lag_hours)
                )
        elif c.type == "fk":
            # referential integrity with the unique-check's early-exit
            # shape: the anti-join probe stops at the FIRST orphan
            # (operators/reconcile.referential_integrity reports full
            # counts when you need the audit, this is the gate)
            (col,) = c.columns
            ref = (
                resolve_ref(c.ref_table)
                .select(F.col(c.ref_column).alias(col))
                .distinct()
            )
            orphan = (
                df.select(col)
                .filter(F.col(col).isNotNull())
                .join(ref, col, "left_anti")
                .limit(1)
                .count()
            )
            rows.append(
                (_lbl, col, float(orphan),
                 f"all in {c.ref_table}.{c.ref_column}", orphan == 0)
            )
        elif c.type == "k_anonymity":
            # privacy gate, unique-check shape: one grouped aggregate,
            # probe stops at the FIRST too-small quasi-identifier group
            small = (
                df.groupBy(*c.columns)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") < int(c.min))
                .limit(1)
                .count()
            )
            rows.append(
                (_lbl, col, float(small),
                 f"no group smaller than k={int(c.min)}", small == 0)
            )
        elif c.type == "benford":
            # χ² of the observed leading-digit shares vs log10(1 + 1/d),
            # from the wide-agg counts — shares and expectations rounded
            # before the terms so the statistic is engine-replayable
            # (same arithmetic as profile.benford_report)
            import math

            (col,) = c.columns
            cnts = [wide[f"__e{i}_{dgt}"] or 0 for dgt in range(1, 10)]
            tot = sum(cnts)
            if tot == 0:
                # no leading digits at all: vacuously unverifiable —
                # fail the gate (an empty/zero column is not Benford)
                rows.append(
                    (_lbl, col, float("inf"), f"chi2<={c.max}", False)
                )
            else:
                chi = 0.0
                for dgt, cn in zip(range(1, 10), cnts):
                    exp_share = round(math.log10(1.0 + 1.0 / dgt), 6)
                    obs = round(cn / tot, 6)
                    chi += tot * (obs - exp_share) ** 2 / exp_share
                chi = round(chi, 6)
                rows.append((_lbl, col, chi, f"chi2<={c.max}", chi <= c.max))
        elif c.type == "quantile":
            v = wide[f"__e{i}"]
            band = f"q{c.q} in [{c.min},{c.max}]"
            if v is None:
                # empty table / all-NULL column: no quantile exists —
                # the contract is unverifiable, fail like freshness
                rows.append((_lbl, col, float("nan"), band, False))
            else:
                v = float(v)
                ok = (c.min is None or v >= c.min) and (
                    c.max is None or v <= c.max
                )
                rows.append((_lbl, col, round(v, 6), band, ok))
        elif c.type == "distinct_count":
            d = wide[f"__e{i}"] or 0
            ok = (c.min is None or d >= c.min) and (c.max is None or d <= c.max)
            rows.append(
                (_lbl, col, float(d), f"distinct in [{c.min},{c.max}]", ok)
            )
        elif c.type == "unique":
            # one grouped aggregate with an early-exit limit: the probe
            # stops at the FIRST duplicate key, it never counts them all
            dup = (
                df.groupBy(*c.columns)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .limit(1)
                .count()
            )
            rows.append((_lbl, col, float(dup), "no duplicate keys", dup == 0))
    return spark.createDataFrame(
        rows, "check string, column string, observed double, threshold string, passed boolean"
    )


def enforce(
    df: DataFrame, checks: Sequence[Expect], *, resolve_ref=None
) -> DataFrame:
    """Raise ``ValueError`` listing every failed ERROR-severity
    expectation; ``severity: warn`` failures are LOGGED but never block
    the load (the dbt-style soft check — track a contract you're not
    ready to enforce). Returns the report frame when nothing fatal
    failed. Severity is matched to report rows by the check LABEL (not
    row position — ADVICE r5 #3: positional zip silently depends on
    collect() preserving driver-local row order); ``_report_labels``
    makes the label unique per check (deterministic ``#n`` suffixes for
    duplicate base labels), so a warn check can never collapse into an
    error twin sharing its base label."""
    import logging

    report = run_expectations(df, checks, resolve_ref=resolve_ref)
    rows = report.collect()
    warn_only = {
        lbl
        for c, lbl in zip(checks, _report_labels(checks))
        if c.severity == "warn"
    }
    fatal, warned = [], []
    for r in rows:
        if r["passed"]:
            continue
        (warned if r["check"] in warn_only else fatal).append(r)
    for r in warned:
        logging.getLogger(__name__).warning(
            "expectation WARN %s observed=%s want %s",
            r["check"], r["observed"], r["threshold"],
        )
    if fatal:
        lines = "; ".join(
            f"{r['check']} observed={r['observed']} want {r['threshold']}"
            for r in fatal
        )
        raise ValueError(f"expectations failed: {lines}")
    return report
