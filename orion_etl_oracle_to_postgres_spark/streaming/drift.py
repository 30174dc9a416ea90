"""Streaming distribution-drift monitor (SURVEY.md §2.9/§2.11): the
streaming twin of the batch ``reconcile.distribution_drift`` /
``--drift`` sign-off — PSI of each incoming micro-batch against a
STATIC baseline histogram, emitted as one row per (batch, column) so an
ingestion pipeline alarms the moment upstream sampling shifts, not at
the nightly audit.

Shape: the baseline (bin boundaries + reference fractions, ≤ n_bins
rows) is computed ONCE from a reference DataFrame and carried as plain
Python lists into the ``foreachBatch`` closure — broadcast by value,
never recomputed, no state store at all (the monitor is stateless by
design: each micro-batch is scored alone, which is exactly what you
want for "did THIS batch drift"; trailing-window smoothing belongs to
the alert layer). Inside each batch: one bounded aggregate over the
batch rows (bin = boundary-count fold, the ``frequency_bins`` trick —
no sort), then the PSI sum over ≤ n_bins rows.

Parity contract (pinned in tests/test_streaming_drift.py): a batch
scored through the stream equals ``reconcile.distribution_drift``'s
PSI for the same (reference, batch) pair, bit-for-bit, because both
sides share the same rounded boundaries and the same
``(q−p)·ln((q+eps)/(p+eps))`` term shape.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baseline_histogram(
    reference: DataFrame,
    value_col: str,
    *,
    n_bins: int = 10,
    exact: bool = False,
    decimals: int = 4,
) -> tuple[list[float], list[float]]:
    """(boundaries, reference fractions) from the reference corpus —
    the static side of the monitor. Boundaries are the reference's
    equal-frequency quantile bounds (rounded, so every engine buckets
    identically); fractions are the reference's own bin occupancy.
    Small driver-side lists (n_bins−1 and n_bins values) — this is
    config, not data."""
    from ..operators.quantiles import group_quantile_bounds

    qs = [i / n_bins for i in range(1, n_bins)]
    bounds_row = (
        group_quantile_bounds(
            reference.select(F.lit(1).alias("__g"), F.col(value_col)),
            ["__g"],
            value_col,
            qs,
            exact=exact,
            decimals=decimals,
        )
        .select("__qb")
        .collect()[0][0]
    )
    bounds = [float(b) for b in bounds_row]
    counts = _bin_counts(reference, value_col, bounds)
    total = sum(counts.values()) or 1
    fracs = [counts.get(b, 0) / total for b in range(n_bins)]
    return bounds, fracs


def _bin_counts(df: DataFrame, value_col: str, bounds: list[float]) -> dict[int, int]:
    """bin = number of boundaries strictly below the value (the
    ``frequency_bins`` fold — a projection, no sort)."""
    bin_expr = F.aggregate(
        F.array(*[F.lit(b) for b in bounds]),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(value_col) > b, 1).otherwise(0),
    )
    rows = (
        df.select(F.col(value_col))
        .filter(F.col(value_col).isNotNull())
        .select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["bin"]: r["n"] for r in rows}


def batch_psi(
    batch: DataFrame,
    value_col: str,
    bounds: list[float],
    ref_fracs: list[float],
    *,
    eps: float = 1e-6,
    decimals: int = 6,
) -> float | None:
    """PSI of one batch against the baseline — same term shape as
    ``reconcile.distribution_drift``, INCLUDING its per-term rounding
    (the batch twin rounds each psi_term to ``decimals`` before the
    sum; summing raw terms here would drift in the 6th decimal and
    break the parity pin). None for an empty/all-NULL batch (nothing
    to score — emit no row rather than a fake 0)."""
    import math

    counts = _bin_counts(batch, value_col, bounds)
    total = sum(counts.values())
    if not total:
        return None
    psi = 0.0
    for b, p in enumerate(ref_fracs):
        q = counts.get(b, 0) / total
        psi += round((q - p) * math.log((q + eps) / (p + eps)), decimals)
    return round(psi, decimals)


def drift_monitor_stream(
    stream: DataFrame,
    value_col: str,
    bounds: list[float],
    ref_fracs: list[float],
    on_result: Callable[[int, float, int], None],
    *,
    checkpoint: str,
    eps: float = 1e-6,
):
    """Attach the monitor to a streaming frame: per micro-batch, score
    PSI vs the baseline and hand (batch_id, psi, n_rows) to
    ``on_result`` (log it, write it, page someone). Returns the started
    ``StreamingQuery``. Stateless — restart-safe by construction; the
    checkpoint only tracks source offsets."""

    def _score(batch: DataFrame, batch_id: int) -> None:
        n = batch.count()
        psi = batch_psi(batch, value_col, bounds, ref_fracs, eps=eps)
        if psi is not None:
            on_result(batch_id, psi, n)

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
