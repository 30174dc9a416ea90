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


def baseline_vocab(
    reference: DataFrame, text_col: str, *, top_n: int = 100
) -> tuple[list[str], list[float]]:
    """(top-N tokens, their reference fractions) — the static side of
    the TOKEN drift monitor (the text twin of ``baseline_histogram``):
    the reference corpus' ``top_n`` most frequent tokens (count desc,
    token tiebreak — deterministic) with each one's share of ALL
    reference tokens; the implicit (N+1)-th "other" cell carries the
    remaining mass, so the distribution the monitor scores against
    always sums to 1. Driver-side lists of ≤ top_n entries — config,
    not data."""
    from ..functions import tokens

    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    rows = (
        reference.select(F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("__t"))
        .limit(int(top_n))
        .collect()
    )
    total = (
        reference.select(
            # coalesce BEFORE size: non-ANSI size(NULL) = -1 would make
            # every NULL-text row subtract one from the total (the
            # catalogued size-of-null bug class)
            F.sum(
                F.size(
                    F.coalesce(
                        tokens(F.col(text_col)),
                        F.array().cast("array<string>"),
                    )
                )
            ).alias("__tot")
        ).collect()[0]["__tot"]
        or 1
    )
    vocab = [r["__t"] for r in rows]
    fracs = [r["__n"] / total for r in rows]
    return vocab, fracs


def _vocab_counts(
    batch: DataFrame, text_col: str, vocab: list[str]
) -> tuple[dict[str, int], int]:
    """(per-vocab-token counts, total batch tokens) — one explode +
    bounded aggregate; out-of-vocab tokens collapse to one NULL cell
    before the exchange, so the shuffle carries ≤ len(vocab)+1 keys."""
    from ..functions import tokens

    marked = batch.select(
        F.explode(tokens(F.col(text_col))).alias("__raw")
    ).select(
        F.when(F.col("__raw").isin(list(vocab)), F.col("__raw")).alias("__t")
    )
    rows = marked.groupBy("__t").agg(F.count(F.lit(1)).alias("__n")).collect()
    counts = {r["__t"]: r["__n"] for r in rows if r["__t"] is not None}
    total = sum(r["__n"] for r in rows)
    return counts, total


def batch_vocab_jsd(
    batch: DataFrame,
    text_col: str,
    vocab: list[str],
    ref_fracs: list[float],
    *,
    decimals: int = 6,
) -> float | None:
    """Jensen-Shannon divergence (log2, in [0, 1]) of one batch's token
    distribution against the baseline, over the fixed top-N + "other"
    cells. Terms sum unrounded and only the total is rounded — per-cell
    rounding accumulates past the metric's [0, 1] bound on fully
    disjoint vocabularies (unlike ``batch_psi``, no batch-operator
    parity pins a per-term convention here; the stream and batch paths
    share this very function). x·log2(x/..) terms vanish at x = 0
    exactly — no epsilon. None for a token-less batch (nothing to
    score)."""
    counts, total = _vocab_counts(batch, text_col, vocab)
    if not total:
        return None
    return _jsd_from_counts(counts, total, vocab, ref_fracs, decimals)


def _jsd_from_counts(
    counts: dict[str, int],
    total: int,
    vocab: list[str],
    ref_fracs: list[float],
    decimals: int,
) -> float:
    import math

    p_cells = list(ref_fracs) + [max(0.0, 1.0 - sum(ref_fracs))]
    q_cells = [counts.get(t, 0) / total for t in vocab]
    q_cells.append(max(0.0, 1.0 - sum(q_cells)))
    jsd = 0.0
    for p, q in zip(p_cells, q_cells):
        m = (p + q) / 2.0
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    return round(jsd, decimals)


def vocab_drift_monitor_stream(
    stream: DataFrame,
    text_col: str,
    vocab: list[str],
    ref_fracs: list[float],
    on_result: Callable[[int, float, int], None],
    *,
    checkpoint: str,
):
    """Token-distribution drift monitor on a document stream: per
    micro-batch, JSD of the batch's token mix vs the static baseline
    vocabulary, handed to ``on_result`` as (batch_id, jsd, n_tokens) —
    "the crawl's vocabulary shifted" alarm at ingest time instead of
    the nightly audit (batch drilldown: ``text.vocab_divergence``).
    Stateless like ``drift_monitor_stream``: every batch is scored
    alone; the checkpoint only tracks offsets."""

    def _score(batch: DataFrame, batch_id: int) -> None:
        counts, total = _vocab_counts(batch, text_col, vocab)
        if total:
            on_result(
                batch_id,
                _jsd_from_counts(counts, total, vocab, ref_fracs, 6),
                total,
            )

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
