"""[EXT] Range (interval) join — pair each left row with every right
row of the same key whose timestamp falls in a window relative to the
left row's timestamp (SURVEY.md §2.11; the "events within N minutes
of X" join behind attribution windows, burst detection, and feature
windows).

A naive equi-join on the key followed by a range filter materializes
every same-key pair before filtering — quadratic in per-key row count,
a guaranteed scale-killer for hot keys. The bucketed formulation bounds
candidates: time is cut into buckets as wide as the window span; every
right row lands in exactly ONE bucket, every left row probes the (at
most two) buckets its window can touch. The join becomes an equi-join
on ``(key, bucket)`` whose candidate set per left row is only the right
rows within ±span — then the exact half-open predicate filters. At
100 TB the candidate volume is proportional to the true match volume,
not to per-key row counts squared.

Window semantics: right_ts ∈ (left_ts + lower, left_ts + upper] —
exclusive lower, inclusive upper, so "the 10 minutes before" with
``lower=-600s, upper=0`` includes a simultaneous event and excludes
one exactly 10 minutes old.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import epoch_us


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int,
    upper_us: int,
    rsuffix: str = "_r",
) -> DataFrame:
    """Inner range join: all ``(left row, right row)`` pairs with equal
    ``on`` key and ``right_ts`` in ``(left_ts + lower_us, left_ts +
    upper_us]`` (microseconds). Right columns colliding with left names
    get ``rsuffix``. Each right row belongs to one bucket, so pairs are
    emitted exactly once — no post-join dedup."""
    if upper_us <= lower_us:
        raise ValueError(f"empty window: ({lower_us}, {upper_us}]")
    span = upper_us - lower_us

    rpay = [c for c in right.columns if c != on]
    out_names = {c: (c + rsuffix if c in left.columns else c) for c in rpay}

    lt = epoch_us(F.col(left_ts), left.schema[left_ts].dataType)
    rt = epoch_us(F.col(right_ts), right.schema[right_ts].dataType)
    r_side = right.select(
        F.col(on),
        F.floor(rt / span).alias("__bk"),
        *[F.col(c).alias(out_names[c]) for c in rpay],
    )
    l_side = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lower_us)) / span),
                F.floor((lt + F.lit(upper_us)) / span),
            )
        ).alias("__bk"),
    )
    rts_us = epoch_us(
        F.col(out_names.get(right_ts, right_ts)), right.schema[right_ts].dataType
    )
    l_us = epoch_us(F.col(left_ts), left.schema[left_ts].dataType)
    lo = l_us + F.lit(lower_us)
    hi = l_us + F.lit(upper_us)
    return (
        l_side.join(r_side, [on, "__bk"])
        .filter((rts_us > lo) & (rts_us <= hi))
        .drop("__bk")
    )
