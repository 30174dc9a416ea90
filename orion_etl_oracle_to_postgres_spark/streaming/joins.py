"""Stream-stream interval join (Structured Streaming §2.9).

The reference engine has no streaming at all (its README claims it;
SURVEY.md §1 'Stream' row documents the gap). Batch-side, this engine's
`operators/ranges.py:range_join` answers "which left events precede a
right event within a window"; this module is its streaming twin: two
unbounded streams joined on a key + event-time interval, with
watermarks bounding the join state on both sides.

Spark requirements for a correct (state-bounded) stream-stream join,
encoded here so callers can't silently build an unbounded-state plan:
- BOTH sides must carry a watermark (else state grows forever);
- the join condition must include an event-time RANGE constraint so
  Spark can evict state older than watermark + interval.

At 100 TB/day the state per key is bounded by (watermark delay +
interval) × arrival rate; the join shuffles both streams by the key
exactly once per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str,
    right_ts: str,
    interval: str,
    watermark_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``key`` where the left event
    falls in ``[right_ts - interval, right_ts]`` (the "left precedes
    right within `interval`" shape of the batch range_join).

    Watermarks are applied HERE (``watermark_delay`` lateness on both
    sides) so the returned plan is state-bounded by construction.
    ``how`` may be ``inner`` or the outer variants Spark supports for
    stream-stream joins (``left_outer``/``right_outer``/``full_outer``
    — outer rows emit only after the watermark passes).

    Raises if either input is not streaming — silently falling back to
    a batch join would hide an unbounded-state bug in production.
    """
    if not left.isStreaming or not right.isStreaming:
        raise ValueError(
            "stream_interval_join requires two streaming DataFrames; "
            "use operators.ranges.range_join for batch inputs"
        )
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    # disambiguate columns: prefix the right side (key stays on left)
    rcols = [
        F.col(c).alias(c if c == key else f"r_{c}") for c in rw.columns
    ]
    rw = rw.select(*rcols)
    r_ts = f"r_{right_ts}" if right_ts != key else right_ts
    cond = (
        (lw[key] == rw[key])
        & (F.col(left_ts) >= F.col(r_ts) - F.expr(f"INTERVAL {interval}"))
        & (F.col(left_ts) <= F.col(r_ts))
    )
    return lw.join(rw, cond, how).drop(rw[key])
