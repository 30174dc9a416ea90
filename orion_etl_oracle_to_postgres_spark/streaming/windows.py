"""Watermarked windowed aggregation over streams (SURVEY.md §2.9 —
the tumbling/sliding-window half of the streaming surface; sessions
live in ``sessionize.py``).

All built-in: ``withWatermark`` bounds state and defines lateness,
``F.window`` buckets event time, the aggregate runs as a standard
streaming hash aggregate. In append mode a window only emits once the
watermark passes its end — exactly-once-per-window results, late rows
inside the watermark still count, rows later than the watermark are
dropped (the documented, tested semantics).

Scale: state is one row per (window, key) — bounded by watermark
horizon × key cardinality, not by stream length. The shuffle is the
group-by exchange any aggregation needs; sliding windows multiply
state by ``duration/slide`` (each event belongs to that many buckets),
which is the knob to watch at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) windowed counts
    and sums per key → ``(window_start, window_end, [key], n_events
    [, sum_value])``.

    Works on a streaming OR batch DataFrame with identical results —
    the batch run is the oracle for the streaming run (same plan, minus
    state). In streaming append mode, rows later than ``watermark``
    behind the max seen event time are dropped; anything inside it is
    aggregated exactly once.
    """
    win = (
        F.window(F.col(ts_col), duration, slide)
        if slide
        else F.window(F.col(ts_col), duration)
    )
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    keys = [win.alias("win")] + ([F.col(key_col)] if key_col else [])
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    out = src.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *([F.col(key_col)] if key_col else []),
        "n_events",
        *(["sum_value"] if value_col else []),
    )
