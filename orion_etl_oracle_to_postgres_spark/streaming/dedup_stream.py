"""Streaming deduplication (SURVEY.md §2.9/§2.11): exactly-once-per-key
emission over an unbounded stream with BOUNDED state.

Two layers, both thin by design — Spark's streaming state store already
implements the hard part, so the engine's job is to pick the right
primitive and bound its state:

* ``dedup_stream`` — drop re-deliveries of the same key forever-ish:
  ``dropDuplicatesWithinWatermark`` keeps one state entry per key only
  until the event-time watermark passes it, so state is bounded by the
  watermark horizon (keys × delay window), not by stream history. The
  semantics match exact batch dedup for any duplicate pair closer in
  event time than the delay; duplicates farther apart than the horizon
  are intentionally out of contract (state for them would be unbounded).

* ``fingerprint_dedup_stream`` — content dedup on a stream: compute the
  same normalized-text md5 fingerprint as the batch operator
  (``operators/dedup.py:fingerprint_dedup``) and key the state on it,
  so re-crawled near-identical documents inside the horizon dedup
  exactly like the batch pipeline would.

At 100 TB-of-stream the state store shuffles by key once (any stateful
op's floor) and each entry is one (key, timestamp) pair — RocksDB-backed
state handles billions of in-horizon keys per executor group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate deliveries of the same key set from a STREAMING
    DataFrame, keeping state only within the event-time watermark
    horizon (``delay``)."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def fingerprint_dedup_stream(
    docs: DataFrame,
    text_col: str,
    *,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Content-fingerprint streaming dedup: one surviving document per
    normalized-text md5 inside the watermark horizon. Adds the
    ``fingerprint`` column (same definition as the batch operator, so
    batch backfill and streaming forward-fill dedup identically)."""
    with_fp = docs.withColumn(
        "fingerprint", F.md5(normalize_text(F.col(text_col)))
    )
    return dedup_stream(with_fp, ["fingerprint"], ts_col=ts_col, delay=delay)
