"""Custom stateful streaming operator: per-key sessionization with an
inactivity gap, via ``applyInPandasWithState`` (SURVEY.md §2.9 — the
reference claims streaming in its README but ships none; this realizes
the capability Spark-natively).

Semantics match the batch ``F.session_window`` shape used by
``queries.agg_events_sessions``: a session is a maximal run of events
per key where consecutive gaps are < ``gap``; the reported session end
is last-event + gap (half-open window). Sessions are emitted when the
event-time watermark passes their close time (late data within the
watermark correctly extends or merges sessions still held in state).

Scale notes: state is one tiny tuple per OPEN session per key (start,
last, count, sum) — memory is bounded by the number of concurrently
active keys, not by history; the shuffle is the per-key exchange any
stateful op needs; Arrow batches carry the rows. At 100 TB-of-stream,
key skew is the hazard — sessionization keys (user/device ids) are
naturally high-cardinality, and the watermark bounds state retention.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# state: (start_us, last_us, n_events, total_value) — epoch microseconds
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_US = 1_000_000


def _to_us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)  # ns → µs


def _mk_row(key: int, s: Tuple[int, int, int, float], gap_us: int) -> dict:
    start_us, last_us, n, total = s
    return {
        "user_id": key,
        "session_start": pd.Timestamp(start_us * 1_000),
        "session_end": pd.Timestamp((last_us + gap_us) * 1_000),
        "n_events": n,
        "total_value": total,
    }


def sessionize_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 240,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """``events`` must be a STREAMING DataFrame. Returns a streaming
    DataFrame of closed sessions (append semantics)."""
    gap_us = gap_minutes * 60 * _US

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        closed: list[dict] = []

        if state.hasTimedOut:
            # watermark passed the open session's close time — emit it
            if state.exists:
                closed.append(_mk_row(user, tuple(state.get), gap_us))
                state.remove()
            yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())
            return

        # Sessionize by interval-merge: every event is a unit interval,
        # the open session from state is one more interval; sort by start
        # and fuse neighbours closer than the gap. This runs stragglers
        # through the SAME session-building logic as in-order events, so
        # two late events within gap of each other form ONE session —
        # exactly what batch F.session_window computes — instead of each
        # being emitted as its own singleton. Events older than the open
        # session's start−gap still never fuse with it (sorted-merge only
        # joins intervals closer than the gap). Remaining divergence from
        # batch, by design: all but the newest merged session close at
        # batch end, so a straggler arriving in a LATER micro-batch
        # cannot re-open them (bounded state: one tuple per key).
        items: list[Tuple[int, int, int, float]] = []
        for pdf in pdfs:
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                us = _to_us(ts)
                items.append((us, us, 1, float(val) if val == val else 0.0))
        if state.exists:
            items.append(tuple(state.get))
        items.sort()

        merged: list[Tuple[int, int, int, float]] = []
        for it in items:
            if merged and it[0] < merged[-1][1] + gap_us:
                a = merged[-1]
                merged[-1] = (a[0], max(a[1], it[1]), a[2] + it[2], a[3] + it[3])
            else:
                merged.append(it)
        for s in merged[:-1]:
            closed.append(_mk_row(user, s, gap_us))
        cur = merged[-1] if merged else None

        wm_us = state.getCurrentWatermarkMs() * 1_000
        if cur is not None:
            if wm_us >= cur[1] + gap_us:
                closed.append(_mk_row(user, cur, gap_us))
                state.remove()
            else:
                state.update(cur)
                # wake up when the watermark can close this session
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)
        yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
