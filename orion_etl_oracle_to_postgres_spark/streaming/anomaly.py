"""Streaming rolling z-score anomaly detection (SURVEY.md §2.9/§2.11):
the streaming twin of the batch ``window_events_anomaly`` query —
per-type hourly event counts scored against the trailing-24-hour
baseline, emitted continuously as hours close.

``applyInPandasWithState`` keyed by event type holds ONLY the trailing
~26 hours of (hour, count) pairs per key — state is bounded by
(types × hours-in-horizon), independent of event volume. An hour is
scored once it is ``grace_hours`` behind the key's max observed hour
(the stream analogue of a watermark: later stragglers inside an open
hour still count; stragglers older than the grace horizon are out of
contract, exactly like ``dropDuplicatesWithinWatermark``'s bound).

Parity contract (pinned by ``tests/test_streaming.py``): every emitted
row equals the batch query's row for that (type, hour) — same baseline
(hours WITH events in the trailing wall-clock 24 h), same
``min_hours``/``sd > 0`` gates, same rounding.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour", TimestampType()),
        StructField("cnt", LongType()),
        StructField("mean_prev", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("hours", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("emitted_until", LongType()),
    ]
)

_H = 3600


def zscore_anomaly_stream(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    flag_z: float = 2.0,
    min_hours: int = 12,
    grace_hours: int = 2,
) -> DataFrame:
    """``events`` must be a STREAMING DataFrame. Returns an append-mode
    stream of anomalous (event_type, hour, cnt, mean_prev, z) rows:
    |z| ≥ ``flag_z`` against the mean/stddev of the hours-with-events
    in the trailing wall-clock 24 h (current hour excluded), gated on
    ≥ ``min_hours`` baseline hours — identical semantics, gates, and
    rounding to the batch ``window_events_anomaly`` query."""

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            hours, counts, emitted_until = state.get
            book = dict(zip(hours, counts))
        else:
            book, emitted_until = {}, -1
        for pdf in pdfs:
            # ns → hour-epoch-seconds, counted per hour
            hs = (pdf[ts_col].astype("int64") // (_H * 1_000_000_000)) * _H
            for h, c in hs.value_counts().items():
                book[int(h)] = book.get(int(h), 0) + int(c)
        if not book:
            yield pd.DataFrame([], columns=OUT_SCHEMA.fieldNames())
            return
        max_hour = max(book)
        close_until = max_hour - grace_hours * _H
        out = []
        for h in sorted(h for h in book if emitted_until < h <= close_until):
            base = [
                book[b]
                for b in book
                if h - 24 * _H <= b <= h - _H
            ]
            emitted_until = h
            # max(…, 2): sample variance needs n ≥ 2 — the batch twin's
            # stddev_samp is NULL for n=1 and filtered by sd > 0
            if len(base) < max(min_hours, 2):
                continue
            mean = sum(base) / len(base)
            var = sum((x - mean) ** 2 for x in base) / (len(base) - 1)
            sd = math.sqrt(var)
            if sd <= 0:
                continue
            z = (book[h] - mean) / sd
            if abs(z) >= flag_z:
                out.append(
                    {
                        "event_type": etype,
                        "hour": pd.Timestamp(h * 1_000_000_000),
                        "cnt": book[h],
                        "mean_prev": round(mean, 3),
                        "z": round(z, 3),
                    }
                )
        # keep exactly the horizon future emissions can still reference:
        # the next emittable hour is ≥ emitted_until + 1h, whose baseline
        # reaches back 24 h from there
        floor = emitted_until + _H - 24 * _H
        book = {h: c for h, c in book.items() if h >= floor}
        ks = sorted(book)
        state.update((ks, [book[k] for k in ks], emitted_until))
        yield pd.DataFrame(out, columns=OUT_SCHEMA.fieldNames())

    return events.groupBy(type_col).applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
