"""Streaming CDC state materialization (SURVEY.md §2.9/§2.11): the
streaming twin of ``operators/cdc.py`` — maintain the latest event per
key over an unbounded changelog and emit an UPSERT STREAM (one row per
key per micro-batch in which its latest event changed).

``applyInPandasWithState`` holds one tiny tuple per key — (ts_us, seq,
op, value) — so state is bounded by live-key cardinality, not log
length. Each micro-batch folds its Arrow batches against the stored
tuple with the same (ts, seq) ordering as batch ``cdc_latest``;
downstream, a foreachBatch JDBC/file upsert (``foreach_sink``) applies
the emissions idempotently, which is what makes the end-to-end pipeline
exactly-once: replays re-emit the same latest rows.

Parity contract (pinned by ``tests/test_streaming_cdc.py``): after any
sequence of micro-batches, the LAST emission per key equals batch
``cdc_latest`` over the concatenated log. Deletes are emitted too (op
preserved) so the consumer can drop the key; filtering them here would
hide deletions from the sink.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def latest_state_stream(
    log: DataFrame,
    *,
    key_col: str = "k",
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    value_col: str = "value",
) -> DataFrame:
    """``log`` must be a STREAMING DataFrame with (key, ts, seq, op,
    value) shape. Returns a streaming upsert feed: the key's new latest
    event whenever a micro-batch advances it (append output mode; the
    per-key LAST row is the current state)."""

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            for ts, seq, op, val in zip(
                pdf[ts_col], pdf[seq_col], pdf[op_col], pdf[value_col]
            ):
                cand = (
                    _us(ts),
                    int(seq),
                    str(op),
                    float(val) if val == val else None,
                )
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        changed = best is not None and (not state.exists or tuple(state.get) != best)
        if changed:
            state.update(best)
            yield pd.DataFrame(
                [
                    {
                        "k": k,
                        "ts": pd.Timestamp(best[0] * 1_000),
                        "seq": best[1],
                        "op": best[2],
                        "value": best[3],
                    }
                ],
                columns=OUT_SCHEMA.fieldNames(),
            )
        else:
            yield pd.DataFrame([], columns=OUT_SCHEMA.fieldNames())

    return log.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
