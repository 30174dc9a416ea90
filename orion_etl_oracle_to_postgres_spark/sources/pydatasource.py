"""Spark 4 Python DataSource: the first-class realization of the
reference's ``FetcherPlugin`` contract.

The reference lets a plugin BE the source — ``fetch(ctx, batch_size)
-> Iterator[dict]`` (``/root/reference/plugin_interfaces/
fetcher_interface.py:8-33``), single-threaded by construction. The
engine already maps that to plugin functions returning DataFrames
(``registry``/``compiler``); this module shows the fully Spark-native
form: a ``pyspark.sql.datasource.DataSource`` whose reader *plans
partitions*, so the custom Python row generator runs distributed —
each executor produces its slice — with filter pushdown reaching the
generator itself.

``synthetic_events`` generates a deterministic event stream (the same
shape as the ``events`` fixture) from a stateless per-row hash, so any
partitioning yields bit-identical data — useful as a load/correctness
source with zero I/O. ``event_type`` equality/IN filters are consumed
by ``pushFilters`` and skip generation of non-matching rows rather
than filtering after the fact.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 UTC in µs


def _h(seed: str, i: int, salt: str) -> int:
    """Stateless 60-bit row hash (md5 — portable, partition-independent)."""
    d = hashlib.md5(f"{seed}:{salt}:{i}".encode()).hexdigest()
    return int(d[:15], 16)


@dataclass
class _Slice(InputPartition):
    start: int
    end: int


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``.

    Options: ``rows`` (total, default 1000), ``numPartitions``
    (default 8), ``seed`` (default ``"s0"``).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double"
        )

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("numPartitions", 8)))
        self.seed = options.get("seed", "s0")
        self.keep_types: list[str] | None = None  # None = all

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume event_type equality/IN filters — generation SKIPS
        non-matching rows (the Python analogue of scan pushdown); every
        other filter is returned for Spark to apply."""
        def _narrow(values: set[str]) -> None:
            # INTERSECT with any constraint already consumed — pushed
            # filters are a conjunction, so keeping only the last one
            # would wrongly widen the result
            self.keep_types = (
                sorted(values)
                if self.keep_types is None
                else sorted(set(self.keep_types) & values)
            )

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                _narrow({str(f.value)})
            elif isinstance(f, In) and f.attribute == ("event_type",):
                _narrow({str(v) for v in f.value})
            else:
                yield f

    def partitions(self) -> list[_Slice]:
        if self.rows <= 0:
            return [_Slice(0, 0)]  # empty dataset, not a planning error
        step = -(-self.rows // self.n_parts)
        return [
            _Slice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        import datetime as dt

        keep = self.keep_types
        for i in range(partition.start, partition.end):
            etype = _EVENT_TYPES[_h(self.seed, i, "t") % len(_EVENT_TYPES)]
            if keep is not None and etype not in keep:
                continue
            # naive-UTC NTZ value without the deprecated utcfromtimestamp
            ts = dt.datetime(1970, 1, 1) + dt.timedelta(
                microseconds=_EPOCH_2024_US
                + (_h(self.seed, i, "ts") % (86_400_000_000 * 30))
            )
            yield (
                i,
                ts,
                _h(self.seed, i, "u") % 10_000,
                etype,
                round((_h(self.seed, i, "v") % 1_000_000) / 1000.0, 3),
            )


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format("synthetic_events")``
    works afterwards. Python-source filter pushdown is opt-in
    (``spark.sql.python.filterPushdown.enabled``) — a reader that
    implements ``pushFilters`` refuses to initialize without it, so
    flip the runtime conf here."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlDirDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: each micro-batch emits the next
    ``batchRows`` deterministic events; the offset dict carries the
    row index, so replays (``readBetweenOffsets``) regenerate the
    exact rows — the replayability contract exactly-once sinks need."""

    def __init__(self, options) -> None:
        self.batch_rows = int(options.get("batchRows", 100))
        self.seed = options.get("seed", "s0")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _gen(self, start: int, end: int):
        import datetime as dt

        for i in range(start, end):
            etype = _EVENT_TYPES[_h(self.seed, i, "t") % len(_EVENT_TYPES)]
            # naive-UTC NTZ value without the deprecated utcfromtimestamp
            ts = dt.datetime(1970, 1, 1) + dt.timedelta(
                microseconds=_EPOCH_2024_US
                + (_h(self.seed, i, "ts") % (86_400_000_000 * 30))
            )
            yield (
                i,
                ts,
                _h(self.seed, i, "u") % 10_000,
                etype,
                round((_h(self.seed, i, "v") % 1_000_000) / 1000.0, 3),
            )

    def read(self, start: dict):
        lo = int(start["i"])
        hi = lo + self.batch_rows
        # materialized, not a generator: the simple-reader protocol
        # pickles the prefetched batch for replay (batchRows bounds it)
        return list(self._gen(lo, hi)), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._gen(int(start["i"]), int(end["i"]))


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


class JsonlDirDataSource(DataSource):
    """Python DataSourceWriter — the Spark-native form of the
    reference's ``LoaderPlugin`` (``load_batch``/``finalize_table``,
    ``/root/reference/plugin_interfaces/loader_interface.py:7-31``):
    each task writes its partition to a staged JSON-lines part file and
    returns a commit message; ``commit`` runs ONCE on the driver after
    every task succeeded and atomically publishes the staged files plus
    a ``_SUCCESS`` manifest (task retries leave only orphaned staging
    files, never partial visible output); ``abort`` is the
    all-or-nothing cleanup hook. ``spark.range(...).write.format(
    "jsonl_dir").option("path", d).mode("append").save()``.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema: StructType, overwrite: bool) -> "JsonlDirWriter":
        return JsonlDirWriter(self.options, schema, overwrite)


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        if "path" not in options:
            raise ValueError("jsonl_dir requires .option('path', <dir>)")
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(f"{self.path}/_staging", exist_ok=True)
        out = f"{self.path}/_staging/part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.fields, row)), default=str))
                fh.write("\n")
                n += 1
        return _PartFile(path=out, rows=n)

    def commit(self, messages) -> None:
        import json
        import os
        import shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.unlink(os.path.join(self.path, f))
        total = 0
        for m in messages:
            if m is None:
                continue
            shutil.move(m.path, os.path.join(self.path, os.path.basename(m.path)))
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump({"rows_committed": total}, fh)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

