"""Exactly-once ``foreachBatch`` sinks (SURVEY.md §2.9).

Spark's native file/Kafka streaming sinks are exactly-once via their own
commit logs; ``foreachBatch`` exists for every other sink (JDBC being
the one this engine cares about — the reference's Postgres target) and
gives only at-least-once: after a crash between "sink write" and
"checkpoint commit", the recovered query REPLAYS the last micro-batch.

Two composable pieces restore exactly-once:

* ``idempotent_foreach_batch`` — wraps any per-batch writer with a
  durable batch-id ledger next to the query's checkpoint. A replayed
  ``batch_id`` is skipped before the writer runs. This makes a
  non-transactional but per-batch-atomic writer effectively
  exactly-once. The ledger is one tiny file appended per batch —
  driver-side, never a Spark job.

* ``upsert_sql`` — builds the standard stage-and-merge statement
  (``INSERT ... ON CONFLICT (keys) DO UPDATE``) for a batch landed in a
  staging table, so a sink keyed on a primary key is ALSO idempotent at
  the row level (replays become no-op updates) — defense in depth when
  the ledger is lost with the checkpoint directory. Executed through
  ``dbapi.execute_sql`` (gated psycopg2, same as the staging swap).

At scale the pattern is: ``df.writeStream.foreachBatch(
idempotent_foreach_batch(writer, ledger))`` where ``writer`` stages the
batch via the JDBC bulk path and runs one merge statement — per batch,
one bulk write + one set-based SQL statement, no per-row driver work.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    ledger_path: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap ``write_fn(df, batch_id)`` so replayed micro-batch ids are
    skipped. The ledger append is atomic (write-temp + rename) and only
    happens AFTER ``write_fn`` returns — a crash mid-write replays the
    batch (correct: the write may be partial), a crash after the append
    skips it (correct: the write completed)."""

    def _done_ids() -> set[int]:
        if not os.path.exists(ledger_path):
            return set()
        with open(ledger_path, encoding="utf-8") as fh:
            return {json.loads(line)["batch_id"] for line in fh if line.strip()}

    def inner(df: DataFrame, batch_id: int) -> None:
        if batch_id in _done_ids():
            return
        write_fn(df, batch_id)
        tmp = f"{ledger_path}.tmp.{batch_id}"
        done = _done_ids() | {batch_id}
        with open(tmp, "w", encoding="utf-8") as fh:
            for b in sorted(done):
                fh.write(json.dumps({"batch_id": b}) + "\n")
        os.replace(tmp, ledger_path)

    return inner


def upsert_sql(
    table: str,
    staging_table: str,
    columns: list[str],
    key_columns: list[str],
) -> str:
    """Postgres ``INSERT ... ON CONFLICT DO UPDATE`` merging a staged
    micro-batch into the target — set-based, one statement per batch.
    Non-key columns take the staged values; a replayed batch rewrites
    identical values (idempotent)."""
    if not key_columns:
        raise ValueError("upsert needs at least one key column")
    missing = [k for k in key_columns if k not in columns]
    if missing:
        raise ValueError(f"key columns {missing} not in column list")
    updates = [c for c in columns if c not in key_columns]
    cols = ", ".join(columns)
    keys = ", ".join(key_columns)
    if updates:
        setter = ", ".join(f"{c} = EXCLUDED.{c}" for c in updates)
        action = f"DO UPDATE SET {setter}"
    else:
        action = "DO NOTHING"
    return (
        f"INSERT INTO {table} ({cols}) "
        f"SELECT {cols} FROM {staging_table} "
        f"ON CONFLICT ({keys}) {action}"
    )
