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
    skipped. One fsync'd line is appended AFTER ``write_fn`` returns —
    a crash mid-write replays the batch (correct: the write may be
    partial), a crash after the append skips it (correct: the write
    completed); a torn final line parses as absent → replay (safe)."""

    def _done_ids() -> set[int]:
        if not os.path.exists(ledger_path):
            return set()
        ids: set[int] = set()
        with open(ledger_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    ids.add(int(json.loads(line)["batch_id"]))
                except (ValueError, KeyError, TypeError):
                    continue  # torn tail line from a crash → treat as absent
        return ids

    # read the ledger ONCE at wrapper construction (query start), then
    # append one fsync'd line per batch — O(1) driver work per trigger.
    # Re-reading + rewriting the whole file every micro-batch would be
    # quadratic over a long-running query's lifetime. The in-memory set
    # is authoritative within this process; a recovered process re-reads.
    done = _done_ids()

    def inner(df: DataFrame, batch_id: int) -> None:
        if batch_id in done:
            return
        write_fn(df, batch_id)
        with open(ledger_path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps({"batch_id": batch_id}) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        done.add(batch_id)

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
