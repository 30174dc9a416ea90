"""Partitioned JDBC source (S1/S5/S6/S7).

The reference streams rows through ONE connection with a server cursor
(``/root/reference/connectors/oracle_connector.py:57-87``); here reads
are split across executors via partitionColumn/lowerBound/upperBound/
numPartitions, and ``fetchsize`` plays the role of the reference's
``batch_size`` (``/root/reference/mappings/parser.py:143``).

Projection and predicate pushdown into the generated SQL are Catalyst
built-ins (SURVEY.md §4) — ``df.select``/``df.filter`` on the returned
DataFrame reach the database; nothing manual needed.

No live Oracle/Postgres exists in the dev loop (SURVEY.md §7.5), so this
module is exercised by unit tests only up to URL/option construction;
the file connector covers end-to-end runs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def jdbc_scheme(jdbc_url: str) -> str:
    """The dialect token of a JDBC URL (``jdbc:postgresql://…`` →
    ``postgresql``, ``jdbc:oracle:thin:@…`` → ``oracle``); '' when the
    URL doesn't look like a JDBC URL."""
    parts = jdbc_url.split(":", 2)
    if len(parts) < 2 or parts[0] != "jdbc":
        return ""
    return parts[1].lower()


def dialect_options(jdbc_url: str, *, for_write: bool = False) -> dict[str, str]:
    """Per-dialect JDBC option defaults selected from the URL scheme
    (VERDICT r4 ask #9) — the documented, public driver/Spark options a
    production Oracle→Postgres migration sets, applied automatically so
    a job spec doesn't have to know them. Explicit caller options always
    override (these are merged lowest-precedence).

    Oracle reads: ``oracle.jdbc.mapDateToTimestamp=false`` (Spark's
    documented recommendation — Oracle DATE maps to java.sql.Date, not
    Timestamp, matching the reference's date handling) and a
    ``sessionInitStatement`` pinning NLS date/number formats so any
    string-cast pushdown comparison is deterministic per session.
    Postgres writes: ``reWriteBatchedInserts=true`` (pgjdbc batches are
    rewritten into multi-row INSERTs — the documented ~2-5× load-speed
    lever) and ``stringtype=unspecified`` (string params cast by the
    server, so text columns typed enum/json/uuid accept Spark string
    writes). Derby/H2/unknown dialects get no extras.
    """
    scheme = jdbc_scheme(jdbc_url)
    if scheme == "oracle":
        if for_write:
            return {}
        return {
            "oracle.jdbc.mapDateToTimestamp": "false",
            "sessionInitStatement": (
                "BEGIN EXECUTE IMMEDIATE 'ALTER SESSION SET "
                "NLS_DATE_FORMAT = ''YYYY-MM-DD HH24:MI:SS'' "
                "NLS_NUMERIC_CHARACTERS = ''.,'''; END;"
            ),
        }
    if scheme == "postgresql":
        if for_write:
            return {
                "reWriteBatchedInserts": "true",
                "stringtype": "unspecified",
            }
        return {}
    return {}


def jdbc_options(
    conn: Any,
    table: str,
    schema: str | None = None,
    *,
    fetchsize: int = 5000,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    query: str | None = None,
) -> dict[str, str]:
    """Build the option map for ``spark.read.format("jdbc")``.

    ``conn`` is an Oracle/Postgres connector spec (has ``jdbc_url``,
    ``user``, ``password``). ``query`` (S6 ad-hoc SQL) is mutually
    exclusive with ``dbtable``. Dialect defaults from
    ``dialect_options`` are merged lowest-precedence.
    """
    opts: dict[str, str] = dict(dialect_options(conn.jdbc_url))
    opts.update(
        {
            "url": conn.jdbc_url,
            "user": conn.user,
            "password": conn.password,
            "fetchsize": str(fetchsize),
        }
    )
    if query is not None:
        opts["query"] = query
    else:
        opts["dbtable"] = f"{schema}.{table}" if schema else table
    if partition_column:
        opts["partitionColumn"] = partition_column
        opts["numPartitions"] = str(num_partitions or 32)
        if lower_bound is not None:
            opts["lowerBound"] = str(lower_bound)
        if upper_bound is not None:
            opts["upperBound"] = str(upper_bound)
    return opts


def read_jdbc_table(
    spark: SparkSession,
    conn: Any,
    table: str,
    schema: str | None = None,
    allow_probes: bool = True,
    **kw,
) -> DataFrame:
    """Read a JDBC table, optionally partitioned.

    When ``partition_column`` is set but bounds aren't, Spark needs them:
    we issue a min/max probe query first (one tiny serial read), then the
    partitioned scan — the standard pattern for parallel JDBC ingest.
    With ``allow_probes=False`` (plan-review mode — ``runner --explain``
    promises zero source execution) the probe is skipped and the read
    falls back to unpartitioned, with a log note.
    """
    pc = kw.get("partition_column")
    if pc and (kw.get("lower_bound") is None or kw.get("upper_bound") is None):
        if not allow_probes:
            import logging

            logging.getLogger(__name__).info(
                "%s: bounds probe skipped (plan review) — explain shows an "
                "unpartitioned read",
                table,
            )
            kw = {k: v for k, v in kw.items() if k != "partition_column"}
        else:
            probe = spark.read.format("jdbc").options(
                **jdbc_options(
                    conn,
                    table,
                    schema,
                    query=f"SELECT MIN({pc}) AS lo, MAX({pc}) AS hi FROM "
                    + (f"{schema}.{table}" if schema else table),
                )
            ).load().collect()[0]
            # POSITIONAL access: Oracle folds unquoted aliases to
            # uppercase and Row.__getitem__ is case-sensitive
            lo, hi = probe[0], probe[1]
            if lo is None or hi is None:
                # empty table: no bounds to split on — read unpartitioned
                kw = {k: v for k, v in kw.items() if k != "partition_column"}
            else:
                kw["lower_bound"], kw["upper_bound"] = int(lo), int(hi)
    return (
        spark.read.format("jdbc")
        .options(**jdbc_options(conn, table, schema, **kw))
        .load()
    )
