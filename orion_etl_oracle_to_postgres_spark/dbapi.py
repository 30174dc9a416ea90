"""Driver-side ad-hoc SQL against the job's databases — the S6 "write
half" (reference ``execute()``:
``/root/reference/connectors/oracle_connector.py:89-107``,
``/root/reference/connectors/postgres_connector.py:81-99``).

Spark has no DDL/DML-to-external-DB primitive, and none is wanted — the
in-pipeline uses of DDL (tmp columns K3, finalize UPDATE K4) are
compiled away into joins. What legitimately remains driver-side is this
short list: the atomic staging swap (``sinks/jdbc.py``), maintenance
statements around a load (ANALYZE, index toggles), and parity for users
who call the reference's ``execute()`` directly. Those run over a plain
DBAPI connection built from the same connector spec the JDBC reader
uses.

Gated imports: ``psycopg2`` / ``oracledb`` are production-only
dependencies, absent in the dev sandbox (SURVEY.md §7.5) — importing
lazily keeps the module importable and unit-testable without them.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union


def dbapi_connect(conn: Any):
    """Open a DBAPI connection for a connector spec. Postgres specs carry
    ``database``, Oracle specs ``service_name`` — duck-typed so custom
    specs with the same fields work."""
    if getattr(conn, "database", None) is not None:
        try:
            import psycopg2  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("driver-side SQL against Postgres requires psycopg2") from e
        return psycopg2.connect(
            host=conn.host,
            port=int(conn.port),
            user=conn.user,
            password=conn.password,
            dbname=conn.database,
        )
    if getattr(conn, "service_name", None) is not None:
        try:
            import oracledb  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("driver-side SQL against Oracle requires oracledb") from e
        return oracledb.connect(
            user=conn.user,
            password=conn.password,
            dsn=f"{conn.host}:{conn.port}/{conn.service_name}",
        )
    raise ValueError(f"not a JDBC connector spec: {type(conn).__name__}")


def execute_sql(
    conn: Any,
    sql: Union[str, Sequence[str]],
    params: Optional[Sequence[Any]] = None,
) -> Any:
    """Run one statement — or a sequence of statements in a SINGLE
    transaction (the staging swap's DROP+RENAME must commit together).

    The single-transaction guarantee holds on POSTGRES (transactional
    DDL). On Oracle every DDL statement implicitly commits, so a
    multi-statement sequence containing DDL is NOT atomic there — the
    rollback in the error path cannot undo already-committed DDL. The
    staging swap targets Postgres (the reference's load side); don't
    rely on this for multi-statement Oracle DDL.

    Reference semantics (``postgres_connector.py:81-99``): a statement
    that produces rows returns ``fetchall()``; otherwise the rowcount.
    Detection is by ``cursor.description`` (not string-sniffing, so
    ``WITH ... SELECT`` and ``RETURNING`` work). On any error the whole
    transaction rolls back.
    """
    stmts = [sql] if isinstance(sql, str) else list(sql)
    if params is not None and len(stmts) != 1:
        raise ValueError("params only apply to a single statement")
    c = dbapi_connect(conn)
    try:
        cur = c.cursor()
        result: Any = None
        for s in stmts:
            if params is not None:
                cur.execute(s, params)
            else:
                cur.execute(s)
            result = cur.fetchall() if cur.description is not None else cur.rowcount
        c.commit()
        return result
    except Exception:
        try:
            c.rollback()
        except Exception:  # pragma: no cover — rollback on a dead connection
            pass
        raise
    finally:
        c.close()
