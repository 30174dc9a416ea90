"""JDBC source/sink option construction (S1/S5/S6/K1/K2) — no live
database in the dev loop (SURVEY.md §7.5), so these pin everything up to
the Spark reader/writer boundary: URLs, option maps, partitioning."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark.sources.jdbc import (
    dialect_options,
    jdbc_options,
    jdbc_scheme,
)
from orion_etl_oracle_to_postgres_spark.spec import (
    OracleConnectorSpec,
    PostgresConnectorSpec,
)

ORA = OracleConnectorSpec(
    user="u", password="p", host="dbhost", port=1521, service_name="ORCL"
)
PG = PostgresConnectorSpec(
    user="u", password="p", host="pghost", port=5432, database="dwh"
)


def test_jdbc_urls():
    assert ORA.jdbc_url == "jdbc:oracle:thin:@//dbhost:1521/ORCL"
    assert PG.jdbc_url == "jdbc:postgresql://pghost:5432/dwh"


def test_basic_table_options():
    opts = jdbc_options(ORA, "CUSTOMER", "SRC")
    assert opts["dbtable"] == "SRC.CUSTOMER"
    assert opts["url"] == ORA.jdbc_url
    # reference batch_size default (mappings/parser.py:143) → fetchsize
    assert opts["fetchsize"] == "5000"
    assert "partitionColumn" not in opts


def test_schemaless_table():
    assert jdbc_options(PG, "customer")["dbtable"] == "customer"


def test_partitioned_read_options():
    opts = jdbc_options(
        PG,
        "orders",
        partition_column="o_orderkey",
        num_partitions=64,
        lower_bound=1,
        upper_bound=6_000_000,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "64"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")


def test_partitioning_defaults_to_32():
    assert jdbc_options(PG, "t", partition_column="id")["numPartitions"] == "32"


def test_query_option_excludes_dbtable():
    opts = jdbc_options(PG, "ignored", query="SELECT 1 AS x")
    assert opts["query"] == "SELECT 1 AS x"
    assert "dbtable" not in opts


def test_fetchsize_override():
    assert jdbc_options(PG, "t", fetchsize=200)["fetchsize"] == "200"


# ---------------------------------------------------------------------
# Driver-side ad-hoc SQL (S6 write half) + startup connectivity check
# ---------------------------------------------------------------------


class _FakeCursor:
    def __init__(self, log):
        self.log = log
        self.description = None
        self.rowcount = -1

    def execute(self, sql, params=None):
        self.log.append(("execute", sql, params))
        if "boom" in sql:
            raise RuntimeError("statement failed")
        if sql.lstrip().upper().startswith(("SELECT", "WITH")):
            self.description = [("x",)]
            self._rows = [(1,), (2,)]
        else:
            self.description = None
            self.rowcount = 3

    def fetchall(self):
        return self._rows


class _FakeConn:
    def __init__(self, log):
        self.log = log

    def cursor(self):
        return _FakeCursor(self.log)

    def commit(self):
        self.log.append(("commit",))

    def rollback(self):
        self.log.append(("rollback",))

    def close(self):
        self.log.append(("close",))


@pytest.fixture
def fake_dbapi(monkeypatch):
    log: list = []
    from orion_etl_oracle_to_postgres_spark import dbapi

    monkeypatch.setattr(dbapi, "dbapi_connect", lambda conn: _FakeConn(log))
    return log


def test_execute_sql_select_fetches_rows(fake_dbapi):
    from orion_etl_oracle_to_postgres_spark.dbapi import execute_sql

    assert execute_sql(PG, "SELECT 1") == [(1,), (2,)]
    assert ("commit",) in fake_dbapi and ("close",) in fake_dbapi


def test_execute_sql_dml_returns_rowcount_and_commits(fake_dbapi):
    from orion_etl_oracle_to_postgres_spark.dbapi import execute_sql

    assert execute_sql(PG, "UPDATE t SET x = 1") == 3
    assert fake_dbapi[-2:] == [("commit",), ("close",)]


def test_execute_sql_multi_statement_single_transaction(fake_dbapi):
    from orion_etl_oracle_to_postgres_spark.dbapi import execute_sql

    execute_sql(PG, ["DROP TABLE a", "ALTER TABLE b RENAME TO a"])
    kinds = [e[0] for e in fake_dbapi]
    assert kinds == ["execute", "execute", "commit", "close"]  # ONE commit


def test_execute_sql_rolls_back_on_error(fake_dbapi):
    from orion_etl_oracle_to_postgres_spark.dbapi import execute_sql

    with pytest.raises(RuntimeError, match="statement failed"):
        execute_sql(PG, ["DROP TABLE a", "boom"])
    kinds = [e[0] for e in fake_dbapi]
    assert "rollback" in kinds and "commit" not in kinds


def test_execute_sql_params_require_single_statement():
    from orion_etl_oracle_to_postgres_spark.dbapi import execute_sql

    with pytest.raises(ValueError, match="single statement"):
        execute_sql(PG, ["a", "b"], params=(1,))


def test_staging_swap_runs_one_transaction(fake_dbapi):
    from orion_etl_oracle_to_postgres_spark.sinks.jdbc import _swap_tables

    _swap_tables(PG, "public", "facts")
    stmts = [e[1] for e in fake_dbapi if e[0] == "execute"]
    # unquoted: identifiers must case-fold exactly like Spark's own
    # dbtable DDL did when it created/loaded the staging table
    assert stmts == [
        "DROP TABLE IF EXISTS public.facts",
        "ALTER TABLE public.facts__stg RENAME TO facts",
    ]
    assert [e[0] for e in fake_dbapi] == ["execute", "execute", "commit", "close"]


def test_dbapi_connect_rejects_non_jdbc_spec():
    from orion_etl_oracle_to_postgres_spark.dbapi import dbapi_connect
    from orion_etl_oracle_to_postgres_spark.spec import FilesConnectorSpec

    with pytest.raises(ValueError, match="not a JDBC connector spec"):
        dbapi_connect(FilesConnectorSpec(base_path="/tmp"))


def test_smoke_check_fails_fast_on_bad_jdbc(spark):
    """A bogus JDBC connector must fail AT STARTUP (reference
    cli.py:13-31 pings both DBs before running), not mid-pipeline."""
    from orion_etl_oracle_to_postgres_spark.runner import smoke_check
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        GlobalSpec,
        JobSpec,
    )

    job = JobSpec.model_validate(
        {
            "global": {
                "connectors": {
                    "postgres": {
                        "user": "u",
                        "password": "p",
                        "host": "no-such-host.invalid",
                        "port": 5432,
                        "database": "dwh",
                    }
                }
            }
        }
    )
    with pytest.raises(RuntimeError, match="connectivity check failed for postgres"):
        smoke_check(spark, job)


def test_staging_swap_clones_target_ddl(monkeypatch):
    """staging_swap must CREATE the staging table LIKE the target
    (preserving real DDL) and append into it — letting Spark create it
    would swap the target's schema for inferred TEXT columns. The swap
    DDL is unquoted so identifiers case-fold exactly like Spark's own
    dbtable DDL."""
    from orion_etl_oracle_to_postgres_spark.sinks import jdbc as sj

    executed: list[list[str]] = []
    writes: list[tuple[str, str]] = []

    monkeypatch.setattr(
        "orion_etl_oracle_to_postgres_spark.dbapi.execute_sql",
        lambda conn, sql, params=None: executed.append(
            [sql] if isinstance(sql, str) else list(sql)
        ),
    )
    monkeypatch.setattr(
        sj,
        "_write",
        lambda df, conn, dbtable, mode, *a, **k: writes.append((dbtable, mode)),
    )
    sj.write_jdbc_table(None, object(), "FACTS", "public", "overwrite", staging_swap=True)

    assert executed[0] == [
        "DROP TABLE IF EXISTS public.FACTS__stg",
        "CREATE TABLE public.FACTS__stg (LIKE public.FACTS INCLUDING ALL)",
    ]
    assert writes == [("public.FACTS__stg", "append")]  # DDL preserved
    # swap statements: unquoted identifiers, single transaction
    assert executed[1] == [
        "DROP TABLE IF EXISTS public.FACTS",
        "ALTER TABLE public.FACTS__stg RENAME TO FACTS",
    ]


def test_staging_swap_first_load_falls_back(monkeypatch):
    """No target yet (undefined_table from the LIKE clone): Spark
    creates the staging table (overwrite); transient errors propagate."""
    from orion_etl_oracle_to_postgres_spark.sinks import jdbc as sj

    writes: list[tuple[str, str]] = []

    def boom_missing(conn, sql, params=None):
        raise RuntimeError('relation "public.facts" does not exist (42P01)')

    monkeypatch.setattr(
        "orion_etl_oracle_to_postgres_spark.dbapi.execute_sql", boom_missing
    )
    monkeypatch.setattr(
        sj,
        "_write",
        lambda df, conn, dbtable, mode, *a, **k: writes.append((dbtable, mode)),
    )
    calls = {"swap": 0}
    monkeypatch.setattr(sj, "_swap_tables", lambda *a: calls.__setitem__("swap", 1))
    sj.write_jdbc_table(None, object(), "facts", "public", "overwrite", staging_swap=True)
    assert writes == [("public.facts__stg", "overwrite")] and calls["swap"] == 1

    def boom_auth(conn, sql, params=None):
        raise RuntimeError("FATAL: password authentication failed")

    monkeypatch.setattr(
        "orion_etl_oracle_to_postgres_spark.dbapi.execute_sql", boom_auth
    )
    import pytest as _pt

    with _pt.raises(RuntimeError, match="authentication"):
        sj.write_jdbc_table(None, object(), "facts", "public", "overwrite", staging_swap=True)


def test_setup_logging_honors_file_level(tmp_path):
    import logging

    from orion_etl_oracle_to_postgres_spark.runner import setup_logging

    log = tmp_path / "run.log"
    setup_logging(level="INFO", log_file=str(log), file_level="INFO")
    logging.getLogger("x").info("hello-info-line")
    for h in logging.getLogger().handlers:
        h.flush()
    assert "hello-info-line" in log.read_text()
    # restore default logging for other tests
    setup_logging(level="INFO")


def test_jdbc_scheme_parses_dialect_token():
    assert jdbc_scheme(ORA.jdbc_url) == "oracle"
    assert jdbc_scheme(PG.jdbc_url) == "postgresql"
    assert jdbc_scheme("jdbc:derby:memory:x;create=true") == "derby"
    assert jdbc_scheme("not-a-jdbc-url") == ""


def test_oracle_read_dialect_options_pinned():
    """VERDICT r4 ask #9: Oracle reads carry mapDateToTimestamp=false
    (DATE stays Date, reference parity) and an NLS-pinning
    sessionInitStatement; Oracle writes add nothing."""
    opts = jdbc_options(ORA, "CUSTOMER", "SRC")
    assert opts["oracle.jdbc.mapDateToTimestamp"] == "false"
    assert "NLS_DATE_FORMAT" in opts["sessionInitStatement"]
    assert dialect_options(ORA.jdbc_url, for_write=True) == {}


def test_postgres_write_dialect_options_pinned():
    """Postgres writes get reWriteBatchedInserts (multi-row INSERT
    rewrite, the documented pgjdbc load lever) and
    stringtype=unspecified (server-side casts for enum/json/uuid
    columns); Postgres reads add nothing."""
    w = dialect_options(PG.jdbc_url, for_write=True)
    assert w["reWriteBatchedInserts"] == "true"
    assert w["stringtype"] == "unspecified"
    assert dialect_options(PG.jdbc_url) == {}
    assert "reWriteBatchedInserts" not in jdbc_options(PG, "t")


def test_dialect_defaults_never_shadow_explicit_options():
    """Dialect defaults merge lowest-precedence: the core url/user/
    password/fetchsize/dbtable keys always come from the caller."""
    opts = jdbc_options(ORA, "T")
    assert opts["url"] == ORA.jdbc_url and opts["fetchsize"] == "5000"
    # unknown dialects (derby/h2/...) stay clean - the Derby live tests
    # exercise exactly this path
    assert dialect_options("jdbc:derby:memory:x;create=true") == {}
    assert dialect_options("jdbc:h2:mem:t", for_write=True) == {}
