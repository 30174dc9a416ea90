"""Sources: file-based (parquet/csv/json/orc) and partitioned JDBC
readers behind one interface keyed by connector config (SURVEY.md §2.2).
"""

from .files import read_file_table
from .jdbc import read_jdbc_table

__all__ = ["read_file_table", "read_jdbc_table", "resolve_source"]


def resolve_source(spark, connectors, table, schema=None, **kw):
    """Pick the configured connector: files win in dev/test (no live DBs
    — SURVEY.md §7.5), then a generic JDBC-by-URL endpoint, else Oracle
    JDBC (the reference's source side)."""
    if connectors.source_files is not None:
        return read_file_table(spark, connectors.source_files, table, schema)
    if connectors.source_jdbc is not None:
        return read_jdbc_table(spark, connectors.source_jdbc, table, schema, **kw)
    if connectors.oracle is not None:
        return read_jdbc_table(spark, connectors.oracle, table, schema, **kw)
    raise ValueError("no source connector configured")
