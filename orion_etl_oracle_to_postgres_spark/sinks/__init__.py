"""Sinks: file + JDBC writers (SURVEY.md §2.3)."""

from .files import write_file_table
from .jdbc import write_jdbc_table

__all__ = ["write_file_table", "write_jdbc_table", "resolve_sink"]


def resolve_sink(df, connectors, table, schema=None, mode="overwrite", **kw):
    """Files in dev/test, else Postgres JDBC (the reference's target)."""
    if connectors.target_files is not None:
        return write_file_table(df, connectors.target_files, table, schema, mode)
    if connectors.postgres is not None:
        return write_jdbc_table(df, connectors.postgres, table, schema, mode, **kw)
    raise ValueError("no target connector configured")
