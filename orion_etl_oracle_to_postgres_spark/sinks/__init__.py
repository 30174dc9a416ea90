"""Sinks: file + JDBC writers (SURVEY.md §2.3)."""

from .files import write_file_table
from .jdbc import write_jdbc_table

__all__ = ["write_file_table", "write_jdbc_table", "resolve_sink"]


def resolve_sink(
    df,
    connectors,
    table,
    schema=None,
    mode="overwrite",
    partition_by=None,
    sort_by=None,
    **kw,
):
    """Files in dev/test, else Postgres JDBC (the reference's target)."""
    if connectors.target_files is not None:
        return write_file_table(
            df,
            connectors.target_files,
            table,
            schema,
            mode,
            partition_by=partition_by,
            sort_by=sort_by,
        )
    jdbc_conn = connectors.target_jdbc or connectors.postgres
    if jdbc_conn is not None:
        if partition_by:
            raise ValueError(
                f"table {table!r}: partition_by is a file-layout option; "
                "a JDBC target has no directory layout"
            )
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)  # insert-order locality
        return write_jdbc_table(df, jdbc_conn, table, schema, mode, **kw)
    raise ValueError("no target connector configured")
