"""File sink — parquet/csv/json/orc writer used by the dev/test loop."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from ..spec import FilesConnectorSpec


def write_file_table(
    df: DataFrame,
    conn: FilesConnectorSpec,
    table: str,
    schema: str | None = None,
    mode: str = "overwrite",
) -> None:
    base = Path(conn.base_path)
    path = base / schema / table if schema else base / table
    writer = df.write.mode(mode).format(conn.format)
    if conn.format == "csv":
        writer = writer.option("header", "true")
    writer.save(str(path))
