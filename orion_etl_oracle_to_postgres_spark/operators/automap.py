"""Auto-mapping + schema reconciliation (P2/S4/S7).

Reference behavior: with no ``mappings``, build 1:1 rules from the
*target* table's catalog columns in ordinal order
(``/root/reference/plugins/default_auto_mapping.py:18-26``,
``/root/reference/connectors/postgres_connector.py:111-124``); schema
drift is healed at runtime by parsing ORA-00904 and retrying without the
missing column (``/root/reference/plugins/default_fetcher.py:33-63``).

Spark version: schemas are known up front, so reconciliation is a
pre-flight set intersection — no retry loop (SURVEY.md §2.2 S4). Columns
mapped-but-absent from the source are dropped with a warning, exactly the
drift the reference heals, but before the plan is built.
"""

from __future__ import annotations

import logging
from typing import Optional

from ..spec import MappingSpec, TableSpec

logger = logging.getLogger(__name__)


def auto_map(
    table_spec: TableSpec,
    source_columns: list[str],
    target_columns: Optional[list[str]] = None,
) -> list[MappingSpec]:
    """Fill empty mappings with 1:1 source→target rules.

    Prefers the target table's column list (reference parity) when the
    target exists; otherwise maps every source column to itself. Target
    columns not present in the source are skipped with a warning (the
    reference would hit ORA-00904 and drop them one by one).
    """
    if table_spec.mappings:
        return list(table_spec.mappings)
    base = target_columns if target_columns else source_columns
    src = set(source_columns)
    rules: list[MappingSpec] = []
    for col in base:
        if col not in src:
            logger.warning(
                "auto-map: column %r in target but not in source %s — dropped",
                col,
                table_spec.source_table,
            )
            continue
        rules.append(MappingSpec(source=col, target=col))
    if not rules:
        raise RuntimeError(
            f"auto-map produced no columns for {table_spec.source_table}"
        )
    return rules


def reconcile(
    rules: list[MappingSpec], source_columns: list[str]
) -> list[MappingSpec]:
    """Pre-flight schema-drift healing (S4): drop rules whose source
    column no longer exists; warn per drop; abort if nothing remains
    (the reference aborts when its retry loop empties the projection,
    ``default_fetcher.py:57-60``)."""
    src = set(source_columns)
    kept: list[MappingSpec] = []
    for r in rules:
        if r.source is not None and r.source not in src:
            logger.warning("schema drift: source column %r missing — rule dropped", r.source)
            continue
        kept.append(r)
    if not kept:
        raise RuntimeError("no mappable columns remain after schema reconciliation")
    return kept
