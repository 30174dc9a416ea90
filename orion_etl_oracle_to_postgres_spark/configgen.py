"""Excel ⇄ YAML config compiler (SURVEY.md §2.2 S9 / §2.3 K5).

Re-expresses the reference's spreadsheet workflow
(``/root/reference/generate/generate_configs.py:83-268`` forward,
``:275-393`` reverse): an xlsx workbook whose FIRST sheet lists tables
(one row per table) and whose other sheets hold per-table mapping rules,
compiled to the same two-level YAML layout ``spec.load_job_spec`` reads.

Design: the cell mini-grammars and the sheet→spec assembly are pure
functions over plain dicts — fully unit-testable with no spreadsheet
library — and the thin xlsx I/O layer uses pandas/openpyxl when
importable (the reference hard-requires them) with a dependency-free
stdlib fallback (``xlsx_lite``) otherwise, so the round-trip executes
in every runtime.

Cell grammars (reference ``parse_mapping_sheet``,
``/root/reference/generate/generate_configs.py:125-187``):

* lookup cell   — ``[on_missing:]table.key[=value_col]``; an
  ``on_missing`` prefix of ``null`` means "leave NULL" (the default);
  the value side accepts ``col`` or ``table.col``.
* validation cell — comma-separated ``type:detail`` entries:
  ``regex:<pattern>``, ``range:<min>-<max>``,
  ``lookup:table.key[:on_fail]``.

Deliberate divergence: the reference appends only *lookup* validation
rules to the output (its ``vrules.append`` sits inside the lookup
branch, ``generate_configs.py:169-182``, so parsed regex/range rules
are dropped) — we implement the evident intent and keep all three.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import yaml

# --- scalar cell helpers (reference :57-80) ---------------------------


def cell_str(val: Any) -> Optional[str]:
    """None/NaN/blank → None, else stripped string."""
    if val is None:
        return None
    if isinstance(val, float) and val != val:  # NaN without a pandas dep
        return None
    s = str(val).strip()
    return s or None


def cell_bool(val: Any) -> bool:
    if isinstance(val, bool):
        return val
    if isinstance(val, int):
        return bool(val)
    if isinstance(val, str):
        return val.strip().lower() in ("true", "1", "yes", "y")
    return False


def cell_list(val: Any) -> Optional[List[str]]:
    """Comma-separated string (or actual list) → list of non-empty items."""
    if val is None or (isinstance(val, float) and val != val):
        return None
    if isinstance(val, str):
        items = [p.strip() for p in val.split(",") if p.strip()]
        return items or None
    if isinstance(val, (list, tuple)):
        items = [str(p).strip() for p in val if str(p).strip()]
        return items or None
    return None


# --- lookup cell grammar ----------------------------------------------


def parse_lookup_cell(cell: str) -> Dict[str, Any]:
    """``[on_missing:]table.key[=value_col]`` → LookupSpec-shaped dict.

    Raises ValueError on malformed cells (the reference logs and emits a
    half-filled dict; failing loudly is safer for a compiler).
    """
    parts = [p.strip() for p in cell.split(":")]
    base = parts[-1]
    on_missing = parts[0] if len(parts) > 1 and parts[0].lower() != "null" else None

    key_side, _, value_side = base.partition("=")
    table, dot, key = key_side.strip().partition(".")
    if not dot or not table or not key:
        raise ValueError(f"lookup cell needs table.key, got {cell!r}")

    value_column = None
    if value_side.strip():
        v = value_side.strip()
        value_column = v.split(".", 1)[1] if "." in v else v

    out: Dict[str, Any] = {"table": table, "key_column": key}
    if value_column:
        out["value_column"] = value_column
    if on_missing:
        out["on_missing"] = on_missing
    return out


def format_lookup_cell(lookup: Dict[str, Any]) -> str:
    """Inverse of :func:`parse_lookup_cell` (reverse xlsx generation)."""
    cell = f"{lookup['table']}.{lookup['key_column']}"
    if lookup.get("value_column"):
        cell += f"={lookup['value_column']}"
    if lookup.get("on_missing"):
        cell = f"{lookup['on_missing']}:{cell}"
    return cell


# --- validation cell grammar ------------------------------------------


def parse_validation_cell(cell: str) -> List[Dict[str, Any]]:
    """Comma-separated ``type:detail`` entries → ValidationSpec dicts."""
    rules: List[Dict[str, Any]] = []
    for item in cell_list(cell) or []:
        typ, sep, detail = item.partition(":")
        typ = typ.strip().lower()
        if not sep:
            raise ValueError(f"validation entry needs type:detail, got {item!r}")
        if typ in ("regex", "range"):
            rules.append({"type": typ, "pattern": detail.strip()})
        elif typ == "lookup":
            table_key, _, on_fail = detail.partition(":")
            table, dot, key = table_key.strip().partition(".")
            if not dot:
                raise ValueError(f"validation lookup needs table.key, got {item!r}")
            rule: Dict[str, Any] = {
                "type": "lookup",
                "lookup": {"table": table, "key_column": key},
            }
            if on_fail.strip():
                rule["lookup"]["on_missing"] = on_fail.strip()
                rule["on_fail"] = on_fail.strip()
            rules.append(rule)
        else:
            raise ValueError(f"unknown validation type {typ!r} in {item!r}")
    return rules


def format_validation_cell(rules: List[Dict[str, Any]]) -> str:
    """Inverse of :func:`parse_validation_cell`."""
    items = []
    for r in rules:
        if r["type"] in ("regex", "range"):
            items.append(f"{r['type']}:{r['pattern']}")
        elif r["type"] == "lookup":
            lk = r["lookup"]
            item = f"lookup:{lk['table']}.{lk['key_column']}"
            if lk.get("on_missing") or r.get("on_fail"):
                item += f":{lk.get('on_missing') or r['on_fail']}"
            items.append(item)
        else:
            raise ValueError(f"unknown validation type {r['type']!r}")
    return ",".join(items)


# --- sheet-row → spec assembly (pure) ---------------------------------

#: Column set required on the first (tables) sheet — reference
#: ``TABLE_TEMPLATE`` keys, ``generate_configs.py:34-45``.
TABLE_COLUMNS = [
    "source_table",
    "source_schema",
    "target_table",
    "target_schema",
    "fetcher_plugin",
    "mappings",
    "where",
    "transform_override",
    "transform_plugins",
    "loader_plugin",
]

#: Column set required on mapping sheets — reference ``MAPPING_TEMPLATE``.
MAPPING_COLUMNS = ["source", "target", "transform", "plugin", "lookup", "validation"]


def mapping_rows_to_specs(rows: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Mapping-sheet rows (dicts keyed by lowercase column name) →
    MappingSpec-shaped dicts."""
    out = []
    for row in rows:
        rule: Dict[str, Any] = {}
        for k in ("source", "target", "plugin"):
            if cell_str(row.get(k)):
                rule[k] = cell_str(row[k])
        tr = cell_list(row.get("transform"))
        if tr:
            rule["transform"] = tr
        lk = cell_str(row.get("lookup"))
        if lk:
            rule["lookup"] = parse_lookup_cell(lk)
        vc = cell_str(row.get("validation"))
        if vc:
            rule["validation"] = parse_validation_cell(vc)
        out.append(rule)
    return out


def table_row_to_spec(
    row: Dict[str, Any],
    mapping_sheets: Dict[str, List[Dict[str, Any]]],
) -> Optional[Tuple[str, Dict[str, Any]]]:
    """One tables-sheet row → (yaml_file_name, TableSpec-shaped dict).

    Returns None for rows missing source/target (reference skips them,
    ``generate_configs.py:224-227``). ``target_schema`` falls back to a
    ``schema.table``-qualified target, then ``public`` (``:230-233``).
    The ``mappings`` cell names another sheet in the workbook.
    """
    src, tgt = cell_str(row.get("source_table")), cell_str(row.get("target_table"))
    if not src or not tgt:
        return None
    tgt_schema = cell_str(row.get("target_schema"))
    if not tgt_schema and "." in tgt:
        tgt_schema, tgt = tgt.split(".", 1)
    spec: Dict[str, Any] = {
        "source_table": src,
        "source_schema": cell_str(row.get("source_schema")) or "",
        "target_table": tgt,
        "target_schema": tgt_schema or "public",
    }
    for k in ("fetcher_plugin", "where", "loader_plugin"):
        if cell_str(row.get(k)):
            spec[k] = cell_str(row[k])
    if cell_bool(row.get("transform_override")):
        spec["transform_override"] = True
    tp = cell_list(row.get("transform_plugins"))
    if tp:
        spec["transform_plugins"] = tp
    sheet = cell_str(row.get("mappings"))
    if sheet:
        if sheet not in mapping_sheets:
            raise ValueError(f"mapping sheet {sheet!r} not found in workbook")
        spec["mappings"] = mapping_rows_to_specs(mapping_sheets[sheet])
    return f"{tgt}.yaml", spec


def workbook_to_configs(
    tables_rows: List[Dict[str, Any]],
    mapping_sheets: Dict[str, List[Dict[str, Any]]],
    tables_folder: str = "tables",
    base_global: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[str, Any], Dict[str, Dict[str, Any]]]:
    """Whole-workbook assembly → (main_config_dict, {file: table_dict}).

    ``base_global`` preserves an existing main config's ``global``
    section; only ``tables_folder`` and ``table_files`` are overwritten
    (reference behavior, ``generate_configs.py:211-218,266-268``).
    """
    global_cfg = dict(base_global or {})
    global_cfg["tables_folder"] = tables_folder
    table_files: Dict[str, Dict[str, Any]] = {}
    for row in tables_rows:
        item = table_row_to_spec(row, mapping_sheets)
        if item:
            table_files[item[0]] = item[1]
    global_cfg["table_files"] = list(table_files)
    return {"global": global_cfg}, table_files


def specs_to_sheets(
    main_cfg: Dict[str, Any],
    table_cfgs: Dict[str, Dict[str, Any]],
) -> Tuple[List[Dict[str, Any]], Dict[str, List[Dict[str, Any]]]]:
    """Reverse direction (YAML → sheet rows), inverse of
    :func:`workbook_to_configs`; mapping sheets are named after the
    table file stem."""
    tables_rows: List[Dict[str, Any]] = []
    mapping_sheets: Dict[str, List[Dict[str, Any]]] = {}
    for fname, cfg in table_cfgs.items():
        stem = os.path.splitext(fname)[0]
        row = {k: cfg.get(k) for k in TABLE_COLUMNS if k != "mappings"}
        row["transform_override"] = cfg.get("transform_override", False)
        if cfg.get("transform_plugins"):
            row["transform_plugins"] = ",".join(cfg["transform_plugins"])
        if cfg.get("mappings"):
            row["mappings"] = stem
            mapping_sheets[stem] = [
                {
                    "source": m.get("source"),
                    "target": m.get("target"),
                    "transform": ",".join(m["transform"])
                    if isinstance(m.get("transform"), list)
                    else m.get("transform"),
                    "plugin": m.get("plugin"),
                    "lookup": format_lookup_cell(m["lookup"]) if m.get("lookup") else None,
                    "validation": format_validation_cell(m["validation"])
                    if m.get("validation")
                    else None,
                }
                for m in cfg["mappings"]
            ]
        tables_rows.append(row)
    return tables_rows, mapping_sheets


# --- YAML file I/O ----------------------------------------------------


def write_configs(
    out_dir: str,
    main_cfg: Dict[str, Any],
    table_cfgs: Dict[str, Dict[str, Any]],
    main_name: str = "config.yaml",
) -> None:
    """Write the two-level YAML layout ``spec.load_job_spec`` reads."""
    tables_dir = os.path.join(out_dir, main_cfg["global"].get("tables_folder", "tables"))
    os.makedirs(tables_dir, exist_ok=True)
    with open(os.path.join(out_dir, main_name), "w", encoding="utf-8") as f:
        yaml.dump(main_cfg, f, default_flow_style=False, sort_keys=False)
    for fname, cfg in table_cfgs.items():
        with open(os.path.join(tables_dir, fname), "w", encoding="utf-8") as f:
            yaml.dump(cfg, f, default_flow_style=False, sort_keys=False)


# --- xlsx I/O ---------------------------------------------------------
#
# pandas/openpyxl when importable (richer format support); otherwise the
# stdlib zip/XML implementation in ``xlsx_lite`` — the round-trip always
# EXECUTES, it never degrades to "grammar-tested only".


def _have_openpyxl() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - environment-dependent
        return False


def xlsx_to_configs(xlsx_path: str, tables_folder: str = "tables"):
    """Read a workbook (first sheet = tables, rest = mapping sheets) and
    return (main_cfg, table_cfgs)."""
    if _have_openpyxl():  # pragma: no cover - environment-dependent
        import pandas as pd

        xl = pd.ExcelFile(xlsx_path)
        sheets = {}
        for name in xl.sheet_names:
            df = xl.parse(name)
            df.columns = [str(c).strip().lower() for c in df.columns]
            sheets[name] = df.to_dict(orient="records")
        first = xl.sheet_names[0]
    else:
        from .xlsx_lite import read_xlsx

        sheets = read_xlsx(xlsx_path)
        first = next(iter(sheets))
    mapping_sheets = {k: v for k, v in sheets.items() if k != first}
    return workbook_to_configs(sheets[first], mapping_sheets, tables_folder)


def configs_to_xlsx(
    xlsx_path: str, main_cfg: Dict[str, Any], table_cfgs: Dict[str, Dict[str, Any]]
) -> None:
    """Write configs back to a workbook (reverse mode)."""
    tables_rows, mapping_sheets = specs_to_sheets(main_cfg, table_cfgs)
    if _have_openpyxl():  # pragma: no cover - environment-dependent
        import pandas as pd

        with pd.ExcelWriter(xlsx_path, engine="openpyxl") as writer:
            pd.DataFrame(tables_rows, columns=TABLE_COLUMNS).to_excel(
                writer, sheet_name="tables", index=False
            )
            for name, rows in mapping_sheets.items():
                pd.DataFrame(rows, columns=MAPPING_COLUMNS).to_excel(
                    writer, sheet_name=name[:31], index=False
                )
        return
    from .xlsx_lite import write_xlsx

    write_xlsx(
        xlsx_path,
        {
            "tables": (TABLE_COLUMNS, tables_rows),
            **{name[:31]: (MAPPING_COLUMNS, rows) for name, rows in mapping_sheets.items()},
        },
    )
