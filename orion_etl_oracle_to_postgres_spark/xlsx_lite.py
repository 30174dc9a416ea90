"""Dependency-free xlsx I/O (stdlib zipfile + ElementTree).

The reference's config workflow is spreadsheet-driven
(``/root/reference/generate/generate_configs.py`` via
pandas.ExcelFile/ExcelWriter, which hard-require openpyxl). openpyxl is
not guaranteed in every runtime, and an xlsx file is just a zip of
small XML parts — this module implements the minimal subset the config
compiler needs, so the Excel round-trip EXECUTES everywhere:

* ``write_xlsx``: one worksheet per sheet, header row + data rows, all
  cells written as inline strings (no sharedStrings/styles parts —
  readable by Excel, LibreOffice, pandas, and ``read_xlsx``).
* ``read_xlsx``: sheet name/order from workbook.xml(+rels); cell values
  from inline strings, sharedStrings references, booleans, and numbers
  — enough to read both our own output and typical pandas/openpyxl-
  written workbooks (formulas yield their cached value).

``configgen`` prefers pandas/openpyxl when importable and falls back
here, so behavior upgrades transparently when the dependency exists.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any, Dict, List, Optional
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_DOC = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_REL_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_letter(idx: int) -> str:
    """0-based column index → A, B, ..., Z, AA, AB, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell reference 'BC12' → 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


# --- writing ----------------------------------------------------------


def _sheet_xml(columns: List[str], rows: List[Dict[str, Any]]) -> str:
    def cell(r: int, c: int, val: Any) -> str:
        if val is None or (isinstance(val, float) and val != val):  # None/NaN
            return ""
        text = escape(str(val))
        return (
            f'<c r="{_col_letter(c)}{r}" t="inlineStr">'
            f"<is><t xml:space=\"preserve\">{text}</t></is></c>"
        )

    lines = ['<row r="1">' + "".join(cell(1, c, h) for c, h in enumerate(columns)) + "</row>"]
    for i, row in enumerate(rows, start=2):
        lines.append(
            f'<row r="{i}">'
            + "".join(cell(i, c, row.get(h)) for c, h in enumerate(columns))
            + "</row>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS_MAIN}"><sheetData>' + "".join(lines) + "</sheetData></worksheet>"
    )


def write_xlsx(path: str, sheets: Dict[str, tuple[List[str], List[Dict[str, Any]]]]) -> None:
    """``sheets`` maps sheet name → (column list, row dicts). Sheet order
    follows dict order; the FIRST sheet is the tables sheet by the
    config-compiler convention."""
    names = list(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL_PKG}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL_DOC}"><sheets>'
        + "".join(
            # escape() alone leaves double quotes intact — they would
            # terminate the attribute and corrupt the workbook XML
            f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
            f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL_PKG}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(names):
            cols, rows = sheets[name]
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(cols, rows))


# --- reading ----------------------------------------------------------


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _cell_value(c: ET.Element, shared: List[str]) -> Any:
    t = c.get("t", "n")
    v_text: Optional[str] = None
    for child in c:
        tag = _strip(child.tag)
        if tag == "v":
            v_text = child.text or ""
        elif tag == "is":
            return "".join(x.text or "" for x in child.iter() if _strip(x.tag) == "t")
    if v_text is None:
        return None
    if t == "s":
        return shared[int(v_text)]
    if t == "b":
        return v_text == "1"
    if t in ("str", "inlineStr", "e"):
        return v_text
    try:  # numeric: int when integral, float otherwise
        f = float(v_text)
        return int(f) if f.is_integer() and "e" not in v_text.lower() else f
    except ValueError:
        return v_text


def read_xlsx(path: str) -> Dict[str, List[Dict[str, Any]]]:
    """Workbook → {sheet name: row dicts keyed by lowercase header}."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels
            if _strip(r.tag) == "Relationship"
        }
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst:
                shared.append(
                    "".join(x.text or "" for x in si.iter() if _strip(x.tag) == "t")
                )
        out: Dict[str, List[Dict[str, Any]]] = {}
        for sheet in wb.iter():
            if _strip(sheet.tag) != "sheet":
                continue
            rid = sheet.get(f"{{{_NS_REL_DOC}}}id") or sheet.get("r:id")
            target = rel_target[rid]
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(z.read(target))
            grid: List[List[Any]] = []
            for row in ws.iter():
                if _strip(row.tag) != "row":
                    continue
                cells: List[Any] = []
                for c in row:
                    if _strip(c.tag) != "c":
                        continue
                    ref = c.get("r")
                    idx = _col_index(ref) if ref else len(cells)
                    while len(cells) < idx:
                        cells.append(None)
                    cells.append(_cell_value(c, shared))
                grid.append(cells)
            if not grid:
                out[sheet.get("name")] = []
                continue
            header = [str(h).strip().lower() if h is not None else "" for h in grid[0]]
            rows = [
                {header[i]: (r[i] if i < len(r) else None) for i in range(len(header))}
                for r in grid[1:]
            ]
            out[sheet.get("name")] = rows
    return out
