"""Pure-stdlib XLSX read/write (zipfile + xml.etree) — no openpyxl needed.

Reference analog: ``core/utils.py:157-186`` (`load_dataset`) reads ``.xlsx``
via pandas/openpyxl. This container ships no openpyxl, so the engine parses
the OOXML spreadsheet format directly: an ``.xlsx`` file is a zip archive of
XML parts (ECMA-376, public spec). The subset implemented here covers what a
data-ingestion path needs:

- ``xl/workbook.xml`` + ``xl/_rels/workbook.xml.rels`` — sheet discovery in
  workbook order, resolved through relationship ids.
- ``xl/sharedStrings.xml`` — the shared-string table (``t="s"`` cells),
  including ``<r>`` rich-text runs (concatenated).
- ``xl/worksheets/sheetN.xml`` — sparse cell grid; cell types ``s`` (shared
  string), ``str`` (formula result string), ``inlineStr``, ``b`` (boolean),
  ``e`` (error -> None), and numeric (default). Missing cells are None.

Not implemented (documented, raises nothing — values come back as the raw
stored number): date/time *style* resolution. OOXML stores dates as serial
numbers plus a cell style; resolving them needs the styles part + number
format table, which ingestion callers can apply downstream if needed.

The writer emits a minimal valid workbook (inline strings, one sheet) —
used by tests to build fixtures and by the engine to export small result
tables; scale-irrelevant by design (spreadsheets are driver-sized).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Any, Optional

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> Optional[int]:
    """'A'->0, 'Z'->25, 'AA'->26 (the base-26 bijective column scheme)."""
    m = _CELL_REF.match(ref)
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _parse_shared_strings(data: bytes) -> list[str]:
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # Either a single <t> or rich-text <r><t> runs; concatenate runs.
        parts = [t.text or "" for t in si.iter(f"{_NS}t")]
        out.append("".join(parts))
    return out


def _parse_number(text: str) -> Any:
    f = float(text)
    return int(f) if f.is_integer() and "e" not in text.lower() and "." not in text else f


def _cell_value(cell, shared: list[str]) -> Any:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text.strip() in ("1", "true")
    if ctype == "e":
        return None
    return _parse_number(v.text)


def _sheet_paths(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_path)] in workbook order, via the rels part."""
    rels = {}
    try:
        rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.iter(f"{_PKG_REL}Relationship"):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            rels[rel.get("Id")] = target
    except KeyError:
        pass
    out = []
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    for sheet in wb.iter(f"{_NS}sheet"):
        rid = sheet.get(f"{_NS_REL}id")
        path = rels.get(rid, "xl/worksheets/sheet1.xml")
        out.append((sheet.get("name", "Sheet1"), path))
    return out


def read_xlsx(
    path: str, sheet: Optional[str] = None
) -> tuple[list[str], list[list[Any]]]:
    """Parse one sheet -> (header, rows). First row is the header (matching
    ``pandas.read_excel`` defaults); rows are padded/truncated to its width.
    ``sheet`` selects by name; default is the first sheet in workbook order.
    """
    with zipfile.ZipFile(path) as zf:
        try:
            shared = _parse_shared_strings(zf.read("xl/sharedStrings.xml"))
        except KeyError:
            shared = []
        sheets = _sheet_paths(zf)
        if not sheets:
            raise ValueError(f"no sheets in workbook: {path}")
        if sheet is not None:
            matches = [p for (n, p) in sheets if n == sheet]
            if not matches:
                raise ValueError(
                    f"sheet {sheet!r} not in workbook "
                    f"(has {[n for n, _ in sheets]})"
                )
            sheet_path = matches[0]
        else:
            sheet_path = sheets[0][1]
        root = ET.fromstring(zf.read(sheet_path))

    grid: list[list[Any]] = []
    width = 0
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, Any] = {}
        next_col = 0
        for cell in row.findall(f"{_NS}c"):
            ref = cell.get("r")
            col = _col_index(ref) if ref else next_col
            if col is None:
                col = next_col
            cells[col] = _cell_value(cell, shared)
            next_col = col + 1
        row_width = max(cells) + 1 if cells else 0
        width = max(width, row_width)
        grid.append([cells.get(i) for i in range(row_width)])

    if not grid:
        return [], []
    header_raw = grid[0] + [None] * (width - len(grid[0]))
    header = [
        str(h) if h is not None else f"col_{i}" for i, h in enumerate(header_raw)
    ]
    # duplicate headers mangle pandas-style ('a', 'a.1', 'a.2') — column
    # names must be unique keys downstream (a collision would interleave
    # two columns' values into one)
    seen: dict[str, int] = {}
    for i, h in enumerate(header):
        if h in seen:
            k = seen[h] + 1
            while f"{h}.{k}" in seen:  # mangled name may itself collide
                k += 1
            seen[h] = k
            header[i] = f"{h}.{k}"
        seen[header[i]] = seen.get(header[i], 0)
    rows = [r + [None] * (width - len(r)) for r in grid[1:]]
    return header, rows


_XL_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    return "".join(_XL_ESC.get(c, c) for c in s)


def write_xlsx(
    path: str, header: list[str], rows: list[list[Any]], sheet: str = "Sheet1"
) -> None:
    """Write a minimal single-sheet workbook: inline strings, raw numbers,
    booleans as t="b". Enough for any OOXML reader (verified against this
    module's own parser and the format spec)."""
    cells_xml = []
    for r_i, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        parts = []
        for c_i, v in enumerate(row):
            col = ""
            n = c_i + 1
            while n:
                n, rem = divmod(n - 1, 26)
                col = chr(ord("A") + rem) + col
            ref = f"{col}{r_i}"
            if v is None:
                continue
            if isinstance(v, bool):
                parts.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                parts.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                parts.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{_esc(str(v))}</t></is></c>"
                )
        cells_xml.append(f'<row r="{r_i}">{"".join(parts)}</row>')

    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(cells_xml)
        + "</sheetData></worksheet>"
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        f'<sheet name="{_esc(sheet)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    rels_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/worksheet"
        '" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.spreadsheetml."
        'worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", rels_xml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
