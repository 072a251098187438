"""Minimal stdlib .xlsx reader — the no-openpyxl fallback for
``pai.read_excel`` (reference: pandasai/__init__.py:300-318 reads Excel
via pandas/openpyxl).

An .xlsx file is a zip of XML parts; for the common case (inline
values, shared strings, first row = header) the stdlib ``zipfile`` +
``xml.etree`` cover it: ``xl/workbook.xml`` names the sheets,
``xl/_rels/workbook.xml.rels`` maps them to worksheet parts,
``xl/sharedStrings.xml`` holds the string pool, and each sheet part is
a ``<row><c r="A1" t="s"><v>0</v></c>...`` grid. Not supported (use
openpyxl): formulas (cached values ARE read), dates-as-styles
(returned as raw serial numbers), merged cells.

Excel is a driver-side format by nature (single zip, no splittable
row groups) — the frame is parallelized into Spark after parsing, like
the reference's pandas round-trip.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/package/2006/"
           "relationships}")
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    v = c.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(t_el.text or ""
                       for t_el in is_el.iter(f"{_NS}t")) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    # numeric: int when exact
    f = float(v.text)
    return int(f) if f.is_integer() else f


def list_sheets(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iter(f"{_NS}sheet")]


def read_xlsx(path: str, sheet_name=0):
    """Parse one sheet to a pandas DataFrame (first row = header)."""
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(f"{_REL_NS}Relationship")
        }
        sheets = []
        rid_attr = ("{http://schemas.openxmlformats.org/officeDocument/"
                    "2006/relationships}id")
        for s in wb.iter(f"{_NS}sheet"):
            sheets.append((s.get("name"), rid_to_target[s.get(rid_attr)]))
        if isinstance(sheet_name, int):
            name, target = sheets[sheet_name]
        else:
            matches = [t for t in sheets if t[0] == sheet_name]
            if not matches:
                raise ValueError(f"no sheet named {sheet_name!r}")
            name, target = matches[0]
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        target = target.lstrip("/")
        part = target if target.startswith("xl/") else f"xl/{target}"
        sheet = ET.fromstring(z.read(part))

    rows: dict[int, dict[int, object]] = {}
    max_col = -1
    for row in sheet.iter(f"{_NS}row"):
        r_idx = int(row.get("r")) - 1
        for c in row.iter(f"{_NS}c"):
            m = _CELL_REF.match(c.get("r", ""))
            if not m:
                continue
            col = _col_index(m.group(1))
            max_col = max(max_col, col)
            rows.setdefault(r_idx, {})[col] = _cell_value(c, shared)
    if not rows:
        return pd.DataFrame()
    header_idx = min(rows)
    header = [rows[header_idx].get(i, f"col{i}")
              for i in range(max_col + 1)]
    data = [[rows[r].get(i) for i in range(max_col + 1)]
            for r in sorted(rows) if r != header_idx]
    return pd.DataFrame(data, columns=[str(h) for h in header])
