"""Minimal stdlib .xlsx reader/writer for edge ingestion (S3–S5).

The reference parses annotation workbooks with pandas+openpyxl
(reference ``src/data/loader.py:125-293``). openpyxl is not available
in every runtime, and Excel is an *edge* format here (SURVEY.md §7.5):
parsed once on the driver, never touched by executors. An .xlsx file
is a zip of SpreadsheetML XML parts, so a driver-side reader needs
nothing beyond ``zipfile`` + ``xml.etree`` — this module implements
exactly the subset the annotation workbooks use:

- shared strings, inline strings, numbers, booleans
- multiple named sheets (workbook.xml + relationship targets,
  including absolute '/xl/...' targets some producers emit)
- sparse rows/cells (missing cells -> None, ragged rows padded)
- date-serial decoding: numeric cells whose style resolves to a date
  numFmt (built-in ids 14-22/27-36/45-47 or a custom format with date
  tokens) come back as ``datetime.datetime``, honoring the workbook's
  date1904 flag and the 1899-12-30 epoch convention (the reference
  parses real workbook dates at ``src/data/loader.py:171``); ISO
  ``t="d"`` cells are parsed too

It is NOT a general Excel implementation (no formulas, no formatting
beyond date detection). The writer exists for tests and the
metrics-sink parity path; it round-trips datetimes as styled serials.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELDOC = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'BC12' -> 54 (0-based column from an A1-style ref)."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _sheet_targets(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {r.get("Id"): r.get("Target") for r in rels}
    out = []
    for s in wb.find(f"{_MAIN}sheets"):
        target = rid_to_target[s.get(f"{_RELDOC}id")]
        # Some producers write absolute targets ('/xl/worksheets/...');
        # strip the leading '/' BEFORE testing the prefix, else the
        # test fails and the path gets mangled to 'xl/xl/...'.
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        out.append((s.get("name"), target))
    return out


# Built-in numFmt ids that render as dates/times (ECMA-376 §18.8.30).
_BUILTIN_DATE_FMTS = frozenset(range(14, 23)) | frozenset(range(27, 37)) | {
    45,
    46,
    47,
}


def _is_date_code(code: str) -> bool:
    """True when a custom format code contains date/time tokens (y m d h
    s) outside quoted literals, [] sections, and escapes."""
    code = re.sub(r'"[^"]*"', "", code)
    code = re.sub(r"\[[^\]]*\]", "", code)
    code = re.sub(r"\\.", "", code)
    return bool(re.search(r"[ymdhsYMDHS]", code))


def _date_style_ids(z: zipfile.ZipFile) -> frozenset[int]:
    """Set of cellXf indices (cell ``s`` attribute values) whose numFmt
    is a date format."""
    if "xl/styles.xml" not in z.namelist():
        return frozenset()
    styles = ET.fromstring(z.read("xl/styles.xml"))
    custom_date = set()
    num_fmts = styles.find(f"{_MAIN}numFmts")
    if num_fmts is not None:
        for nf in num_fmts:
            if _is_date_code(nf.get("formatCode") or ""):
                custom_date.add(int(nf.get("numFmtId")))
    out = set()
    cell_xfs = styles.find(f"{_MAIN}cellXfs")
    if cell_xfs is not None:
        for i, xf in enumerate(cell_xfs):
            fmt = int(xf.get("numFmtId") or 0)
            if fmt in _BUILTIN_DATE_FMTS or fmt in custom_date:
                out.add(i)
    return frozenset(out)


def _uses_1904_epoch(z: zipfile.ZipFile) -> bool:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    pr = wb.find(f"{_MAIN}workbookPr")
    return pr is not None and (pr.get("date1904") or "0").lower() in ("1", "true")


def serial_to_datetime(serial: float, date1904: bool = False) -> _dt.datetime:
    """Excel date serial -> naive datetime. The 1900 system counts from
    an epoch of 1899-12-30 (absorbing Excel's phantom 1900-02-29 for
    serials >= 61, matching what every modern producer writes); the
    1904 system counts from 1904-01-01.

    Known pandas-compatible tradeoff: the uniform 1899-12-30 epoch
    means 1900-system serials 1-59 (dates before 1900-03-01) decode
    one day EARLY (serial 1 -> 1899-12-31, not 1900-01-01) — the same
    convention pandas/openpyxl's default path uses, chosen over a
    serial<60 special case because real sensor workbooks never carry
    pre-1900 dates and the uniform epoch keeps the arithmetic
    branch-free/vectorizable."""
    base = _dt.datetime(1904, 1, 1) if date1904 else _dt.datetime(1899, 12, 30)
    return base + _dt.timedelta(days=serial)


def datetime_to_serial(value: _dt.datetime, date1904: bool = False) -> float:
    base = _dt.datetime(1904, 1, 1) if date1904 else _dt.datetime(1899, 12, 30)
    return (value - base) / _dt.timedelta(days=1)


def sheet_names(path: str) -> list[str]:
    """Sheet names in workbook order (mirrors pd.ExcelFile.sheet_names,
    the reference's sheet-discovery loop at loader.py:130-135)."""
    with zipfile.ZipFile(path) as z:
        return [name for name, _ in _sheet_targets(z)]


def read_sheet(path: str, sheet: str | int = 0) -> list[list[object]]:
    """Parse one sheet to a dense list-of-rows (None for empty cells).

    Values come back as float (numeric cells), str (shared/inline
    strings), bool, or datetime (date-styled serials / t="d" cells).
    Row width = the sheet's max populated column, so positional
    ``iloc``-style indexing works like the reference's.
    """
    with zipfile.ZipFile(path) as z:
        sheets = _sheet_targets(z)
        date_styles = _date_style_ids(z)
        date1904 = _uses_1904_epoch(z)
        if isinstance(sheet, int):
            _, target = sheets[sheet]
        else:
            lookup = dict(sheets)
            if sheet not in lookup:
                raise KeyError(f"no sheet {sheet!r}; have {list(lookup)}")
            target = lookup[sheet]

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst:
                shared.append("".join(t.text or "" for t in si.iter(f"{_MAIN}t")))

        ws = ET.fromstring(z.read(target))
        raw_rows: list[dict[int, object]] = []
        width = 0
        for row in ws.iter(f"{_MAIN}row"):
            cells: dict[int, object] = {}
            next_ci = 0
            for c in row.iter(f"{_MAIN}c"):
                ref = c.get("r")
                ci = _col_index(ref) if ref else next_ci
                next_ci = ci + 1
                t = c.get("t", "n")
                if t == "inlineStr":
                    v: object = "".join(
                        tt.text or "" for tt in c.iter(f"{_MAIN}t")
                    )
                else:
                    ve = c.find(f"{_MAIN}v")
                    if ve is None or ve.text is None:
                        continue
                    if t == "s":
                        v = shared[int(ve.text)]
                    elif t == "str":
                        v = ve.text
                    elif t == "b":
                        v = bool(int(ve.text))
                    elif t == "d":
                        v = _dt.datetime.fromisoformat(ve.text)
                    elif int(c.get("s") or -1) in date_styles:
                        v = serial_to_datetime(float(ve.text), date1904)
                    else:
                        v = float(ve.text)
                cells[ci] = v
                width = max(width, ci + 1)
            raw_rows.append(cells)
        return [[cells.get(i) for i in range(width)] for cells in raw_rows]


# ---------------------------------------------------------------------------
# writer (tests + fixture generation); inline strings only — no sharedStrings
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{overrides}</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="1"><font/></fonts>'
    '<fills count="1"><fill/></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    # xf 0 = general; xf 1 = built-in numFmt 22 ("m/d/yy h:mm") — the
    # date style the writer assigns to datetime cells
    '<cellXfs count="2"><xf numFmtId="0"/>'
    '<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>'
    "</styleSheet>"
)


def _cell_xml(ref: str, value: object) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, _dt.datetime):
        return f'<c r="{ref}" s="1"><v>{datetime_to_serial(value)!r}</v></c>'
    if isinstance(value, _dt.date):
        return (
            f'<c r="{ref}" s="1">'
            f"<v>{datetime_to_serial(_dt.datetime(value.year, value.month, value.day))!r}</v></c>"
        )
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(value))}</t></is></c>'


def _col_ref(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def write_xlsx(path: str, sheets: dict[str, list[list[object]]]) -> None:
    """Write a workbook: {sheet_name: rows}; cells may be str/num/bool/None."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides, sheet_defs, rel_defs = [], [], []
        for n, (name, rows) in enumerate(sheets.items(), start=1):
            part = f"xl/worksheets/sheet{n}.xml"
            overrides.append(
                f'<Override PartName="/{part}" ContentType="application/'
                'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            )
            sheet_defs.append(
                f'<sheet name="{escape(name)}" sheetId="{n}" r:id="rId{n}"/>'
            )
            rel_defs.append(
                f'<Relationship Id="rId{n}" Type="http://schemas.openxml'
                "formats.org/officeDocument/2006/relationships/worksheet"
                f'" Target="worksheets/sheet{n}.xml"/>'
            )
            row_xml = []
            for ri, row in enumerate(rows, start=1):
                cells = "".join(
                    _cell_xml(f"{_col_ref(ci)}{ri}", v) for ci, v in enumerate(row)
                )
                row_xml.append(f'<row r="{ri}">{cells}</row>')
            z.writestr(
                part,
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(row_xml)
                + "</sheetData></worksheet>",
            )
        overrides.append(
            '<Override PartName="/xl/styles.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        )
        rel_defs.append(
            f'<Relationship Id="rId{len(sheets) + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/styles"
            '" Target="styles.xml"/>'
        )
        z.writestr("xl/styles.xml", _STYLES_XML)
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(overrides="".join(overrides)))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{''.join(sheet_defs)}</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(rel_defs)
            + "</Relationships>",
        )
