"""Pure-stdlib XLSX (OOXML SpreadsheetML) container parsing.

The invoice-shaped documents the reference extracts from PDFs ship
just as often as spreadsheets — line-item grids ARE worksheets. An
.xlsx is the same ZIP+XML package family as .docx (ECMA-376), so the
parse is `zipfile` + `ElementTree` inside the same zero-shuffle
Arrow map stage.

Span grammar mapping: one PAGE per worksheet (`=== PAGE N ===`
markers, sheet order from workbook.xml), the sheet name as the
page's first text span (the tab label a human reads first), then one
``text`` span per row — cells joined in column order with single
spaces, exactly the row-coherence rule the HTML ``<tr>`` and DOCX
``w:tr`` handling applies, so a spreadsheet invoice's line items
survive as whole rows for the downstream field extractors. Cell
values resolve through the shared-strings table (including rich-text
runs), inline strings, booleans and raw numeric text; formula CELLS
yield their cached <v> result (the value a reader sees), not the
formula source. Empty cells and empty rows vanish (whitespace
normalization, as everywhere else).
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_RELS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

MAIN_PART = "xl/workbook.xml"


class XlsxError(ValueError):
    """Raised for bytes that are not a parseable XLSX package."""


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    name = "xl/sharedStrings.xml"
    if name not in zf.namelist():
        return []
    out = []
    root = ET.fromstring(zf.read(name))
    for si in root.findall(f"{_S}si"):
        # plain <t> or rich-text runs <r><t>; itertext covers both
        out.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    return out


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, part path) in workbook order via workbook.xml and
    its .rels."""
    try:
        wb = ET.fromstring(zf.read(MAIN_PART))
    except (KeyError, ET.ParseError) as e:
        raise XlsxError(f"bad workbook.xml: {e}") from None
    rels: dict[str, str] = {}
    rname = "xl/_rels/workbook.xml.rels"
    if rname in zf.namelist():
        for rel in ET.fromstring(zf.read(rname)).iter(f"{_RELS}Relationship"):
            rid, target = rel.get("Id"), rel.get("Target", "")
            if rid:
                target = target.lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                rels[rid] = target
    out = []
    sheets = wb.find(f"{_S}sheets")
    for sh in (sheets.findall(f"{_S}sheet") if sheets is not None else []):
        rid = sh.get(f"{_R}id")
        part = rels.get(rid or "", "")
        if part and part in zf.namelist():
            out.append((sh.get("name") or "Sheet", part))
    if not out:
        raise XlsxError("workbook has no resolvable worksheets")
    return out


def _cell_text(c, shared: list[str]) -> str:
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{_S}is")
        if is_el is None:
            return ""
        return "".join(t.text or "" for t in is_el.iter(f"{_S}t"))
    v = c.find(f"{_S}v")
    raw = (v.text or "") if v is not None else ""
    if ctype == "s":
        try:
            i = int(raw)
            if not 0 <= i < len(shared):  # negative would alias the tail
                raise IndexError
            return shared[i]
        except (ValueError, IndexError):
            raise XlsxError(f"shared-string index {raw!r} out of range")
    if ctype == "b":
        return "TRUE" if raw.strip() == "1" else "FALSE"
    return raw  # n / str / e: the cached value text


def _col_index(ref: str) -> int:
    """'BC7' → 0-based column 54; cells without @r sort after ordered
    ones in document order (callers fall back to position)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def parse_xlsx_spans(data: bytes, doc_id: str) -> list[dict]:
    """XLSX bytes → ordered (kind, text, media_ref, offset) spans —
    one page per worksheet, one text span per non-empty row."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise XlsxError(f"not a ZIP package: {e}") from None
    if MAIN_PART not in zf.namelist():
        raise XlsxError("ZIP package has no xl/workbook.xml")
    shared = _shared_strings(zf)

    spans: list[dict] = []
    off = 0
    for page, (name, part) in enumerate(_sheet_parts(zf), start=1):
        spans.append({"kind": "page_break", "text": f"=== PAGE {page} ===",
                      "media_ref": "", "offset": off})
        off += 1
        title = " ".join(name.split())
        if title:
            spans.append({"kind": "text", "text": title,
                          "media_ref": "", "offset": off})
            off += 1
        try:
            sheet = ET.fromstring(zf.read(part))
        except ET.ParseError as e:
            raise XlsxError(f"malformed {part}: {e}") from None
        sdata = sheet.find(f"{_S}sheetData")
        if sdata is None:
            continue
        for row in sdata.findall(f"{_S}row"):
            cells = []
            for pos, c in enumerate(row.findall(f"{_S}c")):
                ref = c.get("r", "")
                col = _col_index(ref) if ref else pos
                cells.append((col if col >= 0 else pos,
                              _cell_text(c, shared)))
            cells.sort(key=lambda t: t[0])
            text = " ".join(" ".join(t for _, t in cells).split())
            if text:
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": off})
                off += 1
    return spans


# ---------------------------------------------------------------------------
# fixture writer


from .xmlutil import xml_escape as _esc  # noqa: E402


def build_xlsx(sheets: dict[str, list[list]],
               shared_strings: bool = True) -> bytes:
    """Deterministic XLSX fixture writer: sheet name → rows of cell
    values (str → shared or inline string per ``shared_strings``;
    int/float → number; bool → boolean cell)."""
    strings: list[str] = []

    def sref(s: str) -> int:
        try:
            return strings.index(s)
        except ValueError:
            strings.append(s)
            return len(strings) - 1

    def col_name(i: int) -> str:
        name = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            name = chr(65 + r) + name
        return name

    parts: dict[str, bytes] = {}
    sheet_decls, rel_decls, overrides = [], [], []
    for si, (name, rows) in enumerate(sheets.items(), start=1):
        xml_rows = []
        for ri, row in enumerate(rows, start=1):
            cs = []
            for ci, val in enumerate(row):
                ref = f"{col_name(ci)}{ri}"
                if isinstance(val, bool):
                    cs.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cs.append(f'<c r="{ref}"><v>{val}</v></c>')
                elif shared_strings:
                    cs.append(
                        f'<c r="{ref}" t="s"><v>{sref(str(val))}</v></c>')
                else:
                    cs.append(f'<c r="{ref}" t="inlineStr"><is><t '
                              f'xml:space="preserve">{_esc(str(val))}'
                              "</t></is></c>")
            xml_rows.append(f'<row r="{ri}">{"".join(cs)}</row>')
        parts[f"xl/worksheets/sheet{si}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main">'
            f"<sheetData>{''.join(xml_rows)}</sheetData></worksheet>"
        ).encode()
        sheet_decls.append(
            f'<sheet name="{_esc(name)}" sheetId="{si}" r:id="rId{si}"/>')
        rel_decls.append(
            f'<Relationship Id="rId{si}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{si}.xml"/>')
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{si}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>')

    n = len(sheets)
    if strings:
        parts["xl/sharedStrings.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
            f'2006/main" count="{len(strings)}" uniqueCount="{len(strings)}">'
            + "".join(f'<si><t xml:space="preserve">{_esc(s)}</t></si>'
                      for s in strings)
            + "</sst>"
        ).encode()
        rel_decls.append(
            f'<Relationship Id="rId{n + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'sharedStrings" Target="sharedStrings.xml"/>')
        overrides.append(
            '<Override PartName="/xl/sharedStrings.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'sharedStrings+xml"/>')

    parts[MAIN_PART] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_decls)}</sheets></workbook>"
    ).encode()
    parts["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        f"2006/relationships\">{''.join(rel_decls)}</Relationships>"
    ).encode()
    parts["_rels/.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/"
        'officeDocument" Target="xl/workbook.xml"/></Relationships>'
    ).encode()
    parts["[Content_Types].xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(overrides) + "</Types>"
    ).encode()

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(parts):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, parts[name])
    return buf.getvalue()
