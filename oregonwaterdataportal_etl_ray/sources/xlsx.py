"""Real xlsx (OOXML spreadsheet) byte codec + distributed parse stage (S10).

The reference ingests opaque workbook BLOBS and parses each into exactly
three validated record sets (reference userCode/xlsx/lib.py:33-56:
``pd.read_excel(bytes, sheet_name=None)`` -> sheet-count assertion ->
column-presence assertion per sheet; fetched as bytes in
userCode/xlsx/dag.py). No spreadsheet library ships in this container, but
xlsx is just a zip of small XML parts, so this module implements the subset
the pipeline needs with stdlib ``zipfile`` + ``xml.etree`` only:

* ``encode_xlsx``  — {sheet name: pyarrow.Table} -> workbook bytes
  (inline-string cells; int/float/bool/str columns; None -> empty cell).
* ``parse_xlsx_bytes`` — workbook bytes -> {sheet name: pyarrow.Table}
  (shared strings, inline strings, formula-string / bool / numeric cells,
  sparse cells via the ``r`` cell reference).
* ``parse_validated_xlsx`` — the reference's two validation laws on top:
  exact sheet set + declared-column presence.
* ``WorkbookParser`` — actor-pool ``map_batches`` stage: a batch of
  (id, payload) rows fans out to ONE tagged row stream (``sheet``
  discriminator + the union of all sheets' columns, null-padded), ready for
  :func:`..stages.workbook.split_source`. Workbook payloads are media-sized,
  so run it with a small ``batch_size`` and drop the payload early.

Scale notes (100 TB of attachments): each blob parses independently inside
one task — no shuffle; the output stream carries rows, never the zip bytes.
A terabyte-sized SINGLE workbook would need a streaming zip reader, which is
out of scope: the reference's workbooks are per-upload attachments (MBs).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pyarrow as pa

_XLSX_EPOCH_HEADER = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n')


def _col_letters(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    s = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        s = chr(ord("A") + r) + s
    return s


_CELL_REF_RE = re.compile(r"([A-Z]+)([0-9]+)")


def _ref_to_col(ref: str) -> int:
    m = _CELL_REF_RE.match(ref)
    if m is None:
        # a malformed cell ref (dirty-crawl workbook) must surface as the
        # documented corrupt-payload ValueError, not an AttributeError that
        # escapes parse_xlsx_bytes' tolerant-caller contract
        raise ValueError(f"malformed cell reference {ref!r}")
    acc = 0
    for ch in m.group(1):
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    return acc - 1


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _sheet_xml(table: pa.Table) -> str:
    """One worksheet part: header row from column names, then data rows.
    Strings are inline (no shared-string table needed on the write side);
    numbers/bools use <v>; None leaves the cell empty."""
    parts = [_XLSX_EPOCH_HEADER,
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
    header = table.column_names
    parts.append("<row>" + "".join(
        f'<c t="inlineStr"><is><t>{escape(str(h))}</t></is></c>'
        for h in header) + "</row>")
    for r in range(table.num_rows):
        cells = []
        for c in range(len(cols)):
            v = cols[c][r]
            if v is None:
                cells.append("<c/>")
            elif isinstance(v, bool):
                cells.append(f'<c t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, np.integer)):
                cells.append(f"<c><v>{int(v)}</v></c>")
            elif isinstance(v, (float, np.floating)):
                cells.append(f"<c><v>{float(v)!r}</v></c>")
            else:
                cells.append(f'<c t="inlineStr"><is><t>{escape(str(v))}</t>'
                             "</is></c>")
        parts.append("<row>" + "".join(cells) + "</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def encode_xlsx(sheets: dict[str, pa.Table]) -> bytes:
    """{sheet name: table} -> minimal valid .xlsx bytes (sheet order kept)."""
    names = list(sheets)
    content_types = (
        _XLSX_EPOCH_HEADER
        + '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>' for i in range(len(names)))
        + "</Types>")
    root_rels = (
        _XLSX_EPOCH_HEADER
        + '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')
    workbook = (
        _XLSX_EPOCH_HEADER
        + '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names))
        + "</sheets></workbook>")
    wb_rels = (
        _XLSX_EPOCH_HEADER
        + '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names)))
        + "</Relationships>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                       _sheet_xml(sheets[n]))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_shared_strings(data: bytes) -> list[str]:
    out = []
    for si in ElementTree.fromstring(data):
        out.append("".join(t.text or ""
                           for t in si.iter() if _local(t.tag) == "t"))
    return out


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(e.text or ""
                       for e in cell.iter() if _local(e.tag) == "t")
    v = None
    for e in cell:
        if _local(e.tag) == "v":
            v = e.text
            break
    if v is None:
        return None
    if t == "s":
        return shared[int(v)]
    if t == "str":
        return v
    if t == "b":
        return bool(int(v))
    try:
        return int(v)
    except ValueError:
        return float(v)


def _column_array(values: list) -> pa.Array:
    """Arrow array with per-column type inference; mixed-type columns (a
    crawl's dirty sheet) degrade to strings rather than failing the blob."""
    try:
        return pa.array(values)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return pa.array([None if v is None else str(v) for v in values],
                        pa.string())


def parse_xlsx_bytes(data: bytes) -> dict[str, pa.Table]:
    """Workbook bytes -> {sheet name: Table} (first row = header), in
    workbook sheet order. Raises ``ValueError`` on a non-xlsx payload."""
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an xlsx payload: {e}") from e
    try:
        return _parse_open_workbook(z)
    except (ElementTree.ParseError, KeyError, IndexError) as e:
        # malformed XML / missing parts inside a valid zip: same corrupt-
        # payload contract as a bad zip (ValueError), never a raw ParseError
        raise ValueError(f"corrupt xlsx payload: {e}") from e


def _parse_open_workbook(z: zipfile.ZipFile) -> dict[str, pa.Table]:
    with z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            shared = _parse_shared_strings(z.read("xl/sharedStrings.xml"))
        rels = {}
        if "xl/_rels/workbook.xml.rels" in names:
            for rel in ElementTree.fromstring(
                    z.read("xl/_rels/workbook.xml.rels")):
                target = rel.get("Target", "")
                rels[rel.get("Id")] = target.lstrip("/")
        wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
        out: dict[str, pa.Table] = {}
        sheet_no = 0
        for sheet in (e for e in wb.iter() if _local(e.tag) == "sheet"):
            sheet_no += 1
            rid = next((v for k, v in sheet.attrib.items()
                        if _local(k) == "id"), None)
            target = rels.get(rid, f"worksheets/sheet{sheet_no}.xml")
            if not target.startswith("xl/"):
                target = "xl/" + target
            rows: list[list] = []
            width = 0
            for row in (e for e in ElementTree.fromstring(z.read(target))
                        .iter() if _local(e.tag) == "row"):
                vals: list = []
                nxt = 0
                for cell in (c for c in row if _local(c.tag) == "c"):
                    ref = cell.get("r")
                    idx = _ref_to_col(ref) if ref else nxt
                    while len(vals) < idx:
                        vals.append(None)
                    vals.append(_cell_value(cell, shared))
                    nxt = idx + 1
                rows.append(vals)
                width = max(width, len(vals))
            if not rows:
                out[sheet.get("name", f"Sheet{sheet_no}")] = pa.table({})
                continue
            raw_header = rows[0] + [None] * (width - len(rows[0]))
            header: list[str] = []
            seen: set[str] = set()
            for i, hd in enumerate(raw_header):
                name = str(hd) if hd is not None else f"col{i}"
                # dirty sheets repeat headers; disambiguate pandas-style
                # instead of silently keeping only the last duplicate column
                k, base = 1, name
                while name in seen:
                    name = f"{base}.{k}"
                    k += 1
                seen.add(name)
                header.append(name)
            cols = {h: _column_array(
                [r[i] if i < len(r) else None for r in rows[1:]])
                for i, h in enumerate(header)}
            out[sheet.get("name", f"Sheet{sheet_no}")] = pa.table(cols)
    return out


def parse_validated_xlsx(data: bytes,
                         declared: dict[str, list[str]]) -> dict[str, pa.Table]:
    """The reference's two workbook laws on real bytes (reference
    userCode/xlsx/lib.py:33-56): the workbook must contain EXACTLY the
    declared sheets, and each sheet must contain every declared column."""
    wb = parse_xlsx_bytes(data)
    if set(wb) != set(declared):
        raise ValueError(
            f"workbook must contain exactly sheets {sorted(declared)}; "
            f"found {sorted(wb)}")
    for name, cols in declared.items():
        missing = sorted(set(cols) - set(wb[name].column_names))
        if missing:
            raise ValueError(
                f"sheet {name!r} validation failed: missing columns {missing}")
    return wb


class WorkbookParser:
    """Actor-pool map_batches stage: (id, workbook payload) rows -> ONE
    tagged row stream (``sheet`` + union of declared columns, null-padded)
    feeding :func:`..stages.workbook.split_source`.

    ``schema`` pins the Arrow type of every output data column so blocks
    from different blobs (where a column may be all-null) unify; ``declared``
    carries the validation law. The workbook bytes are dropped on output —
    only rows travel downstream."""

    def __init__(self, declared: dict[str, list[str]], schema: dict,
                 id_col: str = "blob_id", payload_col: str = "payload"):
        self.declared = declared
        self.schema = schema
        self.id_col = id_col
        self.payload_col = payload_col
        self.all_cols = list(schema)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        ids = batch[self.id_col].to_pylist()
        for bid, payload in zip(ids, batch[self.payload_col].to_pylist()):
            wb = parse_validated_xlsx(payload, self.declared)
            for sheet_name, cols in self.declared.items():
                t = wb[sheet_name]
                n = t.num_rows
                data = {
                    self.id_col: pa.array([bid] * n,
                                          batch.schema.field(self.id_col).type),
                    "sheet": pa.array([sheet_name] * n, pa.string()),
                }
                for c in self.all_cols:
                    if c in cols and c in t.column_names:
                        data[c] = t.column(c).cast(self.schema[c])
                    else:
                        data[c] = pa.nulls(n, self.schema[c])
                out.append(pa.table(data))
        if not out:
            fields = [batch.schema.field(self.id_col),
                      pa.field("sheet", pa.string())] + \
                     [pa.field(c, t) for c, t in self.schema.items()]
            return pa.schema(fields).empty_table()
        return pa.concat_tables(out)
