"""Real xlsx byte codec (S10): roundtrip goldens, the reference's two
validation laws (sheet count, column presence — userCode/xlsx/lib.py:33-56,
main_test.py:21-33 cell goldens / 41-44 bad-workbook), shared-string and
sparse-cell reading, and the distributed WorkbookParser stage."""

import io
import zipfile

import pyarrow as pa
import pytest

import ray

from oregonwaterdataportal_etl_ray.sources.xlsx import (
    WorkbookParser, encode_xlsx, parse_validated_xlsx, parse_xlsx_bytes)


def _golden_workbook() -> bytes:
    return encode_xlsx({
        "Site Data": pa.table({
            "Site": ["S1", "S2"],
            "Operating/Monitoring/Sampling Organization":
                ["Environmental Agency", "Other Org"],
        }),
        "Metadata": pa.table({
            "Metadata Identifier": ["MD12345", "MD67890"],
            "n": pa.array([1, 2], pa.int64()),
        }),
        "Data": pa.table({
            "Data Quality": ["Good", "Poor"],
            "value": pa.array([1.5, -2.25], pa.float64()),
            "flag": pa.array([True, False]),
        }),
    })


def test_roundtrip_cell_goldens():
    # mirrors reference main_test.py:21-33: named cells of each sheet
    wb = parse_xlsx_bytes(_golden_workbook())
    assert list(wb) == ["Site Data", "Metadata", "Data"]
    assert wb["Data"]["Data Quality"][0].as_py() == "Good"
    assert wb["Metadata"]["Metadata Identifier"][1].as_py() == "MD67890"
    assert (wb["Site Data"]["Operating/Monitoring/Sampling Organization"][0]
            .as_py() == "Environmental Agency")
    # types survive: int64 / float64 / bool, exact float repr roundtrip
    assert wb["Metadata"]["n"].to_pylist() == [1, 2]
    assert wb["Data"]["value"].to_pylist() == [1.5, -2.25]
    assert wb["Data"]["flag"].to_pylist() == [True, False]


def test_roundtrip_none_and_escaping():
    wb = parse_xlsx_bytes(encode_xlsx({
        "S": pa.table({"a": ["x<>&\"y", None, "z"],
                       "b": pa.array([None, 2, None], pa.int64())})}))
    assert wb["S"]["a"].to_pylist() == ["x<>&\"y", None, "z"]
    assert wb["S"]["b"].to_pylist() == [None, 2, None]


def test_validation_laws():
    blob = _golden_workbook()
    declared = {"Site Data": ["Site"], "Metadata": ["n"], "Data": ["value"]}
    assert set(parse_validated_xlsx(blob, declared)) == set(declared)
    with pytest.raises(ValueError, match="exactly sheets"):
        parse_validated_xlsx(blob, {"Site Data": ["Site"], "Metadata": ["n"]})
    with pytest.raises(ValueError, match="missing columns"):
        parse_validated_xlsx(blob, dict(declared, Data=["value", "nope"]))
    with pytest.raises(ValueError, match="not an xlsx"):
        parse_xlsx_bytes(b"definitely not a zip")


def test_reads_shared_strings_and_sparse_cells():
    """Workbooks written by OTHER tools use a shared-string table and sparse
    cells with r= references — the reader must handle both even though our
    writer never emits them."""
    shared = ('<?xml version="1.0"?><sst xmlns="http://schemas.'
              'openxmlformats.org/spreadsheetml/2006/main">'
              "<si><t>hdr_a</t></si><si><t>hel</t><t>lo</t></si></sst>")
    sheet = ('<?xml version="1.0"?><worksheet xmlns="http://schemas.'
             'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
             '<row r="1"><c r="A1" t="s"><v>0</v></c>'
             '<c r="C1" t="inlineStr"><is><t>hdr_c</t></is></c></row>'
             '<row r="2"><c r="A2" t="s"><v>1</v></c>'
             '<c r="C2"><v>7</v></c></row>'
             "</sheetData></worksheet>")
    wb_xml = ('<?xml version="1.0"?><workbook xmlns="http://schemas.'
              'openxmlformats.org/spreadsheetml/2006/main" '
              'xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
              '2006/relationships"><sheets>'
              '<sheet name="Only" sheetId="1" r:id="rId1"/></sheets>'
              "</workbook>")
    rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" '
            'Target="worksheets/sheet1.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    wb = parse_xlsx_bytes(buf.getvalue())
    t = wb["Only"]
    assert t.column_names == ["hdr_a", "col1", "hdr_c"]
    assert t["hdr_a"].to_pylist() == ["hello"]   # concatenated <t> runs
    assert t["col1"].to_pylist() == [None]       # sparse B column
    assert t["hdr_c"].to_pylist() == [7]


def test_workbook_parser_stage_distributed(ray_session):
    declared = {"Site Data": ["sid", "org"], "Data": ["sid", "v"]}
    schema = {"sid": pa.int64(), "org": pa.string(), "v": pa.float64()}

    def blob(i: int) -> bytes:
        return encode_xlsx({
            "Site Data": pa.table({"sid": pa.array([i, i + 10], pa.int64()),
                                   "org": ["a", "b"]}),
            "Data": pa.table({"sid": pa.array([i], pa.int64()),
                              "v": pa.array([i * 0.5], pa.float64())}),
        })

    ds = ray.data.from_arrow(pa.table({
        "blob_id": pa.array([1, 2], pa.int32()),
        "payload": pa.array([blob(1), blob(2)], pa.large_binary())}))
    out = ds.map_batches(
        WorkbookParser, fn_constructor_kwargs=dict(declared=declared, schema=schema),
        batch_format="pyarrow", batch_size=1, concurrency=(1, 2)).to_pandas()
    assert len(out) == 6   # 2 blobs x (2 site rows + 1 data row)
    data_rows = out[out["sheet"] == "Data"].sort_values("blob_id")
    assert data_rows["v"].tolist() == [0.5, 1.0]
    assert data_rows["org"].isna().all()          # null-padded non-sheet cols
    site = out[out["sheet"] == "Site Data"]
    assert sorted(site["sid"].tolist()) == [1, 2, 11, 12]

    # a corrupt blob fails loud
    bad = ray.data.from_arrow(pa.table({
        "blob_id": pa.array([9], pa.int32()),
        "payload": pa.array([b"junk"], pa.large_binary())}))
    with pytest.raises(Exception, match="not an xlsx"):
        bad.map_batches(
            WorkbookParser,
            fn_constructor_kwargs=dict(declared=declared, schema=schema),
            batch_format="pyarrow", concurrency=(1, 1)).materialize()


def test_malformed_cell_ref_is_valueerror():
    """A dirty-crawl worksheet with a malformed cell reference must surface
    as the documented corrupt-payload ValueError, not an AttributeError that
    escapes tolerant callers catching ValueError."""
    blob = encode_xlsx({"s": pa.table({"a": pa.array([1, 2], pa.int64())})})
    src = zipfile.ZipFile(io.BytesIO(blob))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as dst:
        for item in src.infolist():
            data = src.read(item.filename)
            if item.filename.startswith("xl/worksheets/"):
                # the writer emits ref-less cells; inject a malformed ref
                data = data.replace(b'<c><v>1</v>', b'<c r="-3"><v>1</v>', 1)
            dst.writestr(item, data)
    with pytest.raises(ValueError, match="cell reference"):
        parse_xlsx_bytes(buf.getvalue())
