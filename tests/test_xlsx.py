"""Pure-stdlib XLSX reader/writer (sources/xlsx.py) — closes the
env-limited gap where xlsx ingestion previously required openpyxl
(reference reads xlsx in core/utils.py:157-186)."""

from __future__ import annotations

import zipfile

import pytest

from squrve_spark.sources import ingest_file
from squrve_spark.sources.xlsx import read_xlsx, write_xlsx


def test_roundtrip_types(tmp_path):
    p = str(tmp_path / "t.xlsx")
    header = ["id", "name", "score", "flag"]
    rows = [
        [1, "ann", 3.5, True],
        [2, "b<o>b & 'q'", 4.0, False],
        [3, None, None, True],
    ]
    write_xlsx(p, header, rows)
    h, r = read_xlsx(p)
    assert h == header
    assert r == rows


def test_handbuilt_shared_strings_sparse_and_rich_text(tmp_path):
    """A workbook built from raw XML (independent of our writer): shared
    strings, rich-text runs, sparse rows, out-of-order cell refs."""
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>id</t></si>"
        "<si><r><t>na</t></r><r><t>me</t></r></si>"  # rich-text runs
        "<si><t>alpha</t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        # sparse: B before A omitted; C2 present with A2 -> B2 is None
        '<row r="2"><c r="A2"><v>7</v></c><c r="C2" t="str"><v>fx</v></c></row>'
        '<row r="3"><c r="A3"><v>8.5</v></c><c r="B3" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook {ns} xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    p = str(tmp_path / "hand.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    h, r = read_xlsx(p)
    # header is padded to the grid width (widest row has 3 cols)
    assert h == ["id", "name", "col_2"]
    assert r[0][0] == 7 and r[0][1] is None and r[0][2] == "fx"
    assert r[1][0] == 8.5 and r[1][1] == "alpha"


def test_sheet_selection(tmp_path):
    p = str(tmp_path / "s.xlsx")
    write_xlsx(p, ["a"], [[1]], sheet="Only")
    h, r = read_xlsx(p, sheet="Only")
    assert (h, r) == (["a"], [[1]])
    with pytest.raises(ValueError):
        read_xlsx(p, sheet="Missing")


def test_ingest_xlsx_into_spark(spark, tmp_path):
    p = str(tmp_path / "people_x.xlsx")
    write_xlsx(
        p,
        ["id", "name", "score"],
        [[1, "ann", 3.5], [2, "bob", 4.0], [3, None, None]],
    )
    df = ingest_file(spark, str(p))
    assert df.count() == 3
    dt = dict(df.dtypes)
    assert dt["id"] in ("bigint", "int")
    assert dt["score"] == "double"
    assert dt["name"] == "string"
    got = spark.sql(
        "SELECT sum(score) AS s, count(name) AS n FROM people_x"
    ).collect()[0]
    assert got["s"] == 7.5 and got["n"] == 2


def test_ingest_xlsx_mixed_column_stringifies(spark, tmp_path):
    p = str(tmp_path / "mix.xlsx")
    write_xlsx(p, ["k"], [[1], ["two"]])
    df = ingest_file(spark, str(p))
    assert dict(df.dtypes)["k"] == "string"
    assert {r["k"] for r in df.collect()} == {"1", "two"}


def test_duplicate_headers_mangled(spark, tmp_path):
    """Review regression (late r4): duplicate headers previously collapsed
    into one dict key (crash or silently interleaved columns); now they
    mangle pandas-style."""
    p = str(tmp_path / "dup.xlsx")
    write_xlsx(p, ["a", "a", "b", "a"], [[1, 2, "x", 9], [3, 4, "y", 8]])
    h, r = read_xlsx(p)
    assert h == ["a", "a.1", "b", "a.2"]
    assert r == [[1, 2, "x", 9], [3, 4, "y", 8]]
    df = ingest_file(spark, p, table_name="dup_tbl")
    assert df.columns == ["a", "a.1", "b", "a.2"]
    assert df.count() == 2
    # pathological: mangled name collides with a literal header
    p2 = str(tmp_path / "dup2.xlsx")
    write_xlsx(p2, ["a", "a", "a.1"], [[1, 2, 3]])
    h2, _ = read_xlsx(p2)
    assert len(set(h2)) == 3
