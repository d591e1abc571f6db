"""S3–S5: stdlib xlsx reader + positional annotation-sheet parsing,
fixtures shaped like the reference workbooks (loader.py:102-296)."""

import os

import pytest

from hive_population_ml_spark.io import (
    excel_scan,
    phenotypic_measurements,
    population_annotations,
    winter_mortality,
)
from hive_population_ml_spark.io.xlsx_lite import read_sheet, sheet_names, write_xlsx


def _d1_workbook(path):
    """D1-shaped workbook: Evaluation sheets (loader.py:108-135 layout:
    row0 headers; cols 0-3 date/yard/hive/boxes; cols 4-9 frames/box)
    plus a 2-header-row Phenotypic measurements sheet (loader.py:197+)."""
    eval_hdr = ["Dates", "Yard", "Hive ID", "Number of boxes",
                "Brood Chamber 1", "Brood chamber 2",
                "Honey supper 1", "Honey supper 2",
                "Honey supper 3", "Honey supper 4"]
    eval1 = [
        eval_hdr,
        ["2020-06-01", "North", 2056, 2, 8, 6, 3, None, None, None],
        ["2020-06-01", "North", 2057, 1, 5, None, None, None, None, None],
        [None, "North", 2058, 2, 9, 9, 9, 9, None, None],   # no date -> drop
        ["2020-06-01", "South", None, 1, 4, None, None, None, None, None],  # no hive
        ["2020-06-02", None, 2059, 1, None, None, None, None, None, None],  # 0 frames
    ]
    eval2 = [
        eval_hdr,
        ["2020-07-15", "North", 2056, 3, 9, 7, 4, 2, None, None],
    ]
    # Phenotypic: row0 category headers, row1 specific names, data from row2.
    # Positions (loader.py:227-245): 1 apiary, 3 hive, 4-6 brood, 8/10 varroa,
    # 12/14 defensive, 16/18 hygienic, 20 honey.
    def prow(apiary, hive, vals):
        row = [None] * 21
        row[1], row[3] = apiary, hive
        for pos, v in vals.items():
            row[pos] = v
        return row

    pheno = [
        ["cat"] * 21,
        ["name"] * 21,
        prow("North", "02056", {4: 12.0, 5: 3.0, 6: 15.0, 8: 1.2, 10: 2.4,
                                12: 10.0, 14: 20.0, 16: 80.0, 18: None, 20: 31.5}),
        prow("South", 2057.0, {4: 8.0, 5: 2.0, 6: 10.0, 8: None, 10: 3.0,
                               12: 5.0, 14: 7.0, 16: 60.0, 18: 70.0, 20: 12.0}),
        prow("South", None, {4: 1.0}),        # no hive id -> drop
        prow("East", "n/a", {4: 1.0}),        # unparseable id -> drop
    ]
    write_xlsx(path, {
        "Evaluation 1": eval1,
        "Notes": [["free", "text"]],          # non-Evaluation sheet ignored
        "Evaluation 2": eval2,
        "Phenotypic measurements": pheno,
    })


def _d2_workbook(path):
    hdr = ["Hive ID", "Apiary", "Mortality cause",
           "weight (kg) Nov 4 2020", "weight (kg) Apr 5 2021",
           "winter syrup consuption (kg)", "Bees frames Oct 20",
           "Bees frames Apr 2021"]
    rows = [
        hdr,
        [2056, "North", None, 38.2, 31.0, 12.5, 9, 7],
        [2057, "South", "varroa", 30.1, None, 10.0, 6, None],
    ]
    write_xlsx(path, {"Sheet1": rows})


@pytest.fixture
def d1(tmp_path):
    p = os.path.join(tmp_path, "D1_ant.xlsx")
    _d1_workbook(p)
    return p


@pytest.fixture
def d2(tmp_path):
    p = os.path.join(tmp_path, "D2_ant.xlsx")
    _d2_workbook(p)
    return p


def test_xlsx_lite_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "t.xlsx")
    write_xlsx(p, {"A": [["x", 1.5, None, True], [None, None, "z"]],
                   "B": [[42]]})
    assert sheet_names(p) == ["A", "B"]
    assert read_sheet(p, "A") == [["x", 1.5, None, True], [None, None, "z", None]]
    assert read_sheet(p, 1) == [[42.0]]


def test_excel_scan_positional_column_map(spark, d1):
    df = excel_scan(
        spark, d1, sheet="Evaluation 1",
        schema="hive_id int, b1 double",
        header_rows=1, column_map={2: "hive_id", 4: "b1"},
    )
    rows = {r["hive_id"]: r["b1"] for r in df.collect()}
    assert rows[2056] == 8.0 and rows[2057] == 5.0
    assert None in rows  # null hive id passes through at scan level


def test_population_annotations_parity(spark, d1):
    out = population_annotations(spark, d1)
    rows = {(r["hive_id"], str(r["date"])[:10]): r for r in out.collect()}
    # null-date, null-hive, zero-frame rows dropped (loader.py:147-156,166)
    assert len(rows) == 3
    assert rows[(2056, "2020-06-01")]["frames_of_bees"] == 17.0
    assert rows[(2056, "2020-06-01")]["evaluation"] == "Evaluation 1"
    assert rows[(2057, "2020-06-01")]["frames_of_bees"] == 5.0
    assert rows[(2056, "2020-07-15")]["frames_of_bees"] == 22.0
    assert rows[(2056, "2020-07-15")]["apiary"] == "North"


def test_phenotypic_measurements_parity(spark, d1):
    out = phenotypic_measurements(spark, d1)
    rows = {r["hive_id"]: r for r in out.collect()}
    assert set(rows) == {2056, 2057}  # "02056" normalized; bad ids dropped
    r = rows[2056]
    assert r["total_brood"] == 15.0 and r["honey_yield_kg"] == 31.5
    assert r["varroa_avg"] == pytest.approx(1.8)
    assert r["hygienic_avg"] == 80.0  # null-skipping mean, pandas semantics
    assert rows[2057]["varroa_avg"] == 3.0


def test_winter_mortality_parity(spark, d2):
    out = winter_mortality(spark, d2)
    rows = {r["hive_id"]: r for r in out.collect()}
    assert rows[2056]["survived"] is True
    assert rows[2057]["survived"] is False
    assert rows[2057]["mortality_cause"] == "varroa"
    assert rows[2056]["weight_after_kg"] == 31.0
    assert rows[2057]["weight_after_kg"] is None


def test_hive_id_mapping(spark, tmp_path):
    p = os.path.join(tmp_path, "D1_ant.xlsx")
    write_xlsx(p, {
        "ID lookup table": [
            ["Colony number CRSAD", "Colony number Nectar", "notes"],
            [2056, 202056, "ok"],
            [2057, None, "sensor missing -> dropped"],
            [None, 202058, "annotation missing -> dropped"],
            [2059, 202059, None],
        ],
    })
    from hive_population_ml_spark.io import hive_id_mapping

    rows = {r["sensor_id"]: r["annotation_id"] for r in hive_id_mapping(spark, p).collect()}
    assert rows == {202056: 2056, 202059: 2059}


def test_xlsx_lite_reads_shared_strings(tmp_path):
    """Files from real writers use sharedStrings (t="s") rather than
    inline strings; cover that read path with a hand-built part set."""
    import zipfile

    p = os.path.join(tmp_path, "ss.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>')
        z.writestr("_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>')
        z.writestr("xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/sharedStrings.xml",
            '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
            '<si><t>hello</t></si><si><r><t>wo</t></r><r><t>rld</t></r></si></sst>')
        # sparse row: B skipped; cell without r attr follows sequentially
        z.writestr("xl/worksheets/sheet1.xml",
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            '<row r="2"><c><v>3.5</v></c><c t="str"><v>formula-result</v></c></row>'
            '</sheetData></worksheet>')
    rows = read_sheet(p, "Data")
    assert rows[0] == ["hello", None, "world"]   # multi-run si joined, gap -> None
    assert rows[1] == [3.5, "formula-result", None]


def _rezip(path, transform):
    """Rewrite a zip applying transform(name, bytes) -> bytes to each part."""
    import zipfile

    with zipfile.ZipFile(path) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    with zipfile.ZipFile(path, "w") as z:
        for n, b in parts.items():
            z.writestr(n, transform(n, b))


def test_date_serial_epoch_identities():
    """Pinned conversion identities for the 1900 and 1904 date systems."""
    import datetime as dt

    from hive_population_ml_spark.io.xlsx_lite import (
        datetime_to_serial,
        serial_to_datetime,
    )

    # Unix epoch is serial 25569 in the 1900 system — the standard check.
    assert serial_to_datetime(25569) == dt.datetime(1970, 1, 1)
    # Post-leap-bug region: serial 61 = 1900-03-01 (phantom Feb 29 absorbed).
    assert serial_to_datetime(61) == dt.datetime(1900, 3, 1)
    # Fractional day = time of day.
    assert serial_to_datetime(25569.5) == dt.datetime(1970, 1, 1, 12)
    # 1904 system: serial 0 = 1904-01-01.
    assert serial_to_datetime(0, date1904=True) == dt.datetime(1904, 1, 1)
    # Round trip.
    d = dt.datetime(2020, 6, 1, 9, 30)
    assert serial_to_datetime(datetime_to_serial(d)) == d


def test_write_then_read_datetime_cells(tmp_path):
    """Writer emits styled serials; reader decodes them back to datetime."""
    import datetime as dt

    p = os.path.join(tmp_path, "dated.xlsx")
    d1, d2 = dt.datetime(2020, 6, 1), dt.datetime(2021, 4, 5, 14, 45)
    write_xlsx(p, {"S": [["when", "n"], [d1, 1.0], [d2, 2.0]]})
    rows = read_sheet(p, "S")
    assert rows[1] == [d1, 1.0]
    assert rows[2] == [d2, 2.0]
    # plain numerics are untouched (style 0 is not a date style)
    assert isinstance(rows[1][1], float)


def test_custom_numfmt_date_detection(tmp_path):
    """A custom numFmt (id >= 164) whose code contains date tokens marks
    its cells as dates; numeric formats like '#,##0.00' do not."""
    p = os.path.join(tmp_path, "c.xlsx")
    write_xlsx(p, {"S": [[1.0, 2.0]]})

    def patch(name, b):
        if name == "xl/styles.xml":
            return (
                b'<?xml version="1.0"?><styleSheet xmlns="http://schemas.'
                b'openxmlformats.org/spreadsheetml/2006/main">'
                b'<numFmts count="2">'
                b'<numFmt numFmtId="164" formatCode="yyyy-mm-dd"/>'
                b'<numFmt numFmtId="165" formatCode="#,##0.00&quot;m&quot;"/>'
                b"</numFmts>"
                b'<cellXfs count="3"><xf numFmtId="0"/>'
                b'<xf numFmtId="164" applyNumberFormat="1"/>'
                b'<xf numFmtId="165" applyNumberFormat="1"/></cellXfs>'
                b"</styleSheet>"
            )
        if name.endswith("sheet1.xml"):
            return (
                b'<?xml version="1.0"?><worksheet xmlns="http://schemas.'
                b'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                b'<row r="1"><c r="A1" s="1"><v>25569</v></c>'
                b'<c r="B1" s="2"><v>25569</v></c></row>'
                b"</sheetData></worksheet>"
            )
        return b

    _rezip(p, patch)
    import datetime as dt

    rows = read_sheet(p, "S")
    assert rows[0][0] == dt.datetime(1970, 1, 1)  # custom date fmt decoded
    assert rows[0][1] == 25569.0  # quoted "m" must not read as a date token


def test_absolute_relationship_targets(tmp_path):
    """Some producers write Target="/xl/worksheets/sheet1.xml" (absolute);
    the reader must normalize instead of mangling to xl/xl/..."""
    p = os.path.join(tmp_path, "abs.xlsx")
    write_xlsx(p, {"S": [["a", 1.0]]})
    _rezip(
        p,
        lambda n, b: b.replace(
            b'Target="worksheets/sheet1.xml"',
            b'Target="/xl/worksheets/sheet1.xml"',
        )
        if n == "xl/_rels/workbook.xml.rels"
        else b,
    )
    assert sheet_names(p) == ["S"]
    assert read_sheet(p, "S")[0] == ["a", 1.0]


def test_date1904_workbook_flag(tmp_path):
    import datetime as dt

    p = os.path.join(tmp_path, "mac.xlsx")
    write_xlsx(p, {"S": [[dt.datetime(2020, 1, 2)]]})

    def patch(name, b):
        if name == "xl/workbook.xml":
            return b.replace(
                b"<sheets>", b'<workbookPr date1904="1"/><sheets>'
            )
        if name.endswith("sheet1.xml"):
            # serial 100 under the 1904 epoch = 1904-04-10
            return b.replace(b"<v>43832.0</v>", b"<v>100</v>")
        return b

    _rezip(p, patch)
    assert read_sheet(p, "S")[0][0] == dt.datetime(1904, 4, 10)


def test_serial_dated_sheet_to_timestamp(spark, tmp_path):
    """Verdict item: a REAL serial-dated Evaluation sheet lands as
    TimestampNTZ through the production annotation loader."""
    import datetime as dt

    p = os.path.join(tmp_path, "d1_serial.xlsx")
    hdr = ["Dates", "Yard", "Hive ID", "Number of boxes",
           "b1", "b2", "b3", "b4", "b5", "b6"]
    write_xlsx(p, {
        "Evaluation 1": [
            hdr,
            [dt.datetime(2020, 6, 1), "North", 2056, 2, 8, 6, None, None, None, None],
            [dt.datetime(2020, 7, 15), "North", 2057, 1, 5, None, None, None, None, None],
        ],
    })
    out = population_annotations(spark, p)
    assert dict(out.dtypes)["date"] == "timestamp_ntz"
    got = {r["hive_id"]: r["date"] for r in out.collect()}
    assert got == {
        2056: dt.datetime(2020, 6, 1),
        2057: dt.datetime(2020, 7, 15),
    }
