"""PDF text extraction tests (io/pdftext.py): literal-string escape
grammar pinned byte-by-byte, nested parens, hex strings, TJ kerning
arrays, line-move structure, the CID/Identity-H mojibake guard,
FlateDecode framing, and the Spark binaryFile path."""

from __future__ import annotations

import zlib

import pytest

from hive_population_ml_spark.io import pdftext


def _pdf_with_content(ops: bytes, flate: bool = True) -> bytes:
    content = zlib.compress(ops) if flate else ops
    filt = b" /Filter /FlateDecode" if flate else b""
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )


def test_literal_escapes_and_nesting():
    ops = rb"""BT
(paren \(nested\) ok) Tj
(octal \101\102 and (really) nested) Tj
(tab\tand\nnewline) Tj
ET"""
    d = pdftext.extract_pdf_text(_pdf_with_content(ops))
    assert "paren (nested) ok" in d["text"]
    assert "octal AB and (really) nested" in d["text"]
    assert "tab\tand" in d["text"]
    assert d["n_text_ops"] == 3


def test_tj_array_and_line_moves():
    ops = (b"BT (Hel) Tj (lo) Tj 0 -14 Td "
           b"[(Wor) -120 (ld)] TJ T* (Next) Tj ET")
    d = pdftext.extract_pdf_text(_pdf_with_content(ops))
    lines = d["text"].splitlines()
    assert lines[0] == "Hello"
    assert lines[1] == "World"
    assert lines[2] == "Next"


def test_hex_strings_and_cid_guard():
    # latin hex shows; Identity-H-looking 2-byte codes are skipped
    ops = b"BT <48656C6C6F> Tj <00480065006C> Tj ET"
    d = pdftext.extract_pdf_text(_pdf_with_content(ops))
    assert "Hello" in d["text"]
    assert "\x00" not in d["text"]
    assert d["skipped_cid"] is True


def test_plain_and_flate_streams_and_boundaries():
    ops = b"BT (plain stream) Tj ET"
    d = pdftext.extract_pdf_text(_pdf_with_content(ops, flate=False))
    assert d["text"] == "plain stream"
    # LZW-filtered stream is skipped, not garbled
    blob = (b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /LZWDecode >>\n"
            b"stream\n\x80\x0b\x60\x50\nendstream\nendobj\n%%EOF\n")
    d = pdftext.extract_pdf_text(blob)
    assert d["text"] == "" and d["n_streams"] == 0
    with pytest.raises(ValueError, match="not a PDF"):
        pdftext.extract_pdf_text(b"plain text file")


def test_fixture_encoder_roundtrip():
    paras = ["First paragraph with (parens) and \\ backslash.",
             "Second paragraph."]
    blob = pdftext.encode_pdf(paras)
    assert blob.startswith(b"%PDF-") and b"%%EOF" in blob
    d = pdftext.extract_pdf_text(blob)
    assert d["text"].splitlines() == paras
    assert d["skipped_cid"] is False


def test_spark_binaryfile_path(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"doc{i}.pdf").write_bytes(
            pdftext.encode_pdf([f"document {i} body text",
                                f"second line {i}"])
        )
    (tmp_path / "junk.pdf").write_bytes(b"not really a pdf")
    binary = spark.read.format("binaryFile").load(str(tmp_path))
    rows = pdftext.pdf_to_documents(binary).collect()
    assert len(rows) == 4  # the junk file dropped, not crashed
    for r in rows:
        assert "body text" in r["text"]
        assert r["n_text_ops"] >= 2 and not r["skipped_cid"]


def test_tounicode_cmap_grammar():
    """Both CMap section grammars: bfchar pairs (incl. multi-unit
    UTF-16BE dst), incrementing bfrange, and array-form bfrange."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0300> <0041>\n"
        b"<0301> <00E90301>\n"  # e-acute + combining acute (2 units)
        b"endbfchar\n"
        b"1 beginbfrange\n<0041> <0043> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<0050> <0052> [<0058> <0059> <005A>]\nendbfrange\n"
        b"endcmap end end"
    )
    m = pdftext.parse_tounicode_cmap(cmap)
    assert m[0x0300] == "A"
    assert m[0x0301] == "é́"
    assert (m[0x41], m[0x42], m[0x43]) == ("a", "b", "c")
    assert (m[0x50], m[0x51], m[0x52]) == ("X", "Y", "Z")


def test_cid_fixture_roundtrip_matches_simple_font():
    """Identity-H text with an embedded ToUnicode CMap extracts to the
    SAME text as the simple-font encoding of the same paragraphs;
    without the CMap the CID guard drops it loudly (flag, no
    mojibake)."""
    paras = [
        "The Quick Brown Fox (CID)",
        "jumps OVER the lazy dog: 42 élèves!",
        "Z",  # single-char paragraph: 2-byte hex, below heuristic size
    ]
    simple = pdftext.extract_pdf_text(pdftext.encode_pdf(paras))
    cid = pdftext.extract_pdf_text(pdftext.encode_pdf_cid(paras))
    assert cid["text"] == simple["text"]
    assert cid["skipped_cid"] is False
    assert cid["n_text_ops"] == simple["n_text_ops"]

    bare = pdftext.extract_pdf_text(
        pdftext.encode_pdf_cid(paras, with_tounicode=False)
    )
    assert bare["skipped_cid"] is True
    assert "\x03" not in bare["text"] and "\x00" not in bare["text"]
    # even the 2-byte single-char CID string stays clean (control-byte
    # heuristic), and no readable mojibake leaks
    assert "Quick" not in bare["text"] and bare["text"] == ""


def test_conflicting_cmaps_stay_loud(tmp_path):
    """Two ToUnicode CMaps that disagree on a code: that code is
    unmapped (needs the object-graph walk) -> skipped_cid, never a
    coin-flip decode."""
    a = pdftext.encode_pdf_cid(["AB"])
    # craft a second PDF whose cmap maps 0x0041 differently, then
    # splice both cmap streams into one file via the fixture encoder's
    # object layout: simplest honest check is at the parser level
    m1 = pdftext.parse_tounicode_cmap(
        b"1 beginbfchar <0041> <0058> endbfchar"
    )
    m2 = pdftext.parse_tounicode_cmap(
        b"1 beginbfchar <0041> <0059> endbfchar"
    )
    assert m1[0x41] == "X" and m2[0x41] == "Y"
    # full-file behavior: _collect_cmaps drops the conflicting code
    import zlib as _z

    def stream_obj(payload: bytes) -> bytes:
        z = _z.compress(payload)
        return (b"<< /Length " + str(len(z)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + z
                + b"\nendstream\n")

    doc = (b"%PDF-1.4\n1 0 obj\n"
           + stream_obj(b"1 beginbfchar <0041> <0058> endbfchar")
           + b"endobj\n2 0 obj\n"
           + stream_obj(b"1 beginbfchar <0041> <0059> endbfchar")
           + b"endobj\n3 0 obj\n"
           + stream_obj(b"BT <00410041> Tj ET")
           + b"endobj\n")
    d = pdftext.extract_pdf_text(doc)
    assert d["skipped_cid"] is True
    assert d["text"] == ""
    assert pdftext._collect_cmaps(a)  # sanity: fixture cmap parses


def test_registered_query_cid_docs_decode(spark, sf_dir):
    """s_pdf_ingest writes every 5th doc as Identity-H + ToUnicode:
    those rows must decode (skipped_cid False, same text length as the
    corpus would give) — a CMap regression would zero them out."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["s_pdf_ingest"](spark, sf_dir).collect()
    assert len(rows) > 0
    cid_rows = [r for r in rows if r["doc_id"] % 5 == 0]
    assert cid_rows, "fixture should include CID-encoded documents"
    for r in cid_rows:
        assert r["skipped_cid"] is False
        assert r["n_text_chars"] > 0
    # text parity with the simple-font encoding of the same doc
    by_id = {r["doc_id"]: r for r in rows}
    for r in cid_rows[:5]:
        sib = by_id.get(r["doc_id"] + 1) or by_id.get(r["doc_id"] - 1)
        assert r["n_streams"] == 1  # the CMap stream is not a text stream
        if sib is not None:
            assert r["n_streams"] == sib["n_streams"]
