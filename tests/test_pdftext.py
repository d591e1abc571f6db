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
