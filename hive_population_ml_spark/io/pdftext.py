"""PDF text extraction — the books/papers corpus entry point.

Bounded, honest subset of ISO 32000 (the public PDF spec), stdlib
only, mirroring io/warc.py's posture: REAL parsing for the dominant
simple case, loud boundaries elsewhere.

Executable here:
  - content streams stored uncompressed or FlateDecode (zlib) — found
    by scanning ``stream``/``endstream`` object framing (no xref walk
    needed for extraction: every page content stream IS a stream
    object; non-content streams are filtered by operator sniffing),
  - text operators inside BT/ET blocks: ``Tj``, ``'``, ``"`` (show
    string), ``TJ`` (array show with kerning numbers), with literal
    ``(...)`` strings — nested parens, ``\\`` escapes, octal codes —
    and hex ``<...>`` strings,
  - line structure from ``Td``/``TD``/``T*``/``'``/``"`` line moves.

  - composite fonts (Identity-H) WITH an embedded ToUnicode CMap:
    the CMap stream's bfchar/bfrange sections (ISO 32000 §9.10.3 /
    Adobe CMap grammar) are parsed and 2-byte CID hex strings decode
    through the merged per-file map — the dominant real-world case
    for books/papers PDFs, whose text would otherwise drop wholesale.

DOCUMENTED boundaries (raise or skip, never silently garble):
  - CID hex strings whose codes are NOT covered by any ToUnicode CMap
    in the file (no CMap embedded, or a code falls outside it) are
    skipped with the ``skipped_cid`` flag rather than emitted as
    mojibake; when two CMaps in one file disagree on a code, that
    code is treated as unmapped (per-font resolution needs the object
    graph walk this bounded extractor deliberately omits). CID
    literal strings (rare; most writers emit hex) are likewise
    heuristic-only,
  - LZW/DCT/encrypted streams are skipped (flate-or-plain only),
  - no layout reconstruction: reading order is content-stream order
    (the standard first-pass corpus behavior).

``encode_pdf`` writes fixture documents (valid single-xref PDFs with
FlateDecode content streams) so tests and the registered query
round-trip without external tools.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s\d]*R\b)")


def _iter_streams(data: bytes):
    """Yield decoded stream payloads (flate or plain) with their
    preceding dictionary bytes for filter sniffing."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            break
        # dictionary = bytes between the previous 'obj' (or <<) and
        # 'stream'; a lightweight slice is enough for filter sniffing
        dict_start = data.rfind(b"<<", 0, m.start())
        d = data[dict_start : m.start()] if dict_start >= 0 else b""
        # Prefer the dict's direct /Length: the EOL-before-endstream
        # trim below cannot tell the writer's EOL apart from payload
        # bytes that HAPPEN to end in 0x0D — a flate stream whose last
        # data byte is \r reads as a \r\n EOL and loses a byte (found
        # by the literal-roundtrip property test). Indirect lengths
        # ("/Length 4 0 R") don't match and fall through.
        raw = None
        lm = _LENGTH_RE.search(d)
        if lm:
            n = int(lm.group(1))
            e2 = data.find(b"endstream", start + n)
            # sanity: the declared length must land on endstream up to
            # one EOL marker, else the dict lied — use the heuristic
            if e2 >= 0 and data[start + n : e2] in (b"", b"\n", b"\r", b"\r\n"):
                raw = data[start : start + n]
                end = e2
        if raw is None:
            raw = data[start:end]
            # spec: EOL before endstream is not part of the data
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n"):
                raw = raw[:-1]
        if b"/FlateDecode" in d:
            try:
                yield d, zlib.decompress(raw)
            except zlib.error:
                pass  # corrupt/encrypted: skip, never garble
        elif b"/Filter" not in d:
            yield d, raw
        # other filters (LZW/DCT/...): documented skip
        pos = end + 9


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"     # literal string (one nesting level
    rb"|<[0-9A-Fa-f\s]*>"        # handled in the parser below)
    rb"|\[|\]"
    rb"|/[^\s\[\]()<>/]*"
    rb"|[-+.0-9]+"
    rb"|[A-Za-z'\"*]+"
)


def _unescape_literal(body: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            nxt = body[i + 1]
            esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                   0x28: 40, 0x29: 41, 0x5C: 92}
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                code = 0
                while j < len(body) and j <= i + 3 and 0x30 <= body[j] <= 0x37:
                    code = code * 8 + (body[j] - 0x30)
                    j += 1
                out.append(code & 0xFF)
                i = j
                continue
            i += 2  # line continuation / unknown escape: drop
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


def _read_literal(data: bytes, start: int) -> tuple[str, int]:
    """Parse a (...) literal with FULL paren nesting (the regex above
    only matches unnested forms; the parser rescans from the byte)."""
    assert data[start] == 0x28
    depth = 0
    i = start
    body = bytearray()
    while i < len(data):
        c = data[i]
        if c == 0x5C and i + 1 < len(data):
            body += data[i : i + 2]
            i += 2
            continue
        if c == 0x28:
            depth += 1
            if depth > 1:
                body.append(c)
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return _unescape_literal(bytes(body)), i + 1
            body.append(c)
        else:
            body.append(c)
        i += 1
    raise ValueError("unterminated PDF literal string")


def _hex_string(tok: bytes) -> tuple[bytes, bool]:
    """Hex string -> (raw bytes, looks_like_cid). Even-length runs
    whose high bytes are mostly < 0x20 are 2-byte CID codes
    (Identity-H) — not latin text; the caller decodes through the
    file's ToUnicode CMap or flags instead of emitting mojibake."""
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"
    raw = bytes.fromhex(h.decode("ascii"))
    is_cid = False
    if len(raw) == 2:
        # a single 2-byte code: a leading control byte is never latin
        # text, so it can only be a CID
        is_cid = raw[0] < 0x20
    elif len(raw) >= 4 and len(raw) % 2 == 0:
        highs = raw[0::2]
        if sum(1 for b in highs if b < 0x20) >= max(2, len(highs) - 1):
            is_cid = True
    return raw, is_cid


_HEXSTR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_BF_SECTION_RE = re.compile(
    rb"beginbf(char|range)(.*?)endbf\1", re.S
)


def _utf16be(hexs: bytes) -> str:
    raw = bytes.fromhex(hexs.decode("ascii"))
    return raw.decode("utf-16-be", "replace")


def parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    """ToUnicode CMap stream -> {source code -> unicode string}.

    Covers the grammar real writers emit (ISO 32000 §9.10.3): bfchar
    sections (``<src> <dst>`` pairs, dst UTF-16BE, possibly multiple
    code units for ligatures/combining marks) and bfrange sections in
    both forms — ``<lo> <hi> <dstStart>`` (incrementing last byte) and
    ``<lo> <hi> [<d0> <d1> ...]`` (explicit array). Codespace width is
    implied by the hex token lengths (Identity-H is 2-byte)."""
    out: dict[int, str] = {}
    for kind, body in _BF_SECTION_RE.findall(data):
        if kind == b"char":
            toks = _HEXSTR_RE.findall(body)
            for src, dst in zip(toks[0::2], toks[1::2]):
                code = int(re.sub(rb"\s", b"", src), 16)
                out[code] = _utf16be(re.sub(rb"\s", b"", dst))
            continue
        # bfrange: walk item by item because the dst may be an array
        pos = 0
        while True:
            m_lo = _HEXSTR_RE.search(body, pos)
            if not m_lo:
                break
            m_hi = _HEXSTR_RE.search(body, m_lo.end())
            if not m_hi:
                break
            lo = int(re.sub(rb"\s", b"", m_lo.group(1)), 16)
            hi = int(re.sub(rb"\s", b"", m_hi.group(1)), 16)
            nxt = re.match(rb"\s*\[", body[m_hi.end():])
            if nxt:  # array form: one dst hex per code
                close = body.find(b"]", m_hi.end())
                if close < 0:
                    raise ValueError("unterminated bfrange array")
                dsts = _HEXSTR_RE.findall(body[m_hi.end():close])
                for k, d in enumerate(dsts):
                    if lo + k > hi:
                        break
                    out[lo + k] = _utf16be(re.sub(rb"\s", b"", d))
                pos = close + 1
                continue
            m_dst = _HEXSTR_RE.search(body, m_hi.end())
            if not m_dst:
                break
            dsth = re.sub(rb"\s", b"", m_dst.group(1))
            base_raw = bytes.fromhex(dsth.decode("ascii"))
            base = int.from_bytes(base_raw, "big")
            width = len(base_raw)
            for k in range(hi - lo + 1):
                out[lo + k] = (
                    (base + k).to_bytes(width, "big")
                    .decode("utf-16-be", "replace")
                )
            pos = m_dst.end()
    return out


def _collect_cmaps(data: bytes) -> dict[int, str]:
    """Merge every ToUnicode CMap stream in the file into one code
    map. Conflicting codes across CMaps are DROPPED (decoding them
    correctly needs per-font resolution through the object graph) —
    strings touching them keep the loud ``skipped_cid`` path."""
    merged: dict[int, str] = {}
    conflicts: set[int] = set()
    for _d, content in _iter_streams(data):
        if b"beginbfchar" not in content and b"beginbfrange" not in content:
            continue
        for code, s in parse_tounicode_cmap(content).items():
            if code in merged and merged[code] != s:
                conflicts.add(code)
            else:
                merged[code] = s
    for code in conflicts:
        del merged[code]
    return merged


def extract_pdf_text(data: bytes) -> dict:
    """PDF bytes -> {text, n_streams, n_text_ops, skipped_cid}: every
    BT/ET text-showing operator across all decodable content streams,
    in stream order, with Td/TD/T*/'/" line structure. 2-byte CID hex
    strings decode through the file's merged ToUnicode CMap(s);
    ``skipped_cid`` is True only when CID text was seen that NO CMap
    covers (dropped, never mojibake)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    cmap = _collect_cmaps(data)
    lines: list[str] = []
    cur: list[str] = []
    n_streams = 0
    n_ops = 0
    skipped_cid = False

    def decode_hex(raw: bytes, is_cid: bool) -> str | None:
        """None = undecodable CID (sets the flag at the call site)."""
        if cmap and len(raw) % 2 == 0 and len(raw) > 0:
            codes = [
                int.from_bytes(raw[i : i + 2], "big")
                for i in range(0, len(raw), 2)
            ]
            if all(c in cmap for c in codes):
                return "".join(cmap[c] for c in codes)
        if is_cid:
            return None
        return raw.decode("latin-1")

    def flush():
        if cur:
            lines.append("".join(cur).strip())
            cur.clear()

    for d, content in _iter_streams(data):
        if b"BT" not in content:
            continue  # not a text content stream
        n_streams += 1
        in_text = False
        pending: list[str] = []  # strings since last operator
        i = 0
        while i < len(content):
            if content[i] == 0x28:  # literal string: full nesting parse
                s, i = _read_literal(content, i)
                pending.append(s)
                continue
            m = _TOKEN_RE.match(content, i)
            if not m:
                i += 1
                continue
            tok = m.group(0)
            i = m.end()
            if tok[:1] == b"<":
                raw, is_cid = _hex_string(tok)
                s = decode_hex(raw, is_cid)
                if s is None:
                    skipped_cid = True
                else:
                    pending.append(s)
                continue
            if tok == b"BT":
                in_text = True
                pending.clear()
                continue
            if tok == b"ET":
                in_text = False
                flush()
                continue
            if not in_text:
                pending.clear()
                continue
            if tok in (b"Tj", b"TJ"):
                cur.extend(pending)
                pending.clear()
                n_ops += 1
            elif tok in (b"'", b'"'):
                flush()
                cur.extend(pending)
                pending.clear()
                n_ops += 1
            elif tok in (b"Td", b"TD", b"T*"):
                flush()
                pending.clear()
            elif tok in (b"[", b"]") or re.fullmatch(rb"[-+.0-9]+", tok):
                continue  # TJ kerning numbers / array brackets
            else:
                pending.clear()  # any other operator consumes operands
        flush()
    text = "\n".join(ln for ln in lines if ln)
    return {
        "text": text,
        "n_streams": n_streams,
        "n_text_ops": n_ops,
        "skipped_cid": skipped_cid,
    }


def encode_pdf(paragraphs: list[str]) -> bytes:
    """Fixture-grade single-page PDF: Helvetica simple font, one
    FlateDecode content stream, literal strings with escaping, valid
    xref so external viewers can open fixtures too."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    body_ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for k, p in enumerate(paragraphs):
        if k:
            body_ops.append("0 -14 Td")
        body_ops.append(f"({esc(p)}) Tj")
    body_ops.append("ET")
    content = zlib.compress("\n".join(body_ops).encode("latin-1"))

    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    objs.append(
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream"
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def encode_pdf_cid(
    paragraphs: list[str], with_tounicode: bool = True
) -> bytes:
    """Fixture-grade composite-font PDF: Type0/Identity-H font whose
    text is 2-byte CID hex strings, plus (unless ``with_tounicode``
    is False, the must-skip fixture) a FlateDecode ToUnicode CMap
    exercising BOTH grammars — a bfrange for A-Z and bfchar entries
    for every other character. Extracted text must equal the
    ``encode_pdf`` (simple font) form of the same paragraphs."""
    text_chars = sorted({c for p in paragraphs for c in p if not ("A" <= c <= "Z")})
    if len(text_chars) > 0x6000:
        raise ValueError("fixture encoder supports <= 0x6000 distinct chars")
    code_of = {c: 0x0300 + i for i, c in enumerate(text_chars)}
    code_of.update({chr(o): o for o in range(0x41, 0x5B)})  # A-Z bfrange

    body_ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for k, p in enumerate(paragraphs):
        if k:
            body_ops.append("0 -14 Td")
        hexs = "".join(f"{code_of[c]:04X}" for c in p)
        body_ops.append(f"<{hexs}> Tj")
    body_ops.append("ET")
    content = zlib.compress("\n".join(body_ops).encode("latin-1"))

    bfchars = "\n".join(
        f"<{code_of[c]:04X}> <{c.encode('utf-16-be').hex().upper()}>"
        for c in text_chars
    )
    cmap_src = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "1 beginbfrange\n<0041> <005A> <0041>\nendbfrange\n"
        + (f"{len(text_chars)} beginbfchar\n{bfchars}\nendbfchar\n"
           if text_chars else "")
        + "endcmap\nCMapName currentdict /CMap defineresource pop\n"
        "end\nend"
    )
    cmap = zlib.compress(cmap_src.encode("latin-1"))

    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    objs.append(
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream"
    )
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture-CID "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R]"
        + (b" /ToUnicode 7 0 R" if with_tounicode else b"")
        + b" >>"
    )
    objs.append(font)
    objs.append(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture-CID "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> >>"
    )
    if with_tounicode:
        objs.append(
            b"<< /Length " + str(len(cmap)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + cmap + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


PDF_DOC_SCHEMA = (
    "path string, text string, n_streams int, n_text_ops int, "
    "skipped_cid boolean, n_bytes int"
)


def pdf_to_documents(binary_df):
    """binaryFile rows (path, content) -> extracted text rows — the
    same zero-shuffle mapInPandas posture as warc_to_documents."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "path", "text", "n_streams", "n_text_ops",
                "skipped_cid", "n_bytes",
            )}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    d = extract_pdf_text(bytes(content))
                except ValueError:
                    continue
                rows["path"].append(path)
                rows["text"].append(d["text"])
                rows["n_streams"].append(d["n_streams"])
                rows["n_text_ops"].append(d["n_text_ops"])
                rows["skipped_cid"].append(d["skipped_cid"])
                rows["n_bytes"].append(len(content))
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(run, schema=PDF_DOC_SCHEMA)
