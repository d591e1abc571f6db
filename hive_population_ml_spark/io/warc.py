"""WARC (ISO 28500) ingestion — the CommonCrawl-shaped source path.

A 100 TB text corpus usually ENTERS the pipeline as WARC: gzip members
(one per record, the CommonCrawl convention — the file is a valid
multi-member gzip stream AND each record is independently seekable),
each holding a WARC header block + payload; response records carry a
full HTTP response whose body is the HTML.

Everything here is stdlib-only and runs inside Arrow ``mapInPandas``
batches over ``spark.read.format("binaryFile")`` rows — one task per
WARC file (CommonCrawl shards ~1 GB, the natural split unit). For
finer-than-file splits, ``build_member_index`` emits the (offset,
length) sidecar of independently decodable gzip members and
``warc_to_documents_indexed`` turns index rows into ranged reads —
many tasks per shard. No shuffle either way: ingestion is a pure map
from bytes to document rows.

Components:
  - ``iter_warc_records`` — record-grammar parser (version line,
    header fields incl. folded continuations, Content-Length-framed
    payload, CRLF CRLF record separators), transparent multi-member
    gzip.
  - ``split_http_response`` — status line / headers / body framing,
    charset from Content-Type.
  - ``html_to_text`` — REAL ``html.parser`` extraction (not regex):
    script/style/noscript dropped, block elements emit newlines,
    entities resolved by the stdlib parser, whitespace collapsed.
  - ``encode_warc`` — fixture-grade writer (round-trip tests + the
    registered query synthesize corpora without external tools).
  - ``warc_to_documents`` — the Spark plumbing: binaryFile rows ->
    (url, warc_date, http_status, content_type, text) rows.

Reference parity: the reference reads CSVs of pre-extracted features
(loader.py); WARC ingestion is the §2.10 training-data extension tier
(SURVEY.md) generalizing "source formats" to the web-corpus shape.
"""

from __future__ import annotations

import gzip
import io as _io
import zlib
from collections.abc import Iterator
from html.parser import HTMLParser

_CRLF = b"\r\n"

_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "section", "article", "header", "footer",
    "blockquote", "pre",
}
_DROP_TAGS = {"script", "style", "noscript", "template"}


def _maybe_decompress(data: bytes) -> bytes:
    """Transparent multi-member gzip: CommonCrawl .warc.gz files are a
    concatenation of one gzip member per record; stdlib gzip reads the
    whole multi-member stream."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record. Headers keys are
    lower-cased; the version line is checked (WARC/0.x-1.x); folded
    continuation lines (ISO 28500 grammar) are unfolded; payload length
    comes from Content-Length (mandatory). Repeated header fields
    (legal per ISO 28500, e.g. multiple WARC-Concurrent-To) collapse
    LAST-WINS — fine for the fields read here (content-length,
    warc-type, warc-target-uri are single-valued); a consumer of
    multi-valued fields must split records upstream."""
    data = _maybe_decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF runs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        end = data.find(_CRLF + _CRLF, pos)
        if end < 0:
            raise ValueError("WARC header block not terminated")
        block = data[pos:end].decode("utf-8", "replace")
        lines = block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers: dict[str, str] = {"__version__": lines[0].strip()}
        last_key = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t") and last_key:  # folded continuation
                headers[last_key] += " " + line.strip()
                continue
            if ":" not in line:
                raise ValueError(f"bad WARC header line: {line!r}")
            k, v = line.split(":", 1)
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length")
        body_start = end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:
            raise ValueError("WARC payload truncated")
        yield headers, payload
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 chunked transfer decoding: hex size line (extensions
    after ';' ignored), chunk bytes, CRLF, until the 0-size chunk;
    trailer fields ignored. Truncation is loud — a silent partial body
    would flow into text extraction as a truncated document."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body missing a chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"bad chunk-size line: {size_tok!r}")
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) ignored
        if pos + size > len(body):
            raise ValueError("chunked body truncated mid-chunk")
        out += body[pos : pos + size]
        pos += size + 2  # chunk data + its trailing CRLF


def split_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """HTTP response payload -> (status_code, headers, body). Handles
    the identity framing WARC stores (the response bytes as captured;
    Content-Length of the RECORD already frames them, so the body is
    simply everything past the header block). Chunked Transfer-Encoding
    (the outer layer — real CommonCrawl captures carry it) is decoded
    first, then gzip/deflate Content-Encoding is decompressed."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("HTTP response header block not terminated")
    head = payload[:sep].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line: {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = payload[sep + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if enc == "gzip":
        body = gzip.decompress(body)
    elif enc == "deflate":
        body = zlib.decompress(body, -zlib.MAX_WBITS)
    return status, headers, body


def _charset_of(content_type: str) -> str:
    for part in content_type.split(";"):
        part = part.strip()
        if part.lower().startswith("charset="):
            return part.split("=", 1)[1].strip("\"' ") or "utf-8"
    return "utf-8"


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        elif tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS and self._drop_depth:
            self._drop_depth -= 1
        elif tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_data(self, data):
        if not self._drop_depth:
            self.chunks.append(data)


def html_to_text(html: str) -> str:
    """Visible text via the stdlib HTML parser: script/style dropped,
    block tags become line breaks, whitespace collapsed per line,
    blank lines dropped (whitespace-only lines carry no visible text —
    whether they come from block-tag breaks or literal newline runs in
    the source, which HTML renders as collapsed whitespace anyway)."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    raw = "".join(p.chunks)
    lines = (" ".join(ln.split()) for ln in raw.splitlines())
    return "\n".join(ln for ln in lines if ln)


# Chrome containers whose text is boilerplate by position, regardless
# of content (the trafilatura/JusText structural prior).
_CHROME_TAGS = {"nav", "header", "footer", "aside", "form"}


class _BlockExtractor(HTMLParser):
    """Segment the document into blocks, tracking per block: text,
    anchor-text chars (link density numerator), and whether the block
    sits inside a chrome container."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._cur: list[str] = []
        self._anchor = 0
        self._a_depth = 0
        self._drop_depth = 0
        self._chrome_depth = 0

    def _flush(self):
        text = " ".join("".join(self._cur).split())
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "anchor": self._anchor,
                    "chrome": self._chrome_depth > 0,
                }
            )
        self._cur, self._anchor = [], 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        elif tag in _CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS and self._drop_depth:
            self._drop_depth -= 1
        elif tag in _CHROME_TAGS:
            self._flush()
            if self._chrome_depth:
                self._chrome_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._cur.append(data)
        if self._a_depth:
            self._anchor += len("".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def html_main_content(
    html: str,
    min_chars: int = 25,
    max_link_density: float = 0.35,
) -> str:
    """Boilerplate-removed main content (JusText-lite, stdlib-only).

    Three structural signals real extraction pipelines use:
    (1) chrome containers (nav/header/footer/aside/form) are dropped
    outright; (2) a block is GOOD when it carries >= ``min_chars``
    visible chars with link density (anchor chars / chars) <=
    ``max_link_density`` — link farms and "related articles" lists
    fail this even when long; (3) the JusText neighborhood pass:
    SHORT low-link-density blocks (headings, single-sentence paras)
    are kept only when adjacent to a good block, so isolated
    taglines/copyright lines drop while section headings inside the
    article body survive. Returns good blocks joined by newlines."""
    p = _BlockExtractor()
    p.feed(html)
    p.close()
    blocks = [b for b in p.blocks if not b["chrome"]]
    cls: list[str] = []
    for b in blocks:
        n = len("".join(b["text"].split()))
        ld = b["anchor"] / n if n else 1.0
        if ld > max_link_density:
            cls.append("bad")
        elif n >= min_chars:
            cls.append("good")
        else:
            cls.append("short")
    keep = list(cls)
    for i, c in enumerate(cls):
        if c == "short":
            prev_good = i > 0 and cls[i - 1] == "good"
            next_good = i + 1 < len(cls) and cls[i + 1] == "good"
            keep[i] = "good" if (prev_good or next_good) else "bad"
    return "\n".join(
        b["text"] for b, k in zip(blocks, keep) if k == "good"
    ).strip()


def encode_warc(
    records: list[dict],
    gzip_members: bool = True,
) -> bytes:
    """Fixture-grade WARC writer. Each record dict: {type, uri, date,
    record_id, html (or payload bytes), status, content_type,
    chunked}. ``chunked=True`` frames the HTTP body with chunked
    Transfer-Encoding (as real captures often are).
    ``gzip_members=True`` emits the CommonCrawl one-member-per-record
    layout."""
    out = bytearray()
    for i, r in enumerate(records):
        if "payload" in r:
            payload = r["payload"]
        else:
            body = r["html"].encode("utf-8")
            if r.get("chunked"):
                framing = "Transfer-Encoding: chunked\r\n"
                chunks = bytearray()
                for j in range(0, len(body), 37):  # odd size: multi-chunk
                    part = body[j : j + 37]
                    chunks += f"{len(part):x}\r\n".encode() + part + _CRLF
                chunks += b"0\r\n\r\n"
                body = bytes(chunks)
            else:
                framing = f"Content-Length: {len(body)}\r\n"
            http = (
                f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
                f"Content-Type: {r.get('content_type', 'text/html; charset=utf-8')}\r\n"
                + framing + "\r\n"
            ).encode("latin-1") + body
            payload = http
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('type', 'response')}\r\n"
            f"WARC-Record-ID: <urn:uuid:{r.get('record_id', f'rec-{i}')}>\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r.get('uri', f'http://example.com/{i}')}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        rec = head + payload + _CRLF + _CRLF
        out += gzip.compress(rec) if gzip_members else rec
    return bytes(out)


WARC_DOC_SCHEMA = (
    "path string, url string, warc_date string, http_status int, "
    "content_type string, text string, n_bytes int"
)

_DOC_COLS = (
    "path", "url", "warc_date", "http_status", "content_type", "text",
    "n_bytes",
)


def _extract_into(rows: dict, path: str, content: bytes,
                  min_text_chars: int, main_content: bool = False) -> None:
    """Walk one WARC blob's records into the shared column buffers:
    keep type=response with an HTML content type and HTTP 200, extract
    visible text, drop the rest (the standard CommonCrawl first pass)."""
    extract = html_main_content if main_content else html_to_text
    for headers, payload in iter_warc_records(content):
        if headers.get("warc-type") != "response":
            continue
        try:
            status, hh, body = split_http_response(payload)
        except ValueError:
            continue
        ctype = hh.get("content-type", "")
        if status != 200 or "html" not in ctype.lower():
            continue
        text = extract(body.decode(_charset_of(ctype), "replace"))
        if len(text) < min_text_chars:
            continue
        rows["path"].append(path)
        rows["url"].append(headers.get("warc-target-uri", ""))
        rows["warc_date"].append(headers.get("warc-date", ""))
        rows["http_status"].append(status)
        rows["content_type"].append(ctype)
        rows["text"].append(text)
        rows["n_bytes"].append(len(body))


def warc_to_documents(binary_df, min_text_chars: int = 1,
                      main_content: bool = False):
    """binaryFile rows (path, content) -> extracted document rows.

    Pure map (mapInPandas, zero shuffle). At 100 TB this is one task
    per shard file; for finer-than-file parallelism use
    ``build_member_index`` + ``warc_to_documents_indexed``.
    ``main_content=True`` swaps the raw visible-text extractor for the
    JusText-lite boilerplate remover (``html_main_content``) — the
    quality pass a training corpus actually ingests. Everything
    downstream (dedup, quality, language) reads the resulting
    documents table."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in _DOC_COLS}
            for path, content in zip(pdf["path"], pdf["content"]):
                _extract_into(rows, path, bytes(content), min_text_chars,
                              main_content)
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(run, schema=WARC_DOC_SCHEMA)


def build_member_index(data: bytes, chunk: int = 1 << 20) -> list[dict]:
    """(offset, length) of every gzip member in a multi-member .warc.gz
    — the sidecar that lets ONE ~1 GB CommonCrawl shard split into many
    tasks (CommonCrawl publishes the same thing as cdx index offsets).
    Built once at ingest time by streaming each member through a raw
    inflater in bounded chunks (O(file) total, O(chunk) memory)."""
    if data[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip stream")
    out: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        fed = pos
        while not d.eof:
            if fed >= n:
                raise ValueError("truncated gzip member at end of file")
            d.decompress(data[fed : fed + chunk])
            fed = min(fed + chunk, n)
        end = fed - len(d.unused_data)
        out.append({"offset": pos, "length": end - pos})
        pos = end
    return out


def warc_to_documents_indexed(index_df, n_tasks: int | None = None,
                              min_text_chars: int = 1):
    """Member-index read path: rows of (path, offset, length) — each an
    independently decodable gzip member range from
    ``build_member_index`` — become ranged reads, so one shard fans
    out to many tasks instead of binaryFile's one-task-per-file.

    Still a pure map (mapInPandas, zero shuffle); the repartition of
    the tiny index table is the only exchange and it carries index
    rows, not payload bytes. The ranged read here is a local
    seek+read; on an object store it is the same byte-range GET."""
    import pandas as pd

    if n_tasks:
        index_df = index_df.repartition(n_tasks)

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in _DOC_COLS}
            for path, off, length in zip(
                pdf["path"], pdf["offset"], pdf["length"]
            ):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    blob = fh.read(int(length))
                _extract_into(rows, path, blob, min_text_chars)
            yield pd.DataFrame(rows)

    return index_df.mapInPandas(run, schema=WARC_DOC_SCHEMA)
