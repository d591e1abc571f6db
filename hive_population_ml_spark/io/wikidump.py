"""Wikipedia multistream dump ingestion — the encyclopedia-corpus
entry point (third of the ingestion tiers: WARC = web crawl, PDF =
books/papers, this = the `*-pages-articles-multistream.xml.bz2` dumps
every LLM data pipeline starts its curated slice from).

The published multistream layout (MediaWiki dumps documentation):
the file is a CONCATENATION of independent bz2 streams — one header
stream (``<mediawiki>`` + ``<siteinfo>``), then one stream per ~100
``<page>`` elements, then one closing stream (``</mediawiki>``). The
companion ``-index.txt.bz2`` lists ``offset:page_id:title`` so a
reader can seek straight to a stream — the same finer-than-file split
lever as WARC's gzip member index, and it feeds the same Spark
posture here: ``build_stream_index`` (or the published index) ->
(path, offset, length) rows -> ``wiki_to_documents_indexed`` ranged
reads, many tasks per shard. Whole-file ``binaryFile`` ingestion is
``wiki_to_documents``. Both are pure maps (Arrow ``mapInPandas``,
zero shuffle).

Wikitext -> text is a BOUNDED, honest cleaner (the standard first-pass
corpus behavior, WikiExtractor-shaped, stdlib only):
  - ``<!-- -->`` comments, ``{{...}}`` templates and ``{| ... |}``
    tables removed with full nesting,
  - ``[[File:...]]``/``[[Category:...]]`` removed (nested brackets
    honored), ``[[target|label]]`` -> label, ``[[target]]`` -> target,
  - ``[url label]`` -> label, bare ``[url]`` dropped,
  - ``<ref>...</ref>`` (and self-closing) dropped, other tags
    stripped, entities resolved,
  - ``== headings ==`` and list/indent markers normalized to plain
    lines; bold/italic quote runs stripped.
DOCUMENTED boundaries: redirects and non-article namespaces are
skipped (flagged in counts, never emitted); template TRANSCLUSION is
not evaluated (the template invocation is removed — first-pass corpus
semantics; expanding templates needs the full template database).

Reference parity: the reference ingests CSV sensor exports
(loader.py); this is the §2.10 training-data extension tier
(SURVEY.md) generalizing source formats to the encyclopedia shape.
"""

from __future__ import annotations

import bz2
import html as _html
import re
import xml.etree.ElementTree as ET

WIKI_NS = "{http://www.mediawiki.org/xml/export-0.10/}"


# ---------------------------------------------------------------- bz2 layout

def iter_bz2_streams(data: bytes, chunk: int = 1 << 20):
    """Yield (offset, length, payload) per bz2 stream in a multistream
    file — the same bounded-chunk walk as WARC's gzip member index."""
    if data[:3] != b"BZh":
        raise ValueError("not a bz2 stream")
    pos, n = 0, len(data)
    while pos < n:
        d = bz2.BZ2Decompressor()
        fed = pos
        out = bytearray()
        while not d.eof:
            if fed >= n:
                raise ValueError("truncated bz2 stream at end of file")
            out += d.decompress(data[fed : fed + chunk])
            fed = min(fed + chunk, n)
        end = fed - len(d.unused_data)
        yield pos, end - pos, bytes(out)
        pos = end


def build_stream_index(data: bytes) -> list[dict]:
    """(offset, length) per bz2 stream — equivalent to what the dump's
    published ``-index.txt.bz2`` provides (offsets), built locally when
    only the dump itself is at hand."""
    return [
        {"offset": off, "length": ln}
        for off, ln, _payload in iter_bz2_streams(data)
    ]


# ------------------------------------------------------------- page parsing

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_pages(xml_fragment: bytes) -> list[dict]:
    """Parse the ``<page>`` elements of one multistream payload (a
    fragment WITHOUT the enclosing ``<mediawiki>``) -> [{page_id,
    title, ns, redirect, wikitext}]. Header/closing streams (siteinfo
    only, no pages) simply return []."""
    frag = xml_fragment.strip()
    if not frag:
        return []
    # a fragment has no single root; wrap it. The header stream opens
    # <mediawiki> without closing it — drop the dangling open/close
    # tags so the wrapper always balances.
    txt = frag.decode("utf-8", "replace")
    txt = re.sub(r"<mediawiki\b[^>]*>|</mediawiki>", "", txt)
    try:
        root = ET.fromstring(f"<streams>{txt}</streams>")
    except ET.ParseError as e:
        raise ValueError(f"bad multistream XML fragment: {e}") from e
    pages: list[dict] = []
    for page in root.iter():
        if _local(page.tag) != "page":
            continue
        rec = {"page_id": None, "title": "", "ns": 0,
               "redirect": False, "wikitext": ""}
        for child in page:
            name = _local(child.tag)
            if name == "title":
                rec["title"] = child.text or ""
            elif name == "ns":
                rec["ns"] = int(child.text or 0)
            elif name == "id" and rec["page_id"] is None:
                rec["page_id"] = int(child.text or 0)
            elif name == "redirect":
                rec["redirect"] = True
            elif name == "revision":
                for sub in child:
                    if _local(sub.tag) == "text":
                        rec["wikitext"] = sub.text or ""
        pages.append(rec)
    return pages


# ---------------------------------------------------------- wikitext -> text

def _strip_nested(s: str, open_tok: str, close_tok: str) -> str:
    """Remove every (possibly nested) ``open_tok ... close_tok`` span
    with one linear stack scan."""
    out: list[str] = []
    depth = 0
    i, n = 0, len(s)
    lo, lc = len(open_tok), len(close_tok)
    while i < n:
        if s.startswith(open_tok, i):
            depth += 1
            i += lo
        elif depth and s.startswith(close_tok, i):
            depth -= 1
            i += lc
        elif depth:
            i += 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_LINK_RE = re.compile(r"\[\[([^\[\]|]*)(?:\|([^\[\]]*))?\]\]")
_EXTLINK_RE = re.compile(r"\[(?:https?|ftp)://\S*?(?:\s+([^\]]*))?\]")
_REF_RE = re.compile(r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>", re.S | re.I)
_TAG_RE = re.compile(r"</?[A-Za-z][^>]*>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_HEADING_RE = re.compile(r"^=+\s*(.*?)\s*=+\s*$", re.M)
_LISTMARK_RE = re.compile(r"^[*#:;]+\s*", re.M)
_QUOTES_RE = re.compile(r"'{2,}")
# media/meta links may nest brackets ([[File:x|thumb|[[link]] cap]])
_MEDIA_PREFIX_RE = re.compile(
    r"\[\[\s*(?:File|Image|Category)\s*:", re.I
)


def _strip_media_links(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        m = _MEDIA_PREFIX_RE.match(s, i)
        if m:
            depth = 1
            j = m.end()
            while j < n and depth:
                if s.startswith("[[", j):
                    depth += 1
                    j += 2
                elif s.startswith("]]", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            i = j
            continue
        out.append(s[i])
        i += 1
    return "".join(out)


def wikitext_to_text(src: str) -> str:
    """Bounded wikitext cleaner (module docstring lists the grammar).
    Output: plain paragraphs, one heading or paragraph per line,
    whitespace collapsed per line, blank runs squeezed."""
    s = _COMMENT_RE.sub("", src)
    s = _REF_RE.sub("", s)
    s = _strip_nested(s, "{{", "}}")
    s = _strip_nested(s, "{|", "|}")
    s = _strip_media_links(s)
    s = _LINK_RE.sub(lambda m: m.group(2) or m.group(1), s)
    s = _EXTLINK_RE.sub(lambda m: m.group(1) or "", s)
    s = _HEADING_RE.sub(r"\1", s)
    s = _LISTMARK_RE.sub("", s)
    s = _QUOTES_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    lines = [" ".join(ln.split()) for ln in s.splitlines()]
    out: list[str] = []
    for ln in lines:
        if ln:
            out.append(ln)
        elif out and out[-1] != "":
            out.append("")
    return "\n".join(out).strip()


# ------------------------------------------------------------ fixture writer

def encode_wikidump(
    pages: list[dict], pages_per_stream: int = 2
) -> tuple[bytes, list[str]]:
    """Fixture-grade multistream dump writer. Each page dict: {title,
    page_id, wikitext, ns, redirect}. Returns (file bytes, index
    lines) in the published layout: header stream (<mediawiki> +
    <siteinfo>), page streams of ``pages_per_stream``, closing stream;
    index lines are ``offset:page_id:title`` like the companion
    ``-index.txt``."""
    header = (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/" '
        'version="0.10" xml:lang="en">\n'
        "  <siteinfo><sitename>Fixture</sitename></siteinfo>\n"
    ).encode("utf-8")

    def page_xml(p: dict) -> bytes:
        redir = "    <redirect/>\n" if p.get("redirect") else ""
        wt = _html.escape(p.get("wikitext", ""), quote=False)
        return (
            "  <page>\n"
            f"    <title>{_html.escape(p['title'], quote=False)}</title>\n"
            f"    <ns>{p.get('ns', 0)}</ns>\n"
            f"    <id>{p['page_id']}</id>\n"
            f"{redir}"
            "    <revision>\n"
            f"      <id>{p['page_id'] * 10}</id>\n"
            f'      <text bytes="{len(wt)}">{wt}</text>\n'
            "    </revision>\n"
            "  </page>\n"
        ).encode("utf-8")

    out = bytearray(bz2.compress(header))
    index: list[str] = []
    for i in range(0, len(pages), pages_per_stream):
        group = pages[i : i + pages_per_stream]
        offset = len(out)
        for p in group:
            index.append(f"{offset}:{p['page_id']}:{p['title']}")
        out += bz2.compress(b"".join(page_xml(p) for p in group))
    out += bz2.compress(b"</mediawiki>\n")
    return bytes(out), index


# --------------------------------------------------------------- Spark paths

WIKI_DOC_SCHEMA = (
    "path string, page_id long, title string, text string, "
    "n_wikitext_chars int, n_text_chars int"
)


def _extract_pages_into(rows: dict, path: str, payload: bytes) -> None:
    for rec in parse_pages(payload):
        if rec["redirect"] or rec["ns"] != 0 or rec["page_id"] is None:
            continue  # the standard article-only first pass
        text = wikitext_to_text(rec["wikitext"])
        rows["path"].append(path)
        rows["page_id"].append(rec["page_id"])
        rows["title"].append(rec["title"])
        rows["text"].append(text)
        rows["n_wikitext_chars"].append(len(rec["wikitext"]))
        rows["n_text_chars"].append(len(text))


_WIKI_COLS = (
    "path", "page_id", "title", "text", "n_wikitext_chars", "n_text_chars",
)


def wiki_to_documents(binary_df):
    """binaryFile rows (path, content) of whole multistream dumps ->
    article rows. Pure map (mapInPandas, zero shuffle) — one task per
    dump file; use the indexed path below for many tasks per dump."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in _WIKI_COLS}
            for path, content in zip(pdf["path"], pdf["content"]):
                for _off, _ln, payload in iter_bz2_streams(bytes(content)):
                    _extract_pages_into(rows, path, payload)
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(run, schema=WIKI_DOC_SCHEMA)


def wiki_to_documents_indexed(index_df, n_tasks: int | None = None):
    """Multistream-index read path: rows of (path, offset, length) —
    each an independently decodable bz2 stream from
    ``build_stream_index`` or the dump's published index — become
    ranged reads (local seek here, byte-range GET on an object store).
    Same zero-shuffle posture as ``warc_to_documents_indexed``."""
    import pandas as pd

    if n_tasks:
        index_df = index_df.repartition(n_tasks)

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in _WIKI_COLS}
            for path, off, length in zip(
                pdf["path"], pdf["offset"], pdf["length"]
            ):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    blob = fh.read(int(length))
                payload = bz2.decompress(blob)
                _extract_pages_into(rows, path, payload)
            yield pd.DataFrame(rows)

    return index_df.mapInPandas(run, schema=WIKI_DOC_SCHEMA)
