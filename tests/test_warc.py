"""WARC ingestion tests (io/warc.py): ISO 28500 record grammar pinned
with hand-authored bytes (folded headers, multi-record framing,
truncation), CommonCrawl one-gzip-member-per-record layout, HTTP
splitting (content-encoding, charset), stdlib-HTML-parser text
extraction (script/style drop, block breaks, entities), the real
binaryFile -> documents Spark path, and the registered query e2e."""

from __future__ import annotations

import gzip

import pytest

from hive_population_ml_spark.io import warc


def test_record_grammar_hand_authored():
    payload = b"hello payload"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"X-Folded: first\r\n"
        b" continued\r\n"          # ISO 28500 folded continuation
        b"Content-Length: 13\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    [(h, p)] = list(warc.iter_warc_records(rec))
    assert p == payload
    assert h["warc-type"] == "metadata"
    assert h["x-folded"] == "first continued"
    assert h["__version__"] == "WARC/1.0"
    # two records back-to-back, second one gzip-membered with the first
    two = gzip.compress(rec) + gzip.compress(rec)
    assert len(list(warc.iter_warc_records(two))) == 2
    with pytest.raises(ValueError, match="truncated|terminated"):
        list(warc.iter_warc_records(rec[: len(rec) - 20]))
    with pytest.raises(ValueError, match="truncated"):
        # header intact, payload short of Content-Length
        list(warc.iter_warc_records(rec[: len(rec) - 10]))
    with pytest.raises(ValueError, match="version"):
        list(warc.iter_warc_records(b"NOPE/1.0\r\n\r\n\r\n"))


def test_http_split_encoding_and_charset():
    body = "café content".encode("utf-8")
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Encoding: gzip\r\n"
        b"\r\n" + gzip.compress(body)
    )
    status, hh, out = warc.split_http_response(http)
    assert status == 200 and out == body
    assert warc._charset_of(hh["content-type"]) == "UTF-8"
    assert warc._charset_of("text/html") == "utf-8"
    with pytest.raises(ValueError, match="status"):
        warc.split_http_response(b"garbage\r\n\r\nx")


def test_html_to_text_extraction():
    html = (
        "<html><head><title>T</title><style>p{}</style></head><body>"
        "<h1>Head&amp;er</h1><p>one   two</p><script>var x=1;</script>"
        "<div>three</div><noscript>no</noscript></body></html>"
    )
    text = warc.html_to_text(html)
    assert "Head&er" in text
    assert "one two" in text and "three" in text
    assert "var x" not in text and "p{}" not in text and "no" not in \
        text.split()
    # block tags produce line structure
    assert text.splitlines()[0] != text.replace("\n", " ")


def test_roundtrip_encode_decode():
    recs = [
        {"uri": "http://a/1", "html": "<p>alpha beta</p>"},
        {"uri": "http://a/2", "html": "<p>gamma</p>"},
    ]
    for gz in (True, False):
        blob = warc.encode_warc(recs, gzip_members=gz)
        parsed = list(warc.iter_warc_records(blob))
        assert len(parsed) == 2
        s, hh, body = warc.split_http_response(parsed[0][1])
        assert s == 200
        assert warc.html_to_text(body.decode()) == "alpha beta"


def test_spark_binaryfile_path(spark, tmp_path):
    recs = [
        {"uri": f"http://x/{i}", "html": f"<p>doc {i} text</p>"}
        for i in range(6)
    ]
    # one real .warc.gz on disk -> the actual production read path
    f = tmp_path / "shard0.warc.gz"
    f.write_bytes(warc.encode_warc(recs))
    # plus a non-HTML and a non-200 record that must be filtered
    extra = [
        {"uri": "http://x/skip1", "html": "ignored",
         "content_type": "application/pdf"},
        {"uri": "http://x/skip2", "html": "ignored", "status": 404},
    ]
    (tmp_path / "shard1.warc.gz").write_bytes(warc.encode_warc(extra))
    binary = spark.read.format("binaryFile").load(str(tmp_path))
    rows = warc.warc_to_documents(binary).collect()
    assert len(rows) == 6
    assert {r["url"] for r in rows} == {f"http://x/{i}" for i in range(6)}
    assert all(r["http_status"] == 200 for r in rows)
    assert all("doc" in r["text"] for r in rows)


def test_registered_query_e2e(spark, sf_dir):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["s_warc_ingest"](spark, sf_dir).collect()
    assert len(rows) > 0
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 200").select("doc_id", "text").collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:10]:
        # script/style chrome never leaks; the doc text round-trips
        # (whitespace-collapsed by extraction)
        assert "leak" not in r["text_head"] and "color:red" not in \
            r["text_head"]
        assert r["n_text_chars"] > 0


def test_chunked_transfer_encoding():
    """RFC 9112 chunked framing: Transfer-Encoding is the OUTER layer
    (dechunk first, then Content-Encoding); chunk extensions and
    trailers are ignored; truncation is loud."""
    body = b"hello world, chunked transfer, " * 8

    def chunkify(raw, sizes):
        out = bytearray()
        pos = 0
        for s in sizes:
            part = raw[pos : pos + s]
            pos += s
            if not part:
                break
            out += f"{len(part):x}".encode() + b";ext=v\r\n" + part + b"\r\n"
        out += b"0\r\nX-Trailer: t\r\n\r\n"
        return bytes(out)

    gz = gzip.compress(body)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n"
        b"\r\n" + chunkify(gz, [5, 7, len(gz)])
    )
    status, hh, out = warc.split_http_response(http)
    assert status == 200 and out == body
    # plain chunked (no content-encoding)
    http2 = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        + chunkify(body, [3, 11, len(body)])
    )
    assert warc.split_http_response(http2)[2] == body
    # size line claims more bytes than remain -> loud
    bad = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"a\r\nxyz"
    )
    with pytest.raises(ValueError, match="chunk"):
        warc.split_http_response(bad)


def test_member_index_and_indexed_read(spark, tmp_path):
    """The .warc.gz member-index sidecar path: offsets/lengths tile the
    file exactly, each member range decodes independently, and the
    indexed Spark reader splits ONE shard into MANY tasks with output
    identical to the whole-file binaryFile path."""
    recs = [
        {"uri": f"http://m/{i}", "html": f"<p>member {i} body text</p>"}
        for i in range(12)
    ]
    blob = warc.encode_warc(recs)  # 12 one-record gzip members
    f = tmp_path / "big.warc.gz"
    f.write_bytes(blob)
    idx = warc.build_member_index(blob)
    assert len(idx) == 12
    assert idx[0]["offset"] == 0
    assert sum(e["length"] for e in idx) == len(blob)
    for e in idx[:3]:
        sl = blob[e["offset"] : e["offset"] + e["length"]]
        assert len(list(warc.iter_warc_records(sl))) == 1
    with pytest.raises(ValueError, match="gzip"):
        warc.build_member_index(b"not a gzip stream")
    with pytest.raises(ValueError, match="truncated"):
        warc.build_member_index(blob[:-8])

    full = warc.warc_to_documents(
        spark.read.format("binaryFile").load(str(f))
    ).collect()
    idx_df = spark.createDataFrame(
        [(str(f), e["offset"], e["length"]) for e in idx],
        "path string, offset long, length long",
    )
    out = warc.warc_to_documents_indexed(idx_df, n_tasks=4)
    assert out.rdd.getNumPartitions() == 4  # >1 task per shard
    rows = out.collect()
    assert sorted(r["url"] for r in rows) == sorted(
        r["url"] for r in full
    )
    assert sorted(r["text"] for r in rows) == sorted(
        r["text"] for r in full
    )


def test_html_main_content_boilerplate_removal():
    from hive_population_ml_spark.io.warc import html_main_content

    html = (
        "<html><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>News</a> long navigation "
        "menu with many words that would otherwise pass the length "
        "gate</nav>"
        "<header>Site Title</header>"
        "<h2>Article heading</h2>"
        "<p>This is the actual article body with enough characters to "
        "be classified as a good block on its own merits.</p>"
        "<p>Second real paragraph, also long enough to be kept as good "
        "content by the classifier.</p>"
        "<div><a href='/x'>related one</a> <a href='/y'>related two</a> "
        "<a href='/z'>related three</a> <a href='/w'>related four</a> "
        "<a href='/v'>related five six seven eight nine ten</a></div>"
        "<p>tiny orphan</p>"
        "<p>another isolated short</p>"
        "<footer>Copyright 2026 Example Corp. All rights reserved, "
        "lengthy legal boilerplate that must still be dropped.</footer>"
        "</body></html>"
    )
    text = html_main_content(html)
    # article body survives, heading kept via the neighborhood pass
    assert "actual article body" in text
    assert "Second real paragraph" in text
    assert text.startswith("Article heading")
    # chrome containers drop even when long
    assert "navigation" not in text and "Copyright" not in text
    assert "Site Title" not in text
    # link farm drops on link density despite its length
    assert "related" not in text
    # isolated shorts (no good neighbor) drop
    assert "orphan" not in text and "isolated" not in text


def test_html_main_content_link_density_edges():
    from hive_population_ml_spark.io.warc import html_main_content

    # inline links inside a long paragraph do NOT kill it
    html = (
        "<p>Long paragraph that cites <a href='/s'>a source</a> inline "
        "but remains mostly prose and therefore passes the density "
        "gate comfortably with room to spare.</p>"
    )
    assert "Long paragraph" in html_main_content(html)
    # all-anchor block fails even above the length gate
    farm = "<p>" + " ".join(
        f"<a href='/{i}'>link text number {i}</a>" for i in range(10)
    ) + "</p>"
    assert html_main_content(farm) == ""


def test_warc_to_documents_main_content_flag(spark, tmp_path):
    from hive_population_ml_spark.io import warc

    recs = [{
        "uri": "http://x/art",
        "html": (
            "<nav><a href='/'>home nav menu with words</a></nav>"
            "<p>Real article paragraph long enough to be good content "
            "for the extraction quality pass.</p>"
            "<footer>boilerplate footer text that is pretty long too"
            "</footer>"
        ),
    }]
    f = tmp_path / "mc.warc.gz"
    f.write_bytes(warc.encode_warc(recs))
    binary = spark.read.format("binaryFile").load(str(f))
    raw = warc.warc_to_documents(binary).collect()[0]["text"]
    main = warc.warc_to_documents(binary, main_content=True).collect()[0][
        "text"
    ]
    assert "boilerplate footer" in raw
    assert "Real article paragraph" in main
    assert "footer" not in main and "nav menu" not in main
