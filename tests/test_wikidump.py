"""Wikipedia multistream ingestion tests (io/wikidump.py): bz2 stream
walking and index, MediaWiki XML page grammar, the bounded wikitext
cleaner (nesting, links, tables, refs), the binaryFile Spark path, the
index-split ranged-read path, and the registered query e2e."""

from __future__ import annotations

import bz2

import pytest

from hive_population_ml_spark.io import wikidump as wd

PAGES = [
    {"title": "Alpha", "page_id": 1,
     "wikitext": "'''Alpha''' is a [[letter]] of the [[Greek alphabet|Greek]] script."},
    {"title": "Beta", "page_id": 2,
     "wikitext": "{{Infobox|x=1|nested={{deep|y}}}}Beta follows alpha.<ref>src</ref>"},
    {"title": "Redirect page", "page_id": 3, "redirect": True,
     "wikitext": "#REDIRECT [[Alpha]]"},
    {"title": "Talk:Gamma", "page_id": 4, "ns": 1,
     "wikitext": "talk chatter"},
    {"title": "Delta", "page_id": 5,
     "wikitext": "== History ==\n* item one\n{| class=\"wikitable\"\n| a || b\n|}\nDelta text &amp; more."},
]


def test_multistream_layout_and_index():
    blob, index = wd.encode_wikidump(PAGES, pages_per_stream=2)
    streams = list(wd.iter_bz2_streams(blob))
    # header + ceil(5/2)=3 page streams + closer
    assert len(streams) == 5
    idx = wd.build_stream_index(blob)
    assert idx[0]["offset"] == 0
    assert sum(e["length"] for e in idx) == len(blob)
    # index lines point at real stream offsets
    offsets = {e["offset"] for e in idx}
    for line in index:
        off = int(line.split(":", 1)[0])
        assert off in offsets
    with pytest.raises(ValueError, match="bz2"):
        wd.build_stream_index(b"not bz2")
    with pytest.raises(ValueError, match="truncated"):
        wd.build_stream_index(blob[:-4])


def test_page_grammar_and_filters():
    blob, _ = wd.encode_wikidump(PAGES, pages_per_stream=100)
    payloads = [p for _o, _l, p in wd.iter_bz2_streams(blob)]
    # header stream has no pages
    assert wd.parse_pages(payloads[0]) == []
    pages = wd.parse_pages(payloads[1])
    assert len(pages) == 5
    byid = {p["page_id"]: p for p in pages}
    assert byid[1]["title"] == "Alpha" and byid[1]["ns"] == 0
    assert byid[3]["redirect"] is True
    assert byid[4]["ns"] == 1
    assert "Greek alphabet" in byid[1]["wikitext"]


def test_wikitext_cleaner():
    t = wd.wikitext_to_text
    assert t("'''Alpha''' is a [[letter]].") == "Alpha is a letter."
    assert t("[[Greek alphabet|Greek]] script") == "Greek script"
    assert t("{{Infobox|x={{deep|y}}}}Beta.") == "Beta."
    assert t("pre {| class=x\n| a\n{| inner |}\n|} post") == "pre post"
    assert t("a<ref name=x>cite</ref>b<ref name=y/>c") == "abc"
    assert t("[[File:Pic.jpg|thumb|A [[link]] caption]]rest") == "rest"
    assert t("[[Category:Letters]]done") == "done"
    assert t("see [https://x.example the docs] now") == "see the docs now"
    assert t("bare [https://x.example] link") == "bare link"
    assert t("== History ==\ncontent") == "History\ncontent"
    assert t("* one\n# two\n: three") == "one\ntwo\nthree"
    assert t("A &amp; B <b>bold</b>") == "A & B bold"
    # comment spanning lines
    assert t("x<!-- hidden\nstill hidden -->y") == "xy"


def test_spark_binaryfile_path(spark, tmp_path):
    blob, _ = wd.encode_wikidump(PAGES, pages_per_stream=2)
    f = tmp_path / "fixture-multistream.xml.bz2"
    f.write_bytes(blob)
    binary = spark.read.format("binaryFile").load(str(f))
    rows = wd.wiki_to_documents(binary).collect()
    # redirect + ns!=0 dropped -> Alpha, Beta, Delta
    assert sorted(r["title"] for r in rows) == ["Alpha", "Beta", "Delta"]
    alpha = next(r for r in rows if r["title"] == "Alpha")
    assert alpha["text"] == "Alpha is a letter of the Greek script."
    delta = next(r for r in rows if r["title"] == "Delta")
    assert "History" in delta["text"] and "wikitable" not in delta["text"]
    assert all(r["n_text_chars"] == len(r["text"]) for r in rows)


def test_index_split_matches_whole_file(spark, tmp_path):
    pages = [
        {"title": f"Page {i}", "page_id": i,
         "wikitext": f"Body of [[page {i}]] with {{{{tmpl}}}} text."}
        for i in range(1, 25)
    ]
    blob, _ = wd.encode_wikidump(pages, pages_per_stream=3)
    f = tmp_path / "big.xml.bz2"
    f.write_bytes(blob)
    full = wd.wiki_to_documents(
        spark.read.format("binaryFile").load(str(f))
    ).collect()
    idx = wd.build_stream_index(blob)
    idx_df = spark.createDataFrame(
        [(str(f), e["offset"], e["length"]) for e in idx],
        "path string, offset long, length long",
    )
    out = wd.wiki_to_documents_indexed(idx_df, n_tasks=4)
    assert out.rdd.getNumPartitions() == 4  # >1 task per dump file
    rows = out.collect()
    assert sorted(r["page_id"] for r in rows) == sorted(
        r["page_id"] for r in full
    )
    assert sorted(r["text"] for r in rows) == sorted(
        r["text"] for r in full
    )


def test_registered_query_e2e(spark, sf_dir):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["s_wiki_ingest"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:10]:
        # wikitext chrome must never leak into the extracted text
        assert "{{" not in r["text_head"] and "[[" not in r["text_head"]
        assert "wikitable" not in r["text_head"]
        assert r["n_text_chars"] > 0
        # cleaner strictly shrinks the chrome-wrapped source
        assert r["n_text_chars"] < r["n_wikitext_chars"]
