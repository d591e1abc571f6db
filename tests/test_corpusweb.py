"""URL canonicalization (operators/urlops.py) + code-quality filter
(operators/codeops.py) tests: normalization subset pinned case by
case, host/domain/path extraction, The-Stack filter behavior,
cross-engine replace() parity for the synthesized code text, and the
registered queries e2e."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.operators import codeops, urlops


def _norm(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"] for r in df.select(urlops.url_normalize("url").alias("n"))
        .collect()
    ]


def test_url_normalize_subset(spark):
    cases = {
        # case + default port
        "HTTPS://WWW.Ex.COM:443/A/b": "https://www.ex.com/A/b",
        "http://H.org:80/x?a=1": "http://h.org/x?a=1",
        # non-default port kept
        "http://h.org:8080/x": "http://h.org:8080/x",
        # fragment off
        "https://h.com/p#frag": "https://h.com/p",
        # userinfo off
        "https://u:pw@h.com/p": "https://h.com/p",
        # '@' in the path is NOT userinfo
        "https://h.com/p@x": "https://h.com/p@x",
        # tracking params off, survivors sorted, empty query dropped
        "https://h.com/p?utm_source=a&b=2&a=1": "https://h.com/p?a=1&b=2",
        "https://h.com/p?utm_source=a&gclid=z": "https://h.com/p",
        # trailing slash off (one), scheme '//' untouched
        "https://h.com/p/": "https://h.com/p",
        "https://h.com/": "https://h.com",
        # path/query case is significant and kept
        "https://h.com/Path?Q=V": "https://h.com/Path?Q=V",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("HTTPS://User@Sub.Host.Example.ORG:8443/A/b?q=1#f",)],
        "url string",
    )
    r = df.select(
        urlops.url_host("url").alias("h"),
        urlops.url_domain("url").alias("d"),
        urlops.url_path("url").alias("p"),
    ).collect()[0]
    assert r["h"] == "sub.host.example.org"
    assert r["d"] == "example.org"
    assert r["p"] == "/A/b"


def test_code_profile_metrics(spark):
    code = (
        "#!/usr/bin/env python\n"
        "# SPDX-License-Identifier: MIT\n"
        "\n"
        "x = 1  # ok\n"
        "// also a comment\n"
        "yyyy"
    )
    df = spark.createDataFrame([(code,)], "text string")
    r = codeops.code_profile(df).collect()[0]
    assert r["n_lines"] == 6
    assert r["max_line_len"] == 30
    assert r["has_shebang"] is True
    assert r["shebang_lang"] == "python"
    assert r["spdx_license"] == "MIT"
    assert r["is_autogen"] is False
    # comments: shebang + SPDX + '//' line = 3 of 6 ('x = 1 # ok' has
    # a TRAILING comment, not a comment line)
    assert r["comment_frac"] == pytest.approx(0.5)
    assert r["blank_frac"] == pytest.approx(1 / 6, abs=1e-6)


def test_code_quality_filter(spark):
    rows = [
        ("ok", "short = 1\nfine = 2"),
        ("longline", "x" * 2000),
        ("autogen", "# auto-generated, do not edit\nx = 1"),
        ("binaryish", "\x01\x02 () [] {} ;;;; ----"),
        ("mit", "# SPDX-License-Identifier: MIT\nx = 1"),
        ("gpl", "# SPDX-License-Identifier: GPL-3.0-only\nx = 1"),
    ]
    df = spark.createDataFrame(rows, "name string, text string")
    kept = {r["name"] for r in codeops.code_quality_filter(df).collect()}
    assert kept == {"ok", "mit", "gpl"}
    permissive = {
        r["name"]
        for r in codeops.code_quality_filter(df, permissive_only=True)
        .collect()
    }
    assert permissive == {"mit"}


def test_replace_parity_spark_vs_duckdb(spark):
    """The code synthesis leans on replace() being non-overlapping
    left-to-right in BOTH engines — pin it on the adversarial case."""
    s = " the the table table x"
    got_spark = (
        spark.range(1)
        .select(
            F.replace(
                F.replace(F.lit(s), F.lit(" the "), F.lit("\n# the ")),
                F.lit(" table "),
                F.lit("\ntable "),
            ).alias("v")
        )
        .collect()[0]["v"]
    )
    got_duck = duckdb.sql(
        "select replace(replace(?, ' the ', chr(10) || '# the '),"
        " ' table ', chr(10) || 'table ')",
        params=[s],
    ).fetchone()[0]
    assert got_spark == got_duck


def test_registered_queries_e2e(spark, sf_dir):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    dedup = QUERIES["url_normalize_dedup"](spark, sf_dir)
    rows = dedup.collect()
    assert len(rows) > 0
    # every canonical url is actually canonical (normalizing again is
    # a no-op); collapse-on-collision is pinned by the DuckDB oracle
    # hash (at sf0.001's 500 docs every page happens to be unique)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) <= n_docs
    again = dedup.select(
        (urlops.url_normalize("url") == F.col("url")).alias("ok")
    )
    assert all(r["ok"] for r in again.collect())

    prof = QUERIES["code_quality_profile"](spark, sf_dir).collect()
    assert len(prof) == n_docs
    shebangs = {r["shebang_lang"] for r in prof}
    assert {"python", "bash", ""} <= shebangs
    assert any(r["is_autogen"] for r in prof)

    lic = QUERIES["code_license_stats"](spark, sf_dir).collect()
    assert {r["spdx_license"] for r in lic} == {"", "MIT", "Apache-2.0"}
    assert sum(r["n_docs"] for r in lic) == n_docs
    assert any(r["n_kept"] < r["n_docs"] for r in lic)  # filter fires


def test_parse_robots_grammar(spark):
    body = (
        "# comment\r\n"
        "User-Agent: GoodBot\n"       # mixed case directive + agent
        "User-agent: OtherBot\n"      # stacked agents share the block
        "Disallow: /a/   # trailing comment\n"
        "Allow: /a/b\n"
        "Disallow:\n"                 # empty = no restriction, dropped
        "\n"
        "User-agent: *\n"
        "Disallow: /c/\n"
    )
    df = spark.createDataFrame([("h.com", body)], "host string, body string")
    rules = {
        (r["agent"], r["rule_type"], r["prefix"])
        for r in __import__(
            "hive_population_ml_spark.operators.urlops",
            fromlist=["urlops"],
        ).parse_robots(df).collect()
    }
    assert rules == {
        ("goodbot", "disallow", "/a/"),
        ("goodbot", "allow", "/a/b"),
        ("otherbot", "disallow", "/a/"),
        ("otherbot", "allow", "/a/b"),
        ("*", "disallow", "/c/"),
    }


def test_robots_filter_matching(spark):
    from hive_population_ml_spark.operators.urlops import (
        parse_robots,
        robots_filter,
    )

    body = (
        "User-agent: *\n"
        "Disallow: /x/\n"
        "Allow: /x/ok\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
    )
    rules = parse_robots(
        spark.createDataFrame([("h.com", body)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [
            ("https://h.com/free",),       # no match -> allowed
            ("https://h.com/x/page",),     # disallow /x/
            ("https://h.com/x/ok/deep",),  # longest match allow wins
            ("https://other.com/x/page",), # unknown host -> allowed
        ],
        "url string",
    )
    got = {
        r["url"]: (r["allowed"], r["rule"])
        for r in robots_filter(urls, rules, agent="*").collect()
    }
    assert got["https://h.com/free"] == (True, None)
    assert got["https://h.com/x/page"] == (False, "/x/")
    assert got["https://h.com/x/ok/deep"] == (True, "/x/ok")
    assert got["https://other.com/x/page"] == (True, None)
    # exact-agent groups override * entirely (RFC 9309 group selection)
    bad = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, rules, agent="badbot").collect()
    }
    assert bad["https://h.com/free"] is False      # badbot: Disallow /
    assert bad["https://h.com/x/ok/deep"] is False  # * Allow must NOT apply
    assert bad["https://other.com/x/page"] is True


def test_robots_allow_wins_length_tie(spark):
    from hive_population_ml_spark.operators.urlops import (
        parse_robots,
        robots_filter,
    )

    body = "User-agent: *\nDisallow: /p/\nAllow: /q/\n"
    rules = parse_robots(
        spark.createDataFrame([("h.com", body)], "host string, body string")
    )
    # same-length prefixes on one path can't literally tie, so pin the
    # tie rule with two rules of equal length matching the same url
    body2 = "User-agent: *\nDisallow: /pq/\nAllow: /pq/\n"
    rules2 = parse_robots(
        spark.createDataFrame([("t.com", body2)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [("https://t.com/pq/x",)], "url string"
    )
    r = robots_filter(urls, rules2).collect()[0]
    assert r["allowed"] is True and r["rule"] == "/pq/"
    r2 = robots_filter(
        spark.createDataFrame([("https://h.com/p/x",)], "url string"), rules
    ).collect()[0]
    assert r2["allowed"] is False


def test_fix_double_utf8(spark):
    from hive_population_ml_spark.operators.textops import (
        fix_double_utf8,
        mojibake_flag,
    )

    orig = "plain café naïve — “smart” ünïcödé"
    garbled = orig.encode("utf-8").decode("latin-1")
    # text with chars ABOVE latin-1 that must NOT take the repair
    # branch (ISO-8859-1 re-encode would '?'-substitute them)
    cjk = "日本語テキスト plain ascii"
    df = spark.createDataFrame(
        [("g", garbled), ("c", orig), ("k", cjk), ("a", "pure ascii")],
        "name string, t string",
    )
    rows = {
        r["name"]: r
        for r in df.select(
            "name",
            mojibake_flag("t").alias("det"),
            fix_double_utf8("t").alias("fixed"),
        ).collect()
    }
    assert rows["g"]["det"] is True and rows["g"]["fixed"] == orig
    assert rows["c"]["det"] is False and rows["c"]["fixed"] == orig
    assert rows["k"]["det"] is False and rows["k"]["fixed"] == cjk
    assert rows["a"]["fixed"] == "pure ascii"


def test_fix_mojibake_query_e2e(spark, sf_dir):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["text_fix_mojibake"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["detected"] == (r["doc_id"] % 2 == 0) for r in rows)
    for r in rows:
        if r["detected"]:
            assert r["n_chars_src"] > r["n_chars_repaired"]
        else:
            assert r["n_chars_src"] == r["n_chars_repaired"]
