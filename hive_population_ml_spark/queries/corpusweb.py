"""Web-corpus URL canonicalization + code-corpus quality queries
(round 12, charter extension — see operators/urlops.py and
operators/codeops.py for the 100 TB posture).

Both tiers synthesize their inputs deterministically from the
documents table INSIDE the query and its oracle (the corpus has no
URL/code columns), the same pattern as the CDC/GDPR queries.

The URL oracles are deliberately INDEPENDENT of the normalizer: the
synthesis is parametric, so the SQL constructs the expected canonical
form directly instead of re-running a normalization mirror — a hash
match proves the Spark normalizer lands exactly on the intended
canonical for every mess variant (case, default port, userinfo,
fragment, tracking params, param order, trailing slash).

The code-profile oracles mirror the metric definitions with DuckDB
list/regexp primitives, interpolating the very same RE2-safe pattern
constants the Spark operator uses (byte-identical regexes; DuckDB
``regexp_replace`` needs ``'g'`` for Spark's replace-all default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators.parallelism import fan_out
from ..operators import codeops, urlops
from .registry import register

# --- shared deterministic synthesis -----------------------------------

_N_PAGES = 37  # doc_id % _N_PAGES -> page collisions across variants


def _messy_url() -> F.Column:
    """Six mess variants of the same canonical page URL."""
    pg = (F.col("doc_id") % _N_PAGES).cast("string")
    base = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/page/"),
        pg,
    )
    v = F.col("doc_id") % 6
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTPS://WWW."),
                F.upper("source"),
                F.lit(".EXAMPLE.COM:443/"),
                F.col("lang"),
                F.lit("/page/"),
                pg,
            ),
        )
        .when(v == 1, F.concat(base, F.lit("?utm_source=feed&utm_campaign=x")))
        .when(
            v == 2,
            F.concat(
                F.lit("https://user:pw@www."),
                F.col("source"),
                F.lit(".example.com/"),
                F.col("lang"),
                F.lit("/page/"),
                pg,
                F.lit("#section-2"),
            ),
        )
        .when(v == 3, F.concat(base, F.lit("?b=2&a=1")))
        .when(v == 4, F.concat(base, F.lit("?a=1&b=2&utm_medium=m")))
        .otherwise(F.concat(base, F.lit("/")))
    )


_CANON_SQL = """
SELECT doc_id, lang, source,
       'https://www.' || source || '.example.com/' || lang || '/page/'
       || (doc_id % {n}) ||
       CASE WHEN doc_id % 6 IN (3, 4) THEN '?a=1&b=2' ELSE '' END AS url
FROM documents
""".format(n=_N_PAGES)


@register(
    "url_normalize_dedup",
    shadow_oracle=f"""
WITH c AS ({_CANON_SQL})
SELECT url, count(*) AS n_dups, min(doc_id) AS first_doc
FROM c GROUP BY url ORDER BY url
""",
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the cheapest first pass of a web-corpus
    pipeline: canonicalize (pure map, whole-stage codegen), then ONE
    map-side-combined groupBy on the canonical string. The oracle
    constructs the expected canonical independently — a hash match
    pins the normalizer output exactly."""
    t = Tables(spark, sf_dir)
    urls = fan_out(t.documents).select(
        "doc_id", urlops.url_normalize(_messy_url()).alias("url")
    )
    return (
        urls.groupBy("url")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("url")
    )


@register(
    "url_host_stats",
    shadow_oracle=f"""
WITH c AS ({_CANON_SQL})
SELECT 'www.' || source || '.example.com' AS host,
       'example.com' AS domain,
       count(*) AS n_urls,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT '/' || lang || '/page/' || (doc_id % {_N_PAGES}))
           AS n_pages
FROM c GROUP BY host, domain ORDER BY host
""",
)
def url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl inventory: host/registrable-domain extraction
    from the MESSY urls (case, ports, userinfo must all wash out) +
    distinct-page counts over the canonical path."""
    t = Tables(spark, sf_dir)
    messy = _messy_url()
    rows = fan_out(t.documents).select(
        "lang",
        urlops.url_host(messy).alias("host"),
        urlops.url_domain(messy).alias("domain"),
        urlops.url_path(urlops.url_normalize(messy)).alias("path"),
    )
    return (
        rows.groupBy("host", "domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("path").alias("n_pages"),
        )
        .orderBy("host")
    )


# --- code-corpus tier --------------------------------------------------


def _code_text() -> F.Column:
    """Deterministic code-shaped text: optional shebang / SPDX header /
    autogen marker, then the corpus text broken into comment + code
    lines (``replace`` is non-overlapping left-to-right in BOTH
    engines — parity-pinned in tests)."""
    nl = F.lit("\n")
    shebang = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("#!/usr/bin/env python"), nl))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("#!/bin/bash"), nl))
        .otherwise(F.lit(""))
    )
    spdx = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("# SPDX-License-Identifier: MIT"), nl))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("// SPDX-License-Identifier: Apache-2.0"), nl))
        .otherwise(F.lit(""))
    )
    autogen = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("# Auto-generated, DO NOT EDIT."), nl),
    ).otherwise(F.lit(""))
    body = F.replace(
        F.replace(F.col("text"), F.lit(" the "), F.lit("\n# the ")),
        F.lit(" table "),
        F.lit("\ntable "),
    )
    return F.concat(shebang, spdx, autogen, body)


_CODE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN '#!/usr/bin/env python' || chr(10)
            WHEN doc_id % 4 = 1 THEN '#!/bin/bash' || chr(10)
            ELSE '' END ||
       CASE WHEN doc_id % 3 = 0
                 THEN '# SPDX-License-Identifier: MIT' || chr(10)
            WHEN doc_id % 3 = 1
                 THEN '// SPDX-License-Identifier: Apache-2.0' || chr(10)
            ELSE '' END ||
       CASE WHEN doc_id % 7 = 0
                 THEN '# Auto-generated, DO NOT EDIT.' || chr(10)
            ELSE '' END ||
       replace(replace(text, ' the ', chr(10) || '# the '),
               ' table ', chr(10) || 'table ') AS code
FROM documents
"""


@register(
    "code_quality_profile",
    shadow_oracle=f"""
WITH c AS ({_CODE_SQL}),
m AS (
  SELECT doc_id, code, string_split(code, chr(10)) AS lines FROM c)
SELECT doc_id,
  len(lines) AS n_lines,
  list_max(list_transform(lines, x -> length(x))) AS max_line_len,
  round(list_sum(list_transform(lines, x -> length(x)))::DOUBLE
        / greatest(len(lines), 1), 4) AS avg_line_len,
  round(length(regexp_replace(code, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
        / greatest(length(code), 1), 6) AS alnum_frac,
  round(len(list_filter(lines,
            x -> regexp_matches(x, '{codeops.COMMENT_RE}')))::DOUBLE
        / greatest(len(lines), 1), 6) AS comment_frac,
  round(len(list_filter(lines, x -> regexp_matches(x, '^\\s*$')))::DOUBLE
        / greatest(len(lines), 1), 6) AS blank_frac,
  starts_with(code, '#!') AS has_shebang,
  regexp_extract(code, '{codeops.SHEBANG_LANG_RE}', 1) AS shebang_lang,
  regexp_matches(code, '{codeops.AUTOGEN_RE}') AS is_autogen,
  regexp_extract(code, '{codeops.SPDX_RE}', 1) AS spdx_license
FROM m ORDER BY doc_id
""",
)
def code_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The-Stack-style per-file filter bundle over synthesized code
    (line structure, alnum/comment/blank fractions, shebang language,
    autogen marker, SPDX id) — all zero-shuffle scalar expressions."""
    t = Tables(spark, sf_dir)
    base = fan_out(t.documents).select("doc_id", _code_text().alias("code"))
    cols = codeops.code_profile_cols("code")
    return base.select(
        "doc_id",
        F.size(F.split("code", "\n")).cast("long").alias("n_lines"),
        cols["max_line_len"].cast("long").alias("max_line_len"),
        cols["avg_line_len"].alias("avg_line_len"),
        cols["alnum_frac"].alias("alnum_frac"),
        cols["comment_frac"].alias("comment_frac"),
        cols["blank_frac"].alias("blank_frac"),
        cols["has_shebang"].alias("has_shebang"),
        cols["shebang_lang"].alias("shebang_lang"),
        cols["is_autogen"].alias("is_autogen"),
        cols["spdx_license"].alias("spdx_license"),
    ).orderBy("doc_id")


@register(
    "code_license_stats",
    shadow_oracle=f"""
WITH c AS ({_CODE_SQL}),
m AS (
  SELECT doc_id, code,
    regexp_extract(code, '{codeops.SPDX_RE}', 1) AS spdx_license,
    regexp_extract(code, '{codeops.SHEBANG_LANG_RE}', 1) AS shebang_lang,
    regexp_matches(code, '{codeops.AUTOGEN_RE}') AS is_autogen,
    list_max(list_transform(string_split(code, chr(10)),
                            x -> length(x))) AS max_line_len,
    length(regexp_replace(code, '[^a-zA-Z0-9]', '', 'g')) AS alnum_chars,
    length(code) AS n_chars
  FROM c)
SELECT spdx_license, shebang_lang,
  count(*) AS n_docs,
  count(*) FILTER (WHERE is_autogen) AS n_autogen,
  round(sum(alnum_chars)::DOUBLE / sum(n_chars), 6) AS avg_alnum,
  count(*) FILTER (WHERE max_line_len <= 80
                   AND alnum_chars * 1.0 / n_chars >= 0.78
                   AND NOT is_autogen) AS n_kept
FROM m GROUP BY spdx_license, shebang_lang
ORDER BY spdx_license, shebang_lang
""",
)
def code_license_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License x language rollup + keep-rate under The-Stack-style
    thresholds. Ratio aggregates sum INTEGER numerators/denominators
    (one division per group — order-invariant, no float-merge wobble)."""
    t = Tables(spark, sf_dir)
    base = fan_out(t.documents).select("doc_id", _code_text().alias("code"))
    lines = F.split("code", "\n")
    lens = F.transform(lines, lambda x: F.length(x))
    rows = base.select(
        F.regexp_extract("code", codeops.SPDX_RE, 1).alias("spdx_license"),
        F.regexp_extract("code", codeops.SHEBANG_LANG_RE, 1).alias(
            "shebang_lang"
        ),
        F.col("code").rlike(codeops.AUTOGEN_RE).alias("is_autogen"),
        F.array_max(lens).alias("max_line_len"),
        F.length(F.regexp_replace("code", r"[^a-zA-Z0-9]", "")).alias(
            "alnum_chars"
        ),
        F.length("code").alias("n_chars"),
    )
    kept = (
        (F.col("max_line_len") <= 80)
        & (F.col("alnum_chars") * 1.0 / F.col("n_chars") >= 0.78)
        & ~F.col("is_autogen")
    )
    return (
        rows.groupBy("spdx_license", "shebang_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("is_autogen"), 1)).alias("n_autogen"),
            F.round(
                F.sum("alnum_chars") / F.sum("n_chars").cast("double"), 6
            ).alias("avg_alnum"),
            F.count(F.when(kept, 1)).alias("n_kept"),
        )
        .orderBy("spdx_license", "shebang_lang")
    )


# --- robots.txt tier ----------------------------------------------------

_ROBOTS_SQL = f"""
SELECT doc_id, lang, source,
       CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) AS srcnum,
       (doc_id % {_N_PAGES}) AS pg,
       'https://www.' || source || '.example.com/' || lang || '/page/'
       || (doc_id % {_N_PAGES}) ||
       CASE WHEN doc_id % 6 IN (3, 4) THEN '?a=1&b=2' ELSE '' END AS url
FROM documents
"""


@register(
    "url_robots_filter",
    shadow_oracle=f"""
WITH c AS ({_ROBOTS_SQL})
SELECT doc_id, url,
  CASE WHEN lang <> 'de' THEN true
       WHEN srcnum % 2 <> 0 THEN true
       WHEN srcnum % 4 = 0
            AND starts_with('/de/page/' || pg, '/de/page/1') THEN true
       ELSE false END AS allowed,
  CASE WHEN lang <> 'de' OR srcnum % 2 <> 0 THEN NULL
       WHEN srcnum % 4 = 0
            AND starts_with('/de/page/' || pg, '/de/page/1')
            THEN '/de/page/1'
       ELSE '/de/' END AS rule
FROM c ORDER BY doc_id
""",
)
def url_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt (RFC 9309) crawl filtering end-to-end: per-source
    robots bodies are SYNTHESIZED (a ``*`` group with /private/ and
    per-source /de/ Disallows plus a longest-match-exercising Allow,
    and a ``badbot`` group that must NOT apply), parsed through the
    REAL DataFrame parser, and matched against the canonical URLs.
    The oracle constructs the expected verdicts independently — a
    hash match pins group scoping, longest-prefix match, Allow
    tie-break, and no-match-means-allowed at once. The Allow prefix
    '/de/page/1' deliberately also covers pages 10-19 (real REP
    prefix semantics, not a path-segment match)."""
    t = Tables(spark, sf_dir)
    nl = F.lit("\n")
    srcnum = F.regexp_extract("source", r"([0-9]+)", 1).cast("int")
    body = F.concat(
        F.lit("# synthetic robots fixture\n"),
        F.lit("User-agent: *\r\n"),  # CRLF tolerated
        F.lit("Disallow: /private/\n"),
        F.when(srcnum % 2 == 0, F.concat(F.lit("Disallow: /de/"), nl))
        .otherwise(F.lit("")),
        F.when(srcnum % 4 == 0, F.concat(F.lit("Allow: /de/page/1"), nl))
        .otherwise(F.lit("")),
        F.lit("Disallow:\n"),  # empty value = no restriction, dropped
        nl,
        F.lit("User-agent: badbot\nDisallow: /\n"),
    )
    robots = (
        t.documents.select("source").distinct().select(
            F.concat(F.lit("www."), F.col("source"),
                     F.lit(".example.com")).alias("host"),
            body.alias("body"),
        )
    )
    rules = urlops.parse_robots(robots)
    urls = fan_out(t.documents).select(
        "doc_id", urlops.url_normalize(_messy_url()).alias("url")
    )
    return (
        urlops.robots_filter(urls, rules, url_col="url", agent="*")
        .select("doc_id", "url", "allowed", "rule")
        .orderBy("doc_id")
    )


# --- encoding-repair tier ------------------------------------------------

_MOJI_INJECT = " café naïve — “smart” ünïcödé"  # 29 chars, 41 utf-8 bytes


@register(
    "text_fix_mojibake",
    shadow_oracle=f"""
SELECT doc_id,
  (doc_id % 2 = 0) AS detected,
  CASE WHEN doc_id % 2 = 0 THEN strlen(text) + 41
       ELSE length(text) + 29 END AS n_chars_src,
  length(text) + 29 AS n_chars_repaired,
  true AS roundtrip_ok
FROM documents ORDER BY doc_id
""",
)
def text_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-encoded-UTF-8 repair end-to-end: every doc gets a
    non-ASCII suffix; even docs are then garbled with the EXACT
    defect transform (utf-8 bytes decoded as latin-1 — Spark
    ``decode(encode(.,'UTF-8'),'ISO-8859-1')``) and must repair back
    to the original, odd docs stay clean and must pass through the
    conditional repair UNTOUCHED. The oracle constructs expected
    values independently via char-vs-byte length arithmetic
    (``strlen`` = DuckDB byte length: a garbled string has exactly as
    many chars as the original had utf-8 bytes) and pins
    ``roundtrip_ok`` = true — a hash match proves detection fires
    exactly on the garbled half and the repair is lossless."""
    t = Tables(spark, sf_dir)
    from ..operators.textops import fix_double_utf8, mojibake_flag

    orig = F.concat(F.col("text"), F.lit(_MOJI_INJECT))
    garbled = F.decode(F.encode(orig, "UTF-8"), "ISO-8859-1")
    src = F.when(F.col("doc_id") % 2 == 0, garbled).otherwise(orig)
    base = fan_out(t.documents).select(
        "doc_id", orig.alias("orig"), src.alias("src")
    )
    return base.select(
        "doc_id",
        mojibake_flag("src").alias("detected"),
        F.length("src").cast("long").alias("n_chars_src"),
        F.length(fix_double_utf8("src")).cast("long").alias(
            "n_chars_repaired"
        ),
        (fix_double_utf8("src") == F.col("orig")).alias("roundtrip_ok"),
    ).orderBy("doc_id")
