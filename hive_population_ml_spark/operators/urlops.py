"""URL canonicalization and host analytics (round 12).

Web-corpus pipelines (CommonCrawl-scale) dedup and group by URL before
any content pass — the same page is captured under scheme/case/port/
tracking-param/fragment variants, and URL-level dedup is orders of
magnitude cheaper than content dedup, so it runs FIRST. This module
implements the standard canonicalization subset as pure Column
expressions (JVM-side regexp/higher-order functions — no UDFs, RE2-safe
patterns so the DuckDB oracles can mirror them):

- lowercase scheme + authority (path/query case is significant, kept)
- strip the fragment
- strip default ports (http:80, https:443)
- drop tracking query params (utm_*, fbclid, gclid, msclkid, ref)
- sort surviving query params (order-insensitive dedup)
- strip one trailing slash from the path

Deliberately out of scope (documented, not wrong): percent-encoding
normalization, IDN/punycode, public-suffix-list registrable domains
(`url_domain` is the last-two-labels approximation — the PSL is an
external data file; plug it in as a broadcast map when available).

Reference parity note: spineda1208/hive-population-ml has no URL
surface (single-apiary sensor CSVs, src/data/loader.py); this is
§2.10 LLM-pipeline extension surface.

100 TB posture: every function is a zero-shuffle scalar expression
inside whole-stage codegen; URL dedup is then one map-side-combined
groupBy on the canonical string — the cheapest possible first pass.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tracking params dropped by canonicalization. RE2-safe (no lookaround).
TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_normalize(url: str | Column) -> Column:
    """Canonical URL (see module docstring for the exact subset)."""
    u = _col(url)
    # 1. fragment off
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://authority, keep the rest as-is
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, tail)
    # 3. userinfo off (only when '@' sits inside the authority)
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)[^/?#@]*@", r"$1")
    # 4. default ports (anchored: at most one match in both engines)
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#].*)?$", r"$1$2")
    # 5. query params: drop tracking, sort the rest
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    # 6. one trailing slash off the path (never the '//' of the scheme)
    base = F.regexp_replace(base, r"([^/])/$", r"$1")
    return F.when(q2 == "", base).otherwise(F.concat(base, F.lit("?"), q2))


def url_host(url: str | Column) -> Column:
    """Lowercased hostname (no port, no userinfo)."""
    u = F.lower(_col(url))
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_replace(host, r"^[^@]*@", "")  # userinfo off
    return F.regexp_replace(host, r":[0-9]+$", "")  # port off


def url_domain(url: str | Column) -> Column:
    """Last-two-labels registrable-domain approximation (PSL plug
    point documented in the module docstring)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_path(url: str | Column) -> Column:
    """Path component (no query/fragment); '' when absent."""
    u = F.regexp_replace(_col(url), r"[?#].*$", "")
    return F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")


# --- robots.txt (Robots Exclusion Protocol, RFC 9309 subset) -----------

_WTRIM = r"^\s+|\s+$"  # regexp trim: Spark/DuckDB trim() is space-only


def parse_robots(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Parse robots.txt bodies into a rules table ``(host, agent,
    rule_type, prefix)`` with pure DataFrame ops (posexplode + window —
    no UDF).

    RFC 9309 subset: ``User-agent`` / ``Allow`` / ``Disallow`` lines,
    comments stripped, CRLF/whitespace tolerated, STACKED user-agent
    lines share the following rule block, empty Disallow dropped (it
    means "no restriction"). Out of scope (documented): Sitemap /
    Crawl-delay, ``*``/``$`` wildcards inside rule paths (prefix match
    only — the pre-wildcard REP most large crawlers still accept).

    Scale shape: the block-attribution window partitions by HOST —
    each partition is one robots.txt (couple hundred lines max), so
    parallelism is #hosts and no partition can whale."""
    from pyspark.sql import DataFrame as _DF, Window

    assert isinstance(df, _DF)
    raw = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    )
    line = F.regexp_replace(
        F.regexp_replace(F.col("line"), r"#.*$", ""), _WTRIM, ""
    )
    parsed = raw.select(
        "host",
        "pos",
        F.lower(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1)).alias(
            "directive"
        ),
        F.regexp_replace(
            F.regexp_extract(line, r"^[A-Za-z-]+\s*:(.*)$", 1), _WTRIM, ""
        ).alias("value"),
    ).filter(F.col("directive").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    blocks = parsed.withColumn(
        "block_id",
        F.sum(
            (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False)))
            .cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agents = blocks.filter(is_ua).select(
        "host", "block_id", F.lower("value").alias("agent")
    )
    rules = blocks.filter(~is_ua & (F.col("value") != "")).select(
        "host",
        "block_id",
        F.col("directive").alias("rule_type"),
        F.col("value").alias("prefix"),
    )
    return agents.join(rules, ["host", "block_id"]).select(
        "host", "agent", "rule_type", "prefix"
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent: str = "*",
) -> DataFrame:
    """Attach ``allowed`` / ``rule`` columns per URL under RFC 9309
    matching: the agent's own rule groups win over ``*`` groups
    (per host), longest-prefix match decides, Allow wins length ties,
    no match means allowed.

    Scale shape: the rules table is tiny relative to the URL stream —
    broadcast equi-join on host (the startswith conjunct rides the
    hash join as a post-filter, never a BNL), then one
    map-side-combined groupBy per URL row for the argmax."""
    agent = agent.lower()
    exact = rules.filter(F.col("agent") == agent)
    star = rules.filter(F.col("agent") == "*").join(
        exact.select("host").distinct(), "host", "left_anti"
    )
    eff = exact.unionByName(star) if agent != "*" else rules.filter(
        F.col("agent") == "*"
    )
    eff = eff.select(
        F.col("host").alias("__rhost"),
        (F.col("rule_type") == "allow").cast("int").alias("__allow"),
        F.col("prefix").alias("__prefix"),
    )
    u = urls.withColumn("__host", url_host(url_col)).withColumn(
        "__path", url_path(url_col)
    )
    j = u.join(
        F.broadcast(eff),
        (F.col("__host") == F.col("__rhost"))
        & F.startswith(F.col("__path"), F.col("__prefix")),
        "left",
    )
    best = F.max(
        F.when(
            F.col("__prefix").isNotNull(),
            F.struct(
                F.length("__prefix").alias("l"),
                F.col("__allow").alias("a"),
                F.col("__prefix").alias("p"),
            ),
        )
    ).alias("__best")
    out = j.groupBy(*urls.columns).agg(best)
    return out.select(
        *urls.columns,
        F.coalesce(F.col("__best.a") == 1, F.lit(True)).alias("allowed"),
        F.col("__best.p").alias("rule"),
    )
