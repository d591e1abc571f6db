"""Corpus sampling / data-mixing / PII queries (charter extension).

Round-4 rotation: these queries now carry full ``oracle`` SQL inside
the driver's 50-entry hash-check window (six long-stable trivial
queries ceded their slots and hold the same differential contract as
``shadow_oracle`` checks in ``tests/test_sampling.py``).

The PII oracle interpolates the very same ``PII_PATTERNS`` constants the
Spark operator uses, so both engines run byte-identical regexes
(RE2-safe subset). DuckDB ``regexp_replace`` needs the ``'g'`` flag to
match Spark's replace-all default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators import textops
from ..operators.sampling import mixture_weights, pack_shards, stratified_sample
from ..operators.textops import PII_PATTERNS
from .registry import register

_RATES = {"en": 0.5, "zh": 0.25}
_DEFAULT_RATE = 0.75


@register(
    "sample_stratified",
    oracle=f"""
WITH s AS (
    SELECT doc_id, lang, source,
           (((((abs(doc_id) + 999983) % 2147483647) * 48271 % 2147483647)
               * 48271) % 2147483647) / 2147483647.0 AS u
    FROM documents)
SELECT doc_id, lang, source, round(u, 9) AS u
FROM s
WHERE u < CASE lang WHEN 'en' THEN {_RATES["en"]}
                    WHEN 'zh' THEN {_RATES["zh"]}
                    ELSE {_DEFAULT_RATE} END
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (map-only, no shuffle;
    stable under retries, unlike rand()-based sampling)."""
    t = Tables(spark, sf_dir)
    kept = stratified_sample(
        t.documents, "lang", _RATES, id_col="doc_id", default_rate=_DEFAULT_RATE
    )
    return kept.select(
        "doc_id", "lang", "source", F.round("__u", 9).alias("u")
    )


@register(
    "mix_temperature_weights",
    oracle="""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT sum(pow(n_docs, 0.3)) AS tw FROM c)
SELECT lang, n_docs,
       round(pow(n_docs, 0.3) / tw, 9) AS p,
       round(least(1.0, pow(n_docs, 0.3) / tw * 1000 / n_docs), 9) AS rate,
       round(pow(n_docs, 0.3) / tw * 1000 / n_docs, 9) AS epochs
FROM c, t
""",
)
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5-style temperature mixture (p_i ∝ n_i^0.3) with per-stratum
    keep rates / upsampling epochs for a 1000-doc training mix."""
    t = Tables(spark, sf_dir)
    return mixture_weights(t.documents, "lang", alpha=0.3, target_total=1000)


@register(
    "pack_token_shards",
    oracle="""
WITH s AS (
    SELECT lang AS bucket, doc_id AS ord,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents),
w AS (
    SELECT bucket, ord, n_tokens,
           sum(n_tokens) OVER (PARTITION BY bucket ORDER BY ord
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start
    FROM s)
SELECT bucket, CAST(floor(start / 2000.0) AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(ord) AS first_ord, max(ord) AS last_ord
FROM w
GROUP BY bucket, shard_id
""",
)
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard manifest: contiguous ~2000-token shards per
    language, running sum windowed per bucket (no global sort)."""
    t = Tables(spark, sf_dir)
    return pack_shards(
        t.documents,
        bucket_col="lang",
        size_col=textops.token_count("text"),
        budget=2000,
        order_col="doc_id",
    )


def _pii_injected_sql() -> str:
    email_p, ip_p, phone_p = (p for _, p, _ in PII_PATTERNS)
    email_t, ip_t, phone_t = (tok for _, _, tok in PII_PATTERNS)
    masked = (
        f"regexp_replace(regexp_replace(regexp_replace(t, "
        f"'{email_p}', '{email_t}', 'g'), "
        f"'{ip_p}', '{ip_t}', 'g'), "
        f"'{phone_p}', '{phone_t}', 'g')"
    )
    return f"""
WITH d AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || doc_id
                    || '@example.com at 10.0.0.' || (doc_id % 250)
                    || ' or +1 555-000-1234'
               ELSE '' END AS t
    FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{email_p}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{ip_p}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{phone_p}')) AS BIGINT) AS n_phones,
       md5({masked}) AS masked_fp
FROM d
"""


@register("text_pii_mask", oracle=_pii_injected_sql())
def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking over the corpus. The synthetic corpus carries no PII,
    so a deterministic fixture suffix (emails/IPs/phones on every 7th
    doc) is injected identically on both engines — the masking chain and
    counts then do real, hash-checkable work. Map-only at any scale."""
    t = Tables(spark, sf_dir)
    injected = t.documents.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0.0."),
                (F.col("doc_id") % 250).cast("string"),
                F.lit(" or +1 555-000-1234"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    return injected.select(
        "doc_id",
        textops.pii_count("email", "t").cast("long").alias("n_emails"),
        textops.pii_count("ipv4", "t").cast("long").alias("n_ips"),
        textops.pii_count("phone", "t").cast("long").alias("n_phones"),
        F.md5(textops.pii_mask("t")).alias("masked_fp"),
    )


@register(
    "text_unigram_logprob",
    oracle="""
WITH tok AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS t
    FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM freq)
SELECT doc AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(c / n_total)), 6) AS avg_nll
FROM tok JOIN freq USING (t), tot
GROUP BY doc
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram NLL quality score per document (CCNet-style LM
    proxy) — see operators/textops.py::unigram_logprob_score."""
    t = Tables(spark, sf_dir)
    return textops.unigram_logprob_score(t.documents)


@register("sketch_distinct_tokens")  # rows-only: sketch estimates are
# engine-specific (DataSketches HLL vs DuckDB's approx sketch);
# accuracy vs exact + merge-consistency pinned in tests/test_sampling.py
def sketch_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token estimates per language via mergeable HLL sketches:
    per-(lang, source) sketches rolled up to lang WITHOUT rescanning —
    the persisted-partition-sketch pattern for 100 TB distinct metrics."""
    from ..operators.sketches import distinct_sketches, rollup_sketches

    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "lang", "source", F.explode(textops.tokens("text")).alias("t")
    )
    fine = distinct_sketches(tok, ["lang", "source"], "t")
    return rollup_sketches(fine, ["lang"]).select("lang", "est_distinct")


@register(
    "sample_group_bottomk",
    oracle="""
WITH s AS (
    SELECT doc_id, lang,
           (((((abs(doc_id) + 999983) % 2147483647) * 48271 % 2147483647)
               * 48271) % 2147483647) / 2147483647.0 AS u
    FROM documents),
r AS (
    SELECT doc_id, lang, u,
           row_number() OVER (PARTITION BY lang
                              ORDER BY u ASC, doc_id ASC) AS rk
    FROM s)
SELECT doc_id, lang, round(u, 9) AS u, rk
FROM r WHERE rk <= 10
""",
)
def sample_group_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-doc deterministic sample per language
    (operators/sampling.py::bottom_k_sample): hash-order bottom-k —
    the mergeable, retry-stable replacement for per-group reservoir
    sampling. The count-broadcast prefilter shrinks the rank window to
    O(k) candidates per group before any shuffle."""
    from ..operators.sampling import bottom_k_sample

    t = Tables(spark, sf_dir)
    out = bottom_k_sample(
        t.documents.select("doc_id", "lang"), "lang", k=10, id_col="doc_id"
    )
    return out.select(
        "doc_id",
        "lang",
        F.round("u", 9).alias("u"),
        F.col("rk").cast("long").alias("rk"),
    )


@register(
    "sample_weighted",
    oracle="""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           round(pow(
               ((((abs(doc_id) + 999983) % 2147483647) * 48271 % 2147483647)
                 * 48271 % 2147483647) / 2147483647.0,
               1.0 / n_chars), 9) AS sample_key
    FROM documents
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY sample_key DESC, doc_id ASC) AS rn
    FROM keyed
)
SELECT doc_id, lang, n_chars, sample_key FROM ranked WHERE rn <= 5
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sampling without replacement: 5 docs per lang with
    inclusion probability proportional to n_chars — deterministic
    (portable minstd hash, keys rounded to 9 before ranking so pow()
    ulps cannot flip the cross-engine selection)."""
    from ..operators.sampling import weighted_sample_by

    t = Tables(spark, sf_dir)
    return weighted_sample_by(
        t.documents.select("doc_id", "lang", "n_chars"),
        group_col="lang",
        weight_col="n_chars",
        k=5,
        id_col="doc_id",
    )


@register("sketch_value_quantiles")  # rows-only: GK estimates are
# algorithm-specific (DuckDB's approx_quantile is t-digest); rank-error
# bound and partial-agg shape pinned in tests/test_operators.py
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-group quantile sketches (percentile_approx / GK)
    over event values — the one-pass, fixed-state replacement for exact
    percentile at 100 TB. a_percentiles / a_outlier_iqr are the exact
    twins this swaps in for."""
    from ..operators.sketches import quantile_sketches

    t = Tables(spark, sf_dir)
    return quantile_sketches(
        t.events, "value", ["event_type"], probs=[0.25, 0.5, 0.75, 0.95]
    )


@register(
    "mix_unimax_weights",
    shadow_oracle="""
WITH c AS (
    SELECT lang AS stratum,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
staged AS (
    SELECT stratum, n_tokens,
           n_tokens * 1.0 AS cap,
           0.9 * sum(n_tokens * 1.0) OVER () AS B,
           count(*) OVER () AS L,
           row_number() OVER (ORDER BY n_tokens * 1.0 ASC, stratum ASC) AS i,
           coalesce(sum(n_tokens * 1.0) OVER (
               ORDER BY n_tokens * 1.0 ASC, stratum ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_before
    FROM c
),
flagged AS (
    SELECT *,
           CASE WHEN cap * (L - i + 1) <= B - s_before THEN 1 ELSE 0 END
               AS saturated
    FROM staged
),
lvl AS (
    SELECT *,
           sum(saturated) OVER () AS k,
           sum(cap * saturated) OVER () AS s_k
    FROM flagged
),
alloc AS (
    SELECT *,
           CASE WHEN saturated = 1 THEN cap
                WHEN L > k THEN (B - s_k) / (L - k)
                ELSE 0 END AS a
    FROM lvl
)
SELECT stratum AS lang, n_tokens,
       round(cap, 6) AS cap,
       round(a, 6) AS alloc,
       round(a / B, 9) AS weight
FROM alloc
""",
)
def mix_unimax_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023; round-7
    addition): uniform-as-possible token budget across languages with a
    per-language epoch cap — the repetition-bounded alternative to
    mix_temperature_weights. budget_frac=0.9, epochs=1.0 makes the
    waterfill non-trivial on this corpus (the four smaller languages
    saturate at one epoch; English gets the residual water level). The
    shadow oracle recomputes the allocation INCLUDING the window-form
    waterfill."""
    from ..operators.sampling import unimax_weights

    t = Tables(spark, sf_dir)
    return unimax_weights(
        t.documents, "lang", "text", budget_frac=0.9, epochs=1.0
    )


@register("sketch_token_freq_cms")  # rows-only: seeded-hash sketch has
# no DuckDB twin; overestimate-only / error-bound / exact-merge
# properties pinned in tests/test_scale_toolkit.py
def sketch_token_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min token-frequency sketch (round-7 addition): build the
    depth=4 x width=1024 mergeable cell table over every token
    occurrence, then point-query it for the corpus's exact top-20
    tokens (deterministic probe set). est_count >= true count always;
    the cell table is the persist-then-rollup artifact at 100 TB (one
    ~16 KB sketch per shard, summed cell-wise for any date range)."""
    from ..operators.sketches import cms_estimate, count_min_sketch

    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    sketch = count_min_sketch(tok, "t", depth=4, width=1024)
    top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("t").asc())
        .limit(20)
    )
    return cms_estimate(sketch, top, "t", depth=4, width=1024).orderBy("t")


@register(
    "sample_quality_stratified",
    shadow_oracle="""
WITH scored AS (
    SELECT doc_id, lang, source,
           round(least(len(string_split(text, ' ')) / 50.0, 1.0)
                 * (1.0 - least((length(text)
                                 - length(regexp_replace(text, '[0-9]', '', 'g')))
                                * 1.0 / NULLIF(length(text), 0) * 5.0, 1.0)),
                 6) AS quality,
           (((((abs(doc_id) + 999983) % 2147483647) * 48271 % 2147483647)
               * 48271) % 2147483647) / 2147483647.0 AS u
    FROM documents
), banded AS (
    SELECT *, CASE WHEN quality >= 0.75 THEN 'hi'
                   WHEN quality >= 0.4 THEN 'mid'
                   ELSE 'lo' END AS band
    FROM scored
)
SELECT doc_id, lang, source, quality, band, round(u, 9) AS u
FROM banded
WHERE u < CASE band WHEN 'hi' THEN 1.0 WHEN 'mid' THEN 0.5 ELSE 0.1 END
""",
)
def sample_quality_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified corpus sampling (round-7 addition): the
    curation recipe that keeps high-quality documents whole and
    aggressively downsamples the tail — heuristic quality score
    (Catalyst-only, 6-decimal-rounded on both engines so band edges
    cannot straddle) -> FIXED score thresholds into hi/mid/lo bands
    (thresholds, not ntile: a global ntile needs a corpus sort; fixed
    cutoffs are map-only and stable as the corpus grows) -> per-band
    deterministic minstd hash-keep {1.0, 0.5, 0.1}. Zero shuffles;
    fully differential end to end."""
    t = Tables(spark, sf_dir)
    quality = textops.quality_score("text")
    band = (
        F.when(quality >= 0.75, F.lit("hi"))
        .when(quality >= 0.4, F.lit("mid"))
        .otherwise(F.lit("lo"))
    )
    from ..operators.sampling import uniform_hash

    u = uniform_hash("doc_id", "minstd")
    rate = (
        F.when(F.col("band") == "hi", F.lit(1.0))
        .when(F.col("band") == "mid", F.lit(0.5))
        .otherwise(F.lit(0.1))
    )
    return (
        t.documents.select(
            "doc_id",
            "lang",
            "source",
            quality.alias("quality"),
            band.alias("band"),
            u.alias("__u"),
        )
        .filter(F.col("__u") < rate)
        .select(
            "doc_id", "lang", "source", "quality", "band",
            F.round("__u", 9).alias("u"),
        )
    )


@register(
    "sample_training_order",
    shadow_oracle="""
WITH h AS (
    SELECT doc_id,
           (abs(doc_id + 7 * 1000003) + 999983) % 2147483647 AS x0
    FROM documents),
s1 AS (SELECT doc_id, x0 * 48271 % 2147483647 AS x1 FROM h),
s2 AS (SELECT doc_id, x1 * 48271 % 2147483647 AS x2 FROM s1),
s3 AS (SELECT doc_id, x2, x2 * 48271 % 2147483647 AS x3 FROM s2)
SELECT doc_id,
       CAST(x2 % 8 AS INT) AS shard,
       row_number() OVER (PARTITION BY x2 % 8 ORDER BY x3, doc_id) AS pos
FROM s3
""",
)
def sample_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order assignment (round-8 addition): a
    seeded pseudo-random global permutation as (shard, pos) labels —
    the pre-training shuffle step — with NO global sort: shard is pure
    map-side integer Lehmer arithmetic, and each shard ranks locally in
    parallel. Fully differential: the same 64-bit modular arithmetic
    runs in DuckDB, so shard, order, and rank all hash-compare."""
    from ..operators.sampling import training_order

    t = Tables(spark, sf_dir)
    return training_order(t.documents, "doc_id", n_shards=8, seed=7)


@register("mix_domain_clusters")  # rows-only: k-means cell assignment
# has no DuckDB twin; partition/mass-conservation/temperature
# properties pinned in tests/test_sampling.py
def mix_domain_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing over LEARNED domains (round-8 addition; the
    DoReMi/Dolma move): k-means cells over document embeddings stand in
    for missing/too-coarse source labels, then per-cell token mass is
    temperature-reweighted (p ∝ tokens^0.3) into keep rates and epoch
    counts. Composes the two existing scale paths end-to-end:
    bounded-sample centroid fit + zero-exchange GEMM assignment feed
    ONE doc-keyed join and ONE cell agg; every window after that runs
    over the ~sqrt(n)-row cell table."""
    from ..operators.sampling import domain_mixture_weights
    from .similarity import _centroid_df, _centroid_rows, _corpus_key

    t = Tables(spark, sf_dir)
    emb = t.embeddings
    # memoized offline quantizer build (fingerprint-keyed, identical
    # training call to the previous in-place fit: k=16, seed=7,
    # max_iter=10, sample_n=4096 — centers and all downstream rows
    # unchanged); shared with mix_cluster_silhouette, which uses the
    # same (k, seed) quantizer by design
    rows = _centroid_rows(
        spark, emb, _corpus_key(emb, sf_dir), k=16, max_iter=10, sample_n=4096
    )
    return domain_mixture_weights(
        t.documents, emb, alpha=0.3, n_cells=16, seed=7,
        centroids=_centroid_df(spark, rows),
    )


@register("j_size_estimate_cms")  # rows-only: seeded-sketch estimate
# has no DuckDB twin; overestimate-only + epsilon*Na*Nb error bound
# pinned in tests/test_scale_toolkit.py
def j_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation without the join (round-8 addition; the
    AMS/CMS inner-product classic): how many rows would the events
    user_id SELF-join produce — the pair-explosion pre-check a planner
    wants BEFORE committing to a quadratic-risk plan (the same
    question the dedup tier's hot-block guards answer reactively).
    Two fixed 4x8192 cell tables; the estimate is one tiny cell
    equi-join; neither input is ever shuffled on the join key."""
    from ..operators.sketches import cms_join_size, count_min_sketch

    t = Tables(spark, sf_dir)
    ev = t.events.select(F.col("user_id").cast("string").alias("k"))
    sk = count_min_sketch(ev, "k", depth=4, width=8192)
    n = ev.agg(F.count(F.lit(1)).alias("n_rows"))
    return n.crossJoin(cms_join_size(sk, sk))


@register(
    "sample_epoch_materialize",
    shadow_oracle="""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
wts AS (SELECT lang, n, pow(n, 0.3) AS w FROM counts),
eps AS (
    SELECT lang, n,
           round(w / (SELECT sum(w) FROM wts) * 800 / n, 9) AS e
    FROM wts
), h AS (
    SELECT d.doc_id, d.lang, eps.e,
           (abs(d.doc_id) + 999983) % 2147483647 AS x0
    FROM documents d JOIN eps ON d.lang = eps.lang
), s1 AS (SELECT doc_id, lang, e, x0 * 48271 % 2147483647 AS x1 FROM h),
s2 AS (SELECT doc_id, lang, e, x1 * 48271 % 2147483647 AS x2 FROM s1),
nc AS (
    SELECT doc_id, lang,
           CAST(floor(e) AS INT)
           + CASE WHEN x2 * 1.0 / 2147483647 < e - floor(e)
                  THEN 1 ELSE 0 END AS n_copies
    FROM s2
)
SELECT doc_id, lang, CAST(t.copy_idx AS INT) AS copy_idx
FROM nc, unnest(range(n_copies)) AS t(copy_idx)
""",
)
def sample_epoch_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch materialization (round-8 addition): turn
    mixture_weights' per-language epoch counts (alpha=0.3, 800-doc
    target) into the concrete training MULTISET — every doc repeated
    floor(e) times plus a deterministic (minstd-hash) fraction getting
    one more copy. The upsampling step between a mixing plan and a
    training run; map-side sequence+explode, ZERO shuffle after the
    stratum-table broadcast. Fully differential: the oracle recomputes
    the temperature weights, the epoch split, the Lehmer hash, and the
    copy expansion."""
    from ..operators.sampling import materialize_epochs, mixture_weights

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang")
    eps = mixture_weights(t.documents, "lang", alpha=0.3, target_total=800)
    return materialize_epochs(docs, "lang", eps.select("lang", "epochs"))


# -- beyond ref: mixture concentration report (HHI / entropy) ---------------

@register(
    "mix_concentration",
    shadow_oracle="""
WITH s AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
), tot AS (SELECT sum(n_tokens) AS t FROM s),
sh AS (
    SELECT source, n_docs, n_tokens, n_tokens * 1.0 / t AS share
    FROM s, tot
), g AS (
    SELECT round(sum(share * share), 6) AS hhi,
           round(-sum(share * ln(share)), 6) AS entropy,
           round(exp(-sum(share * ln(share))), 6) AS eff_sources
    FROM sh
)
SELECT source, n_docs, n_tokens, round(share, 6) AS token_share,
       hhi, entropy, eff_sources
FROM sh, g
""",
)
def mix_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture concentration report: per-source token share plus
    the global Herfindahl index, Shannon entropy, and effective source
    count exp(H) — the one-look diagnostic for 'is this mixture
    dominated by one crawl?' that gates reweighting (mix_temperature /
    UniMax) decisions. Scale shape: ONE partial-aggregated scan
    groups by source (cardinality = #feeds, tens); the global
    HHI/entropy aggregate runs over that tens-row table and both
    1-row/tens-row side tables re-attach by broadcast cross join — no
    second pass over the corpus, no window over the full table. Global
    floats are sums over the tiny per-source table, rounded to 6 to
    absorb addition-order skew between engines."""
    from ..io import Tables

    t = Tables(spark, sf_dir)
    # Checkpoint the tens-row per-source table so the corpus token scan
    # runs ONCE for its three consumers (totals, entropy agg, final
    # projection) — the textops freq-table convention.
    s = (
        t.documents.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    tot = s.agg(F.sum("n_tokens").alias("t"))
    sh = s.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("t")
    )
    g = sh.agg(
        F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
        F.round(-F.sum(F.col("share") * F.log(F.col("share"))), 6).alias(
            "entropy"
        ),
        F.round(
            F.exp(-F.sum(F.col("share") * F.log(F.col("share")))), 6
        ).alias("eff_sources"),
    )
    return sh.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("share", 6).alias("token_share"),
        "hhi",
        "entropy",
        "eff_sources",
    )


# -- beyond ref: exact-proportion stratified 3-way split --------------------

@register(
    "split_stratified_exact",
    shadow_oracle="""
WITH r AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY (((((abs(doc_id) + 999983) % 2147483647)
                           * 48271 % 2147483647) * 48271) % 2147483647),
                        doc_id) AS rk,
           count(*) OVER (PARTITION BY lang) AS n
    FROM documents
), lab AS (
    SELECT lang,
           CASE WHEN rk <= floor(n * 0.8) THEN 'train'
                WHEN rk <= floor(n * 0.8) + floor(n * 0.1) THEN 'val'
                ELSE 'test' END AS split
    FROM r
)
SELECT lang, split, count(*) AS n_docs
FROM lab GROUP BY lang, split
""",
)
def split_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-count stratified train/val/test split: every stratum
    contributes floor(n*0.8) / floor(n*0.1) / remainder rows — the
    guarantee hash-threshold splits (sample_stratified / the
    reference's M4) can only hit in expectation, needed when strata
    are small (a 12-doc language must not land 0 validation docs by
    hash luck). Rows are ranked INSIDE each stratum by the portable
    minstd hash (doc_id tiebreak), so membership is deterministic,
    seed-stable, and independent of physical row order; the split is
    the rank compared to exact cut counts. Scale (round 10): the rank
    runs through operators.sampling.two_level_row_number — the
    probe-caught whale-stratum fix — so parallelism is #strata x
    #chunks instead of one task per stratum; results are exactly the
    single-window rank (chunking is monotone in the hash). Both split
    forms exist on purpose: hash-keep when strata are huge, exact-rank
    when quotas are hard requirements. Output is the (stratum, split)
    contingency table; the per-row assignment is the same frame minus
    the final agg."""
    t = Tables(spark, sf_dir)
    from ..operators.sampling import two_level_row_number, uniform_hash

    u = uniform_hash("doc_id", mode="minstd")
    r = two_level_row_number(
        t.documents.select("lang", "doc_id"), "lang", u, "doc_id"
    )
    lab = r.select(
        "lang",
        F.when(
            F.col("rk") <= F.floor(F.col("n") * 0.8), "train"
        )
        .when(
            F.col("rk")
            <= F.floor(F.col("n") * 0.8) + F.floor(F.col("n") * 0.1),
            "val",
        )
        .otherwise("test")
        .alias("split"),
    )
    return lab.groupBy("lang", "split").agg(F.count("*").alias("n_docs"))
