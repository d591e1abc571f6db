"""Text-analysis operators for large-scale training-data pipelines.

No reference citation exists (SURVEY.md §2.10 — charter extension
scope); designs are Spark-native: every function is a Catalyst
expression over the ``documents`` table, no Python UDFs in the hot
path, so a 100 TB corpus stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parallelism import fan_out

# Minimal per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Real corpora would ship larger lists; the mechanism
# (null-safe tokenize -> set intersection ratio -> argmax) is the part
# that must scale.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (split keeps empty strings in both Spark
    and DuckDB for consecutive separators — oracle-stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


# BPE-style pretokenization pattern (GPT-2-like, ASCII-restricted so the
# Java and RE2 regex engines agree): a token is an optionally space-
# prefixed letter run, digit run, or punctuation run.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_tokens(col: str | Column = "text") -> Column:
    """BPE-ish pretokens via regexp_extract_all — the subword-tokenizer
    precut (letters/digits/punctuation split apart, leading space glued
    to the following word). Counting these approximates LLM token counts
    far better than whitespace splitting on punctuation-heavy text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: str | Column = "text") -> Column:
    return F.size(bpe_tokens(col))


def char_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def avg_token_len(col: str | Column = "text") -> Column:
    """Mean token length — a classic quality-score ingredient."""
    t = tokens(col)
    total = F.aggregate(
        t, F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("double")
    return total / F.nullif(F.size(t), F.lit(0))


def stopword_ratio(lang: str, col: str | Column = "text") -> Column:
    """Fraction of tokens found in ``lang``'s stopword list."""
    t = tokens(col)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.nullif(F.size(t), F.lit(0))


def uppercase_ratio(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # chars removed when stripping [A-Z] = uppercase count.
    return (
        (F.length(c) - F.length(F.regexp_replace(c, "[A-Z]", ""))).cast("double")
        / F.nullif(F.length(c), F.lit(0))
    )


def digit_ratio(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))).cast("double")
        / F.nullif(F.length(c), F.lit(0))
    )


def quality_score(col: str | Column = "text") -> Column:
    """Composite heuristic quality score in [0, 1]: rewards mid-length
    documents with low digit noise — deterministic arithmetic only."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    noise_penalty = F.least(digit_ratio(col) * 5.0, F.lit(1.0))
    return F.round(len_score * (F.lit(1.0) - noise_penalty), 6)


def shingles_of_tokens(t: Column, k: int = 3) -> Column:
    """Distinct k-token shingles from an ALREADY-MATERIALIZED token
    array column (the unit for Jaccard/MinHash dedup).

    ``t`` must be a plain attribute, not a `split(...)` expression:
    lambda bodies inline captured expressions, so an expression argument
    would re-tokenize the document once per element_at — O(len²) regex
    work per row. Built with sequence+transform — stays columnar;
    ``array_distinct`` collapses repeats so Jaccard is set-based.
    """
    idx = F.sequence(F.lit(0), F.size(t) - F.lit(k))
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(F.size(t) >= k, F.array_distinct(mk)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: str | Column = "text", k: int = 3) -> Column:
    """Distinct k-token shingles straight from a text column. Prefer
    ``shingles_of_tokens`` over a pre-split column in hot paths (see its
    docstring for the expression-inlining hazard)."""
    return shingles_of_tokens(tokens(col), k)


def fingerprint(col: str | Column = "text", head: int = 8) -> Column:
    """Deterministic document fingerprint: md5 over the first ``head``
    tokens (a cheap rolling-hash analog for near-head dedup)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(col), 1, head)))


# RE2-safe (no backrefs/lookaround) so the identical patterns run in
# Spark (java.util.regex) and DuckDB (RE2) — the differential contract.
# Order matters: emails first (their local part can look like a phone),
# then IPs (digit runs), then phones on what remains.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def pii_count(kind: str, col: str | Column = "text") -> Column:
    """Match count for one PII kind (before any masking)."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern))


def pii_mask(col: str | Column = "text") -> Column:
    """Mask emails/IPv4s/phone numbers with typed placeholder tokens.

    Chained ``regexp_replace`` — pure expression layer, whole-stage
    codegen, no UDF. Masking a 100 TB corpus is then a map-only pass
    with zero shuffles. Counts come from ``pii_count`` on the PRE-mask
    text (the replace chain erases earlier kinds' matches).
    """
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def predict_lang(col: str | Column = "text") -> Column:
    """Stopword-vote language ID: argmax over per-language stopword hit
    counts, 'und' (undetermined) when no stopwords hit at all."""
    t = tokens(col)

    def hits(sw: list[str]) -> Column:
        return F.size(F.filter(t, lambda x: x.isin(*sw)))

    scores = [(lang, hits(sw)) for lang, sw in STOPWORDS.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so earlier languages win ties (deterministic order).
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), lang).otherwise(expr)
    return expr


def unigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style LM-quality proxy: per-document mean negative
    log-likelihood under the corpus's own unigram distribution (high
    avg_nll = rare-token-heavy = candidate for quality filtering).

    Plan shape at scale: one token-count aggregation builds the
    vocabulary table (vocabulary ≪ corpus — it is the classic
    broadcast-join side, AQE broadcasts it from runtime stats), the
    corpus total folds in via a 1-row cross join, and one final
    aggregation scores documents. No per-row Python, no window.
    """
    tok = fan_out(df).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    )
    # The vocab table feeds BOTH the total and the scoring join; without
    # materialization each consumer recomputes the corpus tokenize+agg
    # chain (a third full scan). Vocabulary is Heaps-bounded — exactly
    # what should pin. (Same fix as the MinHash candidate checkpoint.)
    freq = tok.groupBy("t").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    total = freq.agg(F.sum("c").cast("double").alias("n_total"))
    return (
        tok.join(freq, "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n_total"))), 6).alias(
                "avg_nll"
            ),
        )
        .select(F.col("doc").alias(id_col), "n_tokens", "avg_nll")
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    split the corpus into head / middle / tail THIRDS by LM score —
    head = best (lowest avg NLL under the corpus unigram LM, the same
    proxy unigram_logprob_score registers) — the standard coarse
    quality gate before sampling (keep head+middle, drop or
    down-weight tail).

    Assignment is THRESHOLD-based, exactly as CCNet computes it: the
    two tercile cutpoints come from one tiny percentile aggregation
    (a 1-row table, broadcast), and every document labels itself
    map-side by comparison — NOT a global ntile window, which would
    funnel the whole corpus through a single-partition sort at 100 TB.
    Boundary docs (avg_nll == cut) go to the better bucket in both
    engines, so the label is exact and hash-checkable.

    Output: (id_col, n_tokens, avg_nll, bucket in head|middle|tail).
    """
    # scored feeds BOTH the cutpoint agg and the final label pass;
    # without materialization each consumer re-runs the tokenize +
    # vocab-join chain (the tfidf_keywords lesson: pruned subtrees
    # defeat exchange reuse). Three narrow columns per doc.
    scored = unigram_logprob_score(docs, id_col, text_col).localCheckpoint(eager=False)
    cuts = scored.agg(
        F.percentile(F.col("avg_nll"), F.lit(1.0 / 3)).alias("c1"),
        F.percentile(F.col("avg_nll"), F.lit(2.0 / 3)).alias("c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "n_tokens",
        "avg_nll",
        F.when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def bigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram-LM quality proxy: per-document mean NLL of
    P(w_i | w_{i-1}) = c(w_{i-1}, w_i) / c(w_{i-1}, ·) under the
    corpus's own MLE bigram model — a sharper rarity signal than the
    unigram form (it penalizes improbable token TRANSITIONS, the
    classic gibberish detector).

    Plan shape: one bigram-count aggregation (bounded by distinct
    bigrams, still ≪ corpus for natural text), a left-context rollup of
    that same table, and joins back for the per-doc average — both
    model tables are the small AQE-broadcast side. Docs with < 2 tokens
    carry no bigrams and are excluded (mirrored by the oracle). The
    size>=2 filter is correctness: Spark's sequence(0, size-2) for
    size=1 is the DESCENDING [0,-1], which would index out of bounds.
    """
    bg = (
        df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            "doc",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__t) - 2), "
                    "i -> struct(__t[i] as w1, __t[i+1] as w2))"
                )
            ).alias("b"),
        )
        .select("doc", "b.w1", "b.w2")
    )
    # Materialize the bigram model table: it feeds the left-context
    # rollup AND the scoring join — without the checkpoint the bigram
    # explode+agg chain recomputes per consumer (vocab-bounded state).
    freq = bg.groupBy("w1", "w2").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    left = freq.groupBy("w1").agg(F.sum("c").cast("double").alias("cl"))
    return (
        bg.join(freq, ["w1", "w2"])
        .join(left, "w1")
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("c") / F.col("cl"))), 6).alias(
                "avg_nll"
            ),
        )
        .select(F.col("doc").alias(id_col), "n_bigrams", "avg_nll")
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document text-analysis column bundle."""
    return fan_out(df).select(
        "*",
        token_count(text_col).alias("n_tokens"),
        char_count(text_col).alias("n_chars_computed"),
        F.round(avg_token_len(text_col), 6).alias("avg_token_len"),
        F.round(stopword_ratio("en", text_col), 6).alias("en_stopword_ratio"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fp"),
        predict_lang(text_col).alias("pred_lang"),
    )


def _mode_count(arr: Column) -> Column:
    """Count of the most frequent element: run-length max over the
    SORTED array, as one ``aggregate`` lambda — the per-document mode
    without exploding tokens into a shuffle. O(n log n) per row,
    JVM-side, zero exchanges; the naive explode + groupBy(doc, token)
    form shuffles every token of the corpus."""
    sorted_arr = F.sort_array(arr)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1:
    duplicate-line fraction, top-word / top-2-gram mass; C4's
    boilerplate intuition): documents dominated by a few repeated
    units are low-quality for LM training.

    Per doc: ``dup_line_frac`` (1 - distinct/total newline-split
    lines), ``dup_word_frac`` (same over whitespace tokens),
    ``top_word_frac`` / ``top_2gram_frac`` (mass of the single most
    frequent token / adjacent bigram), and ``keep_repetition`` — the
    Gopher-ish gate (dup lines <= 0.30, top word <= 0.20, top 2-gram
    <= 0.18 here, tuned to the synthetic corpus's scale).

    Everything is a per-row expression over materialized arrays — the
    100 TB path has NO shuffle at all (see ``_mode_count``).
    """
    base = fan_out(df).select(
        id_col,
        F.split(F.col(text_col), "\n").alias("__lines"),
        tokens(text_col).alias("__t"),
    )
    # raw (non-distinct) adjacent bigrams — repetition mass needs repeats
    raw_grams = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("__t") - F.lit(2)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("__t"), (i + 1).cast("int")),
                F.element_at(F.col("__t"), (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_lines = F.size("__lines").cast("double")
    n_words = F.size("__t").cast("double")
    n_grams = F.size(raw_grams).cast("double")
    out = base.select(
        id_col,
        F.size("__lines").alias("n_lines"),
        F.size("__t").alias("n_words"),
        F.round(
            1.0 - F.size(F.array_distinct("__lines")) / F.nullif(n_lines, F.lit(0.0)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            1.0 - F.size(F.array_distinct("__t")) / F.nullif(n_words, F.lit(0.0)), 6
        ).alias("dup_word_frac"),
        F.round(
            _mode_count(F.col("__t")) / F.nullif(n_words, F.lit(0.0)), 6
        ).alias("top_word_frac"),
        F.round(
            _mode_count(raw_grams) / F.nullif(n_grams, F.lit(0.0)), 6
        ).alias("top_2gram_frac"),
    )
    return out.withColumn(
        "keep_repetition",
        (
            (F.coalesce(F.col("dup_line_frac"), F.lit(0.0)) <= 0.30)
            & (F.coalesce(F.col("top_word_frac"), F.lit(0.0)) <= 0.20)
            & (F.coalesce(F.col("top_2gram_frac"), F.lit(0.0)) <= 0.18)
        ).cast("int"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 1,
    max_benchmark_shingles: int | None = 10_000_000,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing
    >= ``min_overlap`` distinct k-token shingles with an evaluation
    benchmark (the public n-gram-overlap practice: GPT-3 appendix C,
    Gopher/Llama eval-decontamination).

    Scale shape: the benchmark is tiny next to a 100 TB corpus, so its
    distinct shingle hashes BROADCAST; the corpus side is a map-side
    shingle explode joined against the broadcast set — rows survive
    only on hits, and the single shuffle (groupBy doc) carries hit
    counts, not shingles. int64 xxhash64 join keys, never strings.

    The whole design stands on the benchmark side staying
    broadcast-small: a caller that passes a corpus-sized "benchmark"
    silently flips the probe into replicating it to every task (the
    10x scale probe measured ~100x work when both sides grew — see
    PERFORMANCE.md). ``max_benchmark_shingles`` pins that contract at
    runtime: the benchmark's distinct-shingle count (one cheap count
    over the SMALL side only) must not exceed it, or the call raises
    with the shuffle-join alternative named. ``None`` disables the
    guard for callers who have sized the broadcast themselves. The
    default 10M int64 hashes ≈ 80 MB broadcast payload — comfortable
    for executors, far below Spark's 8 GB broadcast ceiling.
    """
    d_sh = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    ).select(
        id_col,
        F.explode(shingles_of_tokens(F.col("__t"), k)).alias("__s"),
    ).select(id_col, F.xxhash64("__s").alias("__h"))
    b_sh = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__t"))
        .select(F.explode(shingles_of_tokens(F.col("__t"), k)).alias("__s"))
        .select(F.xxhash64("__s").alias("__h"))
        .distinct()
    )
    if max_benchmark_shingles is not None:
        n_b = b_sh.count()
        if n_b > max_benchmark_shingles:
            raise ValueError(
                f"decontaminate: benchmark side has {n_b} distinct "
                f"shingles > max_benchmark_shingles="
                f"{max_benchmark_shingles}; broadcasting it would "
                "replicate a non-small relation to every task. Shrink "
                "the benchmark, raise the cap if the broadcast is "
                "genuinely affordable, use bloom_decontaminate (fixed-"
                "size bitset broadcast, no false negatives) for a "
                "large benchmark, or use an explicit shuffle hash-join "
                "(drop the broadcast hint) for two large sides."
            )
    ov = (
        d_sh.join(F.broadcast(b_sh), "__h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return docs.select(id_col).join(ov, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap)
        .cast("int")
        .alias("contaminated"),
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
) -> DataFrame:
    """Sketch-based decontamination — the scale path past
    ``decontaminate``'s broadcast guard.

    The exact path broadcasts the benchmark's distinct shingle hashes
    (8 bytes/shingle: ~80 MB at 10M shingles, and growing linearly).
    This path compresses the benchmark side into a FIXED-SIZE Bloom
    bitset (``m_bits/8`` bytes — 1 MiB at the default 2^23 bits) built
    by ``sketches.bloom_build``:

    - Build: one pass over benchmark shingles, bit_or-aggregated; the
      shuffle carries at most m/64 words. No distinct() needed (bit
      sets are idempotent), so even the build beats the exact path.
    - Probe: the bitset is embedded as a plan-constant LITERAL
      (``sketches.bloom_bits_literal`` — one m/8-byte driver collect;
      a joined array column would be re-copied per row, measured 34x
      slower) and every doc tests its shingles with O(1)
      ``element_at`` lookups — a PURE MAP over the corpus with ZERO
      corpus-side exchanges, not even the exact path's hit-count
      shuffle.

    Semantics: ``maybe_contaminated`` is a SUPERSET of the exact
    ``contaminated`` flag (Bloom filters have no false negatives);
    the FP rate is ~(1 - e^(-k_hashes*n/m_bits))^k_hashes. Size
    ``m_bits`` at ~10 bits per distinct benchmark shingle for <1% FP.
    The at-100-TB recipe: bloom-probe first (map-only over the corpus),
    then run the exact overlap count only on the tiny flagged slice.
    """
    from .sketches import bloom_bits_literal, bloom_probe_any

    b_sh = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__t"))
        .select(F.explode(shingles_of_tokens(F.col("__t"), k)).alias("__s"))
    )
    bits = bloom_bits_literal(b_sh, "__s", m_bits=m_bits, k_hashes=k_hashes)
    probe = (
        fan_out(docs)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__t"))
        .select(id_col, shingles_of_tokens(F.col("__t"), k).alias("__sh"))
        .withColumn("__bits", bits)
    )
    return probe.select(
        id_col,
        bloom_probe_any("__sh", "__bits", m_bits, k_hashes)
        .cast("int")
        .alias("maybe_contaminated"),
    )


def _positional_shingles(
    toks: DataFrame, id_col: str, tok_col: str, k: int
) -> DataFrame:
    """(id, __p, __h): every k-token window occurrence with its 0-based
    start position and 64-bit span hash. NOT distinct — position-level
    operators (token_contamination, remove_repeated_spans) need every
    occurrence, unlike the set-based shingle dedup tier."""
    idx = F.sequence(F.lit(0), F.size(tok_col) - F.lit(k))
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            *[F.element_at(tok_col, (i + j + 1).cast("int")) for j in range(k)],
        ),
    )
    return toks.filter(F.size(tok_col) >= F.lit(k)).select(
        id_col, F.posexplode(mk).alias("__p", "__s")
    ).select(id_col, "__p", F.xxhash64("__s").alias("__h"))


def token_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    dirty_frac: float = 0.8,
    max_benchmark_shingles: int | None = 10_000_000,
) -> DataFrame:
    """Token-POSITION-level contamination fraction (the Llama-2
    appendix-A.6 contract, in contrast to ``decontaminate``'s doc-level
    overlap count): a token is contaminated when ANY k-token window
    covering it appears in the benchmark; a document is ``dirty`` when
    >= ``dirty_frac`` of its tokens are contaminated. Reports
    (id, n_tokens, n_contaminated, contaminated_frac, dirty) for every
    training document, so callers can pick their own cut OR keep the
    fraction as a quality feature.

    Scale shape (same posture as ``decontaminate``, one extra shuffle
    nowhere): benchmark distinct shingle hashes BROADCAST (guarded by
    ``max_benchmark_shingles`` — same rationale/raise); the corpus side
    posexplodes windows map-side, the broadcast join keeps only HITS,
    and each hit fans out to its k covered positions map-side. The ONE
    corpus shuffle is the (id -> count_distinct(position)) aggregation,
    carrying matched (id, position) pairs only — proportional to the
    contamination actually found, not the corpus. The join back to the
    per-doc token counts is id-keyed on two already-aggregated sides.
    """
    d = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )
    base = d.select(id_col, F.size("__t").alias("n_tokens"))
    win = _positional_shingles(d, id_col, "__t", k)
    b_sh = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__t"))
        .select(F.explode(shingles_of_tokens(F.col("__t"), k)).alias("__s"))
        .select(F.xxhash64("__s").alias("__h"))
        .distinct()
    )
    if max_benchmark_shingles is not None:
        n_b = b_sh.count()
        if n_b > max_benchmark_shingles:
            raise ValueError(
                f"token_contamination: benchmark side has {n_b} distinct "
                f"shingles > max_benchmark_shingles={max_benchmark_shingles}; "
                "see decontaminate's guard docstring for the alternatives "
                "(bloom prefilter, explicit shuffle join)."
            )
    cont = (
        win.join(F.broadcast(b_sh), "__h")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__p"), F.col("__p") + F.lit(k - 1))
            ).alias("__cp"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("__cp").alias("n_contaminated"))
    )
    frac = F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_tokens")
    return base.join(cont, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        F.round(frac, 6).alias("contaminated_frac"),
        (frac >= F.lit(dirty_frac)).cast("int").alias("dirty"),
    )


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring dedup REMOVAL (the acting half of Lee et al.
    2022's ExactSubstr, where ``dup_spans`` is the mining half): every
    corpus-wide occurrence of a k-token span seen >= ``min_occurrences``
    times is excised EXCEPT the canonical first occurrence (min by
    (id, position) — lexicographic struct min, deterministic), and each
    document's text is rebuilt from its surviving tokens. A token
    survives unless some removed window covers it; overlapping removed
    windows union their positions. Self-repetition inside one document
    is removed the same way (the second copy of a span loses even when
    both copies share a doc_id) — also ExactSubstr behavior.

    Output: (id, n_tokens, n_removed, clean_text). Fixed-k windows are
    the one-scan distributed approximation of the suffix-array maximal-
    repeat pass — exact for repeats of length >= k, with overlap-union
    extending removals beyond k when repeats chain.

    Scale shape: window occurrences explode map-side; shuffle #1 groups
    by the 64-bit span hash carrying (count, min-struct keeper) with
    partial aggregation — one row per distinct span per partition. The
    occurrence->dup-span join re-keys on the same hash (AQE reuses the
    partitioning), survivors fan to covered positions map-side, and
    shuffle #2 collects each doc's removed-position SET — proportional
    to text actually removed. Reconstruction is a pure MAP, linear per
    document: ``array_except(sequence(0, n-1), removed)`` hashes the
    removed set ONCE and scans the position range (O(n_tokens +
    |removed|)), then a ``transform`` gathers the surviving tokens —
    NOT a per-token ``array_contains`` probe, which is
    O(n_tokens x |removed|) and quadratic in doc length for a fully
    duplicated document (VERDICT r7 #5). The doc-keyed join of tokens
    vs removal sets is the only other exchange.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )
    occ = _positional_shingles(toks, id_col, "__t", k)
    dup = (
        occ.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(F.struct(F.col(id_col), F.col("__p"))).alias("__keep"),
        )
        .filter(F.col("__c") >= F.lit(min_occurrences))
        .select("__h", "__keep")
    )
    rm_occ = occ.join(dup, "__h").filter(
        ~(
            (F.col(id_col) == F.col("__keep")[id_col])
            & (F.col("__p") == F.col("__keep.__p"))
        )
    )
    rm_pos = (
        rm_occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("__p"), F.col("__p") + F.lit(k - 1))
            ).alias("__rp"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__rp").alias("__rm"))
    )
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size("__t") - F.lit(1)), F.col("__rm")
    )
    kept = F.when(F.col("__rm").isNull(), F.col("__t")).otherwise(
        F.transform(kept_pos, lambda p: F.element_at(F.col("__t"), p + F.lit(1)))
    )
    return toks.join(rm_pos, id_col, "left").select(
        id_col,
        F.size("__t").alias("n_tokens"),
        F.coalesce(F.size("__rm"), F.lit(0)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def duplication_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Per-document duplication fraction: the share of a doc's k-token
    windows whose span appears >= ``min_occurrences`` times CORPUS-wide
    (counting all occurrences, including the doc's own repeats) — the
    doc-level scalar behind "drop documents that are mostly
    boilerplate" filters (the per-doc companion of ``dup_spans``, which
    mines the offending spans, and ``remove_repeated_spans``, which
    excises them; c.f. the duplicate-fraction signals in Gopher's
    repetition suite and Lee et al. 2022 §5).

    Output: (id, n_windows, n_dup_windows, dup_frac). Docs shorter than
    k tokens report 0 windows and dup_frac 0.0.

    Scale shape: windows explode map-side; span counts partial-agg to
    one row per distinct span (Heaps-bounded); the windows re-key on
    the same hash to join the counts; one per-doc agg. No per-doc
    state beyond two longs.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )
    occ = _positional_shingles(toks, id_col, "__t", k)
    counts = (
        occ.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= F.lit(min_occurrences))
        .select("__h")
    )
    per_doc = (
        occ.join(counts, "__h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    base = toks.select(
        id_col,
        F.greatest(
            F.size("__t") - F.lit(k - 1), F.lit(0)
        ).alias("n_windows"),
    )
    nd = F.coalesce(F.col("n_dup_windows"), F.lit(0))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.col("n_windows").cast("long").alias("n_windows"),
        nd.cast("long").alias("n_dup_windows"),
        F.when(F.col("n_windows") > 0, F.round(nd / F.col("n_windows"), 6))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty in ingestion order: the share of a
    doc's DISTINCT k-token windows whose corpus-wide FIRST occurrence
    (min id) is this doc — the diminishing-returns curve dedup papers
    plot to show how much genuinely new text each successive document
    contributes (Lee et al. 2022 §4 measure this to size the win of
    dedup before training; a crawl whose tail novelty approaches zero
    is pure re-crawl). ``duplication_score`` asks "is this doc mostly
    repeated text?"; this asks "was this doc the ORIGIN of its text?".

    Output: (id, n_windows, n_novel, novelty_frac) where n_windows is
    the DISTINCT window count (set semantics, unlike
    duplication_score's occurrence count). Docs shorter than k tokens
    report 0 windows and novelty 0.0.

    Scale shape: per-doc window sets dedup map-side (array_distinct
    before the explode, so the shuffle never carries a doc's internal
    repeats); ONE span-keyed partial agg computes each span's min
    owner (Heaps-bounded rows); novel counts re-agg that one-row-per-
    span table by owner; the per-doc base (id, n_windows) is computed
    map-side from the same array. No join touches the exploded table.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )
    idx = F.sequence(F.lit(0), F.size("__t") - F.lit(k))
    mk = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ",
                    *[F.element_at("__t", (i + j + 1).cast("int")) for j in range(k)],
                )
            ),
        )
    )
    wins = toks.withColumn(
        "__w", F.when(F.size("__t") >= F.lit(k), mk).otherwise(F.array())
    )
    sh = wins.select(id_col, F.explode("__w").alias("__h"))
    first = sh.groupBy("__h").agg(F.min(id_col).alias(id_col))
    novel = first.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_novel"))
    base = wins.select(id_col, F.size("__w").cast("long").alias("n_windows"))
    nn = F.coalesce(F.col("n_novel"), F.lit(0))
    return base.join(novel, id_col, "left").select(
        id_col,
        "n_windows",
        nn.cast("long").alias("n_novel"),
        F.when(F.col("n_windows") > 0, F.round(nn / F.col("n_windows"), 6))
        .otherwise(F.lit(0.0))
        .alias("novelty_frac"),
    )


def token_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Token -> occurrence count (optionally per group): the corpus
    vocabulary table behind heavy-hitter and unigram-LM analyses.

    Scale shape: explode is map-side; the groupBy's partial aggregation
    collapses each task's tokens to its local vocabulary BEFORE the
    shuffle, so the exchange carries one row per (task, distinct token)
    — bounded by vocabulary size, not corpus size. Vocabulary grows
    ~sublinearly (Heaps' law), so this stays cheap at 100 TB while
    per-document structures would not."""
    g = list(group_cols or [])
    exploded = fan_out(docs).select(
        *g, F.explode(tokens(text_col)).alias("token")
    )
    return exploded.groupBy(*g, "token").agg(F.count("*").alias("n"))


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Global top-k tokens by frequency, deterministic tie-break
    (n DESC, token ASC).

    The orderBy+limit compiles to TakeOrderedAndProject: every partition
    keeps its local top-k and the driver merges #partitions * k rows —
    no global sort ever materializes. This exact form is the Spark-first
    heavy-hitter answer; a Misra-Gries/count-min sketch only becomes
    necessary when the VOCABULARY itself cannot flow through one
    shuffle, which for word-like tokens it always can."""
    return (
        token_frequencies(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def heavy_hitters_by(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k tokens per group (same tie-break). The rank window
    partitions by the group column — parallelism = #groups, and each
    window instance only ranks that group's vocabulary."""
    from pyspark.sql import Window

    freq = token_frequencies(docs, text_col, [group_col])
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_docs: int = 3,
    top_n: int = 50,
) -> DataFrame:
    """Frequent verbatim k-token spans across documents — the signal
    behind exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a span repeated
    verbatim in >= ``min_docs`` distinct documents is boilerplate /
    template text to strip or down-weight before training.

    Output: (span, n_docs, n_total) — the ``top_n`` most-shared spans,
    deterministically ordered (n_docs DESC, n_total DESC, span ASC).

    Scale shape: the span explode is map-side; ONE aggregation groups
    occurrences by the span's 64-bit hash, carrying (min(span) example,
    distinct-doc count, total count) — partial aggregation means the
    shuffle moves one row per distinct span per partition, never one
    per occurrence, and the hash group key keeps shuffle rows at 8
    bytes + one example string. The final ordering compiles to
    TakeOrderedAndProject (per-partition top-N merged on the driver) —
    no global sort materializes. A full suffix-array pass (arbitrary-
    length maximal repeats) is the exact-substring endgame; fixed-k
    span mining is its one-scan distributed approximation, exact for
    spans of length k.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    ).filter(F.size("__t") >= F.lit(k))
    idx = F.sequence(F.lit(0), F.size("__t") - F.lit(k))
    spans = toks.select(
        id_col,
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("__t", (i + j + 1).cast("int")) for j in range(k)],
                ),
            )
        ).alias("span"),
    )
    agg = (
        spans.groupBy(F.xxhash64("span").alias("__h"))
        .agg(
            F.min("span").alias("span"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .filter(F.col("n_docs") >= F.lit(min_docs))
    )
    return (
        agg.select("span", "n_docs", "n_total")
        .orderBy(F.col("n_docs").desc(), F.col("n_total").desc(), F.col("span"))
        .limit(top_n)
    )


# -- Document chunking --------------------------------------------------------


def _chunk_starts(n: Column, size: int, overlap: int) -> Column:
    """1-based window start positions for length ``n``: ``1, 1+stride,
    ...`` while ``start <= max(n - overlap, 1)``. Every position is
    covered, the final window may be short, and a document shorter than
    ``size`` yields exactly one chunk."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    return F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )


def char_chunks(
    col: str | Column = "text", size: int = 120, overlap: int = 24
) -> Column:
    """Fixed-size character windows with ``overlap`` chars of overlap —
    ``array<string>``. Pure Catalyst (sequence + transform + substr):
    zero shuffle at any corpus size; chunking a 100 TB corpus is a
    map-only pass inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    starts = _chunk_starts(F.length(c), size, overlap)
    return F.transform(starts, lambda s: c.substr(s, F.lit(size)))


def token_chunks(
    col: str | Column = "text", size: int = 32, overlap: int = 8
) -> Column:
    """Fixed-size token windows (whitespace tokens, re-joined with a
    single space) — the context-window packing shape LLM pipelines
    actually chunk by. Same zero-shuffle posture as char_chunks."""
    t = tokens(col)
    starts = _chunk_starts(F.size(t), size, overlap)
    return F.transform(
        starts, lambda s: F.array_join(F.slice(t, s, size), " ")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 120,
    overlap: int = 24,
    by: str = "chars",
) -> DataFrame:
    """Explode documents into overlapping chunks for embedding /
    retrieval / context-window packing.

    Output: (id_col, chunk_idx, chunk_text, chunk_chars, chunk_tokens),
    chunk_idx 0-based and contiguous per document.

    Scale shape: posexplode of a map-side array — no exchange, no
    window, output partitioning inherits the scan. Downstream embedding
    jobs consume chunks with the same parallelism as the source files.
    """
    if by == "chars":
        arr = char_chunks(text_col, size, overlap)
    elif by == "tokens":
        arr = token_chunks(text_col, size, overlap)
    else:
        raise ValueError(f"by must be 'chars' or 'tokens', got {by!r}")
    out = fan_out(docs).select(
        F.col(id_col), F.posexplode(arr).alias("chunk_idx", "chunk_text")
    )
    return out.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.length("chunk_text").alias("chunk_chars"),
        token_count("chunk_text").alias("chunk_tokens"),
    )


# -- TF-IDF keyword extraction ------------------------------------------------


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> Column | DataFrame:
    """Top-``k`` TF-IDF terms per document (idf = ln(N/df), no
    smoothing — every scored term has df >= 1).

    Output: (id_col, term, tf, tfidf, rank), rank 1..k per document,
    ties broken by term ASC for determinism.

    Scale shape: ONE explode feeds a partially-aggregated (doc, term)
    count; document frequency is a count window PARTITIONED BY term over
    that same tf table — not a separate agg + join, which would
    recompute the tokenize/agg subtree (column pruning makes the two
    subtrees non-identical, so exchange reuse cannot merge them and the
    corpus would scan twice). N arrives as a broadcast 1-row scalar from
    a doc_id-only column-pruned scan, not a driver collect. Total: 3
    hash exchanges of the (doc,term) table (tf agg, term window, doc
    top-k window) + one 1-row broadcast; the corpus text scans ONCE.
    Term skew (stopwords) is count-only work inside the term window;
    AQE handles residual partition imbalance.
    """
    from pyspark.sql import Window

    toks = fan_out(docs).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfw = Window.partitionBy("term")
    n = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(dfw))
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


# -- Inverted index -----------------------------------------------------------


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """Positional inverted index: one row per term with document
    frequency, collection frequency, and the ordered posting list
    rendered as ``"doc:pos,doc:pos,..."`` (0-based positions — string
    form so differential oracles compare exactly).

    Scale shape: posexplode is map-side; ONE aggregation groups by term
    (vocab-sized output, Heaps-bounded). Postings for stopword-grade
    terms are the classic skew hazard — ``max_postings`` truncates each
    list to its first N entries AFTER the deterministic (doc, pos) sort
    while df/cf keep exact full counts; production layouts shard hot
    terms' postings across (term, doc-range) rows instead of one giant
    cell, which is the same groupBy with a composite key.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "term")
    )
    # df derives from the collected list itself, NOT count_distinct —
    # a distinct aggregate would expand into a (term, doc) pre-agg and
    # a SECOND exchange; the list is already in the agg buffer and the
    # distinct pass runs on vocab-sized rows post-shuffle.
    agg = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.sort_array(
            F.collect_list(F.struct(F.col(id_col), F.col("pos")))
        ).alias("__plist"),
    )
    plist = F.col("__plist")
    if max_postings is not None:
        plist = F.slice(plist, 1, max_postings)
    return agg.select(
        "term",
        F.size(
            F.array_distinct(F.transform("__plist", lambda s: s[id_col]))
        ).cast("long").alias("df"),
        "cf",
        F.array_join(
            F.transform(
                plist,
                lambda s: F.concat_ws(":", s[id_col].cast("string"),
                                      s["pos"].cast("string")),
            ),
            ",",
        ).alias("postings"),
    ).select("term", "df", "cf", "postings")


# -- Token entropy ------------------------------------------------------------


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the token distribution —
    the repetitiveness signal (low entropy = template/spam; a uniform
    doc of n distinct tokens scores ln n). One explode + two partial
    aggregations keyed by (doc, token) then doc.

    Output: (id_col, n_tokens, n_distinct, entropy).
    """
    toks = fan_out(docs).select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("c"))
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            (
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c")
            ).alias("__h"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            F.round("__h", 6).alias("entropy"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top-N adjacent-token collocations by pointwise mutual information
    PMI = ln(p(xy) / (p(x) p(y))) with p(xy) over bigram positions and
    p(x) over token positions — the classic phrase-mining signal
    (Church & Hanks 1990). ``min_count`` suppresses the low-frequency
    PMI explosion.

    Scale shape: bigram explode is map-side; one bigram agg + one
    unigram agg (both Heaps-bounded outputs) + two broadcast joins of
    the unigram table onto the bigram table; the final ordering
    compiles to TakeOrderedAndProject. Corpus scans twice (bigrams +
    unigrams) — fusable into one pass via a shared exploded view when
    scan cost dominates.

    Output: (w1, w2, n_pair, pmi) ordered by pmi DESC, w1, w2.
    """
    t = tokens(text_col)
    toks = fan_out(docs).select(F.col(id_col), t.alias("__t")).filter(
        F.size("__t") > 0
    )
    uni = toks.select(F.explode("__t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cw")
    )
    idx = F.sequence(F.lit(1), F.size("__t") - F.lit(1))
    bi = (
        toks.filter(F.size("__t") >= 2)
        .select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("__t", i.cast("int")).alias("w1"),
                        F.element_at("__t", (i + 1).cast("int")).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= F.lit(min_count))
    )
    n_tok = toks.select(F.explode("__t").alias("w")).agg(
        F.count(F.lit(1)).alias("__nt")
    )
    n_bi = bi.agg(F.sum("n_pair"))  # not used; totals from full bigram set
    del n_bi
    n_pairs = (
        toks.filter(F.size("__t") >= 2)
        .agg(F.sum(F.size("__t") - 1).alias("__np"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(n_pairs))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("__np"))
                    / (
                        (F.col("c1") / F.col("__nt"))
                        * (F.col("c2") / F.col("__nt"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(top_n)


def dsir_weights(
    df: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of a TARGET-domain unigram LM
    vs the raw-corpus unigram LM,

        log_ratio(d) = sum_t [ log p_tgt(t) - log p_raw(t) ]

    with add-``smooth`` smoothing over the raw corpus vocabulary (so
    target-OOV tokens get finite mass). ``target`` is a boolean Column
    selecting the target-domain rows of ``df`` itself (the paper's
    setup: target = a small trusted slice, raw = the crawl). Downstream:
    importance-resample with ``sampling.weighted_sample_by`` on
    ``exp(log_ratio)`` or take the top fraction — the weights table is
    the reusable artifact.

    Scale shape: one token explode feeds (a) the raw-vocab count agg
    and (b) the scoring join; the target-vocab agg scans only target
    rows. Both vocab tables are Heaps-bounded (≪ corpus) and
    localCheckpoint'd because each feeds two consumers; scalar totals
    (N_raw, N_tgt, V) ride 1-row broadcasts. The scoring join is
    vocab-keyed — AQE broadcasts the vocab side at real scale — and one
    final per-doc aggregation emits the weights. No windows, no Python.

    Output: (id_col, n_tokens, log_ratio) — log-space only; ``exp``
    overflows float64 for long documents, so consumers exponentiate
    after their own normalization.
    """
    tok = fan_out(df).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    )
    raw = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("c_raw")).localCheckpoint(eager=False)
    )
    tgt = (
        df.filter(target)
        .select(F.explode(tokens(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
        .localCheckpoint(eager=False)
    )
    totals = F.broadcast(
        raw.agg(
            F.sum("c_raw").cast("double").alias("n_raw"),
            F.count(F.lit(1)).cast("double").alias("v"),
        ).crossJoin(tgt.agg(F.sum("c_tgt").cast("double").alias("n_tgt")))
    )
    lr = F.log(
        (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(smooth))
        / (F.col("n_tgt") + F.lit(smooth) * F.col("v"))
    ) - F.log(
        (F.col("c_raw") + F.lit(smooth))
        / (F.col("n_raw") + F.lit(smooth) * F.col("v"))
    )
    return (
        tok.join(raw, "t")
        .join(tgt, "t", "left")
        .crossJoin(totals)
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(lr), 6).alias("log_ratio"),
        )
        .select(F.col("doc").alias(id_col), "n_tokens", "log_ratio")
    )


def source_kl_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    smooth: float = 1.0,
) -> DataFrame:
    """Distribution-drift diagnostic: per-group unigram KL divergence
    against the whole-corpus distribution, both directions, with
    add-``smooth`` smoothing over the corpus vocabulary — the monitor
    that flags a feed whose language suddenly shifts (CCNet-style
    per-shard LM drift, the corpus-level sibling of
    :func:`dsir_weights`' per-document ratio).

    The sum runs over the FULL vocabulary for every group (tokens a
    group never emits still carry smoothed mass), built as vocab x
    groups explicitly: the group list is tens of rows, so the expansion
    is |V| * |groups| — one broadcast of the group totals onto the
    vocab table, one left join of observed (group, token) counts, one
    final per-group aggregation. All counts are exact; no sampling.

    Output: (group_col, n_tokens, kl_group_corpus, kl_corpus_group),
    divergences in nats, rounded to 6.
    """
    tok = fan_out(df).select(
        F.col(group_col).alias("g"), F.explode(tokens(text_col)).alias("t")
    )
    corpus = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("c_all")).localCheckpoint(eager=False)
    )
    per_group = tok.groupBy("g", "t").agg(F.count(F.lit(1)).alias("c_g"))
    totals = F.broadcast(
        tok.groupBy("g")
        .agg(F.sum(F.lit(1)).cast("double").alias("n_g"))
        .crossJoin(
            corpus.agg(
                F.sum("c_all").cast("double").alias("n_all"),
                F.count(F.lit(1)).cast("double").alias("v"),
            )
        )
    )
    p_g = (F.coalesce(F.col("c_g"), F.lit(0)) + F.lit(smooth)) / (
        F.col("n_g") + F.lit(smooth) * F.col("v")
    )
    p_c = (F.col("c_all") + F.lit(smooth)) / (
        F.col("n_all") + F.lit(smooth) * F.col("v")
    )
    return (
        corpus.crossJoin(totals)
        .join(per_group, ["g", "t"], "left")
        .groupBy("g")
        .agg(
            F.max("n_g").cast("long").alias("n_tokens"),
            F.round(F.sum(p_g * F.log(p_g / p_c)), 6).alias(
                "kl_group_corpus"
            ),
            F.round(F.sum(p_c * F.log(p_c / p_g)), 6).alias(
                "kl_corpus_group"
            ),
        )
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            "kl_group_corpus",
            "kl_corpus_group",
        )
    )


def source_js_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    smooth: float = 1.0,
) -> DataFrame:
    """Jensen-Shannon divergence of each group's unigram distribution
    vs the whole corpus — the SYMMETRIC, BOUNDED companion to
    :func:`source_kl_divergence`: KL is unbounded and asymmetric (fine
    for ranking feeds, awkward for alerting thresholds); JSD lives in
    [0, ln 2] so a monitor can carry one fixed threshold across feeds
    of any size. JSD(p,q) = ½·KL(p‖m) + ½·KL(q‖m) with m = (p+q)/2,
    over the same add-``smooth`` smoothed full-vocabulary expansion as
    the KL operator (vocab × groups, groups are tens).

    Output: (group_col, n_tokens, jsd_nats, jsd_norm) where jsd_norm
    = jsd/ln 2 ∈ [0, 1], rounded to 6.
    """
    tok = fan_out(df).select(
        F.col(group_col).alias("g"), F.explode(tokens(text_col)).alias("t")
    )
    corpus = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("c_all")).localCheckpoint(eager=False)
    )
    per_group = tok.groupBy("g", "t").agg(F.count(F.lit(1)).alias("c_g"))
    totals = F.broadcast(
        tok.groupBy("g")
        .agg(F.sum(F.lit(1)).cast("double").alias("n_g"))
        .crossJoin(
            corpus.agg(
                F.sum("c_all").cast("double").alias("n_all"),
                F.count(F.lit(1)).cast("double").alias("v"),
            )
        )
    )
    p_g = (F.coalesce(F.col("c_g"), F.lit(0)) + F.lit(smooth)) / (
        F.col("n_g") + F.lit(smooth) * F.col("v")
    )
    p_c = (F.col("c_all") + F.lit(smooth)) / (
        F.col("n_all") + F.lit(smooth) * F.col("v")
    )
    m = (p_g + p_c) / 2
    # determinism (round 9, the a_ks_test pattern extended to ln-terms):
    # the JS sum runs over the whole vocabulary, and round(float_sum, 6)
    # of a many-term distributed double sum can flip on half-boundaries
    # with partial-merge order. Quantize each per-token term to exact
    # 1e-12 micro-units (BIGINT) and sum INTEGERS — order-invariant;
    # one divide at the end. Per-term quantization bias is < vocab/2
    # micro-units, i.e. < 5e-7 nats at a 1M-token vocabulary — below
    # the 6-decimal output granularity.
    term = F.lit(0.5) * p_g * F.log(p_g / m) + F.lit(0.5) * p_c * F.log(p_c / m)
    jsd_q = F.sum(F.floor(term * F.lit(1e12) + F.lit(0.5)).cast("long"))
    jsd = jsd_q / F.lit(1e12)
    return (
        corpus.crossJoin(totals)
        .join(per_group, ["g", "t"], "left")
        .groupBy("g")
        .agg(
            F.max("n_g").cast("long").alias("n_tokens"),
            F.round(jsd, 6).alias("jsd_nats"),
            F.round(jsd / F.log(F.lit(2.0)), 6).alias("jsd_norm"),
        )
        .select(F.col("g").alias(group_col), "n_tokens", "jsd_nats", "jsd_norm")
    )


def mixed_lang_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 40,
) -> DataFrame:
    """Code-switching / mixed-language detection: language-ID each
    non-overlapping ``chunk_size``-token window independently, then
    profile the per-document vote — chunk count, distinct predicted
    languages, majority language (ties: higher count, then
    lexicographic — 'und' loses to any real language at equal votes),
    and agreement (majority share). The doc-level lang label lies for
    code-switched documents; corpus filters (FineWeb-style "keep docs
    that are consistently language X") need this chunk-level variance.

    Scale shape: chunking + per-chunk stopword voting are pure
    map-side expressions (the chunk explode is the only row growth,
    bounded by tokens/chunk_size); ONE (id, pred) count agg; the
    majority window and final agg run per doc over <= #languages rows
    and reuse the id partitioning.

    Output: (id, n_chunks, n_langs, majority_lang, agreement).
    """
    from pyspark.sql import Window

    chunks = fan_out(docs).select(
        F.col(id_col),
        F.explode(token_chunks(text_col, chunk_size, 0)).alias("__ct"),
    )
    scored = chunks.select(id_col, predict_lang("__ct").alias("__pred"))
    counts = scored.groupBy(id_col, "__pred").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__c").desc(), F.col("__pred").asc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    mc = F.max(F.when(F.col("__rn") == 1, F.col("__c")))
    return ranked.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max(F.when(F.col("__rn") == 1, F.col("__pred"))).alias(
            "majority_lang"
        ),
        F.round(mc / F.sum("__c"), 6).alias("agreement"),
    )


def compressibility(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the parameter-free
    redundancy score modern curation stacks use beside the heuristic
    rules (highly compressible text = templated/repetitive/machine-
    generated; incompressible = already-encoded junk or high-entropy
    noise; natural prose sits in a band). DEFLATE at a fixed level is
    bit-deterministic for fixed input, so the ratio is reproducible
    across runs/engines — but no SQL engine exposes zlib, hence
    rows-only evidence with closed-form property tests. Runs as one
    Arrow mapInPandas pass (zlib releases the GIL; the C codec IS the
    vectorized path here) — zero exchanges, scan-bound at 100 TB.
    Output: (id, n_bytes, n_compressed, ratio = compressed/raw)."""
    import pandas as pd
    import zlib

    id_type = dict(df.dtypes)[id_col]
    src = fan_out(df).select(F.col(id_col), F.col(text_col).alias("__t"))

    def run(batches):
        for pdf in batches:
            raw = pdf["__t"].fillna("").str.encode("utf-8")
            nb = raw.str.len().astype("int64")
            nc = raw.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": nb.values,
                    "n_compressed": nc.values,
                    "ratio": (
                        nc.values / np_maximum_one(nb.values)
                    ).round(6),
                }
            )

    return src.mapInPandas(
        run,
        schema=f"{id_col} {id_type}, n_bytes long, n_compressed long, "
        "ratio double",
    )


def np_maximum_one(arr):
    """max(arr, 1) elementwise — div-by-zero guard for empty docs."""
    import numpy as np

    return np.maximum(arr, 1)


# --- encoding repair (round 12) ----------------------------------------

# Double-encoded UTF-8 signature: a UTF-8 lead byte misread as latin-1
# yields one of these chars followed by continuation garbage. The three
# cover the Latin-1 Supplement (0xC3 'Ã'), NBSP/symbol (0xC2 'Â') and
# General Punctuation (0xE2 0x80 -> 'â' + C1) planes — the digraphs
# every practical mojibake detector (ftfy's core heuristic) keys on.
MOJIBAKE_SIGNATURE = "Ã|Â|â€"


def mojibake_flag(col: str | Column = "text") -> Column:
    """True when the text carries the double-encoded-UTF-8 signature."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(MOJIBAKE_SIGNATURE)


def fix_double_utf8(col: str | Column = "text") -> Column:
    """Repair double-encoded UTF-8 (the single most common CommonCrawl
    encoding defect: bytes that were UTF-8 got decoded as latin-1 and
    re-encoded, turning 'café' into 'cafÃ©').

    The repair is the exact inverse round trip — re-encode as
    ISO-8859-1 (a bijection char<->byte, so lossless) and decode as
    UTF-8 — entirely JVM-side (``encode``/``decode``, whole-stage
    codegen, no UDF). Applied CONDITIONALLY on the signature: clean
    text with real non-latin-1 characters must never take the repair
    branch (ISO-8859-1 re-encoding would '?'-substitute anything above
    U+00FF — lossy), pinned in tests."""
    c = F.col(col) if isinstance(col, str) else col
    repaired = F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")
    return F.when(mojibake_flag(c), repaired).otherwise(c)
