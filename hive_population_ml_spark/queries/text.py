"""Text-analysis queries over ``documents`` — SURVEY.md §2.10.

All expressions are Catalyst-side (split/filter/transform/aggregate
lambdas); DuckDB mirrors them with list_* functions. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators import textops
from .registry import register


@register(
    "text_stats",
    oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(textops.token_count("text")), 6).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_quality_profile",
    oracle="""
WITH toks AS (
    SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       length(text) AS n_chars_computed,
       round(list_sum(list_transform(t, x -> length(x))) * 1.0
             / NULLIF(len(t), 0), 6) AS avg_token_len,
       round(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0
             / NULLIF(len(t), 0), 6) AS en_stopword_ratio,
       round(least(len(t) / 50.0, 1.0)
             * (1.0 - least((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                            * 1.0 / NULLIF(length(text), 0) * 5.0, 1.0)), 6) AS quality,
       md5(array_to_string(t[1:8], ' ')) AS fp
FROM toks
""",
)
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        textops.token_count("text").alias("n_tokens"),
        textops.char_count("text").alias("n_chars_computed"),
        F.round(textops.avg_token_len("text"), 6).alias("avg_token_len"),
        F.round(textops.stopword_ratio("en", "text"), 6).alias("en_stopword_ratio"),
        textops.quality_score("text").alias("quality"),
        textops.fingerprint("text").alias("fp"),
    )


@register(
    "text_lang_id",
    oracle="""
WITH scored AS (
    SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the','a','of','and','to','in','is','it'))) AS s_en,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('der','die','das','und','ist','ein','zu','mit'))) AS s_de,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('le','la','les','et','est','un','une','dans'))) AS s_fr,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('el','la','los','y','es','un','una','en'))) AS s_es
    FROM documents
)
SELECT pred_lang, count(*) AS n_docs,
       CAST(sum(CAST(pred_lang = lang AS INT)) AS BIGINT) AS n_agree_stored
FROM (
    SELECT lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM scored
)
GROUP BY pred_lang
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", "lang", textops.predict_lang("text").alias("pred_lang")
    )
    return docs.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("pred_lang") == F.col("lang")).cast("int")).alias(
            "n_agree_stored"
        ),
    )


@register(
    "multimodal_bytes",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(n_chars AS BIGINT) AS n_chars_meta
FROM documents
""",
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing smoke: text re-encoded as an opaque binary
    payload (stand-in for image/audio bytes), metadata projected. The
    real decode plumbing lives in operators/multimodal.py."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        F.col("n_chars").alias("n_chars_meta"),
    )


@register("multimodal_wav_features")  # rows-only: binary decode, not SQL
def multimodal_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (stdlib ``wave``) audio decode over binary media columns:
    synthesize a deterministic WAV payload per document, then run the
    production feature extractor with ``decode_stub=False`` — duration /
    RMS / peak / zero-crossing computed from actual PCM samples
    (operators/codecs.py). Rows-only by nature (DuckDB has no WAV
    decoder); value correctness is pinned by tests/test_operators.py
    against analytically-known sine-wave RMS."""
    from ..operators import multimodal

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_wav(docs, "doc_id")
    feats = multimodal.extract_features(media, dim=8, decode_stub=False)
    return feats.select(
        "id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("feat", 1), 6).alias("duration_s"),
        F.round(F.element_at("feat", 2), 6).alias("rms"),
        F.round(F.element_at("feat", 3), 6).alias("peak"),
        F.round(F.element_at("feat", 4), 6).alias("zcr"),
    )


@register("multimodal_jpeg_features")  # rows-only: binary decode, not SQL
def multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode over binary media columns (VERDICT r8
    #3): synthesize a deterministic compressed JPEG payload per document
    (operators/codecs.py encode_jpeg — huffman + DCT + quality-scaled
    quantization), then run the production feature extractor with
    ``decode_stub=False`` so width/height/channel means come from actual
    huffman-decoded, IDCT-reconstructed pixels. Rows-only by nature
    (DuckDB has no JPEG decoder); pixel correctness is pinned by
    tests/test_operators.py (round-trip RMSE bounds, a closed-form
    DC-only fixture hand-authored as raw marker bytes, and a 4:2:0
    upsampling check). Reference parity: the reference treats media as
    opaque paths (src/data/dataset.py) — decode here is the Spark-side
    generalization."""
    from ..operators import multimodal

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_image(docs, "doc_id", codec="jpeg")
    feats = multimodal.extract_features(media, dim=8, decode_stub=False)
    return feats.select(
        "id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("feat", 1), 6).alias("width"),
        F.round(F.element_at("feat", 2), 6).alias("height"),
        F.round(F.element_at("feat", 3), 6).alias("mean_r"),
        F.round(F.element_at("feat", 4), 6).alias("mean_g"),
        F.round(F.element_at("feat", 5), 6).alias("mean_b"),
        F.round(F.element_at("feat", 6), 6).alias("std_gray"),
    )


@register("multimodal_image_quality")  # rows-only: pixel metrics, not SQL
def multimodal_image_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image quality screen (round 9) over REAL decoded JPEG pixels:
    brightness / RMS contrast / Laplacian-variance sharpness / 8-bin
    intensity entropy per image — the pre-training gate an image corpus
    runs before expensive scoring (the image twin of
    text_quality_profile). Monotonicity pins in tests: blurring an
    image strictly drops sharpness; flat fills score ~0 entropy."""
    from ..operators import multimodal

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_image(
        docs, "doc_id", width=64, height=48, pattern_mod=25
    )
    q = multimodal.image_quality(media)
    return q.select(
        "id",
        "media_type",
        "width",
        "height",
        F.round("brightness", 6).alias("brightness"),
        F.round("contrast", 6).alias("contrast"),
        F.round("sharpness", 8).alias("sharpness"),
        F.round("entropy8", 6).alias("entropy8"),
    )


@register("dedup_video_phash")  # rows-only: perceptual hash, not SQL
def dedup_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual video dedup (round 10): per-sampled-frame DCT pHash
    through the SAME Manku banding as text SimHash / image pHash /
    audio fingerprint, rolled up to video level by SAME-SLOT frame
    agreement — videos pair when >= 3 of 4 sampled frame slots match at
    d<=6. Per-frame comparisons inherit the measured image-pHash
    margins (a single majority-vote 64-bit video hash was prototyped
    and NOT kept: measured intra 8-11 vs inter 14 on panning fixtures —
    too thin for an honest margin test; the per-frame form keeps every
    comparison inside the proven envelope). Temporal alignment is
    assumed (same container cut) — the re-encode/transcode dedup case;
    shifted cuts are out of scope, as crops are for image pHash.
    Fixture: 96 docs share 12 seeded panning videos, repeats encoded at
    cycling MJPEG quality (75/90) so bytes differ while pixels stay
    visually identical; the rollup must pair exactly the same-pattern
    videos (pinned in tests). Scale: decode+hash is a zero-shuffle
    Arrow mapInPandas pass bounded by n_frames per video; banding is
    the audited SimHash shape; the rollup adds one (video_a, video_b)
    partial agg."""
    from ..operators import multimodal
    from ..operators.dedup import fingerprint_pairs

    n_frames = 4
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 96)
    media = multimodal.synthesize_video(
        docs, "doc_id", width=64, height=48, pattern_mod=12,
        quality_cycle=(75, 90),
    )
    fp = multimodal.video_phash_frames(media, n_frames=n_frames).select(
        (F.col("id") * n_frames + F.col("frame_idx")).alias("doc"),
        F.col("phash").alias("simhash"),
    )
    pairs = fingerprint_pairs(fp, max_hamming=6)
    # decompose (video, slot); keep same-slot cross-video matches and
    # roll up to video pairs by slot-agreement count
    return (
        pairs.select(
            (F.col("d1") / n_frames).cast("bigint").alias("v1"),
            (F.col("d1") % n_frames).alias("f1"),
            (F.col("d2") / n_frames).cast("bigint").alias("v2"),
            (F.col("d2") % n_frames).alias("f2"),
        )
        .filter((F.col("v1") < F.col("v2")) & (F.col("f1") == F.col("f2")))
        .groupBy("v1", "v2")
        .agg(F.count_distinct("f1").cast("bigint").alias("n_slots"))
        .filter(F.col("n_slots") >= 3)
        .orderBy("v1", "v2")
    )


@register("dedup_audio_fingerprint")  # rows-only: spectral hash, not SQL
def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup (round 10, VERDICT r9 #3): 64-bit
    spectral band-dominance fingerprint over REAL decoded PCM
    (codecs.audio_fingerprint64 — 8 time slices x 8 bands, bit = band
    above the uniform energy share), paired through the SAME Manku
    block-combination machinery as text SimHash / image pHash
    (dedup.fingerprint_pairs). The r9 Haitsma-Kalker attempt measured
    noise-dominated time-delta bits (35/64 intra) and was not shipped;
    keeping the bits in the spectrum domain fixes that: measured intra
    0 / inter >= 18 on the fixture class under gain, SNR-12/20 noise,
    3x clip distortion, DC offset and requantization (margins + exact
    pair set pinned in tests/test_operators.py). Fixture: 96 docs share
    12 seeded melodies, each repeat transformed by a cycling
    same-content variant so payload BYTES differ — exact dedup finds
    nothing, the fingerprint at d<=6 must pair exactly the same-melody
    docs. The fixture containers also cycle through IEEE-float, G.711
    μ-law/A-law and IMA ADPCM WAV (round 10), so this query runs every
    compressed audio decode path in codecs.py end-to-end (measured:
    intra stays 0, inter >= 22 across the container mix). Scale:
    decode+hash is a zero-shuffle Arrow mapInPandas pass; banding is
    the audited SimHash shape."""
    from ..operators import multimodal
    from ..operators.dedup import fingerprint_pairs

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 96)
    media = multimodal.synthesize_audio_melody(docs, "doc_id", pattern_mod=12)
    fp = multimodal.audio_fingerprint_media(media).select(
        F.col("id").alias("doc"), F.col("afp").alias("simhash")
    )
    return fingerprint_pairs(fp, max_hamming=6).orderBy("d1", "d2")


@register("multimodal_video_frames")  # rows-only: video decode, not SQL
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode over binary media columns (VERDICT r9 #1):
    synthesize a deterministic MJPEG-in-AVI payload per document
    (codecs.encode_avi_mjpeg — RIFF container over real huffman+DCT
    JPEG frames), walk the container index, sample 4 evenly-spaced
    frames, huffman+IDCT-decode each, and emit per-frame gray mean/std
    plus inter-frame motion (operators/multimodal.py::
    video_frame_stats). Rows-only by nature (DuckDB has no video
    decoder); container+frame correctness is pinned by
    tests/test_operators.py (hand-authored raw-byte AVI fixture,
    per-frame byte parity with encode_jpeg, DHT-less MJPEG splice
    parity). Scale: frame selection happens on the container index
    BEFORE pixel decode, so cost is n_sampled JPEG decodes per video in
    a zero-shuffle Arrow mapInPandas pass — libav/ffmpeg plugs in at
    the same dispatch with no plan change. Reference parity: the
    reference treats media as opaque paths (src/data/dataset.py)."""
    from ..operators import multimodal

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 120)
    # round 11: rows cycle across every REAL AVI frame codec — MJPEG
    # (huffman+DCT), uncompressed DIB, planar 4:2:0 I420/YV12 and
    # packed 4:2:2 UYVY (BT.601) — one query exercises the full
    # container-decode dispatch in-Spark
    media = multimodal.synthesize_video(
        docs, "doc_id", n_frames=8,
        container_cycle=("mjpeg", "dib", "i420", "yv12", "uyvy"),
    )
    stats = multimodal.video_frame_stats(media, n_frames=4)
    return stats.select(
        "id",
        "frame_idx",
        F.round("gray_mean", 6).alias("gray_mean"),
        F.round("gray_std", 6).alias("gray_std"),
        F.round("motion", 6).alias("motion"),
    )


@register("text_exact_dup_spans")  # rows-only: exact twin of the
# fingerprint miner; kept rows-only with it (same family contract)
def text_exact_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT fixed-length repeated substrings (round 10,
    operators/suffixes.py::duplicated_spans): the collision-free twin
    of the hash-based dup-span miner — every 16-char span occurring
    >= 3 times, counted by literal string equality. The honest plan
    for FIXED span length is a direct L-gram group-by (one
    partial-aggregated shuffle of L-byte keys); the suffix machinery
    (see text_longest_repeat) is reserved for the query shape that
    needs it. Verified against brute-force substring counting in
    tests/test_suffixes.py."""
    from ..operators.suffixes import duplicated_spans

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text").filter(
        F.col("doc_id") < 150
    )
    return duplicated_spans(docs, "doc_id", "text", min_len=16, min_count=3)


@register("text_longest_repeat")  # rows-only: iterative prefix
# doubling (O(log L) re-rank rounds) — not expressible as one SQL query
def text_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest substrings repeated anywhere in the corpus via
    DISTRIBUTED SUFFIX RANKING (round 10, operators/suffixes.py):
    Manber-Myers prefix doubling as O(log L) rounds of pos+k equi-join
    + range-partitioned two-level dense rank (global_dense_rank — no
    single-task global sort, no whale windows), then the classic
    longest-repeat = max-LCP-of-adjacent-suffixes reduction: a grank+1
    self-join pairs order-adjacent suffixes and each LCP is computed
    exactly on substrings bounded by the doubling's terminal prefix
    (convergence at prefix P proves every LCP < P). Per-document
    sentinels keep repeats inside documents. This is the query shape
    that genuinely needs suffix order — a fixed-L group-by cannot
    search over L, and re-scanning with doubled L-byte keys would
    shuffle O(L) bytes/position per round where doubling shuffles
    constant-width rank pairs. Parity: python suffix-array reference +
    brute-force longest-repeat in tests/test_suffixes.py. Top-20 by
    length over the first 60 documents (the doubling depth is set by
    the longest REPEAT, not document length)."""
    from ..operators.suffixes import longest_repeated_span

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text").filter(
        F.col("doc_id") < 60
    )
    return longest_repeated_span(docs, "doc_id", "text", top_k=20)


@register("multimodal_gif_animation")  # rows-only: LZW decode, not SQL
def multimodal_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF decode over binary media columns (round 10):
    synthesize a deterministic LZW-compressed animation per document
    (codecs.encode_gif — palette art panning 2 px/frame, GIF's exact
    domain), sample 4 evenly-spaced frames off the frame list,
    LZW-decode each, and emit per-frame gray mean/std plus inter-frame
    motion through the SAME media-type-dispatched
    multimodal.video_frame_stats as MJPEG-AVI. Rows-only by nature
    (DuckDB has no GIF decoder); LZW correctness is pinned by
    tests/test_gif.py (hand bit vector, width-growth/dict-overflow
    stress, interlace, byte-exact round trips). Scale: bounded
    n_frames decode per doc in a zero-shuffle Arrow mapInPandas pass —
    the third compression family (LZW) behind the same dispatch as the
    DCT/huffman and deflate decoders."""
    from ..operators import multimodal

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 120)
    media = multimodal.synthesize_gif_animation(docs, "doc_id", n_frames=8)
    stats = multimodal.video_frame_stats(media, n_frames=4)
    return stats.select(
        "id",
        "frame_idx",
        F.round("gray_mean", 6).alias("gray_mean"),
        F.round("gray_std", 6).alias("gray_std"),
        F.round("motion", 6).alias("motion"),
    )


@register("dedup_image_phash")  # rows-only: perceptual hash, not SQL
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (round 9): DCT pHash over REAL decoded
    JPEG pixels, paired by Hamming distance through the SAME Manku
    block-combination machinery as text SimHash
    (dedup.fingerprint_pairs) — the multimodal pipeline's "same image,
    different bytes" detector (re-encodes, quality changes). Fixture:
    192 docs share 24 seeded random-field images, each repeat
    JPEG-encoded at a cycling quality (75/90) so payload BYTES differ
    while pixels stay visually identical — exact/byte dedup finds
    nothing, pHash at d<=6 must pair exactly the same-pattern docs
    (measured margins: intra <=6, inter >=16; pinned in
    tests/test_operators.py). Scale: decode+hash is a zero-shuffle
    Arrow mapInPandas pass; banding is the audited SimHash shape."""
    from ..operators import multimodal
    from ..operators.dedup import fingerprint_pairs

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 192)
    media = multimodal.synthesize_image(
        docs, "doc_id", width=64, height=48,
        pattern_mod=24, quality_cycle=(75, 90),
    )
    fp = multimodal.phash_media(media).select(
        F.col("id").alias("doc"), F.col("phash").alias("simhash")
    )
    return fingerprint_pairs(fp, max_hamming=6).orderBy("d1", "d2")


@register(
    "text_fingerprint_groups",
    oracle="""
WITH fp AS (
    SELECT doc_id,
           md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
               AS fp
    FROM documents
)
SELECT fp, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM fp
GROUP BY fp
HAVING count(*) > 1
""",
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (rolling-hash analog): md5 over the first
    8 tokens groups docs sharing a head — the cheap first-pass near-dup
    blocker that runs before shingle/MinHash passes at scale."""
    t = Tables(spark, sf_dir)
    fp = t.documents.select("doc_id", textops.fingerprint("text", 8).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "text_token_counts",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
           AS n_bpe_tokens
FROM documents
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (charter §2.10): whitespace tokens and
    BPE-ish regex pretokens (letters/digits/punct split, space glued to
    the next word) — the cheap LLM-token-count estimator."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        textops.token_count("text").alias("n_ws_tokens"),
        textops.bpe_token_count("text").alias("n_bpe_tokens"),
    )


@register(
    "corpus_clean_pipeline",
    oracle="""
WITH scored AS (
    SELECT doc_id, text, lang, source,
           string_split(text, ' ') AS t,
           round(least(len(string_split(text, ' ')) / 50.0, 1.0)
                 * (1.0 - least((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                                * 1.0 / NULLIF(length(text), 0) * 5.0, 1.0)), 6) AS quality
    FROM documents
),
gated AS (
    SELECT * FROM scored WHERE quality >= 0.5 AND lang = 'en'
),
dedup AS (
    SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM gated GROUP BY md5(text)
)
SELECT count(*) AS n_docs_kept,
       CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dupes_dropped,
       round(avg(g.quality), 6) AS avg_quality,
       round(avg(len(g.t)), 6) AS avg_tokens
FROM dedup d JOIN gated g ON g.doc_id = d.keep_id
""",
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical training-corpus cleaning pass as ONE lazy DAG:
    quality-score gate -> language filter -> exact dedup keeping the
    lowest doc_id -> corpus summary. At 100 TB each stage is the same
    plan: the gates are map-side filters feeding a single hash shuffle
    on the content hash; the survivors' self-join is on the tiny
    canonical-id set (AQE broadcasts it)."""
    t = Tables(spark, sf_dir)
    gated = t.documents.select(
        "doc_id",
        "text",
        "lang",
        textops.quality_score("text").alias("quality"),
        textops.token_count("text").alias("n_tokens"),
    ).filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
    dedup = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )
    kept = dedup.join(gated, F.col("keep_id") == F.col("doc_id"))
    return kept.agg(
        F.count("*").alias("n_docs_kept"),
        (F.sum("n_copies") - F.count("*")).alias("n_dupes_dropped"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )


@register(
    "text_repetition_filter",
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, chr(10)) AS lines,
           string_split(text, ' ') AS t
    FROM documents
),
grams AS (
    SELECT doc_id,
           list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) AS g
    FROM toks
),
wmode AS (
    SELECT doc_id, max(c) AS top_word FROM (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        GROUP BY doc_id, w
    ) GROUP BY doc_id
),
gmode AS (
    SELECT doc_id, max(c) AS top_gram FROM (
        SELECT doc_id, gg, count(*) AS c
        FROM (SELECT doc_id, unnest(g) AS gg FROM grams)
        GROUP BY doc_id, gg
    ) GROUP BY doc_id
)
SELECT toks.doc_id,
       len(lines) AS n_lines,
       len(t) AS n_words,
       round(1.0 - len(list_distinct(lines)) * 1.0 / NULLIF(len(lines), 0), 6)
           AS dup_line_frac,
       round(1.0 - len(list_distinct(t)) * 1.0 / NULLIF(len(t), 0), 6)
           AS dup_word_frac,
       round(wmode.top_word * 1.0 / NULLIF(len(t), 0), 6) AS top_word_frac,
       round(gmode.top_gram * 1.0 / NULLIF(len(grams.g), 0), 6) AS top_2gram_frac,
       CAST(coalesce(1.0 - len(list_distinct(lines)) * 1.0 / NULLIF(len(lines), 0), 0) <= 0.30
            AND coalesce(wmode.top_word * 1.0 / NULLIF(len(t), 0), 0) <= 0.20
            AND coalesce(gmode.top_gram * 1.0 / NULLIF(len(grams.g), 0), 0) <= 0.18
            AS INT) AS keep_repetition
FROM toks
JOIN grams USING (doc_id)
LEFT JOIN wmode USING (doc_id)
LEFT JOIN gmode USING (doc_id)
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate (operators/textops.py::
    repetition_profile). The Spark plan computes per-document token and
    bigram modes as sorted-run-length ``aggregate`` lambdas — zero
    shuffles for the whole profile; the oracle has to explode + 2-level
    group to say the same thing."""
    t = Tables(spark, sf_dir)
    return textops.repetition_profile(t.documents, "doc_id", "text")


@register(
    "text_decontaminate",
    oracle="""
WITH bench AS (
    SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 17 = 0
),
bs AS (
    SELECT DISTINCT unnest(list_transform(range(len(t) - 2),
        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
    FROM bench
),
train AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 17 <> 0
),
ds AS (
    SELECT DISTINCT doc_id, unnest(list_transform(range(len(t) - 2),
        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
    FROM train
),
ov AS (
    SELECT ds.doc_id, count(*) AS n_overlap
    FROM ds JOIN bs USING (s)
    GROUP BY ds.doc_id
)
SELECT train.doc_id,
       coalesce(ov.n_overlap, 0) AS n_overlap,
       CAST(coalesce(ov.n_overlap, 0) >= 1 AS INT) AS contaminated
FROM train LEFT JOIN ov USING (doc_id)
""",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/textops.py::decontaminate):
    docs with doc_id % 17 == 0 stand in as the held-out benchmark; the
    rest are the training corpus scanned for 3-gram overlap. Benchmark
    shingle hashes broadcast; the corpus side never shuffles shingles."""
    t = Tables(spark, sf_dir)
    bench = t.documents.filter(F.col("doc_id") % 17 == 0)
    train = t.documents.filter(F.col("doc_id") % 17 != 0)
    return textops.decontaminate(train, bench, "doc_id", "text", k=3)


@register(
    "text_heavy_hitters",
    shadow_oracle="""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
""",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 corpus tokens (textops.heavy_hitters): vocabulary-
    bounded partial agg + TakeOrderedAndProject — per-partition local
    top-k, merge of #partitions*k rows, no global sort."""
    t = Tables(spark, sf_dir)
    return textops.heavy_hitters(t.documents, "text", k=20)


@register(
    "text_heavy_hitters_lang",
    shadow_oracle="""
SELECT lang, token, n, rank FROM (
    SELECT lang, token, n,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, token ASC) AS rank
    FROM (
        SELECT lang, token, count(*) AS n
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
              FROM documents) t
        GROUP BY lang, token
    )
) WHERE rank <= 5
""",
)
def text_heavy_hitters_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tokens per language (textops.heavy_hitters_by): the rank
    window partitions by lang, so each instance ranks one language's
    vocabulary — parallelism = #languages, never a global sort."""
    t = Tables(spark, sf_dir)
    out = textops.heavy_hitters_by(t.documents, "lang", "text", k=5)
    return out.select("lang", "token", "n", F.col("rank").cast("long"))


@register("text_decontaminate_bloom")
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-path decontamination (textops.bloom_decontaminate): the
    benchmark compresses to a FIXED-SIZE Bloom bitset (2^20 bits here)
    instead of a per-shingle broadcast, and the corpus branch becomes a
    pure map — zero corpus-side exchanges. Rows-only check (xxhash64
    bit positions have no DuckDB twin); the no-false-negative superset
    property vs the exact path is pytest-pinned
    (test_bloom_decontaminate_superset_of_exact)."""
    t = Tables(spark, sf_dir)
    bench = t.documents.filter(F.col("doc_id") % 17 == 0)
    train = t.documents.filter(F.col("doc_id") % 17 != 0)
    return textops.bloom_decontaminate(
        train, bench, "doc_id", "text", k=3, m_bits=1 << 20
    )


@register(
    "text_token_contamination",
    shadow_oracle="""
WITH bench AS (
    SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 17 = 0
),
bs AS (
    SELECT DISTINCT unnest(list_transform(range(len(t) - 2),
        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
    FROM bench
),
train AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 17 <> 0
),
wins AS (
    SELECT doc_id, unnest(list_transform(range(len(t) - 2),
        i -> {'p': i, 's': t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]})) AS w
    FROM train
),
hit AS (
    SELECT doc_id, unnest(range(w.p, w.p + 3)) AS cp
    FROM wins JOIN bs ON w.s = bs.s
),
cont AS (SELECT doc_id, count(DISTINCT cp) AS nc FROM hit GROUP BY doc_id)
SELECT t.doc_id,
       len(t.t) AS n_tokens,
       coalesce(c.nc, 0) AS n_contaminated,
       round(coalesce(c.nc, 0) * 1.0 / len(t.t), 6) AS contaminated_frac,
       CAST(coalesce(c.nc, 0) * 1.0 / len(t.t) >= 0.2 AS INT) AS dirty
FROM train t LEFT JOIN cont c USING (doc_id)
""",
)
def text_token_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-POSITION-level contamination fraction (textops.
    token_contamination — the Llama-2 appendix-A.6 contract, vs
    text_decontaminate's doc-level overlap count): a token is dirty if
    any 3-gram window covering it appears in the benchmark (doc_id%17
    holdout, as in text_decontaminate); the fraction feeds a keep/drop
    cut or a quality feature. dirty_frac=0.2 flags ~24% of sf0.01 train
    docs — a real decision boundary, not a degenerate all-zeros column.
    Benchmark hashes broadcast; the one corpus shuffle carries matched
    (doc, position) pairs only."""
    t = Tables(spark, sf_dir)
    bench = t.documents.filter(F.col("doc_id") % 17 == 0)
    train = t.documents.filter(F.col("doc_id") % 17 != 0)
    return textops.token_contamination(
        train, bench, "doc_id", "text", k=3, dirty_frac=0.2
    )


@register(
    "text_remove_dup_spans",
    shadow_oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
    SELECT doc_id, u.p AS p, u.s AS s
    FROM (SELECT doc_id, unnest(list_transform(range(len(t) - 4),
              i -> {'p': i, 's': t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                          || ' ' || t[i+4] || ' ' || t[i+5]})) AS u
          FROM toks WHERE len(t) >= 5)
),
ranked AS (
    SELECT doc_id, p, count(*) OVER (PARTITION BY s) AS c,
           row_number() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
    FROM occ
),
rm AS (
    SELECT DISTINCT doc_id, unnest(range(p, p + 5)) AS rp
    FROM ranked WHERE c >= 2 AND rn > 1
),
tokpos AS (
    SELECT doc_id, u.p AS p, u.tok AS tok
    FROM (SELECT doc_id, unnest(list_transform(range(len(t)),
              i -> {'p': i, 'tok': t[i+1]})) AS u FROM toks)
),
kept AS (
    SELECT tp.doc_id, tp.p, tp.tok
    FROM tokpos tp LEFT JOIN rm ON rm.doc_id = tp.doc_id AND rm.rp = tp.p
    WHERE rm.doc_id IS NULL
),
agg AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
    FROM kept GROUP BY doc_id
),
rmc AS (SELECT doc_id, count(*) AS n_removed FROM rm GROUP BY doc_id)
SELECT t.doc_id, len(t.t) AS n_tokens,
       coalesce(rmc.n_removed, 0) AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM toks t LEFT JOIN rmc USING (doc_id) LEFT JOIN agg USING (doc_id)
""",
)
def text_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup REMOVAL (textops.remove_repeated_spans —
    the acting half of Lee et al. 2022 ExactSubstr; text_dup_spans is
    the mining half): every corpus-wide occurrence of a repeated
    5-token span is excised except the canonical first (min (doc_id,
    pos)), texts rebuilt from surviving tokens. Fully differential
    INCLUDING the rebuilt clean_text strings — the oracle recomputes
    keeper choice, overlap-union and reconstruction from scratch via
    window functions. ~1.5k tokens excised at sf0.001, so the diff
    exercises real removals, keeper retention, and self-repetition."""
    t = Tables(spark, sf_dir)
    return textops.remove_repeated_spans(
        t.documents, "doc_id", "text", k=5, min_occurrences=2
    )


# Trained-merge memo, keyed (sf_dir, corpus fingerprint) like the ANN
# index and quality-model memos: training is the offline step; both BPE
# queries replay the same table.
_BPE_MERGES: dict = {}


def _trained_merges(t: "Tables", sf_dir: str):
    from ..operators.bpe import train_bpe

    fp = t.documents.agg(
        F.count("doc_id").alias("n"), F.max("doc_id").alias("mx")
    ).first()
    key = (sf_dir, int(fp["n"]), int(fp["mx"]) if fp["mx"] is not None else -1)
    if key not in _BPE_MERGES:
        _BPE_MERGES[key] = train_bpe(t.documents, n_merges=30)
    return _BPE_MERGES[key]


@register("text_bpe_merges")
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training over the corpus (operators/bpe.py): one
    distributed word-count pass (the only corpus-sized stage), then 30
    merge iterations over the bounded vocabulary — driver loop below
    the vocab threshold, per-iteration pair aggregation above it, with
    a test-pinned identical merge sequence. Rows-only (iterative, not
    SQL-expressible); the Sennrich walkthrough merges and the two-path
    equality are pytest-pinned. Returns the ordered merge table."""
    t = Tables(spark, sf_dir)
    merges = _trained_merges(t, sf_dir)
    return spark.createDataFrame(
        [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


@register(
    "text_bigram_logprob",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
    SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
        SELECT doc_id, unnest(list_transform(range(len(t) - 1),
            i -> struct_pack(w1 := t[i+1], w2 := t[i+2]))) AS s
        FROM toks)
),
freq AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
lft AS (SELECT w1, sum(c) AS cl FROM freq GROUP BY 1)
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       round(avg(-ln(c / cl)), 6) AS avg_nll
FROM bg JOIN freq USING (w1, w2) JOIN lft USING (w1)
GROUP BY bg.doc_id
""",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring (textops.bigram_logprob_score): mean
    NLL of token transitions under the corpus's own MLE bigram model —
    the gibberish detector tier above the unigram scorer. Model tables
    are AQE-broadcast; one bigram agg + one rollup + scoring agg."""
    t = Tables(spark, sf_dir)
    return textops.bigram_logprob_score(t.documents, "doc_id", "text")


@register(
    "text_dup_spans",
    shadow_oracle="""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sp AS (
    SELECT doc_id, array_to_string(t[i.i : i.i + 2], ' ') AS span
    FROM tok, LATERAL UNNEST(range(1, len(t) - 3 + 2)) AS i(i)
    WHERE len(t) >= 3
)
SELECT span,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_total
FROM sp
GROUP BY span
HAVING count(DISTINCT doc_id) >= 3
ORDER BY n_docs DESC, n_total DESC, span ASC
LIMIT 50
""",
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 verbatim 3-token spans shared by >= 3 distinct documents
    (textops.dup_spans) — the boilerplate/template-detection signal of
    exact-substring dedup (Lee et al. 2022). One map-side span explode,
    one hash-grouped aggregation, TakeOrderedAndProject top-N."""
    t = Tables(spark, sf_dir)
    return textops.dup_spans(t.documents, "text", "doc_id", k=3, min_docs=3)


@register(
    "text_chunk_chars",
    oracle="""
WITH starts AS (
    SELECT doc_id, text,
           unnest(range(1, greatest(length(text) - 24, 1) + 1, 96)) AS start
    FROM documents
)
SELECT doc_id,
       (start - 1) // 96 AS chunk_idx,
       substr(text, start, 120) AS chunk_text,
       length(substr(text, start, 120)) AS chunk_chars,
       len(string_split(substr(text, start, 120), ' ')) AS chunk_tokens
FROM starts
""",
)
def text_chunk_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping char-window chunking (size=120, overlap=24) — the
    embedding/retrieval precut. Map-only: posexplode of a Catalyst
    sequence/transform array, zero exchanges at any corpus size."""
    t = Tables(spark, sf_dir)
    return textops.chunk_documents(t.documents, size=120, overlap=24, by="chars")


@register(
    "text_chunk_tokens",
    shadow_oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), starts AS (
    SELECT doc_id, t,
           unnest(range(1, greatest(len(t) - 8, 1) + 1, 24)) AS start
    FROM toks
)
SELECT doc_id,
       (start - 1) // 24 AS chunk_idx,
       array_to_string(t[start:start + 31], ' ') AS chunk_text,
       length(array_to_string(t[start:start + 31], ' ')) AS chunk_chars,
       len(t[start:start + 31]) AS chunk_tokens
FROM starts
""",
)
def text_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (size=32 tokens, overlap=8) — the
    context-window packing shape. Same zero-exchange map-only plan."""
    t = Tables(spark, sf_dir)
    return textops.chunk_documents(t.documents, size=32, overlap=8, by="tokens")


@register(
    "text_tfidf_keywords",
    oracle="""
WITH tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
    FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3
""",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords — the classic salience signal
    for corpus exploration / topic labeling. See
    textops.tfidf_keywords for the broadcast-vocab scale shape."""
    t = Tables(spark, sf_dir)
    return textops.tfidf_keywords(t.documents, k=3)


@register(
    "text_inverted_index",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
    FROM documents
)
SELECT term,
       count(DISTINCT doc_id) AS df,
       count(*) AS cf,
       string_agg(doc_id || ':' || pos, ',' ORDER BY doc_id, pos) AS postings
FROM toks GROUP BY term
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index over documents (term -> df, cf,
    ordered "doc:pos" posting string). See textops.inverted_index for
    the vocab-bounded aggregation + hot-term sharding posture."""
    t = Tables(spark, sf_dir)
    return textops.inverted_index(t.documents)


@register("multimodal_wav_spectral")  # rows-only: FFT decode, not SQL
def multimodal_wav_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL spectral analysis over binary audio columns: synthesized
    per-doc WAV payloads -> numpy rFFT centroid / 85% rolloff / band
    energy fractions (operators/codecs.py::wav_spectral), Arrow-batched
    via mapInPandas with no shuffle. Value correctness pinned by
    closed-form pure/two-tone tests in tests/test_operators.py."""
    from ..operators import multimodal

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_wav(docs, "doc_id")
    out = multimodal.extract_spectral(media, n_bands=8)
    return out.select(
        "id",
        "media_type",
        F.round("centroid_hz", 3).alias("centroid_hz"),
        F.round("rolloff85_hz", 3).alias("rolloff85_hz"),
        F.round(F.element_at("bands", 1), 6).alias("band0"),
        F.round(F.element_at("bands", 2), 6).alias("band1"),
    )


@register(
    "text_token_entropy",
    oracle="""
WITH tf AS (
    SELECT doc_id, term, count(*) AS c
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
FROM tf GROUP BY doc_id
""",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon token entropy (repetitiveness / template
    signal). See textops.token_entropy for the two-partial-agg shape."""
    t = Tables(spark, sf_dir)
    return textops.token_entropy(t.documents)


@register(
    "text_pmi_collocations",
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) > 0
), uni AS (
    SELECT term AS w, count(*) AS cw
    FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term
), nt AS (
    SELECT count(*) AS n FROM (SELECT unnest(t) FROM toks)
), bi AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks
          WHERE len(t) >= 2)
), bic AS (
    SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY 1, 2
    HAVING count(*) >= 5
), np AS (
    SELECT CAST(sum(len(t) - 1) AS BIGINT) AS np FROM toks WHERE len(t) >= 2
)
SELECT w1, w2, n_pair,
       round(ln((n_pair * 1.0 / np.np)
                / ((u1.cw * 1.0 / nt.n) * (u2.cw * 1.0 / nt.n))), 6) AS pmi
FROM bic
JOIN uni u1 ON bic.w1 = u1.w
JOIN uni u2 ON bic.w2 = u2.w
CROSS JOIN nt CROSS JOIN np
ORDER BY pmi DESC, w1, w2
LIMIT 50
""",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-token collocations by PMI (Church & Hanks) with
    min_count=5 — phrase mining for corpus exploration / tokenizer
    vocabulary seeding. See textops.pmi_collocations for the
    broadcast-unigram + TakeOrdered shape."""
    t = Tables(spark, sf_dir)
    return textops.pmi_collocations(t.documents, min_count=5, top_n=50)


@register("text_bpe_segment")  # rows-only: segmentation replays the
# trained (iterative) merge table; apply rule pinned by the two-path
# byte-equality + Sennrich walkthrough tests
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merges: segment the corpus VOCABULARY
    (word -> subword tokens) — tokenizing raw text is then a join of
    its words against this table, so the merge replay runs once per
    distinct word, never once per occurrence (the production tokenizer
    serving shape). Returns (word, n, segmented, n_tokens)."""
    from ..operators.bpe import bpe_segment_words, word_counts

    t = Tables(spark, sf_dir)
    merges = _trained_merges(t, sf_dir)
    seg = bpe_segment_words(word_counts(t.documents), merges)
    return seg.select(
        "word",
        "n",
        F.array_join("tokens", " ").alias("segmented"),
        "n_tokens",
    )


# Fitted filter-model memo, keyed (sf_dir, corpus fingerprint) like the
# ANN index memos — a rewritten corpus refits instead of reusing stale
# coefficients.
_QUALITY_CLF: dict = {}


@register("text_quality_clf_scores")  # rows-only: learned model scores
# (seeded MLlib fit); separation + map-only-scoring pinned in
# tests/test_ml.py
def text_quality_clf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/fastText-style learned quality filter: HashingTF -> IDF ->
    LogisticRegression trained on the heuristic quality gate's weak
    labels (ml/quality_clf.py), then the whole corpus scored. Training
    is the offline step (memoized per corpus fingerprint); SCORING is a
    map-only JVM transform chain — plan-asserted zero exchanges — so
    filtering 100 TB costs one scan. The hash trick (no vocabulary
    state) is what lets the featurizer scale."""
    from ..ml.quality_clf import (
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )

    t = Tables(spark, sf_dir)
    docs = t.documents
    fp = docs.agg(
        F.count("doc_id").alias("n"), F.max("doc_id").alias("mx")
    ).first()
    key = (sf_dir, int(fp["n"]), int(fp["mx"]) if fp["mx"] is not None else -1)
    if key not in _QUALITY_CLF:
        _QUALITY_CLF[key] = train_quality_classifier(
            weak_quality_labels(docs), n_features=4096
        )
    return score_quality(_QUALITY_CLF[key], docs)


@register(
    "text_dsir_weights",
    oracle="""
WITH tok AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS t FROM documents
),
raw AS (SELECT t, count(*) AS c_raw FROM tok GROUP BY t),
tgt AS (
    SELECT t, count(*) AS c_tgt FROM (
        SELECT unnest(string_split(text, ' ')) AS t
        FROM documents WHERE lang = 'en'
    ) GROUP BY t
),
tot AS (
    SELECT (SELECT sum(c_raw) * 1.0 FROM raw) AS n_raw,
           (SELECT count(*) * 1.0 FROM raw) AS v,
           (SELECT sum(c_tgt) * 1.0 FROM tgt) AS n_tgt
)
SELECT doc AS doc_id, count(*) AS n_tokens,
       round(sum(
           ln((coalesce(c_tgt, 0) + 1.0) / (n_tgt + 1.0 * v))
           - ln((c_raw + 1.0) / (n_raw + 1.0 * v))
       ), 6) AS log_ratio
FROM tok
JOIN raw USING (t)
LEFT JOIN tgt USING (t)
CROSS JOIN tot
GROUP BY doc
""",
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023; round-7 addition):
    per-document log-likelihood ratio of the English-slice unigram LM
    vs the raw-corpus unigram LM with add-1 smoothing over the raw
    vocabulary — the data-selection score whose exp() drives importance
    resampling toward a target domain. Fully differential (counts,
    smoothing, and ln mirrored in SQL; sums rounded to 6)."""
    t = Tables(spark, sf_dir)
    return textops.dsir_weights(
        t.documents, target=F.col("lang") == "en", smooth=1.0
    )


@register(
    "text_source_kl",
    shadow_oracle="""
WITH tok AS (
    SELECT source AS g, unnest(string_split(text, ' ')) AS t FROM documents
),
corpus AS (SELECT t, count(*) AS c_all FROM tok GROUP BY t),
per_group AS (SELECT g, t, count(*) AS c_g FROM tok GROUP BY g, t),
totals AS (
    SELECT g, n_g, n_all, v FROM
        (SELECT g, count(*) * 1.0 AS n_g FROM tok GROUP BY g),
        (SELECT sum(c_all) * 1.0 AS n_all, count(*) * 1.0 AS v FROM corpus)
),
expanded AS (
    SELECT totals.g, corpus.t, corpus.c_all,
           totals.n_g, totals.n_all, totals.v, per_group.c_g
    FROM corpus CROSS JOIN totals
    LEFT JOIN per_group ON per_group.g = totals.g AND per_group.t = corpus.t
)
SELECT g AS source,
       CAST(max(n_g) AS BIGINT) AS n_tokens,
       round(sum(((coalesce(c_g, 0) + 1.0) / (n_g + v))
                 * ln(((coalesce(c_g, 0) + 1.0) / (n_g + v))
                      / ((c_all + 1.0) / (n_all + v)))), 6) AS kl_group_corpus,
       round(sum(((c_all + 1.0) / (n_all + v))
                 * ln(((c_all + 1.0) / (n_all + v))
                      / ((coalesce(c_g, 0) + 1.0) / (n_g + v)))), 6)
           AS kl_corpus_group
FROM expanded
GROUP BY g
""",
)
def text_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-distribution drift vs the whole corpus
    (round-7 addition): smoothed KL in both directions over the FULL
    vocabulary — the feed monitor that catches a source whose language
    shifts between crawls. Fully differential (counts, smoothing, the
    vocab x sources expansion, and ln mirrored in SQL)."""
    t = Tables(spark, sf_dir)
    return textops.source_kl_divergence(t.documents, "source", "text")


@register(
    "text_jsd_drift",
    shadow_oracle="""
WITH tok AS (
    SELECT source AS g, unnest(string_split(text, ' ')) AS t FROM documents
),
corpus AS (SELECT t, count(*) AS c_all FROM tok GROUP BY t),
per_group AS (SELECT g, t, count(*) AS c_g FROM tok GROUP BY g, t),
totals AS (
    SELECT g, n_g, n_all, v FROM
        (SELECT g, count(*) * 1.0 AS n_g FROM tok GROUP BY g),
        (SELECT sum(c_all) * 1.0 AS n_all, count(*) * 1.0 AS v FROM corpus)
),
expanded AS (
    SELECT totals.g, corpus.c_all, totals.n_g, totals.n_all, totals.v,
           (coalesce(per_group.c_g, 0) + 1.0) / (totals.n_g + totals.v)
               AS p_g,
           (corpus.c_all + 1.0) / (totals.n_all + totals.v) AS p_c
    FROM corpus CROSS JOIN totals
    LEFT JOIN per_group ON per_group.g = totals.g AND per_group.t = corpus.t
)
SELECT g AS source,
       CAST(max(n_g) AS BIGINT) AS n_tokens,
       round(sum(CAST(floor((0.5 * p_g * ln(p_g / ((p_g + p_c) / 2))
                 + 0.5 * p_c * ln(p_c / ((p_g + p_c) / 2))) * 1e12 + 0.5)
                 AS BIGINT)) / 1e12, 6) AS jsd_nats,
       round(sum(CAST(floor((0.5 * p_g * ln(p_g / ((p_g + p_c) / 2))
                 + 0.5 * p_c * ln(p_c / ((p_g + p_c) / 2))) * 1e12 + 0.5)
                 AS BIGINT)) / 1e12 / ln(2.0), 6)
           AS jsd_norm
FROM expanded
GROUP BY g
""",
)
def text_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence vs the whole corpus — the
    SYMMETRIC, [0, ln 2]-BOUNDED drift readout (text_source_kl ranks
    feeds but its KL is unbounded and direction-dependent; JSD's fixed
    range lets a monitor carry ONE alert threshold across feeds of any
    size; jsd_norm rescales to [0,1]). Same smoothed full-vocabulary
    vocab × groups expansion as the KL query — groups are tens, the
    corpus is scanned once into token counts. Fully differential.
    Round 9: per-token JS terms quantize to exact 1e-12 micro-unit
    BIGINTs before the distributed sum (the a_ks_test determinism
    pattern — see PERFORMANCE.md DETERMINISM note) so the vocab-sized
    float sum can't wobble with partial-merge order."""
    t = Tables(spark, sf_dir)
    return textops.source_js_divergence(t.documents, "source", "text")


@register(
    "text_ccnet_buckets",
    shadow_oracle="""
WITH tok AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS t
    FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM freq),
scored AS (
    SELECT doc AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(c / n_total)), 6) AS avg_nll
    FROM tok JOIN freq USING (t), tot
    GROUP BY doc),
cuts AS (
    SELECT quantile_cont(avg_nll, 1.0/3) AS c1,
           quantile_cont(avg_nll, 2.0/3) AS c2
    FROM scored)
SELECT doc_id, n_tokens, avg_nll,
       CASE WHEN avg_nll <= c1 THEN 'head'
            WHEN avg_nll <= c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored, cuts
""",
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (round-8 addition;
    Wenzek et al. 2020 §4.3) under the corpus unigram LM — the coarse
    quality gate before sampling. Tercile CUTPOINTS come from one 1-row
    percentile agg (broadcast); each doc labels itself map-side — never
    a global ntile window, which would single-partition-sort the corpus
    at 100 TB. Fully differential incl. the interpolated cuts."""
    t = Tables(spark, sf_dir)
    return textops.ccnet_buckets(t.documents)


@register(
    "text_duplication_score",
    shadow_oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
    SELECT doc_id,
           unnest(list_transform(range(len(t) - 4),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                    || ' ' || t[i+4] || ' ' || t[i+5])) AS s
    FROM toks WHERE len(t) >= 5
),
dup AS (SELECT s FROM wins GROUP BY s HAVING count(*) >= 2),
per_doc AS (
    SELECT doc_id, count(*) AS n_dup_windows
    FROM wins WHERE s IN (SELECT s FROM dup)
    GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(greatest(len(t.t) - 4, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CASE WHEN len(t.t) - 4 > 0
            THEN round(coalesce(p.n_dup_windows, 0) * 1.0 / (len(t.t) - 4), 6)
            ELSE 0.0 END AS dup_frac
FROM toks t LEFT JOIN per_doc p USING (doc_id)
""",
)
def text_duplication_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication fraction (round-8 addition): the share
    of each doc's 5-token windows repeated corpus-wide — the doc-level
    "mostly boilerplate?" filter scalar (dup_spans mines WHICH spans;
    this scores each DOC). Fully differential: windows, the >=2 span
    count gate, and the fraction all mirrored in SQL."""
    t = Tables(spark, sf_dir)
    return textops.duplication_score(t.documents)


@register(
    "text_ngram_novelty",
    shadow_oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 4),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                    || ' ' || t[i+4] || ' ' || t[i+5]))) AS s
    FROM toks WHERE len(t) >= 5
),
firsts AS (SELECT s, min(doc_id) AS doc_id FROM wins GROUP BY s),
novel AS (SELECT doc_id, count(*) AS n_novel FROM firsts GROUP BY doc_id),
nw AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(nw.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(novel.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN coalesce(nw.n_windows, 0) > 0
            THEN round(coalesce(novel.n_novel, 0) * 1.0 / nw.n_windows, 6)
            ELSE 0.0 END AS novelty_frac
FROM toks t
LEFT JOIN nw ON t.doc_id = nw.doc_id
LEFT JOIN novel ON t.doc_id = novel.doc_id
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty curve (round-8 addition): the share
    of each doc's DISTINCT 5-token windows first seen (min doc_id) in
    that doc — the diminishing-returns measure dedup papers plot
    before training (a crawl tail with novelty ~0 is pure re-crawl;
    reference corpus-health analog: src/data/population_dataset.py's
    coverage diagnostics). Complements text_duplication_score: that
    scores "mostly repeated?", this scores "was this the origin?".
    Fully differential: set-distinct windows, min-owner, and the
    fraction all mirrored in SQL."""
    t = Tables(spark, sf_dir)
    return textops.ngram_novelty(t.documents)


@register(
    "gdpr_delete_cascade",
    shadow_oracle="""
WITH del AS (
    SELECT doc_id FROM documents WHERE doc_id % 37 = 0
),
kept AS (
    SELECT d.* FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM del WHERE del.doc_id = d.doc_id)
),
toks_all AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
toks_kept AS (
    SELECT t.* FROM toks_all t
    WHERE NOT EXISTS (SELECT 1 FROM del WHERE del.doc_id = t.doc_id)
)
SELECT 'documents' AS artifact,
       (SELECT count(*) FROM documents) AS n_before,
       (SELECT count(*) FROM kept) AS n_after,
       (SELECT count(*) FROM documents) - (SELECT count(*) FROM kept)
           AS n_purged
UNION ALL
SELECT 'postings',
       (SELECT count(*) FROM toks_all),
       (SELECT count(*) FROM toks_kept),
       (SELECT count(*) FROM toks_all) - (SELECT count(*) FROM toks_kept)
UNION ALL
SELECT 'chars',
       (SELECT cast(sum(n_chars) AS bigint) FROM documents),
       (SELECT cast(sum(n_chars) AS bigint) FROM kept),
       (SELECT cast(sum(n_chars) AS bigint) FROM documents)
           - (SELECT cast(sum(n_chars) AS bigint) FROM kept)
""",
)
def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete propagation: a deletion-request key
    set (here the deterministic doc_id%37 stand-in) cascades by
    LEFT-ANTI join through the corpus AND its derived artifacts — the
    posting table is purged BY KEY, never re-derived from the surviving
    text, because at 100 TB re-deriving an index to forget 0.01% of
    docs is the difference between minutes and a full reprocess. The
    anti-join's delete side broadcasts (deletion requests are always
    tiny next to the corpus), so every cascade leg is a map-side filter
    over the artifact it purges. Audit output: per-artifact
    before/after/purged counts — the compliance record a deletion run
    must produce. The persisted-index twin of this cascade is the CLI
    ``purge`` subcommand (anti-join + staged rewrite + rename-aside
    swap of the MinHash signature index)."""
    t = Tables(spark, sf_dir)
    docs = t.documents
    del_keys = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id")
    kept = docs.join(F.broadcast(del_keys), "doc_id", "left_anti")
    toks_all = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    toks_kept = toks_all.join(F.broadcast(del_keys), "doc_id", "left_anti")

    rows = F.count("*").cast("long")
    chars = F.sum("n_chars").cast("long")
    # one agg per artifact scan (documents carries BOTH its scalars per
    # pass), assembled by 1-row cross joins + stack — 4 scans, not 6
    b1 = docs.agg(rows.alias("docs_b"), chars.alias("chars_b"))
    a1 = kept.agg(rows.alias("docs_a"), chars.alias("chars_a"))
    b2 = toks_all.agg(rows.alias("post_b"))
    a2 = toks_kept.agg(rows.alias("post_a"))
    return (
        b1.crossJoin(a1)
        .crossJoin(b2)
        .crossJoin(a2)
        .selectExpr(
            "stack(3, 'documents', docs_b, docs_a, "
            "'postings', post_b, post_a, "
            "'chars', chars_b, chars_a) AS (artifact, n_before, n_after)"
        )
        .withColumn("n_purged", F.col("n_before") - F.col("n_after"))
    )


@register("text_topics_lda")  # rows-only: variational LDA fit has no
# DuckDB twin; shape/simplex/determinism properties pinned in
# tests/test_ml.py
def text_topics_lda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed topic discovery (round-8 addition): online
    variational LDA (minibatch-bounded per iteration — the 100 TB
    optimizer) over bounded-vocab token counts; reports the top-5
    terms per topic as a fixed k*5-row corpus-composition table. The
    corpus-analysis companion of mix_domain_clusters (that clusters
    embeddings; this needs only raw text)."""
    from ..ml.topics import topic_terms

    t = Tables(spark, sf_dir)
    return topic_terms(t.documents, k=8, n_terms=5)


@register(
    "text_mixed_lang",
    shadow_oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
starts AS (
    SELECT doc_id,
           unnest(range(1, greatest(len(t), 1) + 1, 40)) AS s, t
    FROM toks
), chunks AS (
    SELECT doc_id, list_slice(t, s, s + 39) AS ct FROM starts
), scored AS (
    SELECT doc_id,
           len(list_filter(ct, x -> x IN ('the','a','of','and','to','in','is','it'))) AS s_en,
           len(list_filter(ct, x -> x IN ('der','die','das','und','ist','ein','zu','mit'))) AS s_de,
           len(list_filter(ct, x -> x IN ('le','la','les','et','est','un','une','dans'))) AS s_fr,
           len(list_filter(ct, x -> x IN ('el','la','los','y','es','un','una','en'))) AS s_es
    FROM chunks
), pred AS (
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS p
    FROM scored
), counts AS (SELECT doc_id, p, count(*) AS c FROM pred GROUP BY doc_id, p),
ranked AS (
    SELECT doc_id, p, c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, p ASC) AS rn
    FROM counts
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_langs,
       max(CASE WHEN rn = 1 THEN p END) AS majority_lang,
       round(max(CASE WHEN rn = 1 THEN c END) * 1.0 / sum(c), 6)
           AS agreement
FROM ranked GROUP BY doc_id
""",
)
def text_mixed_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language / code-switch profile (round-8 addition): lang-ID
    every 40-token chunk independently and report the per-doc vote —
    the chunk-level variance a doc-level lang label hides (FineWeb-
    style "consistently language X" filters need it). Same stopword
    vote (and tie-break) as text_lang_id, mirrored per chunk in SQL."""
    t = Tables(spark, sf_dir)
    return textops.mixed_lang_profile(t.documents)


# -- beyond ref: lexical diversity (TTR / hapax) quality signals ------------

@register(
    "text_lexical_diversity",
    shadow_oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), tok AS (
    SELECT doc_id, unnest(t) AS token FROM toks
), cnt AS (
    SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(count(*) * 1.0 / sum(c), 6) AS ttr,
       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / sum(c), 6)
           AS hapax_ratio
FROM cnt GROUP BY doc_id
""",
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and hapax-
    legomena fraction — the 'fraction of unique words' style quality
    rules (Gopher / C4 use these to drop keyword-stuffed and
    boilerplate pages; low TTR = template text, high hapax on long
    docs = OCR noise). The Spark plan is a PURE MAP — zero exchanges:
    each doc's stats come from array expressions on its own token
    vector (size, array_distinct, and hapax counted by an
    index-lambda neighbor scan over the SORTED token array — a token
    is hapax iff it differs from both sorted neighbors), so at 100 TB
    this costs one corpus scan with no shuffle at all. The oracle is
    the INDEPENDENT explode -> (doc, token) count -> per-doc rollup
    formulation — two hash aggs in DuckDB, deliberately a different
    algorithm arriving at the same exact integers."""
    t = Tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id", F.sort_array(F.split(F.col("text"), " ")).alias("ts")
    ).withColumn("n", F.size("ts"))
    hapax = F.expr(
        "size(filter(sequence(0, n - 1), i -> "
        "(i = 0 OR ts[i] != ts[i - 1]) AND "
        "(i = n - 1 OR ts[i] != ts[i + 1])))"
    ).cast("bigint")
    return d.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("ts")).cast("bigint").alias("n_types"),
        hapax.alias("n_hapax"),
        F.round(F.size(F.array_distinct("ts")) / F.col("n"), 6).alias("ttr"),
        F.round(hapax / F.col("n"), 6).alias("hapax_ratio"),
    )


# -- beyond ref: Zipf's-law fit over the token frequency spectrum -----------

@register(
    "text_zipf_slope",
    shadow_oracle="""
WITH tok AS (
    SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
    SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token
), ranked AS (
    SELECT lang, c,
           row_number() OVER (PARTITION BY lang
                              ORDER BY c DESC, token ASC) AS rk
    FROM freq
)
SELECT lang,
       count(*) AS n_ranks,
       round(regr_slope(ln(c), ln(rk)), 6) AS zipf_slope,
       round(regr_intercept(ln(c), ln(rk)), 6) AS zipf_intercept,
       round(regr_r2(ln(c), ln(rk)), 6) AS r2
FROM ranked WHERE rk <= 1000
GROUP BY lang
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: OLS of ln(freq) ~ ln(rank) over the
    top-1000 token frequency spectrum — natural text sits near slope
    -1; templated/machine-generated corpora flatten or steepen the
    curve, making the slope a corpus-level quality fingerprint
    (complements the per-doc signals: lexical diversity, token
    entropy). Rank ties break on the token string so the rank
    permutation — and hence the exact regression inputs — is
    engine-deterministic. Scale shape: the (lang, token) frequency agg
    is vocab-bounded (Heaps' law) and partial-aggregated; the top-1000
    rank cut is a per-lang window over THAT table (never the corpus),
    and (round 11, reverting the round-10 hand-rolled pre-prune)
    relies on Spark 3.5's WindowGroupLimit rule: the rk <= 1000 filter
    over row_number() is pushed map-side as a Partial top-1000 prune
    automatically — the physical plan shows
    WindowGroupLimit(Partial) before the exchange — so the final
    single-task-per-lang sort already sees at most 1000 x #partitions
    rows without a second hand-written window (which only added a
    third exchange). The regression
    is regr_* closed-form aggregates — one fixed-size state per lang,
    the a_trend_fit posture. ln() keeps the sums in [0, ~7e3] where
    both engines' float accumulation agrees past the 6-decimal
    rounding."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    freq = tok.groupBy("lang", "token").agg(F.count("*").alias("c"))
    wr = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    ranked = freq.select(
        "lang", "c", F.row_number().over(wr).alias("rk")
    ).filter(F.col("rk") <= 1000)
    lc, lr = F.log(F.col("c")), F.log(F.col("rk"))
    return ranked.groupBy("lang").agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 6).alias("r2"),
    )


# -- beyond ref: BM25 ranked retrieval over the inverted-index stats --------

@register(
    "text_bm25_topk",
    shadow_oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), dl AS (
    SELECT doc_id, len(t) AS dlen FROM toks
), stats AS (
    SELECT count(*) AS n, avg(dlen) AS avgdl FROM dl
), q AS (SELECT unnest(['hash', 'vector', 'stream']) AS term),
tf AS (
    SELECT doc_id, token AS term, count(*) AS tf
    FROM (SELECT doc_id, unnest(t) AS token FROM toks)
    WHERE token IN ('hash', 'vector', 'stream')
    GROUP BY doc_id, token
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
    SELECT tf.doc_id,
           sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
               * tf * 2.2
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen / avgdl)))
               AS score
    FROM tf
    JOIN df USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    GROUP BY tf.doc_id
), ranked AS (
    SELECT doc_id, round(score, 6) AS bm25,
           row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rk
    FROM scored
)
SELECT rk, doc_id, bm25 FROM ranked WHERE rk <= 20
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75, the Lucene-default
    Robertson idf with +1 floor) for a fixed 3-term query over the
    corpus — the classic IR scorer the TF-IDF query stops short of,
    and the relevance-ranking path of the inverted-index operator.
    Scale shape: doc lengths are a pure map; the tf table is the
    exploded token stream FILTERED TO THE QUERY TERMS before its agg
    (the shuffle carries only matching postings — at 100 TB this is
    the 'seek the postings list' cost, never a full-vocab agg); df
    (3 rows) and the corpus N/avgdl scalar attach by broadcast; top-20
    is TakeOrderedAndProject on the rank key. Ranking ties are decided
    on the ROUNDED score + doc_id in BOTH engines, so the cutoff row
    is engine-deterministic even where raw float scores differ in the
    last bit."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    dl = toks.select("doc_id", F.size("t").alias("dlen"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dlen").alias("avgdl")
    )
    terms = ["hash", "vector", "stream"]
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    part = (
        F.log(
            (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * F.col("tf")
        * 2.2
        / (
            F.col("tf")
            + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dlen") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(part).alias("score"))
    )
    top = (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
    wr = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return top.select(F.row_number().over(wr).alias("rk"), "doc_id", "bm25")


# -- beyond ref: Jelinek-Mercer interpolated LM perplexity ------------------

@register(
    "text_lm_interpolated",
    shadow_oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) >= 2
), uni AS (
    SELECT term AS w, count(*) AS cu
    FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term
), nt AS (SELECT CAST(sum(cu) AS DOUBLE) AS n FROM uni),
bi AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
), bic AS (
    SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2
), leftc AS (
    SELECT w1, CAST(sum(cb) AS DOUBLE) AS cl FROM bic GROUP BY w1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln(0.7 * (cb / cl) + 0.3 * (cu / n))), 6) AS avg_nll,
       round(exp(avg(-ln(0.7 * (cb / cl) + 0.3 * (cu / n)))), 6) AS ppl
FROM bi
JOIN bic USING (w1, w2)
JOIN leftc USING (w1)
JOIN uni ON uni.w = bi.w2
CROSS JOIN nt
GROUP BY doc_id
""",
)
def text_lm_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM perplexity per document:
    P(w2|w1) = 0.7·P_bigram + 0.3·P_unigram — the smoothing that keeps
    unseen-in-context tokens finite, which the raw bigram NLL query
    (text_bigram_logprob) deliberately lacks; this is the CCNet-style
    'LM filter' shape one perplexity step more faithful than the
    unigram proxy. Scale: bigram + unigram model tables are
    vocab-bounded partial aggs, BOTH checkpointed once (each feeds a
    rollup and/or the scoring join); the 1-row token total broadcasts.
    The three model lookups (cb, cl, cu) are PRE-JOINED into one
    (w1, w2)-keyed model table — vocab-sized joins — so the
    corpus-sized bigram stream joins ONCE: the round-10 1000x probe
    caught the original three corpus-side joins each turning into a
    full corpus shuffle when the model tables outgrow broadcast
    (exchanges 7 -> 9, ratio 93.6x); with the single scoring join the
    at-scale plan shuffles the corpus once on (w1, w2) regardless of
    model size. Interpolation weights are literals on both engines;
    per-doc avg over exact count ratios, rounded at 6."""
    toks = (
        Tables(spark, sf_dir)
        .documents.select(
            "doc_id", F.split(F.col("text"), " ").alias("t")
        )
        .filter(F.size("t") >= 2)
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=False)
    )
    nt = uni.agg(F.sum("cu").cast("double").alias("n"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] as w1, t[i+1] as w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bic = (
        bi.groupBy("w1", "w2").agg(F.count("*").alias("cb")).localCheckpoint(eager=False)
    )
    leftc = bic.groupBy("w1").agg(F.sum("cb").cast("double").alias("cl"))
    p = 0.7 * (F.col("cb") / F.col("cl")) + 0.3 * (F.col("cu") / F.col("n"))
    model = (
        bic.join(leftc, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .select("w1", "w2", "cb", "cl", "cu")
    )
    return (
        bi.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(nt))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_nll"),
            F.round(F.exp(F.avg(-F.log(p))), 6).alias("ppl"),
        )
    )


# -- beyond ref: ARI readability score (quality signal) ---------------------

@register(
    "text_readability_ari",
    shadow_oracle="""
WITH d AS (
    SELECT doc_id,
           length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
               AS n_chars_an,
           len(string_split(text, ' ')) AS n_words,
           greatest(1, len(regexp_split_to_array(text, '[.!?]+')) - 1)
               AS n_sents
    FROM documents
)
SELECT doc_id, CAST(n_chars_an AS BIGINT) AS n_chars_an,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sents,
       CAST(floor((471 * n_chars_an * n_sents + 50 * n_words * n_words
                   - 2143 * n_words * n_sents) * 1.0
                  / (n_words * n_sents)) AS BIGINT) AS ari_x100
FROM d WHERE n_words > 0
""",
)
def text_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index per document (Senter & Smith 1967:
    4.71·chars/word + 0.5·words/sentence − 21.43) — the readability
    quality signal that needs NO syllable dictionary (char- and
    word-count based, so it survives tokenizer-free pipelines; used as
    a cheap grade-level gate alongside the stopword/length heuristics).
    Alphanumeric chars counted by one regexp_replace strip; sentences
    by splitting on [.!?]+ runs (floored at 1 so headline-style
    fragments don't divide by zero) — both regexes RE2-safe and
    byte-identical across engines (the PII-mask convention). The score
    surfaces as centi-ARI (x100, floored): the x100 common-denominator
    form is EXACT integer arithmetic until one float divide, and
    floor() has no round-half mode — a round(...,6) here genuinely
    hash-diverged on a doc whose ratio landed on an exact .5 tie
    (Spark half-up vs DuckDB half-even). Pure map, zero exchanges."""
    t = Tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        F.length(
            F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", "")
        ).alias("n_chars_an"),
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.greatest(
            F.lit(1), F.size(F.split(F.col("text"), "[.!?]+")) - 1
        ).alias("n_sents"),
    )
    # int32 literals x int32 counts would wrap at ~2^31 in non-ANSI mode
    # (the oracle computes the same formula in BIGINT) — cast first so
    # the 'EXACT integer arithmetic' claim holds for long documents
    c = F.col("n_chars_an").cast("bigint")
    w_ = F.col("n_words").cast("bigint")
    sn = F.col("n_sents").cast("bigint")
    return d.filter(w_ > 0).select(
        "doc_id",
        c.cast("bigint").alias("n_chars_an"),
        w_.cast("bigint").alias("n_words"),
        sn.cast("bigint").alias("n_sents"),
        F.floor(
            (471 * c * sn + 50 * w_ * w_ - 2143 * w_ * sn)
            * F.lit(1.0)
            / (w_ * sn)
        )
        .cast("bigint")
        .alias("ari_x100"),
    )


@register("text_compressibility")  # rows-only: no SQL engine exposes
# zlib; determinism + repetition-ordering properties pinned in
# tests/test_operators.py
def text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc zlib compression ratio (see operators/textops.py::
    compressibility) — the parameter-free redundancy signal beside the
    Gopher repetition rules: templated docs compress far below natural
    prose. Zero exchanges; the C codec runs GIL-free inside one Arrow
    mapInPandas scan."""
    t = Tables(spark, sf_dir)
    return textops.compressibility(t.documents)
