"""Property-based spot checks (SURVEY.md §5.2 item 4) with hypothesis.

Each property runs a bounded number of examples against a live local
SparkSession — examples are kept small (rows ≤ 40) so the suite stays
fast while still exploring null patterns and key distributions pytest
fixtures would never enumerate by hand.
"""

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hive_population_ml_spark.functions.rowwise import (
    rowwise_mean,
    rowwise_present,
    rowwise_sum,
)
from hive_population_ml_spark.ml.splits import with_split_column

finite = st.none() | st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
rows_strategy = st.lists(st.tuples(finite, finite, finite), min_size=1, max_size=40)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=rows_strategy)
@SETTINGS
def test_rowwise_mean_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = (
        df.select(
            rowwise_mean(["a", "b", "c"]).alias("m"),
            rowwise_present(["a", "b", "c"]).alias("p"),
            rowwise_sum(["a", "b", "c"]).alias("s"),
        )
        .toPandas()
    )
    want = pd.DataFrame(rows, columns=["a", "b", "c"], dtype=float).mean(
        axis=1
    )  # pandas skips NaN per row; all-NaN -> NaN
    for g, w in zip(got["m"], want):
        if pd.isna(w):
            assert g is None or pd.isna(g)
        else:
            assert g is not None and math.isclose(g, w, rel_tol=1e-12)


keys_strategy = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=40
)


@given(keys=keys_strategy)
@SETTINGS
def test_hash_split_is_deterministic_partition(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    a = with_split_column(df, "k", seed=42).collect()
    b = with_split_column(df, "k", seed=42).collect()
    # deterministic: same key -> same split, across invocations
    ma = {r["k"]: r["split"] for r in a}
    mb = {r["k"]: r["split"] for r in b}
    assert ma == mb
    # total: every row assigned exactly one of the three splits
    assert all(v in ("train", "val", "test") for v in ma.values())
    # group-consistency: duplicate keys always land together
    seen = {}
    for r in a:
        seen.setdefault(r["k"], set()).add(r["split"])
    assert all(len(s) == 1 for s in seen.values())


@given(
    vals=st.lists(
        st.floats(min_value=-1e5, max_value=1e5, allow_nan=False),
        min_size=4,
        max_size=40,
    )
)
@SETTINGS
def test_stats_bundle_matches_pandas(spark, vals):
    from hive_population_ml_spark.operators.stats_bundle import stat_exprs

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = df.agg(*stat_exprs(["x"])).first()
    s = pd.Series(vals)
    assert math.isclose(row["x_avg"], s.mean(), rel_tol=1e-9, abs_tol=1e-9)
    # pandas std() is ddof=1 == stddev_samp (SURVEY §5.3)
    if len(vals) > 1 and not math.isnan(s.std()):
        assert math.isclose(row["x_std"], s.std(), rel_tol=1e-9, abs_tol=1e-9)
    assert row["x_min"] == s.min() and row["x_max"] == s.max()
    assert math.isclose(row["x_range"], s.max() - s.min(), rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=30),
        min_size=1, max_size=8,
    )
)
def test_mode_count_matches_python_counter(spark, docs):
    """The sorted-run-length `_mode_count` expression equals the Python
    Counter mode for arbitrary token multisets (incl. empty docs)."""
    from collections import Counter

    from hive_population_ml_spark.operators.textops import _mode_count

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", _mode_count(F.split("text", " ")).alias("m")
        ).collect()
    }
    for i, d in enumerate(docs):
        toks = " ".join(d).split(" ")  # mirrors split semantics ("" for empty)
        want = max(Counter(toks).values())
        assert got[i] == want, (toks, got[i], want)


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50
    )
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_uniform_hash_portable_across_engines(spark, ids):
    """The minstd mode is the cross-engine sampling contract: Spark,
    DuckDB (shadow oracle) and pure-Python 64-bit integer arithmetic
    must produce bit-identical u values for ANY id — retry-stable,
    engine-portable sampling depends on it."""
    from hive_population_ml_spark.operators.sampling import (
        _MINSTD_A,
        _MINSTD_M,
        _MINSTD_OFFSET,
        uniform_hash,
    )

    def py_u(i: int) -> float:
        x = (abs(i) + _MINSTD_OFFSET) % _MINSTD_M
        x = x * _MINSTD_A % _MINSTD_M
        x = x * _MINSTD_A % _MINSTD_M
        return x / float(_MINSTD_M)

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["u"]
        for r in df.select("id", uniform_hash("id", "minstd").alias("u")).collect()
    }
    for i in ids:
        assert got[i] == py_u(i), (i, got[i], py_u(i))


# --- Round-4 primitives ------------------------------------------------------

word = st.text(alphabet="abcde", min_size=1, max_size=5)
corpus_strategy = st.lists(word, min_size=1, max_size=30)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=corpus_strategy)
def test_bpe_python_twin_invariants(spark, words):
    """For ANY corpus: recorded pair counts are honest (replaying the
    merges in order, each merged pair really occurs exactly that many
    times at its step), and segmentation stays lossless. (Counts need
    NOT be monotonic — a merge can create a new frequent pair.)"""
    from hive_population_ml_spark.operators.bpe import (
        _merge_word,
        _pair_counts,
        _symbols,
        _train_bpe_python,
    )
    from collections import Counter

    vocab = [( _symbols(w), n) for w, n in Counter(words).items()]
    merges = _train_bpe_python(vocab, n_merges=5, min_pair_count=1)
    # replay: applying merges in order reproduces each step's pair count
    v = [( _symbols(w), n) for w, n in Counter(words).items()]
    for left, right, cnt in merges:
        assert _pair_counts(v)[(left, right)] == cnt
        v = [(_merge_word(s, left, right), n) for s, n in v]
    # lossless: concatenating final symbols recovers word + </w>
    for (syms, _), (w, _) in zip(v, Counter(words).items()):
        assert "".join(syms) == w + "</w>"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_bottom_k_mergeable_any_partitioning(spark, ids, k):
    """Bottom-k of a union equals bottom-k of the parts' bottom-ks for
    ANY id set and ANY split point — the sketch property that makes
    per-shard samples roll up."""
    from hive_population_ml_spark.operators.sampling import bottom_k_sample

    df = spark.createDataFrame(
        [(i, i % 2) for i in ids], "doc_id long, g long"
    )
    cut = ids[len(ids) // 2]
    a = df.filter(F.col("doc_id") <= cut)
    b = df.filter(F.col("doc_id") > cut)
    whole = {
        (r["doc_id"], r["g"], r["rk"])
        for r in bottom_k_sample(
            df, "g", k=k, id_col="doc_id", prefilter_safety=None
        ).collect()
    }
    part_union = (
        bottom_k_sample(a, "g", k=k, id_col="doc_id", prefilter_safety=None)
        .select("doc_id", "g")
        .union(
            bottom_k_sample(
                b, "g", k=k, id_col="doc_id", prefilter_safety=None
            ).select("doc_id", "g")
        )
    )
    parts = {
        (r["doc_id"], r["g"], r["rk"])
        for r in bottom_k_sample(
            part_union, "g", k=k, id_col="doc_id", prefilter_safety=None
        ).collect()
    }
    assert whole == parts


_span_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=25,
)


@given(texts=_span_corpus)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dup_spans_matches_python_reference(spark, texts):
    """dup_spans == a pure-Python sliding-window counter on any corpus:
    same spans, same distinct-doc and total counts, same ordering
    prefix (tiny alphabet maximizes span collisions — the regime the
    aggregation must get right)."""
    from collections import defaultdict

    from hive_population_ml_spark.operators.textops import dup_spans

    k, min_docs, top_n = 2, 2, 10
    docs_ref = defaultdict(set)
    total_ref = defaultdict(int)
    for i, text in enumerate(texts):
        toks = text.split(" ")
        for j in range(len(toks) - k + 1):
            span = " ".join(toks[j : j + k])
            docs_ref[span].add(i)
            total_ref[span] += 1
    expected = sorted(
        (
            (s, len(d), total_ref[s])
            for s, d in docs_ref.items()
            if len(d) >= min_docs
        ),
        key=lambda r: (-r[1], -r[2], r[0]),
    )[:top_n]

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r["span"], r["n_docs"], r["n_total"])
        for r in dup_spans(
            df, k=k, min_docs=min_docs, top_n=top_n
        ).collect()
    ]
    # ordering ties beyond the sort key triple are impossible (span is
    # unique), so the comparison is exact
    assert got == expected


# -- round-9 additions: pHash / banding recall / JPEG round-trip ------------

_fp_sets = st.lists(
    st.integers(min_value=0, max_value=2**63 - 1),
    min_size=2,
    max_size=12,
    unique=True,
)


@given(fps=_fp_sets, d=st.integers(min_value=1, max_value=6))
@SETTINGS
def test_fingerprint_pairs_exact_recall_and_precision(spark, fps, d):
    """Pigeonhole property of the Manku block tables, for ANY 64-bit
    fingerprint multiset: fingerprint_pairs at max_hamming=d returns
    EXACTLY the brute-force pairs within Hamming d — recall is exact by
    the block-combination construction, precision is exact because of
    the bit_count(xor) verify."""
    from hive_population_ml_spark.operators.dedup import fingerprint_pairs

    fp = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fps)], "doc long, simhash long"
    )
    got = {
        (r["d1"], r["d2"])
        for r in fingerprint_pairs(fp, max_hamming=d).collect()
    }
    want = {
        (i, j)
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if bin(fps[i] ^ fps[j]).count("1") <= d
    }
    assert got == want


_ctrl_grid = st.lists(
    st.lists(st.integers(min_value=30, max_value=225), min_size=6, max_size=6),
    min_size=6,
    max_size=6,
)


@given(grid=_ctrl_grid, shift=st.integers(min_value=-20, max_value=20))
@SETTINGS
def test_phash_brightness_invariance_and_upscale_stability(grid, shift):
    """pHash zeroes the DC bit, so an UNCLIPPED global brightness shift
    must leave the hash untouched; area downsampling makes a 2x
    nearest-neighbor upscale a near-no-op (Hamming <= 4)."""
    import numpy as np

    from hive_population_ml_spark.operators.codecs import phash64

    ctrl = np.array(grid, dtype=np.float64)
    # 64x64 so both the image (64->32: exact 2x2 area means) and its 2x
    # upscale (128->32: exact 4x4 means) land on ALIGNED resample grids
    # — the upscale is then a strict hash no-op, not merely "close"
    big = np.kron(ctrl, np.ones((11, 11)))[:64, :64]
    img = np.clip(big, 30, 225).astype(np.uint8)
    h0 = phash64(img)
    shifted = (img.astype(np.int64) + shift)
    assert shifted.min() >= 0 and shifted.max() <= 255  # no clipping
    assert phash64(shifted.astype(np.uint8)) == h0
    up = img.repeat(2, axis=0).repeat(2, axis=1)
    assert phash64(up) == h0


@given(grid=_ctrl_grid, quality=st.integers(min_value=80, max_value=95))
@SETTINGS
def test_jpeg_roundtrip_rmse_bounded_on_random_blocky_images(grid, quality):
    """encode->decode at quality 80-95 keeps pixel RMSE under 12 for
    ANY control-grid image hypothesis produces — including the
    worst-case alternating-extreme grids whose hard 30<->225 block
    edges maximize ringing (measured ~10.5 at q80; a broken huffman/
    zigzag/IDCT path lands at RMSE 50+). The strict <3 bound on smooth
    gradients lives in tests/test_operators.py; output dims always
    match input."""
    import numpy as np

    from hive_population_ml_spark.operators import codecs

    ctrl = np.array(grid, dtype=np.float64)
    big = np.kron(ctrl, np.ones((9, 9)))[:50, :52]
    g = big
    img = np.stack([g, 255 - g, 0.5 * g + 60], axis=2).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    rmse = float(np.sqrt(np.mean((dec.astype(float) - img.astype(float)) ** 2)))
    assert rmse < 12.0, rmse
