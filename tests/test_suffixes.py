"""Distributed suffix-ranking tests (operators/suffixes.py).

Parity strategy: global_dense_rank vs a direct single-window
dense_rank; suffix_ranks vs a plain-python Manber-Myers reference on
random strings (full order AND intermediate prefix levels);
duplicated_spans vs brute-force substring counting; plus sentinel /
boundary / determinism edges.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_population_ml_spark.operators import suffixes


def _py_suffix_order(s: str) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def test_global_dense_rank_matches_direct_window(spark):
    # 5000 rows / 7 partitions: large enough that per-action boundary
    # re-sampling WOULD misalign the offset table (the round-10 bug:
    # repartitionByRange samples per action, so the ranked branch and
    # the offset branch must see one pinned layout)
    rnd = random.Random(2)
    rows = [(i, rnd.randint(0, 50), rnd.randint(-1, 5)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = suffixes.global_dense_rank(df, ["a", "b"], num_partitions=7)
    want = df.withColumn(
        "grank", F.dense_rank().over(Window.orderBy("a", "b"))
    )
    a = sorted(map(tuple, got.select("id", "grank").collect()))
    b = sorted(map(tuple, want.select("id", "grank").collect()))
    assert a == b


def test_global_rank_matches_direct_window(spark):
    rnd = random.Random(4)
    rows = [(i, rnd.randint(0, 50), rnd.randint(-1, 5)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = suffixes.global_rank(df, ["a", "b"], num_partitions=7)
    want = df.withColumn(
        "grank", F.rank().over(Window.orderBy("a", "b")) - 1
    )
    a = sorted(map(tuple, got.select("id", "grank").collect()))
    b = sorted(map(tuple, want.select("id", "grank").collect()))
    assert a == b
    # tie groups occupy exactly [base, base+m-1]: the refinement
    # property suffix_ranks' tie-shrinking rounds rely on
    by_rank: dict = {}
    for _, r in a:
        by_rank[r] = by_rank.get(r, 0) + 1
    spots = sorted(by_rank)
    run = 0
    for r in spots:
        assert r == run, (r, run)
        run += by_rank[r]


def test_global_dense_rank_no_single_partition_exchange(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 37).alias("a")
    )
    plan = (
        suffixes.global_dense_rank(df, ["a"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only SinglePartition exchange allowed is the tiny
    # per-partition offset table (broadcast on the other side)
    big_single = [
        line
        for line in plan.splitlines()
        if "Exchange SinglePartition" in line and "broadcast" not in line.lower()
    ]
    # offset table window runs on <= #partitions rows; it appears as one
    # SinglePartition exchange of the aggregated per-pid table only
    assert len(big_single) <= 1, plan


@pytest.mark.parametrize("seed", [1, 2])
def test_suffix_ranks_match_python_reference(spark, seed):
    rnd = random.Random(seed)
    s = "".join(rnd.choice("abcd") for _ in range(200))
    docs = spark.createDataFrame([(1, s)], "doc_id long, text string")
    chars = suffixes.corpus_char_table(docs, "doc_id", "text")
    ranks, prefix = suffixes.suffix_ranks(chars)
    assert prefix >= 1
    got = {
        r["pos"]: r["grank"]
        for r in chars.join(ranks, "pos")
        .filter(F.col("code") >= 0)
        .select("pos", "grank")
        .collect()
    }
    order = sorted(got, key=lambda p: got[p])
    # ranks are all distinct at convergence -> the suffix ORDER matches
    # the python reference exactly (sentinel sorts before every char,
    # so dropping it keeps relative order)
    assert order == _py_suffix_order(s)


def test_suffix_ranks_prefix_level_semantics(spark):
    # until_prefix stops early: equal rank <=> equal prefix of the
    # returned length
    s = "abababXabababY"
    docs = spark.createDataFrame([(1, s)], "doc_id long, text string")
    chars = suffixes.corpus_char_table(docs, "doc_id", "text")
    ranks, prefix = suffixes.suffix_ranks(chars, until_prefix=4)
    assert prefix == 4
    got = {
        r["pos"]: r["grank"]
        for r in chars.join(ranks, "pos")
        .filter(F.col("code") >= 0)
        .select("pos", "grank")
        .collect()
    }
    padded = s + "\x00" * 4
    for i in got:
        for j in got:
            same = padded[i : i + 4] == padded[j : j + 4]
            assert (got[i] == got[j]) == same, (i, j)


def test_duplicated_spans_match_bruteforce(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown fox leaps over a lazy dog",
        3: "lorem ipsum dolor sit amet",
        4: "the quick brown fox jumps again and again",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    L = 10
    got = [
        (r["span"], r["n_occurrences"], r["n_docs"])
        for r in suffixes.duplicated_spans(
            docs, "doc_id", "text", min_len=L
        ).collect()
    ]
    c: Counter = Counter()
    dper: dict = {}
    for d, t in texts.items():
        for i in range(len(t) - L + 1):
            sp = t[i : i + L]
            c[sp] += 1
            dper.setdefault(sp, set()).add(d)
    want = sorted(
        ((sp, n, len(dper[sp])) for sp, n in c.items() if n >= 2),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want


def test_duplicated_spans_never_cross_documents(spark):
    # "XX|YY" split across docs must NOT produce the span "X XY" etc.
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa")], "doc_id long, text string"
    )
    out = suffixes.duplicated_spans(docs, "doc_id", "text", min_len=3)
    rows = {r["span"]: (r["n_occurrences"], r["n_docs"]) for r in out.collect()}
    # each doc has two 'aaa' positions -> 4 total across 2 docs; no
    # span containing a boundary can appear
    assert rows == {"aaa": (4, 2)}


def test_duplicated_spans_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "xx common yy common zz common ww")],
        "doc_id long, text string",
    )
    out3 = suffixes.duplicated_spans(
        docs, "doc_id", "text", min_len=4, min_count=3
    ).collect()
    assert all(r["n_occurrences"] >= 3 for r in out3)
    spans = {r["span"] for r in out3}
    assert {"comm", "ommo", "mmon", " com"} <= spans
    # the pair-only spans ("n xx" etc.) must be filtered by min_count=3
    assert all(r["n_occurrences"] >= 3 for r in out3)


def test_longest_repeated_span_matches_bruteforce(spark):
    texts = {
        1: "the cat sat on the red mat today",
        2: "a cat sat on the red hat yesterday",
        3: "completely different text",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = suffixes.longest_repeated_span(docs, "doc_id", "text", top_k=3)
    rows = out.collect()
    # brute force: longest substring with >= 2 distinct occurrences
    occ: dict = {}
    for d, t in texts.items():
        for i in range(len(t)):
            for j in range(i + 1, len(t) + 1):
                occ.setdefault(t[i:j], set()).add((d, i))
    best_len, best = max(
        (len(s), s) for s, o in occ.items() if len(o) >= 2
    )
    assert rows[0]["length"] == best_len
    assert rows[0]["span"] == best
    assert {rows[0]["doc_a"], rows[0]["doc_b"]} == {1, 2}


def test_longest_repeated_span_within_one_doc(spark):
    docs = spark.createDataFrame(
        [(7, "xy ABRACADABRA zz ABRACADABRA ww")],
        "doc_id long, text string",
    )
    rows = suffixes.longest_repeated_span(
        docs, "doc_id", "text", top_k=1
    ).collect()
    assert rows[0]["span"] == " ABRACADABRA "
    assert rows[0]["length"] == 13
    assert rows[0]["doc_a"] == 7 and rows[0]["doc_b"] == 7


def test_longest_repeated_span_never_crosses_documents(spark):
    # "endAstart" split at a boundary must not register as a repeat
    docs = spark.createDataFrame(
        [(1, "qqqq tail"), (2, " tailqqqq")], "doc_id long, text string"
    )
    rows = suffixes.longest_repeated_span(
        docs, "doc_id", "text", top_k=1
    ).collect()
    # the longest true repeat is " tail"/"tail"-family or "qqqq"
    assert rows[0]["length"] == 5 and rows[0]["span"] == " tail"


def test_corpus_char_table_empty_docs(spark):
    # ADVICE r10: split('', '') yields [''] — an empty doc must emit
    # ONLY its sentinel row (len1 = 1), with no phantom code-0 char and
    # no global-pos collision with the next document
    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "cd"), (4, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        map(tuple, suffixes.corpus_char_table(
            docs, "doc_id", "text"
        ).select("pos", "code", "doc_id", "local").collect())
    )
    # positions are dense 0..7: 2 chars + sentinel, sentinel, 2 chars
    # + sentinel, sentinel
    assert [r[0] for r in rows] == list(range(8))
    by_doc = {}
    for pos, code, d, local in rows:
        by_doc.setdefault(d, []).append(code)
    assert by_doc[1] == [ord("a"), ord("b"), -2]
    assert by_doc[2] == [-3]
    assert by_doc[3] == [ord("c"), ord("d"), -4]
    assert by_doc[4] == [-5]
    # and longest_repeated_span survives empty docs without phantom
    # repeats between them
    out = suffixes.longest_repeated_span(
        spark.createDataFrame(
            [(1, ""), (2, "xyxy"), (3, "")], "doc_id long, text string"
        ),
        "doc_id", "text", top_k=1,
    ).collect()
    assert out[0]["span"] == "xy" and out[0]["length"] == 2


@pytest.mark.parametrize("seed_width", [1, 4, 8, 16])
def test_suffix_ranks_seeded_matches_unseeded(spark, seed_width):
    # the fixed-width seed (round 11) must reproduce EXACTLY the
    # unseeded prefix-doubling order, incl. multi-doc sentinels, docs
    # shorter than the seed width, and duplicate whole documents
    rnd = random.Random(7)
    docs = spark.createDataFrame(
        [
            (1, "".join(rnd.choice("ab") for _ in range(120))),
            (2, "abcabcabc"),
            (3, "abcabcabc"),  # identical doc -> sentinel tiebreak
            (4, "a"),          # shorter than every seed width
            (5, ""),
        ],
        "doc_id long, text string",
    )
    chars = suffixes.corpus_char_table(docs, "doc_id", "text")
    seeded, p1 = suffixes.suffix_ranks(chars, seed_width=seed_width)
    base, p2 = suffixes.suffix_ranks(chars, seed_width=1)
    a = sorted(map(tuple, seeded.select("pos", "grank").collect()))
    b = sorted(map(tuple, base.select("pos", "grank").collect()))
    assert a == b


def test_min_len_validation(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        suffixes.duplicated_spans(docs, "doc_id", "text", min_len=1)


def test_longest_repeated_span_corpus_guard(spark):
    """The exactness backstop refuses an oversized corpus loudly and
    names the dispatch rule; the explicit opt-out still runs."""
    import pytest

    from hive_population_ml_spark.operators.suffixes import (
        longest_repeated_span,
    )

    docs = spark.createDataFrame(
        [(1, "abcabc repeat abcabc"), (2, "zz abcabc zz")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_corpus_chars"):
        longest_repeated_span(
            docs, "doc_id", "text", max_corpus_chars=10
        ).collect()
    rows = longest_repeated_span(
        docs, "doc_id", "text", top_k=1, max_corpus_chars=None
    ).collect()
    assert rows and rows[0]["length"] >= 6
