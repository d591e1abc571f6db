"""Distributed BPE tokenizer training — the tokenizer-side companion of
the corpus pipeline (charter extension; the reference tokenizes nothing,
``SURVEY.md`` §2.10 scope).

Byte-pair encoding (Sennrich et al. 2016) trains on WORD COUNTS, not
raw text: the only corpus-sized pass is one word-frequency aggregation
(vocabulary-bounded by Heaps' law — the same shape as
``textops.token_frequencies``), after which every merge iteration
operates on the vocabulary table. That is exactly how production
tokenizer trainers work at scale, and it maps onto Spark as:

- ``word_counts``    — the 100 TB pass: explode + partial-agg count.
- ``train_bpe``      — merge loop over the vocab. Two paths with
  IDENTICAL results (test-pinned): when the vocab fits the driver
  (default threshold 500k words — a 100 TB web corpus's pre-tokenized
  vocab is millions, not billions) the loop runs in pure Python;
  above it, each iteration is one weighted pair-count aggregation +
  argmax + a vectorized re-segmentation pass over the vocab DataFrame.
  Both paths share ONE ``_merge_word`` function, so greedy left-to-right
  merge semantics cannot diverge.
- ``bpe_segment_words`` — apply trained merges (HF-style lowest-rank-
  first) to a vocab table; joining corpus words against it gives
  tokenized text without ever re-running merges over raw documents.

Determinism: ties on pair count break lexicographically on the pair —
the merge SEQUENCE is a pure function of the corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace words — the single corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _symbols(word: str) -> list[str]:
    return list(word) + [END]


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right single-pair merge (the BPE step). Shared by
    the driver and distributed paths so semantics cannot diverge."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_counts(vocab: list[tuple[list[str], int]]) -> Counter:
    c: Counter = Counter()
    for syms, n in vocab:
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += n
    return c


def _train_bpe_python(
    vocab: list[tuple[list[str], int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic: count desc, then pair lexicographic asc
        (left, right), top = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if top < min_pair_count:
            break
        merges.append((left, right, top))
        vocab = [
            (_merge_word(s, left, right) if left in s and right in s else s, n)
            for s, n in vocab
        ]
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    vocab_threshold: int = 500_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge table [(left, right, pair_count)].

    The distributed loop (vocab above ``vocab_threshold``) keeps the
    vocabulary as a cached DataFrame of (symbols array, count); each
    iteration is (1) one weighted adjacent-pair aggregation — shuffle
    bounded by the distinct-pair count, far below vocab size — (2) a
    2-row-bounded ``orderBy().limit(1)`` argmax, (3) one Arrow pass
    re-segmenting only words containing both symbols. Lineage is cut
    every few iterations with ``localCheckpoint`` (durable
    ``checkpoint()`` on a cluster). ``vocab_threshold=0`` forces it
    (used by the path-equality test)."""
    wc = word_counts(docs, text_col)
    n_vocab = wc.count()
    if n_vocab == 0:
        return []
    if n_vocab <= vocab_threshold:
        rows = wc.collect()
        vocab = [(_symbols(r["word"]), int(r["n"])) for r in rows]
        return _train_bpe_python(vocab, n_merges, min_pair_count)
    return _train_bpe_distributed(wc, n_merges, min_pair_count)


def _train_bpe_distributed(
    wc: DataFrame, n_merges: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    import pandas as pd

    spark = wc.sparkSession
    vocab = wc.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
        F.col("n"),
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        pairs = (
            # fully-merged single-symbol words carry no pairs — and
            # sequence(0, size-2) for size=1 is the DESCENDING [0,-1],
            # which would index out of bounds, so the filter is
            # correctness, not just pruning
            vocab.filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] as l, syms[i+1] as r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not top or int(top[0]["cnt"]) < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((left, right, cnt))

        def reseg(batches, left=left, right=right):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "syms": [
                            _merge_word(list(s), left, right)
                            if left in s and right in s
                            else list(s)
                            for s in pdf["syms"]
                        ],
                        "n": pdf["n"].to_numpy(),
                    }
                )

        vocab = vocab.mapInPandas(reseg, schema="syms array<string>, n long")
        if (it + 1) % 5 == 0:
            vocab = vocab.localCheckpoint()
    _ = spark  # session handle kept for symmetry with other operators
    return merges


def bpe_segment_words(
    wc: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Segment each vocab word with the trained merges (lowest-rank
    pair first — the standard apply rule, equivalent to replaying the
    training merges in order). Returns (word, n, tokens array,
    n_tokens). Tokenizing a corpus is then a JOIN of its words against
    this table — the merges never re-run over raw text."""
    import pandas as pd

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def seg(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = []
            for w in pdf["word"]:
                syms = _symbols(w)
                while len(syms) > 1:
                    best = min(
                        (
                            (ranks[(a, b)], (a, b))
                            for a, b in zip(syms, syms[1:])
                            if (a, b) in ranks
                        ),
                        default=None,
                    )
                    if best is None:
                        break
                    syms = _merge_word(syms, best[1][0], best[1][1])
                toks.append(syms)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n": pdf["n"].to_numpy(),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return wc.mapInPandas(
        seg, schema="word string, n long, tokens array<string>, n_tokens int"
    )
