"""Distributed topic modeling over the documents corpus (MLlib LDA).

Corpus-analysis companion to the learned-domain mixing tier
(`mix_domain_clusters` clusters EMBEDDINGS; this discovers topics from
raw token counts when no embedding column exists) — the "what is in
this crawl?" report a training-data pipeline runs before deciding
mixture weights. Reference analog: the corpus-composition diagnostics
around src/data/population_dataset.py (the reference profiles its
sensor population before training; a text corpus profiles topics).

100 TB posture:
- optimizer="online" (Hoffman et al. 2010 stochastic variational
  inference): each iteration touches ONE minibatch
  (`subsamplingRate`), never the full corpus, and the only global
  state is the k x vocab topic matrix — corpus growth raises the
  number of minibatches available, not the per-iteration cost. The
  EM optimizer (per-doc gamma state joined every iteration) is the
  wrong tool past memory scale and is deliberately not used.
- CountVectorizer vocab is explicitly bounded (`vocab_size`), so the
  fitted vocabulary broadcast stays model-sized; minDF prunes the
  hapax tail map-side during the fit's one distinct-count pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_topics(
    docs: DataFrame,
    k: int = 8,
    vocab_size: int = 4096,
    max_iter: int = 20,
    seed: int = 7,
    text_col: str = "text",
):
    """Fit (CountVectorizerModel, LDAModel) on whitespace tokens."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = docs.select(
        "*", F.split(F.col(text_col), " ").alias("__tokens")
    )
    cv = CountVectorizer(
        inputCol="__tokens",
        outputCol="__tf",
        vocabSize=vocab_size,
        minDF=2.0,
    ).fit(toks)
    counted = cv.transform(toks)
    lda = LDA(
        k=k,
        maxIter=max_iter,
        seed=seed,
        optimizer="online",
        featuresCol="__tf",
    ).fit(counted)
    return cv, lda


def topic_terms(
    docs: DataFrame,
    k: int = 8,
    n_terms: int = 5,
    vocab_size: int = 4096,
    max_iter: int = 20,
    seed: int = 7,
    text_col: str = "text",
    fitted=None,
) -> DataFrame:
    """Top-``n_terms`` terms per topic: (topic, term_rank, term,
    weight). Exactly ``k * n_terms`` rows — the fixed-size corpus
    report (describeTopics is a k-row driver-side matrix slice of the
    model, never a corpus-sized collect). Pass ``fitted=(cv, lda)``
    from :func:`fit_topics` to reuse one fit across this and
    :func:`doc_topics` — the fit is the expensive distributed stage."""
    spark = docs.sparkSession
    cv, lda = fitted or fit_topics(
        docs, k=k, vocab_size=vocab_size, max_iter=max_iter, seed=seed,
        text_col=text_col,
    )
    vocab = cv.vocabulary
    rows = []
    for r in lda.describeTopics(n_terms).collect():
        for rank, (ti, w) in enumerate(
            zip(r["termIndices"], r["termWeights"]), start=1
        ):
            rows.append((int(r["topic"]), rank, vocab[ti], float(w)))
    return spark.createDataFrame(
        rows, "topic int, term_rank int, term string, weight double"
    )


def doc_topics(
    docs: DataFrame,
    k: int = 8,
    vocab_size: int = 4096,
    max_iter: int = 20,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    fitted=None,
) -> DataFrame:
    """Per-document dominant topic: (id, topic, topic_weight). The
    transform is a map-side matvec against the broadcast topic matrix
    — no shuffle beyond the fit itself. Pass ``fitted=(cv, lda)`` to
    reuse one fit across this and :func:`topic_terms`."""
    from pyspark.ml.functions import vector_to_array

    cv, lda = fitted or fit_topics(
        docs, k=k, vocab_size=vocab_size, max_iter=max_iter, seed=seed,
        text_col=text_col,
    )
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__tokens")
    )
    scored = lda.transform(cv.transform(toks)).select(
        id_col, vector_to_array("topicDistribution").alias("__td")
    )
    pos = F.array_position(
        "__td", F.array_max("__td")
    ).cast("int") - F.lit(1)
    return scored.select(
        id_col,
        pos.alias("topic"),
        F.round(F.array_max("__td"), 9).alias("topic_weight"),
    )
