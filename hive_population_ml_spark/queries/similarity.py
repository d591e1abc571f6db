"""Similarity-search queries over ``embeddings`` — SURVEY.md §2.10."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators.similarity import cosine_topk, lsh_topk
from .registry import register


@register(
    "knn_bruteforce",
    oracle="""
WITH q AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
    SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
    FROM embeddings
),
scored AS (
    SELECT query_id, neighbor_id,
           round(list_inner_product(qv, cv)
                 / NULLIF(sqrt(list_inner_product(qv, qv))
                          * sqrt(list_inner_product(cv, cv)), 0), 9) AS cosine
    FROM c, q
    WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
WHERE rank <= 5
""",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for each query vector (vec_id % 100
    = 0). Corpus scan x broadcast queries; dot products are zip_with/
    aggregate lambda expressions — all JVM-side."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    return cosine_topk(
        emb,
        emb.filter(F.col("vec_id") % 100 == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    )


@register("ann_lsh")  # rows-only: approximate; recall vs brute force in tests
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    return lsh_topk(
        emb,
        emb.filter(F.col("vec_id") % 100 == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_planes=6,
        n_tables=6,
    )
