"""Similarity-search oracle suite over the `embeddings` table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.similarity import cosine_topk, cosine_topk_lsh
from ..registry import query
from ..schema import load_table


@query(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    e AS (
      SELECT vec_id AS neighbor_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      FROM embeddings
    )
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim FROM (
      SELECT query_id, neighbor_id,
             list_cosine_similarity(qv, ev) AS sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_cosine_similarity(qv, ev) DESC, neighbor_id
             ) AS rank
      FROM q JOIN e ON query_id <> neighbor_id
    ) WHERE rank <= 5
    """,
)
def sim_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-5 for 10 query vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=5)


@query("sim_cosine_topk_lsh")  # approximate: rows-only check
def sim_cosine_topk_lsh(spark, sf_dir):
    """Hyperplane-LSH-bucketed approximate top-5 (the scale path:
    bucketed equi-join instead of a cross join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_lsh(emb, queries, k=5)
