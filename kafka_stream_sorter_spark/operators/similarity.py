"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Two tiers (BASELINE.json north star):
* **Brute-force exact top-k** — the correctness baseline. Cosine is a
  JVM-side ``zip_with``/``aggregate`` fold in float64 (embeddings cast up
  from float32 first: float arithmetic is NOT cross-engine stable, float64
  is to ~1e-15). Queries are broadcast against the corpus scan, so the cost
  is one pass over the vectors per query batch — no shuffle of the corpus.
* **Blocked / IVF-style top-k** — the scale path: candidates restricted to
  the query's partition (here the ``label`` column stands in for an IVF
  cluster assignment), turning all-pairs into an equi-join on the block
  key. Same pattern as LSH-bucketed ANN.

Ranking is by cosine ROUNDED to 6 decimals with vec_id tie-break, so the
top-k boundary is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns — one fused fold, no UDF."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _as_double(df: DataFrame) -> DataFrame:
    return df.withColumn("embedding", F.col("embedding").cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded)."""
    emb = _as_double(embeddings)
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def blocked_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """IVF-style ANN: candidates share the query's block (label ≙ coarse
    cluster id). The corpus-side join key makes this an ordinary shuffle
    join — per-block quadratic, never corpus-quadratic."""
    emb = _as_double(embeddings)
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    cand = emb.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").cast("long").alias("block"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
