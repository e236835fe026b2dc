"""Edge-case behavior of custom operators: empty inputs, degenerate strings,
missing keys — the states a 100 TB run hits somewhere in some partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.operators.dedup import (
    char_ngram_hashes,
    jaccard_pairs,
    ngram_jaccard_pairs,
)
from kafka_stream_sorter_spark.operators.interval_join import interval_join_after
from kafka_stream_sorter_spark.operators.similarity import brute_force_topk_vectorized
from kafka_stream_sorter_spark.sources.parquet import load_table


def test_char_ngrams_of_short_strings_are_empty(spark):
    df = spark.createDataFrame(
        [("", ), ("a", ), ("ab", ), ("abc", ), ("abcd", )], ["s"]
    ).select(F.size(char_ngram_hashes(F.col("s"), 3)).alias("n"))
    assert [r.n for r in df.collect()] == [0, 0, 0, 1, 2]


def test_interval_join_empty_right_side(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    left = events.select("user_id", F.col("ts").alias("lts")).limit(10)
    right = events.filter(F.lit(False)).select("user_id", F.col("ts").alias("rts"))
    out = interval_join_after(
        left, right, keys=["user_id"], left_ts="lts", right_ts="rts", width_seconds=60
    )
    assert out.count() == 0


def test_jaccard_empty_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    assert jaccard_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0


def test_vectorized_ann_missing_query_ids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # query ids far outside the corpus -> no query vectors -> no results
    out = brute_force_topk_vectorized(emb, query_ids=[10**12], k=5)
    assert out.count() == 0


def test_vectorized_ann_k_larger_than_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(3)
    out = brute_force_topk_vectorized(emb, query_ids=[0], k=50)
    # at most corpus-1 neighbors, every rank unique
    rows = out.collect()
    assert 0 < len(rows) <= 2
    assert sorted({r.rank for r in rows}) == sorted(r.rank for r in rows)


def test_connected_components_chain_and_islands(spark):
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    # chain 1-2-3-4-5 (diameter > 1 forces multiple propagation rounds),
    # pair 10-11, singleton 20
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 20]], ["doc_id"])
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component_id for r in connected_dedup_groups(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_no_edges(spark):
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    nodes = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.component_id for r in connected_dedup_groups(nodes, edges).collect()}
    assert got == {i: i for i in range(5)}
