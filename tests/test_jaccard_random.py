"""Randomized equivalence for the prefix-filtered + positional-filtered
Jaccard dedup (operators/dedup.py) against a naive Python computation.
The PPJoin positional filter's no-false-negative argument is subtle
(it must hold at each pair's FIRST common prefix item); random corpora
with dense near-dups exercise it far beyond the fixture's constructed
cases. Word-level and char-ngram variants both checked."""

from __future__ import annotations

import itertools
import random

from kafka_stream_sorter_spark.operators.dedup import jaccard_pairs, ngram_jaccard_pairs


def _random_docs(seed: int, n_docs: int = 36):
    """Small vocab + mutation-of-a-base-doc structure so J >= t pairs are
    plentiful and sit right at the threshold boundary."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(14)]
    docs = []
    base_pool = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(9, 13)))
        for _ in range(6)
    ]
    for i in range(n_docs):
        if rng.random() < 0.6:
            words = rng.choice(base_pool).split()
            # mutate 0-2 positions: near-dups at varying similarity
            for _ in range(rng.randint(0, 2)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            text = " ".join(words)
        else:
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(9, 13)))
        docs.append((i, text, "en", "s", len(text)))
    return docs


def _expected_pairs(docs, threshold, kind):
    def word_set(text):
        return set(text.strip().lower().split())

    def ngram_set(text, n=3):
        return {text[i : i + n] for i in range(len(text) - n + 1)}

    mk = word_set if kind == "word" else ngram_set
    out = set()
    for (a, ta, *_), (b, tb, *_) in itertools.combinations(docs, 2):
        sa, sb = mk(ta), mk(tb)
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and inter / union >= threshold:
            out.add((min(a, b), max(a, b)))
    return out


def _got_pairs(result_df):
    return {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in result_df.collect()}


def test_word_jaccard_matches_naive(spark):
    for seed in (3, 41):
        docs = _random_docs(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"])
        got = _got_pairs(jaccard_pairs(df, threshold=0.8))
        want = _expected_pairs(docs, 0.8, "word")
        assert got == want, f"seed {seed}: got-want={got-want} want-got={want-got}"


def test_ngram_jaccard_matches_naive(spark):
    for seed in (5,):
        docs = _random_docs(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"])
        got = _got_pairs(ngram_jaccard_pairs(df, n=3, threshold=0.8))
        want = _expected_pairs(docs, 0.8, "ngram")
        assert got == want, f"seed {seed}: got-want={got-want} want-got={want-got}"


def test_threshold_boundary_pair_not_pruned(spark):
    """ADVICE r3 (medium): with t=0.9, float64 computes (|A|+|B|)*t/(1+t)
    = 19*0.9/1.9 as 9.000000000000002, so an un-slackened ceil yields
    α=10 and the positional filter pruned this true pair: |A|=9 ⊂ |B|=10,
    J = 9/10 = 0.9 exactly at the threshold. The ε inside the ceil must
    keep it."""
    from pyspark.sql import functions as F

    from kafka_stream_sorter_spark.operators.dedup import _prefix_filtered_jaccard

    sets = spark.createDataFrame(
        [
            (1, "en", 0, list(range(1, 10))),   # |A| = 9
            (2, "en", 0, list(range(1, 11))),   # |B| = 10, superset
        ],
        "doc_id long, lang string, len_bucket long, items array<long>",
    )
    rows = _prefix_filtered_jaccard(sets, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.n_common, r.n_union) == (1, 2, 9, 10)
    assert r.jaccard == 0.9


def test_word_jaccard_matches_naive_at_exact_threshold(spark):
    """Randomized sweep at t=0.9 (the registered dedup_ngram_jaccard
    threshold, where S=na+nb multiples of 19 hit the float-ceil cliff)."""
    for seed in (7, 19):
        docs = _random_docs(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"])
        got = _got_pairs(jaccard_pairs(df, threshold=0.9))
        want = _expected_pairs(docs, 0.9, "word")
        assert got == want, f"seed {seed}: got-want={got-want} want-got={want-got}"
