"""Randomized pure-Python replica of the MinHash/banding pipeline: any
silent drift in hash constants, permutation arity handling, or fold order
breaks bit-equality here before it breaks an oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.functions.text_hash import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    P,
    band_bucket,
    minhash_signature,
    token_hashes,
)


def _py_char_hash(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % P
    return acc


def _py_signature(text: str) -> list[int]:
    toks = sorted(set(text.strip().lower().split()))
    # cube premix (text_hash._cube_mix): h^3 mod P before the linear perms
    hs = [pow(_py_char_hash(t), 3, P) for t in toks]
    return [min((h * a + b) % P for h in hs) for a, b in zip(MINHASH_A, MINHASH_B)]


def _py_bands(sig: list[int]) -> list[int]:
    out = []
    for b in range(LSH_BANDS):
        acc = 0
        for mh in sig[b * LSH_ROWS : (b + 1) * LSH_ROWS]:
            acc = (acc * 31 + mh) % P
        out.append(acc)
    return out


def test_minhash_and_bands_match_python_replica(spark):
    rng = random.Random(17)
    vocab = [f"tok{i}" for i in range(40)] + ["a", "zz", "Hello", "WORLD"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for _ in range(50)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    sig_cols = minhash_signature(token_hashes(toks))
    bands = [
        band_bucket(sig_cols[b * LSH_ROWS : (b + 1) * LSH_ROWS]).alias(f"band{b}")
        for b in range(LSH_BANDS)
    ]
    rows = {
        r.i: r
        for r in df.select(
            "i", *[c.alias(f"mh{j}") for j, c in enumerate(sig_cols)], *bands
        ).collect()
    }
    for i, text in enumerate(texts):
        want_sig = _py_signature(text)
        got_sig = [rows[i][f"mh{j}"] for j in range(len(MINHASH_A))]
        assert got_sig == want_sig, f"doc {i}: signature drift"
        want_bands = _py_bands(want_sig)
        got_bands = [rows[i][f"band{b}"] for b in range(LSH_BANDS)]
        assert got_bands == want_bands, f"doc {i}: band drift"


def test_simhash_matches_python_replica(spark):
    """SimHash (explode×bits → two-level agg) vs a bit-for-bit Python
    replica over random docs: pins the mask family and the sign-sum
    semantics against drift."""
    import random

    from kafka_stream_sorter_spark.operators.dedup import simhash

    rng = random.Random(29)
    vocab = [f"tok{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20)))
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}

    def py_simhash(text: str, bits: int = 16) -> int:
        toks = sorted(set(text.strip().lower().split()))
        hs = [_py_char_hash(t) for t in toks]
        out = 0
        for b in range(bits):
            mask = 1 << b
            sv = sum(1 if (h & mask) else -1 for h in hs)
            if sv >= 0:
                out |= mask
        return out

    for i, t in enumerate(texts):
        assert got[i] == py_simhash(t), f"doc {i}: simhash drift"


def test_lsh_recall_on_sequential_token_sets(spark):
    """STATISTICAL guard, not bit-equality: planted J=0.9 pairs built from
    sequential-suffix tokens ("w{id}_{i}" — the templated/log-line shape a
    web corpus contains) must be recovered at ~the banding-theory rate
    1-(1-0.9^4)^4 = 0.986. Before the h^3 premix (functions/text_hash.py
    _cube_mix) the linear permutation family measured 0.81 recall on this
    exact shape at 1M docs (scripts/probe_dedup_recall.py, SCALING.md
    round-7) — this test fails on that regression while 5-sigma-tolerant
    of binomial noise at n=300 planted pairs."""
    from kafka_stream_sorter_spark.operators.dedup import minhash_lsh_pairs

    n_pairs, t, m = 300, 95, 5  # exact Jaccard (95-5)/(95+5) = 0.9
    rows = []
    for i in range(n_pairs):
        base = [f"w{i}_{k}" for k in range(t)]
        twin = base[: t - m] + [f"x{i}_{k}" for k in range(m)]
        rows.append((i, " ".join(base)))
        rows.append((i + 100_000, " ".join(twin)))
    for i in range(2_000):  # background docs, token-disjoint
        rows.append((200_000 + i, " ".join(f"b{i}_{k}" for k in range(t))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).selectExpr(
        "doc_id", "text", "'en' AS lang", "CAST(length(text) AS LONG) AS n_chars"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.85).collect()
    }
    found = sum((i, i + 100_000) in got for i in range(n_pairs))
    assert found / n_pairs >= 0.95, (
        f"LSH recall {found}/{n_pairs} on sequential-token J=0.9 pairs — "
        "min-wise independence regressed (theory 0.986)"
    )
