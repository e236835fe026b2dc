"""The portable polynomial hash is the foundation under fingerprints,
MinHash, SimHash, LSH banding, and every Jaccard oracle — pin it with a
three-way agreement check: Spark column expression ≡ pure-Python integer
arithmetic ≡ the DuckDB SQL twin, over seeded random ASCII strings plus
hand-picked edge cases."""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.functions.text_hash import (
    MINHASH_A,
    MINHASH_B,
    P,
    char_poly_hash,
    sql_char_poly_hash,
)


def py_poly_hash(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % P
    return acc


def _sample_strings() -> list[str]:
    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + " .,;!?-_'\""
    cases = ["", "a", "Z", " ", "the", "the the", "a" * 500]
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
        for _ in range(200)
    ]
    return cases


def test_spark_python_duckdb_hash_agree(spark):
    cases = _sample_strings()
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], ["i", "s"])
    got_spark = {
        r.i: r.h
        for r in sdf.select("i", char_poly_hash(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    got_duck = dict(
        con.execute(f"SELECT i, {sql_char_poly_hash('s')} FROM t").fetchall()
    )
    con.close()
    for i, s in enumerate(cases):
        expect = py_poly_hash(s)
        assert got_spark[i] == expect, f"spark mismatch on {s!r}"
        assert got_duck[i] == expect, f"duckdb mismatch on {s!r}"


def test_minhash_permutation_params_are_valid():
    # every permutation (a*h + b) % P must keep intermediates < 2^63 for
    # h < P, and the (a, b) pairs must be distinct (distinct permutations)
    assert len(MINHASH_A) == len(MINHASH_B) == 16
    assert len(set(zip(MINHASH_A, MINHASH_B))) == 16
    for a, b in zip(MINHASH_A, MINHASH_B):
        assert 0 < a < P and 0 < b < P
        assert a * (P - 1) + b < 2**63
