"""operators/asof.py — randomized equivalence vs a naive per-row argmax,
plus the adversarial cases a fixture query can miss: tied timestamps,
keys with no build rows, build-only keys, and payload=tiebreak aliasing."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.operators.asof import asof_join_backward


def _random_case(seed: int, n_keys: int = 8, n_left: int = 120, n_right: int = 90):
    rng = random.Random(seed)
    # deliberately tiny ts range so timestamp TIES are common; the unique
    # tiebreak (rid) must resolve them deterministically
    left = [
        (i, rng.randrange(n_keys), rng.randrange(20)) for i in range(n_left)
    ]
    right = [
        (1000 + i, rng.randrange(n_keys), rng.randrange(20))
        for i in range(n_right)
    ]
    return left, right


def _naive_expected(left, right):
    out = {}
    for rid, k, t in left:
        best = None  # max (ts, tiebreak) strictly before (t, rid)
        for rid2, k2, t2 in right:
            if k2 == k and (t2, rid2) < (t, rid):
                if best is None or (t2, rid2) > best:
                    best = (t2, rid2)
        out[rid] = best[1] if best else None
    return out


def test_asof_matches_naive_on_random_data(spark):
    for seed in (7, 23, 99):
        lrows, rrows = _random_case(seed)
        left = spark.createDataFrame(
            [(rid, k, t) for rid, k, t in lrows], ["rid", "k", "t"]
        )
        right = spark.createDataFrame(
            [(rid, k, t) for rid, k, t in rrows], ["rid", "k", "t"]
        )
        got = {
            r.rid: r.prev
            for r in asof_join_backward(
                left, right, by=["k"], ts="t", tiebreak="rid",
                payload="rid", payload_alias="prev",
            ).collect()
        }
        want = _naive_expected(lrows, rrows)
        assert got == want, f"seed {seed}: {sum(1 for r in got if got[r] != want[r])} mismatches"


def test_asof_no_build_rows_yields_all_null(spark):
    left = spark.createDataFrame([(1, 0, 5), (2, 1, 6)], ["rid", "k", "t"])
    right = spark.createDataFrame([], "rid long, k long, t long")
    out = asof_join_backward(
        left, right, by=["k"], ts="t", tiebreak="rid", payload="rid",
        payload_alias="prev",
    )
    rows = out.collect()
    assert len(rows) == 2 and all(r.prev is None for r in rows)


def test_asof_build_only_keys_do_not_emit(spark):
    """Keys present only on the build side must not produce output rows."""
    left = spark.createDataFrame([(1, 0, 5)], ["rid", "k", "t"])
    right = spark.createDataFrame([(9, 42, 1)], ["rid", "k", "t"])
    out = asof_join_backward(
        left, right, by=["k"], ts="t", tiebreak="rid", payload="rid",
        payload_alias="prev",
    ).collect()
    assert [(r.rid, r.prev) for r in out] == [(1, None)]
