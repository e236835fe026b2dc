from __future__ import annotations

import re

from kafka_stream_sorter_spark.schemas import CONTINENTS
from kafka_stream_sorter_spark.sources.generator import (
    parse_csv_lines,
    reference_csv_lines,
    reference_records,
)

N = 2000


def test_generator_shapes_match_reference_spec(spark):
    """Value ranges from /root/reference/internal/data/generator.go:10-42."""
    rows = reference_records(spark, N, seed=42).collect()
    assert len(rows) == N
    for r in rows[:500]:
        assert 0 <= r["id"] < 2**31
        assert 10 <= len(r["name"]) <= 15 and re.fullmatch(r"[A-Za-z]+", r["name"])
        assert 15 <= len(r["address"]) <= 20 and re.fullmatch(r"[A-Za-z0-9 ]+", r["address"])
        assert r["continent"] in CONTINENTS


def test_generator_deterministic_across_parallelism(spark):
    a = sorted(map(tuple, reference_records(spark, 500, seed=7, num_partitions=1).collect()))
    b = sorted(map(tuple, reference_records(spark, 500, seed=7, num_partitions=8).collect()))
    assert a == b
    c = sorted(map(tuple, reference_records(spark, 500, seed=8).collect()))
    assert a != c


def test_csv_roundtrip(spark):
    lines = reference_csv_lines(spark, 300, seed=42)
    parsed = parse_csv_lines(lines)
    orig = sorted(map(tuple, reference_records(spark, 300, seed=42).collect()))
    back = sorted(map(tuple, parsed.collect()))
    assert orig == back


def test_all_continents_covered(spark):
    rows = reference_records(spark, N, seed=42).select("continent").distinct().collect()
    assert {r["continent"] for r in rows} == set(CONTINENTS)
