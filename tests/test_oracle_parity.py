"""Runs every (query, oracle) pair against DuckDB at sf0.001 — a local
replica of the driver's t2 correctness gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from kafka_stream_sorter_spark.registry import ORACLES

from .oracle_utils import run_parity


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    problems = run_parity(spark, sf_dir, name, con=duck)
    assert not problems, f"{name}: " + "; ".join(problems)
