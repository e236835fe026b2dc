"""Query registry — the engine's declared surface (SURVEY.md §2.C).

Each entry pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame``
with an ANSI-SQL oracle string DuckDB runs on the same parquet fixtures.
Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing).

Determinism rules applied throughout (see ``queries/`` modules):
* every ORDER BY carries a unique tie-break column (the reference leaves
  ties nondeterministic — SURVEY.md §2.B last row);
* floating-point results of arithmetic are ``round``-ed the same way on
  both sides (raw stored doubles pass through unrounded — same bits);
* timestamps are emitted as formatted strings, dates, or extracted ints,
  never raw, to dodge session-timezone representation drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver runs a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from kafka_stream_sorter_spark.queries import (  # noqa: E402,F401
    llm,
    relational,
    sorts,
    streaming,
    tpch,
)
