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
  never raw, to dodge session-timezone representation drift;
* **hash-safe float emission** (r4 verdict item 8): never emit round()
  — or any quantization — of a value whose computation is not
  merge-order-invariant. Spark's float partial-aggregate merge follows
  shuffle-block fetch order, so a single-pass float aggregate can land a
  different last ulp on every run; quantizing it bakes a coin-flip into
  the hashed digits whenever a group sits near a grid boundary (the
  4-rounds-red ``udf_grouped_regression``). Sanctioned patterns: (a)
  make the aggregation exact — integer/decimal sums, associative under
  any merge order — then derive floats from the exact stats with the
  same IEEE expression on both sides and quantize via
  ``floor(v*1e4+0.5)/1e4`` (never engine ``round()``: Spark rounds the
  shortest-decimal string, DuckDB the binary value) — see
  ``queries/llm.py:_REGR_ORACLE``; (b) emit rank-only contracts where
  only ordering is meaningful (``ann_vectorized``,
  operators/similarity.py); (c) emit accuracy-bound booleans for
  approximate aggregates (``agg_approx_distinct``,
  ``agg_quantiles_approx``). Enforced by tests/test_float_determinism.py.
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
    files_io,
    llm,
    relational,
    sorts,
    streaming,
    tpch,
)

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# External harnesses iterate ``queries()`` in insertion order and check only
# a prefix of it (every round so far: the first 50). Since round 6 the
# order is GENERATED, not hand-curated (r5 verdict, next-round item 2):
# ``scripts/gen_priority.py`` derives it from the CORRECTNESS_r*.json
# attestation history — queries whose code changed this round first (their
# old attestation no longer vouches for the new code), then every other
# query oldest-newest-green first — and writes the pure-data module
# ``_priority.py`` imported here. ``tests/test_registry_attestation.py``
# re-runs the derivation and fails if the committed file is stale (a new
# CORRECTNESS file landed without regeneration) or hand-edited, and bounds
# every query's attestation age at ceil(N/50)+1 rounds.
from kafka_stream_sorter_spark._priority import PRIORITY as _PRIORITY  # noqa: E402



def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"_PRIORITY names unknown queries: {missing}")
    prio = set(_PRIORITY)
    order = _PRIORITY + [n for n in QUERIES if n not in prio]
    for n in order:
        QUERIES[n] = QUERIES.pop(n)
        if n in ORACLES:
            ORACLES[n] = ORACLES.pop(n)


_reorder()
