"""Registry-wide forbidden-shape audit (r6 verdict stretch #6, made
systemic): every BATCH query's physical plan — planning only, nothing
executed — is checked for the shapes that kill a 100 TB run:

- ``InMemoryTableScan``: a convenience persist. The r5 keyed_fanout bug
  (an unreleasable cache of the full sorted table) is exactly this class;
  after the r6 rewrite the repo-wide count is zero and this test keeps it
  there for all queries, not just the window-bearing six that
  test_plans.py::test_window_queries_forbidden_shapes pins.
- ``CartesianProduct``: an unblocked all-pairs join. Zero repo-wide —
  even the documented exact-ANN baseline broadcasts its k-row query side
  (BroadcastNestedLoopJoin, allowlisted below), it never cartesians.
- ``Exchange SinglePartition``: a window/limit/agg that serializes the
  whole table through one task. Zero repo-wide (top-k goes through
  TakeOrderedAndProject; the one unpartitioned window in
  token_frequencies runs post-limit over ≤ top_n rows and plans without
  a single-partition exchange).
- Python eval nodes anywhere but the deliberate, PLANS.md-documented
  Arrow surfaces. ``BatchEvalPython`` (row-at-a-time) is allowed ONLY in
  the UDTF extension-point demo — a UDTF has no Arrow variant.

Streaming queries are excluded: their plans only exist inside a running
query and are audited by tests/test_streaming_*.
"""

from __future__ import annotations

import pytest

from kafka_stream_sorter_spark.registry import QUERIES

# marker -> query names where it is the documented design (PLANS.md
# "deliberate Arrow surfaces"); anything else is a regression.
_PYTHON_ALLOWLIST = {
    "ArrowEvalPython": {"udf_scalar_pandas"},
    "BatchEvalPython": {"udtf_tokenize"},
    "MapInPandas": {
        "multimodal_meta",
        "multimodal_resize",
        "multimodal_byte_hist",
        "ann_vectorized",
    },
    "FlatMapGroupsInPandas": {"udf_grouped_regression_pandas"},
    "PythonMapInArrow": set(),
}

# BroadcastNestedLoopJoin is legitimate exactly where the joined side is
# a tiny broadcast relation: the two TPC-H scalar-subquery shapes (one
# aggregated row) and the exact-ANN baseline (k query vectors).
_BNLJ_ALLOWLIST = {"tpch_q11_value_parts", "tpch_q22_idle_balance", "ann_bruteforce"}


def _batch_queries():
    return [n for n in QUERIES if not n.startswith("stream_")]


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    """One plan string per batch query, planned (not executed) once for
    the whole module. Queries with eager driver-side pre-jobs (boundary
    samples, k-means training) run those at sf0.001 — cheap."""
    from kafka_stream_sorter_spark.plans import physical_plan

    out = {}
    for name in _batch_queries():
        out[name] = physical_plan(QUERIES[name](spark, sf_dir))
    return out


def test_no_convenience_persist(plans):
    bad = [n for n, p in plans.items() if "InMemoryTableScan" in p]
    assert not bad, f"InMemoryTableScan (unreleasable at scale): {bad}"


def test_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"CartesianProduct (all-pairs join): {bad}"


def test_no_single_partition_exchange(plans):
    bad = [n for n, p in plans.items() if "Exchange SinglePartition" in p]
    assert not bad, f"Exchange SinglePartition (serializes the table): {bad}"


def test_bnlj_only_where_broadcast_side_is_tiny(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in _BNLJ_ALLOWLIST
    ]
    assert not bad, f"BroadcastNestedLoopJoin outside the documented trio: {bad}"


def test_python_only_at_documented_arrow_surfaces(plans):
    bad = []
    for name, plan in plans.items():
        for marker, allowed in _PYTHON_ALLOWLIST.items():
            if marker in plan and name not in allowed:
                bad.append(f"{name}: {marker}")
    assert not bad, (
        "Python eval nodes outside the PLANS.md-documented surfaces "
        f"(row-at-a-time Python in a hot path?): {bad}"
    )


def test_allowlists_stay_honest(plans):
    """The allowlists must not rot into superset permissions: every
    allowlisted (query, marker) pair must still actually plan with that
    marker, or the entry is stale and should be deleted."""
    stale = []
    for marker, allowed in _PYTHON_ALLOWLIST.items():
        for name in allowed:
            if marker not in plans[name]:
                stale.append(f"{name}: {marker}")
    stale += [n for n in _BNLJ_ALLOWLIST if "BroadcastNestedLoopJoin" not in plans[n]]
    assert not stale, f"allowlist entries no longer present in plans: {stale}"
