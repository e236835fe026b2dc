"""Attestation-strategy guard: the external driver checks only the FIRST 50
registry entries per round. A query added outside that prefix silently
never gets a driver correctness row — rounds 1-2 left 17 queries
unattested this way. This test fails when a query has neither a recorded
CORRECTNESS row from a past round nor a slot in the checked prefix."""

from __future__ import annotations

import glob
import json
import os

DRIVER_PREFIX = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_attested_or_in_prefix():
    from kafka_stream_sorter_spark.registry import QUERIES

    attested: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        # a row only counts if the driver actually produced a verdict
        attested |= {k for k, v in rows.items() if isinstance(v, dict)}

    names = list(QUERIES)
    orphans = [
        q for q in names if q not in attested and q not in names[:DRIVER_PREFIX]
    ]
    assert not orphans, (
        f"queries with no driver correctness row AND outside the first "
        f"{DRIVER_PREFIX} registry entries (move them into _PRIORITY's "
        f"prefix in registry.py): {orphans}"
    )


def test_oracle_for_every_query():
    from kafka_stream_sorter_spark.registry import ORACLES, QUERIES

    missing = [q for q in QUERIES if q not in ORACLES]
    # intentional omissions (non-SQL-expressible) must be listed here
    assert missing == [], f"queries without a DuckDB oracle: {missing}"
