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


def test_priority_matches_generator():
    """_priority.py is GENERATED (r5 verdict item 2) — re-derive it from
    the CORRECTNESS_r*.json history and the recorded CHANGED list and fail
    if the committed file is stale (a new driver correctness file landed
    without re-running scripts/gen_priority.py) or was hand-edited. Fix:
    ``python scripts/gen_priority.py --changed <this round's touched
    queries>`` and commit the regenerated file."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_priority import derive_priority, load_attestations

    from kafka_stream_sorter_spark import _priority
    from kafka_stream_sorter_spark.registry import QUERIES

    latest, _ = load_attestations(REPO)
    assert _priority.LATEST_ROUND == latest, (
        f"_priority.py was generated through round {_priority.LATEST_ROUND} "
        f"but CORRECTNESS_r{latest:02d}.json exists — run "
        f"python scripts/gen_priority.py --changed <touched queries>"
    )
    expect = derive_priority(sorted(QUERIES), _priority.CHANGED, REPO)
    assert _priority.PRIORITY == expect, (
        "_priority.py does not match its own derivation (hand-edited or "
        "generator changed) — regenerate with scripts/gen_priority.py"
    )


def test_attestation_age_bounded():
    """No registered query's newest driver-green may be older than
    ceil(N/50)+1 rounds — the rotation's steady-state bound plus one round
    of slack for code-churn promotions. A failure here means the rotation
    was skipped or mis-ordered; regenerate _priority.py and let the next
    driver round re-attest the aged names."""
    import math
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_priority import load_attestations

    from kafka_stream_sorter_spark.registry import QUERIES

    latest, newest = load_attestations(REPO)
    bound = math.ceil(len(QUERIES) / DRIVER_PREFIX) + 1
    # a query is re-attested when the round AFTER its promotion runs, so a
    # name currently in the prefix is as good as checked "next round"
    names = list(QUERIES)
    aged = {
        n: latest - newest.get(n, (0, 0))[0]
        for n in names
        if latest - newest.get(n, (0, 0))[0] > bound and n not in names[:DRIVER_PREFIX]
    }
    assert not aged, (
        f"queries whose newest driver green is older than {bound} rounds "
        f"and that are NOT queued in the driver prefix: {aged}"
    )
