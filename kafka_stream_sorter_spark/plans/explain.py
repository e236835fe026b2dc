"""Physical-plan introspection — the scale-correctness gate.

The reference hard-codes its physical strategy (SURVEY.md §4.1); we get
ours from Catalyst, which means the *plan* is the thing to test: a filter
that doesn't reach the parquet scan, a dimension join that doesn't
broadcast, or a LIMIT that triggers a full global sort are all silent
100×-scale regressions that row-level tests cannot see. These helpers let
tests pin the plan shape.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_plan_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = physical_plan(df, mode)
    for needle in needles:
        if needle not in plan:
            raise AssertionError(f"expected {needle!r} in physical plan:\n{plan}")
    return plan


def assert_plan_lacks(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = physical_plan(df, mode)
    for needle in needles:
        if needle in plan:
            raise AssertionError(f"did not expect {needle!r} in physical plan:\n{plan}")
    return plan
