"""Skew-resilient aggregation — salting for heavy-hitter keys.

A groupBy on a low-cardinality / power-law key (the fixture's
``event_type`` has 5 values; the reference's ``continent`` key has 6 —
SURVEY.md §2.B "tie nondeterminism on low-cardinality keys") degenerates
at cluster scale: every row of a hot key lands on one reducer. Spark's
map-side partial aggregation already absorbs this for algebraic
aggregates; salting is the general pattern for when it can't — e.g. when
the per-key state is large (distincts, collect_list) or when AQE skew
handling isn't available. The two-stage shape:

  stage 1: groupBy(key, salt) — salt = hash(unique col) % buckets,
           so each hot key splits across `buckets` reducers
  stage 2: groupBy(key) over the ≤ buckets partial rows per key

Both stages shuffle, but stage 2 moves only ``|keys| × buckets`` rows.
Results are identical to the one-stage groupBy for decomposable
aggregates (sum/count/min/max), which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: str,
    sums: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage salted sum/count. ``sums`` maps output name → row-level
    column to sum (use exact integer micros for money — functions/numeric.py).
    ``salt_on`` must be a roughly-unique column (its hash spreads the hot
    key's rows uniformly over ``buckets`` reducers)."""
    salt = F.pmod(F.hash(F.col(salt_on)), F.lit(buckets)).alias("_salt")
    partial = (
        df.select(*keys, salt, *[c.alias(n) for n, c in sums.items()])
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(n).alias(n) for n in sums],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(n).alias(n) for n in sums],
    )
