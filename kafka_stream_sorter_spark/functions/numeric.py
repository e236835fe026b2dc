"""Cross-engine-deterministic numeric helpers.

``round(double, 2)`` is NOT portable across engines at half-boundaries:
Spark rounds via Java BigDecimal.valueOf (shortest-decimal-string
semantics, so the double nearest 2.675 rounds to 2.68) while DuckDB rounds
the binary double numerically (2.67). Money expressions built from
2-decimal factors land on exact half-boundaries ~1% of the time, so any
rounded product/sum of products will eventually hash-mismatch an oracle.

The portable pattern: convert to integer micros per row —
``floor(x * 1e6 + 0.5)`` — BEFORE aggregating. Per row both engines see
bit-identical parquet doubles and apply the same IEEE ops, and a product
of ≤6-decimal factors is within an ulp of an exact integer after ×1e6, so
the +0.5/floor is unambiguous even under FMA contraction. Integer sums are
then exact (and order-independent) in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_micros(col: Column) -> Column:
    """Exact integer micros of a money-valued expression (≤6 decimal digits)."""
    return F.floor(col * 1_000_000 + 0.5).cast("long")


def MONEY_MICROS_SQL(expr: str) -> str:
    """The DuckDB-side twin of :func:`money_micros`."""
    return f"CAST(floor(({expr}) * 1000000 + 0.5) AS BIGINT)"
