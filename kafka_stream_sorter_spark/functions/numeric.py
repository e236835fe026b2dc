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


def ts_lit(lit: str) -> Column:
    """Timestamp literal (UTC session) — shared by the TPC-H and
    relational query modules so the literal-building rule exists once."""
    return F.lit(lit).cast("timestamp")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch of a timestamp column — the ONE place
    epoch extraction happens engine-wide (DuckDB twin: ``epoch_us(ts)``).

    ``F.unix_micros`` rejects TIMESTAMP_NTZ outright, and the fixtures have
    already flipped storage type once per round (nanos→micros broke 11
    queries in round 2). Casting to TIMESTAMP first is a no-op for TIMESTAMP
    input and, for NTZ input, interprets the wall-clock in the session
    timezone — pinned UTC by session.py/sources/parquet.py, which is exactly
    DuckDB's naive-as-UTC ``epoch_us`` semantics. Plans stay whole-stage
    codegen either way (cast + unix_micros are both JVM expressions)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def MONEY_MICROS_SQL(expr: str) -> str:
    """The DuckDB-side twin of :func:`money_micros`."""
    return f"CAST(floor(({expr}) * 1000000 + 0.5) AS BIGINT)"
