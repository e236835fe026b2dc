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


#: Canonical NaN magnitude slot for the IEEE-754 order encode — one past
#: +Inf's magnitude (0x7FF0…), matching Spark's NaN-greatest sort order.
DOUBLE_NAN_SLOT = 0x7FF8000000000000
_DOUBLE_INF_MAG = 0x7FF0000000000000


def double_order_long(col: Column | str) -> Column:
    """Order-isomorphic BIGINT encode of a float/double column — longs
    compare exactly like Spark orders the doubles (-Inf < negatives <
    ±0.0 < positives < +Inf < NaN; ±0.0 tie; every NaN payload ties at
    the canonical slot; null stays null).

    Equivalent to sign-magnitude folding of ``Double.doubleToLongBits``
    but built from DETERMINISTIC arithmetic only — Catalyst marks the
    ``reflect()`` route non-deterministic, which bans it from aggregates
    (the rank-pack's min/max pre-job) and blocks pushdown/reordering
    around it. Construction, all steps exact:

      * exponent: ``floor(log2(|d|))`` estimate corrected by comparing
        against exact ``pow(2, e)`` boundaries (log2's ≤1-ulp error on a
        ≤11-bit result moves the floor at most ±1);
      * mantissa: ``(|d| / 2^e − 1) × 2^52`` — the division is a pure
        exponent shift (exact for normal results), the subtraction is
        exact by Sterbenz's lemma on [1,2), and the multiply is a
        power-of-two scale of a ≤52-bit value (an exact integer);
      * subnormals: ``|d| × 2^537 × 2^537`` (two exact power-of-two
        scalings; a single 2^1074 factor would overflow to +Inf);
      * fold: magnitude for d ≥ 0, −magnitude for d < 0.

    Exactness vs the bit-twin :func:`double_order_long_py` is pinned on
    a 3k-value corpus (subnormals, binade edges, ±0, ±Inf, random NaN
    payloads) by tests/test_float_order_encode.py. FloatType input
    widens to double first (exact)."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    absd = F.abs(d)
    e0 = F.floor(F.log2(absd)).cast("int")
    e1 = (
        F.when(absd >= F.pow(F.lit(2.0), (e0 + 1).cast("double")), e0 + 1)
        .when(absd < F.pow(F.lit(2.0), e0.cast("double")), e0 - 1)
        .otherwise(e0)
    )
    m_norm = (
        (absd / F.pow(F.lit(2.0), e1.cast("double")) - F.lit(1.0))
        * F.lit(2.0**52)
    ).cast("long")
    m_sub = (absd * F.lit(2.0**537) * F.lit(2.0**537)).cast("long")
    mag = (
        F.when(absd == F.lit(float("inf")), F.lit(_DOUBLE_INF_MAG))
        .when(absd < F.lit(2.0**-1022), m_sub)
        .otherwise((e1.cast("long") + F.lit(1023)) * F.lit(1 << 52) + m_norm)
    )
    signed = F.when(d >= 0, mag).otherwise(-mag)
    out = (
        F.when(F.isnan(d), F.lit(DOUBLE_NAN_SLOT))
        .when(d == F.lit(0.0), F.lit(0).cast("long"))
        .otherwise(signed)
    )
    return F.when(d.isNull(), F.lit(None).cast("long")).otherwise(out)


def string_prefix_order_long(col: Column | str, skip: int, nbytes: int) -> Column:
    """BIGINT encode of a UTF-8 byte WINDOW of a string column: bytes
    ``[skip, skip+nbytes)`` read big-endian, right-padded with 0x00
    (null stays null). Built for the rank-pack's wide-string fields
    (operators/sort._composite_key, r11 verdict item 4).

    Guarantees, in increasing strength:

      * MONOTONE (non-strict) whenever every value in the domain shares
        a common prefix of ≥ ``skip`` bytes — the window compare is then
        a prefix of Spark's UTF8 byte-wise string compare, and right-
        padding cannot invert it (a proper-prefix value sorts lowest and
        encodes lowest);
      * ORDER-ISOMORPHIC (strict) when additionally the window is
        INJECTIVE over the distinct values. Injectivity is exactly
        checkable with one aggregate — ``countDistinct(s) ==
        countDistinct(encode(s))`` — which is the caller's obligation;
        the shared-prefix premise comes free from a min/max agg (every
        value between min and max shares their common byte prefix).

    ``nbytes ≤ 7`` so the code fits a non-negative signed long with
    bits to spare for pack neighbors. All deterministic JVM expressions
    (encode → substring → hex → rpad → conv), so the encode is safe
    inside aggregates and under Catalyst reordering, like
    :func:`double_order_long`. Bit-twin: :func:`string_prefix_order_long_py`,
    pinned on an adversarial corpus by tests/test_string_prefix_encode.py."""
    if not 1 <= nbytes <= 7:
        raise ValueError(f"nbytes must be in [1, 7], got {nbytes}")
    c = F.col(col) if isinstance(col, str) else col
    win = F.substring(F.encode(c, "UTF-8"), skip + 1, nbytes)
    # rpad-ing the HEX with '0' right-pads the BYTES with 0x00 — the
    # left-shift that keeps shorter windows comparable to longer ones
    hexs = F.rpad(F.hex(win), 2 * nbytes, "0")
    return F.conv(hexs, 16, 10).cast("long")


def string_prefix_order_long_py(s, skip: int, nbytes: int) -> int | None:
    """Driver-side bit-twin of :func:`string_prefix_order_long` for
    collected boundary strings (py4j transfers str values losslessly;
    both sides window the UTF-8 bytes)."""
    if s is None:
        return None
    b = str(s).encode("utf-8")[skip : skip + nbytes]
    return int.from_bytes(b + b"\x00" * (nbytes - len(b)), "big")


def double_order_long_py(v) -> int | None:
    """Driver-side bit-twin of :func:`double_order_long` for collected
    boundary floats (py4j transfers IEEE-754 doubles bit-exactly, so
    ``struct`` sees the same 64 bits the JVM holds)."""
    import math
    import struct

    if v is None:
        return None
    v = float(v)
    if math.isnan(v):
        return DOUBLE_NAN_SLOT
    if v == 0.0:  # fold -0.0 with +0.0, like Spark's sort order does
        return 0
    bits = struct.unpack(">q", struct.pack(">d", v))[0]
    mag = bits & 0x7FFFFFFFFFFFFFFF
    return mag if bits >= 0 else -mag
