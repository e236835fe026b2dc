"""Unit pins for the driver-replica exact value hash (oracle_utils.value_hash).

These run without Spark: the hash is pure pandas/numpy. The properties
pinned here are exactly what makes `verify_driver_contract.py --exact`
able to catch the merge-order-jitter failure class the tolerance compare
cannot (r4 verdict, "What's missing" #1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.oracle_utils import value_hash


def test_order_insensitive():
    a = pd.DataFrame({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
    b = pd.DataFrame({"v": [3.5, 1.5, 2.5], "k": [3, 1, 2]})  # rows+cols shuffled
    assert value_hash(a) == value_hash(b)


def test_last_ulp_difference_detected():
    x = 0.1 + 0.2  # 0.30000000000000004
    a = pd.DataFrame({"v": [x]})
    b = pd.DataFrame({"v": [np.nextafter(x, 1.0)]})
    assert value_hash(a) != value_hash(b)
    # and tighter than repr-6: a difference far below display precision
    assert f"{x:.6g}" == f"{np.nextafter(x, 1.0):.6g}"


def test_negative_zero_distinct():
    assert value_hash(pd.DataFrame({"v": [0.0]})) != value_hash(
        pd.DataFrame({"v": [-0.0]})
    )


def test_nan_equals_null_sentinel():
    # NULL-in-int columns surface as float NaN through pandas on one side
    # and object-None on the other; both canonicalize to the sentinel
    a = pd.DataFrame({"v": np.array([1.0, np.nan])})
    b = pd.DataFrame({"v": pd.Series([1, None], dtype=object)})
    assert value_hash(a) == value_hash(b)


def test_integer_valued_float_matches_int():
    # DuckDB returns BIGINT where Spark's toPandas may give float64 (or
    # vice versa) for nullable ints; %.17g of 5.0 is "5"
    a = pd.DataFrame({"v": np.array([5.0, 7.0])})
    b = pd.DataFrame({"v": np.array([5, 7], dtype="int32")})
    assert value_hash(a) == value_hash(b)


def test_inf_distinct_from_dbl_max():
    # np.nan_to_num would alias inf with DBL_MAX; the hash must not
    import sys

    a = pd.DataFrame({"v": [np.inf, -np.inf]})
    b = pd.DataFrame({"v": [sys.float_info.max, -sys.float_info.max]})
    assert value_hash(a) != value_hash(b)
    assert value_hash(a) == value_hash(a.copy())


def test_value_change_detected_and_stable():
    a = pd.DataFrame({"k": ["x", "y"], "v": [1, 2]})
    assert value_hash(a) == value_hash(a.copy())
    b = pd.DataFrame({"k": ["x", "y"], "v": [1, 3]})
    assert value_hash(a) != value_hash(b)


def test_uint64_above_2_63_no_wrap():
    """uint64 values >= 2^63 must hash by their true value (r5 ADVICE:
    astype('int64') silently wrapped them, so 2^63 and -2^63 collided)."""
    big = np.uint64(2**63 + 7)
    a = pd.DataFrame({"v": np.array([big], dtype=np.uint64)})
    b = pd.DataFrame({"v": np.array([np.uint64(2**63 + 8)], dtype=np.uint64)})
    assert value_hash(a) != value_hash(b)
    # and the rendering equals the unbounded-int object path
    c = pd.DataFrame({"v": pd.Series([int(big)], dtype=object)})
    assert value_hash(a) == value_hash(c)


def test_datetime_tz_aware_utc_equals_naive():
    """The same instant must hash identically whether the frame carries
    tz-aware UTC or naive timestamps (r5 ADVICE: Spark toPandas vs DuckDB
    fetchdf can disagree on awareness for equal results)."""
    t = pd.Timestamp("2024-03-01 12:34:56.789")
    naive = pd.DataFrame({"ts": pd.Series([t])})
    aware = pd.DataFrame({"ts": pd.Series([t.tz_localize("UTC")])})
    shifted = pd.DataFrame(
        {"ts": pd.Series([t.tz_localize("UTC").tz_convert("America/New_York")])}
    )
    assert value_hash(naive) == value_hash(aware)
    # a different wall-clock rendering of the SAME instant also matches
    assert value_hash(naive) == value_hash(shifted)
    other = pd.DataFrame({"ts": pd.Series([t + pd.Timedelta(microseconds=1)])})
    assert value_hash(naive) != value_hash(other)
