"""Edge-case pins for the integer-quantized regression contract.

The driver fixture only exercises well-behaved groups (~67-86 rows,
positive cents, 30-day span). These tests feed the REGISTERED queries an
adversarial events table — singleton groups, zero-variance x (den=0),
negative and boundary values, sub-second timestamp jitter — through the
real load_table path (a synthetic events.parquet in tmp_path), and
compare bit-exactly against an independent pure-Python implementation
of the documented contract (queries/llm.py _REGR_ORACLE).
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

# registry first — entering the package via queries.llm directly leaves
# llm half-initialized when registry's _reorder runs (circular import)
import kafka_stream_sorter_spark.registry  # noqa: F401
from kafka_stream_sorter_spark.queries.llm import REGR_X_ORIGIN_US

# (user_id, ts_us_since_origin, value)
_ROWS = [
    # user 1: singleton -> den=0 -> NULL slope/intercept
    (1, 5_000_000, 3.21),
    # user 2: two rows inside the SAME whole second (x quantizes equal)
    # -> den=0 -> NULL
    (2, 7_100_000, 1.00),
    (2, 7_900_000, 2.00),
    # user 3: negative + large values, wide spacing
    (3, 0, -123.45),
    (3, 86_400_000_000, 481.11),
    (3, 172_800_000_000, -0.01),
    # user 4: cent boundaries + sub-second jitter (x floor matters)
    (4, 1_999_999, 0.005),
    (4, 2_000_001, 0.015),
    (4, 3_500_000, 99.995),
    (4, 9_999_999, 100.005),
    # user 5: ordinary group
    (5, 10_000_000, 10.00),
    (5, 20_000_000, 20.00),
    (5, 30_000_000, 30.50),
    # user 6: NULL ts / NULL value rows are DROPPED before quantization
    # on all three sides (r5 ADVICE — without the shared filter the
    # pandas twin raised on NaN→int64 while the JVM twin counted the row
    # in n but skipped it in the sums); n must be 2 here
    (6, None, 1.00),
    (6, 1_000_000, None),
    (6, 2_000_000, 5.00),
    (6, 4_000_000, 7.00),
    # user 7: ONLY null rows -> no surviving row -> absent from output
    (7, None, None),
]


def _python_oracle():
    """Independent implementation of the documented contract."""
    groups: dict[int, list[tuple[int, int]]] = {}
    for uid, dx_us, value in _ROWS:
        if dx_us is None or value is None:
            continue  # contract: null ts/value rows dropped pre-quantization
        x = (dx_us) // 1_000_000  # whole seconds since origin (non-negative)
        y = math.floor(value * 100.0 + 0.5)
        groups.setdefault(uid, []).append((x, y))
    out = {}
    for uid, pts in groups.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            out[uid] = (n, None, None)
            continue
        slope_t = (float(num) / float(den)) / 100.0
        intercept_t = (float(sy) / 100.0 - slope_t * float(sx)) / float(n)
        out[uid] = (
            n,
            math.floor(slope_t * 10000.0 + 0.5) / 10000.0,
            math.floor(intercept_t * 10000.0 + 0.5) / 10000.0,
        )
    return out


def _write_events(tmp_path) -> str:
    ts = pa.array(
        [None if dx is None else REGR_X_ORIGIN_US + dx for _, dx, _ in _ROWS],
        type=pa.timestamp("us"),
    )
    table = pa.table(
        {
            "user_id": pa.array([r[0] for r in _ROWS], type=pa.int64()),
            "ts": ts,
            "value": pa.array([r[2] for r in _ROWS], type=pa.float64()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def _check(spark, sf_dir, query_name):
    from kafka_stream_sorter_spark.registry import QUERIES

    expected = _python_oracle()
    rows = QUERIES[query_name](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, slope, intercept = expected[r["user_id"]]
        assert r["n"] == n, r
        # bit-exact: == on floats, is None for the den=0 groups
        assert r["slope"] == slope, (r, slope)
        assert r["intercept"] == intercept, (r, intercept)


def test_jvm_regression_matches_python_oracle_on_edges(spark, tmp_path):
    _check(spark, _write_events(tmp_path), "udf_grouped_regression")


def test_pandas_regression_matches_python_oracle_on_edges(spark, tmp_path):
    _check(spark, _write_events(tmp_path), "udf_grouped_regression_pandas")


def test_duckdb_oracle_matches_python_oracle_on_edges(tmp_path):
    """Third side of the contract: the REGISTERED DuckDB oracle SQL on the
    same adversarial table (nulls included) agrees bit-exactly with the
    independent Python implementation — so all three engines drop null
    ts/value rows identically (r5 ADVICE)."""
    import duckdb

    from kafka_stream_sorter_spark.queries.llm import _REGR_ORACLE

    sf_dir = _write_events(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    expected = _python_oracle()
    rows = con.execute(_REGR_ORACLE).fetchall()
    assert len(rows) == len(expected)
    for uid, n, slope, intercept in rows:
        en, eslope, eintercept = expected[uid]
        assert n == en, (uid, n, en)
        assert slope == eslope, (uid, slope, eslope)
        assert intercept == eintercept, (uid, intercept, eintercept)
