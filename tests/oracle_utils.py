"""Local replica of the driver's DuckDB-oracle gate (t2), runnable at any sf.

Registers the fixture parquet files as DuckDB views, runs the oracle SQL,
and compares against the Spark result order-insensitively: columns sorted
by name, rows sorted, exact equality for non-floats, tight tolerance for
floats (the real driver hashes values, so any FP drift we see here must be
eliminated at the query level by rounding on both sides).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from kafka_stream_sorter_spark.schemas import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


# NULL sentinel for object columns: contains NUL bytes so no genuine query
# output string (parquet text, redaction tokens like '<NULL>', ...) can
# collide with it and mask a real NULL-vs-string difference.
NULL_SENTINEL = "\x00<NULL>\x00"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: NULL_SENTINEL
                if v is None or (isinstance(v, float) and math.isnan(v))
                else str(v)
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, rel_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # vectorized: the row-at-a-time loop cost 37 s on a 1.8M-row
            # column (None → NaN via astype, matching the old float(x) path)
            import numpy as np

            def as_float(v):
                """Object columns reach here when the OTHER side is float
                (e.g. a NULL forced one side to object): nulls become NaN,
                numeric strings convert, and anything non-numeric is
                reported as a mismatch instead of crashing astype."""
                if v.dtype.kind == "f":
                    return v.to_numpy(dtype="float64"), np.zeros(len(v), bool)
                num = pd.to_numeric(v.replace(NULL_SENTINEL, np.nan), errors="coerce")
                coerce_fail = (
                    num.isna().to_numpy()
                    & v.notna().to_numpy()
                    & (v != NULL_SENTINEL).to_numpy()
                )
                return num.astype("float64").to_numpy(), coerce_fail

            fa, fail_a = as_float(av)
            fb, fail_b = as_float(bv)
            unconvertible = int((fail_a | fail_b).sum())
            if unconvertible:
                problems.append(
                    f"column {c}: {unconvertible} non-numeric values in a float compare"
                )
            not_both_nan = ~(np.isnan(fa) & np.isnan(fb))
            neq = fa != fb
            # symmetric tolerance (|a-b| <= rtol*max(|a|,|b|)), matching the
            # pre-vectorization math.isclose semantics — np.isclose alone is
            # asymmetric (scales rtol by |b| only) and would be stricter
            # whenever the Spark value's magnitude exceeds the oracle's
            with np.errstate(invalid="ignore"):
                # non-finite values must match exactly: inf-vs-finite and
                # inf-vs--inf give |a-b| = inf <= rtol*inf and would count
                # as "close" under the bare tolerance formula
                both_finite = np.isfinite(fa) & np.isfinite(fb)
                close = (fa == fb) | (
                    both_finite
                    & (
                        np.abs(fa - fb)
                        <= np.maximum(rel_tol * np.maximum(np.abs(fa), np.abs(fb)), 1e-12)
                    )
                )
            bad = int((not_both_nan & neq & ~close).sum())
            if bad:
                problems.append(f"column {c}: {bad} float mismatches beyond tol")
            exact_bad = int((not_both_nan & neq).sum())
            if exact_bad and not bad:
                problems.append(f"column {c}: {exact_bad} values differ in exact bits (round on both sides!)")
        else:
            mask = av.astype(str) != bv.astype(str)
            neq = mask.sum()
            if neq:
                idx = mask.idxmax()
                problems.append(f"column {c}: {neq} mismatches, first at row {idx}: spark={av[idx]!r} duck={bv[idx]!r}")
    return problems


def value_hash(pdf: pd.DataFrame) -> str:
    """Driver-replica value hash: order-insensitive (columns sorted by
    name, rows sorted by their canonical string tuple), EXACT — floats
    are rendered with %.17g so every distinct float64 bit pattern except
    NaN payloads gets a distinct string (-0.0 ≠ 0.0, last-ulp differences
    count). The real driver hashes values after the same sort; any
    run-to-run jitter in this hash is exactly the failure class that
    stayed invisible to the tolerance compare for two rounds
    (udf_grouped_regression, r3-r4 verdicts)."""
    import hashlib

    import numpy as np

    df = pdf[sorted(pdf.columns)]
    canon = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        kind = s.dtype.kind
        if kind == "f":
            # NaN canonicalizes to the NULL sentinel: a NULL in an int
            # column surfaces as float64-NaN through pandas on one side
            # and sometimes object-None on the other, and the driver's
            # hash treats them alike; genuine result NaNs then also
            # compare engine-to-engine as equal, which is what we want.
            v = s.to_numpy(dtype="float64")
            # object dtype, NOT np.where over the formatted array: numpy
            # would coerce to a fixed-width unicode dtype sized to the
            # longest %.17g output and silently truncate the sentinel.
            # Format the RAW values (%.17g renders inf/-inf faithfully —
            # nan_to_num would alias inf with DBL_MAX) and patch only the
            # NaN positions afterwards.
            formatted = np.char.mod("%.17g", v).astype(object)
            formatted[np.isnan(v)] = NULL_SENTINEL
            canon[c] = formatted
        elif kind == "i":
            canon[c] = s.astype("int64").map(str)
        elif kind == "u":
            # NOT astype('int64'): values >= 2^63 would silently wrap and
            # two genuinely different uints could collide (r5 ADVICE);
            # Python ints are unbounded, so render via the object path
            canon[c] = s.map(
                lambda v: NULL_SENTINEL if pd.isna(v) else str(int(v))
            )
        elif kind == "b":
            canon[c] = s.map(lambda b: "T" if b else "F")
        elif kind == "M":  # datetime64
            # normalize to UTC-naive first: Spark toPandas and DuckDB
            # fetchdf can disagree on tz-awareness for the same instant,
            # and isoformat() of aware-vs-naive differs (r5 ADVICE; repo
            # policy already bans raw timestamp emission — belt and
            # suspenders for any future slip)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            canon[c] = s.map(lambda t: NULL_SENTINEL if pd.isna(t) else t.isoformat())
        else:
            canon[c] = s.map(
                lambda v: NULL_SENTINEL
                if v is None or (isinstance(v, float) and math.isnan(v))
                else str(v)
            )
    canon = canon.sort_values(by=list(canon.columns), kind="mergesort")
    h = hashlib.sha256()
    h.update(("\x01".join(canon.columns) + "\x02").encode())
    for row in canon.itertuples(index=False, name=None):
        h.update(("\x01".join(row) + "\x02").encode())
    return h.hexdigest()


def run_parity(spark, sf_dir: str, name: str, con=None) -> list[str]:
    """``con``: pass a shared duck_connect(sf_dir) connection to skip the
    per-call connect + 10 CREATE VIEWs (the parametrized parity suite runs
    ~120 of these)."""
    from kafka_stream_sorter_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    own = con is None
    if own:
        con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(ORACLES[name]).fetchdf()
    finally:
        if own:
            con.close()
    return compare_frames(spark_pdf, duck_pdf)
