"""Fixture-drift tripwire.

Rounds 1 AND 2 were each lost to the same silent change: the driver
regenerated ``events.parquet`` with a different physical timestamp type
(nanos → micros), and the failure surfaced as 11 cryptic driver-side
errors instead of one readable test failure. These tests pin:

1. the *physical* parquet footer types of every fixture column (via
   pyarrow, no Spark involved) to the set the engine's normalizer
   (sources/parquet.normalize_timestamps) is known to handle, and
2. the *logical* Spark-side schema after ``load_table`` against the
   declared StructTypes in schemas.py — the engine's one-timestamp-world
   contract (everything time-ish is TimestampType under a UTC session).

If the fixtures flip type again, this file fails with the new type named,
before any query or driver run does.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from kafka_stream_sorter_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

# Physical types normalize_timestamps handles for a time-valued column.
# (pyarrow spellings; tz-tagged micros read as Spark TIMESTAMP directly.)
_OK_TS_TYPES = {
    "timestamp[ns]",
    "timestamp[us]",
    "timestamp[ms]",
    "timestamp[us, tz=UTC]",
    "timestamp[ns, tz=UTC]",
}

_TS_COLUMNS = {
    ("events", "ts"),
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
}

_SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf", _SF_DIRS)
@pytest.mark.parametrize("table", TABLE_NAMES)
def test_physical_footer_types(sf, table):
    path = os.path.join(sf, f"{table}.parquet")
    schema = pq.read_schema(path)
    declared = TABLE_SCHEMAS[table]
    assert schema.names == [f.name for f in declared.fields], (
        f"{path}: column set/order drifted: footer={schema.names} "
        f"declared={[f.name for f in declared.fields]}"
    )
    for field in schema:
        phys = str(field.type)
        if (table, field.name) in _TS_COLUMNS:
            assert phys in _OK_TS_TYPES, (
                f"FIXTURE DRIFT: {path} column {field.name!r} is now physical "
                f"{phys!r}, which normalize_timestamps has never been tested "
                f"against (handled: {sorted(_OK_TS_TYPES)}). Extend "
                f"sources/parquet.normalize_timestamps AND this allowlist."
            )


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_spark_schema_after_load_matches_declared(spark, sf_dir, table):
    from kafka_stream_sorter_spark.sources.parquet import load_table

    got = load_table(spark, sf_dir, table).schema
    declared = TABLE_SCHEMAS[table]
    got_types = [(f.name, f.dataType.simpleString()) for f in got.fields]
    want_types = [(f.name, f.dataType.simpleString()) for f in declared.fields]
    assert got_types == want_types, (
        f"load_table({table!r}) logical schema drifted from schemas.py: "
        f"got={got_types} declared={want_types} — if the fixture changed "
        f"physical type, fix normalize_timestamps, not the queries."
    )


def test_session_timezone_pinned_utc(spark, sf_dir):
    """normalize_timestamps' NTZ→TIMESTAMP cast is only DuckDB-equivalent
    under a UTC session timezone; load_table must pin it."""
    from kafka_stream_sorter_spark.sources.parquet import load_table

    load_table(spark, sf_dir, "events")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_regression_comoment_int64_headroom():
    """Fail-first guard for the merge-order-invariant regression contract
    (queries/llm.py _REGR_ORACLE): its five co-moment sums and the
    num/den combinations are computed in BIGINT, which is exact only
    while every intermediate stays within int64. On the current fixtures
    the largest magnitude is ~5e16 (~180x headroom), but a regenerated
    events fixture with a much wider ts span or larger values could
    silently overflow — under ANSI that is a runtime error on the
    driver, without ANSI a wrong answer. This test computes the actual
    per-group maxima via DuckDB and requires 2x headroom; if it fires,
    rescale x (e.g. whole minutes instead of seconds) or y in BOTH the
    Spark queries and _REGR_ORACLE — the contract is symmetric, so any
    consistent rescale keeps exactness."""
    import duckdb

    # registry first: queries.llm imports the registry module, which
    # imports every query module — entering via llm directly would leave
    # llm half-initialized when registry's _reorder runs (circular import)
    import kafka_stream_sorter_spark.registry  # noqa: F401
    from kafka_stream_sorter_spark.queries.llm import REGR_X_ORIGIN_US

    limit = (1 << 63) // 2  # int64 max with 2x headroom
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        row = duckdb.sql(
            f"""
            WITH q AS (
              SELECT user_id,
                     CAST(floor((epoch_us(ts) - {REGR_X_ORIGIN_US}) / 1000000.0) AS BIGINT) AS x,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
              FROM read_parquet('{path}')
            ), s AS (
              SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x*y) AS HUGEINT) AS sxy, CAST(sum(x*x) AS HUGEINT) AS sxx
              FROM q GROUP BY user_id
            )
            SELECT max(greatest(abs(n*sxy), abs(sx*sy), abs(n*sxx), abs(sx*sx),
                                abs(sxy), abs(sxx), abs(sx), abs(sy))) AS peak
            FROM s
            """
        ).fetchone()
        peak = int(row[0])
        assert peak < limit, (
            f"{sf}: regression co-moment peak {peak:.3e} exceeds int64/2 "
            f"({limit:.3e}) — the fixture's ts span or value range grew; "
            "rescale x/y in queries/llm.py (_REGR_ORACLE + both queries) "
            "before trusting any regression row"
        )
