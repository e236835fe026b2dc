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
