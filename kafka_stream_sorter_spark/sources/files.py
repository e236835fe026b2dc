"""Text-format sources/sinks (CSV, JSON-lines) — the non-parquet file
surface.

The reference's only wire format is value-only CSV rows on a Kafka topic
(``/root/reference/cmd/producer/main.go:82``); its data never touches a
self-describing format. This module is the batch-file generalization: write
any table out as CSV or JSONL and read it back against the *declared*
schema (schemas.py) — never inferred. Schema inference costs an extra full
scan of the data at 100 TB and silently drifts types (a column of integer-
looking strings becomes long); an explicit StructType keeps the read
single-pass and the types contractual.

Timestamps ride through the shared normalizer (sources/parquet.py), so a
table round-tripped through CSV/JSONL is column-for-column comparable with
its parquet original. Timestamps are serialized as ISO-8601 micros under
the UTC session timezone — lossless for the fixtures' µs precision.

Scale posture: JSONL splits by line boundaries, so a 100 TB JSONL dataset
parallelizes per ``maxPartitionBytes`` chunk like parquet does. The CSV
path does NOT: fixture text columns embed newlines, which forces
``multiLine=true``, and multiline CSV is unsplittable — each FILE is one
task. Parallelism for big CSV therefore comes from file count (the writer
emits one file per partition, so round-trips keep their fan-out), not
from intra-file splits. Both lack columnar pruning/pushdown, which is why
parquet stays the engine's primary storage and this surface exists for
interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_sorter_spark.schemas import TABLE_SCHEMAS
from kafka_stream_sorter_spark.sources.parquet import normalize_timestamps

# Lossless round-trip needs explicit timestamp formatting: Spark's CSV/JSON
# writer default truncates trailing zeros unpredictably across versions.
_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_COMMON_OPTIONS = {
    "timestampFormat": _TS_FORMAT,
    # NTZ would reintroduce the two-timestamp world; everything in this
    # engine is TimestampType under a UTC session (sources/parquet.py).
    "timestampNTZFormat": _TS_FORMAT,
}

_CSV_OPTIONS = _COMMON_OPTIONS | {
    "header": "true",
    # fixture text columns contain commas, quotes and newlines; RFC-4180
    # quoting with escaped quotes keeps the line-split parser exact
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
}


def write_table_csv(df: DataFrame, path: str) -> None:
    writer = df.write.mode("overwrite")
    for k, v in _CSV_OPTIONS.items():
        writer = writer.option(k, v)
    writer.csv(path)


def read_table_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read a CSV dump of a known table against its declared schema."""
    reader = spark.read.schema(TABLE_SCHEMAS[table])
    for k, v in _CSV_OPTIONS.items():
        reader = reader.option(k, v)
    return normalize_timestamps(reader.csv(path), table=table)


def write_table_jsonl(df: DataFrame, path: str) -> None:
    writer = df.write.mode("overwrite")
    for k, v in _COMMON_OPTIONS.items():
        writer = writer.option(k, v)
    writer.json(path)


def read_table_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read a JSON-lines dump of a known table against its declared schema."""
    reader = spark.read.schema(TABLE_SCHEMAS[table])
    for k, v in _COMMON_OPTIONS.items():
        reader = reader.option(k, v)
    return normalize_timestamps(reader.json(path), table=table)
