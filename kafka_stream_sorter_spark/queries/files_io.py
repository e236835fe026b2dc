"""File-source round-trip queries — proof the CSV/JSONL surface
(sources/files.py) is lossless, including timestamps.

Shape: dump ``events`` (the one table with every interesting type:
longs, doubles, strings-with-commas via props, and a timestamp) to the
text format, read it back against the declared schema, aggregate. The
oracle computes the same aggregate over the parquet original, so the
query matches iff write∘read is the identity on every column the
aggregate touches — which is all of them.

The aggregate (not the raw table) is the query output so the comparable
result stays small while still pinning every column: counts pin row
multiplicity, the micros-sum pins ``value`` bit-exactly, min/max
formatted ``ts`` pins the timestamp round-trip to µs precision, and the
props-length sum pins string content through CSV quoting and JSON
escaping.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.functions.numeric import money_micros
from kafka_stream_sorter_spark.registry import query
from kafka_stream_sorter_spark.sources import files
from kafka_stream_sorter_spark.sources.parquet import load_table

_ROUNDTRIP_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_micros,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
       CAST(sum(len(props)) AS BIGINT) AS props_chars
FROM events
GROUP BY event_type
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(money_micros(F.col("value"))).alias("sum_value_micros"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("min_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("max_ts"),
        F.sum(F.length("props")).alias("props_chars"),
    )


def _roundtrip_dir(spark: SparkSession, fmt: str, sf_dir: str) -> str:
    """Deterministic scratch path per (session, format, sf_dir),
    overwritten on each invocation — repeated bench/verify runs within one
    session reuse one directory instead of leaking a fresh mkdtemp per
    call (the write uses mode=overwrite). The Spark application id in the
    path keeps CONCURRENT sessions from clobbering each other's round-trip
    mid-read (ADVICE r3)."""
    tag = sf_dir.strip("/").replace("/", "_")
    app_id = spark.sparkContext.applicationId
    return os.path.join(
        tempfile.gettempdir(), f"kss_{app_id}_{fmt}_roundtrip_{tag}"
    )


@query("csv_file_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def csv_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → RFC-4180 CSV files → declared-schema read → aggregate.
    Matches the parquet-side oracle iff the CSV codec round-trips every
    column (quoted multiline strings, µs timestamps) losslessly."""
    out = _roundtrip_dir(spark, "csv", sf_dir)
    files.write_table_csv(load_table(spark, sf_dir, "events"), out)
    return _roundtrip_agg(files.read_table_csv(spark, out, "events"))


@query("jsonl_file_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def jsonl_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines files → declared-schema read → aggregate.
    Same contract as csv_file_roundtrip over the JSON codec."""
    out = _roundtrip_dir(spark, "jsonl", sf_dir)
    files.write_table_jsonl(load_table(spark, sf_dir, "events"), out)
    return _roundtrip_agg(files.read_table_jsonl(spark, out, "events"))
