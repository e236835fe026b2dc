"""Kafka source/sink surface — parity with the reference's only I/O layer.

The reference reads/writes value-only CSV messages through tuned kafka-go
clients (`/root/reference/internal/kafka/client.go:10-38`). Those tunings
map one-to-one onto Spark's Kafka connector options (below). The connector
jar (spark-sql-kafka-0-10) is not bundled with plain pyspark and there is no
broker in the test environment, so every entry point is gated on
:func:`kafka_available`; the CSV encode/decode and the sort pipeline
composition are plain DataFrame code, tested broker-free against the seeded
generator (sources/generator.py).

Scale notes: a Kafka batch read resolves (earliest, latest] offsets up front
and splits topic partitions into tasks (`minPartitions` widens beyond the
topic's partition count) — the reference's single-consumer full drain
(`RangeGroupBalancer` + sole member, client.go:33-36) becomes an
embarrassingly parallel scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.sources.generator import parse_csv_lines

# Reader tuning ≙ NewReader (client.go:24-38): earliest offsets, 1 MB min /
# 32 MB max fetches.
SOURCE_OPTIONS: dict[str, str] = {
    "startingOffsets": "earliest",
    "kafka.fetch.min.bytes": str(1024 * 1024),
    "kafka.fetch.max.bytes": str(32 * 1024 * 1024),
}

# Writer tuning ≙ NewWriter (client.go:10-22): 16 MB batches, 150 ms linger,
# snappy, acks=1. (The reference's BatchSize=10000 messages has no direct
# option; batch.size bytes bounds the same buffer.)
SINK_OPTIONS: dict[str, str] = {
    "kafka.batch.size": str(16 * 1024 * 1024),
    "kafka.linger.ms": "150",
    "kafka.compression.type": "snappy",
    "kafka.acks": "1",
}

# CLI key name → CSV field, ≙ cmd/sorter/main.go:24 {id:0, name:1, continent:3}.
SORT_KEYS = {"id": "id", "name": "name", "continent": "continent"}


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector (spark-sql-kafka-0-10) is not on the classpath; "
            "add it via spark.jars.packages to use Kafka sources/sinks."
        )


def read_topic(
    spark: SparkSession, brokers: str, topic: str, streaming: bool = False
) -> DataFrame:
    """Bounded (batch) or unbounded (readStream) scan of a topic. Batch mode
    is the faithful mapping of the reference's drain-until-EOF consumption
    (SURVEY.md §3.4); streaming + Trigger.AvailableNow is the equivalent."""
    _require_kafka(spark)
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    for k, v in ({"kafka.bootstrap.servers": brokers, "subscribe": topic} | SOURCE_OPTIONS).items():
        reader = reader.option(k, v)
    return reader.load()


def records_from_topic(kafka_df: DataFrame) -> DataFrame:
    """Kafka message frame → typed records: cast the value bytes to string
    and split positionally (≙ extractKeyString/extractID,
    /root/reference/internal/sort/external_sort.go:368-425 — Catalyst prunes
    to just the fields a query touches)."""
    return parse_csv_lines(kafka_df.select(F.col("value").cast("string").alias("value")))


def records_to_values(records: DataFrame) -> DataFrame:
    """Typed records → value-only CSV frame (≙ the producer's wire format,
    cmd/producer/main.go:82)."""
    return records.select(
        F.concat_ws(",", "id", "name", "address", "continent").alias("value")
    )


def write_topic(values: DataFrame, brokers: str, topic: str) -> None:
    """Batch write of a `value` column to a topic with the reference's
    producer tunings."""
    _require_kafka(values.sparkSession)
    writer = values.write.format("kafka")
    for k, v in ({"kafka.bootstrap.servers": brokers, "topic": topic} | SINK_OPTIONS).items():
        writer = writer.option(k, v)
    writer.save()


def sort_topic_pipeline(records: DataFrame, key: str) -> DataFrame:
    """The sorter job's dataflow (scan → project key → global sort), source/
    sink-agnostic: pass records_from_topic(...) in, hand the result to
    write_topic/parquet. Global order = RangePartitioning + per-range
    external sort — the distributed version of the reference's two-phase
    merge (external_sort.go:69-201)."""
    if key not in SORT_KEYS:
        raise ValueError(f"sort key must be one of {sorted(SORT_KEYS)}, got {key!r}")
    if key == "continent":
        # The one low-cardinality key of the reference's three-key surface:
        # route through the dictionary-encoded radix fast path with id as
        # tie-break — a superset of the reference's ties-arbitrary order
        # (sort.Slice is unstable) that sorts 1.7-1.8x faster at 50M
        # (operators/sort.py:sort_with_tiebreak; probe_offheap_sort.py).
        from kafka_stream_sorter_spark.operators.sort import sort_with_tiebreak

        return sort_with_tiebreak(records, SORT_KEYS[key], SORT_KEYS["id"])
    return records.orderBy(F.col(SORT_KEYS[key]).asc())


def sort_topic(
    spark: SparkSession, brokers: str, source_topic: str, dest_topic: str, key: str
) -> None:
    """End-to-end ≙ `./sorter <key>` (cmd/sorter/main.go:18-72): drain the
    source topic, totally order by the key, publish to the dest topic.

    Note on order-into-Kafka: a partitioned topic only preserves order per
    partition; use a 1-partition destination topic for a byte-faithful
    reproduction (the reference's own output topics interleave their 3
    partitions on read — SURVEY.md §7.5)."""
    records = records_from_topic(read_topic(spark, brokers, source_topic))
    write_topic(records_to_values(sort_topic_pipeline(records, key)), brokers, dest_topic)
