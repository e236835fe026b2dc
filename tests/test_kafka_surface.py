"""Kafka surface tests — broker-free. The connector jar isn't bundled, so
wire-format codecs and the sorter dataflow are tested against the seeded
generator, and the gated entry points are asserted to fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.sources import kafka
from kafka_stream_sorter_spark.sources.generator import reference_records


def test_csv_roundtrip_is_lossless(spark):
    rec = reference_records(spark, 500, seed=7)
    back = kafka.records_from_topic(
        kafka.records_to_values(rec).withColumn("value", F.col("value").cast("binary"))
    )
    assert back.dtypes == rec.dtypes  # nullability differs after parse; types must not
    assert rec.exceptAll(back).count() == 0
    assert back.exceptAll(rec).count() == 0


def test_sort_pipeline_orders_by_each_reference_key(spark):
    rec = reference_records(spark, 300, seed=11)
    for key in ("id", "name", "continent"):
        out = kafka.sort_topic_pipeline(rec, key).select(F.col(key).alias("k"))
        vals = [r.k for r in out.collect()]
        assert vals == sorted(vals)


def test_sort_pipeline_rejects_unknown_key(spark):
    with pytest.raises(ValueError, match="sort key"):
        kafka.sort_topic_pipeline(reference_records(spark, 10), "address")


def test_kafka_entry_points_gated_without_connector(spark):
    if kafka.kafka_available(spark):
        pytest.skip("connector present; gating not exercised")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka.read_topic(spark, "localhost:9092", "source")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka.write_topic(
            reference_records(spark, 1).select(F.lit("x").alias("value")),
            "localhost:9092",
            "t",
        )


def _fake_topic_frame(values_df, topic: str, n_partitions: int = 3):
    """Materialize a `value`-column DataFrame as a Kafka-shaped message frame:
    the exact columns (names, types) the real connector's load() yields —
    binary key/value, topic, int partition, long offset, timestamp,
    timestampType. Offsets are per-partition monotonic, like a broker."""
    from pyspark.sql import Window

    part = (F.crc32(F.col("value").cast("binary")) % n_partitions).cast("int")
    # offsets follow ARRIVAL order (like a broker), not value order:
    # monotonically_increasing_id preserves the incoming row order per task
    w = Window.partitionBy("partition").orderBy(F.col("_arrival"))
    return (
        values_df.withColumn("_arrival", F.monotonically_increasing_id())
        .withColumn("partition", part)
        .withColumn("key", F.lit(None).cast("binary"))
        .withColumn("value", F.col("value").cast("binary"))
        .withColumn("topic", F.lit(topic))
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0).cast("int"))
        .select("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    )


def test_sort_topic_composition_over_fake_broker(spark, tmp_path):
    """End-to-end ≙ sort_topic() with the broker swapped for a parquet-backed
    fake topic carrying the connector's exact frame schema: produce →
    write 'topic' → read frame → records_from_topic → sort_topic_pipeline →
    records_to_values → write dest 'topic' → re-read and verify total order
    and losslessness. Exercises ops 3/4 (client.go:10-38 parity) as far as
    is possible without a broker: everything but the socket."""
    src_dir, dst_dir = str(tmp_path / "source"), str(tmp_path / "sorted_id")
    rec = reference_records(spark, 400, seed=23)

    # producer side (≙ write_topic): value-only CSV messages into the topic
    _fake_topic_frame(kafka.records_to_values(rec), "source").write.parquet(src_dir)

    # sorter side (≙ sort_topic): drain frame → parse → total order → publish
    frame = spark.read.parquet(src_dir)
    assert dict(frame.dtypes)["value"] == "binary"  # connector yields binary
    records = kafka.records_from_topic(frame)
    sorted_vals = kafka.records_to_values(kafka.sort_topic_pipeline(records, "id"))
    # 1-partition dest topic: the only byte-faithful order-preserving shape
    _fake_topic_frame(sorted_vals.coalesce(1), "sorted_id", n_partitions=1).write.parquet(dst_dir)

    # consumer side: offset order within the single partition == sort order
    out = (
        spark.read.parquet(dst_dir)
        .orderBy("offset")
        .select(F.col("value").cast("string").alias("value"))
    )
    ids = [int(v.value.split(",")[0]) for v in out.collect()]
    assert ids == sorted(ids)
    assert len(ids) == 400
    back = kafka.records_from_topic(spark.read.parquet(dst_dir))
    assert rec.exceptAll(back).count() == 0 and back.exceptAll(rec).count() == 0
