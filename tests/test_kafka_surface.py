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
