"""Streaming-specific assertions beyond oracle parity (which
test_oracle_parity.py covers for every stream_* query): ordering of the
sorted drain, statefulness of the custom operator, and bounded-drain
termination."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.registry import QUERIES
from kafka_stream_sorter_spark.sources.parquet import load_table
from kafka_stream_sorter_spark.streaming import ops


def test_sorted_drain_is_totally_ordered_and_conserving(spark, sf_dir):
    out = ops.drain_sorted(ops.stream_events(spark, sf_dir), ["event_id"])
    # conservation: exactly the input rows
    n_in = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_in
    # total order is recoverable: files are range-disjoint sorted runs, so a
    # single coalesced pass in key order must be globally ascending
    ordered = out.orderBy("event_id").select("event_id")
    lagged = ordered.withColumn("prev", F.lag("event_id").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("event_id")
    ))
    violations = lagged.filter(F.col("prev").isNotNull() & (F.col("prev") > F.col("event_id")))
    assert violations.count() == 0


def test_stateful_user_stats_matches_batch_groupby(spark, sf_dir):
    got = QUERIES["stream_stateful_user_stats"](spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    from kafka_stream_sorter_spark.functions.numeric import money_micros

    want = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(money_micros(F.col("value"))).alias("sum_value_micros"),
        F.max("value").alias("max_value"),
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tumbling_windows_cover_all_events(spark, sf_dir):
    got = QUERIES["stream_window_tumbling"](spark, sf_dir)
    n_in = load_table(spark, sf_dir, "events").count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == n_in


def test_session_windows_respect_gap(spark, sf_dir):
    got = QUERIES["stream_session_window"](spark, sf_dir)
    # every session spans >= gap (end = last event + 1h) and counts >= 1
    bad = got.filter(
        (F.col("session_end") < F.col("session_start") + F.expr("INTERVAL 1 HOUR"))
        | (F.col("n_events") < 1)
    )
    assert bad.count() == 0
