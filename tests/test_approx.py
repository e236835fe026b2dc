"""agg_approx_distinct has no SQL oracle (HLL sketches are engine-specific);
bound the estimates against exact counts instead."""

from __future__ import annotations

from kafka_stream_sorter_spark.registry import QUERIES
from kafka_stream_sorter_spark.sources.parquet import load_table


def test_approx_distinct_within_bounds(spark, sf_dir):
    import pyspark.sql.functions as F

    approx = {r.event_type: r for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()}
    exact = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.countDistinct("event_id").alias("events"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys() and approx
    for et, a in approx.items():
        e = exact[et]
        # 2% rsd → allow 5 sigma plus small-count slack
        assert abs(a.approx_users - e.users) <= max(0.1 * e.users, 5)
        assert abs(a.approx_events - e.events) <= max(0.1 * e.events, 5)
