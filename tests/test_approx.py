"""agg_approx_distinct's driver contract is (exact counts + within-tolerance
booleans); this test additionally checks the underlying HLL estimate against
exact counts directly, and that the emitted booleans hold."""

from __future__ import annotations

from kafka_stream_sorter_spark.registry import QUERIES
from kafka_stream_sorter_spark.sources.parquet import load_table


def test_approx_distinct_within_bounds(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = {r.event_type: r for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()}
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
    assert rows.keys() == exact.keys() and rows
    for et, a in rows.items():
        e = exact[et]
        assert a.exact_users == e.users
        assert a.exact_events == e.events
        # the query itself asserts the 10% (5 sigma at 2% rsd) bound
        assert a.users_within_tol and a.events_within_tol

    # raw-estimate bound, independent of the query's projection
    est = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("au"),
            F.approx_count_distinct("event_id", 0.02).alias("ae"),
        )
        .collect()
    }
    for et, a in est.items():
        e = exact[et]
        assert abs(a.au - e.users) <= max(0.1 * e.users, 5)
        assert abs(a.ae - e.events) <= max(0.1 * e.events, 5)
