"""operators/interval_join.py — bucketed range join equivalence + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.operators.interval_join import interval_join_after
from kafka_stream_sorter_spark.sources.parquet import load_table


def _views_clicks(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return views, clicks


def test_matches_naive_nonequi_join(spark, sf_dir):
    views, clicks = _views_clicks(spark, sf_dir)
    width = 7200

    bucketed = interval_join_after(
        views, clicks, keys=["user_id"], left_ts="view_ts", right_ts="click_ts",
        width_seconds=width,
    ).select("view_id", "click_id")

    naive = (
        views.alias("v")
        .join(
            clicks.alias("c"),
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.click_ts") > F.col("v.view_ts"))
            & (
                F.unix_micros("c.click_ts")
                <= F.unix_micros("v.view_ts") + width * 1_000_000
            ),
        )
        .select("view_id", "click_id")
    )

    got = {tuple(r) for r in bucketed.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_bounds_are_strict_then_inclusive(spark, sf_dir):
    """right_ts == left_ts is excluded; right_ts == left_ts + width included."""
    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00.000000")], ["user_id", "t"]
    ).select("user_id", F.col("t").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00.000000"),  # == left: excluded
            (1, 11, "2024-01-01 01:00:00.000000"),  # inside: included
            (1, 12, "2024-01-01 02:00:00.000000"),  # == left+width: included
            (1, 13, "2024-01-01 02:00:00.000001"),  # just past: excluded
            (2, 14, "2024-01-01 01:00:00.000000"),  # other key: excluded
        ],
        ["user_id", "rid", "t"],
    ).select("user_id", "rid", F.col("t").cast("timestamp").alias("rts"))
    out = interval_join_after(
        base, right, keys=["user_id"], left_ts="lts", right_ts="rts", width_seconds=7200
    )
    assert sorted(r.rid for r in out.collect()) == [11, 12]


def test_plan_is_equijoin_not_nested_loop(spark, sf_dir):
    views, clicks = _views_clicks(spark, sf_dir)
    plan = (
        interval_join_after(
            views, clicks, keys=["user_id"], left_ts="view_ts", right_ts="click_ts",
            width_seconds=7200,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_overlap_join_matches_naive(spark, sf_dir):
    """interval_overlap_join (grid cells + reference-point dedup) equals the
    naive overlap theta-join — including pairs spanning multiple shared
    cells, which the reference point must emit exactly once."""
    from kafka_stream_sorter_spark.operators.interval_join import interval_overlap_join

    events = load_table(spark, sf_dir, "events")
    width = F.expr("INTERVAL 45 MINUTES")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_start"), (F.col("ts") + width).alias("v_end"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"), (F.col("ts") + width).alias("p_end"),
    )
    got = interval_overlap_join(
        views, purchases, keys=["user_id"],
        left_start="v_start", left_end="v_end",
        right_start="p_start", right_end="p_end",
        bucket_seconds=600,  # deliberately SMALL cells: intervals span ~5 cells
    ).select("view_id", "purchase_id")
    naive = (
        views.alias("v").join(
            purchases.alias("p"),
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("v.v_start") <= F.col("p.p_end"))
            & (F.col("p.p_start") <= F.col("v.v_end")),
        ).select("view_id", "purchase_id")
    )
    got_rows = [tuple(r) for r in got.collect()]
    want = {tuple(r) for r in naive.collect()}
    assert len(got_rows) == len(set(got_rows)), "reference point emitted a pair twice"
    assert set(got_rows) == want and len(want) > 0
