"""Plan-shape tests: correctness at 100 TB is a property of the physical
plan, not the row values. Each test pins the strategy a query must keep."""

from __future__ import annotations

from kafka_stream_sorter_spark.plans import assert_plan_contains, assert_plan_lacks
from kafka_stream_sorter_spark.registry import QUERIES


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = QUERIES["filter_project"](spark, sf_dir)
    plan = assert_plan_contains(df, "PushedFilters")
    # the quantity predicate must reach the parquet reader
    assert "l_quantity" in plan.split("PushedFilters")[1].splitlines()[0]
    # projection pruned: untouched wide columns never leave the scan
    assert "l_comment" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_partkey" not in read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    assert_plan_contains(QUERIES["join_broadcast"](spark, sf_dir), "BroadcastHashJoin")


def test_multiway_join_broadcasts_both_dims(spark, sf_dir):
    plan = assert_plan_contains(QUERIES["join_multiway"](spark, sf_dir), "BroadcastHashJoin")
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_avoids_global_sort(spark, sf_dir):
    assert_plan_contains(QUERIES["topk"](spark, sf_dir), "TakeOrderedAndProject")


def test_q1_has_partial_aggregation(spark, sf_dir):
    plan = assert_plan_contains(QUERIES["agg_tpch_q1"](spark, sf_dir), "HashAggregate")
    # map-side partial + final: two HashAggregate operators around the exchange
    assert plan.count("HashAggregate") >= 2


def test_window_rank_group_limit_pushdown(spark, sf_dir):
    # Spark 3.5+ pushes rank()<=k into WindowGroupLimit before the sort
    assert_plan_contains(QUERIES["window_rank"](spark, sf_dir), "WindowGroupLimit")


def test_semi_join_is_semi(spark, sf_dir):
    assert_plan_contains(QUERIES["join_semi"](spark, sf_dir), "LeftSemi")


def test_global_sort_is_range_partitioned(spark, sf_dir):
    df = QUERIES["sort_numeric"](spark, sf_dir)
    assert_plan_contains(df, "rangepartitioning")


def test_no_cartesian_anywhere(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert_plan_lacks(fn(spark, sf_dir), "CartesianProduct")


def test_keyed_fanout_has_no_single_partition_window(spark, sf_dir):
    # global positions must come from range partitions + offsets, not a
    # no-partition window that serializes the table through one task
    df = QUERIES["keyed_fanout"](spark, sf_dir)
    plan = assert_plan_lacks(df, "Window [row_number")  # no unpartitioned global window op
    assert "rangepartitioning" in plan


def test_token_freq_topn_avoids_vocab_sort(spark, sf_dir):
    assert_plan_contains(QUERIES["text_token_freq"](spark, sf_dir), "TakeOrderedAndProject")
