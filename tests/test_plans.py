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
    # global positions must come from deterministic boundary buckets +
    # broadcast offsets, not a no-partition window that serializes the
    # table through one task (and nothing may be persisted — the r5
    # scheme pinned the whole sorted table; see operators/sort.py)
    df = QUERIES["keyed_fanout"](spark, sf_dir)
    plan = assert_plan_lacks(df, "Exchange SinglePartition")
    assert "hashpartitioning(_gp_bucket" in plan  # per-bucket window
    # offsets are a driver-built literal array looked up per row — r7
    # removed the r6 broadcast join (pure per-row probe overhead for
    # <=1024 driver-known longs), so no join may reappear here
    assert "BroadcastExchange" not in plan
    assert "InMemoryTableScan" not in plan  # cache-free (loop-safe)


def test_token_freq_topn_avoids_vocab_sort(spark, sf_dir):
    assert_plan_contains(QUERIES["text_token_freq"](spark, sf_dir), "TakeOrderedAndProject")


def test_q4_exists_is_semi_join(spark, sf_dir):
    assert_plan_contains(QUERIES["tpch_q4_exists"](spark, sf_dir), "LeftSemi")


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    assert_plan_contains(QUERIES["tpch_q22_idle_balance"](spark, sf_dir), "LeftAnti")


def test_q5_snowflake_broadcasts_dims(spark, sf_dir):
    plan = assert_plan_contains(QUERIES["tpch_q5_region"](spark, sf_dir), "BroadcastHashJoin")
    assert plan.count("BroadcastHashJoin") >= 3


def test_q10_topk_avoids_global_sort(spark, sf_dir):
    assert_plan_contains(QUERIES["tpch_q10_returns"](spark, sf_dir), "TakeOrderedAndProject")


def test_q17_correlation_is_window_not_selfjoin(spark, sf_dir):
    # per-part average must come from one window pass, not a second
    # lineitem scan joined back
    plan = assert_plan_contains(QUERIES["tpch_q17_small_qty"](spark, sf_dir), "Window")
    assert plan.count("FileScan parquet") <= 2  # lineitem + part, no re-scan


def test_sessionize_single_shuffle(spark, sf_dir):
    # lag-window, sum-window, AND the final (user_id, session_id) groupBy all
    # reuse one hashpartitioning(user_id) exchange — the whole query is one
    # shuffle of the events table
    df = QUERIES["window_sessionize"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 2  # lag frame + running-sum frame
    assert plan.count("Exchange") == 1


def test_salted_agg_is_two_stage(spark, sf_dir):
    # partial+final per stage = 4 HashAggregate operators
    plan = assert_plan_contains(QUERIES["agg_salted_skew"](spark, sf_dir), "HashAggregate")
    assert plan.count("HashAggregate") >= 4


def test_ann_vectorized_uses_arrow_batches(spark, sf_dir):
    assert_plan_contains(QUERIES["ann_vectorized"](spark, sf_dir), "MapInPandas")


def test_pipeline_pushes_quality_gate_to_scan(spark, sf_dir):
    plan = assert_plan_contains(
        QUERIES["pipeline_quality_dedup_split"](spark, sf_dir), "PushedFilters"
    )
    assert "n_chars" in plan.split("PushedFilters")[1].splitlines()[0]


def test_q2_min_is_window_with_broadcast_dims(spark, sf_dir):
    # correlated min = one window pass over the join, dims all broadcast,
    # and lineitem is scanned exactly once (no correlated re-probe)
    plan = assert_plan_contains(QUERIES["tpch_q2_min_price"](spark, sf_dir), "Window")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("FileScan parquet") <= 4  # lineitem + 3 dims


def test_q7_both_nation_roles_broadcast(spark, sf_dir):
    plan = assert_plan_contains(QUERIES["tpch_q7_volume"](spark, sf_dir), "BroadcastHashJoin")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier + nation x2


def test_q13_keeps_outer_join_and_stacked_aggs(spark, sf_dir):
    plan = assert_plan_contains(QUERIES["tpch_q13_custdist"](spark, sf_dir), "HashAggregate")
    assert "LeftOuter" in plan or "BroadcastHashJoin LeftOuter" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for both levels


def test_q16_not_in_is_anti_join(spark, sf_dir):
    assert_plan_contains(QUERIES["tpch_q16_supplier_cnt"](spark, sf_dir), "LeftAnti")


def test_q20_nested_agg_feeds_semi_join(spark, sf_dir):
    assert_plan_contains(QUERIES["tpch_q20_excess_share"](spark, sf_dir), "LeftSemi")


def test_q21_topk_avoids_global_sort(spark, sf_dir):
    assert_plan_contains(QUERIES["tpch_q21_waiting"](spark, sf_dir), "TakeOrderedAndProject")


def test_chunking_is_jvm_generate(spark, sf_dir):
    # chunk explosion must be a Generate (posexplode) over JVM expressions,
    # never a Python row loop
    plan = assert_plan_contains(QUERIES["text_chunk_windows"](spark, sf_dir), "Generate")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_grouped_regression_is_jvm_aggregate(spark, sf_dir):
    # regr_slope/regr_intercept are built-in aggregates: the registered
    # query must plan as partial+final HashAggregate/SortAggregate with NO
    # Python in the loop (the pandas grouped-map demo is a separate query)
    plan = assert_plan_lacks(QUERIES["udf_grouped_regression"](spark, sf_dir), "FlatMapGroupsInPandas")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Aggregate") >= 2  # map-side partial + final


def test_sql_interface_rank_group_limit(spark, sf_dir):
    # the SQL-text path must hit the same WindowGroupLimit optimization as
    # the DataFrame builders
    assert_plan_contains(QUERIES["sql_interface"](spark, sf_dir), "WindowGroupLimit")


def test_time_bucket_has_partial_aggregation(spark, sf_dir):
    # bucket rollup must partial-aggregate map-side before its one shuffle
    plan = assert_plan_contains(QUERIES["agg_time_bucket"](spark, sf_dir), "HashAggregate")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan  # epoch arithmetic stays JVM-side


def test_fuzzy_join_is_blocked_hash_join(spark, sf_dir):
    # the nationkey block must plan as a hash equi-join (broadcast or
    # shuffled), NEVER a nested-loop over all pairs; the length prefilter
    # and levenshtein ride as join residual/post conditions
    plan = assert_plan_lacks(QUERIES["join_fuzzy_levenshtein"](spark, sf_dir), "BroadcastNestedLoopJoin")
    assert "HashJoin" in plan


def test_multiprobe_probes_broadcast_side_only(spark, sf_dir):
    # the probe fan-out must explode the (tiny, broadcast) query side; the
    # corpus side keeps exactly one bucket per row and joins by hash
    plan = assert_plan_contains(
        QUERIES["ann_lsh_multiprobe"](spark, sf_dir), "BroadcastHashJoin", "Generate"
    )
    # exactly one explode operator (the probe fan-out) on the broadcast
    # build side — the corpus side must never be replicated per probe.
    # (formatted mode prints each operator twice: tree + detail section)
    assert plan.count("Generate") == 2
    assert "explode" in plan


def test_csv_roundtrip_read_prunes_to_declared_schema(spark, sf_dir):
    # the aggregate only needs 5 columns; the CSV scan cannot prune (row
    # format), but the plan must still partial-aggregate before shuffling
    plan = assert_plan_contains(QUERIES["csv_file_roundtrip"](spark, sf_dir), "HashAggregate")
    assert plan.count("HashAggregate") >= 2


def test_overlap_join_is_hash_join_with_two_explodes(spark, sf_dir):
    # grid-cell replication must plan as a hash/sort-merge equi-join on
    # (user_id, cell) with one explode per side — never a nested loop
    plan = assert_plan_lacks(
        QUERIES["join_interval_overlap"](spark, sf_dir), "BroadcastNestedLoopJoin"
    )
    assert "Join" in plan and plan.count("Generate") >= 2


def test_low_cardinality_sort_plans_single_long_radix_exchange(spark, sf_dir):
    """The dict-encoded fast path must plan as ONE range exchange keyed on
    the composite long (collision-free 8-byte sort prefix) — not on the
    (string, long) pair, and with no second Exchange from the rewrite."""
    import re

    from kafka_stream_sorter_spark.plans import physical_plan

    df = QUERIES["sort_low_cardinality"](spark, sf_dir)
    plan = physical_plan(df)
    assert "_radix_key" in plan
    exchanges = re.findall(r"rangepartitioning\(([^)]*)\)", plan)
    assert len(exchanges) >= 1
    for args in exchanges:
        assert "_radix_key" in args and "event_type" not in args


def test_window_queries_forbidden_shapes(spark, sf_dir):
    """r6 verdict stretch #6 — extend keyed_fanout's forbidden-shape pins
    to every window-bearing / paged registered query: no convenience
    persist (InMemoryTableScan pins memory and is the 100 TB bug the r6
    fanout rewrite removed) and no single-partition exchange (a window or
    limit that serializes the table through one task)."""
    from kafka_stream_sorter_spark.plans import physical_plan

    for name in (
        "window_rank",
        "window_analytic",
        "window_sessionize",
        "window_range_frame",
        "window_distribution",
        "topk_paged",
    ):
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        assert "InMemoryTableScan" not in plan, f"{name}: convenience persist"
        assert "Exchange SinglePartition" not in plan, (
            f"{name}: single-partition exchange serializes the table"
        )
