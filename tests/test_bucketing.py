"""Bucketing and partition pruning — the two table-layout levers that
remove work before it exists at cluster scale.

* Bucketed tables co-locate join keys at WRITE time: a join between two
  tables bucketed by the same key into the same bucket count needs NO
  exchange at read time — at 100 TB that deletes the two largest shuffles
  of a fact-fact join (the brief's "bucketing for co-located joins").
* Hive-style partitioned layout prunes entire directories from a scan
  when the filter hits the partition column (PartitionFilters), reading
  0 bytes of the excluded partitions.

Both are asserted on the physical plan, not timings.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="kss_warehouse_")
    spark.sql("CREATE DATABASE IF NOT EXISTS kss_test")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    (
        li.write.mode("overwrite")
        .option("path", f"{wh}/li_bucketed")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("kss_test.li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .option("path", f"{wh}/orders_bucketed")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("kss_test.orders_bucketed")
    )
    yield wh
    spark.sql("DROP TABLE IF EXISTS kss_test.li_bucketed")
    spark.sql("DROP TABLE IF EXISTS kss_test.orders_bucketed")
    spark.sql("DROP DATABASE IF EXISTS kss_test")
    shutil.rmtree(wh, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # disable auto-broadcast: at fixture scale everything broadcasts, which
    # would hide the property under test (at 100 TB neither side broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("kss_test.li_bucketed")
        orders = spark.table("kss_test.orders_bucketed")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: both sides arrive pre-bucketed, zero exchanges
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, warehouse):
    li = spark.table("kss_test.li_bucketed")
    orders = spark.table("kss_test.orders_bucketed")
    bucketed_n = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    plain_li = load_table(spark, sf_dir, "lineitem")
    plain_o = load_table(spark, sf_dir, "orders")
    plain_n = plain_li.join(plain_o, plain_li.l_orderkey == plain_o.o_orderkey).count()
    assert bucketed_n == plain_n


def test_partitioned_layout_prunes_directories(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="kss_part_")
    try:
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        events.write.mode("overwrite").partitionBy("event_type").parquet(out)
        scan = spark.read.parquet(out).filter(F.col("event_type") == "click")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
        n_click = scan.count()
        n_all = spark.read.parquet(out).count()
        assert 0 < n_click < n_all
    finally:
        shutil.rmtree(out, ignore_errors=True)
