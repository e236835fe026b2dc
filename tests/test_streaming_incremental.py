"""Multi-micro-batch streaming: the fixture drains are single-batch (one
parquet file), which never exercises cross-batch state. These tests split
the events table into several files and stream with maxFilesPerTrigger=1,
so state genuinely accumulates across micro-batches — and a second run
from the same checkpoint must resume, not reprocess."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir):
    """events split into 4 files by event_id range (deterministic)."""
    out = tempfile.mkdtemp(prefix="events_split_")
    ev = load_table(spark, sf_dir, "events")
    # repartitionByRange gives 4 disjoint, deterministic files
    ev.repartitionByRange(4, "event_id").write.mode("overwrite").parquet(out)
    return out


def _stream(spark, path):
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def test_stateful_agg_accumulates_across_batches(spark, sf_dir, split_events_dir):
    """Per-user counts via applyInPandasWithState over 4+ micro-batches must
    equal the batch groupBy — state carries across batches, nothing is
    double-counted or dropped."""
    from kafka_stream_sorter_spark.streaming.ops import (
        drain_to_table,
        resolve_final_state,
        user_running_stats,
    )

    sdf = user_running_stats(_stream(spark, split_events_dir))
    got = drain_to_table(sdf, "update")
    # update mode re-emits a user's row per batch it appears in — the raw
    # sink MUST hold more rows than users here (multi-batch is the point)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert got.count() > n_users
    # the registered query's resolution: last emission per user
    final = resolve_final_state(got, ["user_id"], "n_events")
    expected = (
        load_table(spark, sf_dir, "events").groupBy("user_id").count()
    )
    diff = (
        final.join(expected, "user_id")
        .filter(F.col("n_events") != F.col("count"))
        .count()
    )
    assert diff == 0
    assert final.count() == expected.count()


def test_windowed_agg_across_batches_matches_batch(spark, sf_dir, split_events_dir):
    """Tumbling-window counts streamed one file at a time equal the batch
    result — watermark bookkeeping across batches loses nothing (event
    files arrive in event_id order, not time order, so batches genuinely
    interleave event time)."""
    from kafka_stream_sorter_spark.streaming.ops import drain_to_table

    sdf = (
        _stream(spark, split_events_dir)
        .withWatermark("ts", "100 days")  # nothing is ever late → exact
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    got = drain_to_table(sdf, "complete")
    expected = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_checkpoint_resume_processes_only_new_files(spark, split_events_dir):
    """AvailableNow + a persistent checkpoint: a second drain over the same
    directory re-emits nothing; after a new file lands, only its rows are
    processed — exactly-once file-source semantics."""
    import shutil

    src = tempfile.mkdtemp(prefix="resume_src_")
    ckpt = tempfile.mkdtemp(prefix="resume_ckpt_")
    sink = tempfile.mkdtemp(prefix="resume_sink_")

    files = sorted(
        f for f in __import__("os").listdir(split_events_dir) if f.endswith(".parquet")
    )
    shutil.copy(f"{split_events_dir}/{files[0]}", f"{src}/{files[0]}")

    schema = spark.read.parquet(split_events_dir).schema

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .select("event_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    n1 = spark.read.parquet(f"{src}/{files[0]}").count()
    assert drain() == n1
    assert drain() == n1  # idempotent: nothing new → nothing re-emitted

    shutil.copy(f"{split_events_dir}/{files[1]}", f"{src}/{files[1]}")
    n2 = spark.read.parquet(f"{src}/{files[1]}").count()
    assert drain() == n1 + n2  # only the new file's rows were added


def test_cdc_upsert_across_batches_keeps_global_latest(spark, sf_dir, split_events_dir):
    """cdc_latest over 4 micro-batches: per-batch compaction appends deltas,
    and the read side must resolve the GLOBAL winner per key across deltas
    written by different batches."""
    from kafka_stream_sorter_spark.streaming.ops import cdc_latest

    got = cdc_latest(
        _stream(spark, split_events_dir),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    ).select("user_id", "event_id")

    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expected = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id")
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_stream_topk_across_batches_is_exact(spark, sf_dir, split_events_dir):
    """drain_topk over 4 micro-batches equals the batch top-100: the global
    top-k is a subset of the union of per-batch top-ks even when the best
    rows are concentrated in one batch."""
    from kafka_stream_sorter_spark.streaming.ops import drain_topk

    got = drain_topk(
        _stream(spark, split_events_dir).select("event_id", "value"),
        100,
        [F.col("value").desc(), F.col("event_id").asc()],
    )
    expected = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "value")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
    )
    assert [r.event_id for r in got.collect()] == [r.event_id for r in expected.collect()]


def test_stream_topk_later_batches_evict_earlier_members(
    spark, sf_dir, split_events_dir
):
    """The cross-batch RE-RANK itself (r12 verdict stretch item 6): the
    exactness test above could pass even if one batch happened to hold
    the entire global top-k — in which case no cross-batch eviction was
    ever exercised. Here every micro-batch's LOCAL top-k must lose at
    least one member to a competing batch (eviction genuinely happened,
    in both directions: early members beaten by later batches and vice
    versa) while every batch still lands at least one member, and the
    contributions partition the final k exactly (files are disjoint by
    event_id, and the final top-k is a subset of the union of local
    top-ks — drain_topk's state-bounding invariant)."""
    import glob as _glob

    from kafka_stream_sorter_spark.streaming.ops import drain_topk

    k = 100
    order = [F.col("value").desc(), F.col("event_id").asc()]
    final_ids = {
        r["event_id"]
        for r in drain_topk(
            _stream(spark, split_events_dir).select("event_id", "value"),
            k,
            order,
            id_cols=["event_id"],
        ).collect()
    }
    assert len(final_ids) == k
    parts = sorted(_glob.glob(split_events_dir + "/part-*.parquet"))
    assert len(parts) >= 4  # one file per micro-batch is the premise
    contributions = []
    for p in parts:
        local = {
            r["event_id"]
            for r in spark.read.parquet(p)
            .select("event_id", "value")
            .orderBy(*order)
            .limit(k)
            .collect()
        }
        kept = len(local & final_ids)
        # each batch contributes something AND has members evicted by
        # the other batches' candidates — strict cross-batch re-ranking
        assert 0 < kept < k, (p, kept)
        contributions.append(kept)
    assert sum(contributions) == k, contributions


def test_sorted_drain_across_batches_is_totally_ordered(spark, sf_dir, split_events_dir):
    """drain_sorted over 4 micro-batches: per-batch runs OVERLAP in key
    range (files split by event_id, sorted by event_id — but batches
    arrive in file order, so with a value sort they'd overlap; here we
    sort by value to force overlapping runs), and the merge pass must
    still return a totally ordered frame with full content."""
    from kafka_stream_sorter_spark.streaming.ops import drain_sorted
    from kafka_stream_sorter_spark.validate import assert_count_conserved, assert_sorted

    got = drain_sorted(
        _stream(spark, split_events_dir).select("event_id", "value"),
        ["value", "event_id"],
    )
    assert_sorted(got, "value", "event_id", allow_run_merge=False)
    assert_count_conserved(load_table(spark, sf_dir, "events"), got)


def test_dedup_keys_across_batches_matches_distinct(spark, sf_dir, split_events_dir):
    """Streaming dropDuplicates state spans micro-batches: keys seen in
    batch 1 must suppress re-emission in batch 4."""
    from kafka_stream_sorter_spark.streaming.ops import drain_to_table

    sdf = (
        _stream(spark, split_events_dir)
        .withWatermark("ts", "100 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    got = drain_to_table(sdf, "append")
    expected = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_stream_stream_join_across_batches_matches_batch(spark, sf_dir, split_events_dir):
    """Stream-stream interval join with both sides arriving over 4 batches:
    with a watermark generous enough that nothing is late, the result must
    equal the batch non-equi join — pairs whose two sides arrived in
    DIFFERENT micro-batches must still match via the join state."""
    from kafka_stream_sorter_spark.functions.numeric import epoch_us
    from kafka_stream_sorter_spark.streaming.ops import drain_to_table

    views = (
        _stream(spark, split_events_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "100 days")
    )
    clicks = (
        _stream(spark, split_events_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "100 days")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND click_ts > view_ts "
            "AND click_ts <= view_ts + interval 2 hours"
        ),
    ).select("view_id", "click_id")
    got = {tuple(r) for r in drain_to_table(joined, "append").collect()}

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("u"), F.col("ts").alias("vt")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("u2"), F.col("ts").alias("ct")
    )
    expected = {
        tuple(r)
        for r in v.join(
            c,
            (F.col("u") == F.col("u2"))
            & (F.col("ct") > F.col("vt"))
            & (epoch_us("ct") <= epoch_us("vt") + 7200 * 1_000_000),
        )
        .select("view_id", "click_id")
        .collect()
    }
    assert got == expected and len(expected) > 0


def test_stream_stream_join_both_sides_late_semantics(spark, tmp_path):
    """Stream-stream interval join with BOTH sides late (r11 verdict
    stretch 6) — pins Spark's actual lateness semantics, which are
    subtler than "late rows are dropped":

    * a late pair SPLIT ACROSS batches never joins — the stale side's
      state is evicted (or never stored) once the state watermark has
      passed it, so the other half finds nothing in a later batch;
    * a late pair arriving TOGETHER in one batch STILL EMITS — the
      symmetric hash join matches batch-local inputs before state
      eviction and does not pre-filter late input rows (verified
      empirically on Spark 4.1; if an upgrade adds input filtering this
      assertion is the tripwire).

    Batch 1 advances the watermark ~10 days via one advancer row per
    input (the global watermark is the MIN across watermarked inputs —
    advancing only one side would leave nothing late). A batch join over
    the same files emits all four pairs — asserted, so the test
    genuinely distinguishes streaming from batch semantics."""
    import datetime as dt
    import glob
    import os
    import shutil

    from kafka_stream_sorter_spark.streaming.ops import drain_to_table

    day0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    day10 = day0 + dt.timedelta(days=10)
    rows_b1 = [
        (1001, 1, "view", day0 + dt.timedelta(hours=10)),
        (2001, 1, "click", day0 + dt.timedelta(hours=10, minutes=30)),
        # watermark advancers, one per side, users that never join
        (1999, 99, "view", day10 + dt.timedelta(hours=10)),
        (2999, 98, "click", day10 + dt.timedelta(hours=10)),
    ]
    rows_b2 = [
        # late view whose click arrives only in batch 3 → must NOT join
        (1002, 2, "view", day0 + dt.timedelta(hours=11)),
        # late pair arriving together → still emits (batch-local match)
        (1004, 4, "view", day0 + dt.timedelta(hours=11)),
        (2004, 4, "click", day0 + dt.timedelta(hours=11, minutes=30)),
    ]
    rows_b3 = [
        # the split-late click: its view's state is gone by now
        (2002, 2, "click", day0 + dt.timedelta(hours=11, minutes=30)),
        # above the watermark (day10 09:00) → must still match
        (1003, 3, "view", day10 + dt.timedelta(hours=9, minutes=30)),
        (2003, 3, "click", day10 + dt.timedelta(hours=9, minutes=45)),
    ]
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    src = tmp_path / "late_src"
    src.mkdir()
    for i, rows in enumerate((rows_b1, rows_b2, rows_b3), start=1):
        tmp = tmp_path / f"stage_{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(tmp))
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = src / f"b{i}.parquet"
        shutil.copy(part, dest)
        # FileStreamSource orders by modification time — pin it so the
        # batch order is NEVER a same-second coin flip
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    def side(event_type, prefix):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    joined = side("view", "v").join(
        side("click", "c"),
        F.expr(
            "v_user = c_user AND c_ts > v_ts "
            "AND c_ts <= v_ts + interval 2 hours"
        ),
    ).select(F.col("v_id").alias("view_id"), F.col("c_id").alias("click_id"))
    got = {tuple(r) for r in drain_to_table(joined, "append").collect()}
    assert got == {(1001, 2001), (1004, 2004), (1003, 2003)}, got

    # the batch join over the same files includes the split-late pair
    ev = spark.read.parquet(str(src))
    v = ev.filter(F.col("event_type") == "view")
    c = ev.filter(F.col("event_type") == "click")
    batch = v.alias("v").join(
        c.alias("c"),
        (F.col("v.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") > F.col("v.ts"))
        & (F.col("c.ts") <= F.col("v.ts") + F.expr("interval 2 hours")),
    )
    assert batch.count() == 4


def test_topk_candidate_resolution_survives_retried_batch(spark, sf_dir, split_events_dir):
    """foreachBatch is at-least-once: simulate a retried micro-batch by
    appending one batch's local top-k TWICE to the candidate store, then
    assert the read-side resolution (resolve_topk_candidates) still yields
    the exact batch top-k — no duplicate identity may occupy two of the k
    slots (the r3-reviewed failure mode of drain_topk)."""
    import os

    from kafka_stream_sorter_spark.streaming.ops import resolve_topk_candidates

    k = 50
    order = [F.col("value").desc(), F.col("event_id").asc()]
    batches = [
        spark.read.parquet(os.path.join(split_events_dir, f))
        .select("event_id", "value")
        .orderBy(*order)
        .limit(k)
        for f in sorted(os.listdir(split_events_dir))
        if f.endswith(".parquet")
    ]
    assert len(batches) >= 3, "fixture split should give multiple batches"
    candidates = batches[0]
    for b in batches[1:]:
        candidates = candidates.unionAll(b)
    candidates = candidates.unionAll(batches[1])  # the "retry"

    got = resolve_topk_candidates(candidates, k, order, ["event_id"]).collect()
    expected = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "value")
        .orderBy(*order)
        .limit(k)
        .collect()
    )
    got_ids = [r.event_id for r in got]
    assert len(set(got_ids)) == k, "a duplicated candidate occupies two slots"
    assert got_ids == [r.event_id for r in expected]

    # whole-row dedup (id_cols=None) must survive the retry as well
    got_distinct = resolve_topk_candidates(candidates, k, order, None).collect()
    assert [r.event_id for r in got_distinct] == [r.event_id for r in expected]


def test_drains_survive_empty_stream(spark, tmp_path):
    """A stream whose source matches zero files fires no micro-batch, so
    no batch dir is ever written — the file-backed drains must return an
    empty frame with the stream's schema instead of raising 'unable to
    infer schema' on the empty output dir."""
    from kafka_stream_sorter_spark.streaming.ops import (
        cdc_latest,
        drain_sorted,
        drain_topk,
    )

    src = tmp_path / "empty_src"
    src.mkdir()
    schema = "event_id long, user_id long, value double"
    empty = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src))
    )
    sorted_out = drain_sorted(empty, ["event_id"])
    assert sorted_out.count() == 0
    assert sorted_out.columns == ["event_id", "user_id", "value"]
    assert drain_topk(empty, 5, [F.col("value").desc()], ["event_id"]).count() == 0
    assert cdc_latest(empty, ["user_id"], ["event_id"]).count() == 0


def test_stream_events_handles_directory_fixture(spark, sf_dir, tmp_path):
    """If the driver ever ships events.parquet as a DIRECTORY of part
    files (the common parquet layout), stream_events must stream it — the
    single-file pathGlobFilter would match nothing and every streaming
    query would silently drain empty."""
    from kafka_stream_sorter_spark.sources.parquet import load_table
    from kafka_stream_sorter_spark.streaming.ops import drain_to_table, stream_events

    fake_sf = tmp_path / "sfdir"
    fake_sf.mkdir()
    ev = load_table(spark, sf_dir, "events")
    ev.limit(500).repartition(3).write.parquet(str(fake_sf / "events.parquet"))

    sdf = stream_events(spark, str(fake_sf)).groupBy("event_type").count()
    got = drain_to_table(sdf, "complete")
    assert got.agg(F.sum("count")).collect()[0][0] == 500
