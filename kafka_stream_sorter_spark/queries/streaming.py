"""Streaming queries: bounded-replay Structured Streaming jobs whose final
state equals a batch query — so every one is DuckDB-oracle-checkable.

Each callable starts a real streaming query (file source ≙ the reference's
Kafka `source` topic), drains it with Trigger.AvailableNow (≙ the
reference's read-until-timeout drain,
/root/reference/internal/sort/external_sort.go:95-113), and returns the
sink as a batch DataFrame. The fixture is a single parquet file, so the
replay is one micro-batch and update/append-mode emissions equal the final
aggregate — which is what makes exact oracles possible.

Output-mode choices:
* windowed/session aggs → complete (emit final windows regardless of
  watermark lag; session windows reject update mode)
* dedup → append (first arrival wins; we emit keys only, so deterministic)
* custom state → update (final batch's emission is the merged state)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.functions.numeric import epoch_us, money_micros
from kafka_stream_sorter_spark.registry import query
from kafka_stream_sorter_spark.streaming import ops

SUM_MICROS_SQL = "CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)"

# Bounded AvailableNow drains replay the fixture's files in event_id order,
# so event TIME interleaves arbitrarily across micro-batches: after batch 1
# the watermark clock sits near the corpus' max(ts), and any real lateness
# bound silently drops most of batch 2+ — diverging from the batch oracle,
# which tolerates zero drops. The production knob is the lateness SLA; on a
# bounded replay of time-unordered files it must exceed the replayed span.
# (State still evicts through the same watermark machinery — just later.)
DRAIN_WATERMARK = "3650 days"


@query(
    "stream_window_tumbling",
    oracle=f"""
    SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS win_start_us,
           CAST(epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) AS BIGINT) AS win_end_us,
           event_type,
           CAST(count(*) AS BIGINT)               AS n_events,
           {SUM_MICROS_SQL}                       AS sum_value_micros
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (1 day) per event_type, drained
    AvailableNow (watermark: DRAIN_WATERMARK rationale above) —
    streaming/ops.py. Window bounds emit as epoch micros, never raw
    timestamps (CLAUDE.md hard-won rule)."""
    sdf = (
        ops.stream_events(spark, sf_dir)
        .withWatermark("ts", DRAIN_WATERMARK)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_micros(F.col("value"))).alias("sum_value_micros"),
        )
        .select(
            epoch_us(F.col("w.start")).alias("win_start_us"),
            epoch_us(F.col("w.end")).alias("win_end_us"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )
    return ops.drain_to_table(sdf, "complete")


@query(
    "stream_window_sliding",
    oracle="""
    SELECT CAST(epoch_us(date_trunc('day', ts) - k.k * INTERVAL 1 DAY) AS BIGINT) AS win_start_us,
           CAST(epoch_us(date_trunc('day', ts) - k.k * INTERVAL 1 DAY + INTERVAL 2 DAY) AS BIGINT) AS win_end_us,
           event_type,
           CAST(count(*) AS BIGINT)                                      AS n_events
    FROM events, (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1, 2, 3
    """,
)
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window (2-day length, 1-day slide): each event
    lands in two overlapping windows."""
    sdf = (
        ops.stream_events(spark, sf_dir)
        .withWatermark("ts", DRAIN_WATERMARK)
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            epoch_us(F.col("w.start")).alias("win_start_us"),
            epoch_us(F.col("w.end")).alias("win_end_us"),
            "event_type",
            "n_events",
        )
    )
    return ops.drain_to_table(sdf, "complete")


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 1 HOUR
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT)                   AS session_start_us,
           CAST(epoch_us(max(ts) + INTERVAL 1 HOUR) AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT)  AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (1-hour inactivity gap) per user — gaps-and-islands
    as a native streaming operator. Session end = last event + gap (Spark's
    session_window semantics, mirrored in the oracle)."""
    sdf = (
        ops.stream_events(spark, sf_dir)
        .withWatermark("ts", DRAIN_WATERMARK)
        .groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            epoch_us(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )
    # session-window aggs support append/complete only; complete emits the
    # final merged sessions at drain end
    return ops.drain_to_table(sdf, "complete")


@query(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): stateful
    first-arrival dedup with watermark-bounded state. Emits only the keys —
    which row arrives first is racy, the key set is not."""
    sdf = (
        ops.stream_events(spark, sf_dir)
        .withWatermark("ts", DRAIN_WATERMARK)
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return ops.drain_to_table(sdf, "append")


@query(
    "stream_stateful_user_stats",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           {SUM_MICROS_SQL}         AS sum_value_micros,
           max(value)               AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running count/sum/max — streaming/ops.py:user_running_stats. The
    update-mode sink holds one row per (user, batch that touched it);
    resolve_final_state keeps each user's last emission (max n_events —
    strictly monotone per user), so the result stays one-row-per-user even
    when the driver ships the events fixture as multiple files (= multiple
    micro-batches)."""
    sdf = ops.user_running_stats(ops.stream_events(spark, sf_dir))
    return ops.resolve_final_state(
        ops.drain_to_table(sdf, "update"), ["user_id"], "n_events"
    )


@query(
    "stream_sorted_drain",
    oracle="SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id, event_type, value, props FROM events",
)
def stream_sorted_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship as a stream job: drain the bounded stream,
    emit a totally ordered materialization (foreachBatch orderBy →
    range-disjoint sorted files) — streaming/ops.py:drain_sorted. The oracle
    checks content conservation (count + values); ordering itself is
    asserted by tests/test_streaming.py via the sort keys."""
    drained = ops.drain_sorted(ops.stream_events(spark, sf_dir), ["event_id"])
    return drained.select(
        "event_id",
        epoch_us(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@query(
    "stream_static_join",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           {SUM_MICROS_SQL}         AS sum_value_micros
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static-dim enrichment then aggregate: the event stream is
    joined to the (broadcast) customer dimension per micro-batch — no
    stream-side state for the join, only for the downstream aggregate. The
    standard 100 TB enrichment topology: dims broadcast to every executor,
    the unbounded side never shuffles for the join."""
    from kafka_stream_sorter_spark.sources.parquet import load_table

    static = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = ops.stream_events(spark, sf_dir).join(
        F.broadcast(static), F.col("user_id") == F.col("c_custkey")
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(money_micros(F.col("value"))).alias("sum_value_micros"),
    )
    return ops.drain_to_table(agg, "complete")


@query(
    "stream_stream_interval_join",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id AS user_id,
           CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join: clicks within 2 h after a
    view by the same user, both sides unbounded. Watermarks bound the join
    state — Spark retains only views younger than (watermark − 2 h), so
    state size tracks the time window, not the stream length. The batch
    twin is join_interval_bucketed; same oracle semantics."""
    ev = ops.stream_events(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", DRAIN_WATERMARK)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", DRAIN_WATERMARK)
    )
    joined = views.join(
        clicks,
        F.expr(
            """
            v_user = c_user AND
            click_ts > view_ts AND
            click_ts <= view_ts + interval 2 hours
            """
        ),
    ).select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        (epoch_us("click_ts") - epoch_us("view_ts")).alias("lag_us"),
    )
    return ops.drain_to_table(joined, "append")


@query(
    "stream_cdc_upsert",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert over the event stream: maintain the latest row per
    user_id (winner = max event time, event_id tie-break) with
    merge-on-read semantics — streaming/ops.py:cdc_latest. Micro-batches
    append per-key-compacted deltas; the reader resolves the global
    winner. The keyed-materialized-view topology every feature store runs."""
    sdf = ops.stream_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    latest = ops.cdc_latest(sdf, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@query(
    "stream_topk",
    oracle="""
    SELECT event_id, user_id, value
    FROM events ORDER BY value DESC, event_id LIMIT 100
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming global top-k with O(k × n_batches) state: per-batch local
    top-k into a candidate store, global re-rank at read —
    streaming/ops.py:drain_topk. The streaming twin of the batch `topk`
    query; exact because the global top-k is a subset of the union of
    per-batch top-ks."""
    sdf = ops.stream_events(spark, sf_dir).select("event_id", "user_id", "value")
    return ops.drain_topk(
        sdf, 100, [F.col("value").desc(), F.col("event_id").asc()], id_cols=["event_id"]
    )
