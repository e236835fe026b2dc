#!/usr/bin/env python
"""Cross-batch streaming state EXACTNESS at 50M rows (r7 verdict stretch #6).

`stream_dedup_keys` and `stream_topk` carry state across micro-batches
(dropDuplicates key state; the O(k × n_batches) candidate store). The
4-file incremental fixture pins their cross-batch semantics at toy scale
(tests/test_streaming_incremental.py); this probe plants ground truth at
the 50M multi-batch scale the batch operators already enjoy and verifies
EXACTNESS, not just throughput:

  1. dedup: keys are CONSTRUCTED to recur across batches
     (key = f(id), batches = files, id striped over files), so a state
     store that dropped anything between batches would re-emit keys.
     Checks (all distributed): emitted rows == batch-engine distinct
     count; zero key emitted twice; >99% of keys genuinely span >1 batch
     (proving the run exercises cross-batch state, not per-batch dedup).
  2. topk: values are hash-scattered so the true top-k is spread over
     all batches; the streaming result must equal the batch engine's
     top-k EXACTLY (set equality on (event_id, value_micros), both
     orders checked via the shared tie-break policy).

Usage: python scripts/probe_streaming_state_recall.py [n_rows] [n_batches]
Defaults: 50_000_000, 8. Run EXCLUSIVELY (CLAUDE.md timing rules).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_USERS = 1_000_000
K = 100


def calib() -> float:
    import numpy as np

    a = np.random.default_rng(0).random((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / np.linalg.norm(a)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_stream_sorter_spark.session import get_spark
    from kafka_stream_sorter_spark.streaming import ops

    c_before = calib()
    spark = get_spark(app_name="probe-stream-state")
    tmp = tempfile.mkdtemp(prefix="probe_sstate_")
    src = os.path.join(tmp, "src")
    results: dict = {}
    try:
        # Deterministic events: key (user_id, event_type) is a pure
        # function of id, and ids stripe over the N_BATCHES output files,
        # so every key recurs in ~every batch. value is hash-scattered
        # (quantized to micros so batch/stream compare exactly); ts spans
        # 4 minutes, far inside the watermark, so NO state is ever
        # evicted — the probe isolates cross-batch state handoff.
        t0 = time.perf_counter()
        spark.range(0, N, 1, 64).select(
            F.col("id").alias("event_id"),
            F.pmod(F.col("id"), F.lit(N_USERS)).alias("user_id"),
            F.concat(F.lit("type_"), F.pmod(F.col("id") * 7, F.lit(8))).alias(
                "event_type"
            ),
            F.pmod(F.xxhash64("id"), F.lit(10_000_000_000)).alias("value_micros"),
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000)
                + F.pmod(F.col("id"), F.lit(240)) * 1_000_000
            ).alias("ts"),
        ).repartition(N_BATCHES).write.mode("overwrite").parquet(src)
        results["produce_sec"] = round(time.perf_counter() - t0, 1)

        batch = spark.read.parquet(src)
        schema = batch.schema
        n_files = len(
            [f for f in os.listdir(src) if f.endswith(".parquet")]
        )

        def stream():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )

        # --- 1. cross-batch dedup (stream_dedup_keys semantics) ---------
        out1 = os.path.join(tmp, "dedup_out")
        t0 = time.perf_counter()
        q = (
            stream()
            .withWatermark("ts", "3650 days")
            .dropDuplicates(["user_id", "event_type"])
            .select("user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out1)
            .option("checkpointLocation", os.path.join(tmp, "ck1"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        emitted = spark.read.parquet(out1)
        truth = batch.select("user_id", "event_type").distinct().count()
        n_emitted = emitted.count()
        dup_keys = (
            emitted.groupBy("user_id", "event_type")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        # how many keys truly span >1 batch-file (planted-coverage check)
        fname = F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
        spanning = (
            batch.select("user_id", "event_type", fname.alias("f"))
            .groupBy("user_id", "event_type")
            .agg(F.countDistinct("f").alias("nf"))
            .filter(F.col("nf") > 1)
            .count()
        )
        results["dedup_keys"] = {
            "sec": round(dt, 1),
            "rows_per_sec": int(N / dt),
            "batches": n_files,
            "distinct_keys_truth": truth,
            "emitted": n_emitted,
            "keys_emitted_twice": dup_keys,
            "keys_spanning_multiple_batches_pct": round(100.0 * spanning / truth, 2),
            "exact": n_emitted == truth and dup_keys == 0,
        }

        # --- 2. cross-batch top-k (stream_topk semantics) ----------------
        order = [F.col("value_micros").desc(), F.col("event_id").asc()]
        t0 = time.perf_counter()
        got = ops.drain_topk(
            stream().select("event_id", "user_id", "value_micros"),
            K,
            order,
            id_cols=["event_id"],
        )
        got_rows = {(r.event_id, r.value_micros) for r in got.collect()}
        dt = time.perf_counter() - t0
        exact_rows = {
            (r.event_id, r.value_micros)
            for r in batch.orderBy(*order).limit(K).collect()
        }
        results["topk"] = {
            "sec": round(dt, 1),
            "rows_per_sec": int(N / dt),
            "k": K,
            "exact": got_rows == exact_rows,
            "missing": len(exact_rows - got_rows),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "probe": "streaming_state_recall_r8",
                "n_rows": N,
                "n_batches": N_BATCHES,
                "n_users": N_USERS,
                "results": results,
                "calib_matmul_sec": {"before": c_before, "after": calib()},
                "load_avg": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
