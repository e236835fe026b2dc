#!/usr/bin/env python
"""One-off probe: continent-sort cost at the reference's own 50M scale
(r3 verdict stretch item 7).

BENCH history shows `ref_sort_continent` ~2.5x slower than the id/name
sorts at 50M (57.7 s vs 21-23 s). Two competing explanations:

* GC / on-heap pressure while sorting 50M (string, long) records —
  testable with off-heap Tungsten memory (`spark.memory.offHeap.*`).
* Sort-prefix collisions: Tungsten's radix/prefix sort keys on the first
  8 bytes of the leading column; a 6-value continent column gives 6
  distinct prefixes, so nearly every comparison falls through to a full
  record compare. Testable with a dictionary-encoded composite key
  (continent rank in the high bits, id in the low bits — one radix-
  sortable long; the reference's own "key precompute" trick,
  external_sort.go:24-28, applied Spark-shaped).

Each config runs in its OWN process (getOrCreate would reuse the JVM and
silently ignore off-heap settings). A fixed-size matmul calibration runs
before and after each config so a machine-speed swing (this VM: 4-8x)
can be distinguished from a real effect.

Usage:
    python scripts/probe_offheap_sort.py produce <dir> [rows]
    python scripts/probe_offheap_sort.py sort <dir> baseline|offheap|dictkey
"""

from __future__ import annotations

import json
import os
import sys
import time


def calib() -> float:
    import numpy as np

    a = np.random.default_rng(0).random((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / np.linalg.norm(a)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    mode, data_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kafka_stream_sorter_spark.session import get_spark

    if mode == "produce":
        rows = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000_000
        from kafka_stream_sorter_spark.sources.generator import (
            jit_friendly_codegen,
            reference_records,
        )

        spark = get_spark(app_name="probe-produce")
        t0 = time.perf_counter()
        with jit_friendly_codegen(spark):
            reference_records(spark, rows).write.mode("overwrite").parquet(data_dir)
        print(json.dumps({"produce_sec": round(time.perf_counter() - t0, 1), "rows": rows}))
        return

    config = sys.argv[3]
    extra = {}
    if config == "offheap":
        extra = {
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
        }
    c_before = calib()
    spark = get_spark(app_name=f"probe-sort-{config}", extra_conf=extra)
    from pyspark.sql import functions as F

    src = spark.read.parquet(data_dir)
    if config == "operator":
        # the shipped path: sort_with_tiebreak's dict-encoded fast path,
        # INCLUDING its groupBy(key) dictionary pre-job
        from kafka_stream_sorter_spark.operators.sort import sort_with_tiebreak

        plan = None  # rebuilt per run so the pre-job is timed too
    elif config == "dictkey":
        # Dictionary-encode the 6-value key into the top byte of one long:
        # rank * 2^48 + id is radix-sortable in a single 8-byte prefix and
        # orders identically to (continent, id) for id < 2^48.
        ranks = [
            r[0] for r in src.select("continent").distinct().collect() if r[0] is not None
        ]
        mapping = {c: i for i, c in enumerate(sorted(ranks))}
        rank_col = F.create_map(
            *[F.lit(x) for kv in mapping.items() for x in kv]
        )[F.col("continent")]
        keyed = src.withColumn(
            "_sortkey", rank_col.cast("long") * F.lit(1 << 48) + F.col("id")
        )
        plan = keyed.orderBy("_sortkey").drop("_sortkey")
    else:
        plan = src.orderBy("continent", "id")

    # warm scan
    src.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        p = (
            sort_with_tiebreak(src, "continent", "id")
            if config == "operator"
            else plan
        )
        p.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 1))
    print(
        json.dumps(
            {
                "config": config,
                "runs_sec": runs,
                "min_sec": min(runs),
                "calib_before": c_before,
                "calib_after": calib(),
                "load_avg": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
