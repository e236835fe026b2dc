#!/usr/bin/env python
"""ANN at 1M vectors: quantify the exact baseline and the IVF scale path.

SCALING.md argues the similarity stack is 100 TB-shaped (corpus never
shuffled, candidates blocked, driver materialization k-bounded); this
probe puts numbers behind the argument at 1M × 64-d — 2000× the fixture
corpus:

  1. `brute_force_topk_vectorized` — the exact Arrow/BLAS baseline:
     per-partition dgemm against the broadcast query matrix, local top-k,
     global re-rank. Wall scales linearly in corpus size; the probe
     records rows/s scanned.
  2. `blocked_topk` — the IVF-style scale path (candidates share the
     query's coarse-cluster label): wall + recall@k against (1).

The corpus is deterministic clustered data built JVM-side (no Python in
generation): 100 clusters, per-dimension center + bounded noise from
integer hashes — so the blocked path's recall is meaningful (in real
embeddings, neighbors share coarse clusters; uniform random vectors
would make recall a property of noise, not of the operator).

Usage: python scripts/probe_ann_scale.py [n_vectors] [n_queries] [k]
Run EXCLUSIVELY.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_Q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
N_CLUSTERS = 100
DIM = 64


def calib() -> float:
    import numpy as np

    a = np.random.default_rng(0).random((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / np.linalg.norm(a)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_stream_sorter_spark.operators.similarity import (
        blocked_topk,
        brute_force_topk_vectorized,
    )
    from kafka_stream_sorter_spark.session import get_spark

    c_before = calib()
    spark = get_spark(app_name="probe-ann-scale")

    label = (F.col("id") % N_CLUSTERS).alias("label")
    dims = [
        (
            (F.hash(F.col("id") % N_CLUSTERS, F.lit(j)) % 2000) / F.lit(1000.0)
            + (F.hash(F.col("id"), F.lit(j)) % 1000) / F.lit(3000.0)
        ).cast("float")
        for j in range(DIM)
    ]
    emb = (
        spark.range(0, N, 1, 64)
        .select(F.col("id").alias("vec_id"), F.array(*dims).alias("embedding"), label)
        .localCheckpoint()  # materialize once; both operators scan the same data
    )
    query_ids = list(range(0, N, max(1, N // N_Q)))[:N_Q]

    t0 = time.perf_counter()
    exact = brute_force_topk_vectorized(emb, query_ids, k=K)
    exact_rows = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    t_exact = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    blocked = blocked_topk(emb, query_ids, k=K)
    blocked_rows = {(r.query_id, r.neighbor_id) for r in blocked.collect()}
    t_blocked = round(time.perf_counter() - t0, 1)

    recall = round(len(exact_rows & blocked_rows) / max(1, len(exact_rows)), 4)
    c_after = calib()
    print(
        json.dumps(
            {
                "probe": "ann_scale_r5",
                "n_vectors": N,
                "dim": DIM,
                "n_queries": len(query_ids),
                "k": K,
                "exact_bruteforce_blas": {
                    "sec": t_exact,
                    "vectors_per_sec": int(N / t_exact),
                },
                "ivf_blocked": {"sec": t_blocked, "vectors_per_sec": int(N / t_blocked)},
                "ivf_recall_at_k": recall,
                "calib_matmul_sec": {"before": c_before, "after": c_after},
                "load_avg": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
