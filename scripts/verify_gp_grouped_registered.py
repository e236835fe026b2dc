#!/usr/bin/env python
"""Oracle-grade proof that the GROUPED rank-pack path computes the
registered `keyed_fanout_ts` contract (r10 verdict, next-round item 5).

`keyed_fanout_ts` keys on (event_type, ts, wide_id) — the canonical
over-budget shape: (type, ts) pack into one long, wide_id (48-bit span)
cannot join the group, so above GP_COMPOSITE_MIN_ROWS the operator takes
the ADJACENT-RUN GROUPED path (operators/sort.py:_composite_key). The
registered query never reaches it at driver-gate scale (the 20M-row gate
is deliberate — r9 verdict #2), so the driver's oracle only ever attests
the struct-compare path. This script closes that evidence gap WITHOUT
touching the registered query: it runs the exact registered callable at
the given sf (default sf0.1) with

  1. the gate at its shipped default  -> struct-compare/declined path,
  2. the gate lowered to 0            -> grouped partial-pack path,

each across the same four shuffle-partition configs the exact-hash gate
uses (8 / 3-with-AQE-coalesce-off / 32 / 200), reduces every run to the
driver-style exact value hash, and requires ALL EIGHT hashes equal AND
equal to the DuckDB oracle hash of the registered oracle_sql entry. It
also asserts (via a direct with_global_position call with stats) that
the lowered-gate run really did engage the grouped composite with 2
search fields — a proof that silently fell back would be no proof.

Usage:
    python /root/repo/scripts/verify_gp_grouped_registered.py [sf_dir]
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SF = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else "/root/testdata/sf0.1"

CONFIGS = (("8", "true"), ("3", "false"), ("32", "true"), ("200", "true"))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from oracle_utils import duck_connect, value_hash

    from kafka_stream_sorter_spark.operators import sort as sort_ops
    from kafka_stream_sorter_spark.sources.parquet import load_table

    # vanilla session, like the driver's (verify_driver_contract.py)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-gp-grouped")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    mod = importlib.import_module("__spark_entry__")
    qs, oracles = mod.queries(), mod.oracle_sql()
    q = qs["keyed_fanout_ts"]

    # warm the session before anything timed/asserted (CLAUDE.md rule)
    load_table(spark, SF, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    default_gate = sort_ops.GP_COMPOSITE_MIN_ROWS
    hashes: dict[str, list[str]] = {"declined": [], "grouped": []}
    try:
        for label, gate in (("declined", default_gate), ("grouped", 0)):
            sort_ops.GP_COMPOSITE_MIN_ROWS = gate
            for parts, coalesce in CONFIGS:
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                spark.conf.set(
                    "spark.sql.adaptive.coalescePartitions.enabled", coalesce
                )
                t0 = time.time()
                hashes[label].append(value_hash(q(spark, SF).toPandas()))
                print(
                    f"  {label:9s} parts={parts:>3s} coalesce={coalesce:5s} "
                    f"hash={hashes[label][-1][:12]}  [{time.time()-t0:.1f}s]"
                )
        # the lowered gate must actually engage the GROUPED composite on
        # this exact key shape — otherwise the 8-way equality proves less
        # than it claims
        sort_ops.GP_COMPOSITE_MIN_ROWS = 0
        stats: dict = {}
        keyed = (
            load_table(spark, SF, "events")
            .select("event_id", "event_type", "ts")
            .withColumn("wide_id", F.col("event_id") * F.lit(2654435761))
        )
        sort_ops.with_global_position(
            keyed, "event_type", "ts", "wide_id", stats=stats
        ).write.format("noop").mode("overwrite").save()
    finally:
        sort_ops.GP_COMPOSITE_MIN_ROWS = default_gate

    print(
        f"  stats: composite_key={stats.get('composite_key')} "
        f"search_fields={stats.get('search_fields')} "
        f"n_buckets={stats.get('n_buckets')}"
    )
    con = duck_connect(SF)
    oh = value_hash(con.execute(oracles["keyed_fanout_ts"]).fetchdf())
    con.close()
    print(f"  oracle hash={oh[:12]}")

    all_hashes = hashes["declined"] + hashes["grouped"]
    failures = []
    if len(set(all_hashes)) != 1:
        failures.append(f"hash disagreement across paths/configs: {hashes}")
    if all_hashes and all_hashes[0] != oh:
        failures.append(
            f"spark hash {all_hashes[0][:12]} != oracle hash {oh[:12]}"
        )
    if stats.get("composite_key") is not True:
        failures.append("lowered gate did not engage the composite")
    if stats.get("search_fields") != 2:
        failures.append(
            f"expected the GROUPED 2-search-field shape, got "
            f"{stats.get('search_fields')}"
        )
    if failures:
        print("\nFAIL: " + "; ".join(failures))
        return 1
    print(
        f"\nALL MATCH: grouped partial-pack ≡ struct-compare ≡ oracle on the "
        f"registered keyed_fanout_ts shape at {SF} (×{len(all_hashes)} runs)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
