#!/usr/bin/env python
"""Oracle-grade proof that the rank-pack fast paths compute the
registered positioned-fanout contracts (r10 verdict items 4 & 5).

Two registered queries key with_global_position on shapes whose packed
path only engages above GP_COMPOSITE_MIN_ROWS (the 20M gate is
deliberate — r9 verdict #2), so the driver's oracle gate only ever
attests the struct-compare path:

  * keyed_fanout_ts    — (event_type, ts, wide_id): the GROUPED
    partial-pack ((type,ts) packed, 48-bit wide singleton);
  * keyed_fanout_score — (event_type, float score, event_id): the
    IEEE-754 FLOAT rank-pack ((type,score) packed via
    functions/numeric.double_order_long, id singleton);
  * keyed_fanout_name  — (c_mktsegment, c_name): the WIDE-STRING
    prefix pack (functions/numeric.string_prefix_order_long behind
    the exact injectivity gate), both fields in one composite (r12);
  * keyed_fanout_url   — (event_type, url, event_id): the DECLINE
    path (r13, r12 verdict What's-missing item 3) — the URL-style
    key must fail the free sample-collision pre-check and fall back
    to the struct compare, asserted by REASON so a silent pack (or a
    silent wrong-reason decline) fails; the fallback's positions are
    proven against the registered oracle like the pack paths.
  * keyed_fanout_pair  — (cat, doc, wide): the RETRY+REVIVE path
    (r14, r13 verdict What's-missing item 3) — the category key's
    optimistic first-pass window strands it, the doc key declines on
    a pigeonhole-deterministic 1-byte sample collision, and the
    realized-width retry must RE-WINDOW cat while the neighbor
    revive brings doc back, asserted via wstr_retried/wstr_revived
    so a pack that arrived without the r13 machinery fails.
  * keyed_fanout_unique — (uniq, doc): the REGIME-decline path (r15,
    r14 verdict item 3) — first proven genuinely packable under the
    lowered gate with default sampling (the regime gate's factor-2
    engagement floor is deterministically inert at fixture sample
    sizes), then re-run with GP_SAMPLE_MOD=1 so the boundary sample
    IS the table (pigeonhole-deterministic, no birthday odds): the
    per-row-unique leading key must fire the leading-prefix regime
    gate and decline BOTH fields with reason 'regime' — the
    SCALING.md r13-r14 law (a near-unique-leading pack is
    exec-neutral while its build tax runs 11-21% of wall at 100M)
    as asserted behavior.

This script closes the evidence gap WITHOUT touching the registered
queries: each registered callable runs at the given sf (default sf0.1)
with the gate at its shipped default (struct path) and lowered to 0
(packed path), across the four shuffle-partition configs the exact-hash
gate uses (8 / 3-with-AQE-coalesce-off / 32 / 200). All eight hashes
must be equal AND equal to the DuckDB hash of the registered oracle_sql
entry, and a direct with_global_position call asserts the lowered-gate
run really engaged the composite with the expected search-field count —
a proof that silently fell back would be no proof.

Usage:
    python /root/repo/scripts/verify_gp_grouped_registered.py [sf_dir]

Also invoked IN-PROCESS by ``verify_driver_contract.py --exact`` (r11
verdict item 5): the registry-wide closing gate chains this check
automatically so a sort.py change can't silently skip the ≥20M packed
plans of the registered fanout queries. ``main(sf=..., names=...)``
reuses the caller's vanilla session via getOrCreate and restores
nothing it didn't set (shuffle confs are re-pinned per config exactly
like the exact-hash sweep itself); ``names`` restricts the sweep to the
fanout shapes a FILTERED --exact run actually touched (r12 ADVICE item
2 — a single-query exact run no longer pays all shapes ×8).
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

# argv is parsed only under __main__ — an importer's argv (e.g. the
# contract gate's `--exact`) must not leak into the default sf
SF = "/root/testdata/sf0.1"

CONFIGS = (("8", "true"), ("3", "false"), ("32", "true"), ("200", "true"))


def _keyed_frames(spark, sf):
    from pyspark.sql import functions as F

    from kafka_stream_sorter_spark.sources.parquet import load_table

    ev = load_table(spark, sf, "events")
    ts_keyed = (
        ev.select("event_id", "event_type", "ts")
        .withColumn("wide_id", F.col("event_id") * F.lit(2654435761))
    )
    score_keyed = (
        ev.select("event_id", "event_type", "value")
        .withColumn("score", F.lit(256.0) + F.col("value") / F.lit(1024.0))
    )
    name_keyed = load_table(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    url_keyed = (
        ev.select("event_id", "event_type", "user_id")
        .withColumn(
            "url",
            F.concat(
                F.lit("https://cdn.example.com/g"),
                (F.col("user_id") % 4).cast("string"),
                F.lit("/assets/img-"),
                F.col("event_id").cast("string"),
                F.lit(".png"),
            ),
        )
    )
    from kafka_stream_sorter_spark.queries.sorts import (
        PAIR_CAT_SQL,
        PAIR_DOC_SQL,
        PAIR_WIDE_SQL,
        UNIQ_KEY_SQL,
    )

    pair_keyed = (
        ev.select("event_id")
        .withColumn("cat", F.expr(PAIR_CAT_SQL))
        .withColumn("doc", F.expr(PAIR_DOC_SQL))
        .withColumn("wide", F.expr(PAIR_WIDE_SQL))
    )
    unique_keyed = (
        ev.select("event_id")
        .withColumn("uniq", F.expr(UNIQ_KEY_SQL))
        .withColumn("doc", F.expr(PAIR_DOC_SQL))
    )
    return {
        "keyed_fanout_ts": (ts_keyed, ("event_type", "ts", "wide_id")),
        "keyed_fanout_score": (score_keyed, ("event_type", "score", "event_id")),
        "keyed_fanout_name": (name_keyed, ("c_mktsegment", "c_name")),
        "keyed_fanout_url": (url_keyed, ("event_type", "url", "event_id")),
        "keyed_fanout_pair": (pair_keyed, ("cat", "doc", "wide")),
        "keyed_fanout_unique": (unique_keyed, ("uniq", "doc")),
    }


def main(sf: str | None = None, names=None) -> int:
    from pyspark.sql import SparkSession

    from oracle_utils import duck_connect, value_hash

    from kafka_stream_sorter_spark.operators import sort as sort_ops
    from kafka_stream_sorter_spark.sources.parquet import load_table

    sf = sf or SF
    # vanilla session, like the driver's (verify_driver_contract.py);
    # getOrCreate deliberately reuses the contract gate's session when
    # chained from it in-process
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-gp-grouped")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    mod = importlib.import_module("__spark_entry__")
    qs, oracles = mod.queries(), mod.oracle_sql()

    # warm the session before anything timed/asserted (CLAUDE.md rule)
    load_table(spark, sf, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    con = duck_connect(sf)
    default_gate = sort_ops.GP_COMPOSITE_MIN_ROWS
    failures: list[str] = []
    # query -> raw key field count (packing must REDUCE the search
    # field count below it; the exact grouping is scale-dependent)
    raw_fields = {
        "keyed_fanout_ts": 3,
        "keyed_fanout_score": 3,
        "keyed_fanout_name": 2,
        "keyed_fanout_pair": 3,
        "keyed_fanout_unique": 2,
    }
    # the decline shape: the composite must NOT engage, for the right
    # reason, and the struct fallback must still match the oracle
    decline_shapes = {"keyed_fanout_url": {1: "sample_collision"}}
    # the regime shape (r15): provably packable under the lowered gate
    # with default sampling (asserted via raw_fields above), but with
    # GP_SAMPLE_MOD=1 — the sample IS the table, so the decision is
    # pigeonhole-deterministic — the per-row-unique leading key must
    # fire the leading-prefix regime gate and decline BOTH fields
    regime_shapes = {"keyed_fanout_unique": {0: "regime", 1: "regime"}}
    # the retry shape (r14): the realized-width retry must RE-WINDOW the
    # named field and the neighbor revive must bring the named declined
    # field back into the pack — a pack that silently arrived some other
    # way (or fell back) is no proof of the r13 machinery
    retry_shapes = {"keyed_fanout_pair": {"retried": [0], "revived": [1]}}
    shapes = list(raw_fields) + list(decline_shapes)
    if names is not None:
        shapes = [n for n in shapes if n in set(names)]
    for name in shapes:
        print(f"{name}:")
        q = qs[name]
        hashes: list[str] = []
        try:
            for label, gate in (("declined", default_gate), ("packed", 0)):
                sort_ops.GP_COMPOSITE_MIN_ROWS = gate
                for parts, coalesce in CONFIGS:
                    spark.conf.set("spark.sql.shuffle.partitions", parts)
                    spark.conf.set(
                        "spark.sql.adaptive.coalescePartitions.enabled", coalesce
                    )
                    t0 = time.time()
                    hashes.append(value_hash(q(spark, sf).toPandas()))
                    print(
                        f"  {label:9s} parts={parts:>3s} coalesce={coalesce:5s} "
                        f"hash={hashes[-1][:12]}  [{time.time()-t0:.1f}s]"
                    )
            # the lowered gate must actually engage the composite on this
            # exact key shape
            sort_ops.GP_COMPOSITE_MIN_ROWS = 0
            stats: dict = {}
            keyed, keys = _keyed_frames(spark, sf)[name]
            sort_ops.with_global_position(
                keyed, *keys, stats=stats
            ).write.format("noop").mode("overwrite").save()
        finally:
            sort_ops.GP_COMPOSITE_MIN_ROWS = default_gate
        print(
            f"  stats: composite_key={stats.get('composite_key')} "
            f"search_fields={stats.get('search_fields')} "
            f"n_buckets={stats.get('n_buckets')}"
        )
        oh = value_hash(con.execute(oracles[name]).fetchdf())
        print(f"  oracle hash={oh[:12]}")
        if len(set(hashes)) != 1:
            failures.append(f"{name}: hash disagreement across paths/configs")
        if hashes and hashes[0] != oh:
            failures.append(
                f"{name}: spark hash {hashes[0][:12]} != oracle {oh[:12]}"
            )
        if name in decline_shapes:
            # the mirror of the pack assertions: a silent PACK — or a
            # decline at any gate other than the free sample-collision
            # pre-check — fails
            if stats.get("composite_key") is not False:
                failures.append(f"{name}: decline shape engaged a composite")
            if stats.get("wstr_packed_fields"):
                failures.append(
                    f"{name}: wide-string pack engaged on a decline shape "
                    f"(wstr_packed_fields={stats.get('wstr_packed_fields')})"
                )
            if stats.get("wstr_declined") != decline_shapes[name]:
                failures.append(
                    f"{name}: expected decline {decline_shapes[name]}, got "
                    f"{stats.get('wstr_declined')}"
                )
            continue
        if stats.get("composite_key") is not True:
            failures.append(f"{name}: lowered gate did not engage the composite")
        # The grouping is SCALE-DEPENDENT by design: at sf0.1 the 3-field
        # shapes group as 2 search fields (packed pair + singleton),
        # while at sf0.01 the score shape's event_id range shrinks enough
        # that all three fields fit one 63-bit composite (search_fields=1
        # — a STRONGER pack, not a fallback). A silent decline would
        # report composite_key=False with the raw N-field search, so
        # requiring fewer search fields than raw key fields catches it.
        if not 1 <= stats.get("search_fields", 99) < raw_fields[name]:
            failures.append(
                f"{name}: expected < {raw_fields[name]} packed search "
                f"fields, got {stats.get('search_fields')}"
            )
        if name == "keyed_fanout_name" and stats.get("wstr_packed_fields") != [1]:
            failures.append(
                f"{name}: wide-string prefix pack did not engage on the "
                f"name field (wstr_packed_fields="
                f"{stats.get('wstr_packed_fields')})"
            )
        if name in retry_shapes:
            exp = retry_shapes[name]
            want_packed = sorted(exp["retried"] + exp["revived"])
            if stats.get("wstr_packed_fields") != want_packed:
                failures.append(
                    f"{name}: retry shape expected packed fields "
                    f"{want_packed}, got {stats.get('wstr_packed_fields')}"
                )
            if stats.get("wstr_retried") != exp["retried"]:
                failures.append(
                    f"{name}: realized-width retry did not re-window "
                    f"fields {exp['retried']} "
                    f"(wstr_retried={stats.get('wstr_retried')})"
                )
            if stats.get("wstr_revived") != exp["revived"]:
                failures.append(
                    f"{name}: neighbor revive did not fire on fields "
                    f"{exp['revived']} "
                    f"(wstr_revived={stats.get('wstr_revived')})"
                )
        if name in regime_shapes:
            # the pack just proven above is what the regime gate must
            # take away once the sample is decisive: exhaustive-sample
            # re-run, both fields decline with reason 'regime', and the
            # exact countDistinct tax the gate exists to skip never runs
            if stats.get("wstr_packed_fields") != sorted(regime_shapes[name]):
                failures.append(
                    f"{name}: regime shape did not pack under default "
                    f"sampling (wstr_packed_fields="
                    f"{stats.get('wstr_packed_fields')}) — the decline "
                    f"assertion below would be vacuous"
                )
            default_mod = sort_ops.GP_SAMPLE_MOD
            stats2: dict = {}
            try:
                sort_ops.GP_COMPOSITE_MIN_ROWS = 0
                sort_ops.GP_SAMPLE_MOD = 1
                sort_ops.with_global_position(
                    keyed, *keys, stats=stats2
                ).write.format("noop").mode("overwrite").save()
            finally:
                sort_ops.GP_COMPOSITE_MIN_ROWS = default_gate
                sort_ops.GP_SAMPLE_MOD = default_mod
            print(
                f"  regime (mod=1): composite_key={stats2.get('composite_key')} "
                f"wstr_declined={stats2.get('wstr_declined')}"
            )
            if stats2.get("composite_key") is not False:
                failures.append(
                    f"{name}: exhaustive-sample run still engaged a "
                    f"composite — the regime gate did not fire"
                )
            if stats2.get("wstr_declined") != regime_shapes[name]:
                failures.append(
                    f"{name}: expected regime decline "
                    f"{regime_shapes[name]}, got "
                    f"{stats2.get('wstr_declined')}"
                )
    con.close()
    if failures:
        print("\nFAIL: " + "; ".join(failures))
        return 1
    print(
        f"\nALL MATCH: packed/declined paths ≡ struct-compare ≡ oracle on "
        f"{len(shapes)} registered fanout shapes at {sf} (×8 runs each)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(
        main(os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else None)
    )
