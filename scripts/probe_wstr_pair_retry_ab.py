#!/usr/bin/env python
"""Price the ADJACENT wstr-wstr pack that only the r13 realized-width
retry can reach (r12 ADVICE item 1), with the drift-robust
alternating-repeat design probe_float_pack_ab.py established (CLAUDE.md
timing rules: ALTERNATING arms so host phases hit every arm, noop sink
to drop the parquet/disk common term, per-repeat walls + build/exec
split + calib bracket, medians quoted).

The shape: (cat, doc, wide_id) where BOTH leading keys are
high-cardinality bounded-suffix strings and the id spans ~58 bits. The
initial window selection locks cat at k=7 (~52 bits) against an
optimistic width-1 neighbor; doc then only fits a k=1 window, whose
sample collision declines it — pre-r13 the whole shape fell back to a
3-field struct search with UTF8 compares on two fields. The retry
narrows cat to k=5 (36 bits), revives doc at its minimal sample-clean
k=3 (20 bits), and packs BOTH strings into one 56-bit search long:
3 search fields -> 2, and the per-row UTF8 compares drop to zero. The
probe asserts the retry actually engaged (wstr_packed_fields == [0, 1]
with the expected windows) so a regression to the pre-retry decline
cannot masquerade as a timing arm.

Arms:

  pair_packed    (cat, doc, wide_id) — retry-enabled (cat+doc fold,
                 wide_id singleton): 2 search fields; build pays BOTH
                 exact countDistinct injectivity gates in one agg.
                 Since r15 the leading-prefix regime gate would decline
                 this shape at the default 100k cats, so this arm
                 suppresses the gate (GP_REGIME_MIN_SAMPLE_FACTOR
                 maxed) to keep measuring the r13/r14 packed path
  pair_declined  same keys, _composite_key suppressed: 3-field struct
                 search, no dict premap (both string domains exceed
                 GP_DICT_RANK_MAX_KEYS), UTF8 compares in search AND
                 window sort — and none of job A's pre-aggregates
  pair_regime    same keys, SHIPPED r15 default path: the regime gate
                 fires on the near-unique leading cat (sample-distinct
                 ~98k >= rows-per-bucket ~16.4k) and declines both
                 wstr fields with reason 'regime' before the exact
                 injectivity agg or any encode — pays job A only.
                 Expect wall ~= pair_packed minus the build tax the
                 r13/r14 probes measured (~30s/100M), exec ~neutral
  ts_packed      (seg, ts, wide_id) — POSITIVE CONTROL: the r10-r12
                 grouped shape (measured exec 0.60-0.79 across three
                 rounds); reproducing it validates the method window
                 (no wstr fields — the regime gate never touches it)
  ts_declined    same keys, suppressed

--cats=N sets the leading field's cardinality (default 100_000). The
regime matters more than the pack itself: with a HIGH-card leading
string the declined arm's lexicographic chain short-circuits before
ever touching the second field (cat ~uniquely decides both the search
levels and the window sort), so the pack only removes compares that
were already skipped while paying two encodes + the double injectivity
agg; with a MID-card leading string (ties everywhere) the second
string's compares are the dominant cost the pack deletes. The window
assertions are pinned only for the default cardinality.

--sink=parquet replaces the noop sink with a real parquet write
(fresh dir per repeat, cleaned after) — the r13 noop ratios priced the
pure compute term; CLAUDE.md's write-decomposition rule notes the disk
term can move pack/decline ratios (r11 float probe), which is exactly
what the r13 verdict stretch asks to confirm at 100M with the ts
control in-window.

Usage: python scripts/probe_wstr_pair_retry_ab.py [n_rows] [repeats] [--arms=a,b] [--cats=N] [--sink=noop|parquet]
Default 100M x 3, all four arms, noop sink. Run EXCLUSIVELY.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
N_ROWS = int(ARGS[0]) if len(ARGS) > 0 else 100_000_000
REPEATS = int(ARGS[1]) if len(ARGS) > 1 else 3
ONLY_ARMS = next(
    (a.split("=", 1)[1].split(",") for a in sys.argv[1:] if a.startswith("--arms=")),
    None,
)
N_CATS = next(
    (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--cats=")),
    100_000,
)
SINK = next(
    (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--sink=")),
    "noop",
)
assert SINK in ("noop", "parquet"), SINK


def calib() -> float:
    import numpy as np

    a = np.random.default_rng(0).random((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / np.linalg.norm(a)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_stream_sorter_spark.operators import sort as sort_ops
    from kafka_stream_sorter_spark.session import get_spark

    c_start = calib()
    spark = get_spark(app_name="probe-wstr-pair-retry-ab")
    spark.range(0, 2_000_000, 1, 32).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("g"), "id"
    ).groupBy("g").agg(F.sum("id").alias("s")).write.format("noop").mode(
        "overwrite"
    ).save()

    events = spark.range(0, N_ROWS, 1, 64).select(
        (
            F.pmod(F.col("id") * F.lit(2654435761), F.lit(N_ROWS))
            * F.lit(2654435761)
        ).alias("wide_id"),
        F.concat(F.lit("seg_"), F.pmod(F.xxhash64("id"), F.lit(8))).alias("seg"),
        # cat: 'category/' + 5 varying digits + constant '00' (16 bytes).
        # The >=8-byte CONSTANT prefix is load-bearing for the declined
        # arm's realism: Tungsten's sort prefix covers only the leading
        # column's first 8 bytes, so a short synthetic key would let the
        # radix pass resolve the window sort and flatter the fallback
        # (the first cut of this probe did exactly that — 8-byte keys,
        # pair ratios ~1.1 while the ts control reproduced 0.68; doc-id
        # shapes like the reference's 'Customer#...' all carry longer
        # constant prefixes). k=7 spans ~52 bits (optimism locks it),
        # k=5 spans ~36 and covers the whole varying part (exact
        # injectivity passes).
        F.concat(
            F.lit("category/"),
            F.lpad(
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(N_CATS)).cast("string"),
                5,
                "0",
            ),
            F.lit("00"),
        ).alias("cat"),
        # doc: 'doc/' + 3 varying digits + constant '0000' — k=1 collides
        # (the only window the pre-retry budget affords), k=3 is the
        # minimal sample-clean window the revive finds
        F.concat(
            F.lit("doc/"),
            F.lpad(
                F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).cast("string"),
                3,
                "0",
            ),
            F.lit("0000"),
        ).alias("doc"),
        F.timestamp_micros(
            F.pmod(F.xxhash64("id", F.lit(13)), F.lit(63_000_000_000_000))
            + F.lit(1_700_000_000_000_000)
        ).alias("ts"),
    )

    arms = {
        "pair_packed": (("cat", "doc", "wide_id"), "pack", 2),
        "pair_declined": (("cat", "doc", "wide_id"), "suppress", 3),
        "pair_regime": (("cat", "doc", "wide_id"), "default", 3),
        "ts_packed": (("seg", "ts", "wide_id"), "pack", 2),
        "ts_declined": (("seg", "ts", "wide_id"), "suppress", 3),
    }
    if ONLY_ARMS:
        arms = {a: arms[a] for a in ONLY_ARMS}
    walls: dict[str, list] = {a: [] for a in arms}
    builds: dict[str, list] = {a: [] for a in arms}
    execs: dict[str, list] = {a: [] for a in arms}
    calibs = [c_start]

    orig_ck = sort_ops._composite_key
    orig_factor = sort_ops.GP_REGIME_MIN_SAMPLE_FACTOR
    for r in range(REPEATS):
        for label, (keys, mode, want_fields) in arms.items():
            if mode == "suppress":
                sort_ops._composite_key = (
                    lambda *a, **kw: (None, {})
                )
            elif mode == "pack":
                # keep the pre-r15 packed path measurable: an impossible
                # engagement floor makes the regime gate inert
                sort_ops.GP_REGIME_MIN_SAMPLE_FACTOR = 1 << 62
            stats: dict = {}
            try:
                t0 = time.perf_counter()
                pos_df = sort_ops.with_global_position(events, *keys, stats=stats)
                t_mid = time.perf_counter()
                if SINK == "parquet":
                    out = f"/tmp/probe_pair_sink_{label}"
                    pos_df.write.mode("overwrite").parquet(out)
                else:
                    pos_df.write.format("noop").mode("overwrite").save()
                t1 = time.perf_counter()
            finally:
                sort_ops._composite_key = orig_ck
                sort_ops.GP_REGIME_MIN_SAMPLE_FACTOR = orig_factor
            # pair_regime's gate outcome is cardinality-dependent (the
            # gate fires iff sample-distinct(cat) >= rows-per-bucket
            # ~16.4k at 100M), so like the window assertions its
            # expectations are pinned only for the default cardinality —
            # at e.g. --cats=2000 the gate legitimately stays inert and
            # the composite engages
            if not (label == "pair_regime" and N_CATS != 100_000):
                assert stats["composite_key"] is (
                    mode == "pack" or (mode == "default" and label.startswith("ts"))
                ), (label, stats)
                assert stats["search_fields"] == want_fields, (label, stats)
            if label == "pair_packed":
                assert stats.get("wstr_packed_fields") == [0, 1], (label, stats)
                if N_CATS == 100_000:
                    assert stats.get("wstr_windows") == {0: (9, 5), 1: (4, 3)}, (
                        label,
                        stats,
                    )
            if label == "pair_regime" and N_CATS == 100_000:
                # the arm is only meaningful when the gate actually
                # fired, for the right reason, on both wstr fields
                assert stats.get("wstr_declined") == {
                    0: "regime",
                    1: "regime",
                }, (label, stats)
            walls[label].append(round(t1 - t0, 1))
            builds[label].append(round(t_mid - t0, 1))
            execs[label].append(round(t1 - t_mid, 1))
        calibs.append(calib())

    def med(xs):
        return round(statistics.median(xs), 1)

    if SINK == "parquet":
        import shutil

        for label in arms:
            shutil.rmtree(f"/tmp/probe_pair_sink_{label}", ignore_errors=True)
    report = {
        "probe": f"wstr_pair_retry_ab_{SINK}",
        "n_rows": N_ROWS,
        "n_cats": N_CATS,
        "repeats": REPEATS,
        "walls": walls,
        "builds": builds,
        "execs": execs,
        "medians": {a: med(walls[a]) for a in arms},
        "exec_medians": {a: med(execs[a]) for a in arms},
        "build_medians": {a: med(builds[a]) for a in arms},
        "calib_matmul_sec": calibs,
        "load_avg": round(os.getloadavg()[0], 2),
    }
    # key names state numerator_over_denominator exactly (the first cut
    # reused a '_packed_over_declined' suffix for the regime pairs,
    # mislabeling regime/packed as a packed/declined ratio)
    for pair, tag in (
        (("pair_packed", "pair_declined"), "pair_packed_over_declined"),
        (("pair_regime", "pair_packed"), "regime_over_packed"),
        (("pair_regime", "pair_declined"), "regime_over_suppressed"),
        (("ts_packed", "ts_declined"), "ts_packed_over_declined"),
    ):
        if pair[0] in arms and pair[1] in arms:
            report[f"ratio_{tag}"] = round(
                med(walls[pair[0]]) / med(walls[pair[1]]), 3
            )
            report[f"exec_ratio_{tag}"] = round(
                med(execs[pair[0]]) / med(execs[pair[1]]), 3
            )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
