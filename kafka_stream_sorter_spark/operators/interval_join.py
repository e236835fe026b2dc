"""Bucketed interval (range) join — an operator Spark has no built-in for.

Semantics: pairs ``(l, r)`` sharing equality keys with
``r.ts ∈ (l.ts, l.ts + width]`` — "right event within *width* after left
event". The reference engine has no joins at all (SURVEY.md §2.B); this is
part of the extension surface, built the way a 100 TB run needs it.

Naive plans are quadratic or broadcast-bound: Spark turns a pure non-equi
time condition into BroadcastNestedLoopJoin (per-pair evaluation). The
scale path here quantizes time into ``width``-sized buckets: a qualifying
right row's bucket can only be the left row's bucket ``b`` or ``b+1``, so
replicating the LEFT side into those two bucket values turns the join into
a pure equi-join on ``(keys..., bucket)`` — hash-partitionable, AQE-skew-
splittable, no row is compared outside its ±1 bucket neighborhood. Each
qualifying pair matches exactly once (the right bucket is a single value;
the two left replicas carry distinct bucket values), so no dedup pass is
needed. Cost: 2× the left row count through one shuffle, independent of
the time-span of the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_after(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    width_seconds: int,
) -> DataFrame:
    """Equi-keys + ``right_ts ∈ (left_ts, left_ts + width_seconds]``.

    Returns all columns of ``left`` then all of ``right`` (caller aliases
    beforehand to avoid collisions on shared names).
    """
    from kafka_stream_sorter_spark.functions.numeric import epoch_us

    width_us = int(width_seconds) * 1_000_000

    # exact integer bucket arithmetic, not double `/`: a bucket flipped by a
    # last-ulp rounding at a boundary would silently drop a matching pair.
    # (e - e % w) is an exact multiple of w, so the double division below is
    # exact for any epoch < 2^53 µs (~year 2255).
    def bucket(ts_name: str):
        e = epoch_us(ts_name)
        return ((e - e % width_us) / width_us).cast("long")

    lb = bucket(left_ts)
    l2 = left.withColumn("_ij_bucket", F.explode(F.array(lb, lb + F.lit(1))))
    r2 = right.withColumn("_ij_bucket", bucket(right_ts))

    cond = [l2[k] == r2[k] for k in keys] + [l2["_ij_bucket"] == r2["_ij_bucket"]]
    refined = (
        l2.join(r2, cond)
        .filter(
            (epoch_us(r2[right_ts]) > epoch_us(l2[left_ts]))
            & (epoch_us(r2[right_ts]) <= epoch_us(l2[left_ts]) + width_us)
        )
    )
    keep = [l2[c] for c in left.columns] + [
        r2[c] for c in right.columns if c not in keys
    ]
    return refined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval OVERLAP join: pairs sharing equality keys whose CLOSED
    intervals intersect — ``l.start <= r.end AND r.start <= l.end``. The
    two-sided sibling of :func:`interval_join_after` (points vs a window
    there; intervals vs intervals here) — the 1-D case of a distributed
    spatial join.

    Scale path: both sides replicate each interval into every
    ``bucket_seconds`` grid cell it touches (``floor(start/w)`` ..
    ``floor(end/w)`` — replication factor 1 + ceil(len/w), so pick ``w``
    near the typical interval length), then a pure hash equi-join on
    ``(keys..., cell)`` with the exact overlap predicate as residual. A
    pair whose intervals span several shared cells would match once per
    cell, so each pair is emitted only at its REFERENCE POINT — the first
    cell where both intervals are present,
    ``max(floor(l.start/w), floor(r.start/w))`` — the standard
    deduplication-free technique of distributed spatial joins (each pair
    checked exactly once, no `distinct` shuffle afterward).

    Returns all columns of ``left`` then of ``right`` (caller aliases to
    avoid collisions; the ``keys`` columns are emitted once)."""
    from kafka_stream_sorter_spark.functions.numeric import epoch_us

    w_us = int(bucket_seconds) * 1_000_000

    def cell(col_name: str):
        e = epoch_us(col_name)
        return ((e - e % w_us) / w_us).cast("long")

    l2 = left.withColumn(
        "_ov_cell",
        F.explode(F.sequence(cell(left_start), cell(left_end))),
    ).withColumn("_ov_ref_l", cell(left_start))
    r2 = right.withColumn(
        "_ov_cell",
        F.explode(F.sequence(cell(right_start), cell(right_end))),
    ).withColumn("_ov_ref_r", cell(right_start))

    cond = [l2[k] == r2[k] for k in keys] + [l2["_ov_cell"] == r2["_ov_cell"]]
    joined = (
        l2.join(r2, cond)
        # exact overlap of closed intervals
        .filter(
            (epoch_us(l2[left_start]) <= epoch_us(r2[right_end]))
            & (epoch_us(r2[right_start]) <= epoch_us(l2[left_end]))
        )
        # reference point: emit only in the first common cell
        .filter(
            l2["_ov_cell"] == F.greatest(l2["_ov_ref_l"], r2["_ov_ref_r"])
        )
    )
    keep = [l2[c] for c in left.columns] + [
        r2[c] for c in right.columns if c not in keys
    ]
    return joined.select(*keep)
