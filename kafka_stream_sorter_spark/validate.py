"""Result validation — the reference's test oracle, done properly.

The reference validates by sampling the first 1000 records of each sorted
topic and checking pairwise ascending order in bash
(``/root/reference/scripts/test_validation.sh:21-113``). Weaknesses we fix
(SURVEY.md §5): prefix-only coverage, no row-count conservation (the async
producer swallows write errors — ``cmd/producer/main.go:85-87``), and a
locale-dependent comparator. Here: full-table pairwise check via a ``lag``
window, exact count conservation, both distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_violations(df: DataFrame, *keys: str, ascending: bool = True) -> int:
    """Number of adjacent pairs out of order under ORDER BY keys.

    Full-table generalization of ``validate_id_sort`` /
    ``validate_lexicographic_sort`` (test_validation.sh:21-113). Uses a
    single-partition window — acceptable for validation at test scale; at
    production scale one would check per range-partition plus boundary rows.
    """
    # Capture the order the DataFrame actually produces: mono ids are
    # (partition_id << 33) + in-partition offset, and a range-partitioned
    # sort emits partitions in key order — so ascending mono id == produced
    # row order. Checking against a window ordered by the sort key itself
    # would be self-fulfilling.
    keyed = df.select(F.struct(*[F.col(k) for k in keys]).alias("k")).withColumn(
        "_pos", F.monotonically_increasing_id()
    )
    w = Window.orderBy("_pos")
    prev = F.lag("k").over(w)
    bad = (F.col("k") < prev) if ascending else (F.col("k") > prev)
    return keyed.select(F.coalesce(bad, F.lit(False)).alias("bad")).filter("bad").count()


def assert_sorted(df: DataFrame, *keys: str, ascending: bool = True) -> None:
    n = count_violations(df, *keys, ascending=ascending)
    if n:
        raise AssertionError(f"ordering violated for keys {keys}: {n} adjacent inversions")


def assert_count_conserved(source: DataFrame, result: DataFrame) -> None:
    """No dropped/duplicated rows end-to-end — the check the reference
    lacks entirely (SURVEY.md §5)."""
    ns, nr = source.count(), result.count()
    if ns != nr:
        raise AssertionError(f"row count not conserved: source={ns} result={nr}")
