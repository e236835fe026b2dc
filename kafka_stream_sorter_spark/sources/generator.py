"""Seeded, distributed reference-shaped data generator.

Reproduces the reference generator's value ranges
(``/root/reference/internal/data/generator.go:22-58``):

* ``id``         — non-negative int32 (``rand.Int31()``, generator.go:24)
* ``name``       — 10-15 chars of ``[A-Za-z]`` (generator.go:10,27-32)
* ``address``    — 15-20 chars of ``[A-Za-z0-9 ]`` (generator.go:11,35-40)
* ``continent``  — 1 of 6 fixed values (generator.go:12,42)

but as a *deterministic pure function of (row index, seed)* instead of a
mutable PRNG stream, so the same (n, seed) yields the same table on any
cluster at any parallelism — the property the reference lacks (its goroutine
fan-out at ``cmd/producer/main.go:42-67`` interleaves nondeterministically).

Scale: built on ``spark.range`` (a parallel, O(1)-memory source) with all
derivation in JVM-side built-ins (``xxhash64``/``pmod``/``transform``), so
generating 50M — or 50B — rows is embarrassingly parallel with no Python in
the loop. The reference's channel/worker plumbing (cmd/producer/main.go:42-67)
is unnecessary here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.schemas import CONTINENTS

_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"  # generator.go:10
_ADDRESS_CHARS = _LETTERS + "0123456789 "  # generator.go:11


def _hash(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit stream: xxhash64 of (seed, *cols)."""
    return F.xxhash64(F.lit(seed), *cols)


def _rand_string(row: F.Column, seed: int, tag: int, min_len: int, max_len: int, alphabet: str) -> F.Column:
    """Random-looking string of length [min_len, max_len] drawn from alphabet.

    One xxhash64 per character, evaluated inside whole-stage codegen via a
    ``transform`` over a ``sequence`` — no UDF, no driver loop.
    """
    chars = F.array(*[F.lit(c) for c in alphabet])
    length = (F.pmod(_hash(seed, F.lit(tag), row), F.lit(max_len - min_len + 1)) + min_len).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), length),
            lambda i: F.element_at(chars, (F.pmod(_hash(seed, F.lit(tag), row, i), F.lit(len(alphabet))) + 1).cast("int")),
        ),
        "",
    )


def reference_records(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """n reference-shaped rows: (id int, name, address, continent string)."""
    base = spark.range(0, n, numPartitions=num_partitions)
    row = F.col("id")
    continents = F.array(*[F.lit(c) for c in CONTINENTS])
    return base.select(
        F.pmod(_hash(seed, F.lit(0), row), F.lit(2**31)).cast("int").alias("id"),
        _rand_string(row, seed, 1, 10, 15, _LETTERS).alias("name"),
        _rand_string(row, seed, 2, 15, 20, _ADDRESS_CHARS).alias("address"),
        F.element_at(continents, (F.pmod(_hash(seed, F.lit(3), row), F.lit(6)) + 1).cast("int")).alias("continent"),
    )


def reference_csv_lines(spark: SparkSession, n: int, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """Wire-format view: one CSV line per row, as the reference publishes to
    Kafka (``cmd/producer/main.go:82`` — value-only messages)."""
    rec = reference_records(spark, n, seed, num_partitions)
    return rec.select(F.concat_ws(",", "id", "name", "address", "continent").alias("value"))


def parse_csv_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Inverse of :func:`reference_csv_lines`: positional CSV field extraction.

    Mirrors the reference's key extractors (``extractKeyString``/``extractID``,
    ``/root/reference/internal/sort/external_sort.go:368-425``): fields are
    located positionally by comma; ``address`` may contain spaces but never
    commas, so a plain split is exact. Catalyst prunes unused fields, which
    subsumes the reference's parse-only-the-key optimization.
    """
    parts = F.split(F.col(value_col), ",")
    return lines.select(
        parts.getItem(0).cast("int").alias("id"),
        parts.getItem(1).alias("name"),
        parts.getItem(2).alias("address"),
        parts.getItem(3).alias("continent"),
    )
