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

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.schemas import CONTINENTS


@contextmanager
def jit_friendly_codegen(spark: SparkSession):
    """Run an action over generator output with whole-stage codegen OFF.

    The two wide string expressions (15 + 20 per-char subexpressions)
    fuse into a single whole-stage-codegen method whose bytecode exceeds
    HotSpot's 8000-byte JIT limit — WSC cannot split expression code into
    sub-methods, so the fused method runs *interpreted*: ~30× slower
    (measured 20.7 s vs 0.7 s for 5M rows on local[32]). Plain expression
    codegen (WSC off) splits into small JIT-able methods per expression.
    Scope this around generation actions only; every other plan in the
    engine wants WSC on."""
    old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", old)

_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"  # generator.go:10
_ADDRESS_CHARS = _LETTERS + "0123456789 "  # generator.go:11


def _hash(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit stream: xxhash64 of (seed, *cols)."""
    return F.xxhash64(F.lit(seed), *cols)


_CHARS_PER_BLOCK = 5  # 12 bits/char × 5 = 60 of a hash's 64 bits
_BITS_PER_CHAR = 12
_CHAR_MASK = (1 << _BITS_PER_CHAR) - 1


def _rand_string(row: F.Column, seed: int, tag: int, min_len: int, max_len: int, alphabet: str) -> F.Column:
    """Random-looking string of length [min_len, max_len] drawn from alphabet.

    One xxhash64 per FIVE characters (12 bits each, 4096 % |alphabet|
    residual bias ≤ ~1.3% — irrelevant for synthetic benchmark data),
    instead of one hash per character: hashing dominated the producer's
    cost profile, and this cuts it ~4×. Identical block hashes across the
    per-character expressions collapse via codegen subexpression
    elimination. Still a pure function of (row, seed) — deterministic at
    any parallelism. No UDF, no driver loop.
    """
    chars = F.array(*[F.lit(c) for c in alphabet])
    length = (F.pmod(_hash(seed, F.lit(tag), row), F.lit(max_len - min_len + 1)) + min_len).cast("int")
    char_exprs = []
    for j in range(max_len):
        b, d = divmod(j, _CHARS_PER_BLOCK)
        # negative block marker keeps the hash stream disjoint from the
        # (positive) length-hash input space
        block = _hash(seed, F.lit(tag), row, F.lit(-(b + 1)))
        code = F.pmod(
            F.shiftrightunsigned(block, d * _BITS_PER_CHAR).bitwiseAND(F.lit(_CHAR_MASK)),
            F.lit(len(alphabet)),
        )
        char_exprs.append(F.element_at(chars, (code + 1).cast("int")))
    return F.array_join(F.slice(F.array(*char_exprs), F.lit(1), length), "")


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
    from kafka_stream_sorter_spark.schemas import KAFKA_RECORD

    # the split array projects ONCE (r17): referencing the same `parts`
    # Column from every field expression pasted the split into each one —
    # 4 splits of the line per row in the executed plan where 1 suffices
    # (CollapseProject keeps a non-cheap multi-referenced column in its
    # own projection). Catalyst still prunes unused FIELDS; the split
    # itself is one pass either way.
    base = lines.select(F.split(F.col(value_col), ",").alias("_parts"))
    parts = F.col("_parts")
    # field order and types come from the declared record schema — the one
    # place the reference's positional CSV layout is written down
    return base.select(
        *[
            parts.getItem(i).cast(f.dataType).alias(f.name)
            for i, f in enumerate(KAFKA_RECORD.fields)
        ]
    )
