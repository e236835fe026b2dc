"""Parquet fixture source.

The reference's only source is a Kafka topic drained to EOF
(``/root/reference/internal/sort/external_sort.go:95-113``); the driver's
fixtures re-home that data model in parquet (TESTDATA.md). Parquet is
self-describing, so we do NOT pass a schema to ``spark.read`` (Catalyst
reads the footer; passing a mismatched schema would defeat pushdown) — but
we assert the footer matches the declared StructType in tests, keeping the
"fixed, explicit schema" property of the reference (SURVEY.md §1.2).

Scan-side scale posture: columnar parquet + Catalyst column pruning +
predicate pushdown mean a 100 TB table is read only in the columns and row
groups a query touches. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_sorter_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_timestamps(df: DataFrame, table: str | None = None) -> DataFrame:
    """Normalize every timestamp-ish column to plain ``TimestampType`` under
    the UTC session timezone — the engine's single timestamp world.

    The fixtures have stored event time three different ways across rounds
    (``TIMESTAMP(NANOS)`` → read as ``bigint`` under ``nanosAsLong``;
    ``timestamp[us]`` → read as ``TIMESTAMP_NTZ``; a tz-tagged file would
    read as ``TIMESTAMP``), and each silent flip broke every downstream
    ``unix_micros``/watermark call. This helper accepts all three:

    * ``bigint`` where the DECLARED schema (schemas.TABLE_SCHEMAS) says
      TimestampType — legacy nanos read; integer-div to micros (the same
      ns→µs truncation DuckDB applies). Keyed on the declared type, not a
      hard-coded column name: the first version matched only a column
      literally named ``ts``, so a NANOS flip hitting o_orderdate /
      l_shipdate would have slipped through as raw bigints and read
      nanosecond counts as seconds downstream.
    * ``timestamp_ntz`` — cast to TIMESTAMP. Under the UTC session timezone
      (pinned here, runtime-settable) the cast interprets the wall-clock as
      UTC, matching DuckDB's naive-as-UTC ``epoch_us``.
    * ``timestamp`` — passthrough.

    Streaming reuses this exact function (streaming/ops.py) so batch and
    stream can never disagree on units again.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafka_stream_sorter_spark.schemas import TABLE_SCHEMAS

    # ``table`` narrows the nanos conversion to THAT table's declared
    # schema. The global union is only the fallback for table-less frames
    # (synthetic test inputs): under the union, a future table adding a
    # legitimate bigint column that merely shares a name with some other
    # table's timestamp (e.g. ``ts``) would be silently ns-divided
    # (r4 ADVICE). Every production caller passes its table name.
    schemas = [TABLE_SCHEMAS[table]] if table is not None else TABLE_SCHEMAS.values()
    declared_ts = {
        field.name
        for schema in schemas
        for field in schema.fields
        if isinstance(field.dataType, T.TimestampType)
    }
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    for col_name, dtype in df.dtypes:
        if dtype == "bigint" and col_name in declared_ts:
            # integer div — float division would lose ns precision at 2^60
            df = df.withColumn(
                col_name, F.timestamp_micros(F.expr(f"`{col_name}` div 1000"))
            )
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    """``rebalance=True`` repartitions the scan across the session's
    parallelism — for compute-heavy per-row operators (rolling hashes,
    shingling, per-vector cosine) over byte-small inputs. A parquet scan
    parallelizes by file split, and a single-row-group file is one task no
    matter how many cores exist (the fixtures are exactly that); when
    per-row work dominates scan bytes, one tiny round-robin shuffle before
    the map stage buys full-cluster fan-out. Leave False for scan-bound or
    immediately-shuffling queries — there the extra exchange is pure cost."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # events.parquet stores TIMESTAMP(NANOS), which Spark rejects outright
    # unless this legacy flag is on. It is runtime-settable, so set it on the
    # session we were handed rather than relying on the caller having built
    # it via session.get_spark() — external harnesses hand us vanilla
    # sessions (this exact gap broke 6 oracle checks in round 1).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if rebalance:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return normalize_timestamps(df, table=name)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each fixture table as a temp view for the SQL API.
    ``names=None`` means all tables; an explicit empty list registers
    nothing (the old falsy check silently promoted [] to everything)."""
    for name in TABLE_NAMES if names is None else names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
