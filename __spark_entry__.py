"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``kafka_stream_sorter_spark`` (registry.py holds
the query/oracle pairs); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's headline
    capability — global total-order sort of the stream-shaped `events`
    table by its numeric key (≙ ``./sorter id``,
    /root/reference/cmd/sorter/main.go:24 → external_sort.go:69-201)."""
    from kafka_stream_sorter_spark.registry import QUERIES

    return QUERIES["sort_numeric"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_stream_sorter_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kafka_stream_sorter_spark.registry import ORACLES

    return dict(ORACLES)
