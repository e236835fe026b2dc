"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores);
the same configs are the ones we would ship to a 1000-executor cluster:
AQE on (runtime coalescing, skew-join splitting), shuffle partitions sized
to the parallelism at hand rather than the 200 default, Arrow enabled for
the Pandas-UDF slow path, and session timezone pinned to UTC so results are
bit-comparable with the DuckDB oracle.

The reference's memory management (adaptive chunk sizing under a ~2 GB cap,
``/root/reference/internal/sort/external_sort.go:33-59``) has no analogue
here on purpose: Spark's TaskMemoryManager sizes and spills sort runs
automatically under ``spark.memory.fraction``.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "kafka_stream_sorter_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale this would instead be set to ~2-3x total executor cores, or left
    to AQE's ``spark.sql.adaptive.coalescePartitions`` with a high initial
    count; AQE coalescing is enabled either way.
    """
    cpus = default_parallelism()
    # Python workers (Pandas UDF / mapInPandas) must be able to import this
    # package; they inherit PYTHONPATH from the driver JVM, not sys.path.
    repo_root = str(Path(__file__).resolve().parents[1])
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.shuffle.spill.compress", "true")
        # Bound single-partition scan size so a 100 TB table still splits
        # into executor-memory-sized tasks (default 128m kept explicit).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long and convert at load (sources/parquet.py), truncating
        # to micros exactly as DuckDB does.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
