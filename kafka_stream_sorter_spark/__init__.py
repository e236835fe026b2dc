"""kafka_stream_sorter_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference Go pipeline
``jokerinfini/kafka-stream-sorter`` (Kafka topic → external merge sort →
Kafka topic, one job per sort key; see ``/root/reference/README.md:8`` and
``internal/sort/external_sort.go:69-201``) as idiomatic Spark DataFrame /
Structured Streaming plans, and extends the surface with the relational and
LLM-data-pipeline operators a 100 TB training-data pipeline needs
(joins/aggs/windows, dedup, similarity search, text analysis, multimodal
column plumbing).

Design stance (SURVEY.md §7): declare logical plans with the DataFrame/SQL
API and let Catalyst/Tungsten pick the physical strategy. The reference's
hand-rolled mechanisms — adaptive chunk sizing, spill files, k-way heap
merge (``external_sort.go:33-59,205-363``) — are all subsumed by Spark's
``SortExec``/``UnsafeExternalSorter``; zero custom Catalyst rules needed.
"""

__version__ = "0.1.0"

_LAZY = {
    "get_spark": ("kafka_stream_sorter_spark.session", "get_spark"),
    "load_table": ("kafka_stream_sorter_spark.sources.parquet", "load_table"),
    "register_views": ("kafka_stream_sorter_spark.sources.parquet", "register_views"),
    "QUERIES": ("kafka_stream_sorter_spark.registry", "QUERIES"),
    "ORACLES": ("kafka_stream_sorter_spark.registry", "ORACLES"),
}


def __getattr__(name: str):
    """Lazy top-level API (`from kafka_stream_sorter_spark import get_spark,
    load_table, QUERIES`) without paying the full registry import — and
    without importing pyspark — until first use."""
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
