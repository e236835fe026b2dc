from kafka_stream_sorter_spark.sources.parquet import load_table, register_views  # noqa: F401
from kafka_stream_sorter_spark.sources.generator import reference_records  # noqa: F401
