from kafka_stream_sorter_spark.functions.numeric import money_micros, MONEY_MICROS_SQL  # noqa: F401
