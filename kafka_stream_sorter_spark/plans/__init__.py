from kafka_stream_sorter_spark.plans.explain import (  # noqa: F401
    assert_plan_contains,
    assert_plan_lacks,
    physical_plan,
)
