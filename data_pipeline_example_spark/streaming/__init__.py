from data_pipeline_example_spark.streaming.job import (
    EVENT_SCHEMA,
    build_aggregations,
    decode_json,
    read_stream,
    transform_orders,
    write_stream,
)

__all__ = [
    "EVENT_SCHEMA",
    "build_aggregations",
    "decode_json",
    "read_stream",
    "transform_orders",
    "write_stream",
]
